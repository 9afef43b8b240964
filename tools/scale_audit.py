#!/usr/bin/env python
"""Scaling audit: per-query wall time across testdata decades, flagging
superlinear growth — the 100 TB red-flag detector.

Runs the full headline suite (``bench.py``) at each scale directory
given (default sf0.01 then sf0.1 — a 10x data step), captures the
per-query detail, and reports every query whose time ratio between
consecutive decades exceeds the data ratio. A quadratic surface
(corpus-squared pair enumeration, an unblocked self-join) grows ~100x
per 10x decade and cannot hide behind host noise or fixed overhead; a
healthy distributed plan at these scales is scheduling-dominated and
reads well under the data ratio.

Interpretation guardrails (written into the SURVEY log with the
numbers): a sublinear ratio at sf<=0.1 mostly proves per-query FIXED
overhead dominates, not that the asymptote is linear — the audit's
power is one-sided. It EXONERATES nothing above the flag line but
catches the failure class that matters (accidental quadratic
surfaces) with decades of margin.

Usage::

    python tools/scale_audit.py                      # sf0.01 vs sf0.1
    python tools/scale_audit.py sf0.001 sf0.01 sf0.1 # three decades
    # a 4th synthetic decade for the dedup/text/embedding family only
    # (the blowup dir scales documents/embeddings/events 10x and
    # symlinks the star schema, so only document-family ratios are
    # meaningful there — see tools/spill_probe.py):
    SPARK_GRAFT_BENCH_ONLY=q_dedup_near,q_pipeline_e2e \
        python tools/scale_audit.py sf0.1 /root/repo/.blowup/sf1.0

Scale args are either names under /root/testdata (``sf0.1``) or
absolute directories whose basename carries the sf number
(``/root/repo/.blowup/sf1.0``). $SPARK_GRAFT_BENCH_ONLY passes through
to bench.py to restrict the timed set.

Exit status: 1 if any consecutive-decade ratio exceeds the data ratio,
else 0. BENCH_DETAIL.json's pre-run working-tree bytes are restored
afterwards (bench.py unconditionally overwrites it next to itself).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

#: Queries whose candidate space is DECLARED to grow with pair density
#: rather than corpus size — flagged runs are reported but do not fail
#: the audit, because their growth is the documented contract, with a
#: separately-registered sub-quadratic scale path. Kept deliberately
#: tiny and justified per name (the r10 fair-decade audit measured
#: everything else in the dedup/similarity family at 3.5-5.7x per 10x
#: decade; these two read 77x/27x because their candidate generators
#: are declared-dense):
#: Each entry carries the r10 fair-decade MEASURED ratio as a
#: regression ceiling: a declared query is exempt from the data-ratio
#: flag line, but NOT from its own baseline — if it ever exceeds
#: 2x the declared figure (scaled to the step's data ratio), the
#: audit fails anyway. Without the ceiling the exemption would mask a
#: real regression forever (r10 review finding).
DECLARED_SUPERLINEAR = {
    # Brute-force all-pairs cosine baseline BY DESIGN (its docstring
    # and oracle are all-pairs); the scale paths are q_dedup_near /
    # q_sim_lsh_topk / q_sim_ivf_topk (all sub-flag-line on the fair
    # decade). A θ=0.4 exact dense-vector similarity join has no known
    # sub-candidate-density algorithm; the baseline exists so the
    # bucketed variants have an exact yardstick.
    "q_dedup_embedding": {
        "reason": "declared all-pairs exact baseline",
        "fair_decade_ratio": 77.2,
    },
    # Blocks on (lang, 32-char length bucket): a FIXED key space, so
    # per-block density grows linearly with corpus size and pair work
    # quadratically — declared in its docstring as the precision
    # modality over candidate neighbourhoods; the recall/scale path is
    # MinHash-LSH (q_dedup_near) and prefix-filter (both pass fair).
    "q_dedup_editdist": {
        "reason": "fixed blocking key space, declared precision modality",
        "fair_decade_ratio": 27.3,
    },
}


#: Byte-bound map-only queries: their work scales with text BYTES, and
#: the FAIR document construction (per-copy token suffixing, `word` →
#: `word_k`) grows bytes ~1.3x per copy — the 10x-ROW fair decade is a
#: ~13x-BYTE decade for them, so the row-ratio flag line false-fails a
#: perfectly linear scan (round-12 full-headline fair audit:
#: q_text_pii_scrub read 12.8x time on 13x bytes). For these names the
#: flag line is the MEASURED documents.parquet byte ratio between the
#: two scale dirs (computed at audit time, never assumed), with no
#: extra headroom — time must stay within the byte growth.
DOC_BYTE_BOUND = {
    "q_text_pii_scrub": "map-only regex projection; linear in bytes",
}


def _doc_bytes_ratio(lo_dir: str, hi_dir: str) -> float | None:
    try:
        a = os.path.getsize(os.path.join(lo_dir, "documents.parquet"))
        b = os.path.getsize(os.path.join(hi_dir, "documents.parquet"))
        return b / a if a else None
    except OSError:
        return None


def _scale_dir(sf_arg: str) -> str:
    return (
        sf_arg if os.sep in sf_arg else os.path.join("/root/testdata", sf_arg)
    )


def _sf_num(sf_arg: str) -> float:
    """The scale factor carried by a scale arg's basename."""
    return float(os.path.basename(sf_arg.rstrip("/")).removeprefix("sf"))


def run_scale(sf_arg: str) -> dict[str, float]:
    sf_dir = (
        sf_arg
        if os.sep in sf_arg
        else os.path.join("/root/testdata", sf_arg)
    )
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(DETAIL) as f:
        return json.load(f)["queries"]


def main() -> int:
    scales = sys.argv[1:] or ["sf0.01", "sf0.1"]
    # bench.py clobbers the artifact on every run; snapshot the
    # WORKING-TREE bytes and put exactly those back even when a leg
    # fails or is interrupted. (Not `git checkout --`: that resets to
    # the committed version and would silently discard uncommitted
    # local edits to the file — ADVICE r9.)
    snapshot = open(DETAIL, "rb").read() if os.path.exists(DETAIL) else None
    try:
        timings = {s: run_scale(s) for s in scales}
    finally:
        if snapshot is not None:
            with open(DETAIL, "wb") as f:
                f.write(snapshot)

    rc = 0
    for lo, hi in zip(scales, scales[1:]):
        # the flag line is the actual data ratio between the two scale
        # dirs (sf names are scale factors), not an assumed decade —
        # `scale_audit.py sf0.001 sf0.1` is a 100x step
        data_ratio = _sf_num(hi) / _sf_num(lo)
        a, b = timings[lo], timings[hi]
        ratios = sorted(
            ((b[k] / a[k], k, a[k], b[k]) for k in b if k in a and a[k] > 0),
            reverse=True,
        )
        def _ceiling(name: str) -> float:
            # declared baseline measured at a 10x step, scaled to this
            # step's data ratio by the CONTRACT'S exponent, with 2x
            # regression headroom. Both declared queries are quadratic
            # (candidate pairs ~ density^2), so a k-decade step
            # multiplies the per-decade ratio k times over:
            # ratio ** log10(data_ratio). A linear scaling
            # (ratio * data_ratio/10) would false-fail a healthy
            # quadratic query on a 100x step and over-forgive
            # sub-decade steps (ADVICE r10).
            d = DECLARED_SUPERLINEAR[name]
            return 2.0 * d["fair_decade_ratio"] ** math.log10(data_ratio)

        bytes_ratio = _doc_bytes_ratio(_scale_dir(lo), _scale_dir(hi))

        def _line(name: str) -> float:
            # byte-bound scans answer to the byte growth when the text
            # construction inflates bytes past the row ratio
            if name in DOC_BYTE_BOUND and bytes_ratio is not None:
                return max(data_ratio, bytes_ratio)
            return data_ratio

        flagged = [
            r for r in ratios
            if r[0] > _line(r[1]) and (
                r[1] not in DECLARED_SUPERLINEAR or r[0] > _ceiling(r[1])
            )
        ]
        declared = [
            r for r in ratios
            if r[0] > _line(r[1])
            and r[1] in DECLARED_SUPERLINEAR
            and r[0] <= _ceiling(r[1])
        ]
        med = statistics.median(r[0] for r in ratios)
        print(f"{lo} -> {hi}: median ratio {med:.2f}, "
              f"worst {ratios[0][0]:.2f} ({ratios[0][1]}), "
              f"flagged(>{data_ratio:g}x): {len(flagged)}, "
              f"declared: {len(declared)}")
        for r, k, ta, tb in ratios[:10]:
            mark = ""
            if r > data_ratio and k in DOC_BYTE_BOUND and r <= _line(k):
                mark = f"  <-- byte-bound ({DOC_BYTE_BOUND[k]})"
            elif r > _line(k):
                if k in DECLARED_SUPERLINEAR and r <= _ceiling(k):
                    mark = (
                        "  <-- DECLARED "
                        f"({DECLARED_SUPERLINEAR[k]['reason']})"
                    )
                elif k in DECLARED_SUPERLINEAR:
                    mark = (
                        "  <-- REGRESSED past declared ceiling "
                        f"{_ceiling(k):.0f}x"
                    )
                else:
                    mark = "  <-- SUPERLINEAR"
            print(f"  {r:6.2f}  {ta:7.3f}s -> {tb:7.3f}s  {k}{mark}")
        if flagged:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
