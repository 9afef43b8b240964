#!/usr/bin/env python
"""Memory-pressure / spill probe for the heavy query families.

The reference's defining scale failure is its all-in-RAM data model —
every input, intermediate and output pair lives in process memory
(`MapReduceFramework.cpp:65-68`); at 100 TB that design simply dies.
This probe proves the engine carries NO hidden all-in-RAM assumption:
each heavy query runs twice on a ~10x synthetic blowup of the
document/embedding/event tables — once in a roomy JVM and once in a
deliberately starved one (small heap + small `spark.memory.fraction`)
— and must (a) finish without OOM, (b) produce the identical result,
(c) under starvation, visibly SPILL (the UI REST API's per-stage
`memoryBytesSpilled`/`diskBytesSpilled`) rather than hold state in RAM.

Each leg runs in a fresh subprocess because `spark.driver.memory` is a
JVM-launch option: it cannot be changed on a live session, and in
local mode it bounds the whole engine (driver == executors).

The blowup dir (`.blowup/sf1.0`, gitignored) is generated
deterministically from /root/testdata/sf0.1 — documents x10 with
per-copy word-shuffled text (so the DUPLICATE RATE stays comparable
instead of every doc gaining 9 near-dup clones, which would multiply
LSH bucket density and corrupt the scale-audit ratios), embeddings x10
with small seeded Gaussian perturbation, events x10 with offset
event/user ids (10x rows AND 10x graph nodes — linear growth), and the
star schema symlinked. It doubles as the 4th synthetic decade for
tools/scale_audit.py (VERDICT r9 item 4).

Usage::

    python tools/spill_probe.py            # generate + probe defaults
    python tools/spill_probe.py --gen-only # just build .blowup/sf1.0
    python tools/spill_probe.py q_dedup_near --tight-mem 500m

Result hashing is DISTRIBUTED (xxhash64 per row, float columns rounded
to 6 dp first because spill changes float merge order by ulps, summed
order-insensitively) — no driver-side collect even in the probe.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOWUP_DIR = os.path.join(REPO, ".blowup", "sf1.0")
#: The DENSE blowup above makes every doc a 10-clique of genuine
#: near-dups (copies share ~7/8 of their tokens and ~0.999 cosine), so
#: TRUE pair/candidate density grows ~100x per decade — right for spill
#: probing, WRONG for scale-ratio auditing (runtime then tracks output
#: size, not engine behavior; the round-10 audit measured exactly that:
#: q_dedup_embedding emitted 196x the pairs in 68x the time). The FAIR
#: blowup keeps pair density CONSTANT instead: each copy gets a
#: per-copy random vocabulary bijection (intra-copy token structure
#: preserved; cross-copy token sets near-disjoint, so shingle/set/
#: length blocking sees no cross-copy candidates) and embeddings get a
#: per-copy random ORTHOGONAL rotation (intra-copy pairwise cosines
#: preserved exactly; cross-copy cosines decorrelated) — 10x data with
#: 10x true pairs, the construction a linear-scaling claim needs.
FAIR_DIR = os.path.join(REPO, ".blowup", "fair", "sf1.0")
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
_GEN_VERSION = 2  # bump to force regeneration (v2: fair labels/time)

DEFAULT_QUERIES = [
    "q_dedup_near",
    "q_pipeline_e2e",
    "q_graph_pagerank",
    "q_emb_pca_top",
]

SYMLINKED = ("region", "nation", "customer", "supplier", "part",
             "orders", "lineitem")


# ---------------------------------------------------------------------------
# blowup generation
# ---------------------------------------------------------------------------

def _blow_documents(src: str, dst: str) -> None:
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    # global vocab for deterministic word substitution
    vocab = sorted({w for s in pdf["text"] if s for w in s.split()})
    parts = [pdf]
    for k in range(1, COPIES):
        c = pdf.copy()
        c["doc_id"] = c["doc_id"] + k * n
        texts = []
        for doc_id, s in zip(c["doc_id"], c["text"]):
            if s is None:
                texts.append(None)
                continue
            rng = random.Random((k << 32) ^ int(doc_id))
            words = s.split()
            rng.shuffle(words)
            # substitute ~1/8 of the words so copies aren't
            # permutation-equal shingle sets either
            for i in range(0, len(words), 8):
                words[i] = vocab[rng.randrange(len(vocab))]
            texts.append(" ".join(words))
        c["text"] = texts
        c["n_chars"] = [len(s) if s is not None else None for s in texts]
        parts.append(c)
    import pandas as pd

    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )


def _blow_embeddings(src: str, dst: str) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float32")
    parts = [pdf]
    for k in range(1, COPIES):
        c = pdf.copy()
        c["vec_id"] = c["vec_id"] + k * n
        noisy = mat + np.random.default_rng(k).normal(
            0.0, 0.02, mat.shape
        ).astype("float32")
        c["embedding"] = list(noisy)
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )


def _blow_events(src: str, dst: str) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "events.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    uid_span = int(pdf["user_id"].max()) + 1
    parts = [pdf]
    for k in range(1, COPIES):
        c = pdf.copy()
        c["event_id"] = c["event_id"] + k * n
        c["user_id"] = c["user_id"] + k * uid_span
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )


def _blow_documents_fair(src: str, dst: str) -> None:
    """Fair mode: per-copy vocabulary INJECTION into a disjoint token
    space (``word`` → ``word_k``). Within a copy every token-level
    relation (set overlap, shingles-over-tokens, repetition) is
    isomorphic to the original corpus; across copies the token sets
    are EXACTLY disjoint (the source vocab is underscore-free,
    asserted), so no blocking scheme produces cross-copy candidates
    and true pair density stays constant. (A random bijection WITHIN
    the vocab was tried first and fails here: the synthetic corpus has
    a ~31-word vocabulary, so π(A)∩A stays ≈|A|²/|V| — Jaccard ~0.5
    between copies, still dense.)"""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    assert not any(
        "_" in w for s in pdf["text"] if s for w in s.split()
    ), "suffix disjointness needs an underscore-free source vocab"
    parts = [pdf]
    for k in range(1, COPIES):
        c = pdf.copy()
        c["doc_id"] = c["doc_id"] + k * n
        texts = [
            " ".join(f"{w}_{k}" for w in s.split()) if s is not None else None
            for s in c["text"]
        ]
        c["text"] = texts
        c["n_chars"] = [len(s) if s is not None else None for s in texts]
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )


def _blow_embeddings_fair(src: str, dst: str) -> None:
    """Fair mode: per-copy random ORTHOGONAL rotation (QR of a seeded
    Gaussian matrix is Haar-distributed). Rotation preserves every
    intra-copy norm and pairwise cosine bit-for-bit in exact
    arithmetic, so each copy carries the original's near-dup structure;
    cross-copy cosines are those of independently rotated vectors —
    centered near 0, never near-dup candidates."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    dim = mat.shape[1]
    parts = [pdf]
    for k in range(1, COPIES):
        q, r = np.linalg.qr(
            np.random.default_rng(0xFA1B ^ k).normal(size=(dim, dim))
        )
        q *= np.sign(np.diag(r))  # unique (Haar) representative
        c = pdf.copy()
        c["vec_id"] = c["vec_id"] + k * n
        c["embedding"] = list((mat @ q).astype("float32"))
        # each copy gets a DISJOINT block/cell space: the label column
        # is a stored IVF cell id, and copying it verbatim makes every
        # cell 10x denser — the label-blocked pair space (sum of cell
        # sizes squared) then grows ~100x by CONSTRUCTION, false-
        # flagging correct blocked-ANN operators (round-12 full-headline
        # fair audit: q_knn_blocked read 34x). A real 10x corpus grows
        # the cell COUNT (IVF picks nlist ~ N), not per-cell density.
        c["label"] = c["label"] + k * (int(pdf["label"].max()) + 1)
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )


def _blow_events_fair(src: str, dst: str) -> None:
    """Fair mode: offset ids like the dense form AND shift each copy
    into a DISJOINT time range (span + 1h apart). The dense form keeps
    all copies in the source's time window, so any time-window operator
    (interval joins, sessionization windows) sees per-window density
    grow 10x and true pair/output space grow ~100x by construction —
    the round-12 full-headline fair audit false-flagged
    q_join_interval_binned (14x) exactly this way. Per-copy time shifts
    keep every intra-copy temporal relation identical while cross-copy
    windows never overlap: 10x data, 10x true output."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src, "events.parquet"))
    schema = t.schema.remove_metadata()
    pdf = t.to_pandas()
    n = len(pdf)
    uid_span = int(pdf["user_id"].max()) + 1
    stride = (pdf["ts"].max() - pdf["ts"].min()) + pd.Timedelta(hours=1)
    parts = [pdf]
    for k in range(1, COPIES):
        c = pdf.copy()
        c["event_id"] = c["event_id"] + k * n
        c["user_id"] = c["user_id"] + k * uid_span
        c["ts"] = c["ts"] + k * stride
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )


def ensure_blowup(fair: bool = False) -> str:
    """Build the requested blowup if absent/stale; atomic via a .part
    dir. ``fair=False`` → the dense spill-probe decade (near-dup
    10-cliques); ``fair=True`` → the constant-pair-density scale-audit
    decade (see FAIR_DIR comment)."""
    target = FAIR_DIR if fair else BLOWUP_DIR
    marker = os.path.join(target, "_COMPLETE.json")
    want = {
        "src": SRC_DIR,
        "copies": COPIES,
        "version": _GEN_VERSION,
        "mode": "fair" if fair else "dense",
    }
    try:
        if json.load(open(marker)) == want:
            return target
    except (OSError, ValueError):
        pass
    part = target + ".part"
    if os.path.exists(part):
        import shutil

        shutil.rmtree(part)
    os.makedirs(part)
    for t in SYMLINKED:
        os.symlink(
            os.path.join(SRC_DIR, f"{t}.parquet"),
            os.path.join(part, f"{t}.parquet"),
        )
    (_blow_documents_fair if fair else _blow_documents)(SRC_DIR, part)
    (_blow_embeddings_fair if fair else _blow_embeddings)(SRC_DIR, part)
    (_blow_events_fair if fair else _blow_events)(SRC_DIR, part)
    with open(os.path.join(part, "_COMPLETE.json"), "w") as f:
        json.dump(want, f)
    if os.path.exists(target):
        import shutil

        shutil.rmtree(target)
    os.replace(part, target)
    return target


# ---------------------------------------------------------------------------
# child: one query in one freshly-sized JVM
# ---------------------------------------------------------------------------

def _sink_blowup(spark, sf_dir):  # noqa: ANN001, ANN201
    """Sink family at the 10x decade (VERDICT r10 item 5): write the
    blown events table (1M rows, 6 columns) through ``txn_parquet``
    range-clustered on user_id — per-task Arrow parquet staging + one
    manifest commit — then read a ~10% user_id range back through the
    FORMAT API with pushdown, so the hash covers the full
    write→commit→zone-map-prune→read round trip under whatever memory
    regime the leg imposes. Extra receipt fields record how many
    manifest-listed files the pushed range actually skipped at this
    scale (the write-side repartitionByRange shuffle is also the
    probe's spill surface on the starved leg)."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnParquetDataSource,
        committed_entries,
        register,
        scratch_dir,
    )

    register(spark)
    ev = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).repartitionByRange(32, "user_id")
    target = scratch_dir("spill_sink_")
    ev.write.format("txn_parquet").mode("append").save(target)
    total = len(committed_entries(target))
    lo, hi = 4000, 5499  # ~10% of the blown 0..14999 user span
    src = TxnParquetDataSource(options={"path": target, "pushdown": "true"})
    rd = src.reader(src.schema())
    rd.pushFilters(
        [GreaterThanOrEqual(("user_id",), lo), LessThanOrEqual(("user_id",), hi)]
    )
    kept = len(rd.partitions())
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    back = (
        spark.read.format("txn_parquet")
        .option("pushdown", "true")
        .load(target)
        .where(F.col("user_id").between(lo, hi))
    )
    return back, {"files_total": total, "files_kept_for_range": kept}


def _dv_blowup(spark, sf_dir):  # noqa: ANN001, ANN201
    """Deletion-vector family at the 10x decade (round-12): write the
    blown events table (1M rows) through ``txn_parquet``
    range-clustered on user_id, ``delete_where`` a ~10% user_id band —
    the full-table scan + prior-DV anti-join + position-sidecar write
    all run under whatever memory regime the leg imposes — then read
    the ENTIRE masked table back through the format API (per-partition
    parquet-filtered position loads + vectorized numpy batch masks).
    The hash covers write→delete→mask→read, so a dropped mask, an
    over-mask, or a position mis-address under memory pressure flips
    it. Extra receipt fields record the delete's physical footprint."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        delete_where,
        register,
        scratch_dir,
    )

    register(spark)
    ev = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).repartitionByRange(32, "user_id")
    target = scratch_dir("spill_dv_")
    ev.write.format("txn_parquet").mode("append").save(target)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields
    )
    stats = delete_where(
        spark, target, schema, "user_id BETWEEN 4000 AND 5499"
    )
    back = spark.read.format("txn_parquet").load(target)
    return back, {
        "files_masked": stats["files_masked"],
        "rows_deleted": stats["rows_deleted"],
    }


def child(query: str, sf_dir: str, mem: str, fraction: str,
          shuffle: str | None = None,
          broadcast: str | None = None) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mapreduceframework_cpp_spark.session import RUNTIME_CONFS

    builder = (
        SparkSession.builder.appName(f"spill-probe-{query}")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.driver.memory", mem)
        .config("spark.memory.fraction", fraction)
        # REST metrics need the UI; port 0 avoids clashes with a
        # concurrent session on 4040
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        # The broadcast threshold must scale with executor memory: the
        # engine's 32MB default assumes production-sized executors; on
        # the starved leg a 32MB broadcast cannot even BUILD in a 1.2g
        # JVM ("Not enough memory to build and broadcast"). Catalyst
        # then picks shuffle joins, which spill instead of dying — the
        # exact operational posture an undersized cluster needs.
        .config("spark.sql.autoBroadcastJoinThreshold",
                broadcast or str(32 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if shuffle:
        # fewer, fatter shuffle partitions = more per-task memory
        # pressure at a fixed data size; results are partition-count
        # invariant (pinned suite-wide), so this only changes WHERE
        # the memory ceiling bites
        builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from mapreduceframework_cpp_spark.operators.common import release_persisted
    from mapreduceframework_cpp_spark.registry import all_queries

    extra: dict = {}
    if query == "_sink_blowup":
        df, extra = _sink_blowup(spark, sf_dir)
    elif query == "_dv_blowup":
        df, extra = _dv_blowup(spark, sf_dir)
    else:
        df = all_queries()[query](spark, sf_dir)
    cols = [
        F.round(F.col(f.name), 6).alias(f.name)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    row = (
        df.select(F.xxhash64(*cols).cast("decimal(38,0)").alias("h"))
        # DECIMAL(38) sum: a LONG sum of 64-bit hashes overflows under
        # ANSI; 38 digits hold ~1e19 rows' worth of headroom
        .agg(F.sum("h").cast("string").alias("hs"),
             F.count("*").alias("n"))
        .collect()[0]
    )
    release_persisted()
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages")
    )
    rec = {
        "query": query,
        "mem": mem,
        "fraction": fraction,
        "n_rows": row["n"],
        "hash": row["hs"],
        "memoryBytesSpilled": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "diskBytesSpilled": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "n_stages": len(stages),
        **extra,
    }
    spark.stop()
    print("SPILL_PROBE_RESULT " + json.dumps(rec))


# ---------------------------------------------------------------------------
# parent
# ---------------------------------------------------------------------------

def _run_leg(query: str, sf_dir: str, mem: str, fraction: str,
             shuffle: str | None = None,
             broadcast: str | None = None) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", query,
           "--sf-dir", sf_dir, "--mem", mem, "--fraction", fraction]
    if shuffle:
        cmd += ["--shuffle", shuffle]
    if broadcast:
        cmd += ["--broadcast", broadcast]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("SPILL_PROBE_RESULT "):
            return json.loads(line[len("SPILL_PROBE_RESULT "):])
    # surface the actual failure, not a progress bar: prefer the last
    # Exception/Error-bearing stderr line
    errlines = [
        ln for ln in p.stderr.splitlines()
        if ("Error" in ln or "Exception" in ln) and "[Stage" not in ln
    ] or p.stderr.strip().splitlines() or ["no output"]
    return {
        "query": query, "mem": mem, "fraction": fraction,
        "err": errlines[-1][:400],
        "rc": p.returncode,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--gen-only", action="store_true")
    # build/report the FAIR (constant-pair-density) decade instead of
    # the dense spill decade — used with --gen-only by scale_audit runs
    ap.add_argument("--fair", action="store_true")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--child", metavar="QUERY", default=None)
    # tight defaults found empirically: 900m/0.15 cannot even store the
    # 32MB broadcasts (TorrentBroadcast store failures); 1200m/0.3
    # starves execution enough to force >100MB spills on the dedup
    # family while every broadcast still fits
    ap.add_argument("--mem", default="1200m")
    ap.add_argument("--fraction", default="0.3")
    ap.add_argument("--shuffle", default="8")
    # tight-leg broadcast threshold (parent passes it to the tight
    # child only; a bare --child run keeps the engine's 32MB unless
    # given explicitly)
    ap.add_argument("--broadcast", default=None)
    # -1 = no auto-broadcast on the starved leg: at 1.2g even an 8MB
    # Catalyst-chosen broadcast fails to RESERVE build memory while
    # loop tasks hold the unified pool ("Not enough memory to build
    # and broadcast..."), and Spark's own error text prescribes
    # disabling broadcast as the undersized-cluster workaround. Every
    # join then degrades to shuffle joins that spill instead of dying.
    ap.set_defaults(tight_broadcast="-1")
    ap.add_argument("--roomy-mem", default="6g")
    ap.add_argument("--roomy-fraction", default="0.6")
    args = ap.parse_args()

    if args.child:
        child(args.child, args.sf_dir or ensure_blowup(args.fair), args.mem,
              args.fraction, args.shuffle, args.broadcast)
        return 0

    sf_dir = args.sf_dir or ensure_blowup(args.fair)
    if args.gen_only:
        print(sf_dir)
        return 0

    queries = args.queries or DEFAULT_QUERIES
    rc = 0
    receipt = {"sf_dir": sf_dir, "tight_mem": args.mem,
               "tight_fraction": args.fraction, "queries": {}}
    for q in queries:
        roomy = _run_leg(q, sf_dir, args.roomy_mem, args.roomy_fraction)
        # the tight leg also runs with FEWER shuffle partitions (fatter
        # tasks): more pressure per task, and hash-equality across the
        # two legs then ALSO re-proves partition-count invariance
        tight = _run_leg(q, sf_dir, args.mem, args.fraction, args.shuffle,
                         args.broadcast or args.tight_broadcast)
        ok = (
            "err" not in roomy
            and "err" not in tight
            and roomy["hash"] == tight["hash"]
            and roomy["n_rows"] == tight["n_rows"]
        )
        spill = tight.get("memoryBytesSpilled", 0) + tight.get(
            "diskBytesSpilled", 0
        )
        receipt["queries"][q] = {
            "match": ok,
            "n_rows": roomy.get("n_rows"),
            "tight_spill_bytes": spill,
            "roomy_spill_bytes": roomy.get("memoryBytesSpilled", 0)
            + roomy.get("diskBytesSpilled", 0),
            "tight_err": tight.get("err"),
            "roomy_err": roomy.get("err"),
            **{
                k: tight[k]
                for k in (
                    "files_total", "files_kept_for_range",
                    "files_masked", "rows_deleted",
                )
                if k in tight
            },
        }
        if not ok:
            rc = 1
        print(f"{q}: match={ok} rows={roomy.get('n_rows')} "
              f"tight_spill={spill:,}B tight_err={tight.get('err')}")
    print("SPILL_PROBE_RECEIPT " + json.dumps(receipt))
    return rc


if __name__ == "__main__":
    sys.exit(main())
