"""BPE merge learning vs a pure-Python reference + layout invariance."""

from __future__ import annotations

from collections import Counter

from mapreduceframework_cpp_spark.operators.bpe import learn_bpe_merges
from mapreduceframework_cpp_spark.sources.tables import tbl


def _python_bpe(texts, n_merges):
    docs = [t.lower().split(" ") for t in texts]
    merges = []
    for rnd in range(1, n_merges + 1):
        counts = Counter()
        for syms in docs:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += 1
        if not counts:
            break
        # (count DESC, left, right) total order — same as the engine
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, a, b, cnt))
        fused = f"{a} {b}"
        new_docs = []
        for syms in docs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    return merges


def test_bpe_merges_match_python_reference(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    got = sorted(
        map(tuple, learn_bpe_merges(docs, n_merges=5).collect())
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    want = sorted(_python_bpe(texts, 5))
    assert got == want


def test_bpe_fold_handles_overlapping_runs(spark):
    """aaa with merge (a,a) must fuse leftmost-first: [aa, a], the
    classic BPE scan order — a naive pairwise replace would double-use
    the middle symbol."""
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a a a a")], "doc_id long, text string"
    )
    got = {
        (r["merge_round"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=1).collect()
    }
    assert got == {(1, "a", "a", 5)}


def test_bpe_partition_invariant(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    ref = sorted(map(tuple, learn_bpe_merges(docs, n_merges=3).collect()))
    for n in (1, 16):
        got = sorted(
            map(
                tuple,
                learn_bpe_merges(docs.repartition(n), n_merges=3).collect(),
            )
        )
        assert got == ref, f"{n} partitions changed the merge table"
