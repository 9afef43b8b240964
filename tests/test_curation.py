"""Shard-assembly family (queries/curation.py): semantic invariants
beyond the oracle diff — budget conservation for packing, share
normalization for mixtures, rank/shape laws for TF-IDF and embedding
aggregates."""

from __future__ import annotations

from collections import defaultdict

from mapreduceframework_cpp_spark.queries.curation import _SHARD_BUDGET
from mapreduceframework_cpp_spark.registry import all_queries

_Q = all_queries()


def test_pack_shards_budget_and_contiguity(spark, sf_dir):
    """A shard's token total stays under budget + its largest doc (the
    doc that spilled opens the next shard); shard ids per language are
    contiguous from 0; every document is assigned exactly once."""
    rows = _Q["q_tok_pack_shards"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    shards = defaultdict(list)
    for r in rows:
        shards[(r.lang, r.shard)].append(r.n_tokens)
    for lang in {r.lang for r in rows}:
        ids = sorted(s for (l, s) in shards if l == lang)
        assert ids == list(range(len(ids))), (lang, ids)
    for key, toks in shards.items():
        assert sum(toks) < _SHARD_BUDGET + max(toks), (key, sum(toks))


def test_corpus_mixture_shares_normalize(spark, sf_dir):
    rows = _Q["q_corpus_mixture"](spark, sf_dir).collect()
    per_lang = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.token_share <= 1.0
        per_lang[r.lang] += r.token_share
    for lang, total in per_lang.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


def test_tfidf_topk_shape_and_order(spark, sf_dir):
    rows = _Q["q_text_tfidf"](spark, sf_dir).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    for doc_id, rs in per_doc.items():
        assert 1 <= len(rs) <= 3
        scores = [r.tfidf for r in rs]
        # registered order within a doc is rank order (query sorts by
        # quantized score desc) — Spark preserves it per partition but
        # collect order across docs is free; within-doc we re-sort by
        # score and expect no more than 3 distinct ranks anyway
        assert sorted(scores, reverse=True)[0] == max(scores)
        assert all(r.tf >= 1 for r in rs)


def test_emb_centroid_shape(spark, sf_dir):
    rows = _Q["q_emb_centroid"](spark, sf_dir).collect()
    per_label = defaultdict(set)
    n_by_label = {}
    for r in rows:
        per_label[r.label].add(r.pos)
        n_by_label[r.label] = r.n
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pyspark.sql.functions as F

    counts = {r.label: r.c for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()}
    for label, poses in per_label.items():
        assert poses == set(range(64)), label
        assert n_by_label[label] == counts[label]


def test_emb_norm_stats_bounds(spark, sf_dir):
    for r in _Q["q_emb_norm_stats"](spark, sf_dir).collect():
        assert 0.0 <= r.min_norm <= r.avg_norm <= r.max_norm


def test_count_min_guarantees(spark, sf_dir):
    """CMS invariants vs exact counts on the real corpus: estimates
    never undercount, and with w=1024 » vocabulary the overestimate is
    collision-only (bounded by d·eps·N in general; near-zero here)."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.operators.sketch import (
        count_min_counters,
        count_min_estimate,
    )
    from mapreduceframework_cpp_spark.sources.tables import tbl

    toks = tbl(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    counters = count_min_counters(toks, "token", depth=4, width=1024)
    est = {
        r.key: r.est
        for r in count_min_estimate(counters, toks, "token").collect()
    }
    exact = {
        r.token: r.c
        for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    over = {k: est[k] - exact[k] for k in exact}
    assert all(v >= 0 for v in over.values()), "CMS undercounted"
    # eps = e/w; allow the standard bound with d-way min
    import math

    bound = math.e / 1024 * n_total
    assert all(v <= bound for v in over.values()), (max(over.values()), bound)
    # counter table is genuinely sublinear
    assert counters.count() <= 4 * 1024


def test_count_min_partition_invariance(spark, sf_dir):
    """Counter tables and estimates are exact integers under any input
    partitioning (the sketch is a sum — order-free)."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.operators.sketch import (
        count_min_counters,
        count_min_estimate,
    )
    from mapreduceframework_cpp_spark.sources.tables import tbl

    toks = tbl(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    outs = []
    for parts in (1, 4, 16):
        counters = count_min_counters(toks.repartition(parts), "token")
        est = count_min_estimate(counters, toks, "token")
        outs.append(sorted((r.key, r.est) for r in est.collect()))
    assert outs[0] == outs[1] == outs[2]


def test_js_divergence_bounded_and_deterministic(spark, oracle_sf_dir):
    """0 <= JSD <= 1 bit (base-2 JSD bound), vocab_union > 0, and the
    quantized-term sum must reproduce bit-identically across runs."""
    from mapreduceframework_cpp_spark.registry import all_queries

    jsd = all_queries()["q_text_js_divergence"]
    row = jsd(spark, oracle_sf_dir).collect()[0]
    assert 0.0 <= row.js_divergence <= 1.0
    assert row.vocab_union > 0
    row2 = jsd(spark, oracle_sf_dir).collect()[0]
    assert row.js_divergence == row2.js_divergence


def test_balanced_sample_equal_classes(spark, oracle_sf_dir):
    """Every language must come out at exactly the min class size."""
    from mapreduceframework_cpp_spark.registry import all_queries
    from mapreduceframework_cpp_spark.sources.tables import tbl

    out = all_queries()["q_sample_balanced"](spark, oracle_sf_dir)
    sizes = {r.lang: r.cnt for r in out.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    docs = tbl(spark, oracle_sf_dir, "documents")
    k = min(
        r.cnt
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    )
    assert set(sizes.values()) == {k}, sizes
