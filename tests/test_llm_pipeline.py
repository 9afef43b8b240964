"""Operator-level tests for the LLM-data-pipeline extensions
(SURVEY.md §2.2-K): dedup invariants, LSH-vs-exact agreement, text
metrics goldens, multimodal plumbing shape. The end-to-end DuckDB
oracle diffs live in test_oracle_diff.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduceframework_cpp_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_near_dups,
    shingle_sets,
    simhash_near_dups,
)
from mapreduceframework_cpp_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    sample_frames,
)
from mapreduceframework_cpp_spark.operators.similarity import cosine_topk, lsh_topk
from mapreduceframework_cpp_spark.operators.text import (
    fingerprints,
    lang_id,
    token_counts,
)
from mapreduceframework_cpp_spark.sources.tables import tbl


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return tbl(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return tbl(spark, sf_dir, "embeddings").cache()


def test_exact_dedup_partitions_corpus(docs):
    """Dedup groups partition the corpus: copy counts sum to |docs|."""
    groups = exact_dedup_groups(docs)
    agg = groups.agg(
        F.sum("n_copies").alias("total"), F.count("*").alias("n_groups")
    ).first()
    assert agg.total == docs.count()
    assert agg.n_groups <= agg.total


def test_exact_dedup_finds_planted_duplicate(spark):
    dup = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.n_copies for r in exact_dedup_groups(dup).collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_lsh_equals_exact_jaccard(docs):
    """At b=32/r=2 the LSH path must recover exactly the >=0.7 pairs the
    full inverted-index join finds (recall ~1 by the s-curve)."""
    lsh = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in minhash_lsh_near_dups(
            docs, num_hashes=64, bands=32, rows_per_band=2, threshold=0.7
        ).collect()
    }
    exact = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in jaccard_pairs(shingle_sets(docs), threshold=0.7).collect()
    }
    assert lsh == exact
    assert exact, "fixture should contain planted near-duplicates"


def test_simhash_pairs_identical_docs(spark):
    """Identical texts hash to identical fingerprints (hamming 0)."""
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zz yy xx ww")],
        "doc_id long, text string",
    )
    pairs = simhash_near_dups(dup, max_hamming=3).collect()
    assert [(p.doc_id_a, p.doc_id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_lsh_topk_subset_of_true_scores(emb):
    """Approximate top-k may miss neighbors but must never mis-score:
    every (query, cand, cos) it returns appears in the exact scoring."""
    q = emb.filter(F.col("vec_id") % 100 == 0)
    approx = lsh_topk(q, emb, dim=64, k=5, n_planes=8).collect()
    exact_scores = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in cosine_topk(q, emb, k=10_000).collect()
    }
    assert approx, "multiprobe LSH should surface some candidates"
    for r in approx:
        assert exact_scores[(r.query_id, r.cand_id)] == r.cos_sim


def test_token_counts_golden(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42 times")], "doc_id long, text string"
    )
    r = token_counts(df).first()
    # ws: ['Hello,', 'world!', '42', 'times']; re: Hello , world ! 42 times
    assert (r.ws_tokens, r.re_tokens) == (4, 6)


def test_lang_id_schema_and_coverage(docs):
    out = lang_id(docs.limit(50))
    rows = out.collect()
    assert out.columns == ["doc_id", "lang_pred", "lang_score"]
    assert len(rows) == 50
    assert all(r.lang_pred in {"en", "de", "fr", "es", "zh"} for r in rows)


def test_fingerprint_bottom_k(docs):
    rows = fingerprints(docs.limit(20), k=8).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= len(r.fingerprint) <= 8
        assert r.fingerprint == sorted(r.fingerprint)


def test_multimodal_decode_deterministic(docs):
    media = attach_fake_media(docs.limit(30))
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b and len(a) == 30
    for row in a:
        _, mtype, w, h, c, digest = row
        assert mtype in {"image", "audio", "video"}
        assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4
        assert len(digest) == 16


def test_multimodal_feature_shape(docs):
    feats = extract_features(attach_fake_media(docs.limit(10))).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r.feature) == 16
        assert all(0.0 <= x <= 1.0 for x in r.feature)


def test_sample_frames_offsets(docs):
    media = attach_fake_media(docs.limit(30))
    frames = sample_frames(media, every_n_bytes=16)
    per_doc = frames.groupBy("doc_id").count().collect()
    # content is a 64-byte sha hex string -> offsets 0,16,32,48
    assert per_doc and all(r["count"] == 4 for r in per_doc)


def test_dedup_clusters_transitive(spark):
    """a-b and b-c pairs must merge into one cluster labeled min(a)."""
    from mapreduceframework_cpp_spark.operators.dedup import (
        canonical_docs,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (30, 31)], "doc_id_a long, doc_id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 30: 30, 31: 30}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 5, 9, 30, 31)], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id for r in canonical_docs(docs, dedup_clusters(pairs)).collect()
    )
    assert kept == [1, 2, 30]  # singletons pass through, one per cluster
