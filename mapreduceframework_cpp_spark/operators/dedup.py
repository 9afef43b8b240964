"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.2-K).

Exact (hash group-by), n-gram Jaccard, MinHash+LSH, SimHash — all pure
DataFrame compositions (no Python UDFs): hashing via xxhash64/sha2,
shingling via higher-order array functions, banding via explode + group-by.

Scale design:
- Exact dedup shuffles 32-byte digests, not documents.
- MinHash-LSH is the 100 TB near-dup path: signature cost is one pass over
  (doc, shingle) pairs; candidate generation shuffles only (band, hash)
  keys, so cost tracks the number of *colliding* pairs, not n².
- The exact-Jaccard verifier joins on shingles only for candidate pairs
  (or, in the standalone query, over the inverted shingle index — fine at
  test scale, replaced by LSH candidates at real scale).
- SimHash gives a 64-bit per-doc sketch; hamming-band join finds neighbor
  candidates without pairwise comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group documents by content digest: one row per distinct content,
    keeping the smallest doc_id as canonical + the copy count."""
    return (
        docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )


def shingle_sets(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).
    Documents with fewer than ``n`` tokens produce no shingles."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    # Spark array indexing is 0-based; sequence(0, size-n) enumerates
    # every n-gram start
    grams = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame, threshold: float = 0.5, pairs: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard similarity between document pairs sharing ≥1 shingle.

    ``pairs`` (doc_id_a, doc_id_b) restricts computation to candidates
    (the LSH path); otherwise the full inverted-index self-join runs
    (test-scale / small-corpus path).
    """
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingled.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = shingled.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["doc_id_a", "doc_id_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(shingled: DataFrame, num_hashes: int = 128) -> DataFrame:
    """MinHash signature per doc: for seed i, sig[i] = min over shingles of
    xxhash64(shingle, seed=i). One aggregation pass computes all seeds."""
    hashes = F.array(
        *[F.xxhash64(F.col("shingle"), F.lit(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    per_shingle = shingled.select("doc_id", hashes.alias("hs"))
    mins = [F.min(F.col("hs")[i]).alias(f"m{i}") for i in range(num_hashes)]
    sig = per_shingle.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs colliding in ≥1 band.

    s-curve: P(candidate | jaccard=s) = 1 - (1 - s^r)^b; with b=32, r=4
    the 50% threshold sits at s ≈ 0.42 — near-certain capture above 0.7.
    """
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[j * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.select("band", "bucket", F.col("doc_id").alias("doc_id_a"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("doc_id_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )


def minhash_lsh_near_dups(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    rows_per_band: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates, then exact-Jaccard
    verification at ``threshold``. The scale path: no full pairwise join
    ever materializes."""
    shingled = shingle_sets(docs, n=n)
    sigs = minhash_signatures(shingled, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    return jaccard_pairs(shingled, threshold=threshold, pairs=cands)


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document over word tokens (frequency-weighted:
    repeated tokens vote repeatedly). Pure JVM: token explode + 64
    conditional sums + bit reassembly."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fingerprint = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = bit if fingerprint is None else fingerprint.bitwiseOR(bit)
    return votes.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Candidate pairs whose SimHash hamming distance ≤ ``max_hamming``,
    found by exact-matching one of 4 16-bit blocks (pigeonhole: any pair
    within hamming 6 shares at least one intact block... within hamming 3
    guaranteed; 4 blocks is the standard 64-bit recipe)."""
    fp = simhash_fingerprints(docs)
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(blk).alias("blk"),
                        F.shiftright(F.col("simhash"), blk * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for blk in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.blk", "bb.key")
    l = blocks.select("blk", "key", F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sh_a"))
    r = blocks.select("blk", "key", F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sh_b"))
    cands = (
        l.join(r, ["blk", "key"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", "sh_a", "sh_b")
        .distinct()
    )
    return cands.select(
        "doc_id_a",
        "doc_id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
