"""Corpus-curation queries (SURVEY.md §2.2-K, round-2 additions): the
remaining operations a training-data pipeline runs between raw crawl and
training shards — repetition-based quality signals, benchmark
contamination checks, corpus shape histograms, and incremental (batch
vs existing corpus) near-dedup.

Kernel lowering: repetition/length are R3 per-row maps; contamination is
an R6 shuffle on shingle + R8 count; incremental dedup reuses the LSH
banding (map) + bucket group-by (shuffle) of ``operators/dedup`` with the
corpus side as a precomputable index (``MapReduceFramework.cpp:79-149``
computes the same shapes as one-shot jobs; incrementality is what the
reference cannot express and an ingest pipeline needs).

Registered AFTER the round-1 families (see queries/__init__.py): these
must not displace queries queued for driver verification.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.operators.common import spread
from mapreduceframework_cpp_spark.operators.dedup import incremental_near_dups
from mapreduceframework_cpp_spark.operators.multimodal import (
    attach_fake_media,
    sample_frames,
)
from mapreduceframework_cpp_spark.operators.text import (
    contamination_scores,
    repetition_signals,
)
from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: shared DuckDB CTE — distinct word-3-gram shingles (same construction
#: as queries/llm_pipeline._SHINGLE_CTE's `sh` stage)
_SH = """
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
       FROM toks, unnest(range(1, len(t)-1)) AS u(i) WHERE len(t) >= 3)
"""


@query(
    "q_text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
    b AS (SELECT doc_id, tk,
                 list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS bg
          FROM t WHERE len(tk) >= 2)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           round(len(list_distinct(tk)) * 1.0 / len(tk), 6) AS distinct_ratio,
           round(list_max(list_transform(list_distinct(tk),
                 u -> len(list_filter(tk, x -> x = u)))) * 1.0 / len(tk), 6)
             AS top_token_frac,
           round(list_max(list_transform(list_distinct(bg),
                 u -> len(list_filter(bg, x -> x = u)))) * 1.0 / (len(tk) - 1), 6)
             AS top_bigram_frac
    FROM b
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals per document (distinct-token ratio,
    top-token / top-bigram fractions) — the Gopher-style filters that
    drop boilerplate and degenerate pages. All ratios derive from exact
    integers, so round(·, 6) hashes identically across engines."""
    return repetition_signals(tbl(spark, sf_dir, "documents"))


@query(
    "q_text_contamination",
    oracle=f"""
    WITH {_SH},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    c AS (SELECT doc_id, count(*) AS sz,
                 sum(CASE WHEN shingle IN (SELECT shingle FROM bench)
                     THEN 1 ELSE 0 END) AS m
          FROM sh WHERE doc_id % 50 <> 0 GROUP BY doc_id)
    SELECT doc_id,
           CAST(sz AS BIGINT) AS n_shingles,
           CAST(m AS BIGINT) AS n_matched,
           round(m * 1.0 / sz, 6) AS contamination
    FROM c WHERE m * 1.0 / sz >= 0.1
    """,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: every 50th document stands in as
    the held-out eval set; candidate docs whose distinct 3-gram shingles
    overlap it at >=10% are flagged. The benchmark shingle set is
    broadcast (eval suites are tiny next to a 100 TB corpus), so the
    corpus is scanned once with no corpus-side shuffle."""
    docs = tbl(spark, sf_dir, "documents")
    return contamination_scores(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=3,
        threshold=0.1,
    )


@query(
    "q_text_length_hist",
    oracle="""
    SELECT least(CAST(floor(len(string_split(text, ' ')) / 20.0) AS BIGINT), 10)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
    FROM documents GROUP BY 1
    """,
)
def q_text_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-shape histogram: documents bucketed by token count (width
    20, clamped at bucket 10) with per-bucket totals — the sanity plot
    every curation run starts with. Integer-derived values only."""
    docs = tbl(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    return (
        docs.withColumn(
            "bucket", F.least(F.floor(n_toks / 20.0), F.lit(10)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_toks).cast("long").alias("total_tokens"),
            F.round(F.sum("n_chars") / F.count("*"), 6).alias("avg_chars"),
        )
    )


@query(
    "q_sample_hash_per_group",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sha256(CAST(doc_id AS VARCHAR))) AS rk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM h WHERE rk <= 5
    """,
)
def q_sample_hash_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: the 5 documents per language
    with the smallest content-independent hash of their id — a uniform
    sample that is reproducible across engines, runs and partitionings
    (unlike Bernoulli ``sampleBy``, q_sample_stratified, whose draw is
    engine-specific). The pattern scales: rank-by-hash is one window
    over the stratum key, no global sort, no driver RNG state."""
    docs = tbl(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.sha2(F.col("doc_id").cast("string"), 256))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "q_mm_frames",
    oracle="""
    SELECT doc_id, CAST(u.o AS BIGINT) AS frame_offset
    FROM documents, unnest([0, 16, 32, 48]) AS u(o)
    WHERE doc_id % 3 = 2
    """,
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled byte offset of
    each video row's payload, generated executor-side (sequence+explode
    over the metadata length — the shape an ffmpeg-backed sampler
    produces, with the decode stubbed like the rest of the multimodal
    path). Fake payloads are 64 bytes, so offsets are 0/16/32/48, which
    the oracle states directly."""
    media = attach_fake_media(tbl(spark, sf_dir, "documents"))
    frames = sample_frames(media, every_n_bytes=16)
    return frames.select("doc_id", F.col("frame_offset").cast("long").alias("frame_offset"))


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_SH},
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    jac AS (SELECT doc_id_a, doc_id_b,
                   i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_id_a
            JOIN sz sb ON sb.doc_id = doc_id_b),
    bound AS (SELECT CAST(floor((max(doc_id) + 1) * 0.8) AS BIGINT) AS b
              FROM documents),
    d AS (SELECT doc_id_b AS doc_id, min(doc_id_a) AS dup_of
          FROM jac, bound WHERE jaccard >= 0.7 AND doc_id_b >= b GROUP BY 1)
    SELECT doc.doc_id,
           CASE WHEN d.dup_of IS NULL THEN 'new'
                WHEN d.dup_of < bound.b THEN 'dup_of_corpus'
                ELSE 'dup_in_batch' END AS status,
           d.dup_of
    FROM documents doc CROSS JOIN bound
    LEFT JOIN d ON d.doc_id = doc.doc_id
    WHERE doc.doc_id >= bound.b
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the newest 20% of documents (by doc_id)
    arrive as a batch against the older 80% corpus. Each batch doc is
    classified 'dup_of_corpus' / 'dup_in_batch' / 'new' with its minimal
    matching doc. LSH candidates come from batch-vs-corpus-index and
    batch-internal banding only — corpus×corpus pairs are never
    generated, which is what makes per-batch cost O(batch) at 100 TB.
    Same b=32/r=2 recall argument as q_dedup_near, so the exact-Jaccard
    oracle hash-matches."""
    docs = tbl(spark, sf_dir, "documents")
    bound = docs.agg(
        F.floor((F.max("doc_id") + 1) * 0.8).cast("long").alias("_bound")
    )
    # spread the SCAN before the broadcast bound attaches: once the
    # crossJoin is in the plan, the operator-level spread() inside
    # incremental_near_dups no-ops (exchange-bearing input, r6 guard),
    # so the compute-bound shingle/minhash stages would inherit the
    # byte-narrow scan width (measured 1.7 → 2.9 s at sf0.1 when this
    # was missed). The broadcast join preserves the partitioning.
    with_b = spread(docs).crossJoin(F.broadcast(bound))
    corpus = with_b.filter(F.col("doc_id") < F.col("_bound")).drop("_bound")
    batch = with_b.filter(F.col("doc_id") >= F.col("_bound"))
    pairs = incremental_near_dups(
        corpus, batch.drop("_bound"), n=3, bands=32, rows_per_band=2, threshold=0.7
    )
    dup = pairs.groupBy("doc_id_b").agg(F.min("doc_id_a").alias("dup_of"))
    return (
        batch.select("doc_id", "_bound")
        .join(dup, batch.doc_id == dup.doc_id_b, "left")
        .select(
            "doc_id",
            F.when(F.col("dup_of").isNull(), "new")
            .when(F.col("dup_of") < F.col("_bound"), "dup_of_corpus")
            .otherwise("dup_in_batch")
            .alias("status"),
            "dup_of",
        )
    )


@query(
    "q_dedup_editdist",
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars // 32 AS bkt,
                      substr(lower(text), 1, 64) AS pfx
               FROM documents)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 16
    """,
)
def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection with blocking — the character-
    level modality (catches small in-place edits that shift every
    word-shingle, where Jaccard/MinHash under-score). Quadratic
    levenshtein is only viable under two scale guards: (1) candidate
    pairs are blocked on (lang, 32-char length bucket) — an equi-key
    the shuffle co-locates, so comparisons never cross blocks and the
    pair count is sum of per-block squares, not corpus-squared;
    (2) the distance runs over a fixed 64-char prefix, bounding each
    comparison at 64x64 cells. Both engines implement the standard
    Wagner-Fischer distance, so scores agree exactly. The blocking
    deliberately misses cross-bucket pairs (documented recall
    tradeoff; MinHash-LSH is the recall path — this one is precision
    on candidate neighbourhoods).

    Scale caveat (measured, r10 fair-decade audit): the block key
    space (lang × length bucket) is FIXED, so per-block density grows
    linearly with corpus size and pair work quadratically — 27x wall
    time per 10x decade on constant-pair-density data. This is the
    declared contract of the precision modality, listed in
    tools/scale_audit.DECLARED_SUPERLINEAR; at 100 TB you run it on
    LSH-candidate neighbourhoods (q_dedup_near's output), never the
    raw corpus."""
    from mapreduceframework_cpp_spark.operators.common import spread

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / F.lit(32)).cast("long").alias("bkt"),
        F.substring(F.lower(F.col("text")), 1, 64).alias("pfx"),
    )
    # the probe side must be spread to full parallelism: the narrow doc
    # scan arrives in O(file-size) partitions, but the pair×levenshtein
    # stage is compute-bound (see operators/common.spread)
    d = spread(d, "doc_id")
    a = d.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("lang").alias("lang_a"),
        F.col("bkt").alias("bkt_a"),
        F.col("pfx").alias("pfx_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("lang").alias("lang_b"),
        F.col("bkt").alias("bkt_b"),
        F.col("pfx").alias("pfx_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("bkt_a") == F.col("bkt_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b")),
        )
        .withColumn(
            # banded DP (threshold arg): O(k·n) cells instead of O(n²),
            # returns -1 past the band — same distances for kept pairs
            "edit_dist",
            F.levenshtein(F.col("pfx_a"), F.col("pfx_b"), 17).cast("long"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= 16))
        .select("doc_id_a", "doc_id_b", "edit_dist")
    )


@query(
    "q_dedup_bow",
    oracle="""
    WITH f AS (
      SELECT lang,
             md5(array_to_string(
                 list_sort(string_split(lower(trim(text)), ' ')[1:20]),
                 ' ')) AS fp
      FROM documents
    ), g AS (SELECT lang, fp, CAST(count(*) AS BIGINT) AS sz
             FROM f GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(sz) - count(*) AS BIGINT) AS n_dup_docs
    FROM g GROUP BY lang
    """,
)
def q_dedup_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words head fingerprint dedup: the first 20 tokens,
    SORTED, hashed — word-order-invariant, so it catches shuffled or
    re-templated boilerplate heads that defeat exact hashing (every
    permutation has a distinct md5) without paying MinHash. Per-lang
    dup-mass report. Scale shape: one narrow (lang, 16-byte fp) pair
    per doc crosses the wire — the document text never shuffles; both
    group-bys are partial-agg friendly. Sorting is byte-order in both
    engines (UTF-8 byte order == code-point order), so fingerprints
    agree cross-engine."""
    f = tbl(spark, sf_dir, "documents").select(
        "lang",
        F.md5(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.slice(F.split(F.lower(F.trim(F.col("text"))), " "), 1, 20)
                ),
            )
        ).alias("fp"),
    )
    g = f.groupBy("lang", "fp").agg(F.count("*").alias("sz"))
    return g.groupBy("lang").agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_groups"),
        (F.sum("sz") - F.count("*")).cast("long").alias("n_dup_docs"),
    )


@query(
    "q_doc_chunks",
    oracle="""
    WITH g AS (
      SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(greatest(0, floor((n_chars - 1) / 96)) AS BIGINT))) AS k
      FROM documents)
    SELECT doc_id, k AS chunk_id,
           substr(text, CAST(1 + 96 * k AS INTEGER), 128) AS chunk_text,
           CAST(length(substr(text, CAST(1 + 96 * k AS INTEGER), 128))
                AS BIGINT) AS chunk_len
    FROM g
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking: every document split into 128-char
    windows with a 32-char overlap (stride 96) — the standard pre-
    tokenization step that turns variable-length documents into
    bounded model inputs. Pure JVM ``sequence``+``explode``+
    ``substring`` (no Python in the path); chunk count derives from the
    stored n_chars, so the explode fan-out is known to the optimizer
    and the output inherits the scan's partitioning (no shuffle at
    all — a map-only pass even at 100 TB)."""
    return _doc_chunks(tbl(spark, sf_dir, "documents"))


def _doc_chunks(docs: DataFrame) -> DataFrame:
    """128-char / stride-96 window explode (see q_doc_chunks)."""
    d = docs.select("doc_id", "text", "n_chars")
    n_chunks_last = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("n_chars") - 1) / 96).cast("long"),
    )
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks_last)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr("substring(text, CAST(1 + 96 * chunk_id AS INT), 128)").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


@query(
    "q_chunk_dedup",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             substr(text, CAST(1 + 96 * k AS INTEGER), 128) AS chunk_text
      FROM documents,
           unnest(generate_series(
             0, CAST(greatest(0, floor((n_chars - 1) / 96)) AS BIGINT)))
             AS t(k)),
    f AS (SELECT doc_id, chunk_text FROM g WHERE length(chunk_text) = 128)
    SELECT sha256(chunk_text) AS chunk_hash,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM f
    GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate detection: exact dedup at CHUNK
    granularity — full-width 128-char windows repeated across (or
    within) documents surface shared headers/footers/templates that
    whole-document dedup can never see. The shuffle carries 32-byte
    chunk digests, not text (the q_dedup_exact discipline applied to
    the q_doc_chunks explode)."""
    chunks = _doc_chunks(tbl(spark, sf_dir, "documents")).filter(
        F.col("chunk_len") == 128
    )
    return (
        chunks.groupBy(F.sha2("chunk_text", 256).alias("chunk_hash"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


@query(
    "q_dataset_card",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_unique_texts,
           CAST(count(*) - count(DISTINCT sha256(text)) AS BIGINT)
             AS n_exact_dupes,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM documents
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the header block of a corpus datasheet —
    document/language/source counts, token and char volume, exact-dup
    count (via content digests, so the distinct runs over 32-byte
    hashes) and length envelope. ONE aggregate pass; every
    count-distinct is over a low-cardinality or digest column, and the
    single output row is the only thing that leaves the executors."""
    docs = tbl(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    digest = F.sha2("text", 256)
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(n_toks).cast("long").alias("total_tokens"),
        F.countDistinct(digest).alias("n_unique_texts"),
        (F.count("*") - F.countDistinct(digest)).alias("n_exact_dupes"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "q_sample_balanced",
    oracle="""
    WITH m AS (SELECT min(cnt) AS k
               FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY sha256(CAST(doc_id AS VARCHAR)))
                   AS rk
          FROM documents)
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM r, m WHERE rk <= m.k
    """,
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language reduced to the size
    of the SMALLEST class (the mixture-equalization step before
    training on imbalanced corpora), selecting by id-hash rank so the
    draw is uniform, reproducible across engines/runs/partitionings,
    and incremental-friendly. The min-class scalar broadcasts from a
    1-row aggregate; selection is one rank window per class."""
    docs = tbl(spark, sf_dir, "documents")
    m = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").alias("k"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256)
    )
    r = docs.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rk")
    )
    return r.crossJoin(F.broadcast(m)).filter(
        F.col("rk") <= F.col("k")
    ).select("doc_id", "lang", "rk")


@query("q_tok_bpe_merges")  # rows-only: iterative vocabulary induction
def q_tok_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning over the corpus (operators/bpe.py): 5 rounds
    of count-adjacent-pairs → merge-everywhere — the tokenizer-training
    loop, distributed (pair-count shuffles are vocabulary-sized; the
    merge is an executor-side array fold; the per-round winner is a
    1-row broadcast). Rows-only: iterative; pytest checks the merge
    table against a pure-Python reference BPE on the same documents
    (tests/test_bpe.py) plus partition invariance of the round
    winners."""
    from mapreduceframework_cpp_spark.operators.bpe import learn_bpe_merges

    return learn_bpe_merges(tbl(spark, sf_dir, "documents"), n_merges=5)


#: frozen "pretrained" merge table for q_tok_bpe_encode — ordered, with
#: merge 5 cascading onto merge 1's fused symbol, like a real
#: tokenizer's merge list. (Top corpus pairs; each fires at sf0.01.)
_BPE_MERGES = [
    ("table", "hash"),
    ("part", "filter"),
    ("customer", "join"),
    ("merge", "group"),
    ("table hash", "agg"),
]


def _bpe_oracle() -> str:
    """DuckDB reformulation of the merge fold: tokens joined with DOUBLE
    unit separators; each merge is a left-to-right non-overlapping
    string replace of ␟a␟␟b␟ with ␟a b␟ (the pattern consumes one
    separator per side, so back-to-back pair occurrences still match —
    the classic BPE scan order, stated string-wise instead of
    fold-wise)."""
    sep = "chr(31)"
    s = f"{sep} || {sep} || replace(lower(text), ' ', {sep} || {sep}) || {sep} || {sep}"
    for a, b in _BPE_MERGES:
        pat = f"{sep} || '{a}' || {sep} || {sep} || '{b}' || {sep}"
        rep = f"{sep} || '{a} {b}' || {sep}"
        s = f"replace({s}, {pat}, {rep})"
    return f"""
    WITH enc AS (
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_raw,
             len(string_split({s}, {sep} || {sep})) - 2 AS n_bpe
      FROM documents)
    SELECT doc_id, CAST(n_raw AS BIGINT) AS n_raw,
           CAST(n_bpe AS BIGINT) AS n_bpe,
           CAST(n_raw - n_bpe AS BIGINT) AS n_merged
    FROM enc
    """


@query("q_tok_bpe_encode", oracle=_bpe_oracle())
def q_tok_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE *encoding* with a frozen merge table (operators/bpe.py:
    encode_with_merges) — the inference half of the tokenizer story:
    train merges once (q_tok_bpe_merges), apply them to the full corpus
    here. Five ordered merges (the last cascades onto the first's fused
    symbol) run as pure JVM array-fold map passes — zero shuffles, no
    Python, embarrassingly parallel at 100 TB. Reports per-doc raw vs
    encoded token counts. The oracle restates the leftmost-first
    non-overlapping fold as doubled-separator string replaces — two
    independent formulations of BPE scan order, cross-checked."""
    from mapreduceframework_cpp_spark.operators.bpe import encode_with_merges

    enc = encode_with_merges(tbl(spark, sf_dir, "documents"), _BPE_MERGES)
    # n_raw recovers from the encoded symbols alone (a k-way fused
    # symbol carries k-1 internal spaces), so no second scan / join
    n_raw = F.aggregate(
        F.transform("syms", lambda s: F.size(F.split(s, " "))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return enc.select(
        "doc_id",
        n_raw.cast("long").alias("n_raw"),
        F.size("syms").cast("long").alias("n_bpe"),
        (n_raw - F.size("syms")).cast("long").alias("n_merged"),
    )


#: markup-planting expression (DuckDB dialect): the synthetic corpus
#: carries no HTML, so the cleaning stage gets deterministic dirty
#: input the same way the PII family plants addresses
#: (queries/safety.py:_aug_sql) — the Spark twin below stays in
#: lockstep; the pair IS the input contract.
_MARKUP_SQL = (
    "CASE WHEN doc_id % 4 = 0 THEN '<p class=\"x\">' || text "
    "|| '</p>&nbsp;<br/>' "
    "WHEN doc_id % 4 = 1 THEN replace(text, ' the ', '  the   ') "
    "ELSE text END"
)


def _markup_col() -> F.Column:
    return (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('<p class="x">'), F.col("text"), F.lit("</p>&nbsp;<br/>")
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.replace(F.col("text"), F.lit(" the "), F.lit("  the   ")),
        )
        .otherwise(F.col("text"))
    )


@query(
    "q_text_clean",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_MARKUP_SQL} AS t FROM documents),
    c AS (
      SELECT doc_id, t,
             trim(regexp_replace(regexp_replace(regexp_replace(t,
                    '<[^>]+>', '', 'g'),
                    '&[a-z]+;', ' ', 'g'),
                    '[ ]+', ' ', 'g')) AS clean
      FROM aug)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS len_dirty,
           CAST(len(clean) AS BIGINT) AS len_clean,
           md5(clean) AS clean_md5
    FROM c
    """,
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style text cleaning: strip HTML tags, decode-or-drop
    entities, collapse runs of spaces, trim — the first transform of
    every web-scrape ingest. Markup is planted deterministically
    (doc_id % 4 — the corpus itself is clean), then THREE chained JVM
    regexes + trim run map-only, fused into the scan; the md5 of the
    cleaned text proves the rewrite byte-identical across engines
    (same regex subset: no lookaround, ASCII classes only). Kernel:
    R3 row map — regex-heavy per row, so the byte-narrow scan spreads
    to full width first (r5 width lesson)."""
    from mapreduceframework_cpp_spark.operators.common import spread

    aug = spread(tbl(spark, sf_dir, "documents")).select(
        "doc_id", _markup_col().alias("t")
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), F.lit("<[^>]+>"), F.lit("")),
                F.lit("&[a-z]+;"),
                F.lit(" "),
            ),
            F.lit("[ ]+"),
            F.lit(" "),
        )
    )
    return aug.select(
        "doc_id",
        F.length("t").cast("long").alias("len_dirty"),
        F.length(clean).cast("long").alias("len_clean"),
        F.md5(clean).alias("clean_md5"),
    )


@query(
    "q_text_collapse_runs",
    oracle="""
    WITH arr AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    toks AS (
      SELECT doc_id, t[i] AS w, i
      FROM arr, unnest(range(1, len(t) + 1)) AS u(i)),
    keep AS (
      SELECT doc_id, w, i,
             lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM toks)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_before,
           CAST(sum(CASE WHEN prev IS NULL OR prev <> w THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after,
           md5(string_agg(w, ' ' ORDER BY i)
               FILTER (WHERE prev IS NULL OR prev <> w)) AS collapsed_md5
    FROM keep GROUP BY doc_id
    """,
)
def q_text_collapse_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate token collapse ("the the the" → "the") —
    the repetition normalizer that runs after boilerplate stripping
    (q_text_repetition MEASURES runs; this removes them). The Spark
    path is SHUFFLE-FREE: an index-aware array lambda
    (``filter(t, (x, i) -> i = 0 OR x <> t[i-1])``) collapses runs
    inside each row during the scan. The oracle deliberately takes the
    other formulation — explode WITH ORDINALITY + lag window +
    order-preserving string_agg — so the hash match cross-checks two
    independent algorithms, not one transliteration. The array lambda
    re-indexes the split per element (quadratic-ish per row), so the
    byte-narrow scan spreads to full width first (r5 width lesson;
    1.33 s → 0.27 s at sf0.1)."""
    from mapreduceframework_cpp_spark.operators.common import spread

    docs = spread(tbl(spark, sf_dir, "documents"))
    t = F.split(F.col("text"), " ")
    kept = F.expr("filter(split(text, ' '), (x, i) -> i = 0 OR x != split(text, ' ')[i - 1])")
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_before"),
        F.size(kept).cast("long").alias("n_after"),
        F.md5(F.array_join(kept, " ")).alias("collapsed_md5"),
    )


@query(
    "q_tok_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents),
    freq AS (SELECT t, count(*) AS n FROM tok GROUP BY 1),
    vocab AS (
      SELECT t FROM (
        SELECT t, row_number() OVER (ORDER BY n DESC, t) AS rn FROM freq)
      WHERE rn <= 100),
    cov AS (
      SELECT tok.lang,
             count(*) AS n_tokens,
             sum(CASE WHEN vocab.t IS NOT NULL THEN 1 ELSE 0 END) AS in_vocab
      FROM tok LEFT JOIN vocab ON vocab.t = tok.t
      GROUP BY 1)
    SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(in_vocab AS BIGINT) AS in_vocab,
           CAST(n_tokens - in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS oov_rate
    FROM cov
    """,
)
def q_tok_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-governance metric: out-of-vocabulary rate per language
    against a frozen top-100 corpus vocabulary — the coverage audit run
    before committing a tokenizer (a language whose OOV rate spikes is
    about to be shredded into bytes). The vocabulary ranks the
    vocabulary-sized frequency aggregate (count DESC, token tie-break —
    deterministic cut), broadcasts into a left join against the token
    stream, and coverage reduces to two counters per language. Two
    passes over the exploded tokens, both partial-agg combinable; the
    OOV rate is one exact-integer division."""
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "t")
    vocab = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("t", F.lit(1).alias("in_v"))
    )
    cov = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_v"), F.lit(0))).alias("in_vocab"),
        )
    )
    return cov.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("in_vocab").cast("long").alias("in_vocab"),
        (
            (F.col("n_tokens") - F.col("in_vocab")).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("oov_rate"),
    )
