"""Data-safety / corpus-hygiene queries (SURVEY.md §2.2-K, round-2
batch 3): the filter-and-route stages that sit in front of every
training-data pipeline — PII redaction, C4/Gopher-style quality gates,
deterministic train/val/test splitting, and source blocklisting.

Kernel lowering: every stage here is an R3 map-side row function
(``MapReduceClient.h:57-59`` — the client map may emit 0..n rows) feeding
an R6/R8 count shape; none of them shuffles anything wider than the
final small aggregate, which is what makes them viable as the FIRST
stage of a 100 TB pass (the full corpus streams through the scan once,
projection-pruned to the needed columns, and only per-group counters
cross the wire).

Cross-engine determinism: regex patterns are restricted to the
Java-regex ∩ RE2 common subset (no backrefs, no lookaround); hashes are
``sha256``/``md5`` hex (lowercase in both engines); ratios divide exact
integers so double comparisons agree bit-for-bit.

The synthetic ``documents.text`` contains no real PII, so
``q_text_pii_scrub`` plants deterministic contact strings derived from
``doc_id`` — IDENTICALLY in the Spark query and the DuckDB oracle — so
the extraction/redaction machinery is exercised for real (the planted
rows are the positive class, untouched rows the negative).

Registered AFTER the round-1 families (see queries/__init__.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: Java-regex ∩ RE2 safe patterns (no backrefs / lookaround).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"

#: Sources dropped by the blocklist gate (q_source_blocklist).
_BLOCKED_SOURCES = ("src4", "src13", "src17")


def _aug_sql() -> str:
    """The PII-planting expression, DuckDB dialect (see module doc)."""
    return (
        "CASE WHEN doc_id % 3 = 0 THEN text || ' reach me at user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com' "
        "WHEN doc_id % 3 = 1 THEN text || ' call 415-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
        "ELSE text END"
    )


def _aug_col() -> F.Column:
    """Same planting expression, Spark side (kept in lockstep with
    :func:`_aug_sql` — the pair IS the query's input contract)."""
    return (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )


@query(
    "q_text_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_aug_sql()} AS t FROM documents),
    red AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS r
      FROM aug
    )
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           md5(r) AS redacted_md5
    FROM red
    """,
)
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction per document: count email/phone
    occurrences, replace them with typed placeholder tokens, emit an
    md5 of the redacted text (compact proof the rewrite is identical
    across engines). Pure JVM regex in one projection — no shuffle at
    all until a downstream consumer aggregates; at 100 TB this is a
    map-only pass fused into the scan stage (kernel: R3 row map,
    ``MapReduceClient.h:57-59``)."""
    aug = tbl(spark, sf_dir, "documents").select("doc_id", _aug_col().alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(F.col("t"), F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
        F.lit(_PHONE_RE),
        F.lit("[PHONE]"),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
    )


@query(
    "q_text_quality_gates",
    oracle="""
    WITH g AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n,
             len(replace(text, ' ', '')) AS nchars_nospace,
             list_contains(string_split(text, ' '), 'the') AS has_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ),
    p AS (
      SELECT lang,
             CAST(n BETWEEN 40 AND 1000 AS INT) AS p_len,
             CAST(CAST(nchars_nospace AS DOUBLE) / n BETWEEN 3 AND 8 AS INT)
               AS p_wl,
             CAST(has_stop AS INT) AS p_stop,
             CAST(CAST(n_distinct AS DOUBLE) / n >= 0.35 AS INT) AS p_dist
      FROM g
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p_len) AS BIGINT) AS pass_len,
           CAST(sum(p_wl) AS BIGINT) AS pass_wordlen,
           CAST(sum(p_stop) AS BIGINT) AS pass_stopword,
           CAST(sum(p_dist) AS BIGINT) AS pass_distinct,
           CAST(sum(p_len * p_wl * p_stop * p_dist) AS BIGINT) AS pass_all
    FROM p GROUP BY lang
    """,
)
def q_text_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality gates per language: document length in
    [40, 1000] words, mean word length in [3, 8], contains a stopword,
    distinct-token ratio >= 0.35 — plus the conjunction. Each gate is
    exact-integer arithmetic (ratios divide exact ints, identical in
    IEEE double both engines); the corpus collapses to one counter row
    per language before anything shuffles (kernel: R3 map + R16
    combiner ≙ partial aggregation)."""
    docs = tbl(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    gated = docs.select(
        "lang",
        (n.between(40, 1000)).cast("int").alias("p_len"),
        (
            (F.length(F.regexp_replace("text", " ", "")).cast("double") / n)
            .between(3, 8)
        )
        .cast("int")
        .alias("p_wl"),
        F.array_contains(words, "the").cast("int").alias("p_stop"),
        ((F.size(F.array_distinct(words)).cast("double") / n) >= 0.35)
        .cast("int")
        .alias("p_dist"),
    )
    return gated.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("p_len").cast("long").alias("pass_len"),
        F.sum("p_wl").cast("long").alias("pass_wordlen"),
        F.sum("p_stop").cast("long").alias("pass_stopword"),
        F.sum("p_dist").cast("long").alias("pass_distinct"),
        F.sum(
            F.col("p_len") * F.col("p_wl") * F.col("p_stop") * F.col("p_dist")
        )
        .cast("long")
        .alias("pass_all"),
    )


@query(
    "q_dataset_split",
    oracle="""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                  WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY lang, split
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash of the document id: the first hex byte of sha256 partitions
    the id space ~90/5/5 ('e6' = 230/256, 'f3' = 243/256). Lexicographic
    compare of lowercase hex is engine-portable (no hex→int conversion
    needed, which DuckDB and Spark spell differently). Reproducible
    under any partitioning, any engine, any run — the property a
    training split must have. Map-side CASE; only (lang, split)
    counters shuffle."""
    h2 = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    split = (
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    )
    return (
        tbl(spark, sf_dir, "documents")
        .select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "q_source_blocklist",
    oracle=f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS kept_tokens
    FROM documents
    WHERE source IS NULL OR source NOT IN {_BLOCKED_SOURCES!r}
    GROUP BY lang
    """,
)
def q_source_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level blocklist (the takedown/robots/opt-out gate): drop
    every document whose source is on a curated blocklist, report the
    surviving volume per language. Implemented as a BROADCAST left-anti
    join against the blocklist table — the shape that scales when the
    blocklist is 10^6 domains rather than an IN literal (Catalyst turns
    a literal IN into a scan filter, but a real blocklist arrives as a
    table; broadcasting it keeps the corpus scan shuffle-free).

    NULL sources survive the gate on both sides: left_anti keeps rows
    whose null key matches nothing, and the oracle says so explicitly
    (bare ``NOT IN`` would evaluate NULL to NULL and silently drop)."""
    blk = spark.createDataFrame(
        [(s,) for s in _BLOCKED_SOURCES], "source string"
    )
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(blk), "source", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


@query(
    "q_dq_audit",
    oracle="""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS orphan_orders,
      (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM
         (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1) d) AS dup_orderkeys,
      (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE o_orderpriority IS NULL) AS null_priority,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
      (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE o_totalprice <= 0) AS nonpos_prices
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the constraint checks a warehouse runs after
    every load: row volume, referential integrity both directions
    (orphan orders / orphan lineitems via anti joins), key uniqueness
    (surplus rows per duplicated key), null-rate and domain checks.
    One row of exact counters; each check is an independent aggregate
    over one scan, composed by single-row cross joins (the established
    scalar-attachment pattern). Checks that find zero violations are
    the point — the report certifies the load."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    li = tbl(spark, sf_dir, "lineitem")

    n_orders = o.agg(F.count("*").alias("n_orders"))
    orphan_orders = (
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    dup_orderkeys = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("long")
            .alias("dup_orderkeys")
        )
    )
    null_priority = o.filter(F.col("o_orderpriority").isNull()).agg(
        F.count("*").alias("null_priority")
    )
    orphan_lineitems = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    nonpos_prices = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("nonpos_prices")
    )
    return (
        n_orders.crossJoin(orphan_orders)
        .crossJoin(dup_orderkeys)
        .crossJoin(null_priority)
        .crossJoin(orphan_lineitems)
        .crossJoin(nonpos_prices)
    )


@query(
    "q_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS group_size,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                  AS BIGINT) AS l_diversity
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, group_size, l_diversity,
           group_size < 5 AS k5_violation,
           l_diversity < 3 AS l3_violation
    FROM qi
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (nation, segment)
    quasi-identifier: groups smaller than k=5 are re-identification
    risks; groups whose sensitive attribute (account-balance band)
    takes fewer than l=3 distinct values leak it even at size ≥ k —
    the release-gate check a privacy review runs before any
    record-level export. ONE exact-count aggregate over the
    quasi-identifier (map-side combinable; |QI-combinations| output
    rows), flags as pure comparisons — the full-scan-once, counters-
    only shape of every safety stage in this module."""
    qi = (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 1000).cast("long")
            ).alias("l_diversity"),
        )
    )
    return qi.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "l_diversity",
        (F.col("group_size") < 5).alias("k5_violation"),
        (F.col("l_diversity") < 3).alias("l3_violation"),
    )


@query(
    "q_dp_counts",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS true_n FROM documents
      GROUP BY 1),
    u AS (
      SELECT lang, true_n,
             (CAST(concat('0x', substr(md5(concat('dp|', lang)), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 AS p
      FROM c)
    SELECT lang, true_n,
           CASE WHEN p < 0.5 THEN ln(2.0 * p)
                ELSE -ln(2.0 * (1.0 - p)) END AS laplace_noise,
           true_n + CASE WHEN p < 0.5 THEN ln(2.0 * p)
                         ELSE -ln(2.0 * (1.0 - p)) END AS dp_n
    FROM u
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release mechanism DEMONSTRATED with a
    seeded draw: per-language doc counts plus Laplace(1/ε, ε=1) noise
    from the inverse CDF of an md5-derived uniform — the same
    derandomization pattern as q_bootstrap_ci (in production the
    uniform comes from a real RNG; the mechanism, sensitivity-1 count
    + b=1/ε Laplace, is exactly this). Aggregate-first (one exact
    count per group), noise attached to the |langs|-row frame; the
    ln() runs on engine-identical doubles so the oracle reproduces the
    draw bit-for-bit."""
    c = (
        tbl(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    p = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp|"), F.col("lang"))), 1, 8),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / F.lit(float(2**32))
    noise = F.when(p < 0.5, F.log(2.0 * p)).otherwise(
        -F.log(2.0 * (1.0 - p))
    )
    return c.select(
        "lang",
        "true_n",
        noise.alias("laplace_noise"),
        (F.col("true_n") + noise).alias("dp_n"),
    )


@query(
    "q_split_leakage",
    oracle="""
    WITH
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
             FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
           FROM toks, unnest(range(1, len(t)-1)) AS u(i) WHERE len(t) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     count(*) AS i
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    jac AS (SELECT doc_id_a, doc_id_b,
                   round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_id_a
            JOIN sz sb ON sb.doc_id = doc_id_b),
    sp AS (SELECT doc_id_a, doc_id_b, jaccard,
                  CASE WHEN substr(sha256(CAST(doc_id_a AS VARCHAR)), 1, 2)
                         < 'e6' THEN 'train'
                       WHEN substr(sha256(CAST(doc_id_a AS VARCHAR)), 1, 2)
                         < 'f3' THEN 'val' ELSE 'test' END AS split_a,
                  CASE WHEN substr(sha256(CAST(doc_id_b AS VARCHAR)), 1, 2)
                         < 'e6' THEN 'train'
                       WHEN substr(sha256(CAST(doc_id_b AS VARCHAR)), 1, 2)
                         < 'f3' THEN 'val' ELSE 'test' END AS split_b
           FROM jac WHERE jaccard >= 0.7)
    SELECT doc_id_a, doc_id_b, jaccard, split_a, split_b
    FROM sp WHERE split_a <> split_b
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage audit: near-duplicate pairs (exact Jaccard
    ≥ 0.7, MinHash-LSH candidates — operators/dedup) that CROSS the
    q_dataset_split boundaries. A val/test doc with a train near-dup
    inflates benchmark scores; this is the release-gate that catches
    it AFTER splitting (q_text_contamination covers external
    benchmarks; this covers the pipeline's own split). Splits are
    recomputed from doc_id's sha256 ON the pair rows — content-
    independent, so no join back to the corpus is needed; the LSH
    candidate set (not all-pairs) bounds the work exactly as in
    q_dedup_near."""
    from mapreduceframework_cpp_spark.operators.common import spread
    from mapreduceframework_cpp_spark.operators.dedup import (
        minhash_lsh_near_dups,
    )

    pairs = minhash_lsh_near_dups(spread(tbl(spark, sf_dir, "documents")))

    def split_of(col: str) -> F.Column:
        h2 = F.substring(F.sha2(F.col(col).cast("string"), 256), 1, 2)
        return (
            F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
        )

    return (
        pairs.select(
            "doc_id_a",
            "doc_id_b",
            "jaccard",
            split_of("doc_id_a").alias("split_a"),
            split_of("doc_id_b").alias("split_b"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )


@query(
    "q_release_pipeline",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, lang, text FROM documents
      WHERE source IS NULL OR source NOT IN {_BLOCKED_SOURCES!r}),
    g AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n
      FROM kept
      WHERE len(string_split(text, ' ')) BETWEEN 40 AND 1000
        AND CAST(len(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) BETWEEN 3 AND 8
        AND list_contains(string_split(text, ' '), 'the')
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.35),
    red AS (
      SELECT doc_id, lang,
             md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}',
                     '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g')) AS rh,
             n AS toks
      FROM g),
    ded AS (
      SELECT min(doc_id) AS doc_id,
             min_by(lang, doc_id) AS lang,
             min_by(toks, doc_id) AS toks
      FROM red GROUP BY rh),
    s AS (
      SELECT lang, toks,
             CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                  WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM ded)
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM s GROUP BY 1, 2
    """,
)
def q_release_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-release flow — blocklist → C4/Gopher quality
    gates → PII redaction → exact dedup of the redacted text →
    deterministic train/val/test split → per-(split, lang) release
    stats — every stage the standalone safety queries verify
    individually, chained the way a real release job runs them. The
    oracle recomposes all five stages in SQL, so the hash match proves
    STAGE ORDER AND INTERACTION, not just each gate alone.

    100 TB shape: blocklist filter, all four gates, the redaction and
    the md5 fingerprint FUSE INTO THE SCAN (one map-only
    whole-stage-codegen pass — the plan has exactly two exchanges:
    the 32-byte-key dedup shuffle and the tiny (split, lang) counter
    shuffle). Dedup ships md5(redacted) + 3 small columns, never
    document text; the split needs no RNG state (sha256 of the
    surviving doc id)."""
    docs = tbl(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    kept = docs.filter(
        F.col("source").isNull() | ~F.col("source").isin(*_BLOCKED_SOURCES)
    )
    g = kept.filter(
        n.between(40, 1000)
        & (F.length(F.regexp_replace("text", " ", "")).cast("double") / n).between(
            3, 8
        )
        & F.array_contains(words, "the")
        & ((F.size(F.array_distinct(words)).cast("double") / n) >= 0.35)
    ).select("doc_id", "lang", "text", n.alias("toks"))
    red = g.select(
        "doc_id",
        "lang",
        "toks",
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
                F.lit(_PHONE_RE),
                F.lit("[PHONE]"),
            )
        ).alias("rh"),
    )
    ded = red.groupBy("rh").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("toks", "doc_id").alias("toks"),
    )
    h2 = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    split = F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    return (
        ded.select("lang", "toks", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
        )
    )
