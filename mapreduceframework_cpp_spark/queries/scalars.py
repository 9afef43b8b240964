"""Scalar function queries (SURVEY.md §2.2-H): string / regexp / split /
date / math / json / array / map.

Kernel lowering: all are R3 map-side row functions
(``MapReduceClient.h:57-59``) — narrow transforms, no shuffle except the
final small aggregations; everything stays inside WholeStageCodegen (no
Python UDFs here).

Cross-engine discipline: regex patterns valid in both Java and RE2
dialects; ln/pow rounded (libm last-ulp differences); sqrt/abs/ceil/floor
are IEEE-exact so left raw; map results observed through deterministic
scalar lookups (map iteration order is engine-specific).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_name, ':', c_mktsegment) AS name_seg,
           trim(c_name) AS name_trim,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
    )


@query(
    "q_str_regexp",
    oracle="""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, 'w.*t') AS has_w_t,
           (p_name LIKE '%red%') AS like_red
    FROM part
    """,
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patterns chosen to mean the same thing in Java and RE2 regex
    dialects; Spark regexp_replace is global by default, DuckDB needs the
    'g' flag."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("w.*t").alias("has_w_t"),
        F.col("p_name").like("%red%").alias("like_red"),
    )


@query(
    "q_str_split_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def q_str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → word count (≙ R4 emit2 multi-emit,
    ``MapReduceFramework.cpp:172-175``)."""
    return (
        tbl(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INTEGER)
               AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.add_months(F.col("o_orderdate"), 3).alias("plus_3mo"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 0) AS price_round,
           abs(o_totalprice - 250000) AS dist_mid,
           ceil(o_totalprice / 1000) AS price_ceil_k,
           floor(o_totalprice / 1000) AS price_floor_k,
           sqrt(o_totalprice) AS price_sqrt,
           round(ln(o_totalprice), 6) AS price_ln,
           round(pow(o_totalprice / 100000, 2), 6) AS price_pow
    FROM orders
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/abs are correctly-rounded IEEE ops (safe raw); ln/pow go
    through round(...,6) because libm implementations differ in the last
    ulp across engines. ceil/floor returns are DOUBLE in DuckDB for double
    input — matched by keeping them double here."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 0).alias("price_round"),
        F.abs(F.col("o_totalprice") - 250000).alias("dist_mid"),
        F.ceil(F.col("o_totalprice") / 1000).cast("double").alias("price_ceil_k"),
        F.floor(F.col("o_totalprice") / 1000).cast("double").alias("price_floor_k"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("o_totalprice") / 100000, 2), 6).alias("price_pow"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", "user_id", k.alias("k")).filter(F.col("k") > 50)


@query(
    "q_json_variant",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via the VARIANT type (Spark 4): ``props`` is
    parsed ONCE into a binary variant and fields are extracted with
    ``variant_get`` — at 100 TB this beats per-field ``get_json_object``
    re-parsing (one parse, many typed extractions, with shredded-read
    potential in the parquet writer). Aggregates per k-decade so the
    oracle (plain JSON extraction in DuckDB) checks the full decode
    path, not string round-trips of the variant itself."""
    ev = tbl(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select(k.alias("_k"))
        .filter(F.col("_k").isNotNull())
        .groupBy(F.floor(F.col("_k") / 10).cast("long").alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_k").cast("long").alias("sum_k"),
        )
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(len(words) AS INTEGER) AS n_words,
           words[1] AS first_word,
           list_contains(words, 'red') AS has_red,
           array_to_string(words[1:2], '|') AS first_two,
           array_to_string(list_sort(words), '|') AS sorted_words,
           array_to_string(list_sort(list_distinct(words)), '|') AS distinct_words
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: size / element access / contains / slice /
    sort / distinct. array_distinct output is re-sorted in both engines
    (first-occurrence order vs engine-specific order otherwise), and the
    array-valued results are '|'-joined in BOTH engines: the external
    verifier's canonicalizer sorts on column values, so the final
    projection must emit scalars, not arrays."""
    p = tbl(spark, sf_dir, "part").select(
        "p_partkey", F.split(F.col("p_name"), " ").alias("words")
    )
    return p.select(
        "p_partkey",
        F.size("words").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.array_contains("words", "red").alias("has_red"),
        F.concat_ws("|", F.slice("words", 1, 2)).alias("first_two"),
        F.concat_ws("|", F.array_sort("words")).alias("sorted_words"),
        F.concat_ws("|", F.array_sort(F.array_distinct("words"))).alias(
            "distinct_words"
        ),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT user_id,
           count(DISTINCT event_type) AS n_types,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS clicks,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
                AS BIGINT) AS purchases
    FROM events
    GROUP BY user_id
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build map(event_type → count) per user with
    map_from_entries, then observe it through deterministic scalar lookups
    (size + element_at) — the map column itself has engine-specific
    iteration order, the lookups don't, which is what makes this
    SQL-oracle-checkable."""
    ev = tbl(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return with_map.select(
        "user_id",
        F.size("type_counts").cast("long").alias("n_types"),
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias(
            "purchases"
        ),
    )


@query(
    "q_str_distance",
    oracle="""
    SELECT p_partkey, levenshtein(p_name, p_type) AS name_type_dist,
           levenshtein(lower(p_brand), lower(p_name)) AS brand_name_dist
    FROM part
    """,
)
def q_str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance functions (fuzzy matching / dedup building block)."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
        F.levenshtein(F.lower("p_brand"), F.lower("p_name")).alias("brand_name_dist"),
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS leaf, p_partkey AS node, 0 AS depth
      FROM part WHERE p_partkey % 37 = 0
      UNION ALL
      SELECT leaf, node // 2 AS node, depth + 1
      FROM anc WHERE node > 0
    )
    SELECT leaf,
           CAST(max(depth) AS BIGINT) AS depth_to_root,
           CAST(count(*) AS BIGINT) AS chain_len
    FROM anc GROUP BY 1
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): ancestor walk over
    the implicit binary-tree hierarchy node→node div 2, per sampled
    leaf — the hierarchy/transitive-closure surface (org charts, BOM
    explosions, category trees) that previously required driver-side
    iteration (cf. operators/dedup.dedup_clusters, which hand-rolls the
    same fixpoint for components). The engine iterates UNION ALL steps
    to fixpoint; depth is bounded at log2(max partkey) ≈ 20, and each
    step is a filtered projection of the tiny frontier."""
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part_rcte")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT p_partkey AS leaf, p_partkey AS node, 0 AS depth
          FROM part_rcte WHERE p_partkey % 37 = 0
          UNION ALL
          SELECT leaf, node div 2 AS node, depth + 1
          FROM anc WHERE node > 0
        )
        SELECT leaf,
               CAST(max(depth) AS BIGINT) AS depth_to_root,
               CAST(count(*) AS BIGINT) AS chain_len
        FROM anc GROUP BY leaf
        """
    )


@query(
    "q_sql4_surfaces",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS disc_revenue
    FROM lineitem
    WHERE l_quantity >= 45.0
    GROUP BY 1
    """,
)
def q_sql4_surfaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-language surfaces in one verified query: a SQL UDF
    (CREATE FUNCTION ... RETURN, planned inline — no Python, full
    codegen), a session VARIABLE carrying the filter threshold, and the
    |> pipe syntax chaining scan → filter → aggregate. The UDF returns
    DECIMAL so the revenue sum stays order-independent; the oracle is
    the equivalent classic SQL."""
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sql4")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price_sql4(
            p DOUBLE, d DOUBLE) RETURNS DECIMAL(18, 6)
        RETURN CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,4)))
        """
    )
    spark.sql("DECLARE OR REPLACE VARIABLE min_qty_sql4 DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE min_qty_sql4 = 45.0")
    return spark.sql(
        """
        FROM lineitem_sql4
        |> WHERE l_quantity >= min_qty_sql4
        |> AGGREGATE count(*) AS n,
                     CAST(sum(disc_price_sql4(l_extendedprice, l_discount))
                          AS DOUBLE) AS disc_revenue
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n, disc_revenue
        """
    )


@query(
    "q_str_collation",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN l_orderkey % 2 = 0
                  THEN upper(l_returnflag || l_linestatus)
                  ELSE lower(l_returnflag || l_linestatus) END AS tag
      FROM lineitem)
    SELECT lower(tag) AS tag_norm, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY 1
    """,
)
def q_str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): a mixed-case tag
    column groups under UTF8_LCASE so case variants merge WITHOUT
    rewriting every row through lower() first — at scale the collation
    comparator works on the raw bytes during the shuffle/aggregate.
    The emitted key is normalized (lower) because the group's
    representative string is first-seen; the oracle states the
    equivalent lower()-grouping."""
    li = tbl(spark, sf_dir, "lineitem")
    tag = F.when(
        F.col("l_orderkey") % 2 == 0,
        F.upper(F.concat("l_returnflag", "l_linestatus")),
    ).otherwise(F.lower(F.concat("l_returnflag", "l_linestatus")))
    return (
        li.withColumn("tag", tag)
        .select(F.expr("tag COLLATE UTF8_LCASE").alias("tag_c"))
        .groupBy("tag_c")
        .agg(F.count("*").alias("n"))
        .select(F.lower(F.col("tag_c")).alias("tag_norm"), "n")
    )
