"""Join queries (SURVEY.md §2.2-C).

Kernel lowering for all joins: tag-union both inputs in map, group on the
join key in shuffle (R6), pairwise combine in reduce (R8) — the classic
repartition join on the reference kernel (Tenzing, PAPERS.md). Spark picks
the physical strategy per side size: broadcast-hash for bounded dims,
sort-merge/shuffled-hash for big-big — the choices that survive 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.operators.asof import asof_join
from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_custkey", "c_name", "o_totalprice")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim: explicit broadcast — no shuffle of the 100 TB
    side, the dim ships to every task."""
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_join_shuffle_hash",
    oracle="""
    SELECT s_name,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical shape, shuffled-hash strategy via hint — the big-big
    choice when neither side broadcasts but one side's partitions fit in
    memory (cheaper than sort-merge: no sort)."""
    li = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier").hint("shuffle_hash")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer + null-side aggregation: customers with zero orders
    appear with n_orders=0 (count of a null column skips nulls)."""
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "right"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_full",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
    ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two filtered sets so both null sides are non-empty."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    big = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    big = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "region")
        .crossJoin(tbl(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@query(
    "q_join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, p_size, l_quantity
    FROM lineitem JOIN part
    ON l_partkey = p_partkey
    AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: Spark keeps the hash/merge join on the
    equi part and applies the range as a post-join filter — the scalable
    shape (a pure theta join would be a nested loop)."""
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 5)
        & (li.l_quantity <= part.p_size + 5)
    )
    return li.join(F.broadcast(part), cond).select(
        "l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity"
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS ts_click, c.value AS value_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest prior (or simultaneous)
    click — via the engine's asof_join operator (union-tag + window)."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_click",
    )


@query(
    "q_join_asof_tol",
    oracle="""
    WITH m AS (
      SELECT p.event_id, p.user_id, p.ts,
             c.ts AS ts_click, c.value AS value_click
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN epoch(ts) - epoch(ts_click) <= 3600.0
                THEN ts_click END AS ts_click,
           CASE WHEN epoch(ts) - epoch(ts_click) <= 3600.0
                THEN value_click END AS value_click
    FROM m
    """,
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=...)``
    semantics): a prior click older than 1 hour is no match — stale
    context is worse than none in feature pipelines. Same
    single-shuffle union-tag + window plan; the bound is a post-window
    null-out of the carried right timestamp."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_click",
        tolerance_seconds=3600,
    )


@query(
    "q_join_asof_fwd",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS ts_click, c.value AS value_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched to the user's NEXT click at
    or after it (`merge_asof(direction='forward')`) — the
    "what happened next" feature join. Mirrored window frame
    (currentRow→unboundedFollowing + first ignorenulls), still one
    shuffle; oracle is DuckDB's forward ASOF (`p.ts <= c.ts`)."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_click",
        direction="forward",
    )


@query(
    "q_join_interval",
    oracle="""
    SELECT e1.event_id AS purchase_id, e2.event_id AS error_id,
           e1.ts AS purchase_ts, e2.ts AS error_ts
    FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
    AND e1.event_type = 'purchase' AND e2.event_type = 'error'
    AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap: errors within 1h after a purchase, same user.
    Equi on user + time-range residual keeps this a hash join."""
    events = tbl(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
    )
    cond = (
        (p.user_id == e.e_user_id)
        & (e.error_ts > p.purchase_ts)
        & (e.error_ts <= p.purchase_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return p.join(e, cond).select("purchase_id", "error_id", "purchase_ts", "error_ts")


@query(
    "q_join_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter-safe salted join (operators/skew.py): result must be
    identical to the plain equi-join — the oracle IS the plain join, so
    the hash check proves salting changes distribution, never results."""
    from mapreduceframework_cpp_spark.operators.skew import salted_join

    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return salted_join(o, c, "c_custkey", num_salts=8).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_interval_binned",
    oracle="""
    SELECT e.event_id AS error_id,
           p.event_id AS purchase_id,
           round(epoch(p.ts) - epoch(e.ts), 6) AS delta_sec
    FROM events e JOIN events p
      ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    """,
)
def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join at scale: purchases within 10 minutes after
    any error, with NO equi column — naively this is a
    BroadcastNestedLoopJoin (|L|x|R| probes, one side fully in memory).
    operators/rangejoin.binned_interval_join manufactures the equi key
    by quantizing time into 10-minute bins (interval -> <=2 bins, point
    -> 1 bin), making it an ordinary shuffled equi-join + exact residual
    filter. The oracle states the plain range join declaratively (DuckDB
    plans it as an IEJoin). delta_sec is a difference of identical
    epoch doubles -> identical in both engines."""
    from mapreduceframework_cpp_spark.operators.rangejoin import binned_interval_join

    ev = tbl(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    joined = binned_interval_join(
        errors,
        purchases,
        start=F.col("e_ts"),
        end=F.col("e_ts") + F.expr("INTERVAL 10 MINUTES"),
        point=F.col("p_ts"),
        bin_seconds=600,
    )
    delta = F.col("p_ts").cast("timestamp").cast("double") - F.col("e_ts").cast(
        "timestamp"
    ).cast("double")
    return joined.select(
        "error_id", "purchase_id", F.round(delta, 6).alias("delta_sec")
    )


from mapreduceframework_cpp_spark.operators.bloom import (  # noqa: E402
    H1_SQL,
    H2_SQL,
    K_HASHES,
    M_BITS,
    bloom_build,
    bloom_probe,
)

#: DuckDB reconstruction of the operator's exact bitmap (same md5-nibble
#: hashes, same double-hashing, same word layout) — the filter itself is
#: hash-verified, not just its effect.
_BLOOM_ORACLE = f"""
WITH bk AS (SELECT DISTINCT o_orderkey AS key FROM orders
            WHERE o_orderpriority = '1-URGENT'),
bh AS (SELECT key, md5(CAST(key AS VARCHAR)) AS h FROM bk),
bn AS (SELECT key, {H1_SQL} AS h1, {H2_SQL} AS h2 FROM bh),
bpos AS (SELECT key, (h1 + i * h2) % {M_BITS} AS pos
         FROM bn, unnest([0, 1, 2, 3]) AS t(i)),
words AS (SELECT pos // 32 AS word_idx,
                 bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS word
          FROM bpos GROUP BY 1),
pk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
ph AS (SELECT key, md5(CAST(key AS VARCHAR)) AS h FROM pk),
pn AS (SELECT key, {H1_SQL} AS h1, {H2_SQL} AS h2 FROM ph),
ppos AS (SELECT key, (h1 + i * h2) % {M_BITS} AS pos
         FROM pn, unnest([0, 1, 2, 3]) AS t(i)),
checked AS (
  SELECT p.key,
         CASE WHEN w.word IS NOT NULL
               AND (w.word & (1::BIGINT << CAST(p.pos % 32 AS INTEGER))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM ppos p LEFT JOIN words w ON w.word_idx = p.pos // 32),
passed AS (SELECT key, (sum(hit) = {K_HASHES}) AS bloom_pass
           FROM checked GROUP BY 1),
flagged AS (
  SELECT p.key, p.bloom_pass,
         (bk.key IS NOT NULL) AS exact
  FROM passed p LEFT JOIN bk ON bk.key = p.key)
SELECT CAST(count(*) AS BIGINT) AS n_probe,
       CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(sum(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN bloom_pass AND NOT exact THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN exact AND NOT bloom_pass THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg
FROM flagged
"""


@query("q_bloom_prune", oracle=_BLOOM_ORACLE)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prune, hash-verified END TO END: build an
    8 KB bitmap over the urgent orders' keys (operators/bloom), probe
    every distinct lineitem orderkey against the broadcast bitmap, and
    report probe/pass/exact/false-positive/false-negative counts (the
    oracle rebuilds the identical bitmap in SQL, so n_false_neg = 0 is
    verified, not asserted). At 100 TB this is the shuffle-free
    pre-filter in front of a selective fact⋈fact semi join — the probe
    side is pruned at scan time by a broadcast bitmap instead of
    shuffling on the join key."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    build_keys = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("key")
    )
    bloom = bloom_build(build_keys, "key")
    probe = li.select(F.col("l_orderkey").alias("key"))
    passed = bloom_probe(probe, bloom, "key")
    flagged = passed.join(
        F.broadcast(build_keys.distinct().withColumn("_in", F.lit(1))),
        "key",
        "left",
    ).select("key", "bloom_pass", F.col("_in").isNotNull().alias("exact"))
    return flagged.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(F.col("exact"), 1).otherwise(0)).alias("n_exact"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("exact"), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
        F.sum(F.when(F.col("exact") & ~F.col("bloom_pass"), 1).otherwise(0)).alias(
            "n_false_neg"
        ),
    )


@query(
    "q_link_sorted_neighborhood",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_name, c_nationkey,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      FROM customer),
    cand AS (
      SELECT a.c_custkey AS key_a, a.c_name AS name_a,
             b.c_custkey AS key_b, b.c_name AS name_b,
             levenshtein(a.c_name, b.c_name) AS dist,
             CASE WHEN a.c_nationkey = b.c_nationkey THEN 1 ELSE 0 END
               AS same_nation
      FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3)
    SELECT key_a, name_a, key_b, name_b,
           CAST(dist AS BIGINT) AS dist,
           CAST(same_nation AS BIGINT) AS same_nation
    FROM cand WHERE dist <= 1
    """,
)
def q_link_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by SORTED-NEIGHBORHOOD blocking — the third
    blocking family next to set-similarity prefix filtering
    (q_dedup_prefix_filter) and LSH (q_dedup_near): sort records once
    by the match key, compare each record only against its w=3
    successors, score candidates with edit distance. O(n·w)
    comparisons instead of O(n²), and near-miss typos that share no
    token (invisible to set blocking) sit adjacent in sort order. The
    Spark plan is ONE global sort (range-partitioned at scale — rank
    windows over successive partitions overlap by w, the standard
    distributed SNM) and the w successors come from lead() over the
    same sort — no self-join at all; the oracle states the textbook
    rank-band self-join instead (two formulations, one result)."""
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    w = Window.orderBy("c_name", "c_custkey")
    r = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        *[
            F.lead("c_name", k).over(w).alias(f"n{k}")
            for k in (1, 2, 3)
        ],
        *[
            F.lead("c_custkey", k).over(w).alias(f"k{k}")
            for k in (1, 2, 3)
        ],
        *[
            F.lead("c_nationkey", k).over(w).alias(f"nat{k}")
            for k in (1, 2, 3)
        ],
    )
    pairs = None
    for k in (1, 2, 3):
        leg = r.filter(F.col(f"n{k}").isNotNull()).select(
            F.col("c_custkey").alias("key_a"),
            F.col("c_name").alias("name_a"),
            F.col(f"k{k}").alias("key_b"),
            F.col(f"n{k}").alias("name_b"),
            F.levenshtein("c_name", f"n{k}").alias("dist"),
            (F.col("c_nationkey") == F.col(f"nat{k}"))
            .cast("long")
            .alias("same_nation"),
        )
        pairs = leg if pairs is None else pairs.unionByName(leg)
    return pairs.filter(F.col("dist") <= 1).select(
        "key_a",
        "name_a",
        "key_b",
        "name_b",
        F.col("dist").cast("long").alias("dist"),
        "same_nation",
    )
