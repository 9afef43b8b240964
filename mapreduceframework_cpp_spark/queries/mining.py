"""Pattern-mining + distribution surfaces: market-basket affinity,
equi-depth histograms, rolling-window distinct users, and
Johnson–Lindenstrauss random projection.

Each is a classic "the reference's map/reduce users would build this
next" composition of SURVEY.md §2.1 primitives (emit2/emit3 + reduce ≙
`MapReduceClient.h:22-39`): basket pairs are a self-joined reduce,
rolling DAU a windowed re-reduce, the histogram a sort-then-bucket
(R5/R6), and the projection a pure map (R3) that compresses the
similarity-search feature space before any LSH/IVF pass.

Scale notes: the basket self-join collapses the fact table to distinct
(order, brand) FIRST (≤25 brands ⇒ ≤300 pairs per order, bounded
fan-out) and co-partitions both sides on orderkey; the histogram's
ntile window is the one global sort, run over the projected 2-column
frame; rolling DAU broadcasts the tiny day spine and shuffles (day,
user) once; the JL projection is shuffle-free and all-JVM (higher-order
functions over the array column), with every lane quantized to a 1e-6
integer grid so the fold is exact integer math — order-independent and
bit-identical across engines at any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.operators.common import (
    persist_tracked,
    spread,
)
from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: JL output dimensionality — small enough that the oracle enumerates it.
_RP_DIMS = 8


@query(
    "q_basket_pairs",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*) AS pair_cnt
      FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                         AND a.p_brand < b.p_brand
      GROUP BY 1, 2),
    single AS (
      SELECT p_brand, count(*) AS brand_cnt FROM ob GROUP BY 1)
    SELECT brand_a, brand_b,
           CAST(pair_cnt AS BIGINT) AS pair_cnt,
           CAST(pair_cnt AS DOUBLE) / n_orders AS support,
           CAST(pair_cnt AS DOUBLE) * n_orders
             / (sa.brand_cnt * CAST(sb.brand_cnt AS DOUBLE)) AS lift
    FROM pairs
    JOIN single sa ON sa.p_brand = brand_a
    JOIN single sb ON sb.p_brand = brand_b
    CROSS JOIN n
    WHERE pair_cnt >= 50
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: brand pairs co-purchased in the same
    order, with support and lift — the association-rule primitive.
    The oracle states it as the textbook self-join; the Spark lowering
    avoids the self-join entirely: ONE orderkey shuffle collects each
    order's sorted distinct-brand set (≤25 elements), pairs generate
    array-side (C(|set|,2) per order, bounded fan-out, no second scan
    of the fact table), and the tiny brand/pair aggregates re-reduce
    from the same frame. Marginals and the order total attach by
    broadcast. Lift divides the same integers in double on both
    engines."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")

    # spread the SCAN on the group key BEFORE the broadcast join + the
    # collect_set (r5 width lesson, same as the mutual-kNN build): the
    # broadcast join preserves the partitioning, so the persisted
    # brand-set frame inherits full width and the downstream pair
    # explode runs full-parallel instead of on AQE's byte-coalesced 2-3
    # tasks, and on the narrow path the group-by reuses the l_orderkey
    # partitioning (no extra shuffle; on a wide input spread() no-ops
    # and the group-by exchanges normally). Spreading the scan rather
    # than the join result also keeps spread()'s width probe off an
    # exchange-bearing plan, which AQE would eagerly materialize at
    # construction time (ADVICE r5). 1.6→1.3 s warm at sf0.1,
    # identical rows.
    ob = (
        spread(li, "l_orderkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    # the brand-set frame feeds three consumers (total, pairs,
    # marginals) — persist once, released by release_persisted()
    ob = persist_tracked(ob)
    n_orders = ob.agg(F.count(F.lit(1)).alias("n_orders"))
    pair_arr = F.expr(
        "flatten(transform(brands, (x, i) -> "
        "transform(slice(brands, i + 2, size(brands)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        ob.select(F.explode(pair_arr).alias("pr"))
        .select("pr.brand_a", "pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 50)
    )
    single = (
        ob.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("brand_cnt"))
    )
    sa = single.select(
        F.col("p_brand").alias("brand_a"), F.col("brand_cnt").alias("cnt_a")
    )
    sb = single.select(
        F.col("p_brand").alias("brand_b"), F.col("brand_cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            (F.col("pair_cnt").cast("double") / F.col("n_orders")).alias(
                "support"
            ),
            (
                F.col("pair_cnt").cast("double")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b").cast("double"))
            ).alias("lift"),
        )
    )


@query(
    "q_equidepth_hist",
    oracle="""
    WITH b AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS bucket_rev
    FROM b GROUP BY 1
    """,
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order values: 10 ntile
    buckets with their realized [lo, hi] edges and revenue mass — the
    quantile-sketch companion that drives skew-aware partitioning
    decisions. The ntile window is a single global sort over a
    projected 2-column frame (price + tie-breaking key, so bucket
    assignment is total-order deterministic); the re-aggregate is
    map-side combinable on 10 groups. Bucket revenue sums exact
    decimals before the double cast."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("bucket", F.ntile(10).over(w).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("bucket_rev"),
        )
    )


@query(
    "q_rolling_dau",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events)
    SELECT d.day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS rolling_7d_users,
           CAST(count(*) AS BIGINT) AS rolling_7d_events
    FROM days d
    JOIN events e
      ON CAST(date_trunc('day', e.ts) AS TIMESTAMP) <= d.day
     AND CAST(date_trunc('day', e.ts) AS TIMESTAMP)
         > d.day - INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the windowed COUNT(DISTINCT)
    that plain window frames can't express (distinct isn't
    frame-decomposable). Lowering (retuned r5 after the r4 bench watch
    item): (1) pre-aggregate events to distinct (day, user) pairs with
    per-pair event counts — at 100 TB this shrinks the fan-out input
    from every event to day-user pairs (heavy users fire many events a
    day); (2) EXPLODE each pair into the ≤7 window days it contributes
    to — a pure projection, no join condition to evaluate; (3) filter
    the exploded days to the observed day spine with a broadcast HASH
    join (the previous broadcast range join planned as a nested loop
    scanning every spine day per event row); (4) one (day) aggregate —
    sum of pair counts for events, distinct users for DAU. Every join
    in the plan is a BroadcastHashJoin; the only wide exchanges are the
    two map-side-combinable aggregates."""
    pairs = (
        tbl(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("eday"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    days = pairs.select(F.col("eday").alias("day")).distinct()
    # eday contributes to days d with eday <= d < eday + 7 — identical
    # to the oracle's (eday <= d AND eday > d - 7) range predicate.
    exploded = pairs.select(
        F.explode(
            F.sequence(
                F.col("eday"),
                F.col("eday") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
        "n_events",
    )
    return (
        exploded.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("rolling_7d_users"),
            F.sum("n_events").alias("rolling_7d_events"),
        )
    )


@query(
    "q_emb_random_projection",
    oracle=f"""
    WITH lanes AS (
      SELECT vec_id, j,
             list_sum(list_transform(range(0, len(embedding)),
               i -> CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
                         AS BIGINT)
                    * (CASE WHEN ((i * 1103515245 + j * 12345) % 97) % 2 = 0
                            THEN 1 ELSE -1 END))) AS acc
      FROM embeddings, range(0, {_RP_DIMS}) t(j))
    SELECT vec_id,
           CAST(j AS BIGINT) AS dim,
           CAST(acc AS DOUBLE) / 1000000 AS projected
    FROM lanes
    """,
)
def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection of embeddings onto
    {_RP_DIMS} ±1 lanes — the dimensionality-reduction step that makes
    downstream LSH/IVF passes cheap at 100 TB (distance distortion
    bounded by the JL lemma; Achlioptas-style sign matrix). The sign
    for (input-dim i, lane j) derives from a deterministic integer LCG
    mix — no materialized projection matrix, no randomness source, so
    any executor recomputes the same lane. Shuffle-free map: the fold
    runs as JVM higher-order functions over the array column; each
    element quantizes to a 1e-6 integer grid first, so the per-lane
    accumulator is exact int64 (order-independent, engine-identical)
    and only the final value divides back to double. Shuffle-free
    except the ONE spread exchange up front (r5 width lesson): the
    rows×lanes×dims fold is compute-bound on a byte-narrow scan
    (0.76 s → 0.25 s at sf0.1)."""
    emb = spread(
        tbl(spark, sf_dir, "embeddings"), "vec_id"
    ).select("vec_id", "embedding")
    lanes = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(_RP_DIMS - 1))).alias("j"),
    )
    idx = F.sequence(F.lit(0), F.size("embedding") - 1)
    sign = lambda i: F.when(  # noqa: E731
        (
            (
                i.cast("long") * F.lit(1103515245)
                + F.col("j").cast("long") * F.lit(12345)
            )
            % 97
        )
        % 2
        == 0,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(-1).cast("long"))
    terms = F.transform(
        idx,
        lambda i: F.round(
            F.element_at("embedding", (i + 1).cast("int")).cast("double")
            * 1000000
        )
        .cast("long")
        * sign(i),
    )
    acc = F.aggregate(
        terms, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return lanes.select(
        "vec_id",
        F.col("j").cast("long").alias("dim"),
        (acc.cast("double") / 1000000).alias("projected"),
    )


@query(
    "q_emb_pair_distance",
    oracle="""
    WITH n AS (SELECT count(*) AS n_vecs FROM embeddings),
    q AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)
               AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    pairs AS (
      SELECT a.vec_id AS id_a,
             (a.vec_id + (n.n_vecs - (n.n_vecs % 2)) / 2) % n.n_vecs AS id_b
      FROM embeddings a CROSS JOIN n
      WHERE a.vec_id < (a.vec_id + (n.n_vecs - (n.n_vecs % 2)) / 2)
                       % n.n_vecs),
    d AS (
      SELECT p.id_a, p.id_b,
             sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS dist2_q
      FROM pairs p
      JOIN q qa ON qa.vec_id = p.id_a
      JOIN q qb ON qb.vec_id = p.id_b AND qb.pos = qa.pos
      GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(dist2_q) AS BIGINT) AS min_dist2_q,
           CAST(max(dist2_q) AS BIGINT) AS max_dist2_q,
           CAST(sum(dist2_q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e14)
             AS mean_dist2
    FROM d
    """,
)
def q_emb_pair_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity audit by mean pairwise embedding distance —
    estimated in LINEAR work: the true statistic is quadratic
    (all-pairs), but a fixed derangement (partner = id + N/2 mod N)
    samples N/2 unbiased-by-construction pairs with ONE equi self-join,
    no cross join, no RNG (the deterministic-pairing trick for any
    quadratic statistic at 100 TB; collapsing mean distance is how
    representation collapse shows up before model eval does). Elements
    quantize to the shared 1e-7 grid, each pair's distance² is an exact
    int64 sum over dimensions, and the single double division happens
    once at the end."""
    emb = tbl(spark, sf_dir, "embeddings")
    n = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    half = (F.col("n_vecs") - F.col("n_vecs") % 2) / 2
    pairs = (
        emb.select("vec_id")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("vec_id").alias("id_a"),
            ((F.col("vec_id") + half) % F.col("n_vecs"))
            .cast("long")
            .alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    qarr = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS BIGINT))"
        ).alias("qa"),
    )
    d = (
        pairs.join(qarr, pairs.id_a == qarr.vec_id)
        .drop("vec_id")
        .join(
            qarr.select(
                F.col("vec_id").alias("vb"), F.col("qa").alias("qb")
            ),
            F.col("id_b") == F.col("vb"),
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dist2_q"),
        )
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("dist2_q").cast("long").alias("min_dist2_q"),
        F.max("dist2_q").cast("long").alias("max_dist2_q"),
        (
            F.sum("dist2_q").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e14))
        ).alias("mean_dist2"),
    )


@query(
    "q_emb_silhouette",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)
               AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    cent AS (
      SELECT label AS clabel, pos, count(DISTINCT vec_id) AS n,
             sum(CAST(qv AS DECIMAL(19,0))) AS s
      FROM q GROUP BY 1, 2),
    d AS (
      SELECT q.vec_id, q.label, cent.clabel,
             CAST(sum((CAST(q.qv AS DECIMAL(19,0)) * cent.n - cent.s)
                      * (CAST(q.qv AS DECIMAL(19,0)) * cent.n - cent.s))
                  AS DOUBLE)
             / (CAST(max(cent.n) AS DOUBLE) * CAST(max(cent.n) AS DOUBLE))
               AS d2
      FROM q JOIN cent ON cent.pos = q.pos
      GROUP BY 1, 2, 3),
    ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN d2 END) AS a,
             min(CASE WHEN clabel <> label THEN d2 END) AS b
      FROM d GROUP BY 1, 2),
    sil AS (
      SELECT vec_id, label,
             CAST(floor(CASE WHEN greatest(a, b) = 0 THEN 0.0
                             ELSE (b - a) / greatest(a, b) END * 1e9 + 0.5)
                  AS BIGINT) AS s_q
      FROM ab)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(s_q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9),
                 6) AS mean_silhouette
    FROM sil GROUP BY 1
    """,
)
def q_emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per label — the clustering-quality
    readout ((b−a)/max(a,b) with a = distance² to the OWN class
    centroid, b = distance² to the nearest OTHER centroid; near 1 =
    separated, near 0 = overlapping, negative = mislabeled cluster) at
    LINEAR cost: the full silhouette is quadratic in points, the
    centroid form is |points|·|labels|. No float centroid is ever
    materialized — distances use the cleared-denominator rational form
    Σ(qv·n − S)²/n² with DECIMAL(38) numerators over the shared 1e-7
    grid, and each vector's silhouette quantizes to the 1e-9 grid
    before the per-label mean (exact int64 sum, no double
    accumulation). Shapes: one posexplode shuffle, tiny centroid stats
    broadcast onto a per-(vec, candidate-label) aggregate. The
    rows×dims posexplode is compute-bound on a byte-narrow scan, so
    the input spreads to full width first (r5 width lesson; 2.3 s →
    1.3 s at sf0.1)."""
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1e7 + 0.5).cast("long").alias("qv"),
    )
    qd = F.col("qv").cast("decimal(19,0)")
    cent = q.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.count_distinct("vec_id").alias("n"), F.sum(qd).alias("s")
    )
    diff = qd * F.col("n") - F.col("s")
    d = (
        q.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            (
                F.sum(diff * diff).cast("double")
                / (F.max("n").cast("double") * F.max("n").cast("double"))
            ).alias("d2")
        )
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias("b"),
    )
    s_q = F.floor(
        F.when(F.greatest("a", "b") == 0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
        * 1e9
        + 0.5
    ).cast("long")
    return ab.select("label", s_q.alias("s_q")).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum("s_q").cast("double") / (F.count(F.lit(1)).cast("double") * 1e9),
            6,
        ).alias("mean_silhouette"),
    )
