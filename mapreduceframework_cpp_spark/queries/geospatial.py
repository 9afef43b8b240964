"""Geospatial binning & proximity queries (SURVEY.md §2.2-S).

The reference kernel (``MapReduceFramework.cpp:60-143``) computes any
key-partitioned aggregate via map → shuffle → reduce; spatial analytics
is that same lowering with a *manufactured* shuffle key: a grid cell id
derived from coordinates. These queries exercise the three shapes a
100 TB geo workload needs — density aggregation on a derived cell key,
nearest-facility assignment against a broadcast hub set, and a
radius join that turns a quadratic proximity predicate into an
equi-join on neighboring cell ids (same trick as the binned interval
join, ``operators/rangejoin.py``).

The test tables carry no coordinates, so points are *derived* from an
md5 of the row key folded to exact integers (the same hash-derived-
uniform discipline as ``queries/profiling.py::q_sample_weighted``):
both engines compute identical int64 micro-degree coordinates from
pure ANSI string ops, making every distance and cell id exact and the
oracle bit-for-bit. Coordinates live UNSHIFTED in ``[0, 180e6) ×
[0, 360e6)`` micro-degrees so cell arithmetic never sees a negative
operand (integer division semantics diverge across engines below
zero); geometry is planar (no meridian wrap), stated in each oracle.

Float discipline: there are no floats — every coordinate, cell id and
squared distance is int64 (max distance² ≈ 1.6e17 < 2^63).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: fold 8 hex chars of an md5 (offset ``o``, 1-based) into an exact
#: int64 in [0, 16^8) using only ANSI instr/substr — the same text runs
#: in Spark and DuckDB unchanged.
def _hex8(o: int) -> str:
    return " + ".join(
        f"(instr('0123456789abcdef', substr(h, {o + i}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(0, 8)
    )


#: customer point: lat_u in [0, 180e6), lon_u in [0, 360e6) micro-deg.
_CUST_PT = f"""
      SELECT c_custkey, c_acctbal,
             ({_hex8(1)}) % 180000000 AS lat_u,
             ({_hex8(9)}) % 360000000 AS lon_u
      FROM (SELECT c_custkey, c_acctbal,
                   md5(CAST(c_custkey AS VARCHAR) || '#geo') AS h
            FROM customer)
"""

#: hub point: one per nation, same derivation with a distinct tag so
#: hubs land independently of any customer.
_HUB_PT = f"""
      SELECT n_nationkey AS hub_id,
             ({_hex8(1)}) % 180000000 AS hlat_u,
             ({_hex8(9)}) % 360000000 AS hlon_u
      FROM (SELECT n_nationkey,
                   md5(CAST(n_nationkey AS VARCHAR) || '#hub') AS h
            FROM nation)
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with derived int64 micro-degree coordinates."""
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("#geo"))).alias("h"),
    )
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.expr(f"({_hex8(1)}) % 180000000").alias("lat_u"),
        F.expr(f"({_hex8(9)}) % 360000000").alias("lon_u"),
    )


def _hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hub per nation (25 rows) with derived coordinates."""
    n = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hub_id"),
        F.md5(F.concat(F.col("n_nationkey").cast("string"), F.lit("#hub"))).alias("h"),
    )
    return n.select(
        "hub_id",
        F.expr(f"({_hex8(1)}) % 180000000").alias("hlat_u"),
        F.expr(f"({_hex8(9)}) % 360000000").alias("hlon_u"),
    )


@query(
    "q_geo_cell_density",
    oracle=f"""
    WITH pt AS ({_CUST_PT})
    SELECT CAST((lat_u - (lat_u % 5000000)) / 5000000 AS BIGINT) AS cell_lat,
           CAST((lon_u - (lon_u % 5000000)) / 5000000 AS BIGINT) AS cell_lon,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS balance_cents
    FROM pt
    GROUP BY 1, 2
    """,
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density on a 5°×5° integer grid: the canonical geo
    aggregation — derive a cell id, shuffle on it, count. At 100 TB
    this is one scan + one partial-aggregated shuffle on at most
    36×72 = 2,592 keys; the cell id is a pure projection so the scan
    stays whole-stage-codegen. Cell ids use subtract-mod division so
    the arithmetic is exact int64 in both engines (operands are
    non-negative by construction); the balance aggregate is exact
    BIGINT cents — a DECIMAL output column hash-fails under the
    driver's pandas lens (round-6 red: Spark Decimal objects vs the
    oracle's float64)."""
    pt = _points(spark, sf_dir)
    cell = F.lit(5_000_000)
    return (
        pt.groupBy(
            ((F.col("lat_u") - F.col("lat_u") % cell) / cell)
            .cast("long")
            .alias("cell_lat"),
            ((F.col("lon_u") - F.col("lon_u") % cell) / cell)
            .cast("long")
            .alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum((F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("balance_cents"),
        )
    )


@query(
    "q_geo_nearest_hub",
    oracle=f"""
    WITH pt AS ({_CUST_PT}), hub AS ({_HUB_PT}),
    scored AS (
      SELECT c_custkey,
             min(((hlat_u - lat_u) * (hlat_u - lat_u)
                  + (hlon_u - lon_u) * (hlon_u - lon_u)) * 32 + hub_id)
               AS enc
      FROM pt CROSS JOIN hub
      GROUP BY c_custkey)
    SELECT c_custkey,
           CAST(enc % 32 AS BIGINT) AS hub_id,
           CAST((enc - (enc % 32)) / 32 AS BIGINT) AS dist2
    FROM scored
    """,
)
def q_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment: each point takes the closest of 25
    hubs. The scale shape is broadcast-expand-reduce: the hub set
    broadcasts, every point expands to 25 scored candidates map-side,
    and a partial-aggregated ``min`` collapses them — no window, no
    extra shuffle beyond the groupBy. The argmin is encoded
    arithmetically (``dist2 * 32 + hub_id``, hub_id < 32) so ties
    break deterministically to the lowest hub id and the whole
    reduction stays an int64 ``min`` (max dist² ≈ 1.6e17; ×32 ≈
    5.2e18 < 2^63) — the same exact-integer argmin trick both engines
    evaluate identically."""
    pt = _points(spark, sf_dir)
    hubs = _hubs(spark, sf_dir)
    dlat = F.col("hlat_u") - F.col("lat_u")
    dlon = F.col("hlon_u") - F.col("lon_u")
    dist2 = dlat * dlat + dlon * dlon
    enc = dist2 * F.lit(32) + F.col("hub_id")
    scored = pt.crossJoin(F.broadcast(hubs)).select(
        "c_custkey", enc.alias("enc")
    )
    m = scored.groupBy("c_custkey").agg(F.min("enc").alias("enc"))
    return m.select(
        "c_custkey",
        (F.col("enc") % 32).cast("long").alias("hub_id"),
        ((F.col("enc") - F.col("enc") % 32) / 32).cast("long").alias("dist2"),
    )


@query(
    "q_geo_radius_join",
    oracle=f"""
    WITH pt AS ({_CUST_PT}), hub AS ({_HUB_PT})
    SELECT hub_id,
           CAST(count(*) AS BIGINT) AS n_within,
           CAST(min((hlat_u - lat_u) * (hlat_u - lat_u)
                    + (hlon_u - lon_u) * (hlon_u - lon_u)) AS BIGINT)
             AS closest_dist2
    FROM hub CROSS JOIN pt
    WHERE (hlat_u - lat_u) * (hlat_u - lat_u)
          + (hlon_u - lon_u) * (hlon_u - lon_u)
          <= CAST(5000000 AS BIGINT) * 5000000
    GROUP BY hub_id
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: customers within 5° (planar) of each hub. The
    oracle is the quadratic truth (cross join + distance filter); the
    Spark plan is the scale path: with cell size = radius, any match
    lies in the hub's 3×3 cell neighborhood, so each hub expands to 9
    (cell_lat, cell_lon) keys and the join is a plain HASH EQUI-JOIN
    on the cell id — candidate pairs only, never points × hubs (the
    same manufactured-equi-key lowering as the binned interval join,
    ``operators/rangejoin.py``). The exact int64 distance filter then
    drops corner candidates. At 100 TB the point side never replicates
    and the expanded hub side stays 9× tiny-broadcastable."""
    cell = 5_000_000
    pt = _points(spark, sf_dir).select(
        "c_custkey",
        "lat_u",
        "lon_u",
        ((F.col("lat_u") - F.col("lat_u") % cell) / cell).cast("long").alias("cl"),
        ((F.col("lon_u") - F.col("lon_u") % cell) / cell).cast("long").alias("cn"),
    )
    hubs = (
        _hubs(spark, sf_dir)
        .select(
            "hub_id",
            "hlat_u",
            "hlon_u",
            ((F.col("hlat_u") - F.col("hlat_u") % cell) / cell)
            .cast("long")
            .alias("hcl"),
            ((F.col("hlon_u") - F.col("hlon_u") % cell) / cell)
            .cast("long")
            .alias("hcn"),
        )
        .select(
            "hub_id",
            "hlat_u",
            "hlon_u",
            F.explode(F.expr("sequence(hcl - 1, hcl + 1)")).alias("cl"),
            F.col("hcn").alias("hcn"),
        )
        .select(
            "hub_id",
            "hlat_u",
            "hlon_u",
            "cl",
            F.explode(F.expr("sequence(hcn - 1, hcn + 1)")).alias("cn"),
        )
    )
    dlat = F.col("hlat_u") - F.col("lat_u")
    dlon = F.col("hlon_u") - F.col("lon_u")
    dist2 = dlat * dlat + dlon * dlon
    return (
        pt.join(F.broadcast(hubs), ["cl", "cn"])
        .filter(dist2 <= F.lit(cell * cell))
        .groupBy("hub_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.min(dist2).cast("long").alias("closest_dist2"),
        )
    )


@query(
    "q_geo_grid_clusters",
    oracle=f"""
    WITH RECURSIVE pt AS ({_CUST_PT}),
    cells AS (
      SELECT CAST((lat_u - (lat_u % 10000000)) / 10000000 AS BIGINT) AS cl,
             CAST((lon_u - (lon_u % 10000000)) / 10000000 AS BIGINT) AS cn,
             CAST(count(*) AS BIGINT) AS cnt
      FROM pt GROUP BY 1, 2),
    tots AS (SELECT sum(cnt) AS tot, count(*) AS n_occ FROM cells),
    dense AS (
      SELECT cl, cn, cl * 100 + cn AS id, cnt
      FROM cells CROSS JOIN tots
      WHERE cnt * n_occ > 2 * tot),
    pairs AS (
      SELECT a.id AS ida, b.id AS idb
      FROM dense a JOIN dense b
        ON abs(a.cl - b.cl) <= 1 AND abs(a.cn - b.cn) <= 1 AND a.id < b.id),
    edges AS (SELECT ida AS a, idb AS b FROM pairs
              UNION SELECT idb, ida FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS id, least(a, min(b)) AS cluster_id
             FROM reach GROUP BY a)
    SELECT CAST(coalesce(comp.cluster_id, dense.id) AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(dense.cnt) AS BIGINT) AS n_points
    FROM dense LEFT JOIN comp ON dense.id = comp.id
    GROUP BY 1
    """,
)
def q_geo_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based spatial clustering, grid-DBSCAN style: bin points
    into 10° cells, keep cells denser than 2× the occupied-cell mean
    (an exact integer predicate — ``cnt·n_occ > 2·tot`` — so the
    threshold is data-relative yet engine-portable), connect 8-adjacent
    dense cells, and report each connected component's cell/point
    totals. The 100 TB shape: raw points are touched by exactly ONE
    partial-aggregated shuffle (the cell histogram); density
    thresholding, adjacency (a join on the tiny dense-cell set) and the
    min-label-propagation components (operators/dedup.py:439 — executor
    -side, scalar-only driver traffic) all run on the
    cells-not-points aggregate. The oracle restates the components as a
    DuckDB recursive-CTE transitive closure, singletons via left
    join."""
    from mapreduceframework_cpp_spark.operators.dedup import dedup_clusters

    cell = 10_000_000
    pt = _points(spark, sf_dir)
    cells = pt.groupBy(
        ((F.col("lat_u") - F.col("lat_u") % cell) / cell).cast("long").alias("cl"),
        ((F.col("lon_u") - F.col("lon_u") % cell) / cell).cast("long").alias("cn"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wall = Window.partitionBy()
    dense = (
        cells.withColumn("tot", F.sum("cnt").over(wall))
        .withColumn("n_occ", F.count(F.lit(1)).over(wall))
        .filter(F.col("cnt") * F.col("n_occ") > 2 * F.col("tot"))
        .select("cl", "cn", (F.col("cl") * 100 + F.col("cn")).alias("id"), "cnt")
    )
    nbr = (
        dense.select(
            F.col("id").alias("idb"),
            F.explode(F.expr("sequence(cl - 1, cl + 1)")).alias("cl"),
            F.col("cn").alias("cn0"),
        )
        .select(
            "idb", "cl", F.explode(F.expr("sequence(cn0 - 1, cn0 + 1)")).alias("cn")
        )
    )
    pairs = (
        dense.join(F.broadcast(nbr), ["cl", "cn"])
        .filter(F.col("id") < F.col("idb"))
        .select(F.col("id").alias("doc_id_a"), F.col("idb").alias("doc_id_b"))
    )
    comp = dedup_clusters(pairs).select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    return (
        dense.join(comp, "id", "left")
        .groupBy(
            F.coalesce(F.col("cluster_id"), F.col("id"))
            .cast("long")
            .alias("cluster_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("cnt").cast("long").alias("n_points"),
        )
    )
