"""Storage-layout plan assertions: bucketed joins run shuffle-free,
partition filters prune directories — checked on the physical plan AND
on result correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.sources.layout import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from mapreduceframework_cpp_spark.sources.tables import tbl

from tests.test_plans import plan


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Same-key same-count bucketed tables must sort-merge join with no
    shuffle on either side (the whole point of bucketing)."""
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(o, "orders_bucketed", "o_custkey", 8, str(tmp_path / "ob"))
    write_bucketed(c, "customer_bucketed", "o_custkey", 8, str(tmp_path / "cb"))

    ob, cb = read_table(spark, "orders_bucketed"), read_table(spark, "customer_bucketed")
    joined = ob.hint("merge").join(cb, "o_custkey")

    p = plan(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
    assert "SelectedBucketsCount" in p

    plain = o.join(c, "o_custkey")
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_has_no_exchange(spark, sf_dir, tmp_path):
    """Aggregation on the bucket key reuses the bucketing — no exchange
    before the final aggregate."""
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(o, "orders_bucketed_agg", "o_custkey", 8, str(tmp_path / "oba"))
    agg = (
        read_table(spark, "orders_bucketed_agg")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    assert "Exchange" not in plan(agg)


def test_partition_pruning_skips_directories(spark, sf_dir, tmp_path):
    """A filter on the partition column must appear as PartitionFilters
    (planning-time directory pruning), and the scan must not read other
    partitions' files."""
    ev = tbl(spark, sf_dir, "events").withColumn("year", F.year("ts"))
    write_partitioned(ev, str(tmp_path / "ev"), ["year"])

    years = [r.year for r in ev.select("year").distinct().collect()]
    pick = sorted(years)[0]
    scan = spark.read.parquet(str(tmp_path / "ev")).filter(F.col("year") == pick)

    p = plan(scan)
    assert "PartitionFilters" in p and "year" in p
    got = scan.count()
    want = ev.filter(F.col("year") == pick).count()
    assert got == want > 0


def test_dynamic_partition_pruning_through_join(spark, sf_dir, tmp_path):
    """DYNAMIC partition pruning: when the pruning predicate only
    exists on the OTHER side of a join (filter on the dim, fact
    partitioned on the join key's functional companion), Catalyst must
    inject a runtime subquery filter into the fact scan
    (``dynamicpruning`` expression) so only matching partitions are
    read — the join-driven pruning a 100 TB star schema lives on."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.tables import tbl

    fact_dir = str(tmp_path / "orders_by_year")
    o = tbl(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.partitionBy("o_year").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    years = (
        fact.select("o_year").distinct().withColumnRenamed("o_year", "d_year")
        .withColumn("flag", (F.col("d_year") % 3 == 0).cast("int"))
    )
    dim_dir = str(tmp_path / "years_dim")
    years.write.parquet(dim_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("flag") == 1)
    j = fact.join(dim.hint("broadcast"), fact.o_year == dim.d_year).select(
        "o_orderkey", "o_year"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain(True)
    plan_text = buf.getvalue().lower()
    assert "dynamicpruning" in plan_text, plan_text[-2000:]
    # and it actually executes correctly
    expected = {
        r.d_year
        for r in years.filter(F.col("flag") == 1).select("d_year").collect()
    }
    assert {r.o_year for r in j.select("o_year").distinct().collect()} == expected
