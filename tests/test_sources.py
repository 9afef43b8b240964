"""Source/sink round-trips (SURVEY.md §2.2-A sinks, smoke): parquet,
CSV and JSON-lines writes must read back value-identical — the
distributed analog of the reference's OutputVec append
(``MapReduceFramework.cpp:181-184``)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.sources.tables import (
    read_csv,
    read_json,
    tbl,
    write_csv,
    write_json,
    write_parquet,
)


def _sample(spark, sf_dir):
    # a few typed columns incl. timestamp + double to exercise round-trip
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    write_parquet(df, str(tmp_path / "o.parquet"))
    back = spark.read.parquet(str(tmp_path / "o.parquet"))
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    write_csv(df, str(tmp_path / "o.csv"), timestampFormat="yyyy-MM-dd HH:mm:ss")
    back = read_csv(
        spark,
        str(tmp_path / "o.csv"),
        schema=(
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderstatus string, o_orderdate timestamp"
        ),
        timestampFormat="yyyy-MM-dd HH:mm:ss",
    )
    assert _rows(back) == _rows(df)


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir).drop("o_orderdate")
    write_json(df, str(tmp_path / "o.json"))
    back = read_json(
        spark,
        str(tmp_path / "o.json"),
        schema="o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    ).select(*df.columns)
    assert _rows(back) == _rows(df)


def test_csv_write_is_task_parallel(spark, sf_dir, tmp_path):
    """Each task writes its own part file — no driver funnel."""
    df = _sample(spark, sf_dir).repartition(4)
    write_csv(df, str(tmp_path / "p.csv"))
    parts = [p for p in (tmp_path / "p.csv").iterdir() if p.name.startswith("part-")]
    assert len(parts) == 4


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from mapreduceframework_cpp_spark.sources.tables import read_orc, write_orc

    df = _sample(spark, sf_dir)
    write_orc(df, str(tmp_path / "o.orc"))
    back = read_orc(spark, str(tmp_path / "o.orc"))
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """XML (Spark 4 built-in source): schema-stated round-trip — nation
    written element-per-row and read back identically."""
    from mapreduceframework_cpp_spark.sources.tables import read_xml, write_xml

    df = _sample(spark, sf_dir)
    write_xml(df, str(tmp_path / "x.xml"))
    back = read_xml(
        spark,
        str(tmp_path / "x.xml"),
        schema=df.schema.simpleString()[7:-1].replace(":", " "),
    )
    assert [f.name for f in back.schema.fields] == [
        f.name for f in df.schema.fields
    ]
    assert _rows(back.select(*df.columns)) == _rows(df)


def test_csv_malformed_rows_permissive_and_drop(spark, tmp_path):
    """Production ETL contract for dirty input: PERMISSIVE captures the
    raw offending line in the corrupt-record column (quarantine path),
    DROPMALFORMED silently filters, FAILFAST raises — the three
    escalation levels a 100 TB ingest chooses between."""
    p = tmp_path / "dirty.csv"
    p.write_text("1,alice,10.5\n2,bob,oops\n3,carol,7.25\nnot,even,close,extra\n")
    schema = "id INT, name STRING, score DOUBLE, _corrupt STRING"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = {r.id: r for r in perm.collect()}
    assert rows[1]._corrupt is None and rows[3]._corrupt is None
    assert rows[2].score is None and "oops" in rows[2]._corrupt
    bad_extra = [r for r in rows.values() if r._corrupt and "extra" in r._corrupt]
    assert len(bad_extra) == 1

    dropped = (
        spark.read.schema("id INT, name STRING, score DOUBLE")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]

    import pytest as _pytest

    with _pytest.raises(Exception):
        (
            spark.read.schema("id INT, name STRING, score DOUBLE")
            .option("mode", "FAILFAST")
            .csv(str(p))
            .collect()
        )


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across snapshot generations: an added column
    must surface (NULL for old files) under mergeSchema, and column
    pruning must still reach the scan for either generation."""
    d = tmp_path / "evo"
    spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, name STRING").write.parquet(
        f"{d}/gen=1"
    )
    spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.9)], "id LONG, name STRING, score DOUBLE"
    ).write.parquet(f"{d}/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(str(d))
    assert set(df.columns) == {"id", "name", "score", "gen"}
    got = {r.id: r.score for r in df.collect()}
    assert got[1] is None and got[4] == 0.9
    assert df.filter(df.score.isNotNull()).count() == 2


def test_dynamic_partition_overwrite_replaces_only_touched(
    spark, sf_dir, tmp_path
):
    """overwrite_partitions must behave as an idempotent backfill:
    re-writing ONE partition's batch replaces exactly that partition
    and leaves the others byte-identical — a static overwrite here
    would wipe the whole dataset for one day's re-run."""
    from mapreduceframework_cpp_spark.sources.tables import (
        overwrite_partitions,
        write_parquet_partitioned,
    )

    base = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_by_status")
    write_parquet_partitioned(base, path, ["o_orderstatus"])
    statuses = [r[0] for r in base.select("o_orderstatus").distinct().collect()]
    assert len(statuses) >= 2, "test needs at least two partitions"
    target = sorted(statuses)[0]

    # the backfill batch: only the target partition, with a marker value
    batch = (
        base.filter(F.col("o_orderstatus") == target)
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    overwrite_partitions(batch, path, ["o_orderstatus"])

    back = spark.read.parquet(path)
    # target partition fully replaced by the marker batch
    got_t = back.filter(F.col("o_orderstatus") == target)
    assert got_t.count() == batch.count()
    assert got_t.filter(F.col("o_totalprice") != -1.0).count() == 0
    # every other partition untouched, row-for-row (project in a fixed
    # column order: the partition column reads back last)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    others = sorted(
        tuple(r)
        for r in back.filter(F.col("o_orderstatus") != target)
        .select(*cols)
        .collect()
    )
    expect = sorted(
        tuple(r)
        for r in base.filter(F.col("o_orderstatus") != target).collect()
    )
    assert others == expect
    # the scoped conf did not leak into the session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        .upper()
        == "STATIC"
    )
