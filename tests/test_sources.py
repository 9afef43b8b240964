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
