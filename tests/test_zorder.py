"""Z-order layout (sources/layout.py): multi-dimensional clustering must
tighten per-file min/max statistics on EVERY z-ordered dimension — the
property parquet data skipping actually uses — where a single-column
sort only tightens its own dimension."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.sources.layout import write_zordered
from mapreduceframework_cpp_spark.sources.tables import tbl


def _avg_file_range_fraction(spark, path, col):
    """Mean (file max-min) / (global max-min) over the layout's files —
    1.0 means every file spans the whole domain (no skipping possible),
    small means tight stats (most files prunable)."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) > 1
    spans = []
    glo = None
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min(col).cast("double"), F.max(col).cast("double")
        ).collect()[0]
        spans.append((r[0], r[1]))
    glo_min = min(s[0] for s in spans)
    glo_max = max(s[1] for s in spans)
    width = glo_max - glo_min or 1.0
    return sum((mx - mn) / width for mn, mx in spans) / len(spans)


def test_zorder_tightens_all_dims(spark, sf_dir, tmp_path):
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "single_sort")
    write_zordered(o, z_path, ["o_custkey", "o_totalprice"], n_files=8)
    # baseline: range-sorted by the FIRST column only
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    z_cust = _avg_file_range_fraction(spark, z_path, "o_custkey")
    z_price = _avg_file_range_fraction(spark, z_path, "o_totalprice")
    s_cust = _avg_file_range_fraction(spark, s_path, "o_custkey")
    s_price = _avg_file_range_fraction(spark, s_path, "o_totalprice")

    # single-sort: first dim tight, second dim spans ~everything
    assert s_cust < 0.35
    assert s_price > 0.8
    # z-order: BOTH dims materially tighter than the unclustered dim
    assert z_cust < 0.75
    assert z_price < 0.75
    # and the second dimension improves a lot vs the single sort
    assert z_price < s_price - 0.2

    # layout change must not change content
    assert (
        spark.read.parquet(z_path).orderBy("o_custkey", "o_totalprice").collect()
        == o.orderBy("o_custkey", "o_totalprice").collect()
    )
