"""UDF / UDAF / UDTF queries (SURVEY.md §2.2-J) — the Python-code escape
hatch, mirroring the reference's client contract, always Arrow-vectorized
(pandas_udf / applyInPandas), never row-at-a-time.
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS price_band
    FROM orders
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF ≙ client ``map`` (``MapReduceClient.h:57-59``):
    custom price-band labeler, Arrow-batched (10-100× a row-at-a-time
    Python UDF)."""

    @F.pandas_udf("string")
    def band(p: pd.Series) -> pd.Series:
        out = pd.Series("high", index=p.index)
        out[p < 300000] = "mid"
        out[p < 100000] = "low"
        return out

    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey", band("o_totalprice").alias("price_band")
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT p_brand,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                 4) AS weighted_avg_price,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom fold ≙ client ``reduce`` (``MapReduceClient.h:61-64``):
    quantity-weighted average price per brand via applyInPandas.

    Determinism: math.fsum gives the exactly-rounded sum of the double
    products regardless of row order; the oracle's decimal sum is exact
    too, so after round(...,4) both sides agree.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand", "l_extendedprice", "l_quantity"
    )

    def weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
        num = math.fsum((pdf["l_extendedprice"] * pdf["l_quantity"]).tolist())
        den = math.fsum(pdf["l_quantity"].tolist())
        return pd.DataFrame(
            {
                "p_brand": [pdf["p_brand"].iloc[0]],
                "weighted_avg_price": [round(num / den, 4)],
                "n_items": [len(pdf)],
            }
        )

    return joined.groupBy("p_brand").applyInPandas(
        weighted_avg, schema="p_brand string, weighted_avg_price double, n_items long"
    )


@query(
    "q_udtf_flatmap",
    oracle="""
    SELECT s_suppkey, unnest(generate_series(1, CAST(s_suppkey % 5 + 1 AS BIGINT))) AS k
    FROM supplier
    """,
)
def q_udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many UDTF ≙ ``emit2`` multi-emit
    (``MapReduceFramework.cpp:172-175``): a Python-built array exploded
    into rows (1 + suppkey mod 5 rows per supplier)."""

    @F.pandas_udf("array<bigint>")
    def series_to(n: pd.Series) -> pd.Series:
        return n.apply(lambda v: list(range(1, int(v) + 1)))

    sup = tbl(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        F.explode(series_to(F.col("s_suppkey") % 5 + 1)).alias("k"),
    )


@query(
    "q_udaf_arrow",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4) AS avg_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_udaf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom fold on the ARROW-native path (`applyInArrow`,
    Spark 4): the UDF receives each group as a zero-copy
    ``pyarrow.Table`` — no pandas materialization at all, the cheapest
    Python grouped-map variant. Same client-``reduce`` lowering as
    q_udaf_grouped (``MapReduceClient.h:61-64``).

    Determinism: math.fsum is the exactly-rounded sum of the group's
    doubles under ANY row order; o_totalprice is exact-2dp data, so the
    oracle's decimal sum agrees after round(..., 4)."""
    import pyarrow as pa

    def avg_price(table: pa.Table) -> pa.Table:
        prices = table.column("o_totalprice").to_pylist()
        return pa.table(
            {
                "o_orderpriority": [table.column("o_orderpriority")[0].as_py()],
                "avg_price": [round(math.fsum(prices) / len(prices), 4)],
                "n_orders": [len(prices)],
            }
        )

    return (
        tbl(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInArrow(
            avg_price,
            schema="o_orderpriority string, avg_price double, n_orders long",
        )
    )


@query(
    "q_cogroup_reconcile",
    oracle="""
    WITH lr AS (
      SELECT l_orderkey, count(*) AS n_lines,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1 - l_discount) * 10000) AS BIGINT)) AS rev_q
      FROM lineitem GROUP BY 1)
    SELECT o_orderkey,
           CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(coalesce(rev_q, 0) AS DOUBLE) / 1000000 AS line_revenue
    FROM orders LEFT JOIN lr ON o_orderkey = l_orderkey
    """,
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map surface (``cogroup().applyInPandas`` — the two-
    input R8 fold: the engine hands BOTH groups of a key to user code,
    the way the reference hands ``reduce`` one grouped vector,
    ``MapReduceClient.h:61-64``, generalized to two inputs): per-order
    reconciliation of the stored total against recomputed lineitem
    revenue.

    Scale shape: the cogroup key is a COARSE hash bucket of the order
    key (32 buckets), not the order key itself — one Python invocation
    per bucket with a vectorized pandas merge/groupby inside, instead
    of one invocation per order (measured 40x: per-key cogroup at
    sf0.1 costs ~66 s in pure Python call overhead; bucketed, ~1.6 s).
    At 100 TB the bucket count scales with cores, keeping frames
    bounded. Float discipline: per-line revenue quantizes to exact
    int64 (cents x discount basis points, both near-integers) and sums
    as integers, so the emitted double is order-independent and the
    Python path stays hash-verifiable."""
    import pandas as pd

    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    N_BUCKETS = 32

    def reconcile(o_pdf, l_pdf):
        if len(o_pdf) == 0:  # lineitem without order: out of contract
            return pd.DataFrame(
                columns=["o_orderkey", "n_lines", "o_totalprice", "line_revenue"]
            )
        if len(l_pdf):
            import numpy as np

            # floor(x + 0.5) = round-half-away-from-zero for the
            # all-positive inputs here — pandas .round() is half-EVEN
            # and would disagree with the oracle's SQL round() on any
            # exact .5 boundary
            cents = (
                np.floor(l_pdf["l_extendedprice"].mul(100) + 0.5)
                .astype("int64")
            )
            disc_bp = (
                np.floor((1 - l_pdf["l_discount"]).mul(10000) + 0.5)
                .astype("int64")
            )
            per_line = pd.DataFrame(
                {"k": l_pdf["l_orderkey"], "q": cents * disc_bp}
            )
            agg = per_line.groupby("k")["q"].agg(["sum", "size"])
        else:
            agg = pd.DataFrame(columns=["sum", "size"])
        out = o_pdf.rename(columns={"o_orderkey": "k"}).merge(
            agg, left_on="k", right_index=True, how="left"
        )
        out["sum"] = out["sum"].fillna(0).astype("int64")
        out["size"] = out["size"].fillna(0).astype("int64")
        return pd.DataFrame(
            {
                "o_orderkey": out["k"],
                "n_lines": out["size"],
                "o_totalprice": out["o_totalprice"].astype("float64"),
                "line_revenue": out["sum"] / 1e6,
            }
        )

    ob = o.withColumn("_b", F.pmod(F.col("o_orderkey"), F.lit(N_BUCKETS)))
    lb = li.withColumn("_b", F.pmod(F.col("l_orderkey"), F.lit(N_BUCKETS)))
    return (
        ob.groupBy("_b")
        .cogroup(lb.groupBy("_b"))
        .applyInPandas(
            reconcile,
            schema=(
                "o_orderkey long, n_lines long, "
                "o_totalprice double, line_revenue double"
            ),
        )
    )


@query(
    "q_arrow_map",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+'))
                END AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface — the zero-copy sibling of mapInPandas:
    batches arrive as ``pyarrow.RecordBatch`` and are transformed with
    ``pyarrow.compute`` kernels (C++ vectorized, no pandas
    materialization, no Python-object row loop). The last Python-eval
    API in the J family (scalar pandas UDF / applyInPandas /
    applyInArrow / UDTF / cogroup are covered by the queries above).
    Computation: per-doc codepoint length + whitespace token count —
    deliberately the same definition as the SQL oracle so the Arrow
    kernels are value-verified, not just smoke-run. At 100 TB this path
    is bounded by Arrow IPC transfer; no JVM<->Python serialization of
    Python objects ever happens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")

    def count_batches(batches):
        for b in batches:
            text = b.column("text")
            trimmed = pc.utf8_trim_whitespace(text)
            toks = pc.split_pattern_regex(trimmed, r"\s+")
            n_tok = pc.if_else(
                pc.equal(trimmed, ""),
                pa.scalar(0, pa.int32()),
                pc.list_value_length(toks),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(n_tok, pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_tokens"],
            )

    return docs.mapInArrow(
        count_batches, schema="doc_id long, n_chars long, n_tokens long"
    )
