"""Custom-sink queries (SURVEY.md §2.2-A, round-10): write through the
``txn_files`` Python data sink (sources/pysink.py — the Spark 4
DataSource writer API, batch AND streaming) and hash-verify the values
that SURVIVE the full write→commit→manifest→read-back round trip
against a SQL oracle computed straight from the input tables. A sink
bug of any kind — lost task file, double-published batch, staged file
leaking into readers, JSON round-trip corruption — shows up as a value
diff, not just a row-count diff.

Kernel lowering: R9 emit3/output collection — the reference funnels
every reduce worker's output through one mutex-guarded driver-memory
vector (`MapReduceFramework.cpp:176-189`, `MapReduceFramework.h:15-24`);
the sink replaces that serialization point with per-task staged files
and a single atomic metadata-only driver commit (see pysink docstring
for the scale argument).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.pysink import (
    compact,
    read_changes,
    read_committed,
    read_committed_between,
    read_snapshot,
    recluster,
    register,
    scratch_dir,
)
from mapreduceframework_cpp_spark.sources.tables import tbl

_BATCH_SCHEMA = "lang string, source string, n_docs bigint, total_chars bigint"
_STREAM_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


@query(
    "q_sink_python",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_sink_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch path: aggregate documents per (lang, source), save through
    ``txn_files`` (task-staged files + one atomic manifest commit),
    then return what :func:`read_committed` sees. The oracle computes
    the same aggregate directly from the table, so every value must
    survive executor-side JSONL staging, the driver's publish rename,
    and the manifest-scoped read."""
    register(spark)
    agg = (
        tbl(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    target = scratch_dir("graft_sink_batch_")
    agg.write.format("txn_files").mode("append").save(target)
    return read_committed(spark, target, _BATCH_SCHEMA)


@query(
    "q_sink_stream_python",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def q_sink_stream_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming path: ``readStream`` over events → stateless
    project/filter → ``writeStream.format("txn_files")`` under
    ``availableNow`` (per-batch manifests, replay-idempotent commit),
    then aggregate the committed read-back. The oracle aggregates the
    raw table under the same predicate, so the whole streaming
    write/commit/read cycle must be lossless and duplicate-free.
    DECIMAL(18,2) sums on both sides make the totals order-exact
    (same pattern as q_stream_session)."""
    from mapreduceframework_cpp_spark.streaming.stream import events_stream

    register(spark)
    proj = (
        events_stream(spark, sf_dir)
        .where(F.col("value") > 0)
        .select("event_id", "user_id", "event_type", "value")
    )
    target = scratch_dir("graft_sink_stream_")
    q = (
        proj.writeStream.format("txn_files")
        .option("checkpointLocation", scratch_dir("graft_sink_chk_"))
        .trigger(availableNow=True)
        .start(target)
    )
    q.awaitTermination()
    back = read_committed(spark, target, _STREAM_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double"
)


@query(
    "q_sink_pruned_read",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 2000 AND 3499
    """,
)
def q_sink_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping on the sink's manifests: orders are
    written range-clustered on o_orderkey (repartitionByRange → each
    task file covers a tight key span, each manifest entry carries the
    executor-computed per-file min/max), then a key-range read prunes
    at the MANIFEST — only overlapping files are opened, the residual
    WHERE keeps correctness independent of the stats.
    tests/test_pysink.py asserts the skip actually happens (file count
    read < file count committed); this query hash-verifies that the
    pruned read returns exactly the table-direct answer. This is the
    file-level analogue of parquet row-group skipping — the mechanism
    that makes a range query on a 100 TB range-clustered table read
    GBs, not TBs."""
    register(spark)
    rows = (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(16, "o_orderkey")
    )
    target = scratch_dir("graft_sink_zone_")
    rows.write.format("txn_files").mode("append").save(target)
    return read_committed_between(
        spark, target, _ORDERS_SCHEMA, "o_orderkey", 2000, 3499
    )


@query(
    "q_sink_time_travel",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    """,
)
def q_sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation / time travel on the manifest log: commit 1
    writes the English documents, commit 2 the rest; reading AS OF the
    first commit must see only commit 1 — the oracle is the
    lang='en' aggregate, so any leakage of the second commit into the
    first snapshot hash-fails. Commit order is carried by the
    sequence-numbered manifest names (single-writer; a shared log
    would CAS the sequence slot — see pysink docstring)."""
    register(spark)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    target = scratch_dir("graft_sink_tt_")
    fmt = docs.where(F.col("lang") == "en").write.format("txn_files")
    fmt.mode("append").save(target)
    docs.where(
        (F.col("lang") != "en") | F.col("lang").isNull()
    ).write.format("txn_files").mode("append").save(target)
    snap1 = read_snapshot(
        spark,
        target,
        "doc_id bigint, lang string, source string, n_chars bigint",
        as_of=1,
    )
    return snap1.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_sink_parquet",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderkey BETWEEN 8000 AND 9999
    """,
)
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native sink (`txn_parquet`, DataSourceArrowWriter): tasks
    stage columnar parquet parts from RecordBatches — no per-row
    Python — under the SAME manifest protocol, then a zone-map pruned
    key-range read returns the rows. o_orderdate (timestamp) rides the
    round trip, which the JSONL path cannot carry: typed fidelity is
    the point of the Arrow form. Hash-verified against the
    table-direct oracle including the timestamp values."""
    register(spark)
    rows = (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .repartitionByRange(16, "o_orderkey")
    )
    target = scratch_dir("graft_sink_pq_")
    rows.write.format("txn_parquet").mode("append").save(target)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
        "o_orderdate timestamp_ntz"
    )
    return read_committed_between(
        spark, target, schema, "o_orderkey", 8000, 9999
    )


@query(
    "q_sink_changes",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang <> 'en' OR lang IS NULL
    GROUP BY lang
    """,
)
def q_sink_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change feed off the manifest log: three ordered
    commits (en / de+fr / rest); `read_changes(1, 3)` must return
    exactly commits 2-3 — the non-English documents. The oracle is the
    table-direct complement aggregate, so a window that leaks commit 1
    or drops part of commits 2-3 hash-fails. This is the tail-the-log
    consumption shape an incremental 100 TB pipeline uses instead of
    re-scanning the table per run (the engine's incremental family —
    q_incr_agg / q_incr_join_view — consumes exactly this feed
    upstream)."""
    register(spark)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    target = scratch_dir("graft_sink_cdc_")
    docs.where(F.col("lang") == "en").write.format("txn_files").mode(
        "append"
    ).save(target)
    docs.where(F.col("lang").isin("de", "fr")).write.format("txn_files").mode(
        "append"
    ).save(target)
    docs.where(
        (~F.col("lang").isin("en", "de", "fr")) | F.col("lang").isNull()
    ).write.format("txn_files").mode("append").save(target)
    feed = read_changes(
        spark,
        target,
        "doc_id bigint, lang string, source string, n_chars bigint",
        from_snapshot=1,
        to_snapshot=3,
    )
    return feed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_sink_recluster",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN 5000 AND 5999
    """,
)
def q_sink_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-clustering makes zone maps effective: orders are first
    committed HASH-laid-out (every file spans the whole o_orderkey
    range — manifest stats prune nothing, asserted in
    tests/test_pysink.py), then `recluster` rewrites them
    range-partitioned in one atomic swap; the same key-range read now
    opens ~1-2 of 8 files. The returned rows must still equal the
    table-direct oracle — maintenance ops may only move bytes, never
    change the table."""
    register(spark)
    rows = (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .repartition(16)  # deliberately clustering-hostile layout
    )
    target = scratch_dir("graft_sink_recl_")
    rows.write.format("txn_parquet").mode("append").save(target)
    schema = (
        "o_orderkey bigint, o_orderstatus string, o_orderpriority string, "
        "o_totalprice double"
    )
    recluster(spark, target, schema, "o_orderkey", target_files=8)
    return read_committed_between(
        spark, target, schema, "o_orderkey", 5000, 5999
    )


@query(
    "q_sink_format_read",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 3000 AND 7999
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_format_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric DataSource READ half (round-11): the write goes
    through ``df.write.format("txn_parquet")`` and the read comes back
    through ``spark.read.format("txn_parquet").load(path)`` — no
    library helper, no user schema (the manifest carries the committed
    StructType), with ``option("pushdown", "true")`` so the key-range
    predicate reaches `_TxnPruningReader.pushFilters` and prunes file
    listings at the MANIFEST before any byte is read (the filters are
    all returned residual, so Spark still applies them row-level —
    pruning is advisory, correctness is not stats-dependent).
    Range-clustered on l_orderkey so the zone maps are tight;
    tests/test_pysink.py asserts the partition count actually drops.
    DECIMAL(18,2) sums on both sides make the totals order-exact."""
    register(spark)
    rows = (
        tbl(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_returnflag", "l_linestatus",
            "l_quantity", "l_extendedprice",
        )
        .repartitionByRange(16, "l_orderkey")
    )
    target = scratch_dir("graft_sink_fmt_")
    rows.write.format("txn_parquet").mode("append").save(target)
    # the pushdown conf is session-wide: restore it so the setting
    # never leaks into later queries in the same harness run (ADVICE
    # r11 — a leaked true changes every Python DataSource read that
    # defines pushFilters). The returned frame PLANS (and runs
    # pushFilters/partitions) inside the guarded window; execution
    # later replays the already-pruned partition list.
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        back = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(target)
            .where(F.col("l_orderkey").between(3000, 7999))
        )
        out = back.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        # materialize under the conf, eagerly: the Python DataSource
        # plans (pushFilters/partitions) at ACTION time, so a lazily
        # returned frame would re-plan after the finally restored the
        # conf — and a reader defining pushFilters hard-fails when the
        # conf is off (the round-11 trap)
        return out.localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


@query(
    "q_sink_merge",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey <= 9999
    ),
    s AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey BETWEEN 2000 AND 2999
      UNION ALL
      SELECT o_orderkey + 1000000 AS o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey BETWEEN 500 AND 749
    )
    SELECT o_orderkey, o_custkey, o_totalprice FROM s
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice FROM t
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
    """,
)
def q_sink_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned MERGE (upsert) into the transactional sink: a
    range-clustered orders table takes a source of key-range updates
    (doubled totals for 2000-2999) plus out-of-range inserts; zone
    maps bound the rewrite to the files intersecting the source's key
    span (tests/test_pysink.py pins 1-of-10 touched on a narrow
    merge), and the DELTA commit removes+adds atomically — readers
    fold adds minus removes, seeing pre- or post-merge only. The
    oracle restates MERGE as s UNION ALL (t anti s), so a lost
    update, double insert, dropped survivor row, or leaked removed
    file all hash-fail. Doubling a DOUBLE is exact, so values compare
    bit-for-bit."""
    from mapreduceframework_cpp_spark.sources.pysink import merge_into

    register(spark)
    orders = tbl(spark, sf_dir, "orders")
    target_rows = (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .where(F.col("o_orderkey") <= 9999)
        .repartitionByRange(10, "o_orderkey")
    )
    target = scratch_dir("graft_sink_merge_")
    target_rows.write.format("txn_parquet").mode("append").save(target)
    schema = "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    source = (
        orders.where(F.col("o_orderkey").between(2000, 2999))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * 2).cast("double").alias("o_totalprice"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey").between(500, 749)).select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    merge_into(spark, target, schema, source, "o_orderkey")
    return read_committed(spark, target, schema)


@query(
    "q_sink_stream_read",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_sink_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SOURCE over the sink's manifest log (the read twin of
    q_sink_stream_python): three ordered batch commits land in a
    txn_parquet table, then ``spark.readStream.format("txn_parquet")``
    tails the log under availableNow — offsets are manifest names, so
    the micro-batch consumes exactly the commits since the checkpoint
    (tests pin restart exactly-once and the append-only guard). The
    aggregate of everything the stream delivered must equal the
    table-direct oracle: a dropped commit, re-emitted file, or a
    staged/orphan leak into the stream hash-fails. Parquet parts come
    back as Arrow RecordBatches — no per-row Python on the read."""
    from mapreduceframework_cpp_spark.streaming.stream import run_to_memory

    register(spark)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    target = scratch_dir("graft_sink_tail_")
    for part in (
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang").isin("de", "fr")),
        docs.where(
            (~F.col("lang").isin("en", "de", "fr")) | F.col("lang").isNull()
        ),
    ):
        part.write.format("txn_parquet").mode("append").save(target)
    tailed = run_to_memory(
        spark.readStream.format("txn_parquet").load(target),
        name="q_sink_stream_read_sink",
    )
    return tailed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_sink_evolve",
    oracle="""
    SELECT lang,
           CASE WHEN lang = 'en' THEN NULL ELSE source END AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_sink_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema EVOLUTION on the sink: commit 1 writes the English
    documents WITHOUT a source column; commit 2 writes the rest with
    ``source`` added. The format read serves the MERGED schema
    (manifest schemas folded in commit order, all-nullable), padding
    pre-evolution files with typed NULLs at scan time — the
    Iceberg/Delta add-column contract, which at 100 TB is the
    difference between evolving a table and rewriting it. The oracle
    emulates the evolution with a CASE (en rows never carried source),
    so a mis-padded file, dropped column, or wrong null-fill
    hash-fails."""
    register(spark)
    docs = tbl(spark, sf_dir, "documents")
    target = scratch_dir("graft_sink_evo_")
    docs.where(F.col("lang") == "en").select(
        "doc_id", "lang", "n_chars"
    ).write.format("txn_parquet").mode("append").save(target)
    docs.where((F.col("lang") != "en") | F.col("lang").isNull()).select(
        "doc_id", "lang", "n_chars", "source"
    ).write.format("txn_parquet").mode("append").save(target)
    back = spark.read.format("txn_parquet").load(target)
    return back.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "q_sink_pipeline",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_orderkey <= 11999 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q_sink_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-to-log incremental pipeline — the sink's source and sink
    halves COMPOSED: three ordered batch commits land in txn table A;
    ``spark.readStream.format("txn_parquet")`` tails A's manifest log
    (offsets = manifest names), a stateless filter/projection runs in
    between, and ``writeStream.format("txn_files")`` commits each
    micro-batch exactly-once into table B (batchId-keyed manifests).
    The returned aggregate reads B's committed files only, so the
    oracle (the same filter straight off the orders table) catches a
    dropped commit on EITHER log, a replayed batch double-write, or a
    staged/orphan leak anywhere in the chain. This is the 100 TB
    pipeline shape: downstream jobs tail upstream tables'
    transaction logs instead of re-scanning them, with exactly-once
    delivery at file granularity on both ends."""
    register(spark)
    orders = (
        tbl(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        .where(F.col("o_orderkey") <= 11999)
    )
    src_tbl = scratch_dir("graft_sink_pipe_a_")
    for lo, hi in ((0, 3999), (4000, 7999), (8000, 11999)):
        orders.where(F.col("o_orderkey").between(lo, hi)).write.format(
            "txn_parquet"
        ).mode("append").save(src_tbl)
    dst_tbl = scratch_dir("graft_sink_pipe_b_")
    q = (
        spark.readStream.format("txn_parquet")
        .load(src_tbl)
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .writeStream.format("txn_files")
        .option("checkpointLocation", scratch_dir("graft_sink_pipe_chk_"))
        .trigger(availableNow=True)
        .start(dst_tbl)
    )
    q.awaitTermination()
    back = read_committed(
        spark,
        dst_tbl,
        "o_orderkey bigint, o_orderpriority string, o_totalprice double",
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "q_sink_compact",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: per-lang aggregates are committed as many
    small files (one per shuffle partition), then compacted into one
    part via a single atomic overwrite commit — readers see the old
    file set or the new one, never a mixture. The returned DataFrame
    reads the POST-compaction table, so the rewrite must be lossless
    to hash-match the table-direct oracle. (The small-file problem is
    the classic failure mode of streaming ingestion into a 100 TB
    table; manifest-swap compaction is the remedy all real table
    formats ship.)"""
    register(spark)
    agg = (
        tbl(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    target = scratch_dir("graft_sink_compact_")
    agg.repartition(8).write.format("txn_files").mode("append").save(target)
    schema = (
        "lang string, n_docs bigint, n_sources bigint, total_chars bigint"
    )
    compact(spark, target, schema)
    return read_committed(spark, target, schema)


@query(
    "q_sink_clustered_read",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(p_size) AS BIGINT) AS sum_size,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_retail
    FROM part
    WHERE p_partkey BETWEEN 1000 AND 2999
    GROUP BY p_brand
    """,
)
def q_sink_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared clustering at write time (round-12): the part table is
    written through :func:`write_clustered` — one range shuffle on
    p_partkey, ``option("clusterBy")`` recording the column in the
    manifest — so every staged file covers a tight key span and the
    format read's zone-map pushdown prunes the listing without the
    caller hand-shuffling (tests/test_pysink.py pins the disjoint
    per-file spans and that recluster() defaults to the recorded
    column). The key-range read comes back through
    ``spark.read.format("txn_parquet")`` with pushdown; every filter
    stays residual, so the hash-verified values never depend on the
    stats. At 100 TB, writer-declared clustering is what keeps zone
    maps effective from the FIRST commit instead of only after a
    maintenance rewrite."""
    from mapreduceframework_cpp_spark.sources.pysink import write_clustered

    register(spark)
    rows = tbl(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    target = scratch_dir("graft_sink_clus_")
    write_clustered(rows, target, "p_partkey", target_files=16)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        back = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(target)
            .where(F.col("p_partkey").between(1000, 2999))
        )
        out = back.groupBy("p_brand").agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("p_size").cast("long").alias("sum_size"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_retail"),
        )
        # plan + run under the conf (a reader defining pushFilters
        # hard-fails when it is off), restore it before returning
        return out.localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


@query(
    "q_sink_skip_changes",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_sink_skip_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming across table MAINTENANCE (round-12,
    ``option("skipChangeCommits", "true")`` — Delta's identically-named
    opt-in): a checkpointed stream consumes commit 1, a compaction
    rewrites the table mid-stream, commit 2 lands, and the RESUMED
    stream skips the compaction's rewrite commit instead of raising
    (the default posture, still pinned by tests) — delivering commit 2
    only. The foreachBatch-parquet'd union of both runs must equal the
    customer table exactly: a re-emitted rewritten row (duplicate) or
    a dropped commit hash-fails. This is how a 100 TB pipeline keeps
    its downstream streams alive through OPTIMIZE/compaction cycles
    without rebuilding every checkpoint."""
    register(spark)
    cust = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("double")
    )
    src = scratch_dir("graft_sink_skipc_src_")
    out = scratch_dir("graft_sink_skipc_out_")
    chk = scratch_dir("graft_sink_skipc_chk_")
    half = cust.agg(F.expr("percentile_approx(c_custkey, 0.5)")).collect()[0][0]  # scalar-probe

    def run_once() -> None:
        q = (
            spark.readStream.format("txn_parquet")
            .option("skipChangeCommits", "true")
            .load(src)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cust.where(F.col("c_custkey") <= half).write.format("txn_parquet").mode(
        "append"
    ).save(src)
    run_once()  # consumes commit 1
    from mapreduceframework_cpp_spark.sources.pysink import compact

    schema = "c_custkey bigint, c_mktsegment string, c_acctbal double"
    compact(spark, src, schema)  # maintenance lands mid-stream
    cust.where(F.col("c_custkey") > half).write.format("txn_parquet").mode(
        "append"
    ).save(src)
    run_once()  # resumes past the compact, delivers commit 2 only
    back = spark.read.schema(schema).parquet(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_acctbal"),
    )


@query(
    "q_sink_zorder_read",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN 400 AND 899
      AND o_orderkey BETWEEN 3000 AND 8999
    """,
)
def q_sink_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER re-clustering on the sink (round-12, the OPTIMIZE
    ZORDER BY maintenance op): a clustering-hostile orders table is
    rewritten along the Morton curve of (o_custkey, o_orderkey) —
    `sources/layout.py::zorder_key`, pure JVM bit arithmetic — in one
    atomic basis-checked swap, making the manifest zone maps tight on
    BOTH columns at once; the column list is recorded in the manifest
    so a column-less recluster() preserves the layout. The
    two-predicate read comes back through the format API with pushdown
    pruning file listings on both dimensions (tests pin that each
    dimension individually skips files — a single-column sort can only
    ever tighten one). Every filter stays residual, so the
    hash-verified rows never depend on the stats. At 100 TB the
    z-curve is what lets a (customer × time)-shaped query skip most
    files when either predicate alone is unselective."""
    from mapreduceframework_cpp_spark.sources.pysink import recluster_zorder

    register(spark)
    rows = (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartition(16)  # deliberately clustering-hostile layout
    )
    target = scratch_dir("graft_sink_zord_")
    rows.write.format("txn_parquet").mode("append").save(target)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double"
    )
    recluster_zorder(
        spark, target, schema, ["o_custkey", "o_orderkey"], target_files=16
    )
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        back = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(target)
            .where(F.col("o_custkey").between(400, 899))
            .where(F.col("o_orderkey").between(3000, 8999))
        )
        # plan + run under the conf (see q_sink_clustered_read)
        return back.localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


@query(
    "q_sink_delete_vectors",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_orderkey <= 19999
      AND NOT (o_orderstatus = 'F' AND o_orderkey <= 7999)
      AND NOT (o_orderkey BETWEEN 12000 AND 12499)
    GROUP BY o_orderpriority
    """,
)
def q_sink_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector DELETE (round-12 — the Delta DV / Iceberg
    position-delete shape): two `delete_where` calls commit (file, row
    position) parquet sidecars instead of rewriting data files — the
    base parts stay byte-identical (merge-on-read), and every reader
    anti-joins the positions away via the parquet scan's
    ``_metadata.row_index`` (one distributed anti-join, no per-row
    Python; tests pin that helpers, the format API, time travel, merge
    inputs, and compaction all observe the masks, that re-deletes
    no-op, and that the commit OCC-fails if a concurrent rewrite
    replaced a masked file). The oracle restates both deletes as
    NOT(predicate) conjunctions, so a row that escapes its mask, a
    double-masked survivor, or a position mis-addressing hash-fails.
    At 100 TB this is how point/predicate deletes (GDPR erasure, bad
    batch retraction) cost a position list, not a table rewrite."""
    from mapreduceframework_cpp_spark.sources.pysink import delete_where

    register(spark)
    schema = (
        "o_orderkey bigint, o_orderstatus string, o_orderpriority string, "
        "o_totalprice double"
    )
    rows = (
        tbl(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        .where(F.col("o_orderkey") <= 19999)
        .repartitionByRange(10, "o_orderkey")
    )
    target = scratch_dir("graft_sink_dv_")
    rows.write.format("txn_parquet").mode("append").save(target)
    delete_where(
        spark, target, schema,
        "o_orderstatus = 'F' AND o_orderkey <= 7999",
    )
    delete_where(
        spark, target, schema, "o_orderkey BETWEEN 12000 AND 12499"
    )
    back = read_committed(spark, target, schema)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "q_sink_checkpoint_read",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_supp,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_sink_checkpoint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-log CHECKPOINTING (round-13, VERDICT r12 item 2 —
    Delta's `_last_checkpoint` shape): the supplier table lands in four
    append commits, then a month's worth of tiny commits is simulated
    (40 empty-delta manifests — a 10 s-cadence streaming sink's log),
    :func:`checkpoint` folds the whole log into one ``ckpt-*.json``
    snapshot, and two more commits land as the tail. The read back
    through ``spark.read.format("txn_parquet")`` then PLANS from
    checkpoint + 2-manifest tail instead of json-loading all 46
    commits (tests/test_pysink.py pins the load count); the
    hash-verified join against nation proves the checkpointed plan
    loses nothing. At 100 TB with a long-lived streaming writer, this
    is the difference between O(interval) and O(#commits-forever)
    driver metadata per scan plan."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        _claim_manifest,
        checkpoint,
    )

    register(spark)
    supp = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    target = scratch_dir("graft_sink_ckpt_")
    for lo, hi in ((0, 6), (6, 12), (12, 18), (18, 22)):
        supp.where(
            (F.col("s_nationkey") >= lo) & (F.col("s_nationkey") < hi)
        ).coalesce(1).write.format("txn_parquet").mode("append").save(target)
    import os as _os

    txn = _os.path.join(target, "_txn")
    for seq in range(4, 44):
        _claim_manifest(
            txn,
            f"manifest-{seq:020d}-c.json",
            {"files": [], "rows": 0, "entries": []},
        )
    assert checkpoint(target)
    for lo, hi in ((22, 24), (24, 25)):
        supp.where(
            (F.col("s_nationkey") >= lo) & (F.col("s_nationkey") < hi)
        ).coalesce(1).write.format("txn_parquet").mode("append").save(target)

    back = spark.read.format("txn_parquet").load(target)
    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        back.join(
            F.broadcast(nation),
            back.s_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_supp"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


@query(
    "q_sink_change_feed",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               CAST(c_acctbal AS DOUBLE) AS acct
        FROM customer
    ),
    f1 AS (SELECT * FROM base WHERE k <= 100),
    f2 AS (SELECT * FROM base WHERE k > 100),
    dv_del AS (SELECT * FROM base WHERE acct < 0),
    f2_live AS (SELECT * FROM f2 WHERE acct >= 0),
    src AS (
        SELECT k, seg, acct + 1000 AS acct
        FROM base WHERE k > 100 AND k <= 120
    ),
    changes AS (
        SELECT k, seg, acct, 'insert' AS ct, 0 AS cv FROM f1
        UNION ALL SELECT k, seg, acct, 'insert', 1 FROM f2
        UNION ALL SELECT k, seg, acct, 'delete', 2 FROM dv_del
        UNION ALL SELECT k, seg, acct, 'delete', 3 FROM f2_live
        UNION ALL SELECT k, seg, acct, 'insert', 3 FROM src
        UNION ALL SELECT k, seg, acct, 'insert', 3
                  FROM f2_live WHERE k NOT BETWEEN 101 AND 120
    )
    SELECT ct AS _change_type,
           CAST(cv AS BIGINT) AS _commit_version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(acct AS DECIMAL(18,2))) AS DOUBLE) AS sum_acct
    FROM changes
    GROUP BY ct, cv
    """,
)
def q_sink_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED (round-13, VERDICT r12 item 3 — Delta
    ``readChangeFeed`` / Iceberg changelog scan): the customer table
    lands as two single-file appends, a `delete_where` masks the
    negative balances via a deletion-vector sidecar, and a file-pruned
    `merge_into` updates a key span (zone maps bound the rewrite to
    the one file holding those keys). The format-API window read with
    ``option("readChangeFeed","true")`` then reconstructs ROW-LEVEL
    history straight from the manifest log — appends as inserts, the
    DV commit's masked positions as deletes, the merge as its removed
    file's then-live rows (deletes) plus its rewritten file (inserts)
    — with no write-time change sidecars. The oracle restates every
    commit's row set as pure SQL over the source table, so a
    re-emitted already-deleted row, a lost update pair, a wrong
    `_commit_version`, or a merge that rewrote the wrong file all
    hash-fail. At 100 TB this is what lets a downstream CDC consumer
    tail a maintained table (deletes and merges included) instead of
    re-snapshotting it."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        delete_where,
        merge_into,
    )

    register(spark)
    base = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("acct"),
    )
    target = scratch_dir("graft_sink_cdf_")
    base.where("k <= 100").coalesce(1).write.format("txn_parquet").mode(
        "append"
    ).save(target)
    base.where("k > 100").coalesce(1).write.format("txn_parquet").mode(
        "append"
    ).save(target)
    schema = "k bigint, seg string, acct double"
    delete_where(spark, target, schema, "acct < 0")
    src = base.where("k > 100 AND k <= 120").withColumn(
        "acct", F.col("acct") + 1000
    )
    merge_into(spark, target, schema, src, "k")
    feed = (
        spark.read.format("txn_parquet")
        .option("changesFrom", 0)
        .option("changesTo", 4)
        .option("readChangeFeed", "true")
        .load(target)
    )
    return feed.groupBy("_change_type", "_commit_version").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("acct").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_acct"),
    )


@query(
    "q_sink_dv_maintenance",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM part
    WHERE NOT (p_size <= 4)
      AND NOT (p_partkey % 10 = 0)
    GROUP BY p_brand
    """,
)
def q_sink_dv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV MAINTENANCE short of compaction (round-13, VERDICT r12 item
    4 — Delta DV coalescing + ``REORG ... APPLY (PURGE)``): the part
    table lands range-clustered, two `delete_where` calls accrete two
    position sidecars, `coalesce_dvs` folds them into ONE consolidated
    dataset (a dv_replaces commit — metadata-only to the change feed),
    and `purge_deletes(threshold=0.05)` rewrites ONLY the files whose
    masked fraction exceeds 5%, baking their deletes in while
    under-threshold files keep their part names and their cheap
    merge-on-read masks. The final format-API read must see exactly
    the undeleted rows whichever files the purge chose to rewrite —
    the oracle restates both deletes as NOT(predicate) conjunctions,
    so a resurrected row (the classic purge/coalesce race bug), a
    double-baked delete, or a dropped live position hash-fails. At
    100 TB: N point deletes cost one anti-join dataset instead of N,
    and heavily-masked regions stop taxing every scan, all without a
    full-table rewrite."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        coalesce_dvs,
        delete_where,
        purge_deletes,
    )

    register(spark)
    rows = (
        tbl(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
        .withColumn("p_retailprice", F.col("p_retailprice").cast("double"))
        .repartitionByRange(8, "p_partkey")
    )
    target = scratch_dir("graft_sink_dvm_")
    rows.write.format("txn_parquet").mode("append").save(target)
    schema = "p_partkey bigint, p_brand string, p_size int, p_retailprice double"
    delete_where(spark, target, schema, "p_size <= 4")
    delete_where(spark, target, schema, "p_partkey % 10 = 0")
    coalesce_dvs(spark, target)
    purge_deletes(spark, target, schema, threshold=0.05)
    back = spark.read.format("txn_parquet").load(target)
    return back.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "q_sink_column_mapping",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
    ),
    a AS (SELECT * FROM base WHERE k <= 3000),
    b AS (SELECT * FROM base WHERE k > 3000 AND k <= 6000),
    full_read AS (
        SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        WHERE k BETWEEN 1000 AND 4500 AND price >= 1000
    )
    SELECT 'full' AS tag,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM full_read
    UNION ALL
    SELECT 'asof1' AS tag,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM a
    """,
)
def q_sink_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-MAPPING schema evolution (round-13, VERDICT r12 item 6 —
    the Iceberg/Delta column-mapping shape): the orders table lands
    range-clustered carrying a doomed ``o_orderpriority`` column, then
    `rename_column` turns ``o_totalprice`` into ``price`` and
    `drop_column` tombstones ``o_orderpriority`` — both METADATA-ONLY commits
    (zero data rewritten; old files keep their frozen physical names,
    the scan translates logical→physical at plan time). A post-rename
    append writes under the NEW logical name (staged physically as
    ``o_totalprice``, proving the physical layer never moves), and the
    verified read runs the renamed column through zone-map PUSHDOWN
    (stats are keyed physical; the reader translates) plus a
    ``price`` predicate, unioned with an ``asOf`` TIME-TRAVEL read of
    the pre-rename snapshot served under the CURRENT logical schema.
    A wrong physical translation on either side of the rename
    boundary, a resurrected dropped column, or time travel serving
    stale names all hash-fail. At 100 TB a rename/drop costs one
    manifest, not a table rewrite."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        drop_column,
        rename_column,
    )

    register(spark)
    base = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_orderpriority").alias("o_orderpriority"),
    )
    target = scratch_dir("graft_sink_cmap_")
    base.where("k <= 3000").repartitionByRange(8, "k").write.format(
        "txn_parquet"
    ).mode("append").save(target)
    rename_column(target, "o_totalprice", "price")
    drop_column(target, "o_orderpriority")
    base.where("k > 3000 AND k <= 6000").withColumnRenamed(
        "o_totalprice", "price"
    ).drop("o_orderpriority").repartitionByRange(4, "k").write.format(
        "txn_parquet"
    ).mode("append").save(target)

    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        full = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(target)
            .where(F.col("k").between(1000, 4500))
            .where(F.col("price") >= 1000.0)
            .localCheckpoint()  # plan + run under the conf (r12 lesson)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)
    asof = spark.read.format("txn_parquet").option("asOf", 1).load(target)

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("tag"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )

    return agg(full, "full").unionByName(agg(asof, "asof1"))
