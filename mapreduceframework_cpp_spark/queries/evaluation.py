"""Model-evaluation queries (SURVEY.md §2.2-T): the metrics layer a
training-data pipeline runs over its own quality classifiers — AUC,
decile lift, thresholded confusion/PR, and an A/B two-proportion
z-test.

Kernel lowering: all four are R6 shuffle + R8 reduce shapes
(``MapReduceFramework.cpp:100-143``) over a VALUE HISTOGRAM, never a
global sort of raw rows: ranking metrics (AUC, deciles) aggregate to
one row per distinct score first, then run cumulative windows over
that small aggregate — the formulation that survives 100 TB, where
``row_number() OVER (ORDER BY score)`` on raw rows would serialize on
a single partition.

The evaluated "model" is fixed and engine-portable: score = document
length (``n_chars``), positive label = English-language document —
deterministic, so every count is exact int64 and each metric is ONE
double formula over exact operands (the q_agg_stats float discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents reduced to (score, pos, neg) — one row per distinct
    score value, exact int64 counts. The aggregate every ranking metric
    here starts from (and the reason none of them global-sorts raw
    rows)."""
    return (
        tbl(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").alias("score"))
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
            .cast("long")
            .alias("neg"),
        )
    )


_SCORED_CTE = """
      SELECT n_chars AS score,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS neg
      FROM documents GROUP BY 1
"""


@query(
    "q_score_auc",
    oracle=f"""
    WITH s AS ({_SCORED_CTE}),
    c AS (
      SELECT score, pos, neg,
             coalesce(sum(neg) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM s),
    u AS (
      SELECT sum(pos) AS p, sum(neg) AS n,
             sum(2 * pos * neg_below + pos * neg) AS u2
      FROM c)
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           CAST(u2 AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE))
             AS auc
    FROM u
    """,
)
def q_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the length-score classifier by the tie-aware
    Mann–Whitney statistic: AUC = [Σ_s pos_s·(neg below s) +
    ½·pos_s·neg_s] / (P·N), computed over the per-score histogram —
    the cumulative window runs over distinct score VALUES (a few
    thousand rows), never the raw corpus, so the only raw-data pass is
    one partial-aggregated shuffle on score. Doubling the U statistic
    (`u2`) keeps the half-tie term integral; the final division is the
    single double op."""
    s = _scored(spark, sf_dir)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = s.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    u = c.agg(
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
        F.sum(
            2 * F.col("pos") * F.col("neg_below") + F.col("pos") * F.col("neg")
        ).alias("u2"),
    )
    return u.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        (
            F.col("u2").cast("double")
            / (F.lit(2.0) * F.col("p").cast("double") * F.col("n").cast("double"))
        ).alias("auc"),
    )


@query(
    "q_score_decile_lift",
    oracle=f"""
    WITH s AS ({_SCORED_CTE}),
    c AS (
      SELECT score, pos, neg,
             sum(pos + neg) OVER (ORDER BY score DESC) AS cum_end,
             sum(pos + neg) OVER () AS total,
             sum(pos) OVER () AS total_pos
      FROM s),
    d AS (
      SELECT CAST(((cum_end - 1) * 10) // total AS BIGINT) AS decile,
             pos, neg, total, total_pos
      FROM c)
    SELECT decile,
           CAST(sum(pos + neg) AS BIGINT) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           (CAST(sum(pos) AS DOUBLE) * CAST(max(total) AS DOUBLE))
           / (CAST(sum(pos + neg) AS DOUBLE) * CAST(max(total_pos) AS DOUBLE))
             AS lift
    FROM d GROUP BY 1
    """,
)
def q_score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: rank documents by score descending, cut into
    10 value-grouped deciles (all ties share the decile their
    cumulative endpoint lands in — the deterministic, engine-portable
    cut), and report each decile's positive rate against the corpus
    rate. Same scale shape as the AUC: the ranking windows run over the
    per-score histogram, and decile assignment is exact integer
    arithmetic ((cum_end−1)·10 / total, floor division of
    non-negatives)."""
    s = _scored(spark, sf_dir)
    wc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    c = s.select(
        "pos",
        "neg",
        F.sum(F.col("pos") + F.col("neg")).over(wc).alias("cum_end"),
        F.sum(F.col("pos") + F.col("neg")).over(wall).alias("total"),
        F.sum("pos").over(wall).alias("total_pos"),
    )
    d = c.select(
        F.expr("((cum_end - 1) * 10) div total")
        .cast("long")
        .alias("decile"),
        "pos",
        "neg",
        "total",
        "total_pos",
    )
    g = d.groupBy("decile").agg(
        F.sum(F.col("pos") + F.col("neg")).cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.max("total").alias("total"),
        F.max("total_pos").alias("total_pos"),
    )
    return g.select(
        "decile",
        "n_docs",
        "n_pos",
        (
            (F.col("n_pos").cast("double") * F.col("total").cast("double"))
            / (F.col("n_docs").cast("double") * F.col("total_pos").cast("double"))
        ).alias("lift"),
    )


@query(
    "q_score_confusion",
    oracle=f"""
    WITH s AS ({_SCORED_CTE}),
    t AS (SELECT unnest([500, 800, 1200]) AS threshold),
    m AS (
      SELECT t.threshold,
             sum(CASE WHEN s.score >= t.threshold THEN s.pos ELSE 0 END) AS tp,
             sum(CASE WHEN s.score >= t.threshold THEN s.neg ELSE 0 END) AS fp,
             sum(CASE WHEN s.score <  t.threshold THEN s.pos ELSE 0 END) AS fn,
             sum(CASE WHEN s.score <  t.threshold THEN s.neg ELSE 0 END) AS tn
      FROM t CROSS JOIN s GROUP BY 1)
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision_,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
             AS recall_,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE 2.0 * CAST(tp AS DOUBLE)
                     / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
    FROM m
    """,
)
def q_score_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at three operating
    thresholds in ONE pass: the 3-row threshold spine broadcasts
    against the per-score histogram (3× a tiny aggregate, map-side),
    and each cell is a conditional sum — no per-threshold rescan of the
    corpus. All counts exact int64; each derived metric one double
    division, NULL-guarded on empty denominators."""
    s = _scored(spark, sf_dir)
    t = spark.createDataFrame([(500,), (800,), (1200,)], "threshold long")
    j = t.crossJoin(s)
    ge = F.col("score") >= F.col("threshold")
    m = j.groupBy("threshold").agg(
        F.sum(F.when(ge, F.col("pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(ge, F.col("neg")).otherwise(0)).alias("fp"),
        F.sum(F.when(~ge, F.col("pos")).otherwise(0)).alias("fn"),
        F.sum(F.when(~ge, F.col("neg")).otherwise(0)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        F.col("threshold").cast("long"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.when(tp + fp == 0, F.lit(None).cast("double"))
        .otherwise(tp.cast("double") / (tp + fp).cast("double"))
        .alias("precision_"),
        F.when(tp + fn == 0, F.lit(None).cast("double"))
        .otherwise(tp.cast("double") / (tp + fn).cast("double"))
        .alias("recall_"),
        F.when(2 * tp + fp + fn == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(2.0) * tp.cast("double") / (2 * tp + fp + fn).cast("double"))
        .alias("f1"),
    )


@query(
    "q_ab_ztest",
    oracle="""
    WITH conv AS (
      SELECT user_id,
             CAST(instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR) || '#ab'), 1, 1))
                  - 1 AS BIGINT) % 2 AS grp,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       >= 14 THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1, 2),
    agg AS (
      SELECT sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS c_a,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS c_b
      FROM conv)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
                ELSE (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE)))
           END AS z_stat
    FROM agg
    """,
)
def q_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between hash-split experiment arms:
    users are assigned A/B by the parity of their md5's first hex digit
    (deterministic, uniform, reproducible — how real experiment
    bucketing works), conversion = the user made ≥14 purchases (the
    corpus median split, so neither arm degenerates to all-converted
    and the pooled variance stays positive; the all/none cases are
    still NULL-guarded in both engines). Two
    aggregate-first reductions (events → per-user conversion → four
    exact counters) and the pooled z statistic is one double formula —
    nothing but 4 integers crosses the final boundary. Yields the
    standard |z| < 2 sanity check that a deterministic split carries no
    built-in bias."""
    ev = tbl(spark, sf_dir, "events")
    conv = (
        ev.groupBy(
            "user_id",
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("user_id").cast("string"), F.lit("#ab")
                                )
                            ),
                            1,
                            1,
                        ),
                    )
                    - 1
                ).cast("long")
                % 2
            ).alias("grp"),
        )
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
    )
    agg = conv.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)).alias(
            "c_b"
        ),
    )
    na, ca = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    conv_tot = F.col("c_a") + F.col("c_b")
    n_tot = F.col("n_a") + F.col("n_b")
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("c_b"),
        F.when((conv_tot == 0) | (conv_tot == n_tot), F.lit(None).cast("double"))
        .otherwise(
            (ca / na - cb / nb)
            / F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
        )
        .alias("z_stat"),
    )
