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


@query(
    "q_rank_fusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
                    || '#rel'), 1, 1)) - 1) * CAST(1048576 AS BIGINT)
             + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
                    || '#rel'), 2, 1)) - 1) * CAST(65536 AS BIGINT)
             + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
                    || '#rel'), 3, 1)) - 1) * CAST(4096 AS BIGINT)
             + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)
                    || '#rel'), 4, 1)) - 1) * CAST(256 AS BIGINT)
               AS s2
      FROM documents),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS r1,
             row_number() OVER (PARTITION BY lang
                                ORDER BY s2 DESC, doc_id) AS r2
      FROM scored),
    fused AS (
      SELECT doc_id, lang, r1, r2,
             1.0 / CAST(60 + r1 AS DOUBLE) + 1.0 / CAST(60 + r2 AS DOUBLE)
               AS rrf,
             row_number() OVER (PARTITION BY lang
                                ORDER BY 1.0 / CAST(60 + r1 AS DOUBLE)
                                         + 1.0 / CAST(60 + r2 AS DOUBLE) DESC,
                                         doc_id) AS rn
      FROM ranked)
    SELECT lang, doc_id, CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2,
           rrf
    FROM fused WHERE rn <= 5
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankers (the standard
    hybrid-search combiner): per language, rank documents by a length
    prior and by an independent hash-derived relevance proxy, fuse with
    RRF (k=60), keep the top 5. Both rank passes and the fusion window
    share ONE lang exchange (same partition key); each RRF score is the
    sum of two exact reciprocals — identical doubles in both engines —
    and every ordering carries a doc_id tie-break, so the top-5 set is
    bit-deterministic. The mergeable-rank formulation (RRF needs only
    per-ranker positions, no score calibration) is exactly why RRF is
    the 100 TB hybrid fusion of choice."""
    docs = tbl(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#rel")))
    s2 = sum(
        (
            (F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1).cast(
                "long"
            )
            * F.lit(16 ** (4 - i) * 256).cast("long")
        )
        for i in range(1, 5)
    )
    scored = docs.select("doc_id", "lang", "n_chars", s2.alias("s2"))
    w1 = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    w2 = Window.partitionBy("lang").orderBy(F.desc("s2"), "doc_id")
    ranked = scored.select(
        "doc_id",
        "lang",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(60) + F.col("r1")).cast("double")
        + F.lit(1.0) / (F.lit(60) + F.col("r2")).cast("double")
    )
    wf = Window.partitionBy("lang").orderBy(F.desc(rrf), "doc_id")
    return (
        ranked.withColumn("rrf", rrf)
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 5)
        .select(
            "lang",
            "doc_id",
            F.col("r1").cast("long").alias("r1"),
            F.col("r2").cast("long").alias("r2"),
            "rrf",
        )
    )


@query(
    "q_annotator_kappa",
    oracle="""
    WITH ann AS (
      SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
             CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 80
                  THEN 1 ELSE 0 END AS b
      FROM documents),
    m AS (
      SELECT count(*) AS n,
             sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00,
             sum(a) AS a1, sum(b) AS b1
      FROM ann)
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS n11, CAST(n00 AS BIGINT) AS n00,
           CAST(a1 AS BIGINT) AS a_pos, CAST(b1 AS BIGINT) AS b_pos,
           CASE WHEN n * n - (a1 * b1 + (n - a1) * (n - b1)) = 0 THEN NULL
                ELSE CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))
                          AS DOUBLE)
                     / CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
           END AS kappa
    FROM m
    """,
)
def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic labelers (the
    inter-annotator agreement gate a labeling pipeline runs before
    trusting its rubric): annotator A = length >= 500 chars, annotator
    B = whitespace token count >= 80 — correlated but not identical, so
    agreement beats chance without saturating. One map-only pass
    derives both labels, one global reduce yields the 2x2 table, and
    kappa is computed in CLEARED-DENOMINATOR form — kappa =
    [n(n11+n00) - (a1*b1 + a0*b0)] / [n^2 - (a1*b1 + a0*b0)] — so both
    operands are exact int64 and the single division is the only float
    op (the po/pe formulation would divide twice and subtract,
    compounding rounding differently per engine). Chance-agreement-1
    degenerate case NULL-guarded."""
    ann = tbl(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 500, 1).otherwise(0).alias("a"),
        F.when(
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
            >= 80,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    m = ann.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)).alias(
            "n11"
        ),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)).alias(
            "n00"
        ),
        F.sum("a").alias("a1"),
        F.sum("b").alias("b1"),
    )
    n, n11, n00 = F.col("n"), F.col("n11"), F.col("n00")
    a1, b1 = F.col("a1"), F.col("b1")
    chance = a1 * b1 + (n - a1) * (n - b1)
    denom = n * n - chance
    return m.select(
        n.cast("long").alias("n_docs"),
        n11.cast("long").alias("n11"),
        n00.cast("long").alias("n00"),
        a1.cast("long").alias("a_pos"),
        b1.cast("long").alias("b_pos"),
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(
            (n * (n11 + n00) - chance).cast("double") / denom.cast("double")
        )
        .alias("kappa"),
    )


@query(
    "q_score_calibration",
    oracle=f"""
    WITH s AS ({_SCORED_CTE}),
    c AS (
      SELECT score, pos, neg,
             sum(pos + neg) OVER (ORDER BY score) AS cum,
             sum(pos + neg) OVER () AS total
      FROM s),
    b AS (
      SELECT least(9, (cum * 10) // total) AS bin,
             pos, neg, cum, total
      FROM c)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(sum(pos + neg) AS BIGINT) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(cum * (pos + neg)) AS DOUBLE)
             / (CAST(max(total) AS DOUBLE) * CAST(sum(pos + neg) AS DOUBLE))
             AS confidence,
           CAST(sum(pos) AS DOUBLE) / CAST(sum(pos + neg) AS DOUBLE)
             AS accuracy
    FROM b GROUP BY 1
    """,
)
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table for the length-score classifier (the per-bin
    decomposition of expected calibration error): treat each document's
    score percentile (fraction of corpus with score <= s) as its
    predicted probability, bin into 10 equal-width probability bins,
    and report predicted confidence vs observed positive rate per bin.
    Same histogram-first shape as the AUC: percentiles come from a
    cumulative window over distinct score values, bin assignment is
    exact integer arithmetic ((cum*10) // total, clamped), and each
    bin's confidence/accuracy is ONE double division over exact int64
    sums. The ECE itself is left as the per-bin table (the consumer
    weights |acc-conf| by n_docs/N) so no cross-bin double summation
    order can drift between engines."""
    s = _scored(spark, sf_dir)
    wc = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    c = s.select(
        "pos",
        "neg",
        F.sum(F.col("pos") + F.col("neg")).over(wc).alias("cum"),
        F.sum(F.col("pos") + F.col("neg")).over(wall).alias("total"),
    )
    b = c.select(
        F.least(F.lit(9), F.expr("(cum * 10) div total")).cast("long").alias("bin"),
        "pos",
        "neg",
        "cum",
        "total",
    )
    g = b.groupBy("bin").agg(
        F.sum(F.col("pos") + F.col("neg")).cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cum") * (F.col("pos") + F.col("neg"))).alias("conf_num"),
        F.max("total").alias("total"),
    )
    return g.select(
        "bin",
        "n_docs",
        "n_pos",
        (
            F.col("conf_num").cast("double")
            / (F.col("total").cast("double") * F.col("n_docs").cast("double"))
        ).alias("confidence"),
        (F.col("n_pos").cast("double") / F.col("n_docs").cast("double")).alias(
            "accuracy"
        ),
    )
