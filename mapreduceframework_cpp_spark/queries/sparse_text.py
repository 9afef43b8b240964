"""Sparse lexical statistics & similarity (SURVEY.md §2.2-N, round 3):
the token-level corpus models a training-data pipeline derives beyond
per-doc features — an n-gram language model (bigram conditional
probabilities) and sparse TF-IDF cosine similarity between documents
(the lexical complement to the embedding-cosine path in
operators/similarity.py).

Kernel lowering: both are R3 flat-map (token/bigram emission,
``MapReduceClient.h:57-59``) into R6 key shuffles over *token-sized*
keys — the corpus text itself never crosses the wire after the scan.

Float discipline (FIXTURES.md §3): probabilities are ratios of exact
integer counts; TF-IDF weights are quantized onto a 1e-4 grid as BIGINTs
before any cross-row sum, so dot products and norms are exact integers
and the final cosine is the same two double ops in both engines.
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

#: minimum bigram-head occurrences for a stable LM row
_MIN_HEAD = 50
#: document-frequency cap: terms appearing in more docs carry little
#: idf weight and quadratically inflate the inverted-index join
_MAX_DF = 50
#: weight quantization grid (1e-4) — see module doc
_SCALE = 10000


@query(
    "q_text_bigram_lm",
    oracle=f"""
    WITH toks AS (SELECT string_split(lower(text), ' ') AS l FROM documents),
    big AS (
      SELECT l[i] AS w1, l[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(l))) AS t(i)
      WHERE len(l) >= 2
    ),
    c AS (SELECT w1, w2, count(*) AS cnt FROM big GROUP BY 1, 2),
    h AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1),
    r AS (
      SELECT c.w1, c.w2, c.cnt, h.total,
             row_number() OVER (PARTITION BY c.w1
                                ORDER BY c.cnt DESC, c.w2) AS rn
      FROM c JOIN h USING (w1)
      WHERE h.total >= {_MIN_HEAD}
    )
    SELECT w1, w2, cnt, total, cnt / total AS prob
    FROM r WHERE rn <= 3
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model over the corpus: for every head token with
    >= _MIN_HEAD continuations, the top-3 next tokens with conditional
    probability P(w2|w1) = c(w1,w2) / Σc(w1,·). Bigram emission is one
    shuffle-free array transform per row; both aggregations shuffle
    token-pair keys only. prob is a ratio of exact counts (identical
    doubles cross-engine); ties break (cnt DESC, w2 ASC)."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("l")).filter(
        F.size("l") >= 2
    )
    big = toks.select(
        F.expr(
            "explode(transform(sequence(0, size(l) - 2), "
            "i -> struct(l[i] AS w1, l[i + 1] AS w2))) AS b"
        )
    ).select("b.w1", "b.w2")
    # the bigram-count aggregate feeds two plan branches (the head
    # totals and the join) — persist so the explode+count runs once
    c = persist_tracked(big.groupBy("w1", "w2").agg(F.count("*").alias("cnt")))
    h = c.groupBy("w1").agg(F.sum("cnt").alias("total"))
    w = Window.partitionBy("w1").orderBy(F.desc("cnt"), "w2")
    return (
        c.join(h, "w1")
        .filter(F.col("total") >= _MIN_HEAD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("w1", "w2", "cnt", "total", (F.col("cnt") / F.col("total")).alias("prob"))
    )


@query(
    "q_tfidf_cosine",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             CAST(floor(tf.cnt * ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
                        * {_SCALE} + 0.5) AS BIGINT) AS wq
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      WHERE dfreq.df <= {_MAX_DF}
    ),
    norms AS (SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2
              FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(sum(a.wq * b.wq) AS BIGINT) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos_sim
    FROM dots
    JOIN norms na ON na.doc_id = doc_id_a
    JOIN norms nb ON nb.doc_id = doc_id_b
    WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.5
    """,
)
def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs (lexical near-dup signal,
    complementing MinHash-Jaccard and embedding cosine): documents as
    rare-term TF-IDF vectors (df <= _MAX_DF — high-df terms carry
    ~zero idf weight and quadratically inflate the index join, so
    pruning them is both the quality and the scale move), paired via
    the inverted term index, cosine from exact integer dot/norms.

    Scale: the term join shuffles (term, doc, weight) triples, and the
    df cap bounds each term's posting list, so pair work is
    O(Σ df²) over RARE terms only — the standard index-pruned sparse
    similarity shape; the LSH path (q_dedup_near) remains the
    unbounded-corpus fallback."""
    docs = tbl(spark, sf_dir, "documents")
    # tf feeds the df aggregate AND the weight join; the weight frame
    # feeds norms and BOTH sides of the term self-join — persist each
    # diamond or the whole token pipeline re-executes per branch (at
    # 100 TB these become checkpointed index tables)
    tf = persist_tracked(
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w = persist_tracked(
        tf.join(dfreq, "term")
        .filter(F.col("df") <= _MAX_DF)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.floor(
                F.col("cnt")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                * _SCALE
                + 0.5
            )
            .cast("long")
            .alias("wq"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    a = w.select(F.col("doc_id").alias("doc_id_a"), "term", F.col("wq").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_id_b"), "term", F.col("wq").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_id_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_id_b"), F.col("n2").alias("n2b"))
    cos = F.col("dot") / (F.sqrt("n2a") * F.sqrt("n2b"))
    return (
        dots.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .filter(cos >= 0.5)
        .select("doc_id_a", "doc_id_b", F.round(cos, 6).alias("cos_sim"))
    )


@query(
    "q_text_ngram_topk",
    oracle="""
    WITH toks AS (SELECT lang, string_split(lower(text), ' ') AS t
                  FROM documents),
    tri AS (
      SELECT lang,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS trigram
      FROM toks WHERE len(t) >= 3
    ),
    cnt AS (SELECT lang, trigram, CAST(count(*) AS BIGINT) AS n
            FROM tri GROUP BY 1, 2),
    rk AS (SELECT lang, trigram, n,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY n DESC, trigram ASC) AS rn
           FROM cnt)
    SELECT lang, trigram, n, rn FROM rk WHERE rn <= 5
    """,
)
def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word trigrams per language — the frequent-phrase mining
    report (boilerplate discovery, contamination screening candidates).
    Trigram emission is an executor-side array transform (R3 flat-map
    over token positions, no Python); counting collapses to (lang,
    trigram) keys before the wire, and the top-k window runs over the
    already-aggregated counts — raw text never sorts. Deterministic
    tie-break on the trigram string keeps rank stable across engines
    and partitionings."""
    toks = tbl(spark, sf_dir, "documents").select(
        "lang", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"
                )
            ).alias("trigram"),
        )
    )
    cnt = tri.groupBy("lang", "trigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        cnt.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("lang", "trigram", "n", "rn")
    )


@query(
    "q_text_zipf",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    c AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
    r AS (SELECT tok, n,
                 row_number() OVER (ORDER BY n DESC, tok) AS rank,
                 sum(n) OVER () AS total
          FROM c)
    SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / total AS freq,
           CAST(rank * n AS BIGINT) AS rank_x_n
    FROM r WHERE rank <= 50
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile of the corpus: the 50 most frequent tokens with
    rank, absolute and relative frequency, and the rank×count product
    (constant under an ideal Zipf law — drift across ingests flags a
    distribution shift). Token emission is an executor-side explode;
    counting collapses to token keys before the wire; the ranking
    window runs over the tiny vocabulary aggregate. Deterministic
    tie-break on the token string."""
    docs = tbl(spark, sf_dir, "documents")
    c = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    wt = Window.partitionBy()
    return (
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rank") <= 50)
        .select(
            "rank",
            "tok",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("freq"),
            (F.col("rank") * F.col("n")).alias("rank_x_n"),
        )
    )


@query(
    "q_text_hapax",
    oracle="""
    WITH tok AS (SELECT source,
                        unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    tc AS (SELECT source, tok, count(*) AS n FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS hapax_ratio
    FROM tc GROUP BY 1
    """,
)
def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena audit: vocabulary size, number of
    once-occurring tokens, and their ratio — a fast lexical-diversity
    signal (templated/boilerplate sources collapse toward 0, organic
    text sits high). Two exact-integer aggregations; the hapax ratio is
    one double division."""
    docs = tbl(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("n"))
    )
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return tc.groupBy("source").agg(
        F.count("*").alias("vocab"),
        hapax.alias("hapax"),
        (hapax.cast("double") / F.count("*")).alias("hapax_ratio"),
    )


@query(
    "q_doc_entropy",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    d AS (SELECT doc_id, sum(c) AS n,
                 sum(CAST(round(c * log2(c) * 1000000000) AS BIGINT)) AS slq
          FROM tc GROUP BY 1)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(log2(CAST(n AS DOUBLE))
                - (CAST(slq AS DOUBLE) / 1000000000) / n AS DOUBLE)
             AS token_entropy
    FROM d
    """,
)
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits):
    H = log2(n) − Σ c·log2(c) / n over token counts c — the
    repetition/quality signal that separates natural text from
    copy-paste loops. Float discipline: each c·log2(c) term is computed
    identically in both engines then quantized onto a 1e-9 grid as a
    BIGINT before the cross-row sum (exact, order-independent); the
    final entropy is two double ops on exact integers.

    The token explode + per-(doc, token) count is compute-bound on a
    byte-narrow scan, so the input is spread to full width first (r5
    width lesson; 0.70 s → 0.45 s at sf0.1). The sibling lexical stats
    (zipf/hapax/JS/log-odds) measured FASTER narrow — their per-row
    work is too light to pay for the extra exchange — so only this one
    spreads."""
    docs = spread(tbl(spark, sf_dir, "documents"))
    tc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    term_q = F.round(
        F.col("c") * F.log2("c") * F.lit(1000000000.0)
    ).cast("long")
    d = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.sum(term_q).alias("slq")
    )
    return d.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        (
            F.log2(F.col("n").cast("double"))
            - (F.col("slq").cast("double") / F.lit(1000000000.0)) / F.col("n")
        )
        .cast("double")
        .alias("token_entropy"),
    )


@query(
    "q_text_js_divergence",
    oracle="""
    WITH tok AS (SELECT source,
                        unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents
                 WHERE source IN ('src0', 'src1')),
    c AS (SELECT source, tok, count(*) AS n FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, sum(n) AS tn FROM c GROUP BY 1),
    f AS (SELECT c.tok,
                 CAST(sum(CASE WHEN c.source = 'src0' THEN c.n END)
                      AS DOUBLE)
                 / (SELECT CAST(tn AS DOUBLE) FROM tot
                    WHERE source = 'src0') AS p,
                 CAST(sum(CASE WHEN c.source = 'src1' THEN c.n END)
                      AS DOUBLE)
                 / (SELECT CAST(tn AS DOUBLE) FROM tot
                    WHERE source = 'src1') AS q
          FROM c GROUP BY 1),
    terms AS (
      SELECT CAST(round(
               (CASE WHEN p > 0
                     THEN 0.5 * p * log2(p / (0.5 * (coalesce(p, 0)
                                                     + coalesce(q, 0))))
                     ELSE 0 END
                + CASE WHEN q > 0
                       THEN 0.5 * q * log2(q / (0.5 * (coalesce(p, 0)
                                                       + coalesce(q, 0))))
                       ELSE 0 END) * 1000000000) AS BIGINT) AS tq
      FROM f)
    SELECT CAST(sum(tq) AS DOUBLE) / 1000000000 AS js_divergence,
           CAST(count(*) AS BIGINT) AS vocab_union
    FROM terms
    """,
)
def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two sources' token
    distributions — the corpus-drift metric (0 = identical mix, 1 bit =
    disjoint) that ingest monitoring alarms on. Per-token probabilities
    are exact-integer count ratios; each JSD term evaluates the SAME
    double expression tree in both engines and quantizes onto a 1e-9
    grid before the cross-token sum (order-independent, the
    q_doc_entropy discipline). One token-key shuffle; the two 1-row
    totals broadcast."""
    docs = tbl(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    c = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("n"))
    )
    # ONE 1-row totals aggregate (conditional sums) instead of two
    # filtered frames: an empty source yields a NULL total, and the
    # division then yields NULL p/q exactly like the oracle's scalar
    # subqueries — a filtered-frame cross join would collapse the whole
    # query to zero rows on that degenerate input.
    tot = c.agg(
        F.sum(F.when(F.col("source") == "src0", F.col("n")))
        .cast("double")
        .alias("tn0"),
        F.sum(F.when(F.col("source") == "src1", F.col("n")))
        .cast("double")
        .alias("tn1"),
    )
    f = (
        c.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("source") == "src0", F.col("n"))).alias("n0"),
            F.sum(F.when(F.col("source") == "src1", F.col("n"))).alias("n1"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            (F.col("n0").cast("double") / F.col("tn0")).alias("p"),
            (F.col("n1").cast("double") / F.col("tn1")).alias("q"),
        )
    )
    m = 0.5 * (F.coalesce(F.col("p"), F.lit(0.0)) + F.coalesce(F.col("q"), F.lit(0.0)))
    term = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log2(F.col("p") / m)).otherwise(0.0)
        + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log2(F.col("q") / m)).otherwise(0.0)
    )
    tq = F.round(term * 1000000000).cast("long")
    return f.select(tq.alias("tq")).agg(
        (F.sum("tq").cast("double") / 1000000000).alias("js_divergence"),
        F.count("*").alias("vocab_union"),
    )


@query(
    "q_text_logodds",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cs
          FROM tok GROUP BY 1, 2),
    m AS (SELECT source, token, cs,
                 sum(cs) OVER (PARTITION BY source) AS ns,
                 sum(cs) OVER (PARTITION BY token) AS ct,
                 sum(cs) OVER () AS n
          FROM c),
    lo AS (
      SELECT source, token, cs,
             ln(((cs + 1.0) / (ns - cs + 1.0))
                / ((ct - cs + 1.0) / ((n - ns) - (ct - cs) + 1.0)))
               AS log_odds
      FROM m),
    rk AS (SELECT source, token, cs, log_odds,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY log_odds DESC, token)
                    AS rn
           FROM lo)
    SELECT source, token, cs AS n_in_source, log_odds,
           CAST(rn AS BIGINT) AS rank
    FROM rk WHERE rn <= 5
    """,
)
def q_text_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinguishing vocabulary by add-one-smoothed
    log-odds ratio (source vs rest of corpus) — the lexical-divergence
    report a corpus QA run uses to see WHAT a source over-represents
    (where q_text_js_divergence only says HOW MUCH it drifts). One
    token explode feeds a (source, token) exact-int aggregate; source
    totals, token totals and the grand total all come from windows
    OVER THE VOCABULARY-SIZED cell frame (the corpus is never
    rescanned); the single ln() per cell runs on identical int-derived
    doubles, so ranks are engine-identical with a token tie-break.
    Top-5 per source via row_number."""
    tok = (
        tbl(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
    )
    c = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cs"))
    w_s = Window.partitionBy("source")
    w_t = Window.partitionBy("token")
    w_all = Window.partitionBy()
    m = c.select(
        "source",
        "token",
        "cs",
        F.sum("cs").over(w_s).alias("ns"),
        F.sum("cs").over(w_t).alias("ct"),
        F.sum("cs").over(w_all).alias("n"),
    )
    rate_in = (F.col("cs") + 1.0) / (F.col("ns") - F.col("cs") + 1.0)
    rate_rest = (F.col("ct") - F.col("cs") + 1.0) / (
        (F.col("n") - F.col("ns")) - (F.col("ct") - F.col("cs")) + 1.0
    )
    lo = m.select(
        "source",
        "token",
        "cs",
        F.log(rate_in / rate_rest).alias("log_odds"),
    )
    rk = Window.partitionBy("source").orderBy(
        F.desc("log_odds"), F.asc("token")
    )
    return (
        lo.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "source",
            "token",
            F.col("cs").alias("n_in_source"),
            "log_odds",
            "rank",
        )
    )


@query(
    "q_text_perplexity",
    oracle="""
    WITH toks AS (SELECT doc_id, lang,
                         string_split(lower(text), ' ') AS l
                  FROM documents),
    big AS (
      SELECT doc_id, lang, l[i] AS w1, l[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(l))) AS t(i)
      WHERE len(l) >= 2),
    db AS (SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS k
           FROM big GROUP BY 1, 2, 3, 4),
    lm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM big GROUP BY 1, 2),
    uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM lm),
    scored AS (
      SELECT db.doc_id, db.lang, db.k,
             CAST(round(ln((lm.c12 + 1.0) / (uni.c1 + v.vocab)) * 1000000000)
                  AS BIGINT) AS logp_nano
      FROM db JOIN lm USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v)
    SELECT doc_id, lang,
           CAST(sum(k) AS BIGINT) AS n_bigrams,
           CAST(sum(k * logp_nano) AS DOUBLE)
             / (1000000000.0 * sum(k)) AS avg_logp,
           exp(-(CAST(sum(k * logp_nano) AS DOUBLE)
                 / (1000000000.0 * sum(k)))) AS perplexity
    FROM scored GROUP BY 1, 2
    """,
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: every document's perplexity under
    the corpus's own add-one-smoothed bigram LM — the statistical
    filter real pipelines run where handwritten heuristics
    (q_text_quality) stop (gibberish and boilerplate both surface as
    perplexity outliers). Determinism: each bigram's log-probability
    quantizes to an int64 nano-grid BEFORE the per-doc sum, so the
    ordered-float-sum trap is avoided — totals are exact integers on
    any partitioning and the final divide/exp runs on identical
    operands. Shape: one corpus bigram explode feeds both the LM
    counts (vocabulary²-sized — the model, broadcastable by design)
    and per-doc bigram counts; the score join touches (doc, bigram)
    pairs, partial-aggregated before the shuffle."""
    from mapreduceframework_cpp_spark.operators.common import (
        persist_tracked,
        spread,
    )

    # the bigram explode is compute-bound on a byte-narrow scan, and
    # the persisted frame inherits its width — spread first so both
    # consumers (per-doc counts, LM counts) read a full-width cache
    # (r6 interleaved A/B at sf0.1 on a sentinel-checked quiet box,
    # best-of-2 per sitting: 1.75/1.62 s narrow → 1.58/1.33 s spread)
    docs = spread(tbl(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("l")
    ).filter(F.size("l") >= 2)
    big = persist_tracked(
        toks.select(
            "doc_id",
            "lang",
            F.expr(
                "explode(transform(sequence(0, size(l) - 2), "
                "i -> struct(l[i] AS w1, l[i + 1] AS w2))) AS b"
            ),
        ).select("doc_id", "lang", "b.w1", "b.w2")
    )
    db = big.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k")
    )
    lm = persist_tracked(
        big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = lm.agg(F.countDistinct("w2").alias("vocab"))
    logp_nano = (
        F.round(
            F.log(
                (F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab"))
            )
            * 1000000000
        ).cast("long")
    )
    scored = (
        db.join(F.broadcast(lm), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", "lang", "k", logp_nano.alias("logp_nano"))
    )
    avg = F.sum(F.col("k") * F.col("logp_nano")).cast("double") / (
        F.lit(1000000000.0) * F.sum("k")
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.sum("k").alias("n_bigrams"),
        avg.alias("avg_logp"),
        F.exp(-avg).alias("perplexity"),
    )


@query(
    "q_text_rake",
    oracle="""
    WITH pad AS (
      SELECT doc_id, '  ' || replace(text, ' ', '  ') || '  ' AS t
      FROM documents),
    seg AS (
      SELECT doc_id,
             regexp_replace(t, ' (the|a) ', ' ~ ', 'g') AS t
      FROM pad),
    phr AS (
      SELECT doc_id,
             trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
      FROM seg, unnest(string_split(t, '~')) AS u(p)),
    phr_ok AS (
      SELECT doc_id, phrase, string_split(phrase, ' ') AS ws
      FROM phr WHERE phrase <> ''),
    wocc AS (
      SELECT doc_id, phrase, len(ws) AS plen, unnest(ws) AS w
      FROM phr_ok),
    wstat AS (
      SELECT doc_id, w,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
      FROM wocc GROUP BY 1, 2),
    scored AS (
      SELECT o.doc_id, o.phrase,
             sum((s.deg * 1000000) // s.freq) AS score_q
      FROM wocc o JOIN wstat s ON s.doc_id = o.doc_id AND s.w = o.w
      GROUP BY 1, 2),
    dedup AS (
      SELECT doc_id, phrase, max(score_q) AS score_q
      FROM scored GROUP BY 1, 2),
    rk AS (
      SELECT doc_id, phrase, score_q,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_q DESC, phrase) AS rn
      FROM dedup)
    SELECT doc_id, phrase, CAST(score_q AS BIGINT) AS score_q
    FROM rk WHERE rn = 1
    """,
)
def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction):
    candidate phrases are maximal token runs between stopword
    boundaries ('the'/'a' here), each word scores deg/freq within its
    document (degree = summed length of phrases it appears in), and a
    phrase's score is the sum of its words' scores — top phrase per
    document. The float trap in RAKE is the word-score SUM (doubles,
    order-dependent); scores are therefore integer-quantized FIRST
    ((deg·1e6) div freq — exact) so every sum is int64 and the ranking
    is bit-deterministic. Stopword segmentation survives consecutive
    stopwords by space-doubling before the boundary regex (a
    single-pass regexp_replace cannot re-match inside its own
    replacement). Shapes: all segmentation is map-side string work —
    heavy regex per row, so the byte-narrow scan is spread to full
    width first (r5 width lesson; 2.4 s → 0.7 s at sf0.1) — then two
    (doc, word) partial-agg shuffles and one per-doc top-1 window
    over phrases."""
    docs = spread(tbl(spark, sf_dir, "documents"))
    pad = F.concat(
        F.lit("  "), F.replace(F.col("text"), F.lit(" "), F.lit("  ")), F.lit("  ")
    )
    seg = F.regexp_replace(pad, F.lit(" (the|a) "), F.lit(" ~ "))
    phr = docs.select(
        "doc_id", F.explode(F.split(seg, "~")).alias("p")
    ).select(
        "doc_id",
        F.trim(F.regexp_replace(F.col("p"), F.lit(" +"), F.lit(" "))).alias(
            "phrase"
        ),
    ).filter(F.col("phrase") != "")
    wocc = phr.select(
        "doc_id",
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    wstat = wocc.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    scored = (
        wocc.join(wstat, ["doc_id", "w"])
        .groupBy("doc_id", "phrase")
        .agg(F.sum(F.expr("(deg * 1000000) div freq")).alias("score_q"))
    )
    dedup = scored.groupBy("doc_id", "phrase").agg(
        F.max("score_q").alias("score_q")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), "phrase")
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "phrase", F.col("score_q").cast("long").alias("score_q"))
    )
