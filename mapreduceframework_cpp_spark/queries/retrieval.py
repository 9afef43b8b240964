"""Text-retrieval surfaces: BM25 relevance scoring and prefix-filtered
set-similarity join (the AllPairs/PPJoin family).

BM25 is the ranking function a corpus-curation team reaches for when
"find documents like this query" has to run over the whole corpus; the
prefix-filter join is the third near-dup scale path alongside
MinHash-LSH (`operators/dedup.py`) and SimHash — exact (no recall
loss, unlike LSH) yet sub-quadratic, because a pair can only reach
Jaccard ≥ t if the two rank-sorted token sets collide inside their
(1−t)-fraction prefixes (Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
both public literature).

Scale notes: BM25 keeps document frequencies and the average length as
broadcast one-row/`n_terms`-row aggregates (no driver round-trip); the
prefix join's vocabulary ranking sorts only the DISTINCT shingle
domain (vocab ≪ corpus tokens; frequency-ascending order puts RARE
shingles in prefixes, so bucket fan-out stays near 1); candidate
verification touches candidate pairs only, never the n² pair space.
The per-pair Jaccard divides two exact integers in double — identical
on both engines at any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: the fixed retrieval query (BM25 terms) — engine-benchmark style
_QTERMS = ("spark", "shuffle", "join")
_K1 = 1.2
_B = 0.75


@query(
    "q_text_bm25",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok IN ('spark', 'shuffle', 'join')
      GROUP BY 1, 2),
    dl AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS dl
           FROM documents),
    stats AS (SELECT count(*) AS n_docs,
                     sum(len(string_split(lower(text), ' ')))
                       * 1.0 / count(*) AS avgdl
              FROM documents),
    idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / avgdl)) AS s
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN idf ON idf.tok = tf.tok
      CROSS JOIN stats)
    SELECT doc_id, CAST(round(sum(round(s, 9)), 6) AS DOUBLE) AS bm25
    FROM scored
    GROUP BY 1
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 for a fixed 3-term query over the corpus. Term
    frequencies, document lengths, document frequencies and the corpus
    averages are all exact-integer aggregates; the per-(doc, term)
    score is one double expression evaluated from the SAME integers on
    both engines, quantized per term (1e-9) and per doc (1e-6) so a
    last-ulp `ln` difference between libm and the JVM can't flip the
    hash. df/avgdl ride a broadcast (3-row / 1-row) join — the shape
    that stays map-side at 100 TB; the only fact shuffle is the
    (doc, term) tf aggregate, pre-filtered to query terms AT THE SCAN
    (three-token IN-list on the exploded stream)."""
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    tf = (
        toks.filter(F.col("tok").isin(*_QTERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split(F.lower("text"), " "))) * F.lit(1.0)
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    idf = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    s = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
        )
        * F.col("tf")
        * (_K1 + 1)
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(s, 9).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(50)
    )


def prefix_filter_candidates(
    docs: DataFrame, t: float
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate generator for the prefix-filter join: returns
    ``(sh, cand)`` — the distinct (doc_id, shingle) frame (persisted)
    and the candidate pair frame. Factored out so the scale tests can
    assert the candidate-count bound on exactly the production path
    (tests/test_scale_ops.py — a vocabulary shift that blows up prefix
    collisions must fail a test, not the bench)."""
    from mapreduceframework_cpp_spark.operators.common import spread

    # the shingle explode is compute-bound on the byte-narrow doc scan
    # (r5/r6 width lesson) — spread first so the distinct's map side
    # runs full-parallel (r6 interleaved A/B at sf0.1, sentinel-stable:
    # 4.30 s narrow → 2.95/3.07 s spread, best-of-2 per sitting)
    toks = spread(docs).select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))"
            )
        ).alias("shingle"),
    ).distinct()
    from mapreduceframework_cpp_spark.operators.common import persist_tracked

    sh = persist_tracked(sh)
    # Candidate generation runs entirely on 8-byte xxhash64 shingle
    # keys, never the ~25-byte shingle strings (guide §2.3 "narrower
    # types"): the prefix-filter recall theorem holds for ANY total
    # vocabulary order shared by both docs, so ordering by
    # (df, hash) instead of (df, shingle) keeps 100% recall — rarity
    # stays the primary sort key, only the tie-break changes — while
    # every exchange below (df window, doc windows, self-join,
    # distinct) shuffles and sorts longs instead of strings. A 64-bit
    # collision can only ADD a candidate pair, which the exact
    # string-level Jaccard verification rejects — the same
    # candidates-are-cheap/verify-is-exact split as MinHash-LSH.
    # The per-shingle document frequency comes from a count window
    # over the hash exchange (one exchange) instead of the former
    # groupBy(shingle) aggregate + equi-join back (two).
    pre = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    sized = pre.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("df", "h")
    prefix = (
        sized.withColumn("rn", F.row_number().over(w_doc))
        .filter(
            F.col("rn")
            <= F.col("sz") - F.ceil(F.col("sz") * F.lit(t)) + 1
        )
        .select("doc_id", "h", "sz")
    )
    # AllPairs length filter: J(a,b) ≥ t forces t·|b| ≤ |a| (and
    # symmetrically), so size-mismatched prefix collisions prune before
    # the verification fan-out ever sees them.
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "h")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") >= F.ceil(F.col("b.sz") * F.lit(t)))
            & (F.col("b.sz") >= F.ceil(F.col("a.sz") * F.lit(t)))
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    return sh, cand


@query(
    "q_dedup_prefix_filter",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
           FROM toks, unnest(range(1, len(t)-1)) AS u(i) WHERE len(t) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     count(*) AS i
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_id_a, doc_id_b,
           CAST(i * 1.0 / (sa.sz + sb.sz - i) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_id_a
    JOIN sz sb ON sb.doc_id = doc_id_b
    WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.7
    """,
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard ≥ 0.7 on 3-gram
    shingles) via prefix filtering: order the vocabulary by
    ascending document frequency, keep only each document's first
    ⌊(1−t)·|d|⌋+1 rank-sorted shingles as its "prefix", and generate
    candidates ONLY from prefix collisions — two sets with Jaccard ≥ t
    must share a prefix element (pigeonhole on the (1−t) fraction), so
    recall is 100% while the join touches a sliver of the token index.
    Unlike MinHash-LSH (`q_dedup_near`) there is no probabilistic
    recall argument to tune — this is the exact-answer scale path.
    The oracle states the quadratic all-pairs truth. The vocabulary
    ranking sorts the distinct-shingle domain only; verification
    counts intersections for candidate pairs alone."""
    docs = tbl(spark, sf_dir, "documents")
    t = 0.7
    sh, cand = prefix_filter_candidates(docs, t)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        cand.join(a, "doc_id_a")
        .join(b, ["doc_id_b", "shingle"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sz.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("sza"))
    szb = sz.select(F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("szb"))
    jac = F.col("i") * F.lit(1.0) / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(sza, "doc_id_a")
        .join(szb, "doc_id_b")
        .filter(jac >= t)
        .select(
            "doc_id_a", "doc_id_b", jac.cast("double").alias("jaccard")
        )
    )


#: the phrase the demonstration query searches for (two top-frequency
#: adjacent corpus tokens — see _BPE_MERGES in corpus_ops).
_PHRASE = ("table", "hash")


@query(
    "q_text_phrase",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             string_split(lower(text), ' ') AS toks
      FROM documents),
    hits AS (
      SELECT doc_id, source,
             list_sum(list_transform(range(1, len(toks)),
               i -> CASE WHEN toks[i] = '{_PHRASE[0]}'
                          AND toks[i + 1] = '{_PHRASE[1]}'
                         THEN 1 ELSE 0 END)) AS n_hits
      FROM t)
    SELECT doc_id, source, CAST(n_hits AS BIGINT) AS n_occurrences
    FROM hits WHERE n_hits > 0
    """,
)
def q_text_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("{_PHRASE[0]} {_PHRASE[1]}") via a
    POSITIONAL postings index — the IR primitive BM25 (bag-of-words)
    cannot express: posexplode emits (token, doc, position) postings,
    the phrase resolves as a self-join of the two terms' postings on
    (doc, pos+1 = pos), and a per-doc count aggregates the match
    positions. At 100 TB the postings for the two query terms are
    filtered AT THE SCAN (predicate on token before the join), so the
    join touches two terms' postings, not the corpus — the inverted-
    index access path. The oracle counts adjacent-pair matches
    directly on the token arrays (an independent non-join
    formulation), including overlapping runs."""
    postings = (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token"),
        )
    )
    a = postings.filter(F.col("token") == _PHRASE[0]).select(
        "doc_id", "source", F.col("pos").alias("pa")
    )
    b = postings.filter(F.col("token") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b"))
            & (F.col("pb") == F.col("pa") + 1),
        )
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
