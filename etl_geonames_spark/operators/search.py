"""Text-retrieval operators over the documents corpus (SURVEY.md §2
extension set): inverted index construction and BM25 ranked search.

The reference emits documents for a downstream search stack to index
(NDJSON consumed by Elasticsearch in the original spacetime ETL,
geonames.js:151-163 writes the objects, indexing happens elsewhere).
A 100 TB engine builds the index artifacts itself: term → posting
lists and ranked retrieval as relational plans.

Scale notes:
  - The inverted index is two hash aggregates over the exploded token
    stream, both map-side combined; posting lists concentrate per-term,
    so the vocabulary hash-partitions the only wide shuffle. Stop-word
    scale skew (one term = half the corpus) is the hazard: cap or drop
    head terms at ingest, or delta-encode postings per bucket.
  - BM25 keeps the corpus statistics (N, avgdl) as a broadcast 1-row
    aggregate and the per-term document frequencies as a broadcast
    vocabulary-sized table — the fact-side token stream shuffles once
    to form (doc, term) frequencies and once to sum per-doc scores.
    Top-k is TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_geonames_spark.functions import qround, sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

# Fixed query-term set for the registered BM25 query (fixture vocab is
# engine-themed word salad; these three span common and less-common df).
_BM25_TERMS = ("join", "merge", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "llm_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
      ) t WHERE word <> ''
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM toks GROUP BY word
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: term → document frequency + sorted posting list.

    Explode → distinct (a doc posts once per term regardless of term
    frequency) → one hash aggregate collecting postings. ``collect_list``
    order is partition-dependent, so postings are ``sort_array``-ed —
    sorted postings are also what a real index wants (delta-encodable,
    mergeable with a linear pass). The posting list is emitted as a
    comma-joined string (canonical serialization): the differential
    driver hashes scalar columns only, and a delimited sorted list IS
    the on-disk index format (delta-encoding starts from exactly this).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    return toks.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


@query(
    "llm_bm25_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
    ),
    words_ne AS (SELECT * FROM words WHERE word <> ''),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM words_ne GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(CAST(dl AS DOUBLE)) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words_ne WHERE word IN {_BM25_TERMS!r}
      GROUP BY doc_id, word
    ),
    dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               (LN((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                * (tf.tf * ({_BM25_K1} + 1.0)))
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * (dl.dl / stats.avgdl)))
             ) AS s
      FROM tf, dfq, dl, stats
      WHERE tf.word = dfq.word AND tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    )
    SELECT doc_id, FLOOR(s * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM scored
    ORDER BY 2 DESC, doc_id
    LIMIT 10
    """,
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones, the Okapi form
    with k1=1.2, b=0.75): top-10 documents for a fixed 3-term query.

    Plan shape: the (doc, term) frequency table is filtered to query
    terms BEFORE grouping (the filter reaches the exploded stream, so
    the tf shuffle carries query-term rows only); document length and
    corpus stats come from one full-token aggregate; df-per-term and
    the 1-row (N, avgdl) both broadcast; final top-k is TakeOrdered.
    Ranking uses the qround-quantized score on BOTH engines so libm
    `ln` ulp differences cannot flip the cross-engine order.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        words.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (idf * (F.col("tf") * (k1 + F.lit(1.0)))) / (
        F.col("tf")
        + k1 * (F.lit(1.0) - b + b * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("s"))
        .select("doc_id", qround(F.col("s"), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(10)


_QL_MU = 100.0  # Dirichlet pseudo-count, fixture-calibrated (classic
# web-scale default is ~2000; the synthetic docs average ~50 tokens,
# so mu is scaled to keep smoothing in the informative regime)


@query(
    "llm_query_likelihood",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
    ),
    words_ne AS (SELECT * FROM words WHERE word <> ''),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM words_ne GROUP BY doc_id
    ),
    coll AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM words_ne),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words_ne WHERE word IN {_BM25_TERMS!r}
      GROUP BY doc_id, word
    ),
    cf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cf
      FROM words_ne WHERE word IN {_BM25_TERMS!r}
      GROUP BY word
    ),
    s1 AS (
      SELECT tf.doc_id,
             SUM(LN(1.0 + CAST(tf.tf * coll.ctot AS DOUBLE)
                          / ({_QL_MU} * cf.cf))) AS s1
      FROM tf JOIN cf USING (word), coll
      GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT s1.doc_id,
             s1.s1 + 3.0 * LN({_QL_MU} / (dl.dl + {_QL_MU})) AS s
      FROM s1 JOIN dl USING (doc_id)
    )
    SELECT doc_id, FLOOR(s * 1000000.0 + 0.5) / 1000000.0 AS ql
    FROM scored
    ORDER BY 2 DESC, doc_id
    LIMIT 10
    """,
)
def llm_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001) for the same fixed 3-term query as llm_bm25_topk — the
    language-modeling ranker that, with BM25, spans the two classic
    lexical retrieval families (tf-saturation vs LM smoothing); run
    both and llm_rrf_fusion has its second lexical leg.

    Scores use the efficient decomposition score(d) =
    Sigma_matching ln(1 + tf*|C| / (mu*cf_t)) + |q|*ln(mu/(dl+mu)),
    which needs ONLY matching (doc, term) rows plus per-doc length —
    the posting-intersection form a real engine executes; docs
    matching no query term are not candidates (standard retrieval
    semantics — the rank-only length term would otherwise "retrieve"
    the shortest documents). All ratio operands are exact int64
    counts cast to double identically on both engines; the ln sums
    are qround(6)-quantized BEFORE ranking with doc_id tie-break
    (the bm25 float-ordering discipline).

    Plan shape mirrors llm_bm25_topk: term filter reaches the
    exploded stream, (1-row ctot, 3-row cf) broadcast, one doc-keyed
    sum, TakeOrdered top-k — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    dl = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    coll = words.agg(F.count(F.lit(1)).cast("long").alias("ctot"))
    qws = words.filter(F.col("word").isin(*_BM25_TERMS))
    tf = qws.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    cf = qws.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cf")
    )
    term = F.log(
        F.lit(1.0)
        + (F.col("tf") * F.col("ctot")).cast("double")
        / (F.lit(_QL_MU) * F.col("cf"))
    )
    s1 = (
        tf.join(F.broadcast(cf), "word")
        .crossJoin(F.broadcast(coll))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("s1"))
    )
    s = F.col("s1") + F.lit(3.0) * F.log(
        F.lit(_QL_MU) / (F.col("dl") + F.lit(_QL_MU))
    )
    return (
        s1.join(dl, "doc_id")
        .select("doc_id", qround(s, 6).alias("ql"))
        .orderBy(F.col("ql").desc(), "doc_id")
        .limit(10)
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion constant
_RRF_SHORTLIST = 20
_RRF_TOPK = 10


@query(
    "llm_rrf_fusion",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      WHERE list_dot_product(
        CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
    ),
    j AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             list_dot_product(q.emb, c.emb) AS dotp,
             list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))) AS coss
      FROM (SELECT * FROM e WHERE vec_id < 3) q
      JOIN e c ON c.vec_id <> q.vec_id
    ),
    ra AS (
      SELECT q_id, c_id, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY coss DESC, c_id) AS rn_a FROM j
    ),
    rb AS (
      SELECT q_id, c_id, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY dotp DESC, c_id) AS rn_b FROM j
    ),
    f AS (
      SELECT COALESCE(a.q_id, b.q_id) AS q_id,
             COALESCE(a.c_id, b.c_id) AS c_id,
             COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + a.rn_a),
                      CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + b.rn_b),
                          CAST(0 AS DOUBLE)) AS rrf
      FROM (SELECT * FROM ra WHERE rn_a <= {_RRF_SHORTLIST}) a
      FULL JOIN (SELECT * FROM rb WHERE rn_b <= {_RRF_SHORTLIST}) b
        ON a.q_id = b.q_id AND a.c_id = b.c_id
    )
    SELECT q_id, c_id, {sql_qround('rrf', 6)} AS rrf
    FROM (
      SELECT q_id, c_id, rrf, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY rrf DESC, c_id) AS rn
      FROM f
    ) t WHERE rn <= {_RRF_TOPK}
    """,
)
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankers over the embedding corpus — cosine similarity and raw dot
    product genuinely disagree (norms vary), and RRF is the standard
    way hybrid search merges lexical + dense lists without score
    calibration: score = Σ 1/(60 + rank), missing-from-shortlist
    contributes 0.

    Both rankers rank per query (windows PARTITIONED by q_id — the
    allowed shape), keep a 20-deep shortlist each, and fuse via a
    full-outer join on (q_id, c_id) — |q|·20-row tables, metadata-
    sized regardless of corpus size once the shortlists exist. The
    fused score is a fixed-order sum of two exact divisions, so
    ordering is deterministic; qround(6) guards only the emitted
    value. At scale the brute-force ranking stage swaps for the
    llm_ann_ivf shortlist; the fusion plan is unchanged — that
    separation is the point of RRF.
    """
    from etl_geonames_spark.operators.llm import _as_double, cosine, _dot
    from pyspark.sql import Window

    # zero-norm vectors carry no direction: cosine would be an ANSI
    # divide-by-zero job-kill — both engines drop them up front
    # (pinned in tests/test_edge_inputs.py)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("emb"))
        .filter(_dot(F.col("emb"), F.col("emb")) > 0)
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"))
    j = (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            _dot(F.col("q_emb"), F.col("c_emb")).alias("dotp"),
            cosine(F.col("q_emb"), F.col("c_emb")).alias("coss"),
        )
    )
    wa = Window.partitionBy("q_id").orderBy(F.col("coss").desc(), "c_id")
    wb = Window.partitionBy("q_id").orderBy(F.col("dotp").desc(), "c_id")
    ra = (
        j.withColumn("rn_a", F.row_number().over(wa))
        .filter(F.col("rn_a") <= _RRF_SHORTLIST)
        .select("q_id", "c_id", "rn_a")
    )
    rb = (
        j.withColumn("rn_b", F.row_number().over(wb))
        .filter(F.col("rn_b") <= _RRF_SHORTLIST)
        .select("q_id", "c_id", "rn_b")
    )
    fused = (
        ra.join(rb, ["q_id", "c_id"], "full_outer")
        .select(
            "q_id",
            "c_id",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rn_a")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rn_b")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), "c_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _RRF_TOPK)
        .select("q_id", "c_id", qround(F.col("rrf"), 6).alias("rrf"))
    )
