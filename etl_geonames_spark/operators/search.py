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

from etl_geonames_spark.functions import qround
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
           list(doc_id ORDER BY doc_id) AS postings
    FROM toks GROUP BY word
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: term → document frequency + sorted posting list.

    Explode → distinct (a doc posts once per term regardless of term
    frequency) → one hash aggregate collecting postings. ``collect_list``
    order is partition-dependent, so postings are ``sort_array``-ed —
    sorted postings are also what a real index wants (delta-encodable,
    mergeable with a linear pass).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    return toks.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
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
