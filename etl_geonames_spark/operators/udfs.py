"""The UDF surface (SURVEY.md §2.11): Arrow-vectorized Pandas UDFs.

The reference's per-row JS functions all decompose into built-ins, so
the geonames pipeline ships zero UDFs. This module declares the
engine's extension surface for when built-ins genuinely run out:
scalar pandas UDF, grouped-map (applyInPandas), grouped-agg pandas
UDF, and the 1→N (UDTF) shape via explode.

Every UDF here is Arrow-batched (~10-100× the throughput of
row-at-a-time Python UDFs); none is used on the reference-parity hot
path. The computations are deterministic so the DuckDB oracle can
mirror them in SQL — proving the UDF results, not just their shapes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from etl_geonames_spark.functions import qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table


@pandas_udf(DoubleType())
def _quality_udf(n_chars: pd.Series) -> pd.Series:
    """Vectorized scalar: a toy doc-quality score (sigmoid; numpy)."""
    import numpy as np

    x = n_chars.astype("float64")
    return 1.0 / (1.0 + np.exp(-x / 1000.0)) + 0.1 * np.sqrt(x)


@query(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           FLOOR((1.0 / (1.0 + exp(-(n_chars / 1000.0))) + 0.1 * sqrt(n_chars))
                 * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (series → series, Arrow transfer)."""
    from etl_geonames_spark.functions import qround

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", qround(_quality_udf(F.col("n_chars")), 6).alias("score")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: z-score n_chars within each language (ddof=0 to
    match SQL STDDEV_POP)."""
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=0)
    z = (pdf["n_chars"] - mu) / sd if sd > 0 else pdf["n_chars"] * 0.0
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z}
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           FLOOR((CASE WHEN sd > 0 THEN (n_chars - mu) / sd ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
             AS z_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             AVG(n_chars) OVER (PARTITION BY lang) AS mu,
             STDDEV_POP(n_chars) OVER (PARTITION BY lang) AS sd
      FROM documents
    ) t
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-group arbitrary pandas transform (here a
    per-language z-score; the oracle proves it equals the windowed-SQL
    formulation). Scale: one shuffle on the group key; each group must
    fit a worker's memory — for huge groups prefer window functions."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.groupBy("lang").applyInPandas(
        _zscore_group, schema="doc_id long, lang string, z_chars double"
    )
    return out.select("doc_id", "lang", qround(F.col("z_chars"), 4).alias("z_chars"))


@pandas_udf(DoubleType())
def _weighted_avg_udf(price: pd.Series, qty: pd.Series) -> float:
    return float((price * qty).sum() / qty.sum())


@query(
    "udf_agg",
    oracle="""
    SELECT l_returnflag,
           FLOOR((SUM(l_extendedprice * l_quantity) / SUM(l_quantity)) * 10000.0 + 0.5) / 10000.0
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (series → scalar per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qround(
            _weighted_avg_udf(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("weighted_avg_price")
    )


def _make_bigram_udtf():
    """Python UDTF (Spark 3.5+/4): genuine 1→N table function in
    Python. Built lazily — decorating at import would bind a worker
    requirement every module load."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):  # noqa: D401
            words = [w for w in (text or "").split(" ") if w]
            for i in range(len(words) - 1):
                yield i, f"{words[i]} {words[i + 1]}"

    return Bigrams


@query(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           CAST(unnest(generate_series(0, len(words) - 2)) AS INT) AS pos,
           unnest(list_transform(
             generate_series(1, len(words) - 1),
             i -> words[i] || ' ' || words[i + 1]
           )) AS bigram
    FROM (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> w <> '') AS words
      FROM documents WHERE doc_id < 50
    ) t
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF via LATERAL join — the escape hatch when a 1→N
    op can't decompose to explode. Slow path by design (Python worker
    round-trip per batch); the oracle proves the results, and
    udtf_explode shows the JVM-side form to prefer."""
    Bigrams = _make_bigram_udtf()
    spark.udtf.register("bigrams_udtf", Bigrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM docs_for_udtf d, LATERAL bigrams_udtf(d.text) b
        """
    )


@query(
    "udtf_explode",
    oracle="""
    SELECT doc_id, word FROM (
      SELECT doc_id, unnest(str_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 100
    ) t WHERE word <> ''
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N row generation (UDTF shape) via explode over an
    array-returning expression — the set-returning idiom that stays
    JVM-side (a Python UDTF would be the slow path)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )


def _l2_normalize_batches(batches):
    """Arrow-native batch transform: L2-normalize embeddings without a
    pandas round-trip. Math in float64, per-element floor-form 6-dp
    round mirroring the SQL oracle."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        vec_id = batch.column("vec_id")
        emb = batch.column("embedding")
        # straight off the Arrow buffers: flatten the list values and
        # reshape (fixture embeddings are fixed-dim, no nulls)
        vals = emb.flatten().to_numpy(zero_copy_only=False).astype("float64")
        n = len(batch)
        if n == 0:
            continue
        if len(vals) % n:
            raise ValueError("embeddings must be fixed-dimension, non-null")
        arr = vals.reshape(n, len(vals) // n)
        norms = np.sqrt((arr * arr).sum(axis=1, keepdims=True))
        out = np.floor(arr / norms * 1e6 + 0.5) / 1e6
        dim = arr.shape[1]
        unit = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim, dtype="int32")),
            pa.array(out.ravel(), type=pa.float64()),
        )
        yield pa.RecordBatch.from_arrays([vec_id, unit], ["vec_id", "unit_embedding"])


@query(
    "udf_map_in_arrow",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM s
    )
    SELECT vec_id,
           array_to_string(
             list_transform(e, x -> CAST(FLOOR(x / nrm * 1000000.0 + 0.5)
                                         AS BIGINT)),
             ',') AS unit_embedding
    FROM n
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python batch path — RecordBatch
    in, RecordBatch out, no pandas conversion on either side. Used
    here to L2-normalize the embedding column (numpy on the Arrow
    buffers); the DuckDB oracle replays the math with list lambdas.

    When Python is genuinely needed over array/tensor columns, this
    beats mapInPandas (which materializes a pandas object column per
    list) and is the template the multimodal decode stubs graduate to.
    Map-only: zero shuffles, pipelined with the scan.

    Output serialization: the normalized vector is emitted as the
    comma-joined list of its 1e-6-grid integers (``round(u·1e6)`` of
    the already-gridded doubles re-derives the exact integer the UDF
    floored to — the stored double is within 1 ulp of k/1e6, so the
    round-trip cannot flip). Scalar string output is what the
    differential driver can hash; the oracle derives the same integers
    directly from ``floor(x/nrm·1e6 + 0.5)``."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    unit = emb.mapInArrow(
        _l2_normalize_batches, "vec_id LONG, unit_embedding ARRAY<DOUBLE>"
    )
    return unit.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("unit_embedding"),
                lambda x: F.round(x * F.lit(1e6)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("unit_embedding"),
    )


@query(
    "udf_scalar_iter",
    oracle="""
    SELECT doc_id,
           FLOOR((1.0 / (1.0 + exp(-(n_chars / 1000.0))) + 0.1 * sqrt(n_chars))
                 * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM documents
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (``Iterator[Series] →
    Iterator[Series]``): same math as `udf_scalar`, but the function
    body runs ONCE per partition around the batch loop — the pattern
    for amortizing expensive per-worker setup (loading a model,
    opening a tokenizer) across every Arrow batch instead of paying
    it per batch. The setup here is a trivial constant to keep the
    oracle exact; a real model slots into the same two lines."""
    @pandas_udf("double")
    def scored(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        scale = 1000.0  # stands in for per-worker init (model load)
        for n_chars in batches:
            x = n_chars.astype("float64")
            yield 1.0 / (1.0 + np.exp(-x / scale)) + 0.1 * np.sqrt(x)

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", qround(scored(F.col("n_chars")), 6).alias("score")
    )


@pandas_udf(DoubleType())
def _zlib_ratio_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched zlib compression ratio (compressed/raw bytes).

    zlib (DEFLATE, level 6) has no JVM-expression equivalent in Spark
    SQL — this is the genuine Pandas-UDF case, and zlib's output is
    bit-deterministic for a given (input, level), so tests pin exact
    values computed by the very same library.
    """
    import zlib

    def ratio(s: str) -> float:
        raw = s.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, 6)) / len(raw)

    return text.map(ratio).astype("float64")


@query("llm_compression_ratio", oracle=None)
def llm_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio + per-source aggregate —
    the Gopher/FineWeb-style quality signal llm_repetition_ratio
    approximates with n-grams, computed exactly: highly repetitive or
    templated text compresses far below ~0.4, near-random text sits
    near 1.0. Filtering on this is standard in web-corpus curation
    (Rae et al. 2021 use the same signal family).

    No DuckDB oracle: SQL has no DEFLATE. Verification is stronger
    than rows-only anyway — tests/test_oracle_parity-adjacent pins in
    tests/test_edge_inputs.py recompute ratios with the identical
    stdlib zlib and assert exact equality, and the per-source means
    below are deterministic for the fixture.

    100 TB shape: map-only Arrow-batched UDF over the scan (the
    sanctioned slow path — §2.11), then one tiny hash aggregate to
    |sources| rows; compression cost is linear in bytes and
    embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", _zlib_ratio_udf(F.col("text")).alias("ratio")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        qround(F.avg("ratio"), 6).alias("avg_ratio"),
        qround(F.min("ratio"), 6).alias("min_ratio"),
        qround(F.max("ratio"), 6).alias("max_ratio"),
    )


def _make_stats_udtf():
    """Polymorphic UDTF: output schema computed by ``analyze()`` at
    PLAN time from the call's literal argument (Spark 4's
    dynamic-schema UDTF API) — one UDTF serves any requested stat
    list, the schema contract staying fully typed."""
    from pyspark.sql.functions import AnalyzeResult, udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructType,
    )

    class DocStats:
        @staticmethod
        def analyze(text_arg, stats_arg) -> "AnalyzeResult":
            wanted = [s.strip() for s in stats_arg.value.split(",")]
            schema = StructType().add("doc_id", LongType())
            for name in wanted:
                schema = schema.add(
                    name,
                    LongType() if name in ("n_tokens", "n_chars")
                    else DoubleType(),
                )
            return AnalyzeResult(schema=schema)

        def __init__(self):
            self._wanted = None

        def eval(self, row, stats):
            wanted = [s.strip() for s in stats.split(",")]
            toks = [w for w in row["text"].split(" ") if w]
            vals = {
                "n_tokens": len(toks),
                "n_chars": len(row["text"]),
                "avg_token_len": (
                    sum(len(w) for w in toks) / len(toks) if toks else 0.0
                ),
            }
            yield tuple([row["doc_id"]] + [vals[w] for w in wanted])

    return udtf(DocStats)


@query(
    "udtf_analyze",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(str_split(text, ' '), w -> w <> ''))
                AS BIGINT) AS n_tokens,
           FLOOR(
             CASE WHEN len(list_filter(str_split(text, ' '),
                                       w -> w <> '')) = 0 THEN 0.0
                  ELSE CAST(len(replace(text, ' ', '')) AS DOUBLE)
                       / len(list_filter(str_split(text, ' '),
                                         w -> w <> ''))
             END * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len
    FROM documents WHERE doc_id < 40
    """,
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with ``analyze()`` (Spark 4 polymorphic UDTF): the output
    schema is derived at plan time from the literal stats list in the
    SQL call — ask for ('n_tokens', 'avg_token_len') and exactly
    those typed columns exist; no VARIANT blob, no re-parse
    downstream. This is §2.11's last surface: scalar, grouped-map,
    grouped-agg, iterator, Arrow-map, fixed-schema UDTF, and now
    schema-from-arguments.

    avg_token_len is recomputed relationally by the oracle (total
    non-space chars / token count — the same quantity the Python side
    sums per token), qround'd in the engine and floor-rounded in SQL
    to the shared 1e-6 grid."""
    DocStats = _make_stats_udtf()
    spark.udtf.register("doc_stats_udtf", DocStats)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    ).createOrReplaceTempView("docs_for_analyze_udtf")
    raw = spark.sql(
        """
        SELECT s.doc_id, s.n_tokens, s.avg_token_len
        FROM docs_for_analyze_udtf d,
             LATERAL doc_stats_udtf(
                 struct(d.doc_id, d.text), 'n_tokens, avg_token_len'
             ) s
        """
    )
    return raw.select(
        "doc_id",
        "n_tokens",
        qround(F.col("avg_token_len"), 6).alias("avg_token_len"),
    )


def _make_source_rollup_udtf():
    from pyspark.sql.functions import udtf

    class SourceRollup:
        """Stateful per-partition rollup: consumes one PARTITION BY
        group in ORDER BY order, emits one summary row at terminate.
        The first-row capture is the observable proof that Spark
        honored the declared partition ordering."""

        def __init__(self) -> None:
            self._src = None
            self._n = 0
            self._first = None
            self._mx = None

        def eval(self, row) -> None:
            self._src = row["source"]
            self._n += 1
            if self._first is None:
                self._first = row["n_chars"]
            self._mx = (
                row["n_chars"]
                if self._mx is None
                else max(self._mx, row["n_chars"])
            )

        def terminate(self):
            if self._src is not None:
                yield self._src, self._n, self._first, self._mx

    return udtf(
        SourceRollup,
        returnType=(
            "source string, n_docs bigint, first_chars bigint,"
            " max_chars bigint"
        ),
    )


@query(
    "udtf_table_arg",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS first_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a TABLE argument + PARTITION BY / ORDER BY (the last
    §2.11 surface after udtf_analyze's schema-from-arguments): Spark
    feeds the UDTF whole relation PARTITIONS — a fresh instance per
    source, rows arriving in (n_chars, doc_id) order, one summary row
    per terminate(). This is the custom-stateful-operator escape
    hatch for logic aggregates can't express (sequence-aware session
    rollups, ordered dedup, CRDT merges); here the state is kept
    deliberately checkable: first-seen value under the declared
    ordering MUST equal MIN(n_chars), which is exactly what the
    relational oracle asserts — if Spark ever ignored the ORDER BY,
    the differential fails.

    Scale shape: the table argument hash-partitions on the PARTITION
    BY key (one exchange, the same shuffle a groupBy would pay) and
    sorts within partitions; Python sees Arrow batches per group.
    """
    SourceRollup = _make_source_rollup_udtf()
    spark.udtf.register("source_rollup_udtf", SourceRollup)
    load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    ).createOrReplaceTempView("docs_for_table_arg_udtf")
    return spark.sql(
        """
        SELECT source, n_docs, first_chars, max_chars
        FROM source_rollup_udtf(
            TABLE(docs_for_table_arg_udtf)
            PARTITION BY source
            ORDER BY (n_chars, doc_id)
        )
        """
    )
