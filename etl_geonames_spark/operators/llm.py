"""LLM-training-data pipeline operators (SURVEY.md §2.12).

First-class engine extensions over the ``documents`` (text) and
``embeddings`` (vector) tables: exact + near deduplication (MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force and LSH-bucketed ANN), and text analysis (language-ID
heuristic, quality scoring, token counting, fingerprinting).

Scale design notes:
  - Everything pairwise is *blocked* — by LSH band, hash bucket, or
    key — so candidate generation is a hash-partitioned equi-join,
    never an O(n²) cross join. That is the difference between "works
    on 60k docs" and "works on 10B docs".
  - Hashing uses xxhash64/md5 built-ins (JVM, codegen'd,
    deterministic across runs and engines).
  - Zero Python on any of these paths — even SimHash's 64-way bit
    math decomposes into codegen'd bitwise expressions over one hash
    aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_geonames_spark.functions import materialize_ctes, pin, qround, spread, sql_qround
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the lowest doc_id
    (deterministic, unlike dropDuplicates). Scale: one shuffle on
    text-hash; for very long documents group on xxhash64(text) instead
    and verify within buckets."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("doc_id", "text", "n_copies")
    )


_MINHASH_PERMS = 16
_MINHASH_BANDS = 4  # 4 bands × 4 rows


def _shingles(tok_col: str, k: int = 3):
    """k-word shingles via sequence+slice (pure built-ins).

    Guarded for size < k: Spark's sequence(1, 0) counts DOWN ([1, 0])
    and slice(_, 0, k) throws — so a single short document would kill
    the whole job. Short docs yield an empty shingle array instead
    (matching SQL generate_series(1, 0) = empty semantics)."""
    return F.expr(
        f"IF(size({tok_col}) >= {k},"
        f"   transform(sequence(1, size({tok_col}) - {k - 1}),"
        f"     i -> concat_ws(' ', slice({tok_col}, i, {k}))),"
        f"   array())"
    )


# Universal-hash permutation family over a Mersenne-ish prime: each
# "permutation" i maps a base shingle hash x to (a_i·x + b_i) mod P.
# Constants are fixed odd/arbitrary values → fully deterministic.
_MINHASH_P = 2_147_483_647  # 2^31 − 1
_MINHASH_A = [2 * i * 1_000_003 + 1 for i in range(_MINHASH_PERMS)]
_MINHASH_B = [i * 998_244_353 + 12_345 for i in range(_MINHASH_PERMS)]


def minhash_signatures(docs: DataFrame, num_perms: int = _MINHASH_PERMS) -> DataFrame:
    """doc_id → minhash signature array.

    Each shingle is xxhash64'd ONCE, then the per-permutation values
    are cheap arithmetic reuses ``(a_i·h + b_i) mod P`` of that base
    hash — the standard universal-hash minhash family. (The naive
    form — a fresh salted xxhash64 over the shingle *string* per
    permutation — re-concatenates and re-hashes 16×; measured ~4×
    slower at 50k docs.) pmod keeps every term in [0, P), so the
    multiply stays below 2^62: no ANSI overflow."""
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    sh = toks.select("doc_id", _shingles("toks").alias("shingles"))
    base = sh.select(
        "doc_id",
        F.transform(
            F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P))
        ).alias("hs"),
    )
    def perm(i: int):
        # closure factory, NOT a default arg: transform() interprets a
        # 2-parameter lambda as (element, index)
        a, b = _MINHASH_A[i], _MINHASH_B[i]
        return lambda h: F.pmod(h * a + b, F.lit(_MINHASH_P))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), perm(i)))
            for i in range(num_perms)
        ]
    )
    return base.select("doc_id", sig.alias("sig"))


def minhash_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig) → (doc_id, band_idx, band_hash): the LSH banding
    step, shared by the batch dedup query and the streaming dedup
    maintenance (streaming/pipeline.py) so both index the SAME bucket
    space — a streaming store built with these bands is directly
    joinable against any batch run's bands."""
    rows_per_band = _MINHASH_PERMS // _MINHASH_BANDS
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(_MINHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


@query("llm_dedup_minhash")  # LSH banding not SQL-expressible → rows-only
def llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding:
    shingle → 16 minhashes → 4 bands of 4 → equi-join on
    (band_idx, band_hash). Deterministic (xxhash64). Scale: the
    band join is hash-partitioned; no pair of non-colliding docs is
    ever materialized — this is the linear-ish path to dedup at
    billions of documents."""
    sigs = minhash_signatures(
        # llm_dedup_verified/cluster/canonical chain through this
        # call, so the spread propagates to the family
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    # both self-join roles consume the band table and exchange reuse
    # does not fire across the roles (r15 probe: 4 parquet scans, 4
    # Generates, 0 ReusedExchange — the tokenize+shingle+16-perm
    # signature build executed TWICE); the pin is 4 rows/doc of
    # (band_idx, band_hash) longs — narrow, unlike the lsg/esr
    # string-gram tables where the A/B said re-run instead
    bands = minhash_bands(sigs).transform(pin)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 64-bit SimHash, entirely in JVM expressions.

    Signature bit b = sign of Σ over tokens of ±1 at bit b of
    xxhash64(token). Shape: explode tokens → one hash aggregate with
    64 conditional sums → pack sign bits. Whole-stage-codegen'd end to
    end; the shuffle carries 64 longs per doc (map-side combined).
    The earlier pandas-UDF version did per-row per-token Python
    hashing and was ~50× slower — UDFs are the slow path.
    Docs with zero tokens produce no signature (inner semantics).
    """
    tokh = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.xxhash64("tok").alias("h"))
    )
    bit = lambda b: F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1)  # noqa: E731
    sums = tokh.groupBy("doc_id").agg(
        *[F.sum(bit(b) * 2 - 1).alias(f"b{b}") for b in range(64)]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc_id", sig.alias("simhash"))


@query("llm_dedup_simhash")  # token hashing engine-specific → rows-only
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signatures plus banded candidate pairs
    (4 × 16-bit chunks; candidates share ≥1 exact chunk), post-filtered
    to hamming ≤ 8.

    Recall contract (pinned by tests/test_dedup_recall.py): pigeonhole
    over 4 chunks makes candidate generation *complete* for hamming ≤ 3
    (3 flipped bits cannot touch all 4 chunks); between 4 and 8 it is
    probabilistic (a clean chunk usually survives, but flips can land
    in all four). Catching hamming ≤ 8 *exhaustively* would need ≥ 9
    narrower bands, whose per-band collision rate (2^-7 vs 2^-16) makes
    the candidate join quadratic on random data — the wrong trade at
    corpus scale. Docs with small edits relative to length sit well
    inside the guarantee."""
    docs = simhash_signatures(load_table(spark, sf_dir, "documents"))
    chunk = lambda c, i: F.shiftrightunsigned(F.col(c), i * 16).bitwiseAND(0xFFFF)  # noqa: E731
    chunks = docs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[chunk("simhash", i) for i in range(4)])
        ).alias("chunk_idx", "chunk_val"),
        # both sides of the candidate self-join consume this table and
        # exchange reuse does NOT fire across the differing join roles
        # (r14 plan audit: the tokenize→shingle→sign-sum signature
        # build executed TWICE) — pin it once; 4·|docs| rows
    ).transform(pin)
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


@query(
    "llm_dedup_ngram",
    oracle="""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(str_split(text, ' ')) - 1),
               i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1]
             ))) AS g
      FROM documents WHERE doc_id < 200
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           FLOOR((CAST(i AS DOUBLE) / (sa.n + sb.n - i)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.05
    """,
)
def llm_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (word-bigram) Jaccard over candidate pairs, fully
    SQL-expressible: explode distinct bigrams → equi-join on gram →
    |A∩B| / (|A|+|B|−|A∩B|). Bounded to doc_id < 200 here; at scale
    you run this only on LSH candidates (llm_dedup_minhash) — gram
    join on the full corpus is the quadratic trap."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles("toks", 2))).alias("g"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.05)
        # qround, not ROUND: jaccard is a ratio — plain ROUND can flip on
        # half-boundary values between engines (rounding invariant)
        .select("doc_a", "doc_b", qround(jac, 6).alias("jaccard"))
    )


@query(
    "llm_dedup_containment",
    oracle="""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(str_split(text, ' ')) - 1),
               i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1]
             ))) AS g
      FROM documents WHERE doc_id < 200
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           FLOOR((CAST(i AS DOUBLE) / LEAST(sa.n, sb.n)) * 1000000.0 + 0.5)
             / 1000000.0 AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.3
    """,
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: |A∩B| over the SMALLER bigram set — the
    near-SUBSET detector Jaccard misses (a doc quoted whole inside a
    10× longer one scores containment ≈ 1 but Jaccard ≈ 0.1; the
    approximate form of the exact-substring dedup of Lee et al. 2022).
    Same bounded gram equi-join shape as llm_dedup_ngram; at corpus
    scale run it on LSH candidates only, like llm_dedup_verified."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles("toks", 2))).alias("g"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    containment = F.col("i").cast("double") / F.least(
        F.col("sa.n"), F.col("sb.n")
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(containment >= 0.3)
        .select("doc_a", "doc_b", qround(containment, 6).alias("containment"))
    )


# ---------------------------------------------------------------------------
# vector similarity
# ---------------------------------------------------------------------------


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    """Cosine similarity between two array<double> columns — sequential
    double accumulation, matching DuckDB's list_dot_product order."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@query(
    "llm_sim_topk",
    oracle="""
    SELECT q_id, c_id, cos_sim FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             FLOOR((list_dot_product(q.emb, c.emb) /
                    (sqrt(list_dot_product(q.emb, q.emb)) *
                     sqrt(list_dot_product(c.emb, c.emb)))) * 1000000.0 + 0.5)
               / 1000000.0 AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.emb, c.emb) /
                        (sqrt(list_dot_product(q.emb, q.emb)) *
                         sqrt(list_dot_product(c.emb, c.emb))) DESC,
                        c.vec_id) AS rn
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 5) q
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings) c
        ON c.vec_id <> q.vec_id
    ) t WHERE rn <= 10
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact-ANN baseline. Query side
    broadcasts (few vectors) against the full corpus; per-query top-k
    via window. Scale: exact search is O(|q|·n) — fine for small |q|;
    for large |q| switch to llm_ann_lsh."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"))
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .withColumn("_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        # qround: similarities are ratios — plain ROUND can flip on
        # half-boundary values between engines (rounding invariant)
        .select("q_id", "c_id", qround(F.col("_sim"), 6).alias("cos_sim"))
    )


_LSH_BITS = 8


def _hyperplane_sign_bucket(emb_col: str, dim: int = 64, bits: int = _LSH_BITS):
    """Deterministic random-hyperplane LSH bucket id (no RNG state:
    plane m, dim d weight = ((d*31 + m*17 + 7) % 101)/50 - 1)."""
    bucket = F.lit(0)
    for m in range(bits):
        weights = F.array(
            *[F.lit(((d * 31 + m * 17 + 7) % 101) / 50.0 - 1.0) for d in range(dim)]
        )
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << m)).otherwise(F.lit(0))
    return bucket


@query("llm_ann_lsh")  # approximate by design → rows-only
def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN: random-hyperplane sign buckets →
    candidates share a bucket → exact cosine re-rank within bucket.
    The bucket join is a hash-partitioned equi-join; recall tunes via
    bits/multi-probe.

    Regime note (measured, tests/test_ann_recall.py): sign-LSH recall
    is p^bits with p = 1 - theta/pi per plane — high for genuinely
    close vectors (cos >= 0.9 → p ~= 0.86), but on corpora whose true
    neighbors sit at cos 0.2-0.4 (e.g. the fixture embeddings) it
    collapses to ~p^8 ~= 2% by construction. For cluster-structured
    embeddings prefer llm_ann_ivf, whose coarse cells track the
    cluster geometry (recall@10 ~= 0.9 on the same fixture)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    bucketed = emb.withColumn("bucket", _hyperplane_sign_bucket("emb"))
    q = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("c_id") != F.col("q_id")),
        )
        .withColumn("_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id", qround(F.col("_sim"), 6).alias("cos_sim"))
    )


_IVF_CELLS = 16
_IVF_NPROBE = 2


@query("llm_ann_ivf")  # approximate by design → rows-only
def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN: coarse-quantize every vector to its
    nearest centroid cell, probe only the query's ``nprobe`` nearest
    cells, exact cosine re-rank within the probed cells.

    The other scale path for similarity search (vs llm_ann_lsh):
    centroids here are the ``_IVF_CELLS`` lowest-id vectors (a
    deterministic seed codebook — production would train k-means||
    offline and broadcast the codebook the same way). Cell assignment
    is a 1-row broadcast crossJoin + array expressions (no shuffle,
    no UDF); the candidate join is a hash-partitioned equi-join on
    cell id, never all-pairs. Recall tunes via cells/nprobe."""
    emb = (
        spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
        .select("vec_id", _as_double("embedding").alias("emb"))
    )
    codebook = emb.filter(F.col("vec_id") < _IVF_CELLS).agg(
        F.collect_list(F.struct("vec_id", "emb")).alias("cents")
    )

    def cell_ranking(vec):
        # array<struct<dist,cid>> sorted ascending: lexicographic
        # struct order ranks by cosine distance, cid tiebreak
        return F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    (F.lit(1.0) - cosine(vec, c["emb"])).alias("dist"),
                    c["vec_id"].alias("cid"),
                ),
            )
        )

    assigned = emb.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "emb", cell_ranking(F.col("emb"))[0]["cid"].alias("cell")
    )
    q = (
        assigned.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(codebook))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("q_emb"),
            F.explode(
                F.slice(
                    F.transform(
                        cell_ranking(F.col("emb")), lambda s: s["cid"]
                    ),
                    1,
                    _IVF_NPROBE,
                )
            ).alias("cell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"), "cell"
    )
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, ["cell"])
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id", qround(F.col("_sim"), 6).alias("cos_sim"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding near-dup pairs over a (vec_id, emb) frame: LSH-bucket
    blocking + exact cosine ≥ threshold within buckets. Same blocking
    discipline as minhash dedup — the bucket equi-join never
    materializes non-candidate pairs. Recall/precision pinned on a
    planted corpus in tests/test_dedup_recall.py."""
    # pinned once: both self-join roles consume this, and the
    # 8-hyperplane sign projection (plus whatever the caller unioned
    # in) would otherwise execute twice (r14 plan audit)
    bucketed = emb.withColumn(
        "bucket", _hyperplane_sign_bucket("emb")
    ).transform(pin)
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("bucket").alias("bucket_a"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(
            b,
            (F.col("bucket_a") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cos_sim", qround(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


@query("llm_dedup_embedding")  # LSH blocking engine-specific → rows-only
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`embedding_near_dup_pairs` demo corpus: the fixture
    embeddings PLUS deterministic planted probes — every vec_id
    divisible by 100 gets a perturbed copy (id + 1,000,000; per-dim
    offset 0.002·((i mod 7) − 3), cosine ≈ 0.9995 to its source). The
    fixture alone has no pair above 0.51 cosine, so without the plants
    this query returns 0 rows and its driver check is vacuous — a
    WHERE false bug would be indistinguishable from correct. With
    them, the expected output is exactly the planted (v, v+1,000,000)
    pairs that share an LSH bucket; the count is pinned in
    tests/test_dedup_recall.py."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    probes = base.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "emb",
            lambda x, i: x + (i % F.lit(7) - F.lit(3)) * F.lit(0.002),
        ).alias("emb"),
    )
    return embedding_near_dup_pairs(base.unionByName(probes))


@query("llm_dedup_verified")  # candidate set is LSH-derived → rows-only
def llm_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup composition: MinHash-LSH candidate pairs →
    exact bigram-Jaccard verification on ONLY those pairs.

    This is how near-dedup actually runs at corpus scale: candidate
    generation is linear-ish (banded LSH), and the quadratic exact
    comparison collapses to the candidate set. Contrast llm_dedup_ngram,
    which exact-joins grams corpus-wide and must be bounded. Per pair,
    Jaccard is computed with array intersection on the two token-bigram
    sets — no explode, no second shuffle beyond the two text lookups.

    The bigram sets are xxhash64'd to longs before the pair join: the
    intersection then compares 8-byte integers instead of ~100-char
    strings (and ships far fewer bytes through the join shuffle). A
    64-bit collision would merge two distinct bigrams — at ~100
    grams/doc the per-pair odds are ~1e-15, far below the 1e-6
    rounding grid of the reported jaccard. The intersection size is
    materialized in its own projection so it is computed once, not
    re-expanded inside the union-size denominator.

    Output: (doc_a, doc_b, jaccard) for verified pairs (jaccard ≥ 0.3)."""
    pairs = llm_dedup_minhash(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        spread(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(_shingles("toks", 2), lambda s: F.xxhash64(s))
            ).alias("grams"),
        )
        .withColumn("n_grams", F.size("grams"))
        # both pair-side lookups (doc_a, doc_b) consume this — pinned
        # once or the tokenize+shingle+hash build runs twice (r14 plan
        # audit: 8 parquet scans → 4)
        .transform(pin)
    )
    a = grams.select(
        F.col("doc_id").alias("doc_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("na"),
    )
    b = grams.select(
        F.col("doc_id").alias("doc_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("nb"),
    )
    from etl_geonames_spark.functions import qround

    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("_inter", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn(
            "jaccard",
            qround(
                F.col("_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b", "jaccard")
    )


def _propagate_min_labels(edges: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Min-label propagation over the vertices OF THE EDGE SET only:
    (doc_a, doc_b) pairs → (doc_id, label) for every doc that appears
    in at least one edge; label = smallest doc_id in its component.

    The iterative work scales with the *dup graph* (edge vertices),
    never the corpus — singleton documents don't enter the loop at
    all, which is the difference between iterating over a few million
    near-dup members and iterating over 100 TB of corpus per round.

    Per round: ONE join+aggregate over the self-loop-AUGMENTED edge
    set — the (v, v) rows deliver each vertex's own label into its
    min aggregate (so the keep-own left-join merge of the pre-r14
    form is gone), and the same aggregate emits the previous label
    (the self-loop row's value, a max-of-one) so the convergence
    check still rides the checkpointed frame as a filter-count over
    cached blocks — no extra join job. The checkpoint per round stays:
    a CONVERGENCE loop must materialize each round anyway (the driver
    reads the changed-count), unlike the fixed-round graph family's
    lazy towers. Raises rather than returning unconverged (silently
    split) components."""
    sym = edges.unionByName(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).transform(pin)  # pin the (possibly expensive) edge derivation once
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .transform(pin)
    )
    # self-loop augmentation from the two checkpointed tables — a pure
    # union of RDD scans (no shuffle), cheap to re-derive every round
    aug = sym.unionByName(
        labels.select(
            F.col("doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
    )
    changed = 0
    for _ in range(max_rounds):  # bound ≫ any plausible dup-cluster diameter
        stepped = (
            aug.join(labels, aug["doc_b"] == labels["doc_id"])
            .groupBy(aug["doc_a"].alias("doc_id"))
            .agg(
                F.min("label").alias("label"),
                # the self-loop row carries this vertex's own previous
                # label — max over the single matching row
                F.max(
                    F.when(aug["doc_b"] == aug["doc_a"], F.col("label"))
                ).alias("_prev"),
            )
            .transform(pin)  # truncate lineage: iterative plans blow up
        )
        changed = stepped.filter(F.col("label") != F.col("_prev")).count()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components: not converged after {max_rounds} rounds "
            f"({changed} labels still changing) — raise max_rounds or "
            "inspect the edge graph"
        )
    return labels


def connected_components(
    docs: DataFrame, edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """(doc_id) × (doc_a, doc_b) edges → (doc_id, label) for EVERY doc,
    label = smallest doc_id in the component. The fixpoint loop runs
    only over edge vertices (:func:`_propagate_min_labels`); docs with
    no edges are singletons by construction and are attached afterwards
    with one anti-join — at corpus scale the dup graph is a small
    fraction of the table, so the iterative part stays tiny."""
    member_labels = _propagate_min_labels(edges, max_rounds)
    singletons = (
        docs.select("doc_id")
        .join(member_labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("label", F.col("doc_id"))
    )
    return member_labels.unionByName(singletons)


@query("llm_dedup_cluster")  # iterative fixpoint → rows-only
def llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the MinHash
    candidate-pair graph, so each near-dup *group* keeps exactly one
    canonical document (pairwise dedup alone can't pick a survivor
    from A~B, B~C chains).

    Iterative min-label propagation on DataFrames: each round, every
    doc adopts the smallest label among itself and its neighbors; the
    loop runs until no label changes (checked via a count — cheap,
    since the frontier shrinks geometrically). Each round is one
    shuffle on doc_id. At billions of docs this exact loop holds —
    it's the standard large-graph CC algorithm (HashToMin); rounds
    grow with component *diameter*, and dup clusters are shallow.

    Output: (doc_id, cluster_id, is_canonical)."""
    edges = llm_dedup_minhash(spark, sf_dir)  # (doc_a < doc_b)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = connected_components(docs, edges)
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_canonical"),
    )


@query("llm_dedup_canonical")  # cluster ids are engine-derived → rows-only
def llm_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final product: the corpus with near-dup
    cluster members removed, keeping each cluster's canonical (lowest
    doc_id) document. Composition: LSH candidates → connected
    components over edge vertices → ANTI-join the corpus against the
    non-canonical members. This is the table a training run reads.

    Scale shape: the right side of the anti-join is only the documents
    being *dropped* (cluster members minus canonicals — a small
    fraction even at high dup rates), so the corpus-sized side makes
    one pass through a hash anti-join (broadcast when the drop set
    fits), instead of semi-joining corpus against a corpus-sized keep
    set. The corpus never enters the CC loop."""
    labels = _propagate_min_labels(llm_dedup_minhash(spark, sf_dir))
    drop = labels.filter(F.col("label") != F.col("doc_id")).select("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .join(drop, "doc_id", "left_anti")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@query(
    "llm_sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE (lang = 'en' AND doc_id % 10 < 5)
       OR (lang <> 'en' AND doc_id % 10 < 2)
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (50% of 'en', 20% of the rest)
    via key-mod buckets instead of RNG — reproducible across runs,
    engines, and partitionings, which is what a training-data pipeline
    needs for auditable mixtures. Pure scan-side filter: no shuffle,
    pushdown-friendly."""
    docs = load_table(spark, sf_dir, "documents")
    rate_bucket = F.when(F.col("lang") == "en", F.lit(5)).otherwise(F.lit(2))
    return docs.filter(F.col("doc_id") % 10 < rate_bucket).select("doc_id", "lang")


_CTX_WINDOW = 512


@query(
    "llm_pack_sequences",
    oracle=f"""
    SELECT doc_id, lang, ws_tokens,
           CAST(FLOOR((cum - ws_tokens) / {_CTX_WINDOW}.0) AS BIGINT) AS pack_id
    FROM (
      SELECT doc_id, lang, len(str_split(text, ' ')) AS ws_tokens,
             SUM(len(str_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ) t
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    (context windows) by cumulative token count within each language —
    the contiguous-packing strategy for pretraining batch construction.
    One window shuffle on lang; deterministic doc_id order makes packs
    reproducible. (True greedy bin-packing is inherently sequential;
    contiguous packing is the scalable standard.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.select(
        "doc_id",
        "lang",
        toks.cast("bigint").alias("ws_tokens"),
        F.floor((F.sum(toks).over(w) - toks) / _CTX_WINDOW).alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "llm_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(str_split(text, ' ')) AS word
        FROM documents WHERE doc_id < 100
      ) t WHERE word <> '' GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.word,
             FLOOR(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) * 1000000.0 + 0.5)
               / 1000000.0 AS tfidf
      FROM tf, df, n WHERE tf.word = df.word
    )
    SELECT doc_id, word, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      FROM scored
    ) x WHERE rn <= 3
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency per doc × inverse document frequency,
    top-3 terms per document. Three hash aggregates + one broadcast of
    the (word → df) side + a per-doc top-k window — each stage
    map-side-combined; the df table is vocabulary-sized, so it
    broadcasts at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a broadcast 1-row aggregate, NOT a driver-side
    # .count(): keeps the whole query one lazy plan (an eager count here
    # ran the corpus twice — once to embed a literal, once for real)
    n_docs = tf.agg(
        F.count_distinct("doc_id").cast("double").alias("_n_docs")
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            qround(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf")
    )


@query(
    "llm_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n FROM (
      SELECT unnest(str_split(text, ' ')) AS word FROM documents
    ) t WHERE word <> '' GROUP BY word
    """,
)
def llm_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word histogram — explode + hash aggregate. The shuffle
    carries only (word, partial count) thanks to map-side combine."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "llm_text_stats",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT)
             AS n_distinct_words,
           FLOOR((CAST(list_sum(list_transform(str_split(text, ' '),
                                              w -> length(w))) AS DOUBLE)
                 / len(str_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len
    FROM documents
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: word/distinct-word counts, mean word length
    — all array built-ins, no explode, no shuffle."""
    toks = F.split(F.col("text"), " ")
    word_lens = F.transform(toks, F.length)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_words"),
        # qround, not ROUND: the oracle uses the floor-form, and the
        # average is a ratio that can sit on decimal half-boundaries
        # where Spark's decimal-repr ROUND disagrees by one ulp
        qround(
            F.aggregate(
                word_lens, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            / F.size(toks),
            6,
        ).alias("avg_word_len"),
    )


@query(
    "llm_lang_dist",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           FLOOR((AVG(n_chars)) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
)
def llm_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus slicing by language × source."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            qround(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_PROFILE_DATA = ["data", "row", "query", "table", "join"]
_PROFILE_SPARK = ["spark", "filter", "merge", "batch", "shuffle"]


@query(
    "llm_lang_id",
    oracle=f"""
    SELECT doc_id,
           FLOOR((CAST(len(list_filter(str_split(text, ' '),
                     w -> list_contains({_PROFILE_DATA!r}, w))) AS DOUBLE)
                 / len(str_split(text, ' '))) * 1000000.0 + 0.5)
             / 1000000.0 AS score_data,
           FLOOR((CAST(len(list_filter(str_split(text, ' '),
                     w -> list_contains({_PROFILE_SPARK!r}, w))) AS DOUBLE)
                 / len(str_split(text, ' '))) * 1000000.0 + 0.5)
             / 1000000.0 AS score_spark,
           CASE
             WHEN len(list_filter(str_split(text, ' '),
                      w -> list_contains({_PROFILE_DATA!r}, w))) >
                  len(list_filter(str_split(text, ' '),
                      w -> list_contains({_PROFILE_SPARK!r}, w)))
               THEN 'data-ish'
             WHEN len(list_filter(str_split(text, ' '),
                      w -> list_contains({_PROFILE_SPARK!r}, w))) >
                  len(list_filter(str_split(text, ' '),
                      w -> list_contains({_PROFILE_DATA!r}, w)))
               THEN 'spark-ish'
             ELSE 'unknown'
           END AS predicted
    FROM documents
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-profile language-ID heuristic: stopword-hit ratio per
    profile, argmax wins. (Real LID swaps the word lists for per-
    language frequency profiles; the dataflow — array_contains filter
    counts, no shuffle — is the production shape.)"""
    toks = F.split(F.col("text"), " ")
    hits = lambda words: F.size(  # noqa: E731
        F.filter(
            toks,
            lambda w: F.array_contains(F.array(*[F.lit(x) for x in words]), w),
        )
    )
    h_data, h_spark = hits(_PROFILE_DATA), hits(_PROFILE_SPARK)
    # qround on both sides: stopword-hit ratios like k/640 sit exactly on
    # half-boundaries where Spark ROUND and DuckDB ROUND disagree
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        qround(h_data.cast("double") / F.size(toks), 6).alias("score_data"),
        qround(h_spark.cast("double") / F.size(toks), 6).alias("score_spark"),
        F.when(h_data > h_spark, F.lit("data-ish"))
        .when(h_spark > h_data, F.lit("spark-ish"))
        .otherwise(F.lit("unknown"))
        .alias("predicted"),
    )


# the composite quality score on its emit grid — ONE definition for
# llm_quality_score and llm_source_winrate's ranking key
_QUALITY_Q6_SQL = """FLOOR((0.4 * LEAST(1.0, len(str_split(text, ' ')) / 100.0)
               + 0.3 * (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                        / len(str_split(text, ' ')))
               + 0.3 * LEAST(1.0,
                   (CAST(list_sum(list_transform(str_split(text, ' '),
                                                 w -> length(w))) AS DOUBLE)
                    / len(str_split(text, ' '))) / 8.0)) * 1000000.0 + 0.5)
             / 1000000.0"""


def _quality_q6_col():
    """Spark twin of _QUALITY_Q6_SQL: the composite quality score
    qround'd to its 1e-6 emit grid (bounded to [0, 1] — at most 10⁶+1
    distinct values, which is what makes it usable as a VALUE-GRID
    key downstream)."""
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    distinct_ratio = (
        F.size(F.array_distinct(toks)).cast("double") / n_words
    )
    avg_wl = (
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )
        / n_words
    )
    return qround(
        0.4 * F.least(F.lit(1.0), n_words / F.lit(100.0))
        + 0.3 * distinct_ratio
        + 0.3 * F.least(F.lit(1.0), avg_wl / 8.0),
        6,
    )


@query(
    "llm_quality_score",
    oracle=f"""
    SELECT doc_id, {_QUALITY_Q6_SQL} AS quality
    FROM documents
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + lexical diversity +
    word-length saturation. All expression-level; at 100 TB this is a
    free rider on whatever scan already touches the text. The score
    expression lives in :func:`_quality_q6_col` (one definition,
    shared with llm_source_winrate's ranking key); qround floor-form,
    not ROUND — the rational terms sit exactly on decimal
    half-boundaries where the engines' ROUNDs disagree."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", _quality_q6_col().alias("quality")
    )


@query(
    "llm_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(CEIL(n_chars / 4.0) AS BIGINT) AS bpe_estimate
    FROM documents
    """,
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + the chars/4 BPE estimate
    (the standard budget heuristic when the real tokenizer is too
    expensive to run corpus-wide)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("bpe_estimate"),
    )


@query(
    "llm_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS content_fp,
           md5(substr(text, 1, 64)) AS prefix_fp
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (md5 — engine-portable and deterministic,
    hence oracle-checkable; xxhash64 is the cheaper engine-internal
    choice used by the minhash path)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_fp"),
        F.md5(F.substring(F.col("text"), 1, 64).cast("binary")).alias("prefix_fp"),
    )


@query(
    "llm_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 4),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                    || t[i+3] || ' ' || t[i+4]))) AS g
      FROM toks),
    test_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50)
    SELECT a.doc_id, COUNT(*) AS n_hits
    FROM grams a JOIN test_grams USING (g)
    WHERE a.doc_id >= 50
    GROUP BY a.doc_id
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-gram with the held-out test set (docs with doc_id < 50 stand in
    for the benchmark). The standard n-gram-overlap decontamination
    pass every training corpus needs before release.

    Scale: the test-set gram table is benchmark-sized (thousands of
    docs, not billions) — it BROADCASTS, so the corpus-side pass is
    one scan + map-side semi-ish join + one aggregation shuffle on
    doc_id; the corpus is never re-partitioned by gram. Per-doc gram
    sets are pre-deduped (array_distinct), so COUNT(*) after the join
    equals the distinct-shared-gram count on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles("toks", 5))).alias("g"),
    )
    test_grams = (
        grams.filter(F.col("doc_id") < 50).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= 50)
        .join(F.broadcast(test_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


@query(
    "llm_cap_per_source",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn <= 100
    """,
)
def llm_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap each source at 100 documents — the
    per-domain quota pass that keeps one crawl domain from dominating
    a training mix. Deterministic priority order (doc_id) so reruns
    keep the same survivors; swap the ORDER BY for a salted hash to
    make the cap sample-like instead of prefix-like.

    Scale: one window shuffle partitioned by source. Skewed sources
    (one domain = half the corpus) sort more rows in that partition;
    for pathological skew, pre-filter with an approximate per-source
    count and only window the sources over quota."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# embedding clustering (k-means)
# ---------------------------------------------------------------------------

_KMEANS_K = 4
_KMEANS_ROUNDS = 2
_KMEANS_DIM = 64


def _km_assign_sql(cent: str) -> str:
    d2 = (
        f"list_sum(list_transform(generate_series(1, {_KMEANS_DIM}), "
        f"i -> (p.emb[i] - c.cent[i]) * (p.emb[i] - c.cent[i])))"
    )
    return (
        f"SELECT vec_id, cluster FROM ("
        f" SELECT p.vec_id, c.cluster,"
        f" ROW_NUMBER() OVER (PARTITION BY p.vec_id"
        f"   ORDER BY {d2}, c.cluster) AS rn"
        f" FROM pts p, {cent} c) WHERE rn = 1"
    )


def _km_update_sql(asg: str) -> str:
    return (
        f"SELECT cluster,"
        f" list(FLOOR(m * 1000000.0 + 0.5) / 1000000.0 ORDER BY pos) AS cent"
        f" FROM (SELECT a.cluster, i AS pos, avg(p.emb[i]) AS m"
        f" FROM {asg} a JOIN pts p USING (vec_id),"
        f" unnest(generate_series(1, {_KMEANS_DIM})) AS d(i)"
        f" GROUP BY a.cluster, i) GROUP BY cluster"
    )


def _centroid_update(joined: DataFrame) -> DataFrame:
    """(cluster, emb, …) → (cluster, cent): the k-means centroid
    update — posexplode to (cluster, pos, val), per-(cluster, pos)
    qround'd means, re-assembled per cluster. ONE shared definition
    for every caller (llm_kmeans / semdedup blocking /
    llm_kmeans_quality's c3 / the Arrow path), mirroring the
    _km_update_sql oracle CTE.

    r15 A/B note (VERDICT r14 item 5, REJECTED on measurement): a
    no-Generate form — 64 per-dim `avg(try_element_at(emb, i))`
    aggregate expressions in one cluster-keyed exchange — was built,
    oracle-verified (sf0.001 + sf0.01 + edge fixtures green) and
    interleave-timed against this form on a quiet box: the fold is
    SLOWER at fixture scale (2-round k=32 chain 2.56 vs 1.71 s
    min-of-3; the d4 prototype pass 4.22 vs 3.65 s). 64 interpreted
    per-row aggregate updates lose to a tight codegen'd generator +
    single-column avg even though they save an exchange and a
    Generate; the exchange they save carries k×dim partial rows —
    metadata-sized at ANY corpus scale, so the saving never grows
    while the per-row cost scales with n. The posexplode form stays
    at 100 TB too."""
    per_dim = (
        joined.select("cluster", F.posexplode("emb").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(qround(F.avg("val"), 6).alias("m"))
    )
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cent")
    )


def kmeans_assign(pts: DataFrame, c: DataFrame) -> DataFrame:
    """Argmin cell assignment of a (vec_id, emb) frame against a
    broadcast (cluster, cent) table — (vec_id, cluster) out. Shared
    by the batch k-means loop below and the streaming semantic-dedup
    maintenance (streaming/pipeline.py), so batch cells and per-batch
    stream cells can never drift for the same centroid snapshot.

    r11 audit note (VERDICT r10 item 6): a map-only variant (collect
    centroids to ONE sorted array row, argmin via array_min over a
    transform) was built and A/B'd — it removes the per-assignment
    groupBy(vec_id) exchange but measured SLOWER at every k tried
    (llm_semdedup 1.9 → 2.3+ s at sf0.1: doubly-nested interpreted
    lambdas beat the exchange savings only never — the fanout rows
    are collapsed MAP-SIDE by the partial min_by, so the exchange
    carries one compact row per point). The large-k production path
    is the Arrow assignment (_arrow_cells: broadcast centroids,
    numpy matmul, map-only), which the SemDeDup probe exercises."""
    d2 = F.aggregate(
        F.zip_with(
            F.col("emb"), F.col("cent"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pts.crossJoin(F.broadcast(c))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "cluster", F.struct(d2.alias("d"), F.col("cluster"))
            ).alias("cluster")
        )
    )


def kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int, rounds: int
) -> DataFrame:
    """The (cluster, cent) table after ``rounds`` fixed k-means
    update rounds (deterministic init = first k vec_ids, centroid
    means qround'd every round) — the snapshot the streaming
    semantic-dedup maintenance assigns against."""
    pts = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    c = pts.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("emb").alias("cent"),
    )
    for _ in range(rounds):
        c = _centroid_update(kmeans_assign(pts, c).join(pts, "vec_id"))
    return c


def _kmeans_cells(
    spark: SparkSession, sf_dir: str, k: int, rounds: int
) -> DataFrame:
    """Shared fixed-iteration k-means assignment (deterministic init =
    first k vec_ids, centroids qround'd every round). llm_kmeans
    (k=4) and llm_semdedup's blocking (k=32) both call THIS, so their
    oracles' unrolled CTEs and the engine loop can never drift.

    The fixture parquet is ONE file → one input partition, which
    serializes the per-point distance math (64·k FLOPs/row — compute-
    bound, unlike most scans). The explicit hash repartition on
    vec_id spreads it across the cluster; every downstream aggregate
    is keyed, and centroids are qround-quantized each round, so the
    layout change cannot alter results. Measured 5.0 s → ~1 s warm at
    sf0.1 for the k=32 caller."""
    pts = (
        spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
        .select("vec_id", _as_double("embedding").alias("emb"))
    )
    cents = pts.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("emb").alias("cent"),
    )

    def assign(c: DataFrame) -> DataFrame:
        # n×k crossJoin(broadcast) + min_by re-aggregate. r14 A/B'd a
        # single-broadcast-row argmin FOLD against this (same
        # arithmetic, no n×k materialization): interleaved sf0.1
        # timings were a wash at both k=4 and k=32 (the map-side
        # partial min_by collapses the fan-out before any exchange),
        # so the simpler documented shape stays.
        d2 = F.aggregate(
            F.zip_with(
                F.col("emb"), F.col("cent"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            pts.crossJoin(F.broadcast(c))
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    "cluster", F.struct(d2.alias("d"), F.col("cluster"))
                ).alias("cluster")
            )
        )

    def update(a: DataFrame) -> DataFrame:
        return _centroid_update(a.join(pts, "vec_id"))

    c = cents
    for _ in range(rounds):
        c = update(assign(c))
    return assign(c)


@query(
    "llm_kmeans",
    oracle=f"""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cluster, emb AS cent
           FROM pts WHERE vec_id < {_KMEANS_K}),
    a0 AS ({_km_assign_sql("c0")}),
    c1 AS ({_km_update_sql("a0")}),
    a1 AS ({_km_assign_sql("c1")}),
    c2 AS ({_km_update_sql("a1")}),
    a2 AS ({_km_assign_sql("c2")})
    SELECT vec_id, cluster FROM a2
    """,
)
def llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration k-means over the embedding column (k=4, 2
    update rounds, deterministic init = the first k vec_ids), the
    engine's iterative-ML representative alongside graph_pagerank.

    Output is (vec_id, cluster) — integers only. Cross-engine FP
    safety: centroid means are qround-quantized to the 1e-6 grid
    EVERY round on both sides, so accumulation-order drift between
    engines cannot compound across rounds; per-point distances use
    sequential left-to-right accumulation (zip_with + aggregate,
    matching DuckDB list_sum order); argmin ties break on cluster id
    (min_by struct ordering = ROW_NUMBER ORDER BY d2, cluster).

    100 TB shape: assignment is map-side only — the k×dim centroid
    table is broadcast, each point computes k distances in one
    codegen'd projection (min_by hash agg on vec_id collapses the
    k-fan-out before any exchange). The centroid update shuffles only
    (cluster, pos, partial-avg) — k·dim groups, map-side combined.
    The whole 2-round fit is ONE lazy plan; for many rounds, collect
    the (tiny) k×dim centroids per round or localCheckpoint — the
    data-sized lineage stays flat either way."""
    return _kmeans_cells(spark, sf_dir, _KMEANS_K, _KMEANS_ROUNDS)


@query(
    "llm_dedup_keep_best",
    oracle="""
    WITH g AS (
      SELECT MAX(n_chars * 100000000 - doc_id) AS k,
             MAX(n_chars) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM documents GROUP BY text
    )
    SELECT n_chars * 100000000 - k AS doc_id, n_chars, n_copies FROM g
    """,
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted exact dedup: within each duplicate group keep
    the BEST copy, not the lowest id — real corpora carry the same
    text at different quality (truncation, encoding damage), and
    keep-first throws the good copy away. "Best" = longest copy
    (n_chars), doc_id ascending tie-break, encoded as ONE bigint
    argmax key (n_chars * 1e8 - doc_id) whose winner decodes back to
    doc_id arithmetically.

    The encoding is a PLAN choice, not just a determinism trick:
    ``max_by`` (and max-of-struct) with a string payload carries a
    variable-size aggregation buffer, which Spark can't hash-aggregate
    — the plan degrades to SortAggregate, sorting every partition by
    full document text. Pure bigint MAX keeps the fixed-size buffer →
    HashAggregate with map-side partials, one shuffle (pinned in
    tests/test_plans.py). Recover dropped payload columns (source, …)
    by joining the kept doc_ids back to the corpus — a second cheap
    hash join, not a corpus-wide sort."""
    d = load_table(spark, sf_dir, "documents")
    best_key = F.col("n_chars") * F.lit(100_000_000) - F.col("doc_id")
    g = d.groupBy("text").agg(
        F.max(best_key).alias("k"),
        F.max("n_chars").alias("n_chars"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return g.select(
        (F.col("n_chars") * F.lit(100_000_000) - F.col("k")).alias("doc_id"),
        "n_chars",
        "n_copies",
    )


@query(
    "llm_shuffle_order",
    oracle="""
    SELECT doc_id,
           (doc_id % 2147483647) * 48271 % 2147483647 AS shuffle_key,
           ((doc_id % 2147483647) * 48271 % 2147483647) // 33554432
             AS shard
    FROM documents
    """,
)
def llm_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: a Lehmer LCG
    (h = key * 48271 mod 2^31-1 — multiplier from Park-Miller) maps
    doc_id to a pseudo-random but REPLAYABLE sort key, plus a
    range-contiguous 64-way shard id (h div ceil(p/64)). No RNG, no
    rand(): the order survives re-runs, partial failures, and corpus
    growth (new docs interleave without reshuffling old ones).
    Arithmetic stays within 2^47 so both engines compute it exactly
    in int64 — the reason for an LCG over xxhash64 (no DuckDB
    equivalent) or rand() (not replayable).

    The query itself is map-only, pushdown-friendly. The writer
    pattern at 100 TB:
    ``df.repartitionByRange(N, "shuffle_key").sortWithinPartitions(
    "shuffle_key").write...`` — a single range exchange gives
    globally shuffled, globally ordered output files; never a
    row_number over an unpartitioned window (single-task) and never
    orderBy on the driver."""
    p = F.lit(2_147_483_647)
    h = (F.col("doc_id") % p) * F.lit(48_271) % p
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", h.alias("shuffle_key"))
        .select(
            "doc_id",
            "shuffle_key",
            F.expr("shuffle_key DIV 33554432").alias("shard"),
        )
    )


@query(
    "llm_quantize_embeddings",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS max_abs
      FROM s
    )
    SELECT vec_id,
           FLOOR(max_abs * 1000000.0 + 0.5) / 1000000.0 AS scale,
           array_to_string(
             list_transform(
               e, x -> CAST(FLOOR(x / greatest(max_abs, 1e-12) * 127.0 + 0.5)
                            AS INT)
             ), ',') AS q
    FROM m
    """,
)
def llm_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    absmax scale, elements mapped to round(x/scale·127) — 4× smaller
    vectors, which at 100 TB is the difference between an ANN index
    that fits executor memory and one that doesn't (dot products
    decode-free in int arithmetic, exact re-rank on the fp32 originals
    for the shortlist only).

    Pure array lambdas (transform/array_max) — map-only, codegen'd,
    zero shuffles; the floor-form round is written identically on both
    engines so every quantized integer matches exactly. The absmax
    scale is reported qround'd for the comparison; quantized values
    use the raw scale on both sides. The divisor is clamped to 1e-12
    (identically in the oracle) so an all-zero vector quantizes to
    all-zero ints instead of 0/0 → NaN, where the engines' NaN/cast
    semantics would diverge. The int8 vector is emitted comma-joined
    (canonical serialization — scalar strings are what the driver can
    hash, and a delimited byte list is exactly the packed layout an
    index shard stores)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    with_max = emb.select(
        "vec_id",
        e.alias("e"),
        F.array_max(F.transform(e, lambda x: F.abs(x))).alias("max_abs"),
    )
    safe_scale = F.greatest(F.col("max_abs"), F.lit(1e-12))
    return with_max.select(
        "vec_id",
        qround(F.col("max_abs"), 6).alias("scale"),
        F.array_join(
            F.transform(
                F.col("e"),
                lambda x: F.floor(x / safe_scale * F.lit(127.0) + F.lit(0.5))
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("q"),
    )


@query(
    "llm_embedding_centroids",
    oracle="""
    WITH e AS (
      SELECT label, gi.i - 1 AS pos,
             CAST(embedding[gi.i] AS DOUBLE) AS val
      FROM embeddings,
           LATERAL unnest(generate_series(1, len(embedding))) AS gi(i)
    ),
    per AS (SELECT label, pos, AVG(val) AS a FROM e GROUP BY label, pos),
    counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY label
    )
    SELECT p.label, c.n_vecs,
           array_to_string(
             list(CAST(FLOOR(p.a * 1000000.0 + 0.5) AS BIGINT)
                  ORDER BY p.pos),
             ',') AS centroid
    FROM per p JOIN counts c USING (label)
    GROUP BY p.label, c.n_vecs
    """,
)
def llm_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the class
    prototype used for centroid-seeded clustering (llm_kmeans starts
    here), nearest-centroid labeling, and embedding-drift monitoring
    between corpus snapshots.

    posexplode → (label, dim) mean → re-assemble in dim order via
    array_sort(collect_list(struct)) — all JVM built-ins. The shuffle
    key is (label, dim): |labels|·|dims| cells regardless of corpus
    size, so the aggregate is map-side combined and the result is
    broadcast-sized — exactly how a 100 TB corpus reduces to a
    per-class summary in one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "val")
    )
    per = e.groupBy("label", "pos").agg(F.avg("val").alias("a"))
    cent = per.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("a")))
                ),
                lambda s: F.floor(s["a"] * F.lit(1e6) + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("centroid")
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return counts.join(cent, "label").select("label", "n_vecs", "centroid")


@query(
    "llm_dedup_report",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
           FLOOR((1.0 - COUNT(DISTINCT text) / CAST(COUNT(*) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS dup_ratio
    FROM documents GROUP BY source
    """,
)
def llm_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: per-source document counts, distinct-text
    counts, and the implied duplicate ratio — the report a curation
    run publishes so source-level contamination (a crawler looping, a
    dump ingested twice) is visible BEFORE the expensive near-dup
    passes run.

    COUNT(DISTINCT text) over full text is exact here; at 100 TB swap
    the measure for approx_count_distinct over xxhash64(text) — same
    one-aggregate shape, sketch-mergeable, and the report tolerates
    approximation by construction."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        n.alias("n_docs"),
        F.count_distinct("text").alias("n_unique"),
        qround(
            F.lit(1.0) - F.count_distinct("text") / n.cast("double"), 6
        ).alias("dup_ratio"),
    )


@query(
    "llm_bigram_f1",
    oracle="""
    WITH grams AS (
      SELECT doc_id, doc_id // 2 AS pair_id, doc_id % 2 AS side,
             list_transform(
               generate_series(1, len(str_split(text, ' ')) - 1),
               i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1]
             ) AS bigrams
      FROM documents WHERE doc_id < 200
    ),
    sides AS (
      SELECT pair_id, side, bigrams FROM grams
    ),
    paired AS (
      SELECT a.pair_id,
             len(list_intersect(a.bigrams, b.bigrams)) AS overlap,
             len(list_distinct(a.bigrams)) AS n_a,
             len(list_distinct(b.bigrams)) AS n_b
      FROM (SELECT * FROM sides WHERE side = 0) a
      JOIN (SELECT * FROM sides WHERE side = 1) b USING (pair_id)
    )
    SELECT pair_id,
           CAST(overlap AS BIGINT) AS overlap,
           FLOOR(CASE WHEN overlap = 0 THEN 0.0
                 ELSE 2.0 * (overlap / CAST(n_a AS DOUBLE))
                       * (overlap / CAST(n_b AS DOUBLE))
                      / (overlap / CAST(n_a AS DOUBLE)
                         + overlap / CAST(n_b AS DOUBLE)) END
                 * 1000000.0 + 0.5) / 1000000.0 AS f1
    FROM paired
    """,
)
def llm_bigram_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2-style bigram F1 between paired documents (doc 2k vs
    2k+1) — the eval-metric shape: overlap of distinct bigram sets as
    precision/recall, harmonic mean, zero-overlap guarded.

    Set arithmetic stays in array built-ins (array_intersect /
    array_distinct — the llm_dedup_verified discipline, no explode of
    the pair side). Pairing is an equi join on pair_id: at eval scale
    (reference vs candidate corpora) this is a co-partitioned join on
    the example id, never a cross join. Bounded to doc_id < 200 like
    the other pairwise-text queries."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    grams = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        # size < 2 guard: sequence(1, 0) is descending [1, 0] in Spark
        # and the out-of-bounds [i] access throws under ANSI mode (see
        # llm_bigram_logprob) — a single-token doc must yield [] here.
        F.expr(
            "CASE WHEN size(split(text, ' ')) > 1 THEN"
            " transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat(split(text, ' ')[i-1], ' ', split(text, ' ')[i]))"
            " ELSE cast(array() AS array<string>) END"
        ).alias("bigrams"),
    )
    a = grams.filter(F.col("side") == 0).select(
        "pair_id", F.col("bigrams").alias("ba")
    )
    b = grams.filter(F.col("side") == 1).select(
        "pair_id", F.col("bigrams").alias("bb")
    )
    paired = a.join(b, "pair_id").select(
        "pair_id",
        F.size(F.array_intersect("ba", "bb")).cast("bigint").alias("overlap"),
        F.size(F.array_distinct("ba")).alias("n_a"),
        F.size(F.array_distinct("bb")).alias("n_b"),
    )
    p = F.col("overlap") / F.col("n_a").cast("double")
    r = F.col("overlap") / F.col("n_b").cast("double")
    f1 = F.when(F.col("overlap") == 0, F.lit(0.0)).otherwise(
        F.lit(2.0) * p * r / (p + r)
    )
    return paired.select("pair_id", "overlap", qround(f1, 6).alias("f1"))


@query(
    "llm_hard_negatives",
    oracle="""
    SELECT q_id, c_id, q_label, c_label, cos_sim FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             q.label AS q_label, c.label AS c_label,
             FLOOR((list_dot_product(q.emb, c.emb) /
                    (sqrt(list_dot_product(q.emb, q.emb)) *
                     sqrt(list_dot_product(c.emb, c.emb)))) * 1000000.0 + 0.5)
               / 1000000.0 AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.emb, c.emb) /
                        (sqrt(list_dot_product(q.emb, q.emb)) *
                         sqrt(list_dot_product(c.emb, c.emb))) DESC,
                        c.vec_id) AS rn
      FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 5) q
      JOIN (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings) c
        ON c.label <> q.label
    ) t WHERE rn <= 5
    """,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-5 most similar vectors with a DIFFERENT label —
    the near-misses that make embedding models actually learn
    boundaries (random negatives are too easy to carry gradient).

    Same plan as brute-force top-k with the label-disequality folded
    into the join predicate (the filter runs before scoring, not
    after, so the window ranks only true negatives). At corpus scale,
    swap the candidate side for the IVF/LSH shortlist and keep this
    exact label-aware re-rank on the shortlist only."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("emb")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("emb").alias("c_emb"),
    )
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("c_label") != F.col("q_label"))
        .withColumn("_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "q_id", "c_id", "q_label", "c_label",
            qround(F.col("_sim"), 6).alias("cos_sim"),
        )
    )


@query(
    "llm_class_balance",
    oracle="""
    WITH counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    ),
    t AS (SELECT MAX(n) AS max_n, CAST(SUM(n) AS DOUBLE) AS total FROM counts)
    SELECT label, n,
           FLOOR(n / t.total * 1000000.0 + 0.5) / 1000000.0 AS share,
           FLOOR(CAST(t.max_n AS DOUBLE) / n * 10000.0 + 0.5)
             / 10000.0 AS imbalance
    FROM counts, t
    """,
)
def llm_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-distribution report: per-class counts, corpus share, and
    imbalance factor (majority/this) — read before choosing class
    weights or resampling for classifier training. One hash aggregate
    plus a 1-row broadcast; the class table is tiny forever."""
    counts = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = counts.agg(
        F.max("n").alias("max_n"), F.sum("n").cast("double").alias("total")
    )
    return counts.crossJoin(F.broadcast(t)).select(
        "label",
        "n",
        qround(F.col("n") / F.col("total"), 6).alias("share"),
        qround(F.col("max_n").cast("double") / F.col("n"), 4).alias(
            "imbalance"
        ),
    )


@query(
    "llm_dedup_incremental",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 3000
    ),
    incoming AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 3000
    )
    SELECT i.doc_id
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = i.h)
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: admit only incoming documents whose
    content hash is NOT already in the existing corpus — the
    OPERATIONAL dedup shape (a crawler delta against a curated
    corpus), distinct from the batch self-dedup family: history is
    never re-deduped, only probed.

    Anti join on the md5 content digest (the cross-system digest, so
    the existing side can be a precomputed manifest from another
    engine). At 100 TB the existing-hash side is exactly the
    manifest an exact-dedup run already produces — bucket both sides
    by hash and the probe is exchange-free; a bloom filter on the
    manifest prunes the incoming scan before the join."""
    docs = load_table(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("doc_id") < 3000)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    incoming = docs.filter(F.col("doc_id") >= 3000).select(
        "doc_id", F.md5("text").alias("h")
    )
    return incoming.join(existing, "h", "left_anti").select("doc_id")


_SEMDEDUP_TAU = 0.40
_SEMDEDUP_K = 32


def semdedup_keep(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    tau: float,
    arrow_assign: bool = False,
) -> DataFrame:
    """Parameterized SemDeDup core (blocking cells at the caller's k,
    within-cell cosine ≥ tau drop rule). The registry query pins
    (k=32, τ=0.40) for the fixture; benchmarks/semdedup_probe.py
    calls this directly with k≈√n to demonstrate the paper's scaling
    lever — pair fan-out is Σ|cell|², so k MUST grow with corpus
    size or within-cell pairs re-approach O(n²)."""
    # divisor clamped to 1e-12 (identically in the oracles) so an
    # all-zero vector normalizes to the zero vector instead of an
    # ANSI DIVIDE_BY_ZERO — the llm_quantize_embeddings pattern; a
    # zero u dots 0 < tau with everything, so it is never dropped
    nrm = F.greatest(
        F.sqrt(_dot(F.col("emb"), F.col("emb"))), F.lit(1e-12)
    )
    base = (
        _arrow_cells(spark, sf_dir, k)
        if arrow_assign
        else _kmeans_cells(spark, sf_dir, k, 1)
    )
    cells = (
        base
        .join(
            load_table(spark, sf_dir, "embeddings").select(
                "vec_id", _as_double("embedding").alias("emb")
            ),
            "vec_id",
        )
        .select(
            "vec_id",
            "cluster",
            F.transform(
                F.col("emb"), lambda x: x / nrm
            ).alias("u"),
        )
        # cells feeds BOTH pair-join sides and the final anti-join;
        # without truncation the kmeans subplan re-executes three
        # times (measured ~2/3 of query wall). |vectors| rows —
        # cheap to pin, same recipe as the CC loop (llm_dedup_cluster).
        .transform(pin)
    )
    a = cells.select(
        F.col("vec_id").alias("i"),
        F.col("cluster").alias("cl"),
        F.col("u").alias("ua"),
    )
    b = cells.select(
        F.col("vec_id").alias("j"),
        F.col("cluster").alias("cl"),
        F.col("u").alias("ub"),
    )
    drops = (
        a.join(b, "cl")
        .where(F.col("i") < F.col("j"))
        .where(
            qround(_dot(F.col("ua"), F.col("ub")), 6) >= F.lit(tau)
        )
        .select(F.col("j").alias("vec_id"))
        .distinct()
    )
    return cells.join(drops, "vec_id", "left_anti").select(
        "vec_id", F.col("cluster").cast("int").alias("cluster"), "u"
    )


# CTE chain shared by llm_semdedup and llm_d4_diversify — ends at the
# ``keep`` table (SemDeDup survivors with unit vectors), mirroring
# semdedup_keep() exactly; callers append their own CTEs/SELECT. The
# norm divisor clamp matches the engine (zero vector → zero u).
_SEMDEDUP_KEEP_SQL = f"""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cluster, emb AS cent
           FROM pts WHERE vec_id < {_SEMDEDUP_K}),
    a0 AS ({_km_assign_sql("c0")}),
    c1 AS ({_km_update_sql("a0")}),
    a1 AS ({_km_assign_sql("c1")}),
    cells AS (
        SELECT a1.vec_id, a1.cluster,
               list_transform(
                   p.emb,
                   x -> x / greatest(
                       sqrt(list_dot_product(p.emb, p.emb)), 1e-12)
               ) AS u
        FROM a1 JOIN pts p ON a1.vec_id = p.vec_id
    ),
    drops AS (
        SELECT DISTINCT b.vec_id
        FROM cells a JOIN cells b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE FLOOR(list_dot_product(a.u, b.u) * 1000000.0 + 0.5)
              / 1000000.0 >= {_SEMDEDUP_TAU}
    ),
    keep AS (
        SELECT c.vec_id, CAST(c.cluster AS INT) AS cluster, c.u
        FROM cells c LEFT JOIN drops d ON c.vec_id = d.vec_id
        WHERE d.vec_id IS NULL
    )"""


@query(
    "llm_semdedup",
    oracle=materialize_ctes(_SEMDEDUP_KEEP_SQL + """
    SELECT vec_id, cluster FROM keep
    """),
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by embedding —
    k-means cells as blocking, then within-cell cosine; a vector is
    dropped when a LOWER-id vector in its cell is ≥ τ similar
    (τ=0.40, fixture-calibrated — real corpora tune per model).
    Transitive chains collapse without a connected-components pass:
    "drop if any smaller similar neighbor" keeps exactly the
    per-chain minima.

    Blocking uses the SHARED fixed-iteration k-means
    (:func:`_kmeans_cells`, same code as llm_kmeans) at k=32 with ONE
    refinement round — the paper's k≈√n regime; blocking needs cell
    stability, not converged centroids, so extra rounds only buy cost. Finer cells are the scale lever: pair
    fan-out is Σ|cell|², so k=32 costs ~64× fewer pairs than k=4
    (measured 17.5 s → sub-second at sf0.1). Vectors are L2-
    NORMALIZED ONCE before the pair join, so each candidate pair
    costs ONE sequential dot product, not three; both engines run
    the identical normalize-then-dot arithmetic and the result is
    qround'd to the 1e-6 grid BEFORE the τ compare (the cross-engine
    threshold discipline).

    100 TB shape: one shuffle on cluster for the pair join;
    everything upstream is the already-scaled kmeans plan (broadcast
    centroids, map-side assignment)."""
    return semdedup_keep(spark, sf_dir, _SEMDEDUP_K, _SEMDEDUP_TAU).select(
        "vec_id", "cluster"
    )


_D4_DROP_NUM = 1  # drop the floor(n_cell/4) most prototypical
_D4_DROP_DEN = 4


@query(
    "llm_d4_diversify",
    oracle=materialize_ctes(_SEMDEDUP_KEEP_SQL + f"""
    , proto AS (
        SELECT cluster,
               list(FLOOR(m * 1000000.0 + 0.5) / 1000000.0
                    ORDER BY pos) AS pd
        FROM (
            SELECT k.cluster, gi.i AS pos, AVG(k.u[gi.i]) AS m
            FROM keep k,
                 unnest(generate_series(1, len(k.u))) AS gi(i)
            GROUP BY k.cluster, gi.i
        ) GROUP BY cluster
    ),
    sc AS (
        SELECT k.vec_id, k.cluster,
               FLOOR(list_dot_product(k.u, p.pd) * 1000000.0 + 0.5)
                 / 1000000.0 AS proto
        FROM keep k JOIN proto p USING (cluster)
    ),
    rk AS (
        SELECT vec_id, cluster, proto,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY proto DESC, vec_id) AS r,
               COUNT(*) OVER (PARTITION BY cluster) AS nc
        FROM sc
    )
    SELECT vec_id, cluster, proto
    FROM rk WHERE {_D4_DROP_DEN} * r > {_D4_DROP_NUM} * nc
    """),
)
def llm_d4_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 diversification (Tirumala et al. 2023, arXiv:2308.12284):
    the full document-selection recipe = SemDeDup pruning followed by
    SSL-prototype pruning (Sorscher et al. 2022) — after semantic
    dedup, the examples CLOSEST to their cluster's mean direction are
    the most "prototypical" (over-represented boilerplate-like
    content) and contribute the least to data diversity, so within
    each k-means cell the top floor(n/4) by cosine-to-prototype are
    dropped and the diverse remainder kept. Composes
    :func:`semdedup_keep` (k=32, τ=0.40 — byte-identical to
    llm_semdedup's survivor set, shared code AND shared oracle CTE
    chain) with one per-cell prototype pass; VERDICT r9/r10's named
    LLM-pipeline extension.

    Cross-engine discipline: the per-cell prototype direction is the
    per-dim AVG of survivor unit vectors qround'd to the 1e-6 grid
    (the _km_update_sql centroid rule — accumulation-order drift is
    absorbed by the grid); prototypicality = sequential dot of the
    raw unit vector with the grid-valued prototype, qround'd BEFORE
    ranking; the keep rule ranks on that grid with vec_id tie-break
    (the sample_weighted_es float-ordering rule) and the cutoff
    predicate is ALL-INTEGER (4·r > n_c), so no float threshold ever
    crosses engines.

    100 TB shape: survivors are localCheckpointed once (they feed the
    prototype aggregate AND the scoring join — the multi-consumer
    rule); the prototype table is k×d metadata broadcast to the
    scoring join; ranking windows are PARTITIONED BY cell (bounded by
    cell size, k≈√n keeps cells ~√n — never a global window). Total:
    the SemDeDup plan + one keyed aggregate + one broadcast join."""
    keep = semdedup_keep(
        spark, sf_dir, _SEMDEDUP_K, _SEMDEDUP_TAU
    ).transform(pin)
    # prototype pass: posexplode + per-(cluster, pos) means, the
    # _centroid_update shape. r15 A/B (VERDICT r14 item 5) built the
    # no-Generate 64-aggregate fold, verified it against the oracle,
    # and REJECTED it on measurement: proto pass 4.22 vs 3.65 s
    # min-of-3 interleaved — see _centroid_update's docstring.
    per_dim = (
        keep.select("cluster", F.posexplode("u").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(qround(F.avg("val"), 6).alias("m"))
    )
    proto = per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("pd")
    )
    sc = keep.join(F.broadcast(proto), "cluster").select(
        "vec_id",
        "cluster",
        qround(_dot(F.col("u"), F.col("pd")), 6).alias("proto"),
    )
    w = Window.partitionBy("cluster")
    rk = sc.select(
        "vec_id",
        "cluster",
        "proto",
        F.row_number()
        .over(w.orderBy(F.col("proto").desc(), "vec_id"))
        .alias("r"),
        F.count(F.lit(1)).over(w).alias("nc"),
    )
    return rk.where(
        F.lit(_D4_DROP_DEN) * F.col("r") > F.lit(_D4_DROP_NUM) * F.col("nc")
    ).select("vec_id", "cluster", "proto")

def _arrow_cells(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """Arrow-batched k-means cell assignment — the documented scale
    path for large k (BASELINE.md SemDeDup probe: expression-form
    assignment costs n·k interpreted 64-dim lambdas and overtakes the
    pair savings past k ≈ 10²; one numpy matmul per Arrow batch does
    the same distances dense).

    Same algorithm as :func:`_kmeans_cells` with rounds=1:
    deterministic init (first k vec_ids), one centroid update
    (JVM-side keyed aggregate — that part is cheap and stays
    Catalyst), centroids qround'd to the 1e-6 grid, final assignment.
    Ties break on cluster id (centroid rows sorted by cluster, numpy
    argmin takes the first minimum — min_by struct order). FP caveat:
    matmul accumulation order differs from the sequential lambda, so
    a point EXACTLY equidistant to two centroids beyond the 1e-6
    centroid grid could flip cells vs the expression path — harmless
    for blocking, and tests pin full agreement on the fixture."""
    import numpy as np

    pts = (
        spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
        .select("vec_id", _as_double("embedding").alias("emb"))
    )

    def assign_with(cent_rows):
        cent_rows = sorted(cent_rows, key=lambda r: r[0])
        ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
        C = np.array([r[1] for r in cent_rows], dtype=np.float64)
        c2 = (C * C).sum(axis=1)

        def fn(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                X = np.array(pdf["emb"].tolist(), dtype=np.float64)
                # argmin over ||x-c||²; x² term constant per row — drop
                d2 = c2[None, :] - 2.0 * (X @ C.T)
                best = ids[np.argmin(d2, axis=1)]
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "cluster": best}
                )

        return pts.mapInPandas(fn, schema="vec_id long, cluster int")

    init = [
        (int(r["vec_id"]), list(r["emb"]))
        for r in pts.filter(F.col("vec_id") < k).collect()
    ]
    a0 = assign_with(init)
    c1 = _centroid_update(a0.join(pts, "vec_id"))
    cents = [
        (int(r["cluster"]), list(r["cent"])) for r in c1.collect()
    ]
    return assign_with(cents)


def _power_round_sql(vprev: str, out: str) -> str:
    return f"""
    s_{out} AS (
        SELECT p.vec_id, list_dot_product(p.emb, v.vec) AS s
        FROM pts p CROSS JOIN {vprev} v
    ),
    w_{out} AS (
        SELECT gi.i AS pos, SUM(p.emb[gi.i] * s.s) AS wv
        FROM pts p
        JOIN s_{out} s ON p.vec_id = s.vec_id,
        LATERAL unnest(generate_series(1, 64)) AS gi(i)
        GROUP BY gi.i
    ),
    n_{out} AS (SELECT SQRT(SUM(wv * wv)) AS nrm FROM w_{out}),
    {out} AS (
        SELECT list(FLOOR(wv / nrm * 1000000.0 + 0.5) / 1000000.0
                    ORDER BY pos) AS vec
        FROM w_{out} CROSS JOIN n_{out}
    )"""


def _top_direction(spark: SparkSession, sf_dir: str):
    """(pts, v): embeddings as double arrays + the 2-round power-
    iteration top direction as a 1-row array DataFrame. Shared by
    llm_embedding_power_iter and llm_abtt_transform so the two can
    never disagree about what "the top direction" is."""
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    v = spark.range(1).select(
        F.array(
            *[F.lit(1.0 if i == 0 else 0.0) for i in range(64)]
        ).alias("vec")
    )
    for _ in range(2):
        s = pts.crossJoin(F.broadcast(v)).select(
            "emb", _dot(F.col("emb"), F.col("vec")).alias("s")
        )
        w = (
            s.select(F.posexplode("emb").alias("pos", "val"), "s")
            .groupBy("pos")
            .agg(F.sum(F.col("val") * F.col("s")).alias("wv"))
            # w feeds BOTH the norm and the next v (two consumers):
            # un-truncated, each round's corpus-scale matvec subplan
            # re-executes once per consumer — 4 corpus scans per
            # 2-round fit instead of 2. The d-row checkpoint is the
            # r10 ladder-collapse rule's "machinery output,
            # grid-sized" case: census 12 → 2 exchanges for both
            # consumers. sf0.1 wall is FLAT (the 2k-vector fixture
            # scan is as cheap as the checkpoint job) — the halved
            # scan count is the 100 TB payoff, the census is the
            # local evidence.
            .transform(pin)
        )
        n = w.agg(F.sqrt(F.sum(F.col("wv") * F.col("wv"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(n))
            .select("pos", qround(F.col("wv") / F.col("nrm"), 6).alias("c"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda st: st["c"],
                ).alias("vec")
            )
        )
    return pts, v


@query(
    "llm_embedding_power_iter",
    oracle=f"""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
    v0 AS (SELECT list_transform(
               generate_series(1, 64),
               i -> CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END) AS vec),
    {_power_round_sql("v0", "v1")},
    {_power_round_sql("v1", "v2")}
    SELECT CAST(gi.i AS INT) AS pos, v2.vec[gi.i] AS component
    FROM v2, LATERAL unnest(generate_series(1, 64)) AS gi(i)
    """,
)
def llm_embedding_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix
    by two unrolled power-iteration rounds — the spectral primitive
    behind PCA whitening, ABTT embedding post-processing ("all but
    the top" dominant-direction removal), and spectral outlier
    screens. v ← normalize(Σ_x x·(x·v)) from the deterministic e₁
    start; fixed rounds + a qround re-quantization of the unit
    vector EVERY round make the whole thing hash-checkable (the
    graph_pagerank/llm_kmeans recipe for iterative algorithms).

    Per round: the matvec is ONE broadcast of the 64-float vector +
    a map-side dot per point, then a (pos)-keyed partial-sum
    aggregate of 64 groups — two tiny shuffles per round no matter
    how many embeddings stream through; the n×d matrix is never
    materialized or transposed. More rounds = chain more CTEs/steps;
    convergence-driven runs collect the 64-float vector per round
    driver-side (llm.py CC recipe).

    100 TB shape: identical — per-round cost is a scan + 64-row
    aggregate; the vector state is O(d), broadcast both ways."""
    pts, v = _top_direction(spark, sf_dir)
    return v.select(
        F.posexplode("vec").alias("pos0", "component")
    ).select((F.col("pos0") + 1).cast("int").alias("pos"), "component")


@query(
    "llm_abtt_transform",
    oracle=f"""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
    v0 AS (SELECT list_transform(
               generate_series(1, 64),
               i -> CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END) AS vec),
    {_power_round_sql("v0", "v1")},
    {_power_round_sql("v1", "v2")}
    SELECT p.vec_id,
           FLOOR(SQRT(list_dot_product(p.emb, p.emb)) * 10000.0 + 0.5)
             / 10000.0 AS norm_before,
           FLOOR(list_dot_product(p.emb, v.vec) * 10000.0 + 0.5)
             / 10000.0 AS projection,
           FLOOR(SQRT(GREATEST(0.0,
               list_dot_product(p.emb, p.emb)
               - list_dot_product(p.emb, v.vec)
                 * list_dot_product(p.emb, v.vec)
                 * (2.0 - list_dot_product(v.vec, v.vec))
           )) * 10000.0 + 0.5) / 10000.0 AS norm_after
    FROM pts p CROSS JOIN v2 v
    """,
)
def llm_abtt_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABTT ("all-but-the-top", Mu & Viswanath 2018) dominant-
    direction removal: project out the top principal direction
    (llm_embedding_power_iter's v, recomputed in-plan so the two
    queries can never disagree about it) from every embedding and
    report per-vector (norm_before, projection, norm_after) — the
    standard isotropy fix that measurably improves cosine-similarity
    retrieval on anisotropic embedding spaces.

    The residual norm uses the ALGEBRAIC form ‖x−s·v‖² = ‖x‖² −
    s²·(2−‖v‖²) on BOTH engines (v is qround-quantized so ‖v‖ is
    only ≈1 — the 2−‖v‖² factor keeps it exact rather than assuming
    unit norm), clamped at 0 before the sqrt; every published value
    sits on the 1e-4 qround grid.

    100 TB shape: the direction is O(d) state broadcast to a map-only
    projection pass — the transform itself adds NOTHING to the scan
    cost; the power-iteration prefix is two tiny-keyed aggregates
    (see llm_embedding_power_iter)."""
    pts, v = _top_direction(spark, sf_dir)
    xx = _dot(F.col("emb"), F.col("emb"))
    s = _dot(F.col("emb"), F.col("vec"))
    vv = _dot(F.col("vec"), F.col("vec"))
    return pts.crossJoin(F.broadcast(v)).select(
        "vec_id",
        qround(F.sqrt(xx), 4).alias("norm_before"),
        qround(s, 4).alias("projection"),
        qround(
            F.sqrt(
                F.greatest(F.lit(0.0), xx - s * s * (F.lit(2.0) - vv))
            ),
            4,
        ).alias("norm_after"),
    )


def _poly_lsh_sql_ctes(where: str = "") -> str:
    """The t/g/h/perm/sig/bands CTE chain, optionally sliced (the
    llm_lsh_pr_eval doc_id < 200 eval slice) — ONE text for every
    consumer so the witness pipeline and its evaluation can never
    hash differently."""
    return f"""
    t AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents
          {where}),
    g AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 2),
                   i -> array_to_string(tk[i:i+2], ' '))) AS gram
        FROM t WHERE len(tk) >= 3
    ),
    h AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(gram)),
                           i -> CAST(ascii(substr(gram, i, 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000003) AS ph
        FROM g
    ),
    perm(i, a, b) AS (VALUES {", ".join(
        f"({i}, CAST({2 * i * 1_000_003 + 1} AS BIGINT),"
        f" CAST({i * 998_244_353 + 12_345} AS BIGINT))"
        for i in range(4)
    )}),
    sig AS (
        SELECT h.doc_id, p.i, MIN((p.a * h.ph + p.b) % 2147483647) AS m
        FROM h CROSS JOIN perm p GROUP BY h.doc_id, p.i
    ),
    bands AS (
        SELECT doc_id, i // 2 AS band,
               MIN(CASE WHEN i % 2 = 0 THEN m END) AS b_lo,
               MIN(CASE WHEN i % 2 = 1 THEN m END) AS b_hi
        FROM sig GROUP BY doc_id, i // 2
    )
"""


_POLY_LSH_SQL_CTES = _poly_lsh_sql_ctes()


def _poly_minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, b_lo, b_hi) for the cross-engine poly-hash
    MinHash-LSH pipeline: 3-word shingles → Horner poly_hash → 4
    universal-hash permutation minima → 2 bands of 2. The shared core
    of llm_minhash_verifiable (candidate pairs) and
    llm_dedup_band_stats (bucket capacity census) — DuckDB replays it
    as ``_POLY_LSH_SQL_CTES``."""
    return _poly_minhash_bands_from_hashes(_poly_gram_hashes(docs))


def _poly_gram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, ph): distinct 3-word shingles Horner-hashed — the
    witness pipeline's set representation, shared by the banding and
    llm_lsh_pr_eval's exact-Jaccard ground truth (hash collisions
    merge set elements identically in both consumers)."""
    from etl_geonames_spark.operators.curation import poly_hash

    grams = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .select("doc_id", F.explode(_shingles("tk", 3)).alias("gram"))
        .distinct()
    )
    return grams.select("doc_id", poly_hash(F.col("gram")).alias("ph"))


def _poly_minhash_bands_from_hashes(h: DataFrame) -> DataFrame:
    """Band table from a prebuilt (doc_id, ph) gram-hash table — split
    out so llm_minhash_jaccard_est can share one checkpointed hash
    table between its banding and its 8-perm signature stages."""
    perms = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(2 * i * 1_000_003 + 1).cast("long").alias("a"),
                F.lit(i * 998_244_353 + 12_345).cast("long").alias("b"),
            )
            for i in range(4)
        ]
    )
    sig = (
        h.select("doc_id", "ph", F.explode(perms).alias("p"))
        .select(
            "doc_id",
            F.col("p.i").alias("i"),
            (
                (F.col("p.a") * F.col("ph") + F.col("p.b")) % 2147483647
            ).alias("v"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("v").alias("m"))
    )
    return sig.groupBy(
        "doc_id", (F.col("i") / 2).cast("int").alias("band")
    ).agg(
        F.min(F.when(F.col("i") % 2 == 0, F.col("m"))).alias("b_lo"),
        F.min(F.when(F.col("i") % 2 == 1, F.col("m"))).alias("b_hi"),
    )


@query(
    "llm_dedup_band_stats",
    oracle=f"""
    WITH {_POLY_LSH_SQL_CTES},
    buckets AS (
        SELECT band, b_lo, b_hi, CAST(COUNT(*) AS BIGINT) AS sz
        FROM bands GROUP BY band, b_lo, b_hi
    )
    SELECT CAST(band AS INT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_colliding_buckets,
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS n_candidate_pairs
    FROM buckets GROUP BY band
    """,
)
def llm_dedup_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH capacity census per band: bucket count, the LARGEST bucket,
    colliding-bucket count, and Σ sz·(sz−1)/2 — the exact number of
    candidate pairs each band will emit. This is the query an operator
    runs BEFORE the dedup join at 100 TB: candidate volume (the
    verify stage's bill) and max_bucket (the skew hazard — one
    boilerplate-heavy bucket of a million docs is a 5·10¹¹-pair
    reducer) are both visible from a bands-table aggregate that costs
    two hash aggregates, no pair is ever materialized. The production
    response to a hot bucket — drop it (boilerplate by definition) or
    split on an extra signature word — keys off exactly this output.

    Same poly-hash pipeline as llm_minhash_verifiable
    (:func:`_poly_minhash_bands`), so the census itself is value-hash
    checked against DuckDB replaying every intermediate."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _poly_minhash_bands(spread(docs, "doc_id"))
    buckets = bands.groupBy("band", "b_lo", "b_hi").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return buckets.groupBy(F.col("band").cast("int").alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("sz").cast("long").alias("max_bucket"),
        F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_colliding_buckets"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
        .cast("long")
        .alias("n_candidate_pairs"),
    )


@query(
    "llm_minhash_jaccard_est",
    oracle=f"""
    WITH {_POLY_LSH_SQL_CTES},
    perm8(i, a, b) AS (VALUES {", ".join(
        f"({i}, CAST({2 * i * 1_000_003 + 1} AS BIGINT),"
        f" CAST({i * 998_244_353 + 12_345} AS BIGINT))"
        for i in range(8)
    )}),
    sig8 AS (
        SELECT h.doc_id, p.i, MIN((p.a * h.ph + p.b) % 2147483647) AS m
        FROM h CROSS JOIN perm8 p GROUP BY h.doc_id, p.i
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.b_lo = b.b_lo AND a.b_hi = b.b_hi
         AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match,
           {sql_qround(
               'SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / 8.0', 6)}
               AS est_jaccard
    FROM cand c
    JOIN sig8 sa ON sa.doc_id = c.doc_a
    JOIN sig8 sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
    """,
)
def llm_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATION on the LSH candidates: each
    candidate pair's similarity is estimated as the fraction of 8
    permutations whose min-hashes agree (E[match] = J, the MinHash
    property — Broder 1997), WITHOUT touching the shingle sets again.
    This is the cheap middle tier of the dedup funnel at 100 TB:
    LSH banding prices candidates, THIS estimate triages them
    (est ≥ 0.8 → near-certain dup, skip the exact verify; borderline
    → exact bigram Jaccard on the pair), and only the borderline
    slice pays the set-intersection cost llm_dedup_verified models.

    Signatures are k=8 poly-hash permutation minima (one hash
    aggregate over the gram table, 8 longs per doc on the wire);
    the pair estimate is an equi-join of two 8-row signature slices
    per candidate — never the corpus. Every min, band, and match
    count is exact integer arithmetic replayed by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    from etl_geonames_spark.operators.curation import poly_hash

    grams = (
        spread(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("tk"))
        .select("doc_id", F.explode(_shingles("tk", 3)).alias("gram"))
        .distinct()
    )
    h = grams.select(
        "doc_id", poly_hash(F.col("gram")).alias("ph")
    ).transform(pin)
    perms8 = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(2 * i * 1_000_003 + 1).cast("long").alias("a"),
                F.lit(i * 998_244_353 + 12_345).cast("long").alias("b"),
            )
            for i in range(8)
        ]
    )
    sig8 = (
        h.select("doc_id", "ph", F.explode(perms8).alias("p"))
        .select(
            "doc_id",
            F.col("p.i").alias("i"),
            (
                (F.col("p.a") * F.col("ph") + F.col("p.b")) % 2147483647
            ).alias("v"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("v").alias("m"))
        .transform(pin)
    )
    bands = _poly_minhash_bands_from_hashes(h)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.b_lo") == F.col("b.b_lo"))
            & (F.col("a.b_hi") == F.col("b.b_hi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sig8.select(
        F.col("doc_id").alias("da"), F.col("i").alias("ia"),
        F.col("m").alias("ma"),
    )
    sb = sig8.select(
        F.col("doc_id").alias("db"), F.col("i").alias("ib"),
        F.col("m").alias("mb"),
    )
    return (
        cand.join(sa, F.col("doc_a") == F.col("da"))
        .join(
            sb,
            (F.col("doc_b") == F.col("db")) & (F.col("ib") == F.col("ia")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0))
            .cast("long")
            .alias("n_match"),
            qround(
                F.sum(
                    F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)
                )
                / 8.0,
                6,
            ).alias("est_jaccard"),
        )
    )


@query(
    "llm_minhash_verifiable",
    oracle=f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
    g AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 2),
                   i -> array_to_string(tk[i:i+2], ' '))) AS gram
        FROM t WHERE len(tk) >= 3
    ),
    h AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(gram)),
                           i -> CAST(ascii(substr(gram, i, 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000003) AS ph
        FROM g
    ),
    perm(i, a, b) AS (VALUES {", ".join(
        f"({i}, CAST({2 * i * 1_000_003 + 1} AS BIGINT),"
        f" CAST({i * 998_244_353 + 12_345} AS BIGINT))"
        for i in range(4)
    )}),
    sig AS (
        SELECT h.doc_id, p.i, MIN((p.a * h.ph + p.b) % 2147483647) AS m
        FROM h CROSS JOIN perm p GROUP BY h.doc_id, p.i
    ),
    bands AS (
        SELECT doc_id, i // 2 AS band,
               MIN(CASE WHEN i % 2 = 0 THEN m END) AS b_lo,
               MIN(CASE WHEN i % 2 = 1 THEN m END) AS b_hi
        FROM sig GROUP BY doc_id, i // 2
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.b_lo = b.b_lo AND a.b_hi = b.b_hi
     AND a.doc_id < b.doc_id
    """,
)
def llm_minhash_verifiable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH candidate pipeline END-TO-END under a full
    value-hash oracle — the hash-checked WITNESS for the production
    dedup family (llm_dedup_minhash), whose xxhash64 base hash DuckDB
    cannot replay and which is therefore rows-only + recall-pinned.
    This twin swaps the base hash for the cross-engine Horner
    polynomial (:func:`curation.poly_hash` arithmetic) and shrinks to
    3-word shingles / 4 permutations / 2 bands so every
    intermediate — shingle set, signature matrix, band buckets,
    candidate pairs — is reproduced exactly by SQL: if the LSH
    plumbing (banding, min-reduction, bucket join) had a bug, THIS
    query's hash would break, not just a recall statistic.

    Same physical shape as the production path: distinct shingles →
    map-side hash → one (doc, perm)-keyed min aggregate → banded
    equi-join on (band, sig) — candidates only ever meet through
    bucket equality, never an all-pairs product.

    100 TB: use llm_dedup_minhash (xxhash64 is cheaper than the
    polynomial fold and 16 perms beat 4); this query exists so the
    ALGORITHM is verifiable, and it scales identically."""
    docs = load_table(spark, sf_dir, "documents")
    # shared band construction (_poly_minhash_bands): one source of
    # truth for the perm constants and banding used by this witness,
    # llm_dedup_band_stats, and llm_minhash_jaccard_est
    bands = _poly_minhash_bands(spread(docs, "doc_id"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.b_lo") == F.col("b.b_lo"))
            & (F.col("a.b_hi") == F.col("b.b_hi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


@query(
    "llm_simhash_verifiable",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(str_split(text, ' '), w -> w <> '')) AS tok
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(tok)),
                           i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000003) AS ph
        FROM toks
    ),
    bits AS (
        SELECT doc_id, gb.b AS b,
               SUM(((((2 * (gb.b // 16) * 1000003 + 1) * ph
                      + (gb.b // 16) * 998244353 + 12345) % 2147483647
                     >> (gb.b % 16)) & 1) * 2 - 1) AS s
        FROM h, LATERAL unnest(generate_series(0, 63)) AS gb(b)
        GROUP BY doc_id, gb.b
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s <= 0 THEN 0
                             WHEN b = 63
                               THEN CAST(-9223372036854775807 AS BIGINT) - 1
                             ELSE CAST(1 AS BIGINT) << b
                        END) AS BIGINT) AS sig
        FROM bits GROUP BY doc_id
    ),
    chunks AS (
        SELECT doc_id, sig, gc.c AS chunk_idx,
               (sig >> (16 * gc.c)) & 65535 AS chunk_val
        FROM sig, LATERAL unnest(generate_series(0, 3)) AS gc(c)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def llm_simhash_verifiable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash near-dup pipeline END-TO-END under a full
    value-hash oracle — the hash-checked WITNESS for
    ``llm_dedup_simhash``, whose xxhash64 token hash DuckDB cannot
    replay (that one stays rows-only + recall-pinned). Same algorithm,
    cross-engine arithmetic: Horner poly_hash per token
    (:func:`curation.poly_hash`) widened to a 64-BIT signature by
    FOUR universal-hash permutations (bits 16j..16j+15 come from
    ((2j·1000003+1)·ph + j·998244353 + 12345) mod 2³¹−1 — one 20-bit
    base hash alone can't feed 64 independent sign sums), token
    multiplicity kept exactly as the production signature, the packed
    signature banded into 4×16-BIT chunks — PRODUCTION GEOMETRY —
    candidates share ≥1 exact chunk (pigeonhole-COMPLETE for
    hamming ≤ 3, the emitted filter), and the hamming distance itself
    is in the hashed output. A bug in bit-packing, banding, or the
    candidate join breaks this query's value hash, not just a recall
    statistic.

    Chunk width IS the join's scale knob, and the scale probe
    enforced it twice: 4-bit chunks (16 bucket values) went quadratic
    at 5k docs (5.9 s at sf0.1); 8-bit chunks fixed sf0.1 but
    collided into mega-buckets on the 50k adversarial dup-clique
    corpus (38M pairs, 53 s, vs the 64-bit production signature's
    3.8M). 16-bit chunks give 65536 values per band — the production
    curve. Same physical shape as production: explode tokens → ONE
    map-side-combined hash aggregate (64 conditional sums) → chunk
    equi-join —
    candidates only meet through bucket equality, never all-pairs.
    100 TB: use llm_dedup_simhash (64-bit xxhash signature); this
    twin exists so the algorithm is verifiable and scales identically.
    """
    from etl_geonames_spark.operators.curation import poly_hash

    docs = load_table(spark, sf_dir, "documents")
    tokh = (
        spread(docs, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", poly_hash(F.col("tok")).alias("ph"))
        .select(
            "doc_id",
            *[
                (
                    (
                        F.lit(2 * j * 1_000_003 + 1).cast("long")
                        * F.col("ph")
                        + F.lit(j * 998_244_353 + 12_345)
                    )
                    % 2147483647
                ).alias(f"ph{j}")
                for j in range(4)
            ],
        )
    )
    bit = lambda b: (  # noqa: E731
        F.shiftrightunsigned(F.col(f"ph{b // 16}"), b % 16).bitwiseAND(1)
        * 2
        - 1
    )
    sums = tokh.groupBy("doc_id").agg(
        *[F.sum(bit(b)).alias(f"s{b}") for b in range(64)]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    signed = sums.select("doc_id", sig.alias("sig"))
    chunk = lambda i: (  # noqa: E731
        F.shiftrightunsigned(F.col("sig"), 16 * i).bitwiseAND(65535)
    )
    chunks = signed.select(
        "doc_id",
        "sig",
        F.posexplode(F.array(*[chunk(i) for i in range(4)])).alias(
            "chunk_idx", "chunk_val"
        ),
        # pin once: both self-join roles consume this and the
        # 64-conditional-sum signature aggregate otherwise runs twice
        # (r14 plan audit — exchange reuse does not fire here)
    ).transform(pin)
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )


_LSHV_PLANES = 8
_LSHV_SCALE = 1000


def _quantized_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q): embeddings snapped to the shared 1e-3 integer grid
    (floor-form round) — THE grid every all-integer witness op
    computes on (llm_ann_lsh_verifiable / llm_ann_ivf_verifiable /
    llm_ann_recall_eval / llm_pq_quantize). One definition so a grid
    change cannot silently desynchronize the recall eval from the
    pipelines it scores; the SQL twin lives in _LSHV_SQL_CTES's
    ``e`` CTE and the per-op oracles."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") * _LSHV_SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("q"),
    )

# The LSH-witness pipeline as reusable CTEs: quantize → integer plane
# dots → packed sign bucket → bucket-join candidates → top-10 (lsht).
# Shared by llm_ann_lsh_verifiable's oracle and llm_ann_recall_eval's
# (which compares lsht against the exact brute-force top-10).
_LSHV_SQL_CTES = f"""
    e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {_LSHV_SCALE}.0 + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings
    ),
    dots AS (
        SELECT vec_id, q, gm.m AS m,
               list_sum(list_transform(generate_series(1, len(q)),
                   i -> q[i] * (((i - 1) * 31 + gm.m * 17 + 7) % 101 - 50)))
                   AS dot
        FROM e, LATERAL unnest(generate_series(0, {_LSHV_PLANES - 1}))
                  AS gm(m)
    ),
    b AS (
        SELECT vec_id, ANY_VALUE(q) AS q,
               CAST(SUM(CASE WHEN dot >= 0 THEN 1 << m ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id
    ),
    cand AS (
        SELECT s.vec_id AS q_id, c.vec_id AS c_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(s.q)), i -> s.q[i] * c.q[i]))
                   AS BIGINT) AS qdot
        FROM b s JOIN b c
          ON s.bucket = c.bucket AND c.vec_id <> s.vec_id
        WHERE s.vec_id < 5
    ),
    lsht AS (
        SELECT q_id, c_id, qdot FROM (
            SELECT q_id, c_id, qdot,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY qdot DESC, c_id) AS rn
            FROM cand
        ) t WHERE rn <= 10
    )"""


@query(
    "llm_ann_lsh_verifiable",
    oracle=f"""
    WITH {_LSHV_SQL_CTES}
    SELECT q_id, c_id, qdot FROM lsht
    """,
)
def llm_ann_lsh_verifiable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN END-TO-END under a full value-hash
    oracle — the hash-checked WITNESS for ``llm_ann_lsh``, whose
    float hyperplane dots could diverge between engines at the sign
    boundary (that one stays rows-only + recall-pinned). ALL-INTEGER
    arithmetic: embeddings quantize to a 1e-3 grid (floor-form, the
    qround discipline), hyperplane m weights are the deterministic
    integers ((d·31+m·17+7) mod 101) − 50, the 8 sign bits pack into
    an integer bucket, candidates share the full bucket, and the
    re-rank key is the exact integer dot product of the quantized
    vectors — every intermediate is replayed exactly by SQL, so a
    bucketing or ranking bug breaks the hash.

    Same physical shape as production: map-only signature compute,
    broadcastable query side, hash-partitioned bucket equi-join,
    per-query top-10 window over candidates only (never the corpus).
    """
    emb = _quantized_emb(spark, sf_dir)
    def _plane_term(m: int):
        # closure factory: a `lambda x, i, m=m` default-arg capture
        # reads as a 3-parameter lambda to Spark's HOF binder
        return lambda x, i: x * (
            (i * 31 + F.lit(m * 17 + 7)) % 101 - 50
        ).cast("long")

    bucket = F.lit(0).cast("long")
    for m in range(_LSHV_PLANES):
        dot = F.aggregate(
            F.transform(F.col("q"), _plane_term(m)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            dot >= 0, F.lit(1 << m).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    bucketed = emb.select("vec_id", "q", bucket.alias("bucket"))
    q = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("q").alias("qq"),
        F.col("bucket").alias("q_bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"),
        F.col("q").alias("cq"),
        F.col("bucket").alias("c_bucket"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("qdot").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("c_id") != F.col("q_id")),
        )
        .withColumn("qdot", qdot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id", "qdot")
    )


@query(
    "llm_ann_ivf_verifiable",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {_LSHV_SCALE}.0 + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings
    ),
    cb AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < {_IVF_CELLS}),
    d2 AS (
        SELECT e.vec_id, e.q, cb.cid,
               CAST(list_sum(list_transform(
                   generate_series(1, len(e.q)),
                   i -> (e.q[i] - cb.cq[i]) * (e.q[i] - cb.cq[i])))
                   AS BIGINT) AS dist2
        FROM e JOIN cb ON TRUE
    ),
    ranked AS (
        SELECT vec_id, q, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, cid) AS rnk
        FROM d2
    ),
    assigned AS (SELECT vec_id, q, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
        SELECT vec_id AS q_id, q AS qq, cid AS cell
        FROM ranked WHERE vec_id < 5 AND rnk <= {_IVF_NPROBE}
    ),
    cand AS (
        SELECT p.q_id, a.vec_id AS c_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(p.qq)), i -> p.qq[i] * a.q[i]))
                   AS BIGINT) AS qdot
        FROM probes p JOIN assigned a ON a.cell = p.cell
        WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, c_id, qdot FROM (
        SELECT q_id, c_id, qdot,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY qdot DESC, c_id) AS rn
        FROM cand
    ) t WHERE rn <= 10
    """,
)
def llm_ann_ivf_verifiable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN END-TO-END under a full value-hash oracle —
    the hash-checked WITNESS for ``llm_ann_ivf`` (which stays
    rows-only + recall-pinned because its float cosine cell
    assignment can diverge between engines at argmin boundaries),
    completing the witness program: every ANN pipeline now has an
    exactly-verifiable twin. ALL-INTEGER arithmetic end to end:
    embeddings quantize to the 1e-3 grid (the llm_ann_lsh_verifiable
    discipline), the codebook is the 16 lowest-id vectors (_IVF_CELLS),
    coarse assignment is argmin of the exact integer squared L2
    distance (ties broken on centroid id — no float boundary
    anywhere), queries probe their 2 nearest cells (_IVF_NPROBE), and
    the re-rank key is the exact integer dot product.

    Same physical shape as the production op: the codebook is
    metadata-sized and rides a broadcast; assignment is a map-side
    broadcast join + array-lambda fold (no shuffle of the corpus by
    anything but its cell at candidate time); the candidate join is a
    hash equi-join on cell id; the top-10 window partitions by q_id
    over candidates only. Overflow audit: grid values ≲ 10³·|x|,
    so per-dim (Δq)² ≲ 4·10⁶ and a d-dim sum stays far inside int64.
    """
    emb = _quantized_emb(spark, sf_dir)
    codebook = emb.filter(F.col("vec_id") < _IVF_CELLS).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        ).alias("cents")
    )

    def int_d2(vec, cent):
        return F.aggregate(
            F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def cell_ranking(vec):
        # array<struct<dist2,cid>> sorted ascending — lexicographic
        # struct order is exact-integer distance then cid tie-break
        return F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    int_d2(vec, c["cq"]).alias("dist2"),
                    c["cid"].alias("cid"),
                ),
            )
        )

    assigned = emb.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "q", cell_ranking(F.col("q"))[0]["cid"].alias("cell")
    )
    q = (
        emb.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(codebook))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("q").alias("qq"),
            F.explode(
                F.slice(
                    F.transform(
                        cell_ranking(F.col("q")), lambda s: s["cid"]
                    ),
                    1,
                    _IVF_NPROBE,
                )
            ).alias("cell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("c_id"), F.col("q").alias("cq"), "cell"
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("qdot").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, ["cell"])
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("qdot", qdot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id", "qdot")
    )


_LSG_LENGTHS = [4, 8, 16]
_LSG_DF_CAP = 16


def _lsg_pairs_sql(L: int) -> str:
    """One gram length's CTEs for llm_longest_shared_gram: distinct
    (doc, gram) table → boilerplate df-cap → blocked self-join →
    per-pair shared-gram count."""
    return f"""
    g{L} AS (
      SELECT DISTINCT doc_id,
             array_to_string(tk[s.i:s.i + {L - 1}], ' ') AS g
      FROM t, LATERAL unnest(generate_series(1, len(tk) - {L - 1}))
                AS s(i)
      WHERE len(tk) >= {L}
    ),
    ok{L} AS (
      SELECT g FROM (SELECT g, COUNT(*) AS c FROM g{L} GROUP BY g) q
      WHERE c <= {_LSG_DF_CAP}
    ),
    p{L} AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({L} AS BIGINT) AS l,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM g{L} a
      JOIN ok{L} o ON a.g = o.g
      JOIN g{L} b ON b.g = a.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


@query(
    "llm_longest_shared_gram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents
    ),
    {",".join(_lsg_pairs_sql(L) for L in _LSG_LENGTHS)},
    u AS ({" UNION ALL ".join(f"SELECT * FROM p{L}" for L in _LSG_LENGTHS)})
    SELECT doc_a, doc_b, l AS longest_l, n_shared FROM (
      SELECT doc_a, doc_b, l, n_shared,
             ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
                                ORDER BY l DESC) AS rn
      FROM u
    ) r WHERE rn = 1
    """,
)
def llm_longest_shared_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubling-probe approximation of exact-substring dedup (the Lee
    et al. 2022 suffix-array primitive VERDICT r4 named as the one
    dedup shape with no counterpart): for gram lengths 4/8/16 tokens,
    find document pairs sharing at least one exact token n-gram, and
    report per pair the LONGEST probed length that still matches plus
    the count of distinct shared grams at that length — a bucketed
    lower bound on the true longest-shared-substring length (shared
    substring of k tokens ⟹ shared ⌊k/2⌋-gram, so doubling lengths
    lose at most a factor 2). A true distributed suffix array would
    give the exact length; this form needs only the repo's standard
    blocked machinery.

    Scale shape (r14): ONE length-tagged distinct (doc, l, gram)
    table — the three probed lengths share a single shingle explode
    pass instead of re-running the tokenize+shingle build once per
    length per consumer (the pre-r14 form executed the explode 4×
    per length = 12 length-units; exchange reuse never fired across
    the df-census/join roles — r14 plan audit). The boilerplate
    df-cap is a gram-partitioned window COUNT (bounded by a gram's
    doc frequency, never global), so the survivor build is a single
    explode + shuffle chain per pair-join role — UNPINNED since r15
    (measured: re-running the chain per role beats checkpointing the
    corpus-sized string-gram table; at 100 TB persist it to
    disk-backed columnar storage between stages instead, ADVICE
    r14). The cap drops (l, gram)s in
    > 16 docs (_LSG_DF_CAP; caps any gram's pair bill at C(16,2) AND
    removes template text that isn't dup signal — same discipline as
    llm_boilerplate_ngrams); the pair meet is one (l, gram)
    equi-join — the shuffle carries gram groups, never corpus². The
    final longest-length pick is a per-pair window over the ≤ 3
    length rows of that pair.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        # ONE fixture file → one input partition; the shingle explode
        # is the compute-bound stage, so spread it first (hash layout
        # can't alter the all-integer results). Single consumer since
        # the r14 tagged-explode rewrite (gd is the only reader) — no
        # pin needed.
        spread(docs, "doc_id")
        .select(
            "doc_id",
            F.filter(
                F.split("text", " "), lambda w: w != F.lit("")
            ).alias("toks"),
        )
    )
    def _tag(L):
        # closure factory, NOT a default-arg lambda — HOF lambdas
        # count default args as parameters (NUM_ARGS_MISMATCH)
        return lambda g: F.struct(
            F.lit(L).cast("long").alias("l"), g.alias("g")
        )

    tagged = F.flatten(
        F.array(
            *[
                F.transform(F.array_distinct(_shingles("toks", L)), _tag(L))
                for L in _LSG_LENGTHS
            ]
        )
    )
    gd = toks.select(
        "doc_id", F.explode(tagged).alias("lg")
    ).select("doc_id", F.col("lg.l").alias("l"), F.col("lg.g").alias("g"))
    # df census as a gram-partitioned window COUNT (bounded by any
    # gram's doc frequency, never global) — single-consumer chain, so
    # the survivor table is ONE explode + ONE shuffle, pinned once for
    # the two pair-join roles
    surv = (
        gd.withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("l", "g")),
        )
        .filter(F.col("df") <= _LSG_DF_CAP)
        .select("doc_id", "l", "g")
        # UNPINNED by measurement (r15 pin A/B, min-of-6 interleaved:
        # none 1.32 / lazy 1.94 / eager 2.21 s): both pair-join roles
        # re-run the explode+window, but serializing the corpus-sized
        # string-gram table into checkpoint storage costs MORE than
        # the second pass — the pin threshold is bytes-vs-recompute,
        # and wide string payloads sit on the recompute side. The
        # 100 TB form Lee et al.-style runs persist this table to
        # disk-backed columnar storage between stages (ADVICE r14);
        # that is a storage-format decision, not a localCheckpoint.
    )
    a = surv.select(F.col("doc_id").alias("doc_a"), "l", "g")
    b = surv.select(F.col("doc_id").alias("doc_b"), "l", "g")
    u = (
        a.join(b, ["l", "g"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "l")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    w = Window.partitionBy("doc_a", "doc_b").orderBy(F.col("l").desc())
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_a", "doc_b", F.col("l").alias("longest_l"), "n_shared"
        )
    )


@query(
    "llm_cross_source_dup_matrix",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
             md5(array_to_string(
                 (list_filter(str_split(text, ' '), w -> w <> ''))[1:8],
                 ' ')) AS h,
             source
      FROM documents
      WHERE len(list_filter(str_split(text, ' '), w -> w <> '')) >= 1
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_prefixes
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def llm_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard duplication matrix: for every source pair, how many
    distinct 8-token PREFIX fingerprints they share — the
    which-shards-overlap diagnostic run before assembling a training
    mix (two crawls of the same site show up as a hot cell; the
    full-text variant of the same query returns empty on any
    already-exact-deduped corpus, so the prefix form is the one that
    stays informative — prefix collisions are exactly the
    template/boilerplate overlap a mix designer needs to see).
    Empty documents are excluded: their prefix is '' and would
    fabricate an all-pairs overlap.

    Scale shape: corpus → distinct (fingerprint, source) — at most
    |sources| rows per fingerprint survive the distinct — then a
    fingerprint equi-join and a ≤ |sources|²-cell aggregate. The
    shuffle carries fingerprint groups; the df-explosion guard of the
    gram ops is unnecessary because the distinct caps any
    fingerprint's contribution at C(|sources|, 2) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    h = (
        docs.select(
            F.md5(F.array_join(F.slice(tk, 1, 8), " ")).alias("h"),
            "source",
        )
        .filter(F.size(tk) >= 1)
        .distinct()
    )
    a = h.select(F.col("h").alias("hh"), F.col("source").alias("source_a"))
    b = h.select(F.col("h").alias("hh"), F.col("source").alias("source_b"))
    return (
        a.join(b, "hh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_prefixes"))
    )


@query(
    "llm_ann_recall_eval",
    oracle=f"""
    WITH {_LSHV_SQL_CTES},
    bf AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(q.q)), i -> q.q[i] * c.q[i]))
                   AS BIGINT) AS qdot
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ),
    bft AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY qdot DESC, c_id) AS rn
            FROM bf
        ) t WHERE rn <= 10
    ),
    ex AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact
           FROM bft GROUP BY q_id),
    ls AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_lsh
           FROM lsht GROUP BY q_id),
    hit AS (
        SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM bft b JOIN lsht l ON l.q_id = b.q_id AND l.c_id = b.c_id
        GROUP BY b.q_id
    )
    SELECT ex.q_id, ex.n_exact,
           COALESCE(ls.n_lsh, 0) AS n_lsh,
           COALESCE(hit.n_hit, 0) AS n_hit,
           CAST(COALESCE(hit.n_hit, 0) AS DOUBLE)
             / CAST(ex.n_exact AS DOUBLE) AS recall_at_10
    FROM ex
    LEFT JOIN ls ON ls.q_id = ex.q_id
    LEFT JOIN hit ON hit.q_id = ex.q_id
    """,
)
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LSH ANN pipeline against exact brute force —
    the eval op that closes the ANN loop the way llm_ndcg_eval closes
    retrieval: per query, the witness pipeline's top-10
    (llm_ann_lsh_verifiable, called directly — the eval can never
    drift from the pipeline it scores) is intersected with the true
    integer-dot top-10 over ALL candidates on the same quantized
    grid. Everything is integer until the final ratio, so the hash
    pins the actual hit sets, not a rounded score; n_exact ≥ 1
    whenever a query row exists, so the ANSI divide cannot throw.

    This is the production acceptance gate for ANN parameter changes
    (planes/bands/probe counts): brute force on a sampled query set
    vs the candidate pipeline at full speed. Scale shape: the ≤ 5-row
    query side broadcasts into a map-side dot scan (exact side); the
    LSH side is the witness's bucket equi-join; the compare joins are
    ≤ 10·|q|-row tables."""
    emb = _quantized_emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qq")
    )
    cs = emb.select(F.col("vec_id").alias("c_id"), F.col("q").alias("cq"))
    qdot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("qdot").desc(), F.col("c_id")
    )
    bft = (
        F.broadcast(qs)
        .join(cs, F.col("c_id") != F.col("q_id"))
        .withColumn("qdot", qdot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id")
    )
    lsht = llm_ann_lsh_verifiable(spark, sf_dir).select("q_id", "c_id")
    ex = bft.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    ls = lsht.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lsh")
    )
    hit = (
        bft.join(lsht, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        ex.join(ls, "q_id", "left")
        .join(hit, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce(F.col("n_lsh"), F.lit(0).cast("long")).alias(
                "n_lsh"
            ),
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias(
                "n_hit"
            ),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall_at_10"),
        )
    )


_PQ_M = 4  # number of subspaces
_PQ_SEEDS = 8  # codebook size per subspace (lowest-id vectors)

# shared oracle CTE block: quantized embeddings (e), the seed codebook
# (cb), and the per-(vector, subspace, codeword) integer squared
# distances (sub) — used by BOTH llm_pq_quantize and llm_pq_search_adc
# so the index builder and the searcher cannot drift apart
_PQ_SQL_CTES = f"""e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {_LSHV_SCALE}.0 + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings
    ),
    cb AS (SELECT vec_id AS cid, q AS cq FROM e
           WHERE vec_id < {_PQ_SEEDS}),
    sub AS (
        SELECT e.vec_id, gm.m, cb.cid,
               COALESCE(list_sum(list_transform(
                   generate_series(
                       gm.m * ((len(e.q) + {_PQ_M - 1}) // {_PQ_M}) + 1,
                       least((gm.m + 1)
                             * ((len(e.q) + {_PQ_M - 1}) // {_PQ_M}),
                             len(e.q))),
                   i -> (e.q[i] - cb.cq[i]) * (e.q[i] - cb.cq[i]))),
                   0) AS d2
        FROM e,
             LATERAL unnest(generate_series(0, {_PQ_M - 1})) AS gm(m),
             cb
    )"""


@query(
    "llm_pq_quantize",
    oracle=f"""
    WITH {_PQ_SQL_CTES},
    chosen AS (
        SELECT vec_id, m, cid, d2 FROM (
            SELECT vec_id, m, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, cid) AS rn
            FROM sub
        ) t WHERE rn = 1
    )
    SELECT vec_id,
           string_agg(CAST(cid AS VARCHAR), ',' ORDER BY m) AS pq_code,
           CAST(SUM(d2) AS BIGINT) AS recon_err
    FROM chosen GROUP BY vec_id
    """,
)
def llm_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011) of the embedding
    column: each vector splits into 4 contiguous subvectors (_PQ_M),
    each subvector snaps to its nearest codeword from a per-subspace
    codebook (here the 8 lowest-id vectors' subvectors (_PQ_SEEDS) —
    the deterministic seed-codebook convention of llm_ann_ivf;
    production trains per-subspace k-means offline and broadcasts
    identically), and the vector is stored as 4 small codes
    plus nothing else — the memory layout that makes billion-vector
    ANN feasible (a 64-dim float vector collapses to 4 bytes;
    asymmetric distance then needs only 4 table lookups). The
    reported recon_err (total integer squared error to the chosen
    codewords) is the quantization-quality metric that sizes the
    codebook.

    Witness discipline throughout: the 1e-3 quantized grid, integer
    squared L2 per subspace, argmin ties to the smallest codeword id
    — no float boundary anywhere, full value hash (the PQ sibling of
    llm_ann_ivf_verifiable). Scale shape: the codebook rides one
    broadcast; assignment is map-only array lambdas over the scan;
    the output is one row per vector with no shuffle at all."""
    emb = _quantized_emb(spark, sf_dir)
    codebook = emb.filter(F.col("vec_id") < _PQ_SEEDS).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        ).alias("cents")
    )
    rows = emb.crossJoin(F.broadcast(codebook))
    sub_len = (F.size(F.col("q")) + (_PQ_M - 1)) / _PQ_M
    sub_len = sub_len.cast("int")
    code_cols, err_cols = [], []
    for m in range(_PQ_M):
        start = F.lit(m) * sub_len + 1
        length = F.least(
            F.lit(m + 1) * sub_len, F.size(F.col("q"))
        ) - F.lit(m) * sub_len
        sub_q = F.slice(F.col("q"), start, F.greatest(length, F.lit(0)))

        def sub_d2(c, start=start, length=length):
            cs = F.slice(c["cq"], start, F.greatest(length, F.lit(0)))
            return F.aggregate(
                F.zip_with(sub_q, cs, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        def rank_term(f):
            # closure factory — a `lambda c, f=f:` default-arg capture
            # reads as a 2-parameter lambda to Spark's HOF binder
            return lambda c: F.struct(
                f(c).alias("d2"), c["cid"].alias("cid")
            )

        ranked = F.array_sort(
            F.transform(F.col("cents"), rank_term(sub_d2))
        )
        code_cols.append(ranked[0]["cid"].cast("string"))
        err_cols.append(ranked[0]["d2"])
    err = err_cols[0]
    for e in err_cols[1:]:
        err = err + e
    return rows.select(
        "vec_id",
        F.concat_ws(",", *code_cols).alias("pq_code"),
        err.cast("long").alias("recon_err"),
    )


@query(
    "llm_langid_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT lang,
               CASE
                 WHEN len(list_filter(str_split(text, ' '),
                          w -> list_contains({_PROFILE_DATA!r}, w))) >
                      len(list_filter(str_split(text, ' '),
                          w -> list_contains({_PROFILE_SPARK!r}, w)))
                   THEN 'data-ish'
                 WHEN len(list_filter(str_split(text, ' '),
                          w -> list_contains({_PROFILE_SPARK!r}, w))) >
                      len(list_filter(str_split(text, ' '),
                          w -> list_contains({_PROFILE_DATA!r}, w)))
                   THEN 'spark-ish'
                 ELSE 'unknown'
               END AS predicted
        FROM documents
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, predicted
    """,
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    ground-truth ``lang`` column — the classifier-evaluation pattern
    every labeling stage needs before its output gates data
    (per-cell counts; precision/recall/accuracy are row/column
    ratios of this table). Built on the IDENTICAL predictor
    expressions as llm_lang_id, so the two queries can never score
    different classifiers.

    One map-side predict + one hash aggregate over ≤ |langs|×3
    cells — evaluation is free at any corpus size, which is the
    argument for always shipping the confusion query alongside the
    classifier query."""
    toks = F.split(F.col("text"), " ")
    hits = lambda words: F.size(  # noqa: E731
        F.filter(
            toks,
            lambda w: F.array_contains(
                F.array(*[F.lit(x) for x in words]), w
            ),
        )
    )
    h_data, h_spark = hits(_PROFILE_DATA), hits(_PROFILE_SPARK)
    pred = (
        F.when(h_data > h_spark, F.lit("data-ish"))
        .when(h_spark > h_data, F.lit("spark-ish"))
        .otherwise(F.lit("unknown"))
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "llm_ndcg_eval",
    oracle="""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                        label FROM embeddings),
    q AS (SELECT * FROM pts WHERE vec_id < 10),
    c AS (SELECT * FROM pts WHERE vec_id >= 10),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               FLOOR((list_dot_product(q.emb, c.emb) /
                      (sqrt(list_dot_product(q.emb, q.emb)) *
                       sqrt(list_dot_product(c.emb, c.emb))))
                     * 1000000.0 + 0.5) / 1000000.0 AS cos,
               CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel
        FROM q CROSS JOIN c
    ),
    ranked AS (
        SELECT q_id, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY cos DESC, c_id
               ) AS rnk,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY rel DESC, c_id
               ) AS ideal_rnk
        FROM scored
    ),
    dcg AS (
        SELECT q_id,
               SUM(CASE WHEN rnk <= 5
                        THEN rel / log2(rnk + 1.0) ELSE 0 END) AS dcg,
               SUM(CASE WHEN ideal_rnk <= 5
                        THEN rel / log2(ideal_rnk + 1.0) ELSE 0 END)
                 AS idcg
        FROM ranked GROUP BY q_id
    )
    SELECT q_id,
           FLOOR(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END
                 * 1000000.0 + 0.5) / 1000000.0 AS ndcg5
    FROM dcg
    """,
)
def llm_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@5 per query for label-relevance retrieval — the ranking-
    quality metric that closes the retrieval loop (llm_sim_topk /
    llm_bm25_topk produce rankings; THIS scores them): relevance = 1
    when candidate shares the query's label, DCG discounts by
    log₂(rank+1), normalized by the ideal ordering.

    Ranking ties are the cross-engine trap: ordering by raw cosine
    would let a libm ulp swap two ranks — so the rank key is the
    qround'd cosine (then c_id), identical on both engines by the
    threshold discipline. The ideal ranking reuses the same
    ROW_NUMBER machinery on (rel DESC, c_id).

    100 TB shape: query side broadcast (10 rows), candidate scan ×
    |q| scored map-side, per-query windows partitioned on q_id —
    the exact llm_sim_topk plan plus two O(k) window passes; at real
    scale the candidate set comes from the ANN shortlist
    (llm_ann_ivf), same metric on top."""
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb"), "label"
    )
    q = pts.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    c = pts.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("label").alias("c_label"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "c_id",
        qround(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
        F.when(F.col("q_label") == F.col("c_label"), 1)
        .otherwise(0)
        .alias("rel"),
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("c_id")
    )
    w_ideal = Window.partitionBy("q_id").orderBy(
        F.col("rel").desc(), F.col("c_id")
    )
    ranked = scored.select(
        "q_id",
        "rel",
        F.row_number().over(w_rank).alias("rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )
    dcg = ranked.groupBy("q_id").agg(
        F.sum(
            F.when(
                F.col("rnk") <= 5,
                F.col("rel") / F.log2(F.col("rnk") + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_rnk") <= 5,
                F.col("rel") / F.log2(F.col("ideal_rnk") + 1.0),
            ).otherwise(0.0)
        ).alias("idcg"),
    )
    return dcg.select(
        "q_id",
        qround(
            F.when(
                F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg5"),
    )


@query(
    "llm_kmeans_quality",
    oracle=f"""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cluster, emb AS cent
           FROM pts WHERE vec_id < {_KMEANS_K}),
    a0 AS ({_km_assign_sql("c0")}),
    c1 AS ({_km_update_sql("a0")}),
    a1 AS ({_km_assign_sql("c1")}),
    c2 AS ({_km_update_sql("a1")}),
    a2 AS ({_km_assign_sql("c2")}),
    c3 AS ({_km_update_sql("a2")}),
    d AS (
        SELECT p.vec_id, a.cluster AS own, c.cluster AS cl,
               SQRT(list_sum(list_transform(
                   generate_series(1, {_KMEANS_DIM}),
                   i -> (p.emb[i] - c.cent[i])
                        * (p.emb[i] - c.cent[i])))) AS dist
        FROM pts p JOIN a2 a USING (vec_id), c3 c
    ),
    s AS (
        SELECT vec_id, own,
               MIN(CASE WHEN cl = own THEN dist END) AS a_d,
               MIN(CASE WHEN cl <> own THEN dist END) AS b_d
        FROM d GROUP BY vec_id, own
    )
    SELECT CAST(own AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           {sql_qround(
               "AVG((b_d - a_d) / GREATEST(a_d, b_d))", 6
           )} AS avg_silhouette
    FROM s GROUP BY own
    """,
)
def llm_kmeans_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette quality score per k-means cluster — the
    simplified (medoid-free) silhouette every clustering run should
    report: a = distance to own centroid, b = distance to the
    nearest OTHER centroid, s = (b−a)/max(a,b) averaged per cluster.
    Near 0 ⇒ the cluster boundary is arbitrary (as expected on the
    isotropic fixture); strongly positive ⇒ real structure. Uses
    centroid distances, not pairwise point distances, so cost is
    n·k, never n² — the form that scales.

    Centroids are the post-assignment update of the SAME rounds as
    llm_kmeans (the c3 = update(a2) CTE; consistent "centroid of the
    cluster you were assigned to" semantics), qround-quantized like
    every kmeans round so both engines compare identical values.

    100 TB shape: broadcast k×dim centroids, k distances per point
    map-side, per-point min/min-other collapse in one combined
    aggregate, then a k-row average."""
    # assignments feed the centroid rebuild AND the distance join —
    # pin them once or the whole kmeans chain re-executes per use
    # (the llm_semdedup lesson; |vectors| rows, cheap).
    asg = _kmeans_cells(
        spark, sf_dir, _KMEANS_K, _KMEANS_ROUNDS
    ).transform(pin)
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    # c3 = update(a2): mirror of _km_update_sql (qround'd per-dim means)
    c3 = _centroid_update(asg.join(pts, "vec_id"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("emb"), F.col("cent"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = (
        pts.join(asg.withColumnRenamed("cluster", "own"), "vec_id")
        .crossJoin(F.broadcast(c3))
        .select("vec_id", "own", "cluster", F.sqrt(d2).alias("dist"))
    )
    s = d.groupBy("vec_id", "own").agg(
        F.min(
            F.when(F.col("cluster") == F.col("own"), F.col("dist"))
        ).alias("a_d"),
        F.min(
            F.when(F.col("cluster") != F.col("own"), F.col("dist"))
        ).alias("b_d"),
    )
    sil = (F.col("b_d") - F.col("a_d")) / F.greatest(
        F.col("a_d"), F.col("b_d")
    )
    return s.groupBy(F.col("own").cast("int").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_points"),
        qround(F.avg(sil), 6).alias("avg_silhouette"),
    )


# ---------------------------------------------------------------------------
# n-gram first-occurrence analytics (novelty + boilerplate mining)
# ---------------------------------------------------------------------------


@query(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 4),
               i -> array_to_string(t[i:i+4], ' ')))) AS g
      FROM toks WHERE len(t) >= 5
    ),
    firsts AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM grams JOIN firsts USING (g)
    GROUP BY doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 5-gram
    shingles whose FIRST corpus occurrence (min doc_id — ingestion
    order) is the doc itself. The "how much new text does this doc
    add" metric from the dedup literature (the aggregate view of what
    exact-substring dedup removes): boilerplate-heavy docs score near
    0, fresh content near 1.

    Two exchanges at any scale: one hash aggregate per shingle for the
    first-occurrence table, one shingle-keyed join back (both
    map-side combined; the shingle table is the corpus's distinct
    5-gram vocabulary, never pairs). novelty = exact int division —
    deterministic double, no rounding grid.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        spread(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 5)
    )
    grams = toks.select(
        "doc_id", F.explode(F.array_distinct(_shingles("toks", 5))).alias("g")
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
    )


@query(
    "llm_boilerplate_ngrams",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 4),
               i -> array_to_string(t[i:i+4], ' ')))) AS g
      FROM toks WHERE len(t) >= 5
    ),
    df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM grams GROUP BY g)
    SELECT g, df FROM df WHERE df >= 3
    ORDER BY df DESC, g LIMIT 50
    """,
)
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: the 5-gram shingles shared by the most
    documents (document frequency ≥ 3, top-50) — the header/footer/
    disclaimer phrases a curation pipeline strips before dedup (they
    inflate every pairwise similarity). One distinct-shingle explode,
    one hash aggregate, then TakeOrdered(50) on (df desc, gram) —
    never a global sort; the candidate set after the df ≥ 3 filter is
    a vocabulary tail, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        spread(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 5)
    )
    grams = toks.select(
        "doc_id", F.explode(F.array_distinct(_shingles("toks", 5))).alias("g")
    )
    return (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") >= 3)
        .orderBy(F.col("df").desc(), "g")
        .limit(50)
    )


@query(
    "llm_embedding_dim_stats",
    oracle=f"""
    WITH v AS (
        SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS g(i)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_qround('AVG(x)', 6)} AS mean,
           {sql_qround('var_pop(x)', 6)} AS variance,
           CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS zero_frac
    FROM v GROUP BY dim
    """,
)
def llm_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health check: mean, population variance
    and exact-zero fraction for every coordinate — the drift/dead-dim
    diagnostic run after any encoder change (a collapsed dimension
    shows variance ≈ 0; a biased one drifts its mean; sparsity shows
    in zero_frac). posexplode → one hash aggregate keyed by dim: the
    shuffle carries |dims| keys however large the corpus, and the
    float mean/variance are qround(6) on both engines (order-dependent
    sums); zero_frac stays an exact integer ratio (a group's COUNT is
    never 0, so the ANSI divide cannot throw).

    Reinstated verbatim from commit dbaa19c (accidentally deleted in
    3b1f43b alongside the intended llm_bpe_pair_step removal —
    VERDICT r4 item 2). Reference: pure EXT, no geonames.js analogue.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.posexplode(F.col("embedding")).alias("pos", "xf")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    return v.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        qround(F.avg("x"), 6).alias("mean"),
        qround(F.var_pop("x"), 6).alias("variance"),
        (
            F.sum(F.when(F.col("x") == 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("zero_frac"),
    )


@query(
    "llm_mrr_eval",
    oracle="""
    WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                        label FROM embeddings),
    q AS (SELECT * FROM pts WHERE vec_id < 10),
    c AS (SELECT * FROM pts WHERE vec_id >= 10),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               FLOOR((list_dot_product(q.emb, c.emb) /
                      (sqrt(list_dot_product(q.emb, q.emb)) *
                       sqrt(list_dot_product(c.emb, c.emb))))
                     * 1000000.0 + 0.5) / 1000000.0 AS cos,
               CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel
        FROM q CROSS JOIN c
    ),
    ranked AS (
        SELECT q_id, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY cos DESC, c_id
               ) AS rnk
        FROM scored
    )
    SELECT q_id,
           CAST(MIN(CASE WHEN rel = 1 THEN rnk END) AS BIGINT)
               AS first_rel_rank,
           CASE WHEN MIN(CASE WHEN rel = 1 THEN rnk END) <= 10
                THEN CAST(1 AS DOUBLE)
                     / MIN(CASE WHEN rel = 1 THEN rnk END)
                ELSE CAST(0 AS DOUBLE) END AS rr10
    FROM ranked GROUP BY q_id
    """,
)
def llm_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank @10 per query — the "how fast does the user hit
    something relevant" companion to llm_ndcg_eval (nDCG weighs the
    whole list; RR only the first hit — a ranker can win one and lose
    the other, which is why eval suites report both; the mean over
    q_id is MRR). Same base as ndcg: label-relevance over the
    broadcast query side, rank key = the qround'd cosine so a libm
    ulp can't swap ranks cross-engine, per-q_id windows. RR is one
    exact integer reciprocal; queries with no relevant candidate in
    the top-10 score 0 (the standard convention), keeping the output
    total regardless of label coverage.
    """
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb"), "label"
    )
    q = pts.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    c = pts.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("label").alias("c_label"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "q_id",
            "c_id",
            qround(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
            F.when(F.col("q_label") == F.col("c_label"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("rel"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "c_id")
    ranked = scored.select(
        "q_id", "rel", F.row_number().over(w).alias("rnk")
    )
    first_rel = F.min(F.when(F.col("rel") == 1, F.col("rnk")))
    return ranked.groupBy("q_id").agg(
        first_rel.cast("long").alias("first_rel_rank"),
        F.when(first_rel <= 10, F.lit(1.0) / first_rel)
        .otherwise(F.lit(0.0))
        .alias("rr10"),
    )


_EDV_SCALE = 100
_EDV_PLANES = 8
# cosine >= 0.99 as an exact integer predicate: dot>=0 and
# dot^2 * 10000 >= 9801 * |a|^2 * |b|^2 (0.99^2 = 9801/10000); at the
# 1e-2 quantization grid every term stays far inside int64
_EDV_NUM = 9801
_EDV_DEN = 10000


@query(
    "llm_dedup_embedding_verifiable",
    oracle=f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(generate_series(1, len(e)),
                   i -> e[i] + ((i - 1) % 7 - 3) * 0.002) AS e
        FROM base WHERE vec_id % 100 = 0
    ),
    allv AS (SELECT * FROM base UNION ALL SELECT * FROM probes),
    q AS (
        SELECT vec_id,
               list_transform(e,
                   x -> CAST(floor(x * {_EDV_SCALE}.0 + 0.5) AS BIGINT))
                   AS q
        FROM allv
    ),
    dots AS (
        SELECT vec_id, q, gm.m AS m,
               list_sum(list_transform(generate_series(1, len(q)),
                   i -> q[i] * (((i - 1) * 31 + gm.m * 17 + 7) % 101 - 50)))
                   AS dot
        FROM q, LATERAL unnest(generate_series(0, {_EDV_PLANES - 1}))
                  AS gm(m)
    ),
    b AS (
        SELECT vec_id, ANY_VALUE(q) AS q,
               CAST(SUM(CASE WHEN dot >= 0 THEN 1 << m ELSE 0 END)
                    AS BIGINT) AS bucket,
               CAST(list_sum(list_transform(ANY_VALUE(q), x -> x * x))
                    AS BIGINT) AS nrm2
        FROM dots GROUP BY vec_id
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
               CAST(list_sum(list_transform(
                   generate_series(1, len(a.q)), i -> a.q[i] * c.q[i]))
                   AS BIGINT) AS qdot,
               a.nrm2 AS na, c.nrm2 AS nb
        FROM b a JOIN b c
          ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT vec_a, vec_b, qdot
    FROM pairs
    WHERE na > 0 AND nb > 0 AND qdot >= 0
      AND qdot * qdot * {_EDV_DEN} >= {_EDV_NUM} * na * nb
    """,
)
def llm_dedup_embedding_verifiable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection END-TO-END under a full value-hash
    oracle — the witness for ``llm_dedup_embedding`` (rows-only: its
    float cosine threshold can't cross engines safely). Same planted
    corpus (every vec_id % 100 == 0 gets a perturbed twin at cosine
    ≈ 0.9995), then ALL-INTEGER: embeddings quantize to the 1e-2
    grid, sign-bucket blocking on the deterministic integer planes
    (the llm_ann_lsh_verifiable family), and the cos ≥ 0.99 gate as
    the exact integer predicate dot² · 10⁴ ≥ 9801 · |a|²|b|² with
    dot ≥ 0 — no square root, no float, no boundary ulp. Every
    bucket, dot product, and threshold decision is replayed by SQL.

    The 1e-2 grid is deliberately coarse: it keeps dot²·10⁴ far
    inside int64 (scale 1000 would overflow at 64 dims), and the
    planted twins sit at 0.9995 — two orders of magnitude above the
    grid's threshold fuzz. Same physical shape as production:
    map-only quantize+bucket, hash-partitioned bucket equi-join,
    candidates never corpus²."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    probes = base.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "e", lambda x, i: x + (i % F.lit(7) - F.lit(3)) * F.lit(0.002)
        ).alias("e"),
    )
    allv = base.unionByName(probes)
    q = allv.select(
        "vec_id",
        F.transform(
            "e",
            lambda x: F.floor(x * _EDV_SCALE + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )

    def _plane(m: int):
        return lambda x, i: x * (
            (i * 31 + F.lit(m * 17 + 7)) % 101 - 50
        ).cast("long")

    bucket = F.lit(0).cast("long")
    for m in range(_EDV_PLANES):
        dot = F.aggregate(
            F.transform(F.col("q"), _plane(m)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            dot >= 0, F.lit(1 << m).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    nrm2 = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    bk = q.select(
        "vec_id", "q", bucket.alias("bucket"), nrm2.alias("nrm2")
    ).transform(pin)
    a = bk.select(
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("bucket").alias("ba"),
        F.col("nrm2").alias("na"),
    )
    c = bk.select(
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("bucket").alias("bb"),
        F.col("nrm2").alias("nb"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            c,
            (F.col("ba") == F.col("bb"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("qdot", qdot)
        .filter(
            # na/nb > 0: a zero vector has undefined cosine and would
            # otherwise pass the gate against EVERYTHING in its bucket
            # (0 >= 0); mirrored in the oracle
            (F.col("na") > 0)
            & (F.col("nb") > 0)
            & (F.col("qdot") >= 0)
            & (
                F.col("qdot") * F.col("qdot") * _EDV_DEN
                >= F.lit(_EDV_NUM) * F.col("na") * F.col("nb")
            )
        )
        .select("vec_a", "vec_b", "qdot")
    )


# Semantic decontamination: eval vectors = the first _SDC_EVAL vec_ids
# (a stand-in benchmark, the llm_decontaminate convention), planted
# paraphrases get vec_id + _SDC_PLANT_BASE. Same integer cosine gate
# as llm_dedup_embedding_verifiable (0.99^2 = 9801/10000 at the 1e-2
# grid), reused constants _EDV_SCALE/_EDV_NUM/_EDV_DEN.
_SDC_EVAL = 50
_SDC_PLANT_BASE = 2_000_000


@query(
    "llm_decontaminate_semantic",
    oracle=f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    plants AS (
        SELECT vec_id + {_SDC_PLANT_BASE} AS vec_id,
               list_transform(generate_series(1, len(e)),
                   i -> e[i] + ((i - 1) % 7 - 3) * 0.002) AS e
        FROM base WHERE vec_id < {_SDC_EVAL}
    ),
    qz AS (
        SELECT vec_id,
               list_transform(e,
                   x -> CAST(floor(x * {_EDV_SCALE}.0 + 0.5) AS BIGINT))
                   AS q
        FROM (SELECT * FROM base UNION ALL SELECT * FROM plants)
    ),
    nq AS (
        SELECT vec_id, q,
               CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
                   AS n2
        FROM qz
    ),
    ev AS (SELECT vec_id AS e_id, q AS eq, n2 AS ne FROM nq
           WHERE vec_id < {_SDC_EVAL}),
    corpus AS (SELECT vec_id, q, n2 FROM nq
               WHERE vec_id >= {_SDC_EVAL}),
    hits AS (
        SELECT c.vec_id, e.e_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(c.q)),
                   i -> c.q[i] * e.eq[i])) AS BIGINT) AS qdot,
               c.n2 AS na, e.ne AS nb
        FROM corpus c, ev e
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           CAST(SUM(qdot) AS BIGINT) AS sum_qdot,
           CAST(CASE WHEN vec_id >= {_SDC_PLANT_BASE} THEN 1 ELSE 0 END
                AS BIGINT) AS planted
    FROM hits
    WHERE na > 0 AND nb > 0 AND qdot >= 0
      AND qdot * qdot * {_EDV_DEN} >= {_EDV_NUM} * na * nb
    GROUP BY vec_id
    """,
)
def llm_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination: flag training vectors whose cosine vs
    ANY held-out eval vector clears 0.99 — the embedding-similarity
    complement of llm_decontaminate's lexical 5-gram pass (published
    as paraphrase/contamination detection over eval-set embeddings;
    the eval set stands in as vec_id < 50). Planted paraphrases
    (each eval vector's ±0.002-perturbed twin at vec_id + 2e6,
    cosine ≈ 0.9995) prove the gate catches what it must —
    pinned in tests/test_dedup_golden.py.

    ALL-INTEGER (the llm_dedup_embedding_verifiable discipline):
    both sides quantize to the 1e-2 grid, and the cos >= 0.99 gate is
    the exact int64 predicate qdot >= 0 AND qdot^2 * 10^4 >= 9801 *
    |a|^2 * |b|^2 — no float threshold crosses engines. Zero-norm
    guards both sides (a zero vector has undefined cosine). Outputs
    stay integral: hit count, summed integer dot, 0/1 planted flag
    (never a nullable boolean — comparator dtype seam).

    100 TB shape: eval sets are metadata-sized (thousands of rows),
    so the eval side BROADCASTS and the corpus is never shuffled —
    one map-only quantize pass, a broadcast-nested-loop theta join
    against the tiny eval table (the deliberate-tiny-BNLJ family,
    join_theta/fn_ip_cidr), then one aggregation shuffle over the
    contamination-sized match set only. Contrast: blocking the corpus
    by LSH bucket first (llm_ann_lsh_verifiable) trades the e×n dot
    products for a corpus shuffle — at eval ≪ corpus the broadcast
    wins outright."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    plants = base.filter(F.col("vec_id") < _SDC_EVAL).select(
        (F.col("vec_id") + F.lit(_SDC_PLANT_BASE)).alias("vec_id"),
        F.transform(
            "e", lambda x, i: x + (i % F.lit(7) - F.lit(3)) * F.lit(0.002)
        ).alias("e"),
    )
    nq = (
        base.unionByName(plants)
        .select(
            "vec_id",
            F.transform(
                "e",
                lambda x: F.floor(x * _EDV_SCALE + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("q"),
        )
        .select(
            "vec_id",
            "q",
            F.aggregate(
                F.transform(F.col("q"), lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("n2"),
        )
    )
    ev = nq.filter(F.col("vec_id") < _SDC_EVAL).select(
        F.col("vec_id").alias("e_id"),
        F.col("q").alias("eq"),
        F.col("n2").alias("ne"),
    )
    corpus = nq.filter(F.col("vec_id") >= _SDC_EVAL)
    qdot = F.aggregate(
        F.zip_with(F.col("q"), F.col("eq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        corpus.crossJoin(F.broadcast(ev))
        .withColumn("qdot", qdot)
        .filter(
            (F.col("n2") > 0)
            & (F.col("ne") > 0)
            & (F.col("qdot") >= 0)
            & (
                F.col("qdot") * F.col("qdot") * _EDV_DEN
                >= F.lit(_EDV_NUM) * F.col("ne") * F.col("n2")
            )
        )
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.sum("qdot").cast("long").alias("sum_qdot"),
        )
        .select(
            "vec_id",
            "n_eval_hits",
            "sum_qdot",
            F.when(F.col("vec_id") >= _SDC_PLANT_BASE, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("planted"),
        )
    )


# Decontamination-overlap census plants: semantic twins of eval
# vectors 0.._DCO_SEM_PLANT land in corpus rows 50+e_id; the first
# _DCO_LEX_PLANT of those ALSO take the eval doc's text, so all four
# census cells are exercised (the fixture has natural lexical hits
# but its real vectors never reach cosine 0.99 — measured max 0.49).
_DCO_SEM_PLANT = 25
_DCO_LEX_PLANT = 8


@query(
    "llm_decontamination_overlap",
    oracle=f"""
    WITH ptext AS (
        SELECT doc_id + {_SDC_EVAL} AS doc_id, text AS pt
        FROM documents WHERE doc_id < {_DCO_LEX_PLANT}
    ),
    train_docs AS (
        SELECT d.doc_id, COALESCE(p.pt, d.text) AS text
        FROM documents d LEFT JOIN ptext p USING (doc_id)
        WHERE d.doc_id >= {_SDC_EVAL}
    ),
    toks AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM train_docs
        UNION ALL
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
        WHERE doc_id < {_SDC_EVAL}
    ),
    grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 generate_series(1, len(t) - 4),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                      || t[i+3] || ' ' || t[i+4]))) AS g
        FROM toks
    ),
    test_grams AS (SELECT DISTINCT g FROM grams
                   WHERE doc_id < {_SDC_EVAL}),
    lex AS (
        SELECT DISTINCT a.doc_id FROM grams a
        JOIN test_grams USING (g) WHERE a.doc_id >= {_SDC_EVAL}
    ),
    base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    ptwin AS (
        SELECT vec_id + {_SDC_EVAL} AS vec_id,
               list_transform(generate_series(1, len(e)),
                   i -> e[i] + ((i - 1) % 7 - 3) * 0.002) AS pe
        FROM base WHERE vec_id < {_DCO_SEM_PLANT}
    ),
    train_emb AS (
        SELECT b.vec_id, COALESCE(p.pe, b.e) AS e
        FROM base b LEFT JOIN ptwin p USING (vec_id)
        WHERE b.vec_id >= {_SDC_EVAL}
    ),
    qz AS (
        SELECT vec_id,
               list_transform(e,
                   x -> CAST(floor(x * {_EDV_SCALE}.0 + 0.5) AS BIGINT))
                   AS q
        FROM (SELECT vec_id, e FROM train_emb
              UNION ALL
              SELECT vec_id, e FROM base WHERE vec_id < {_SDC_EVAL})
    ),
    nq AS (
        SELECT vec_id, q,
               CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
                   AS n2
        FROM qz
    ),
    sem AS (
        SELECT DISTINCT c.vec_id
        FROM (SELECT * FROM nq WHERE vec_id >= {_SDC_EVAL}) c,
             (SELECT * FROM nq WHERE vec_id < {_SDC_EVAL}) v
        WHERE c.n2 > 0 AND v.n2 > 0
          AND CAST(list_sum(list_transform(
                  generate_series(1, len(c.q)),
                  i -> c.q[i] * v.q[i])) AS BIGINT) >= 0
          AND CAST(list_sum(list_transform(
                  generate_series(1, len(c.q)),
                  i -> c.q[i] * v.q[i])) AS BIGINT)
              * CAST(list_sum(list_transform(
                  generate_series(1, len(c.q)),
                  i -> c.q[i] * v.q[i])) AS BIGINT)
              * {_EDV_DEN} >= {_EDV_NUM} * c.n2 * v.n2
    )
    SELECT CAST(CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS lexical,
           CAST(CASE WHEN s.vec_id IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS semantic,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM train_docs d
    JOIN train_emb e ON e.vec_id = d.doc_id
    LEFT JOIN lex l ON l.doc_id = d.doc_id
    LEFT JOIN sem s ON s.vec_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def llm_decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-vs-semantic decontamination OVERLAP census: the 2×2
    (flagged-by-5-gram × flagged-by-cosine) count over the train
    corpus, quantifying how much the two parents —
    llm_decontaminate's n-gram pass and llm_decontaminate_semantic's
    embedding pass — actually agree. The published observation this
    audits: the sets DIVERGE (paraphrased contamination passes the
    lexical filter, near-verbatim reuse with vocabulary drift can
    pass the semantic one), so a release pipeline needs both, and
    this census is the cheap evidence of what each would uniquely
    catch. Exercises both parent gates every driver window.

    Plants (the parents' convention, documented at _DCO_SEM_PLANT):
    corpus rows 50..74 take the ±0.002 semantic twin of eval vectors
    0..24, and rows 50..57 ALSO take the eval doc's text — so the
    fixture populates all four cells (natural lexical hits exist,
    natural vectors never reach cosine 0.99; measured max 0.49).

    ALL-INTEGER: the lexical flag is a distinct-5-gram equi-join hit,
    the semantic flag the parent's exact int64 gate (1e-2 grid,
    qdot² · 10⁴ ≥ 9801 · |a|² · |b|², zero-norm guarded), flags emit
    as 0/1 BIGINT (never nullable boolean — comparator dtype seam).

    100 TB shape: both flag tables are contamination-sized and
    BROADCAST into the census; the eval gram/vector tables are
    metadata-sized and broadcast into their passes (the corpus never
    shuffles pre-match on either side); the one corpus-scale exchange
    is the documents⋈embeddings id join — co-located for free under
    id-bucketed layout, one co-partitioned equi-join otherwise."""
    docs = load_table(spark, sf_dir, "documents")
    ptext = docs.filter(F.col("doc_id") < _DCO_LEX_PLANT).select(
        (F.col("doc_id") + _SDC_EVAL).alias("doc_id"),
        F.col("text").alias("pt"),
    )
    train_docs = (
        docs.filter(F.col("doc_id") >= _SDC_EVAL)
        .join(F.broadcast(ptext), "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("pt"), F.col("text")).alias("text")
        )
    )
    eval_docs = docs.filter(F.col("doc_id") < _SDC_EVAL)

    def grams(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id", F.split("text", " ").alias("toks")
        ).select(
            "doc_id",
            F.explode(F.array_distinct(_shingles("toks", 5))).alias("g"),
        )

    test_grams = grams(eval_docs).select("g").distinct()
    lex = (
        grams(train_docs)
        .join(F.broadcast(test_grams), "g")
        .select("doc_id")
        .distinct()
        .withColumn("lex_hit", F.lit(1).cast("long"))
    )

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    ptwin = base.filter(F.col("vec_id") < _DCO_SEM_PLANT).select(
        (F.col("vec_id") + _SDC_EVAL).alias("vec_id"),
        F.transform(
            "e", lambda x, i: x + (i % F.lit(7) - F.lit(3)) * F.lit(0.002)
        ).alias("pe"),
    )
    train_emb = (
        base.filter(F.col("vec_id") >= _SDC_EVAL)
        .join(F.broadcast(ptwin), "vec_id", "left")
        .select(
            "vec_id", F.coalesce(F.col("pe"), F.col("e")).alias("e")
        )
    )

    def quant(d: DataFrame) -> DataFrame:
        return d.select(
            "vec_id",
            F.transform(
                "e",
                lambda x: F.floor(x * _EDV_SCALE + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("q"),
        ).select(
            "vec_id",
            "q",
            F.aggregate(
                F.transform(F.col("q"), lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("n2"),
        )

    ev = quant(base.filter(F.col("vec_id") < _SDC_EVAL)).select(
        F.col("q").alias("eq"), F.col("n2").alias("ne")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("q"), F.col("eq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sem = (
        quant(train_emb)
        .crossJoin(F.broadcast(ev))
        .withColumn("qdot", qdot)
        .filter(
            (F.col("n2") > 0)
            & (F.col("ne") > 0)
            & (F.col("qdot") >= 0)
            & (
                F.col("qdot") * F.col("qdot") * _EDV_DEN
                >= F.lit(_EDV_NUM) * F.col("ne") * F.col("n2")
            )
        )
        .select("vec_id")
        .distinct()
        .withColumn("sem_hit", F.lit(1).cast("long"))
    )

    return (
        train_docs.select("doc_id")
        .join(
            train_emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
        )
        .join(F.broadcast(lex), "doc_id", "left")
        .join(
            F.broadcast(sem.withColumnRenamed("vec_id", "doc_id")),
            "doc_id",
            "left",
        )
        .groupBy(
            F.coalesce(F.col("lex_hit"), F.lit(0).cast("long")).alias(
                "lexical"
            ),
            F.coalesce(F.col("sem_hit"), F.lit(0).cast("long")).alias(
                "semantic"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


_ESR_SEED = 4      # seed gram length: any shared run >= 4 starts with one
_ESR_DF_CAP = 16   # boilerplate guard: drop seeds in > 16 docs
_ESR_OCC_CAP = 8   # per-(doc, seed) occurrence cap (within-doc repeats)
_ESR_EXT_CAP = 512  # max compared window per seed (bounds per-pair memory)


@query(
    "llm_exact_shared_run",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents
    ),
    seeds AS (
      SELECT doc_id, gi.i AS pos,
             array_to_string(tk[gi.i:gi.i + {_ESR_SEED - 1}], ' ') AS g
      FROM t, LATERAL unnest(
          generate_series(1, len(tk) - {_ESR_SEED - 1})) AS gi(i)
    ),
    capped AS (
      SELECT doc_id, pos, g FROM (
        SELECT doc_id, pos, g,
               ROW_NUMBER() OVER (PARTITION BY doc_id, g
                                  ORDER BY pos) AS occ
        FROM seeds
      ) s WHERE occ <= {_ESR_OCC_CAP}
    ),
    okg AS (
      SELECT g FROM (
        SELECT g, COUNT(DISTINCT doc_id) AS df FROM capped GROUP BY g
      ) d WHERE df <= {_ESR_DF_CAP}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, a.pos AS ia,
             b.doc_id AS doc_b, b.pos AS ib
      FROM capped a
      JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      JOIN okg ON a.g = okg.g
    ),
    ext AS (
      SELECT p.doc_a, p.doc_b,
             LEAST(len(ta.tk) - p.ia, len(tb.tk) - p.ib) + 1 AS mfull,
             LEAST(LEAST(len(ta.tk) - p.ia, len(tb.tk) - p.ib) + 1,
                   {_ESR_EXT_CAP}) AS m,
             list_position(
                 list_transform(
                     generate_series(0,
                         LEAST(LEAST(len(ta.tk) - p.ia,
                                     len(tb.tk) - p.ib) + 1,
                               {_ESR_EXT_CAP}) - 1),
                     k -> CASE WHEN ta.tk[p.ia + k] = tb.tk[p.ib + k]
                               THEN 1 ELSE 0 END),
                 0) AS mis
      FROM pairs p
      JOIN t ta ON ta.doc_id = p.doc_a
      JOIN t tb ON tb.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b,
           CAST(MAX(CASE WHEN mis = 0 THEN m ELSE mis - 1 END)
                AS BIGINT) AS exact_l,
           CAST(COUNT(*) AS BIGINT) AS n_seed_matches,
           bool_or(mis = 0 AND mfull > m) AS capped
    FROM ext GROUP BY doc_a, doc_b
    """,
)
def llm_exact_shared_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT longest shared token run per document pair by
    seed-and-extend (the BLAST recipe applied to Lee et al. 2022's
    exact-substring dedup): every maximal shared run of ≥ 4 tokens
    begins with a shared 4-gram at its own first position, so seeding
    on 4-grams WITH POSITIONS and extending each matched seed
    token-by-token recovers the exact run length — this retires the
    factor-2 slack of `llm_longest_shared_gram`'s doubling probe
    (VERDICT r4/r5 missing-item 3) without a distributed suffix
    array. Exact modulo two stated, contractual caps shared with the
    probe family: seeds appearing in > 16 docs are dropped
    (boilerplate guard — template text is not dup signal and its
    pair bill is quadratic), and within-doc seed repeats cap at the
    first 8 occurrences by position (a run starting at a capped-out
    repeat of degenerate text can be missed; caps are the price of a
    bounded bill, same discipline as _LSG_DF_CAP).

    The extension is a pure array expression — no per-pair Python,
    no second corpus scan family: match flags over
    sequence(0, m−1) (m = min suffix length, ≥ 4 by the seed, so the
    ANSI descending-sequence trap cannot fire), first-mismatch via
    array_position (0/absent ⟹ the whole compared window matches →
    run = m). The compared window is capped at _ESR_EXT_CAP = 512
    tokens (third contractual cap, VERDICT r6 item 4): an unbounded
    extension materializes a match-flag array as long as the shorter
    suffix, so degenerate near-identical long documents made
    worst-case per-pair memory O(doc length). Below the cap exact_l
    is unchanged; a seed whose full capped window matches AND whose
    window was truncated sets the `capped` marker column — exact_l
    is then a (≥512) lower bound for that pair, reported honestly
    like the df/occ cap asymmetries.

    Scale shape: one tokenize (spread + localCheckpoint — consumed by
    the seed explode AND both extension array joins), seed equi-join
    bounded by df-cap × occ-cap (≤ 128 rows per gram group, never
    corpus²), two hash joins back to the token arrays on doc_id, one
    (pair)-keyed max/count aggregate. At 100 TB the token arrays
    joined back are the wide payload — bucketing documents by doc_id
    co-locates both extension joins, and the seed table carries
    8-byte hashes instead of gram strings (same plan, narrower
    shuffle)."""
    tk = (
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(
            "doc_id",
            F.filter(
                F.split("text", " "), lambda w: w != F.lit("")
            ).alias("tk"),
        )
        .transform(pin)
    )
    seeds = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(tk) >= {_ESR_SEED} THEN "
                f"transform(sequence(1, size(tk) - {_ESR_SEED - 1}), "
                f"i -> struct(i AS pos, "
                f"array_join(slice(tk, i, {_ESR_SEED}), ' ') AS g)) "
                "ELSE CAST(array() AS array<struct<pos:int,g:string>>) END"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    w_occ = Window.partitionBy("doc_id", "g").orderBy("pos")
    capped = (
        seeds.withColumn("occ", F.row_number().over(w_occ))
        .filter(F.col("occ") <= _ESR_OCC_CAP)
        .drop("occ")
        # UNPINNED by measurement (r15 pin A/B, min-of-6 interleaved:
        # all-unpinned 1.53 / lazy pins 1.64 / eager pins 1.69 s —
        # the r14 eager pin was the driver-measured regression): the
        # three consumers re-run the seed explode + occ window, but
        # checkpointing the string-gram seed table costs more than
        # the repeats — the lsg bytes-vs-recompute call. The narrow
        # token-array table `tk` (the wide payload the extension
        # joins ship) keeps its pin above.
    )
    okg = (
        capped.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _ESR_DF_CAP)
        .select("g")
    )
    capped = capped.join(okg, "g")
    a = capped.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("ia"), "g"
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("ib"), "g"
    )
    pairs = a.join(b, "g").filter(F.col("doc_a") < F.col("doc_b")).drop("g")
    ta = tk.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("ta"))
    tb = tk.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("tb"))
    ext = (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "named_struct("
                " 'mfull', least(size(ta) - ia, size(tb) - ib) + 1,"
                f" 'm', least(least(size(ta) - ia, size(tb) - ib) + 1,"
                f"            {_ESR_EXT_CAP}),"
                " 'mis', array_position("
                "   transform(sequence(0,"
                "       least(least(size(ta) - ia, size(tb) - ib) + 1,"
                f"            {_ESR_EXT_CAP}) - 1),"
                "     k -> IF(element_at(ta, ia + k)"
                "             = element_at(tb, ib + k), 1, 0)), 0))"
            ).alias("e"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("e.mis") == 0, F.col("e.m"))
            .otherwise(F.col("e.mis") - 1)
            .alias("run"),
            (
                (F.col("e.mis") == 0) & (F.col("e.mfull") > F.col("e.m"))
            ).alias("seed_capped"),
        )
    )
    return ext.groupBy("doc_a", "doc_b").agg(
        F.max("run").cast("long").alias("exact_l"),
        F.count(F.lit(1)).cast("long").alias("n_seed_matches"),
        F.bool_or("seed_capped").alias("capped"),
    )


@query(
    "llm_bleu_bigram",
    oracle="""
    WITH t AS (
      SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
             list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents WHERE doc_id < 200
    ),
    g AS (
      SELECT pair_id, side, tk,
             CASE WHEN len(tk) >= 2
                  THEN list_transform(generate_series(1, len(tk) - 1),
                                      i -> tk[i] || ' ' || tk[i + 1])
                  ELSE [] END AS bg
      FROM t
    ),
    p AS (
      SELECT a.pair_id, a.tk AS ta, b.tk AS tb, a.bg AS ga, b.bg AS gb
      FROM g a JOIN g b ON a.pair_id = b.pair_id
      WHERE a.side = 0 AND b.side = 1
    ),
    c AS (
      SELECT pair_id,
             CAST(len(ta) AS BIGINT) AS ref_len,
             CAST(len(tb) AS BIGINT) AS cand_len,
             CAST(len(gb) AS BIGINT) AS cand_bigrams,
             CAST(COALESCE(list_sum(list_transform(list_distinct(tb),
                 w -> LEAST(len(list_filter(ta, x -> x = w)),
                            len(list_filter(tb, x -> x = w))))), 0)
                 AS BIGINT) AS clip1,
             CAST(COALESCE(list_sum(list_transform(list_distinct(gb),
                 w -> LEAST(len(list_filter(ga, x -> x = w)),
                            len(list_filter(gb, x -> x = w))))), 0)
                 AS BIGINT) AS clip2
      FROM p
    )
    SELECT pair_id, ref_len, cand_len, clip1, clip2,
           CASE WHEN cand_len > 0 AND cand_bigrams > 0 THEN
             CASE WHEN clip1 > 0 AND clip2 > 0 THEN
               FLOOR(
                 LEAST(CAST(1 AS DOUBLE),
                       exp(1.0 - ref_len / CAST(cand_len AS DOUBLE)))
                 * exp(0.5 * (ln(clip1 / CAST(cand_len AS DOUBLE))
                              + ln(clip2 / CAST(cand_bigrams AS DOUBLE))))
                 * 1000000.0 + 0.5) / 1000000.0
             ELSE CAST(0.0 AS DOUBLE) END
           END AS bleu2
    FROM c
    """,
)
def llm_bleu_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 (Papineni et al. 2002) between paired documents (even
    doc = reference, odd doc = candidate — the llm_bigram_f1 pairing):
    geometric mean of CLIPPED unigram and bigram precisions times the
    brevity penalty min(1, e^(1−r/c)). The clipping is what
    distinguishes BLEU from bigram F1's distinct-set overlap — a
    candidate repeating one reference word scores its count only up
    to the reference's count, so degenerate repetition can't inflate
    precision; and the brevity penalty punishes the trivially-precise
    short candidate. Together the three guards make this the eval
    shape summarization/translation pipelines actually gate on.

    Multiset clipping stays in array built-ins: per distinct
    candidate gram, least(occurrences-in-ref, occurrences-in-cand)
    via filter+size, summed with aggregate — no explode of the pair
    side, no Python (cost is O(distinct·len) per pair, bounded by the
    doc_id < 200 eval slice like the sibling). Zero clipped overlap
    at either order ⟹ BLEU 0 (the standard convention, avoiding
    ln 0); an empty or bigram-less candidate NULLs (undefined, not
    zero). qround(6) at emit.

    Scale shape: one co-partitioned equi-join on pair_id, everything
    else map-side array arithmetic — at eval scale (ref vs cand
    corpora keyed by example id) this is the exact production plan."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    g = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.expr(
            "filter(split(text, ' '), w -> w != '')"
        ).alias("tk"),
    ).withColumn(
        "bg",
        F.expr(
            "CASE WHEN size(tk) >= 2 THEN"
            " transform(sequence(1, size(tk) - 1),"
            " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
            " ELSE cast(array() AS array<string>) END"
        ),
    )
    a = g.filter(F.col("side") == 0).select(
        "pair_id", F.col("tk").alias("ta"), F.col("bg").alias("ga")
    )
    b = g.filter(F.col("side") == 1).select(
        "pair_id", F.col("tk").alias("tb"), F.col("bg").alias("gb")
    )
    clip = (
        "aggregate(transform(array_distinct({cand}), "
        "w -> least(size(filter({ref}, x -> x = w)), "
        "size(filter({cand}, x -> x = w)))), 0, (acc, x) -> acc + x)"
    )
    c = a.join(b, "pair_id").select(
        "pair_id",
        F.size("ta").cast("long").alias("ref_len"),
        F.size("tb").cast("long").alias("cand_len"),
        F.size("gb").cast("long").alias("cand_bigrams"),
        F.expr(clip.format(cand="tb", ref="ta"))
        .cast("long")
        .alias("clip1"),
        F.expr(clip.format(cand="gb", ref="ga"))
        .cast("long")
        .alias("clip2"),
    )
    bp = F.least(
        F.lit(1.0),
        F.exp(
            F.lit(1.0) - F.col("ref_len") / F.col("cand_len").cast("double")
        ),
    )
    score = bp * F.exp(
        F.lit(0.5)
        * (
            F.log(F.col("clip1") / F.col("cand_len").cast("double"))
            + F.log(F.col("clip2") / F.col("cand_bigrams").cast("double"))
        )
    )
    return c.select(
        "pair_id",
        "ref_len",
        "cand_len",
        "clip1",
        "clip2",
        F.when(
            (F.col("cand_len") > 0) & (F.col("cand_bigrams") > 0),
            F.when(
                (F.col("clip1") > 0) & (F.col("clip2") > 0),
                qround(score, 6),
            ).otherwise(F.lit(0.0)),
        ).alias("bleu2"),
    )


_MBT_CONFIGS = [(8, 1), (4, 2), (2, 4), (1, 8)]
_MBT_DEN = 8 ** 8


def _mbt_num_sql(b: int, r: int, k: str = "n_match") -> str:
    """Exact-rational detection-probability numerator for a (b, r)
    banding over an 8-perm signature: p = 1 − (1 − (k/8)^r)^b =
    (8⁸ − (8^r − k^r)^b) / 8⁸ when b·r = 8 — integer arithmetic all
    the way (the repeated-product form keeps both engines on int64,
    no pow())."""
    kr = " * ".join([f"CAST({k} AS BIGINT)"] * r)
    t1 = f"({8 ** r} - {kr})"
    return f"({_MBT_DEN} - {' * '.join([t1] * b)})"


@query(
    "llm_minhash_band_tuning",
    oracle=f"""
    WITH {_POLY_LSH_SQL_CTES},
    perm8(i, a, b) AS (VALUES {", ".join(
        f"({i}, CAST({2 * i * 1_000_003 + 1} AS BIGINT),"
        f" CAST({i * 998_244_353 + 12_345} AS BIGINT))"
        for i in range(8)
    )}),
    sig8 AS (
        SELECT h.doc_id, p.i, MIN((p.a * h.ph + p.b) % 2147483647) AS m
        FROM h CROSS JOIN perm8 p GROUP BY h.doc_id, p.i
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.b_lo = b.b_lo AND a.b_hi = b.b_hi
         AND a.doc_id < b.doc_id
    ),
    k AS (
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match
        FROM cand c
        JOIN sig8 sa ON sa.doc_id = c.doc_a
        JOIN sig8 sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
        GROUP BY c.doc_a, c.doc_b
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({b} AS BIGINT) AS bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               {sql_qround(f"SUM({_mbt_num_sql(b, r)})"
                           f" / CAST({_MBT_DEN} AS DOUBLE)", 6)}
                 AS exp_detected,
               {sql_qround(f"SUM(CASE WHEN n_match >= 4"
                           f" THEN {_mbt_num_sql(b, r)} ELSE 0 END)"
                           f" / CAST({_MBT_DEN} AS DOUBLE)", 6)}
                 AS exp_detected_dup,
               {sql_qround(f"SUM(CASE WHEN n_match < 4"
                           f" THEN {_mbt_num_sql(b, r)} ELSE 0 END)"
                           f" / CAST({_MBT_DEN} AS DOUBLE)", 6)}
                 AS exp_fp_checks
        FROM k''' for b, r in _MBT_CONFIGS
    )}
    """,
)
def llm_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-geometry tuning table — price the (bands × rows)
    S-curve BEFORE committing a 100 TB dedup run to one geometry: for
    each way of splitting the 8-perm signature into b bands of r rows
    (b·r = 8), the probability a pair with MinHash match count k is
    detected is p = 1 − (1 − (k/8)^r)^b; summed over the observed
    candidate-pair population this yields the expected detections,
    split into likely-dup mass (k ≥ 4, i.e. ŝ ≥ 0.5) and
    false-positive bucket checks (k < 4) — the recall-vs-wasted-join
    trade each geometry buys. Joins the census family
    (llm_dedup_band_stats prices ONE geometry's buckets; this
    compares geometries on the same evidence).

    Calls the llm_minhash_jaccard_est pipeline it prices (the
    llm_ann_recall_eval pattern — the tuner can't drift from the
    pipeline it tunes) and reads only its integer match counts.
    All-integer core: with b·r = 8, p is the exact rational
    (8⁸ − (8^r − k^r)^b)/8⁸, so every sum is int64 (numerators ≤
    8⁸ ≈ 1.7e7 per pair — overflow needs ~5e11 candidate pairs per
    partition aggregate, i.e. never before the pair bill itself is
    the problem) and the single divide-at-emit qrounds identically.

    Scale shape: the pair table is the funnel's existing candidate
    set (banded, never corpus²), checkpointed once and consumed by
    the 4 config aggregates — each a 1-row reduction."""
    pairs = (
        llm_minhash_jaccard_est(spark, sf_dir)
        .select("n_match")
        .transform(pin)
    )
    out = None
    for b, r in _MBT_CONFIGS:
        num = F.expr(_mbt_num_sql(b, r))
        row = pairs.agg(
            F.lit(b).cast("long").alias("bands"),
            F.lit(r).cast("long").alias("rows_per_band"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            qround(
                F.sum(num) / F.lit(float(_MBT_DEN)), 6
            ).alias("exp_detected"),
            qround(
                F.sum(F.when(F.col("n_match") >= 4, num).otherwise(0))
                / F.lit(float(_MBT_DEN)),
                6,
            ).alias("exp_detected_dup"),
            qround(
                F.sum(F.when(F.col("n_match") < 4, num).otherwise(0))
                / F.lit(float(_MBT_DEN)),
                6,
            ).alias("exp_fp_checks"),
        )
        out = row if out is None else out.unionAll(row)
    return out


_PQS_NQ = 5    # ADC query set: the 5 lowest-id vectors
_PQS_TOPK = 10


@query(
    "llm_pq_search_adc",
    oracle=f"""
    WITH {_PQ_SQL_CTES},
    chosen AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, cid) AS rn
            FROM sub
        ) t WHERE rn = 1
    ),
    lut AS (
        SELECT vec_id AS q_id, m, cid, d2 FROM sub
        WHERE vec_id < {_PQS_NQ}
    ),
    adc AS (
        SELECT l.q_id, c.vec_id,
               CAST(SUM(l.d2) AS BIGINT) AS adc_d2
        FROM chosen c JOIN lut l ON l.m = c.m AND l.cid = c.cid
        WHERE c.vec_id <> l.q_id
        GROUP BY l.q_id, c.vec_id
    )
    SELECT q_id, vec_id, adc_d2, CAST(rank AS BIGINT) AS rank FROM (
        SELECT q_id, vec_id, adc_d2,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY adc_d2, vec_id) AS rank
        FROM adc
    ) r WHERE rank <= {_PQS_TOPK}
    """,
)
def llm_pq_search_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (Jégou et al. 2011 ADC) — the
    query side that makes llm_pq_quantize's 4-byte codes USEFUL: per
    query, one tiny lookup table per subspace (query-subvector →
    squared distance to each of the 8 codewords), then every database
    vector's approximate distance is just Σ_m LUT_m[code_m] — four
    table lookups instead of a 64-dim float computation, the whole
    point of the billion-vector PQ memory layout. Completes the PQ
    story quantize → search the way bpe_train → bpe_apply → score
    closes the tokenizer story.

    Calls the llm_pq_quantize pipeline it searches (codes re-derived
    from the same broadcast seed codebook, all-integer witness grid),
    so the search cannot drift from the index builder. Every LUT
    entry and distance sum is exact int64; top-10 per query breaks
    ties on vec_id; queries exclude themselves.

    100 TB shape: the LUT build is queries × codebook (broadcast,
    q·M·8 rows — metadata-sized); the scan side explodes each code
    row to its 4 (m, code) pairs and joins the BROADCAST LUT —
    map-side, no corpus shuffle; the only exchanges are the per-query
    top-k aggregates. Window partitions by q_id (the allowed
    shape)."""
    emb = _quantized_emb(spark, sf_dir)
    codebook = emb.filter(F.col("vec_id") < _PQ_SEEDS).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        ).alias("cents")
    )
    # database codes from the index builder itself
    codes = (
        llm_pq_quantize(spark, sf_dir)
        .select(
            "vec_id",
            F.posexplode(F.split("pq_code", ",")).alias("m", "cid"),
        )
        .select("vec_id", "m", F.col("cid").cast("long").alias("cid"))
    )
    qs = emb.filter(F.col("vec_id") < _PQS_NQ).crossJoin(
        F.broadcast(codebook)
    )
    sub_len = (F.size(F.col("q")) + (_PQ_M - 1)) / _PQ_M
    sub_len = sub_len.cast("int")

    def make_lut_entry(m, start, length, sub_q):
        # closure factory — default-arg capture reads as an n-arg
        # lambda to Spark's HOF binder (repo working-notes gotcha)
        def lut_entry(c):
            cs = F.slice(c["cq"], start, F.greatest(length, F.lit(0)))
            return F.struct(
                F.lit(m).alias("m"),
                c["cid"].alias("cid"),
                F.aggregate(
                    F.zip_with(
                        sub_q, cs, lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d2"),
            )

        return lut_entry

    # ONE projection emits all M per-subspace entry arrays and ONE
    # explode flattens them — a per-m union re-executed the filtered
    # embeddings scan and the codebook aggregate once per branch (the
    # llm_semdedup multi-branch gotcha; round-6 review, second pass)
    per_m = []
    for m in range(_PQ_M):
        start = F.lit(m) * sub_len + 1
        length = F.least(
            F.lit(m + 1) * sub_len, F.size(F.col("q"))
        ) - F.lit(m) * sub_len
        sub_q = F.slice(F.col("q"), start, F.greatest(length, F.lit(0)))
        per_m.append(
            F.transform(
                F.col("cents"), make_lut_entry(m, start, length, sub_q)
            )
        )
    lut = qs.select(
        F.col("vec_id").alias("q_id"),
        F.explode(F.concat(*per_m)).alias("e"),
    ).select(
        "q_id",
        F.col("e.m").alias("m"),
        F.col("e.cid").alias("cid"),
        F.col("e.d2").alias("d2"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "cid"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2").cast("long").alias("adc_d2"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_d2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _PQS_TOPK)
        .select("q_id", "vec_id", "adc_d2", "rank")
    )


@query(
    "llm_edit_distance_ratio",
    oracle=f"""
    WITH t AS (
      SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
             regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text7,
             CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))
                  AS BIGINT) AS n
      FROM documents WHERE doc_id < 200
    ),
    p AS (
      SELECT a.pair_id, a.text7 AS xa, b.text7 AS xb,
             a.n AS n_a, b.n AS n_b
      FROM t a JOIN t b ON a.pair_id = b.pair_id
      WHERE a.side = 0 AND b.side = 1
    ),
    d AS (
      SELECT pair_id, n_a, n_b,
             CAST(levenshtein(xa, xb) AS BIGINT) AS lev
      FROM p
    )
    SELECT pair_id, n_a, n_b, lev,
           CASE WHEN GREATEST(n_a, n_b) > 0
                THEN {sql_qround(
                    '1.0 - lev / CAST(GREATEST(n_a, n_b) AS DOUBLE)', 6)}
           END AS sim_ratio,
           10 * lev <= 3 * GREATEST(n_a, n_b) AS near_dup
    FROM d
    """,
)
def llm_edit_distance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance similarity for paired documents
    (the even/odd eval pairing): sim = 1 − lev/max(|a|,|b|), the
    normalized Levenshtein ratio difflib/rapidfuzz users gate
    near-dups on — the EXACT fine-grained complement to the
    shingle/minhash family: token shingles miss single-character
    OCR/encoding corruptions that leave every 3-gram broken, while
    edit distance counts them one by one. At pair granularity this is
    the final REFINE stage behind any blocked candidate generator
    (llm_dedup_minhash's verify step at character precision).

    Both engines implement classic unit-cost Levenshtein
    (insert/delete/substitute; cross-checked kitten→sitting = 3) —
    but Spark counts CODE POINTS while DuckDB counts BYTES, so they
    diverge on multibyte characters (é→e is 1 vs 2; round-7 review
    finding). Contractual ASCII fold: every non-ASCII code point is
    replaced by '?' on BOTH sides first (one regexp, per-code-point
    in both engines), making byte == code-point distance exact. lev
    is then an exact integer and sim one qround(6) division. The
    near-dup gate is ALL-INTEGER (10·lev ≤ 3·maxlen ⟺ sim ≥ 0.7) —
    no float-boundary flag (the threshold-predicate rule). Pairs of
    empty documents NULL the ratio (0/0) and gate TRUE (0 ≤ 0: equal
    empties are duplicates).

    100 TB shape: one co-partitioned equi-join on pair_id, then
    map-side O(|a|·|b|) JVM codegen per pair — run it only on
    blocked candidates, never all pairs (the docstring contract of
    every refine-stage op here)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    text7 = F.regexp_replace("text", r"[^\x00-\x7F]", "?")
    t = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        text7.alias("text7"),
        F.length(text7).cast("long").alias("n"),
    )
    a = t.filter(F.col("side") == 0).select(
        "pair_id", F.col("text7").alias("xa"), F.col("n").alias("n_a")
    )
    b = t.filter(F.col("side") == 1).select(
        "pair_id", F.col("text7").alias("xb"), F.col("n").alias("n_b")
    )
    d = a.join(b, "pair_id").select(
        "pair_id",
        "n_a",
        "n_b",
        F.levenshtein("xa", "xb").cast("long").alias("lev"),
    )
    mx = F.greatest(F.col("n_a"), F.col("n_b"))
    return d.select(
        "pair_id",
        "n_a",
        "n_b",
        "lev",
        F.when(
            mx > 0,
            qround(F.lit(1.0) - F.col("lev") / mx.cast("double"), 6),
        ).alias("sim_ratio"),
        (F.lit(10) * F.col("lev") <= F.lit(3) * mx).alias("near_dup"),
    )


# O(m·n) DP guard: each ROUGE-L side is truncated to this many tokens
# before the LCS fold (a `capped` marker records truncation). 512²
# ≈ 262k cells is the per-pair ceiling regardless of document length —
# same contractual-cap pattern as llm_exact_shared_run's extension cap.
_ROUGE_MAX_TOKENS = 512


@query(
    "llm_rouge_l",
    oracle=f"""
    WITH t AS (
      SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
             list_filter(str_split(text, ' '),
                 w -> w <> '')[1:{_ROUGE_MAX_TOKENS}] AS tk,
             len(list_filter(str_split(text, ' '), w -> w <> ''))
                 > {_ROUGE_MAX_TOKENS} AS side_capped
      FROM documents WHERE doc_id < 200
    ),
    p AS (
      SELECT a.pair_id, a.tk AS ta, b.tk AS tb,
             a.side_capped OR b.side_capped AS capped
      FROM t a JOIN t b ON a.pair_id = b.pair_id
      WHERE a.side = 0 AND b.side = 1
    ),
    d AS (
      SELECT pair_id, capped,
             CAST(len(ta) AS BIGINT) AS ref_len,
             CAST(len(tb) AS BIGINT) AS cand_len,
             CAST(CASE WHEN len(ta) > 0 AND len(tb) > 0 THEN
               list_reduce(
                 list_prepend(
                     list_transform(generate_series(0, len(tb)), z -> 0),
                     list_transform(generate_series(1, len(ta)), i -> [i])),
                 (prev, ix) -> list_reduce(
                     list_prepend([0],
                         list_transform(generate_series(1, len(tb)),
                                        j -> [j])),
                     (acc, jx) -> list_append(acc,
                         CASE WHEN tb[jx[1]] = ta[ix[1]]
                              THEN prev[jx[1]] + 1
                              ELSE GREATEST(acc[jx[1]],
                                            prev[jx[1] + 1]) END))
               )[len(tb) + 1]
             ELSE 0 END AS BIGINT) AS lcs
      FROM p
    )
    SELECT pair_id, ref_len, cand_len, lcs, capped,
           CASE WHEN ref_len > 0
                THEN {sql_qround('lcs / CAST(ref_len AS DOUBLE)', 6)}
           END AS rouge_l_r,
           CASE WHEN cand_len > 0
                THEN {sql_qround('lcs / CAST(cand_len AS DOUBLE)', 6)}
           END AS rouge_l_p,
           CASE WHEN ref_len + cand_len > 0
                THEN {sql_qround(
                    '2.0 * lcs / CAST(ref_len + cand_len AS DOUBLE)', 6)}
           END AS rouge_l_f1
    FROM d
    """,
)
def llm_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L (Lin 2004) for paired documents: recall/precision/F1
    of the longest common SUBSEQUENCE between reference (even doc)
    and candidate (odd doc) — the summarization eval that rewards
    in-order content coverage without requiring contiguity, closing
    the eval triad next to llm_bleu_bigram (clipped n-gram precision)
    and llm_bigram_f1 (set overlap). With β = 1 the F-measure
    reduces to 2·LCS/(m+n).

    The LCS is the classic DP computed ENTIRELY in engine
    expressions — a nested fold: the outer aggregate walks reference
    tokens carrying the previous DP row (an m+1 int array), the inner
    fold builds the next row left-to-right (the within-row
    max(new[j−1], prev[j]) recurrence needs sequential state, which
    aggregate provides and transform cannot). DuckDB replays the
    identical recurrence via nested list_reduce with LIST state
    (1-element index lists as fold items — the LIST-state rule from
    ts_holt_winters; cross-checked cell-for-cell on planted cases).
    LCS is an exact integer on both engines; the three ratios are
    single qround(6) divisions. Empty sides ⟹ LCS 0; empty ref or
    cand NULLs its undefined ratio.

    100 TB shape: one co-partitioned pair join + map-side O(m·n)
    JVM-evaluated DP per pair — an eval-slice op (doc_id < 200
    contract, like the BLEU sibling), not a corpus-pairs op; behind
    a blocked candidate generator it is the order-aware refine
    stage. The per-pair DP is bounded by the _ROUGE_MAX_TOKENS = 512
    truncation cap (`capped` marks affected pairs; fixture docs
    max out under 100 tokens, so fixture output is unchanged) —
    without it one pathological pair of book-length docs would own
    the stage wall. Probe-pinned linear-in-pairs in
    benchmarks/dedup_scale_probe.py."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    tk_full = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    t = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.slice(tk_full, 1, _ROUGE_MAX_TOKENS).alias("tk"),
        (F.size(tk_full) > _ROUGE_MAX_TOKENS).alias("side_capped"),
    )
    a = t.filter(F.col("side") == 0).select(
        "pair_id", F.col("tk").alias("ta"), F.col("side_capped").alias("ac")
    )
    b = t.filter(F.col("side") == 1).select(
        "pair_id", F.col("tk").alias("tb"), F.col("side_capped").alias("bc")
    )
    d = a.join(b, "pair_id").select(
        "pair_id",
        (F.col("ac") | F.col("bc")).alias("capped"),
        F.size("ta").cast("long").alias("ref_len"),
        F.size("tb").cast("long").alias("cand_len"),
        F.expr(
            """
            CAST(CASE WHEN size(ta) > 0 AND size(tb) > 0 THEN
              element_at(
                aggregate(ta, array_repeat(0, size(tb) + 1),
                  (prev, w) -> aggregate(sequence(1, size(tb)), array(0),
                    (acc, j) -> concat(acc, array(
                        IF(element_at(tb, j) = w,
                           element_at(prev, j) + 1,
                           greatest(element_at(acc, j),
                                    element_at(prev, j + 1))))))),
                -1)
            ELSE 0 END AS BIGINT)
            """
        ).alias("lcs"),
    )
    return d.select(
        "pair_id",
        "ref_len",
        "cand_len",
        "lcs",
        "capped",
        F.when(
            F.col("ref_len") > 0,
            qround(F.col("lcs") / F.col("ref_len").cast("double"), 6),
        ).alias("rouge_l_r"),
        F.when(
            F.col("cand_len") > 0,
            qround(F.col("lcs") / F.col("cand_len").cast("double"), 6),
        ).alias("rouge_l_p"),
        F.when(
            F.col("ref_len") + F.col("cand_len") > 0,
            qround(
                F.lit(2.0)
                * F.col("lcs")
                / (F.col("ref_len") + F.col("cand_len")).cast("double"),
                6,
            ),
        ).alias("rouge_l_f1"),
    )


# ---------------------------------------------------------------------------
# Exact all-pairs shared-substring census (round 8, VERDICT r7 item 7)
# ---------------------------------------------------------------------------

# Double rolling-hash parameters: gram identity is the PAIR of Horner
# folds mod two large primes — a false shared gram needs a simultaneous
# collision in both (P ~ 1e9 each, ~1e-18 per compared gram pair vs the
# ~1e6 distinct grams the census holds; the single-prime 1e6+3 poly_hash
# WOULD collide at this volume). Word hashes feed gram hashes so gram
# identity never touches raw text twice.
_SC_P1 = 1_000_000_007
_SC_P2 = 998_244_353
_SC_B1 = 131
_SC_B2 = 137


def _sc_prefix_sql(wh: str, base: int, p: int) -> str:
    """DuckDB prefix-Horner array: H[1] = 0, H[i+1] = fold of first i
    word hashes — list_reduce over single-element wrappers with the
    list-typed init (the established list_prepend pattern)."""
    return (
        f"list_reduce(list_prepend([CAST(0 AS BIGINT)],"
        f" list_transform({wh}, x -> [x])),"
        f" (acc, xv) -> list_append(acc,"
        f" (acc[len(acc)] * {base} + xv[1]) % {p}))"
    )


def _sc_pow_sql(wh: str, base: int, p: int) -> str:
    """DuckDB powers array: PW[l+1] = base^l mod p, length len(wh)+1."""
    return (
        f"list_reduce(list_prepend([CAST(1 AS BIGINT)],"
        f" list_transform({wh}, x -> [CAST(0 AS BIGINT)])),"
        f" (acc, xv) -> list_append(acc,"
        f" acc[len(acc)] * {base} % {p}))"
    )


def _sc_whash_sql(base: int, p: int) -> str:
    return (
        f"list_transform(tk, w -> list_reduce("
        f"list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(generate_series(1, len(w)),"
        f" i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),"
        f" (acc, c) -> (acc * {base} + c) % {p}))"
    )


@query(
    "llm_substring_census",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents WHERE doc_id < 200
    ),
    h AS (
      SELECT doc_id, len(tk) AS n,
             {_sc_whash_sql(31, _SC_P1)} AS wh1,
             {_sc_whash_sql(37, _SC_P2)} AS wh2
      FROM t WHERE len(tk) >= 3
    ),
    p AS (
      SELECT doc_id, n,
             {_sc_prefix_sql('wh1', _SC_B1, _SC_P1)} AS h1,
             {_sc_pow_sql('wh1', _SC_B1, _SC_P1)} AS pw1,
             {_sc_prefix_sql('wh2', _SC_B2, _SC_P2)} AS h2,
             {_sc_pow_sql('wh2', _SC_B2, _SC_P2)} AS pw2
      FROM h
    ),
    g0 AS (
      SELECT doc_id,
             UNNEST(flatten(list_transform(generate_series(3, n), l ->
                 list_transform(generate_series(1, n - l + 1), s ->
                   {{'l': l,
                     'g1': ((h1[s + l] - h1[s] * pw1[l + 1]) % {_SC_P1}
                            + {_SC_P1}) % {_SC_P1},
                     'g2': ((h2[s + l] - h2[s] * pw2[l + 1]) % {_SC_P2}
                            + {_SC_P2}) % {_SC_P2}}})))) AS gr
      FROM p
    ),
    g AS (
      SELECT DISTINCT doc_id, gr.l AS l, gr.g1 AS g1, gr.g2 AS g2
      FROM g0
    ),
    j AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.l
      FROM g a JOIN g b
        ON a.l = b.l AND a.g1 = b.g1 AND a.g2 = b.g2
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(MAX(l) AS BIGINT) AS lcs_tokens,
           CAST(SUM(CASE WHEN l = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_3grams
    FROM j GROUP BY doc_a, doc_b
    """,
)
def llm_substring_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs longest-shared-token-substring census over the
    eval slice (doc_id < 200): for every document pair sharing at
    least one 3-token run, the true maximum shared contiguous run
    length plus the count of distinct shared 3-grams (the base-level
    containment mass). The exact companion VERDICT r7 asked for next
    to the capped approximations: llm_exact_shared_run seed-and-
    extends under df/occ caps and llm_longest_shared_gram probes
    doubling lengths — this op is the uncapped ground truth those
    are graded against (tests/test_stat_invariants.py pins
    census ≥ both, per pair).

    Delegates to ``substring_census(spark, sf_dir, 200)`` — the
    slice bound is a parameter so benchmarks/slice_width_probe.py
    can measure the pair bill as a curve over the slice width.

    Per doc, every gram of every length l ∈ [3, n] is identified in
    O(1) from prefix Horner arrays: g(s, l) = H[s+l] − H[s]·Bˡ, the
    Rabin-Karp rolling identity, under TWO independent (base, prime)
    pairs so the census carries no single-hash collision risk; the
    arrays are one aggregate fold per doc, all JVM expressions.
    Distinct (doc, l, g) rows join on (l, g1, g2) with doc_a < doc_b,
    then one (pair) aggregate takes max l.

    Scale contract, honestly: the gram table is O(Σ n²) rows and the
    join bill is Σ_gram df² — quadratic in doc LENGTH and in gram
    popularity, which is exactly why the corpus-wide production path
    uses the capped/banded approximations and why this census is
    slice-bounded by contract (like the ROUGE/BLEU eval ops). At
    100 TB you run it on the eval slice or behind a blocked candidate
    generator as the exactness auditor; llm_lcs_corpus_exact below is
    the corpus-wide exact path (threshold-seeded, no slice bound)."""
    return substring_census(spark, sf_dir, 200)


def _rk_whash(tok_col: str, base: int, p: int):
    """Per-token Horner word hash array (the census/LCS family's
    shared Rabin-Karp identity — one definition repo-wide; SQL twin
    is _sc_whash_sql)."""
    return F.transform(
        tok_col,
        lambda w: F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: F.ascii(w.substr(i, F.lit(1))).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * base + c) % p,
        ),
    )


def _rk_prefix(whcol, base: int, p: int):
    """Prefix Horner array H with H[1]=0: any gram hash is
    H[s+l] - H[s]*B^l in O(1) (SQL twin: _sc_prefix_sql)."""
    return F.aggregate(
        whcol,
        F.array(F.lit(0).cast("long")),
        lambda acc, x: F.concat(
            acc,
            F.array((F.element_at(acc, -1) * base + x) % p),
        ),
    )


def _rk_powers(whcol, base: int, p: int):
    """Powers array PW[l+1] = B^l mod p, length len+1 (SQL twin:
    _sc_pow_sql)."""
    return F.aggregate(
        whcol,
        F.array(F.lit(1).cast("long")),
        lambda acc, x: F.concat(
            acc, F.array(F.element_at(acc, -1) * base % p)
        ),
    )


def substring_census(
    spark: SparkSession, sf_dir: str, slice_hi: int
) -> DataFrame:
    """Parameterized body of llm_substring_census (doc_id <
    ``slice_hi``); see the registered query's docstring for the
    contract and benchmarks/slice_width_probe.py for the width
    curve."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < slice_hi
    )
    tk = F.filter(F.split("text", " "), lambda w: w != F.lit(""))

    def whash(base, p):
        return _rk_whash("tk", base, p)

    def prefix(whcol, base, p):
        return _rk_prefix(whcol, base, p)

    def powers(whcol, base, p):
        return _rk_powers(whcol, base, p)

    h = (
        docs.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 3)
        .select(
            "doc_id",
            F.size("tk").alias("n"),
            whash(31, _SC_P1).alias("wh1"),
            whash(37, _SC_P2).alias("wh2"),
        )
        .select(
            "doc_id",
            "n",
            prefix(F.col("wh1"), _SC_B1, _SC_P1).alias("h1"),
            powers(F.col("wh1"), _SC_B1, _SC_P1).alias("pw1"),
            prefix(F.col("wh2"), _SC_B2, _SC_P2).alias("h2"),
            powers(F.col("wh2"), _SC_B2, _SC_P2).alias("pw2"),
        )
    )

    def gram(s, l, hcol, pwcol, p):
        return F.pmod(
            F.element_at(hcol, s + l)
            - F.element_at(hcol, s) * F.element_at(pwcol, l + 1),
            F.lit(p),
        )

    grams = F.flatten(
        F.transform(
            F.sequence(F.lit(3), F.col("n")),
            lambda l: F.transform(
                F.sequence(F.lit(1), F.col("n") - l + 1),
                lambda s: F.struct(
                    l.cast("long").alias("l"),
                    gram(s, l, F.col("h1"), F.col("pw1"), _SC_P1).alias(
                        "g1"
                    ),
                    gram(s, l, F.col("h2"), F.col("pw2"), _SC_P2).alias(
                        "g2"
                    ),
                ),
            ),
        )
    )
    g = (
        spread(h, "doc_id")
        .select("doc_id", F.explode(grams).alias("p"))
        .select("doc_id", "p.l", "p.g1", "p.g2")
        .distinct()
        # UNPINNED by measurement (r15 pin A/B: none 1.11 / lazy 1.26
        # / eager 1.40 s): both pair-join roles re-run the explode +
        # distinct, but the census is slice-bounded (doc_id < 200) by
        # contract, so the double pass is cheaper than checkpointing
        # the gram table at every slice width the contract allows —
        # same bytes-vs-recompute call as llm_longest_shared_gram.
    )
    a = g.select(
        F.col("doc_id").alias("doc_a"), "l", "g1", "g2"
    )
    b = g.select(
        F.col("doc_id").alias("doc_b"), "l", "g1", "g2"
    )
    j = a.join(b, ["l", "g1", "g2"]).filter(
        F.col("doc_a") < F.col("doc_b")
    )
    return j.groupBy("doc_a", "doc_b").agg(
        F.max("l").cast("long").alias("lcs_tokens"),
        F.sum(F.when(F.col("l") == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_3grams"),
    )


_LCS_L = 8  # corpus-wide exact-LCS reporting threshold (tokens)


def _lcs_gram_list_sql(side: str, l: str) -> str:
    """DuckDB: LIST of [g1, g2] double-hash grams of token length
    ``l`` (an SQL expression) for pair side 'a'/'b', from that side's
    Horner prefix arrays; powers always come from side a (they depend
    only on l, and l <= min(na, nb) <= na keeps the index in range)."""
    return (
        f"list_transform(generate_series(1, n{side} - ({l}) + 1),"
        f" s -> ["
        f"((h1{side}[s + ({l})] - h1{side}[s] * pw1a[({l}) + 1])"
        f" % {_SC_P1} + {_SC_P1}) % {_SC_P1},"
        f" ((h2{side}[s + ({l})] - h2{side}[s] * pw2a[({l}) + 1])"
        f" % {_SC_P2} + {_SC_P2}) % {_SC_P2}])"
    )


_LCS_MID = "(acc[1] + acc[2] + 1) // 2"


@query(
    "llm_lcs_corpus_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents
    ),
    h AS (
      SELECT doc_id, len(tk) AS n,
             {_sc_whash_sql(31, _SC_P1)} AS wh1,
             {_sc_whash_sql(37, _SC_P2)} AS wh2
      FROM t WHERE len(tk) >= {_LCS_L}
    ),
    p AS (
      SELECT doc_id, n,
             {_sc_prefix_sql('wh1', _SC_B1, _SC_P1)} AS h1,
             {_sc_pow_sql('wh1', _SC_B1, _SC_P1)} AS pw1,
             {_sc_prefix_sql('wh2', _SC_B2, _SC_P2)} AS h2,
             {_sc_pow_sql('wh2', _SC_B2, _SC_P2)} AS pw2
      FROM h
    ),
    gl0 AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, n - {_LCS_L} + 1),
               s -> [
                ((h1[s + {_LCS_L}] - h1[s] * pw1[{_LCS_L} + 1]) % {_SC_P1}
                 + {_SC_P1}) % {_SC_P1},
                ((h2[s + {_LCS_L}] - h2[s] * pw2[{_LCS_L} + 1]) % {_SC_P2}
                 + {_SC_P2}) % {_SC_P2}])) AS g
      FROM p
    ),
    gl AS (
      SELECT DISTINCT doc_id, g[1] AS g1, g[2] AS g2 FROM gl0
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared_seed_grams
      FROM gl a JOIN gl b ON a.g1 = b.g1 AND a.g2 = b.g2
                         AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT c.doc_a, c.doc_b, c.n_shared_seed_grams,
             pa.n AS na, pa.h1 AS h1a, pa.h2 AS h2a,
             pa.pw1 AS pw1a, pa.pw2 AS pw2a,
             pb.n AS nb, pb.h1 AS h1b, pb.h2 AS h2b
      FROM cand c
      JOIN p pa ON pa.doc_id = c.doc_a
      JOIN p pb ON pb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, n_shared_seed_grams,
           list_reduce(
             list_prepend(
               [CAST({_LCS_L} AS BIGINT), CAST(LEAST(na, nb) AS BIGINT)],
               list_transform(
                 generate_series(1, GREATEST(1, 1 + CAST(ceil(log2(
                   CAST(LEAST(na, nb) - {_LCS_L} + 1 AS DOUBLE))) AS INT))),
                 x -> [CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
             (acc, step) -> CASE WHEN list_has_any(
                 {_lcs_gram_list_sql('a', _LCS_MID)},
                 {_lcs_gram_list_sql('b', _LCS_MID)})
               THEN [{_LCS_MID}, acc[2]]
               ELSE [acc[1], {_LCS_MID} - 1] END
           )[1] AS lcs_tokens
    FROM wide
    """,
)
def llm_lcs_corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-WIDE exact longest-shared-token-run per document pair,
    for every pair whose true longest run is >= _LCS_L = 8 tokens —
    llm_substring_census WITHOUT the doc_id < 200 slice bound
    (VERDICT r8 item 4). The length threshold replaces the slice as
    the scale contract, exactly as in the published method this
    realizes (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": report duplicate spans >= a token
    threshold; theirs is 50 BPE tokens, the fixtures' ~55-token docs
    pin 8).

    Spark-first doubling formulation instead of a literal generalized
    suffix array: prefix-doubling SA construction costs O(log N)
    GLOBAL sort-shuffles of the full token stream — the worst possible
    shape for a 100 TB Spark job — while this plan is (1) one O(N)
    map pass building per-doc double Rabin-Karp prefix/power arrays
    (shared helpers with llm_substring_census), (2) ONE equi-join on
    the distinct threshold-gram double-hash (bill = sum_gram df², the
    honest candidate price, identical in kind to the census base
    level but at df(8-gram) << df(3-gram)), then (3) per-pair
    MAP-SIDE binary search on run length: share(l) is monotone
    decreasing, and any l-gram is identified in O(1) from the prefix
    arrays, so ceil(log2(min(na,nb)-7))+1 unrolled fold steps of
    arrays_overlap over on-the-fly gram arrays converge lo to the
    EXACT maximum — O((na+nb)·log) per pair after the join, no
    iteration, no extra shuffle. Same O(N log) total gram-work class
    as the suffix-array formulation, with candidate discovery
    delegated to one hash join Catalyst/AQE already handle.

    The per-pair binary-search state is an array<long> [lo, hi] fold
    (NOT a struct: DuckDB's list_reduce rebinds struct-state fields
    sequentially — the ts_holt_winters trap); lo starts at the seed
    level (verified shared by the join), hi at min(na, nb). Hashing
    is TWO independent ~2^30 primes (the census's _SC_P1/_SC_P2): a
    false share(mid) needs a SIMULTANEOUS collision in both chains,
    ~(na·nb)/2^60 per level — negligible at any realistic document
    length, and engine-identical either way since both engines share
    the params. The per-component space is only ~30 bits though
    (int64 headroom bounds the Horner multiply), so the honest
    collision knob for a corpus whose per-level gram tables reach
    billions of entries is the seed threshold, not the primes.

    Exactness pin: on the census slice this op's pairs with both
    doc_ids < 200 equal llm_substring_census rows with lcs_tokens >=
    8 (tests/test_stat_invariants.py). Differential: full value-hash
    DuckDB oracle, corpus-wide.

    100 TB: stage (1) is embarrassingly parallel after spread(); the
    seed join keys are uniform 61-bit hashes (no skew beyond true
    gram popularity — a boilerplate 8-gram IS a real df² bill, which
    the threshold choice governs, as in the paper); stage (3) is
    map-only over the pair table. p is localCheckpointed: it feeds
    the gram explode AND both pair sides (the multi-consumer rule).
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    h = (
        spread(docs, "doc_id")
        .select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= _LCS_L)
        .select(
            "doc_id",
            F.size("tk").alias("n"),
            _rk_whash("tk", 31, _SC_P1).alias("wh1"),
            _rk_whash("tk", 37, _SC_P2).alias("wh2"),
        )
        .select(
            "doc_id",
            "n",
            _rk_prefix(F.col("wh1"), _SC_B1, _SC_P1).alias("h1"),
            _rk_powers(F.col("wh1"), _SC_B1, _SC_P1).alias("pw1"),
            _rk_prefix(F.col("wh2"), _SC_B2, _SC_P2).alias("h2"),
            _rk_powers(F.col("wh2"), _SC_B2, _SC_P2).alias("pw2"),
        )
        .transform(pin)
    )

    def gram(hcol, pwcol, p, s, l):
        return F.pmod(
            F.element_at(hcol, s + l)
            - F.element_at(hcol, s) * F.element_at(pwcol, l + 1),
            F.lit(p),
        )

    seed = F.lit(_LCS_L)
    gl = (
        h.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - seed + 1),
                    lambda s: F.array(
                        gram(F.col("h1"), F.col("pw1"), _SC_P1, s, seed),
                        gram(F.col("h2"), F.col("pw2"), _SC_P2, s, seed),
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.element_at("g", 1).alias("g1"),
            F.element_at("g", 2).alias("g2"),
        )
        .distinct()
        # both sides of the seed self-join read this table — without
        # the checkpoint the explode+distinct subplan executes twice
        # (the multi-consumer rule)
        .transform(pin)
    )
    cand = (
        gl.select(F.col("doc_id").alias("doc_a"), "g1", "g2")
        .join(
            gl.select(F.col("doc_id").alias("doc_b"), "g1", "g2"),
            ["g1", "g2"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_seed_grams"))
    )
    pa = h.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("h1").alias("h1a"),
        F.col("h2").alias("h2a"),
        F.col("pw1").alias("pw1a"),
        F.col("pw2").alias("pw2a"),
    )
    pb = h.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("h1").alias("h1b"),
        F.col("h2").alias("h2b"),
    )
    wide = cand.join(pa, "doc_a").join(pb, "doc_b")

    def grams_at(hcol, pwcol1, hcol2, pwcol2, ncol, l):
        return F.transform(
            F.sequence(F.lit(1), ncol - l + 1),
            lambda s: F.array(
                gram(hcol, pwcol1, _SC_P1, s, l),
                gram(hcol2, pwcol2, _SC_P2, s, l),
            ),
        )

    def bs_step(acc, _step):
        lo = F.element_at(acc, 1)
        hi = F.element_at(acc, 2)
        # element_at indices must be INT; the state array stays long
        mid = F.floor((lo + hi + 1).cast("double") / 2).cast("int")
        ga = grams_at(
            F.col("h1a"), F.col("pw1a"), F.col("h2a"), F.col("pw2a"),
            F.col("na"), mid,
        )
        gb = grams_at(
            F.col("h1b"), F.col("pw1a"), F.col("h2b"), F.col("pw2a"),
            F.col("nb"), mid,
        )
        return F.when(
            F.arrays_overlap(ga, gb), F.array(mid.cast("long"), hi)
        ).otherwise(F.array(lo, (mid - 1).cast("long")))

    steps = F.greatest(
        F.lit(1),
        (
            F.lit(1)
            + F.ceil(
                F.log2(
                    (F.least("na", "nb") - F.lit(_LCS_L) + 1).cast("double")
                )
            )
        ).cast("int"),
    )
    init = F.array(
        F.lit(_LCS_L).cast("long"), F.least("na", "nb").cast("long")
    )
    return wide.select(
        "doc_a",
        "doc_b",
        "n_shared_seed_grams",
        F.element_at(
            F.aggregate(F.sequence(F.lit(1), steps), init, bs_step), 1
        ).alias("lcs_tokens"),
    )


@query(
    "llm_chrf",
    oracle="""
    WITH t AS (
      SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
             substr(replace(text, ' ', ''), 1, 256) AS s
      FROM documents WHERE doc_id < 200
    ),
    g AS (
      SELECT pair_id, side,
             CAST(len(s) AS BIGINT) AS nch,
             CASE WHEN len(s) >= 1 THEN list_transform(
                 generate_series(1, len(s)), i -> substr(s, i, 1))
               ELSE [] END AS g1,
             CASE WHEN len(s) >= 2 THEN list_transform(
                 generate_series(1, len(s) - 1), i -> substr(s, i, 2))
               ELSE [] END AS g2,
             CASE WHEN len(s) >= 3 THEN list_transform(
                 generate_series(1, len(s) - 2), i -> substr(s, i, 3))
               ELSE [] END AS g3
      FROM t
    ),
    p AS (
      SELECT a.pair_id, a.nch AS ref_nch, b.nch AS cand_nch,
             a.g1 AS r1, a.g2 AS r2, a.g3 AS r3,
             b.g1 AS c1, b.g2 AS c2, b.g3 AS c3
      FROM g a JOIN g b ON a.pair_id = b.pair_id
      WHERE a.side = 0 AND b.side = 1
    ),
    m AS (
      SELECT pair_id, ref_nch, cand_nch,
             CAST(COALESCE(list_sum(list_transform(list_distinct(c1),
                 w -> LEAST(len(list_filter(r1, x -> x = w)),
                            len(list_filter(c1, x -> x = w))))), 0)
                 AS BIGINT) AS m1,
             CAST(COALESCE(list_sum(list_transform(list_distinct(c2),
                 w -> LEAST(len(list_filter(r2, x -> x = w)),
                            len(list_filter(c2, x -> x = w))))), 0)
                 AS BIGINT) AS m2,
             CAST(COALESCE(list_sum(list_transform(list_distinct(c3),
                 w -> LEAST(len(list_filter(r3, x -> x = w)),
                            len(list_filter(c3, x -> x = w))))), 0)
                 AS BIGINT) AS m3,
             CAST(len(r1) AS BIGINT) AS t1r,
             CAST(len(r2) AS BIGINT) AS t2r,
             CAST(len(r3) AS BIGINT) AS t3r,
             CAST(len(c1) AS BIGINT) AS t1c,
             CAST(len(c2) AS BIGINT) AS t2c,
             CAST(len(c3) AS BIGINT) AS t3c
      FROM p
    ),
    pr AS (
      SELECT pair_id, ref_nch, cand_nch, m1, m2, m3,
             ((CASE WHEN t1c > 0 THEN m1 / CAST(t1c AS DOUBLE)
                    ELSE 0.0 END)
              + (CASE WHEN t2c > 0 THEN m2 / CAST(t2c AS DOUBLE)
                      ELSE 0.0 END)
              + (CASE WHEN t3c > 0 THEN m3 / CAST(t3c AS DOUBLE)
                      ELSE 0.0 END)) / 3.0 AS chrp,
             ((CASE WHEN t1r > 0 THEN m1 / CAST(t1r AS DOUBLE)
                    ELSE 0.0 END)
              + (CASE WHEN t2r > 0 THEN m2 / CAST(t2r AS DOUBLE)
                      ELSE 0.0 END)
              + (CASE WHEN t3r > 0 THEN m3 / CAST(t3r AS DOUBLE)
                      ELSE 0.0 END)) / 3.0 AS chrr
      FROM m
    )
    SELECT pair_id, ref_nch, cand_nch, m1, m2, m3,
           CASE WHEN 4.0 * chrp + chrr > 0
                THEN FLOOR(5.0 * chrp * chrr / (4.0 * chrp + chrr)
                           * 1000000.0 + 0.5) / 1000000.0
                ELSE CAST(0.0 AS DOUBLE) END AS chrf2
    FROM pr
    """,
)
def llm_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 (Popović 2015) between paired documents (even doc =
    reference, odd doc = candidate — the llm_bleu_bigram pairing):
    character n-gram precision and recall macro-averaged over orders
    n = 1..3, combined with β = 2 (recall-weighted), chrF =
    (1+β²)·P·R/(β²P + R). The CHARACTER-level member of the eval
    trio — llm_bleu_bigram is word precision with brevity penalty,
    llm_rouge_l is subsequence recall; chrF is the tokenizer-free
    metric that survives morphology-rich languages and spelling
    variants, which is why WMT adopted it as the default baseline
    metric. Whitespace is removed before gram extraction (the chrF
    convention) and grams are taken over the first 256 characters
    (the bounded eval window, stated — not a hidden cap; the
    reference tool's N = 6 orders is a documented extension, n ≤ 3
    keeps the clip arithmetic O(len·n) per pair).

    Multiset clipping stays in array built-ins exactly like
    llm_bleu_bigram (per distinct candidate gram,
    least(count-in-ref, count-in-cand) via filter+size); per-order
    P/R are exact integer ratios and the fixed three-term averages
    carry no accumulation-order risk, so the single qround(6) emit is
    deterministic. Order-n gram totals of 0 contribute P_n = R_n = 0
    (fixed-N averaging, stated); a pair with no overlap at all emits
    chrF = 0.0, never NULL/ln(0).

    Scale shape: one co-partitioned equi-join on pair_id, everything
    else map-side array arithmetic — the llm_bleu_bigram bill."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    t = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.expr("substr(replace(text, ' ', ''), 1, 256)").alias("s"),
    )
    gram = (
        "CASE WHEN length(s) >= {n} THEN"
        " transform(sequence(1, length(s) - {n} + 1),"
        " i -> substr(s, i, {n}))"
        " ELSE cast(array() AS array<string>) END"
    )
    g = t.select(
        "pair_id",
        "side",
        F.length("s").cast("long").alias("nch"),
        F.expr(gram.format(n=1)).alias("g1"),
        F.expr(gram.format(n=2)).alias("g2"),
        F.expr(gram.format(n=3)).alias("g3"),
    )
    a = g.filter(F.col("side") == 0).select(
        "pair_id",
        F.col("nch").alias("ref_nch"),
        F.col("g1").alias("r1"),
        F.col("g2").alias("r2"),
        F.col("g3").alias("r3"),
    )
    b = g.filter(F.col("side") == 1).select(
        "pair_id",
        F.col("nch").alias("cand_nch"),
        F.col("g1").alias("c1"),
        F.col("g2").alias("c2"),
        F.col("g3").alias("c3"),
    )
    clip = (
        "aggregate(transform(array_distinct({cand}), "
        "w -> least(size(filter({ref}, x -> x = w)), "
        "size(filter({cand}, x -> x = w)))), 0, (acc, x) -> acc + x)"
    )
    m = a.join(b, "pair_id").select(
        "pair_id",
        "ref_nch",
        "cand_nch",
        F.expr(clip.format(cand="c1", ref="r1")).cast("long").alias("m1"),
        F.expr(clip.format(cand="c2", ref="r2")).cast("long").alias("m2"),
        F.expr(clip.format(cand="c3", ref="r3")).cast("long").alias("m3"),
        F.size("r1").cast("long").alias("t1r"),
        F.size("r2").cast("long").alias("t2r"),
        F.size("r3").cast("long").alias("t3r"),
        F.size("c1").cast("long").alias("t1c"),
        F.size("c2").cast("long").alias("t2c"),
        F.size("c3").cast("long").alias("t3c"),
    )

    def ratio(mm, tt):
        return F.when(
            F.col(tt) > 0, F.col(mm) / F.col(tt).cast("double")
        ).otherwise(F.lit(0.0))

    chrp = (
        ratio("m1", "t1c") + ratio("m2", "t2c") + ratio("m3", "t3c")
    ) / 3.0
    chrr = (
        ratio("m1", "t1r") + ratio("m2", "t2r") + ratio("m3", "t3r")
    ) / 3.0
    pr = m.select(
        "pair_id",
        "ref_nch",
        "cand_nch",
        "m1",
        "m2",
        "m3",
        chrp.alias("chrp"),
        chrr.alias("chrr"),
    )
    return pr.select(
        "pair_id",
        "ref_nch",
        "cand_nch",
        "m1",
        "m2",
        "m3",
        F.when(
            4.0 * F.col("chrp") + F.col("chrr") > 0,
            qround(
                5.0
                * F.col("chrp")
                * F.col("chrr")
                / (4.0 * F.col("chrp") + F.col("chrr")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("chrf2"),
    )


@query(
    "llm_source_winrate",
    oracle=f"""
    WITH cells AS (
        SELECT source, {_QUALITY_Q6_SQL} AS q,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, q
    ),
    grid AS (
        SELECT s.source, v.q
        FROM (SELECT DISTINCT source FROM cells) s
        CROSS JOIN (SELECT DISTINCT q FROM cells) v
    ),
    full_g AS (
        SELECT grid.source, grid.q,
               COALESCE(cells.c, CAST(0 AS BIGINT)) AS c
        FROM grid LEFT JOIN cells USING (source, q)
    ),
    cum AS (
        SELECT source, q, c,
               COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS b
        FROM full_g
    ),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
           FROM cells GROUP BY source),
    w AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(2 * a.c * b.b + a.c * b.c) AS BIGINT) AS w2
        FROM full_g a JOIN cum b ON a.q = b.q
        WHERE a.source <> b.source
        GROUP BY a.source, b.source
    )
    SELECT w.source_a, w.source_b, na.n AS n_a, nb.n AS n_b, w.w2,
           FLOOR(CAST(w.w2 AS DOUBLE) / (2.0 * na.n * nb.n)
                 * 1000000.0 + 0.5) / 1000000.0 AS winrate
    FROM w
    JOIN ns na ON na.source = w.source_a
    JOIN ns nb ON nb.source = w.source_b
    """,
)
def llm_source_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head quality win-rate matrix across sources:
    winrate(a, b) = P(quality_a > quality_b) + ½·P(=) over random
    cross-source document pairs — the pairwise-AUC generalization of
    stat_mann_whitney's two-group AUC to every ordered source pair.
    THE data-sourcing dashboard number: "if I swap a random web doc
    for a random books doc, how often do I trade up?" — it composes
    mix decisions (llm_mix_weights) with a quality ordering that no
    per-source mean survives heavy tails to deliver.

    Value-grid sufficient statistics on the SHARED quality score
    (one expression definition with llm_quality_score, so the
    ranking key can never drift from the emitted score): the score
    lives on its 1e-6 emit grid in [0, 1] — a BOUNDED domain of
    ≤ 10⁶+1 values, which is what makes per-source (score, count)
    cells + source-partitioned cumulative windows a complete
    summary at any corpus size. W2(a, b) = Σ_q (2·c_a·below_b +
    c_a·c_b) is exact int64; winrate = W2/(2·n_a·n_b) is one
    correctly-rounded division of exact integers. Complementarity
    winrate(a,b) + winrate(b,a) = 1 holds EXACTLY in the int domain
    (W2(a,b) + W2(b,a) = 2·n_a·n_b — pinned as an invariant test).

    100 TB shape: one map-side-combined hash aggregate to cells
    (checkpointed, feeds the grid + margins + both join sides),
    source-partitioned windows over the k×V grid, one grid-sized
    equi-join on score value — the corpus scans once, k²
    output rows."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy(F.col("source"), _quality_q6_col().alias("q"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    grid = (
        cells.select("source").distinct()
        .crossJoin(F.broadcast(cells.select("q").distinct()))
    )
    full_g = grid.join(F.broadcast(cells), ["source", "q"], "left").select(
        "source",
        "q",
        F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = full_g.select(
        "source",
        "q",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")).alias("b"),
    )
    ns = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n")
    )
    a = full_g.select(
        F.col("source").alias("source_a"), "q", F.col("c").alias("ca")
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        "q",
        F.col("c").alias("cb"),
        F.col("b").alias("bb"),
    )
    wtab = (
        a.join(F.broadcast(b), "q")
        .where(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                2 * F.col("ca") * F.col("bb") + F.col("ca") * F.col("cb")
            )
            .cast("long")
            .alias("w2")
        )
    )
    na = ns.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = ns.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        wtab.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "w2",
            qround(
                F.col("w2").cast("double")
                / (F.lit(2.0) * F.col("n_a") * F.col("n_b")),
                6,
            ).alias("winrate"),
        )
    )


_LSH_EVAL_SLICE = 200
_LSH_EVAL_TAU_NUM = 1  # ground truth: Jaccard >= 1/2 -> 3i >= na+nb


@query(
    "llm_lsh_pr_eval",
    oracle=f"""
    WITH {_poly_lsh_sql_ctes(f"WHERE doc_id < {_LSH_EVAL_SLICE}")},
    hs AS (SELECT DISTINCT doc_id, ph FROM h),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM hs GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM hs a JOIN hs b ON a.ph = b.ph AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    gt AS (
        SELECT inter.da, inter.db
        FROM inter
        JOIN sizes sa ON sa.doc_id = inter.da
        JOIN sizes sb ON sb.doc_id = inter.db
        WHERE 3 * inter.i >= sa.sz + sb.sz
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.b_lo = b.b_lo AND a.b_hi = b.b_hi
         AND a.doc_id < b.doc_id
    ),
    cm AS (
        SELECT
            CAST(SUM(CASE WHEN g.da IS NOT NULL AND c.da IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN g.da IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
            CAST(SUM(CASE WHEN c.da IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS fn
        FROM gt g FULL OUTER JOIN cand c
          ON g.da = c.da AND g.db = c.db
    )
    SELECT tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN FLOOR(CAST(tp AS DOUBLE) / (tp + fp)
                           * 1000000.0 + 0.5) / 1000000.0 END AS prec,
           CASE WHEN tp + fn > 0
                THEN FLOOR(CAST(tp AS DOUBLE) / (tp + fn)
                           * 1000000.0 + 0.5) / 1000000.0 END AS rec,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN FLOOR(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
                           * 1000000.0 + 0.5) / 1000000.0 END AS f1
    FROM cm
    """,
)
def llm_lsh_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate generator
    against EXACT shingle-Jaccard ground truth on the bounded
    doc_id < 200 eval slice — the dedup-stack analogue of
    llm_ann_recall_eval: band-capacity censuses (llm_dedup_band_stats)
    price the candidate join, THIS query says whether the candidates
    are the right ones. Ground truth: exact Jaccard ≥ 1/2 as the
    ALL-INTEGER predicate 3·|∩| ≥ |A|+|B| over the SAME hashed
    shingle sets the signatures are built from (one shared
    _poly_gram_hashes / CTE text — a collision merges elements
    identically on both sides of the evaluation, so the measured
    banding error is banding error alone).

    Every count is exact int64 (the llm_classifier_eval confusion
    discipline: F1 from counts, single guards, NULL on empty sides).
    The slice cap is CONTRACTUAL — exact pairwise Jaccard is O(s²)
    and exists to audit the stack, not to run at corpus scale; the
    production recall statement is tests/test_dedup_recall.py.

    Plan: the witness band join + one ph-keyed equi-join for
    intersections (slice-bounded), both from ONE checkpointed hash
    table; the candidate and truth pair sets merge as a TAGGED UNION
    aggregated once per (da, db) — no outer join — so the plan stays
    ≤5 shuffles (the contract tests/test_plans.py pins); one global
    aggregate."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _LSH_EVAL_SLICE
    )
    # distinct on (doc_id, ph): two shingles COLLIDING to one hash
    # must merge into one set element (the oracle's SELECT DISTINCT),
    # or intersection counts drift at corpora large enough to collide
    hs = (
        _poly_gram_hashes(spread(docs, "doc_id"))
        .distinct()
        .transform(pin)
    )
    sizes = hs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    a = hs.select(F.col("doc_id").alias("da"), "ph")
    b = hs.select(F.col("doc_id").alias("db"), "ph")
    inter = (
        a.join(b, "ph")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    gt = (
        inter.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .where(3 * F.col("i") >= F.col("sza") + F.col("szb"))
        .select("da", "db")
    )
    # slice-bounded signature table feeding BOTH sides of the band
    # self-join: without the checkpoint each side re-executes the
    # whole signature build (the r10 ladder-collapse rule —
    # checkpoint grid-sized machinery output with >1 consumer)
    bands = _poly_minhash_bands_from_hashes(hs).transform(pin)
    ba = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.b_lo") == F.col("b.b_lo"))
            & (F.col("a.b_hi") == F.col("b.b_hi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    # tagged union instead of a full-outer join: both sides are
    # distinct pair sets, so the per-pair flag sums are 0/1 and the
    # confusion counts fall out of ONE (da, db) aggregation — one
    # pair-set shuffle where full-outer shuffled both sides
    g = gt.select(
        "da", "db", F.lit(1).alias("in_gt"), F.lit(0).alias("in_cand")
    )
    c = cand.select(
        "da", "db", F.lit(0).alias("in_gt"), F.lit(1).alias("in_cand")
    )
    merged = (
        g.unionByName(c)
        .groupBy("da", "db")
        .agg(
            F.sum("in_gt").alias("sg"),
            F.sum("in_cand").alias("sc"),
        )
    )
    cm = merged.agg(
        F.sum(F.col("sg") * F.col("sc")).cast("long").alias("tp"),
        F.sum((1 - F.col("sg")) * F.col("sc")).cast("long").alias("fp"),
        F.sum(F.col("sg") * (1 - F.col("sc"))).cast("long").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cm.select(
        "tp",
        "fp",
        "fn",
        F.when(
            tp + fp > 0, qround(tp.cast("double") / (tp + fp), 6)
        ).alias("prec"),
        F.when(
            tp + fn > 0, qround(tp.cast("double") / (tp + fn), 6)
        ).alias("rec"),
        F.when(
            2 * tp + fp + fn > 0,
            qround((2 * tp).cast("double") / (2 * tp + fp + fn), 6),
        ).alias("f1"),
    )


# k-center greedy coreset: K selections, integer squared distances on
# the shared 1e-2 quantization grid (_EDV_SCALE).
_KCG_K = 8


def _kcg_round_sql(r: int) -> str:
    """One unrolled greedy round: pick the farthest point (max mind,
    ties to the smaller vec_id — TakeOrdered), record its distance,
    tighten every point's min-distance against the new center."""
    return f"""s{r + 1} AS (
        SELECT vec_id, q FROM m{r} JOIN qz USING (vec_id)
        ORDER BY mind DESC, vec_id LIMIT 1
    ),
    p{r + 1} AS (
        SELECT CAST({r + 1} AS BIGINT) AS sel_order, s.vec_id,
               (SELECT mind FROM m{r} WHERE vec_id = s.vec_id)
                   AS d2_sel
        FROM s{r + 1} s
    ),
    m{r + 1} AS (
        SELECT m.vec_id,
               LEAST(m.mind, CAST(list_sum(list_transform(
                   generate_series(1, len(z.q)),
                   _kc{r} -> (z.q[_kc{r}] - s.q[_kc{r}])
                           * (z.q[_kc{r}] - s.q[_kc{r}]))) AS BIGINT))
                   AS mind
        FROM m{r} m JOIN qz z USING (vec_id), s{r + 1} s
    )"""


@query(
    "llm_kcenter_coreset",
    oracle=materialize_ctes(f"""
    WITH qz AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {_EDV_SCALE}.0
                                   + 0.5) AS BIGINT)) AS q
        FROM embeddings
    ),
    p1 AS (SELECT CAST(1 AS BIGINT) AS sel_order,
                  vec_id,
                  CAST(0 AS BIGINT) AS d2_sel
           FROM qz ORDER BY vec_id LIMIT 1),
    s1 AS (SELECT z.vec_id, z.q FROM qz z JOIN p1 ON z.vec_id = p1.vec_id),
    m1 AS (
        SELECT z.vec_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(z.q)),
                   _kc0 -> (z.q[_kc0] - s.q[_kc0])
                         * (z.q[_kc0] - s.q[_kc0]))) AS BIGINT) AS mind
        FROM qz z, s1 s
    ),
    {",".join(_kcg_round_sql(r) for r in range(1, _KCG_K))}
    {" UNION ALL ".join(
        f"SELECT sel_order, vec_id, d2_sel FROM p{r}"
        for r in range(1, _KCG_K + 1)
    )}
    """),
)
def llm_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset selection over the embedding corpus
    (Gonzalez 1985's 2-approximation; Sener & Savarese 2018's
    coreset-based data selection): start from the smallest vec_id,
    then K−1 times pick the point FARTHEST from the selected set and
    tighten every point's min-distance — the classic
    diversity-maximizing data-pruning pass (each d2_sel is the
    covering radius the selection guarantees at that step, a
    monotonically non-increasing sequence pinned in the replay).

    ALL-INTEGER selection: vectors quantize to the shared 1e-2 grid
    (the llm_dedup_embedding_verifiable discipline), so every squared
    distance is exact int64 and the argmax (mind desc, vec_id asc —
    orderBy+limit TakeOrdered, never a window) is engine-exact with
    no float anywhere near a decision. Degenerate corpora (all points
    coincide) deterministically re-pick the smallest id at mind 0 on
    both engines — documented, not guarded.

    100 TB shape: K map passes over the corpus (one broadcast 1-row
    center each — d-dim metadata) + K TakeOrdereds; the mind table is
    checkpointed per round (two consumers: the pick and the tighten).
    K is the budget knob; the published large-K path batches several
    centers per pass (same joins, k-row broadcast)."""
    qz = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(
                _as_double("embedding"),
                lambda x: F.floor(x * _EDV_SCALE + F.lit(0.5)).cast(
                    "long"
                ),
            ).alias("q"),
        )
        .transform(pin)  # consumed per round (tighten joins)
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("q"), F.col("sq"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    seed = qz.orderBy("vec_id").limit(1)
    outs = [
        seed.select(
            F.lit(1).cast("long").alias("sel_order"),
            "vec_id",
            F.lit(0).cast("long").alias("d2_sel"),
        )
    ]
    mind = (
        qz.crossJoin(F.broadcast(seed.select(F.col("q").alias("sq"))))
        .select("vec_id", d2.alias("mind"))
        .transform(pin)
    )
    for r in range(2, _KCG_K + 1):
        pick = mind.orderBy(F.col("mind").desc(), "vec_id").limit(1)
        outs.append(
            pick.select(
                F.lit(r).cast("long").alias("sel_order"),
                "vec_id",
                F.col("mind").alias("d2_sel"),
            )
        )
        center = qz.join(
            F.broadcast(pick.select("vec_id")), "vec_id"
        ).select(F.col("q").alias("sq"))
        mind = (
            mind.join(qz, "vec_id")
            .crossJoin(F.broadcast(center))
            .select(
                "vec_id", F.least(F.col("mind"), d2).alias("mind")
            )
            .transform(pin)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
