"""Distribution-free statistics over the corpus (engine extension,
SURVEY.md §2.21).

The reference pipeline emits data for humans to eyeball downstream
(geonames.js:151-163 writes NDJSON and stops); a 100 TB curation
engine must *decide* — are two slices of the corpus the same
distribution, are two labels independent, which of ten thousand
per-group tests survive multiple-comparison correction. This module
adds the classic distribution-free tests, built on the repo's
distributed-rank/prefix-sum primitives so nothing ever funnels
through a global single-task window (the global-window ban,
tests/test_plans.py).

Numeric discipline: every statistic is driven to an all-integer core
(rank sums, cumulative counts, cross-multiplied ECDF gaps, scaled
p-values) so the differential hash vs DuckDB compares exact integers;
doubles appear only in final single-expression divisions, which are
bit-identical IEEE ops on both engines. The one unavoidable
float *sum* (chi-square's cell terms) is qround-ed on both sides.

100 TB shape notes:
  - Mann-Whitney / KS rank through ``relational.distributed_rank`` /
    ``distributed_cumsum`` — one range exchange each, per-partition
    windows, metadata-sized offset tables broadcast back.
  - chi-square's contingency table is one hash aggregate; margins are
    broadcast re-aggregates of the (tiny) cell table, never a second
    scan of the corpus.
  - BH-FDR is the distributed-rank pattern again: the m tests rank
    once, the step-up comparison is a pure integer predicate, and the
    threshold extraction is a global max aggregate — no sorted
    collect to the driver at any m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_geonames_spark.functions import (
    pin,
    qround,
    spread,
    sql_norm_cdf,
    sql_norm_ppf,
    sql_qround,
)
from etl_geonames_spark.registry import query
from etl_geonames_spark.sources import load_table


@query(
    "stat_mann_whitney",
    oracle="""
    WITH m AS (
        SELECT doc_id, n_chars AS x,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    r AS (
        SELECT g,
               CAST(ROW_NUMBER() OVER (ORDER BY x, doc_id) AS BIGINT) AS rk
        FROM m
    ),
    s AS (
        SELECT CAST(SUM(g) AS BIGINT) AS n1,
               CAST(SUM(1 - g) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN g = 1 THEN rk ELSE 0 END) AS BIGINT) AS r1
        FROM r
    )
    SELECT n1, n2, r1,
           r1 - (n1 * (n1 + 1)) // 2 AS u1,
           n1 * n2 - (r1 - (n1 * (n1 + 1)) // 2) AS u2,
           CASE WHEN n1 * n2 = 0 THEN NULL
                ELSE CAST(r1 - (n1 * (n1 + 1)) // 2 AS DOUBLE)
                     / CAST(n1 * n2 AS DOUBLE) END AS auc
    FROM s
    """,
)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U: are English documents longer than the rest,
    without assuming normality? Pools both groups, ranks globally
    (``distributed_rank`` — range repartition, per-partition
    row_number, broadcast offsets; never a global window), and sums
    ranks per group: U1 = R1 - n1(n1+1)/2, AUC = U1/(n1·n2) — the
    probability a random English doc outranks a random non-English
    one.

    Ties break by doc_id (row-number ranks, not midranks) — the same
    deterministic permutation in both engines, documented rather than
    tie-averaged: at corpus scale the AUC difference is O(ties/n²)
    and the differential hash needs an exact integer core.

    Sibling: agg_mann_whitney (relational.py) runs the same test
    PER EVENT TYPE with midranks and the normal-approximation z over
    bounded per-group windows; this one is the single global test —
    where per-group windows would funnel the whole corpus through one
    task, hence the distributed_rank machinery and the AUC output.
    """
    docs = load_table(spark, sf_dir, "documents")
    from etl_geonames_spark.operators.relational import distributed_rank

    m = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    ranked = distributed_rank(m, ["x", "doc_id"])
    s = ranked.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("_grn")).otherwise(F.lit(0)))
        .cast("long")
        .alias("r1"),
    )
    u1 = F.expr("r1 - (n1 * (n1 + 1)) div 2")
    # one-sided corpora (n1·n2 = 0) leave AUC undefined: NULL, not an
    # ANSI divide-by-zero job-kill (pinned in tests/test_edge_inputs)
    return s.select(
        "n1",
        "n2",
        "r1",
        u1.alias("u1"),
        (F.col("n1") * F.col("n2") - u1).alias("u2"),
        F.when(
            F.col("n1") * F.col("n2") != 0,
            u1.cast("double") / (F.col("n1") * F.col("n2")).cast("double"),
        ).alias("auc"),
    )


@query(
    "stat_ks_two_sample",
    oracle="""
    WITH m AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    pv AS (
        SELECT v,
               CAST(SUM(g) AS BIGINT) AS c1,
               CAST(SUM(1 - g) AS BIGINT) AS c2
        FROM m GROUP BY v
    ),
    c AS (
        SELECT v,
               SUM(c1) OVER (ORDER BY v) AS cum1,
               SUM(c2) OVER (ORDER BY v) AS cum2
        FROM pv
    ),
    t AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2
        FROM pv
    )
    SELECT t.n1, t.n2,
           CAST(MAX(ABS(c.cum1 * t.n2 - c.cum2 * t.n1)) AS BIGINT) AS d_num,
           CASE WHEN t.n1 * t.n2 = 0 THEN NULL
                ELSE CAST(MAX(ABS(c.cum1 * t.n2 - c.cum2 * t.n1)) AS DOUBLE)
                     / CAST(t.n1 * t.n2 AS DOUBLE) END AS ks_d
    FROM c, t
    GROUP BY t.n1, t.n2
    """,
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between English and non-English
    length distributions — the drift check a corpus-versioning
    pipeline runs between snapshots. D = sup_x |F1(x) - F2(x)|,
    computed on an exact integer grid: per distinct value, per-group
    counts; BOTH cumulative counts AND both totals from ONE
    ``distributed_cumsum_multi`` pass (range exchange + per-partition
    window + broadcast offsets, never a global window — the r10
    fusion of the original two-branch cumsum + realign join + totals
    crossJoin, values unchanged because every quantity is an exact
    integer); and the supremum as max|cum1·n2 - cum2·n1| so no
    division happens until the final one-expression D.

    The cumulative table is value-distinct (|distinct metric values|
    rows, not corpus rows) — at 100 TB the corpus aggregates down
    before anything is ranked.
    """
    docs = load_table(spark, sf_dir, "documents")
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    pv = (
        docs.select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("lang") == "en", F.lit(1))
            .otherwise(F.lit(0))
            .alias("g"),
        )
        .groupBy("v")
        .agg(
            F.sum("g").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("g")).cast("long").alias("c2"),
        )
        # the cumsum machinery consumes pv three ways (local rows,
        # per-partition totals, grand totals): checkpoint so the
        # documents scan + aggregate runs once, not per branch
        .transform(pin)
    )
    # cumulative table checkpointed (the r10 ladder-collapse sweep):
    # value-grid-sized, so the cumsum bookkeeping executes once and
    # the censused plan is scan + one aggregate
    c = distributed_cumsum_multi(
        pv, ["v"], ["c1", "c2"], ["cum1", "cum2"], ["n1", "n2"]
    ).transform(pin)
    gap = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    # same NULL-not-throw contract as stat_mann_whitney's AUC
    return (
        c.groupBy("n1", "n2")
        .agg(F.max(gap).alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            F.when(
                F.col("n1") * F.col("n2") != 0,
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
            ).alias("ks_d"),
        )
    )


@query(
    "stat_chi2_independence",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    cm AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source
    ),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT CAST(n.n * cells.o - rm.r * cm.c AS DOUBLE)
               * CAST(n.n * cells.o - rm.r * cm.c AS DOUBLE)
               / (CAST(n.n AS DOUBLE) * CAST(rm.r AS DOUBLE)
                  * CAST(cm.c AS DOUBLE)) AS t
        FROM cells JOIN rm USING (lang) JOIN cm USING (source), n
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cm) AS n_cols,
           ((SELECT COUNT(*) FROM rm) - 1)
               * ((SELECT COUNT(*) FROM cm) - 1) AS dof,
           {sql_qround('SUM(t)', 6)} AS chi2,
           CASE WHEN (SELECT COUNT(*) FROM rm) >= 2
                 AND (SELECT COUNT(*) FROM cm) >= 2
                THEN {sql_qround(
                    'sqrt(SUM(t) / ((SELECT n FROM n) * '
                    'LEAST((SELECT COUNT(*) FROM rm) - 1, '
                    '(SELECT COUNT(*) FROM cm) - 1)))', 6
                )} END AS cramers_v
    FROM terms
    """,
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between ``lang`` and
    ``source`` — is the language mix uniform across ingestion
    sources, or does some source skew the corpus? One hash aggregate
    builds the contingency table; row/column margins and the grand
    total are re-aggregates of that (tiny) cell table, broadcast back
    — the corpus scans exactly once at any scale.

    Per-cell terms use the cross-multiplied form
    (n·o - r·c)² / (n·r·c): the difference is an exact int64
    (|n·o| ≤ N², fine to N ≈ 3·10⁹ docs), squared in double so both
    engines perform the identical IEEE op. The final sum over cells
    is the module's one order-dependent float aggregate → qround(6)
    on both sides. Emits Cramér's V = √(χ²/(n·min(r−1,c−1))) too —
    χ² grows with n, V is the comparable-across-corpora effect size
    (NULL on degenerate 1×c / r×1 tables).

    Sibling: agg_chi_square (relational.py) applies the same test as
    an events-side drift detector (event_type × user-parity, a k×2
    table); this one is the corpus-shape version with dof + effect
    size over the full r×c grid. llm_mix_kl_divergence is the
    per-source decomposition of what this tests globally.
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        # langs×sources rows feeding FOUR consumers (terms + both
        # margins + total) — pin once or each re-runs the corpus
        # scan + aggregate (the ts_acf recipe)
        .transform(pin)
    )
    rm = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    diff = (F.col("n") * F.col("o") - F.col("r") * F.col("c")).cast("double")
    term = (diff * diff) / (
        F.col("n").cast("double")
        * F.col("r").cast("double")
        * F.col("c").cast("double")
    )
    terms = (
        cells.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(n))
        .select(term.alias("t"))
    )
    shape = (
        rm.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(
            F.broadcast(cm.agg(F.count(F.lit(1)).cast("long").alias("n_cols")))
        )
        .crossJoin(F.broadcast(n))
    )
    # V divides the RAW χ² sum (rounding only at emit, both engines)
    v = F.sqrt(
        F.col("_raw")
        / (
            F.col("n").cast("double")
            * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
        )
    )
    return (
        terms.agg(F.sum("t").alias("_raw"))
        .crossJoin(F.broadcast(shape))
        .select(
            "n_rows",
            "n_cols",
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
            qround(F.col("_raw"), 6).alias("chi2"),
            F.when(
                (F.col("n_rows") >= 2) & (F.col("n_cols") >= 2), qround(v, 6)
            ).alias("cramers_v"),
        )
    )


# BH-FDR inputs: a deterministic per-doc "p-value" on a 1/1000003
# grid — an LCG-style arithmetic hash both engines replay exactly,
# with every 10th doc planted as a true signal (p ≤ 999/1000003) so
# the step-up procedure has something real to find at any sf.
_BH_PRIME = 1000003
_BH_ALPHA_INV = 20  # alpha = 1/20 = 0.05


@query(
    "stat_bh_fdr",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0
                    THEN ((doc_id * 1103515245 + 12345) % {_BH_PRIME}) % 1000
                    ELSE (doc_id * 1103515245 + 12345) % {_BH_PRIME}
               END AS p6
        FROM documents
    ),
    r AS (
        SELECT p6,
               CAST(ROW_NUMBER() OVER (ORDER BY p6, doc_id) AS BIGINT) AS k,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM p
    )
    SELECT m,
           CAST(COALESCE(MAX(CASE
               WHEN p6 * m * {_BH_ALPHA_INV} <= k * {_BH_PRIME}
               THEN k END), 0) AS BIGINT) AS k_rejected,
           CAST(COALESCE(MAX(CASE
               WHEN p6 * m * {_BH_ALPHA_INV} <= k * {_BH_PRIME}
               THEN p6 END), -1) AS BIGINT) AS p6_threshold
    FROM r GROUP BY m
    """,
)
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control at α = 0.05 over m
    per-document test p-values — the multiple-comparison gate any
    per-group anomaly sweep needs before alerting. p-values live on
    an integer grid (p = p6/1000003), so the step-up condition
    p_(k) ≤ k·α/m becomes the pure int64 predicate
    p6·m·20 ≤ k·1000003 — no float ever enters the decision.

    k* (the largest rank satisfying the condition — BH rejects all
    ranks ≤ k*) and the p6 at k* both fall out of one global max
    aggregate over the ranked table; ranks come from
    ``distributed_rank`` (range exchange + broadcast offsets), so
    the procedure never sorts m rows on one node.
    """
    docs = load_table(spark, sf_dir, "documents")
    from etl_geonames_spark.operators.relational import distributed_rank

    raw = (F.col("doc_id") * F.lit(1103515245) + F.lit(12345)) % F.lit(
        _BH_PRIME
    )
    p = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, raw % F.lit(1000))
        .otherwise(raw)
        .cast("long")
        .alias("p6"),
    )
    r = distributed_rank(p, ["p6", "doc_id"]).select(
        "p6",
        F.col("_grn").cast("long").alias("k"),
        F.col("_total").cast("long").alias("m"),
    )
    cond = (
        F.col("p6") * F.col("m") * F.lit(_BH_ALPHA_INV)
        <= F.col("k") * F.lit(_BH_PRIME)
    )
    return r.groupBy("m").agg(
        F.coalesce(F.max(F.when(cond, F.col("k"))), F.lit(0))
        .cast("long")
        .alias("k_rejected"),
        F.coalesce(F.max(F.when(cond, F.col("p6"))), F.lit(-1))
        .cast("long")
        .alias("p6_threshold"),
    )


@query(
    "stat_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    t AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
        FROM c GROUP BY prev_type
    )
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS prob
    FROM c JOIN t USING (prev_type)
    """,
)
def stat_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioural fingerprint session-analysis and
    bot-detection pipelines estimate. Sequencing is a lag window
    partitioned by user (parallel across users — the allowed window
    shape); transition counts are one hash aggregate; row-normalising
    totals are a re-aggregate of the (|types|² row) count table,
    joined back broadcast. prob = n/tot is one exact-int division —
    deterministic double, no rounding grid needed.

    At 100 TB the only corpus-sized exchange is the user-keyed one
    the lag window needs; everything after operates on |types|² rows.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").cast("long").alias("tot"))
    return (
        c.join(F.broadcast(t), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("tot").cast("double")).alias(
                "prob"
            ),
        )
    )


@query(
    "stat_welch_ttest",
    oracle=f"""
    WITH m AS (
        SELECT CAST(n_chars AS BIGINT) AS x,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    s AS (
        SELECT CAST(SUM(g) AS BIGINT) AS n1,
               CAST(SUM(1 - g) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN g = 1 THEN x * x ELSE 0 END) AS BIGINT)
                   AS q1,
               CAST(SUM(CASE WHEN g = 0 THEN x * x ELSE 0 END) AS BIGINT)
                   AS q2
        FROM m
    ),
    v AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 AS mean1,
               CAST(s2 AS DOUBLE) / n2 AS mean2,
               (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1 AS se1,
               (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                   / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2 AS se2
        FROM s WHERE n1 >= 2 AND n2 >= 2
        UNION ALL
        SELECT n1, n2, NULL, NULL, NULL, NULL
        FROM s WHERE n1 < 2 OR n2 < 2
    )
    SELECT n1, n2, mean1, mean2,
           {sql_qround('(mean1 - mean2) / sqrt(se1 + se2)', 6)} AS t_stat,
           {sql_qround(
               '(se1 + se2) * (se1 + se2)'
               ' / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))', 6
           )} AS welch_df
    FROM v
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on English vs non-English
    document lengths — the parametric sibling of stat_mann_whitney
    (run both; agreement is the robustness check). One aggregate pass
    collects the six exact int64 moments (n, Σx, Σx² per group); the
    t statistic and Welch-Satterthwaite df are fixed-shape double
    expressions over those ints, qround(6) on both engines because
    they chain several divisions.

    Degenerate groups (n < 2 — variance undefined) yield NULL
    statistics rather than an ANSI divide-by-zero job-kill, same
    contract as the rest of the module (tests/test_edge_inputs.py).
    One corpus scan, one 1-row moment table — nothing else at any
    scale.

    Sibling: agg_ab_ttest (relational.py) is the per-event-type
    grouped form (t only); this global one adds the
    Welch-Satterthwaite df and the NULL degenerate contract.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.col("n_chars").cast("long").alias("x"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    s = m.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("g") == 0, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("g") == 1, F.col("x") * F.col("x")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("q1"),
        F.sum(
            F.when(F.col("g") == 0, F.col("x") * F.col("x")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("q2"),
    )
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    mean1 = F.col("s1").cast("double") / F.col("n1")
    mean2 = F.col("s2").cast("double") / F.col("n2")
    se1 = (
        (F.col("n1").cast("double") * F.col("q1")
         - F.col("s1").cast("double") * F.col("s1"))
        / (F.col("n1").cast("double") * (F.col("n1") - 1))
        / F.col("n1")
    )
    se2 = (
        (F.col("n2").cast("double") * F.col("q2")
         - F.col("s2").cast("double") * F.col("s2"))
        / (F.col("n2").cast("double") * (F.col("n2") - 1))
        / F.col("n2")
    )
    t_stat = (mean1 - mean2) / F.sqrt(se1 + se2)
    welch_df = ((se1 + se2) * (se1 + se2)) / (
        se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)
    )
    return s.select(
        "n1",
        "n2",
        F.when(ok, mean1).alias("mean1"),
        F.when(ok, mean2).alias("mean2"),
        F.when(ok, qround(t_stat, 6)).alias("t_stat"),
        F.when(ok, qround(welch_df, 6)).alias("welch_df"),
    )


@query(
    "stat_levene",
    oracle=f"""
    WITH x AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    vc AS (
        SELECT lang, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM x GROUP BY lang, v
    ),
    cum AS (
        SELECT lang, v, c,
               CAST(SUM(c) OVER (
                   PARTITION BY lang ORDER BY v) AS BIGINT) AS cw,
               CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS ng
        FROM vc
    ),
    med AS (
        SELECT lang, MIN(v) AS m
        FROM cum WHERE 2 * cw >= ng GROUP BY lang
    ),
    z AS (
        SELECT x.lang, ABS(x.v - med.m) AS z
        FROM x JOIN med USING (lang)
    ),
    g AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(z) AS BIGINT) AS s,
               CAST(SUM(z * z) AS BIGINT) AS q
        FROM z GROUP BY lang
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(s) AS BIGINT) AS ss,
               SUM(CAST(s AS DOUBLE) * s / n) AS sb,
               CAST(SUM(q) AS BIGINT) AS qq
        FROM g
    )
    SELECT k, nn,
           CASE WHEN k >= 2 AND nn > k AND CAST(qq AS DOUBLE) - sb > 0
                THEN {sql_qround(
                    '((sb - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))'
                    ' / ((CAST(qq AS DOUBLE) - sb) / (nn - k))', 6
                )} END AS f_stat
    FROM tot
    """,
)
def stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene's test with group MEDIANS — the
    robust form): do document lengths have equal spread across
    languages? The third leg of the testing stack — stat_welch_ttest
    compares means, stat_mann_whitney compares distributions, this
    compares VARIANCES (the assumption checker for pooled analyses).

    Group medians come from the scale-correct grouped-median shape:
    per-(group, value) counts, cumulative within group over the
    value-DISTINCT grid (a window over |distinct values| rows per
    group, never corpus rows), smallest value with 2·cum ≥ n. The
    median is an actual integer element, so the deviations z = |x−m|
    are exact ints and all four moment tables are exact int64 sums.
    The F statistic — between-group mean square of z over within-group
    — chains Σs²/n terms whose sum order varies → qround(6) both
    sides. One corpus scan for counts, one for deviations (joined to
    the broadcast 5-row median table); everything downstream is
    metadata-sized.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    x = docs.select("lang", F.col("n_chars").cast("long").alias("v"))
    vc = x.groupBy("lang", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.select(
        "lang",
        "v",
        F.sum("c").over(w_cum).cast("long").alias("cw"),
        F.sum("c").over(Window.partitionBy("lang")).cast("long").alias("ng"),
    )
    med = (
        cum.filter(2 * F.col("cw") >= F.col("ng"))
        .groupBy("lang")
        .agg(F.min("v").alias("m"))
    )
    z = x.join(F.broadcast(med), "lang").select(
        "lang", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    g = z.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sb"),
        F.sum("q").cast("long").alias("qq"),
    )
    # degenerate shapes (one group, zero within-group spread) yield
    # NULL, never an ANSI divide-by-zero (tests/test_edge_inputs.py)
    ok = (
        (F.col("k") >= 2)
        & (F.col("nn") > F.col("k"))
        & (F.col("qq").cast("double") - F.col("sb") > 0)
    )
    between = (
        F.col("sb") - F.col("ss").cast("double") * F.col("ss") / F.col("nn")
    ) / (F.col("k") - 1)
    within = (F.col("qq").cast("double") - F.col("sb")) / (
        F.col("nn") - F.col("k")
    )
    return tot.select(
        "k", "nn", F.when(ok, qround(between / within, 6)).alias("f_stat")
    )


_BDIFF_REPS = 200
_BDIFF_P = 1_000_003


def _bdiff_k_sql(j: int) -> str:
    return (
        f"(CASE WHEN ((doc_id * 48271 + r * 69621 + {j} * 40503) "
        f"% {_BDIFF_P}) % 4 = 0 THEN 1 ELSE 0 END)"
    )


@query(
    "stat_bootstrap_diff",
    oracle=f"""
    WITH reps AS (
        SELECT doc_id, n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g, r,
               {" + ".join(_bdiff_k_sql(j) for j in (1, 2, 3, 4))} AS k
        FROM documents,
             (SELECT unnest(generate_series(0, {_BDIFF_REPS - 1})) AS r)
    ),
    m AS (
        SELECT r,
               CASE WHEN SUM(k * g) > 0 AND SUM(k * (1 - g)) > 0
                    THEN SUM(k * g * n_chars)
                           / CAST(SUM(k * g) AS DOUBLE)
                         - SUM(k * (1 - g) * n_chars)
                           / CAST(SUM(k * (1 - g)) AS DOUBLE)
               END AS diff_r
        FROM reps GROUP BY r
    )
    SELECT CAST(COUNT(diff_r) AS BIGINT) AS n_reps,
           quantile_disc(diff_r, 0.025) AS ci_lo,
           quantile_disc(diff_r, 0.975) AS ci_hi
    FROM m
    """,
)
def stat_bootstrap_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the DIFFERENCE in
    mean document length between English and the rest — the A/B-test
    error bar (a CI excluding 0 is the significance call
    stat_welch_ttest makes parametrically; run both). Same replicate
    machinery as llm_bootstrap_ci: each doc enters replicate r
    Binomial(4,¼) ≈ Poisson(1) times via the deterministic arithmetic
    hash, so all 200 replicates compute in ONE grouped aggregate, and
    the per-replicate diff is a fixed-shape expression over exact
    integer sums (ulp-identical across engines). CI bounds are
    discrete percentiles — actual replicate values. Replicates where
    either group draws zero weight yield NULL and drop from the
    percentile (both engines ignore NULLs identically).

    100 TB shape: map-side ×200 expansion against a broadcast
    replicate spine, one map-side-combined aggregate to 200 rows —
    the corpus scans once regardless of replicate count.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    reps = spark.range(_BDIFF_REPS).select(F.col("id").alias("r"))
    k = None
    for j in (1, 2, 3, 4):
        term = F.when(
            (
                (F.col("doc_id") * 48271 + F.col("r") * 69621 + j * 40503)
                % _BDIFF_P
            )
            % 4
            == 0,
            1,
        ).otherwise(0)
        k = term if k is None else k + term
    expanded = docs.crossJoin(F.broadcast(reps)).select(
        "r", "n_chars", "g", k.alias("k")
    )
    kg = F.col("k") * F.col("g")
    kr = F.col("k") * (F.lit(1) - F.col("g"))
    m = expanded.groupBy("r").agg(
        F.sum(kg * F.col("n_chars")).alias("_sg"),
        F.sum(kg).alias("_ng"),
        F.sum(kr * F.col("n_chars")).alias("_sr"),
        F.sum(kr).alias("_nr"),
    ).select(
        "r",
        F.when(
            (F.col("_ng") > 0) & (F.col("_nr") > 0),
            F.col("_sg") / F.col("_ng").cast("double")
            - F.col("_sr") / F.col("_nr").cast("double"),
        ).alias("diff_r"),
    )
    m.createOrReplaceTempView("boot_diff_reps")
    return spark.sql("""
        SELECT CAST(COUNT(diff_r) AS BIGINT) AS n_reps,
               percentile_disc(0.025) WITHIN GROUP (ORDER BY diff_r)
                   AS ci_lo,
               percentile_disc(0.975) WITHIN GROUP (ORDER BY diff_r)
                   AS ci_hi
        FROM boot_diff_reps
    """)


@query(
    "stat_runs_test",
    oracle="""
    WITH med AS (
        SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS m
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CASE WHEN n_chars > med.m THEN 1 ELSE 0 END AS above
        FROM documents, med
    ),
    idx AS (
        SELECT above,
               CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS t
        FROM s
    ),
    chg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_changes
        FROM idx a JOIN idx b ON b.t = a.t + 1
        WHERE a.above <> b.above
    ),
    cnt AS (
        SELECT CAST(SUM(above) AS BIGINT) AS n1,
               CAST(SUM(1 - above) AS BIGINT) AS n2
        FROM idx
    )
    SELECT cnt.n1, cnt.n2,
           chg.n_changes + 1 AS n_runs,
           CASE WHEN cnt.n1 > 0 AND cnt.n2 > 0 THEN
             1.0 + 2.0 * cnt.n1 * cnt.n2 / (cnt.n1 + cnt.n2)
           END AS expected_runs
    FROM chg, cnt
    """,
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for sequence randomness: walk the
    corpus in ingestion order (doc_id), code each doc above/below the
    median length, count maximal same-side runs, and compare to the
    expectation 1 + 2·n1·n2/n under exchangeability — far fewer runs
    than expected means the feed arrives in length-clustered batches
    (the shuffle-before-training red flag llm_shuffle_order fixes).

    The sequential neighbor comparison decomposes distributed: index
    via ``distributed_rank``, pair by the t+1 equi-join (ts_acf's lag
    alignment — never a global lag window), count sign changes; runs
    = changes + 1. Median is the discrete percentile (an actual
    element); all counts exact int64; the expectation is one
    fixed-shape double expression, NULL on one-sided corpora.
    """
    from etl_geonames_spark.operators.relational import distributed_rank

    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)"
        ).alias("m")
    )
    s = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        F.when(F.col("n_chars") > F.col("m"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("above"),
    )
    # three consumers (both join sides + the group totals) — pin the
    # ranked table or each re-runs the scan + median + rank chain; at
    # real scale this is the persist-the-indexed-sequence step
    idx = (
        distributed_rank(s, ["doc_id"])
        .select("above", F.col("_grn").cast("long").alias("t"))
        .transform(pin)
    )
    a, b = idx.alias("a"), idx.alias("b")
    chg = (
        a.join(b, F.col("b.t") == F.col("a.t") + 1)
        .filter(F.col("a.above") != F.col("b.above"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_changes"))
    )
    cnt = idx.agg(
        F.sum("above").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("above")).cast("long").alias("n2"),
    )
    return (
        chg.crossJoin(F.broadcast(cnt))
        .select(
            "n1",
            "n2",
            (F.col("n_changes") + 1).alias("n_runs"),
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.lit(1.0)
                + F.lit(2.0)
                * F.col("n1")
                * F.col("n2")
                / (F.col("n1") + F.col("n2")),
            ).alias("expected_runs"),
        )
    )


@query(
    "stat_best_split",
    oracle=f"""
    WITH m AS (
        SELECT CAST(n_chars AS BIGINT) AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
        FROM documents
    ),
    pv AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(a) AS BIGINT) AS ac
        FROM m GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS nl,
               CAST(SUM(ac) OVER (ORDER BY v) AS BIGINT) AS al,
               CAST(SUM(c) OVER () AS BIGINT) AS n,
               CAST(SUM(ac) OVER () AS BIGINT) AS aa
        FROM pv
    ),
    f AS (
        SELECT v, n, aa,
               (CAST(al AS DOUBLE) * al
                + CAST(nl - al AS DOUBLE) * (nl - al)) / nl
               + (CAST(aa - al AS DOUBLE) * (aa - al)
                  + CAST((n - nl) - (aa - al) AS DOUBLE)
                    * ((n - nl) - (aa - al))) / (n - nl) AS fv
        FROM cum WHERE nl < n
    ),
    mx AS (SELECT MAX(fv) AS fmax FROM f)
    SELECT f.n,
           CAST(MIN(f.v) AS BIGINT) AS best_threshold,
           {sql_qround(
               'mx.fmax / f.n'
               ' - (CAST(f.aa AS DOUBLE) * f.aa'
               '    + CAST(f.n - f.aa AS DOUBLE) * (f.n - f.aa))'
               '   / (CAST(f.n AS DOUBLE) * f.n)', 6
           )} AS gini_gain
    FROM f, mx WHERE f.fv = mx.fmax
    GROUP BY f.n, f.aa, mx.fmax
    """,
)
def stat_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision-tree split: the threshold on document length
    that best separates English from the rest by Gini impurity — the
    single-feature learner a labeling pipeline fits to sanity-check
    that a metric actually carries signal (gain ≈ 0 ⇒ the feature is
    noise). Minimizing weighted child impurity is maximizing
    f(t) = (a_L²+b_L²)/n_L + (a_R²+b_R²)/n_R over thresholds t, so
    the scan is: per-distinct-value class counts, BOTH cumulative
    sums (total count and class-a count) plus their grand totals in
    one range exchange via ``distributed_cumsum_multi`` (two separate
    ``distributed_cumsum`` passes + realignment join until round 5 —
    VERDICT r4 plan-debt item; the candidate grid is value-distinct,
    not corpus-sized), f from exact int64 counts as a fixed-shape
    double (bit-identical both engines), argmax by f = max(f)
    equality with min-threshold tie-break.

    gain = f*/n − (A²+B²)/n² (base Gini minus best weighted child
    impurity), qround(6) only at the emit. The corpus scans once for
    the count grid; everything after runs on |distinct values| rows.
    """
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    docs = load_table(spark, sf_dir, "documents")
    pv = (
        docs.select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("lang") == "en", F.lit(1))
            .otherwise(F.lit(0))
            .alias("a"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("a").cast("long").alias("ac"),
        )
        # value-distinct grid, consumed by the cumsum's local/totals
        # branches — tiny, pin it
        .transform(pin)
    )
    cum = distributed_cumsum_multi(
        pv, ["v"], ["c", "ac"], ["nl", "al"], ["n", "aa"]
    ).select("v", "nl", "al", "n", "aa")
    bl = F.col("nl") - F.col("al")
    ar = F.col("aa") - F.col("al")
    br = (F.col("n") - F.col("nl")) - ar
    # the division guard must live INSIDE the expression: the filter
    # below does not stop Spark from evaluating fv on the nl = n row
    # within the same codegen stage, and ANSI div-by-zero is fatal
    fv = F.when(
        F.col("nl") < F.col("n"),
        (F.col("al").cast("double") * F.col("al") + bl.cast("double") * bl)
        / F.col("nl")
        + (ar.cast("double") * ar + br.cast("double") * br)
        / (F.col("n") - F.col("nl")),
    )
    f = (
        cum.filter(F.col("nl") < F.col("n"))
        .select("v", "n", "aa", fv.alias("fv"))
        # |distinct values| rows consumed by TWO branches (the max
        # and the argmax filter) — without the pin each branch
        # re-executes the whole cumsum subplan
        .transform(pin)
    )
    mx = f.agg(F.max("fv").alias("fmax"))
    base = (
        F.col("aa").cast("double") * F.col("aa")
        + (F.col("n") - F.col("aa")).cast("double") * (F.col("n") - F.col("aa"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return (
        f.crossJoin(F.broadcast(mx))
        .filter(F.col("fv") == F.col("fmax"))
        .groupBy("n", "aa", "fmax")
        .agg(F.min("v").cast("long").alias("best_threshold"))
        .select(
            "n",
            "best_threshold",
            qround(F.col("fmax") / F.col("n") - base, 6).alias("gini_gain"),
        )
    )


_CONF_ALPHA_NUM = 9  # coverage 0.9 = 9/10
_CONF_ALPHA_DEN = 10


@query(
    "stat_conformal_interval",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,
               (doc_id * 1103515245 + 12345) % 2 AS fold
        FROM documents
    ),
    pred AS (
        SELECT lang, CAST(SUM(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d WHERE fold = 0 GROUP BY lang
    ),
    cells AS (
        SELECT ABS(CAST(d.x AS DOUBLE) - CAST(pred.s AS DOUBLE) / pred.n)
                   AS r,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM d JOIN pred USING (lang) WHERE d.fold = 1
        GROUP BY r
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_cal FROM cells),
    cum AS (
        SELECT r, SUM(c) OVER (ORDER BY r
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM cells
    ),
    kt AS (
        SELECT n_cal,
               LEAST(CAST(ceil((n_cal + 1) * {_CONF_ALPHA_NUM}
                             / CAST({_CONF_ALPHA_DEN} AS DOUBLE))
                         AS BIGINT), n_cal) AS k_target
        FROM n
    )
    SELECT kt.n_cal, kt.k_target, MIN(cum.r) AS q_hat
    FROM cum, kt WHERE cum.cum >= kt.k_target
    GROUP BY kt.n_cal, kt.k_target
    """,
)
def stat_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al.; the
    distribution-free uncertainty wrapper modern eval stacks put
    around ANY predictor): fit a trivial per-language mean predictor
    on the hash-even half, take absolute residuals on the
    hash-odd calibration half, and q̂ = the ⌈(n+1)·0.9⌉-th smallest
    residual — then "prediction ± q̂" covers ≥ 90% of future points
    with NO distributional assumption. The finite-sample ceiling
    correction (n+1, not n) is the part naive quantile pipelines get
    wrong, pinned here by the exact k_target output.

    Residuals are |int − exact-ratio| — fixed-shape doubles identical
    across engines. r11 sufficient-statistic restatement (the
    stat_wilcoxon_signed lesson applied to an order statistic): the
    per-row rank is unnecessary — q̂ is the smallest residual whose
    CUMULATIVE COUNT reaches k_target, so the corpus collapses to a
    (residual, count) value grid (residuals take at most
    |langs|·|distinct n_chars| values — bounded domain) and the
    cumsum runs over GRID rows through ``distributed_cumsum``
    (whitelisted range-repartition decomposition), never
    range-exchanging calibration rows. Census 10 → 7 with the
    corpus-sized exchange gone (the two corpus passes left are
    map-side-combined hash aggregates); value-identical — the rank-k
    element's residual IS the first grid crossing, doc_id tie-breaks
    only ever separated equal residuals. The same deterministic LCG
    as stat_bh_fdr makes the split replayable.
    """
    from etl_geonames_spark.operators.relational import distributed_cumsum

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        ((F.col("doc_id") * 1103515245 + 12345) % 2).alias("fold"),
    )
    pred = (
        d.filter(F.col("fold") == 0)
        .groupBy("lang")
        .agg(
            F.sum("x").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cells = (
        d.filter(F.col("fold") == 1)
        .groupBy("lang", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .join(F.broadcast(pred), "lang")
        .select(
            F.abs(
                F.col("x").cast("double")
                - F.col("s").cast("double") / F.col("n")
            ).alias("r"),
            "cnt",
        )
        .groupBy("r")
        .agg(F.sum("cnt").cast("long").alias("c"))
        # grid-sized; feeds the cumsum machinery AND the n_cal
        # re-aggregate (the agg_theil_index anchor rule)
        .transform(pin)
    )
    cum = distributed_cumsum(cells, ["r"], "c", "cum")
    n_cal = cells.agg(F.sum("c").cast("long").alias("n_cal"))
    k_target = F.least(
        F.ceil(
            (F.col("n_cal") + 1)
            * _CONF_ALPHA_NUM
            / F.lit(float(_CONF_ALPHA_DEN))
        ).cast("long"),
        F.col("n_cal"),
    )
    return (
        cum.crossJoin(F.broadcast(n_cal))
        .withColumn("k_target", k_target)
        .where(F.col("cum") >= F.col("k_target"))
        .groupBy("n_cal", "k_target")
        .agg(F.min("r").alias("q_hat"))
        .select("n_cal", "k_target", "q_hat")
    )


@query(
    "stat_mutual_information",
    oracle=f"""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    cm AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source
    ),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    mi AS (
        SELECT SUM(CAST(cells.o AS DOUBLE) / n.n
                   * ln(CAST(cells.o * n.n AS DOUBLE)
                        / CAST(rm.r * cm.c AS DOUBLE))) AS mi_raw
        FROM cells JOIN rm USING (lang) JOIN cm USING (source), n
    ),
    hx AS (
        SELECT SUM(-(CAST(r AS DOUBLE) / n.n)
                   * ln(CAST(r AS DOUBLE) / n.n)) AS h_raw
        FROM rm, n
    ),
    hy AS (
        SELECT SUM(-(CAST(c AS DOUBLE) / n.n)
                   * ln(CAST(c AS DOUBLE) / n.n)) AS h_raw
        FROM cm, n
    )
    SELECT {sql_qround('mi.mi_raw', 6)} AS mi_nats,
           {sql_qround('hx.h_raw', 6)} AS h_lang,
           {sql_qround('hy.h_raw', 6)} AS h_source,
           CASE WHEN hx.h_raw > 0 AND hy.h_raw > 0
                THEN {sql_qround(
                    'mi.mi_raw / sqrt(hx.h_raw * hy.h_raw)', 6
                )} END AS nmi
    FROM mi, hx, hy
    """,
)
def stat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) in nats, plus the marginal
    entropies and the √(H·H)-normalized NMI — the feature-selection /
    clustering-agreement number (Strehl & Ghosh 2002) that answers
    "how many bits does knowing the source tell you about language?".
    Sibling of stat_chi2_independence (same contingency machinery,
    different statistic): χ² gives a significance test, MI gives the
    effect in information units that compares across corpora and
    plugs into mix-design math (llm_mix_kl_divergence's global dual).

    One hash aggregate builds the cell table; margins/total are tiny
    re-aggregates broadcast back — the corpus scans once at any
    scale. Each cell term keeps the log argument as a ratio of exact
    int64 products (o·N / r·c — safe to N ≈ 3·10⁹ docs), so both
    engines run the identical IEEE ln; the sums over cells are the
    order-dependent float aggregates → qround(6) at emit, and NMI
    divides the raw sums first (the cramers_v convention). Degenerate
    1×c / r×1 tables have H = 0 on a margin → NMI NULL (never an
    ANSI divide-by-zero; the edge fixture is exactly this shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        # langs×sources rows, FIVE consumers (mi terms, both margins,
        # total, entropies' reuse of the margins) — pin once so the
        # corpus scans exactly once (the ts_acf recipe)
        .transform(pin)
    )
    rm = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    term = (
        F.col("o").cast("double") / F.col("n")
        * F.log(
            (F.col("o") * F.col("n")).cast("double")
            / (F.col("r") * F.col("c")).cast("double")
        )
    )
    mi = (
        cells.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(n))
        .agg(F.sum(term).alias("mi_raw"))
    )
    p_r = F.col("r").cast("double") / F.col("n")
    hx = (
        rm.crossJoin(F.broadcast(n))
        .agg(F.sum(-p_r * F.log(p_r)).alias("hx_raw"))
    )
    p_c = F.col("c").cast("double") / F.col("n")
    hy = (
        cm.crossJoin(F.broadcast(n))
        .agg(F.sum(-p_c * F.log(p_c)).alias("hy_raw"))
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            qround(F.col("mi_raw"), 6).alias("mi_nats"),
            qround(F.col("hx_raw"), 6).alias("h_lang"),
            qround(F.col("hy_raw"), 6).alias("h_source"),
            F.when(
                (F.col("hx_raw") > 0) & (F.col("hy_raw") > 0),
                qround(
                    F.col("mi_raw")
                    / F.sqrt(F.col("hx_raw") * F.col("hy_raw")),
                    6,
                ),
            ).alias("nmi"),
        )
    )


@query(
    "stat_benford",
    oracle=f"""
    WITH pos AS (
        SELECT CAST(substr(CAST(CAST(n_chars AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM documents WHERE n_chars > 0
    ),
    d AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM pos GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
    SELECT d.digit, d.n,
           {sql_qround('CAST(d.n AS DOUBLE) / t.total', 6)} AS obs_freq,
           {sql_qround('ln(1.0 + 1.0 / d.digit) / ln(10.0)', 6)} AS exp_freq,
           {sql_qround(
               '(CAST(d.n AS DOUBLE) - t.total * (ln(1.0 + 1.0 / d.digit)'
               ' / ln(10.0))) * (CAST(d.n AS DOUBLE) - t.total'
               ' * (ln(1.0 + 1.0 / d.digit) / ln(10.0)))'
               ' / (t.total * (ln(1.0 + 1.0 / d.digit) / ln(10.0)))', 6
           )} AS chi2_term
    FROM d, t
    """,
)
def stat_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over ``n_chars`` — the classic
    fabricated-data / broken-ingest detector (Benford 1938; Nigrini's
    forensic-accounting standard): naturally-occurring size fields
    follow P(d) = log₁₀(1 + 1/d), and a synthetic or truncated feed
    shows up as a flat or spiked digit histogram. Emits per-digit
    observed vs expected frequency and the χ² contribution, so the
    drift monitor can alert on Σ terms or on a single digit.

    The first digit comes from the int→string cast (substr of the
    decimal rendering — both engines print integers identically),
    NEVER from log10(value): floor(log10(·)) flips at exact powers of
    ten when the two engines' libm differ in the last bit. Expected
    frequencies are ln-ratio constants, identical-shape on both
    sides and qround'd with everything else. One hash aggregate on a
    ≤ 9-row key + a broadcast total — a metadata-sized plan no matter
    the corpus; zero-length docs (the edge fixture) are filtered, so
    no digit-0 row and no zero denominator anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.filter(F.col("n_chars") > 0)
        .select(
            F.substring(
                F.col("n_chars").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # ≤ 9 rows feeding the total AND the final select — pin once
        # so the corpus scans exactly once (the ts_acf recipe)
        .transform(pin)
    )
    t = d.agg(F.sum("n").cast("long").alias("total"))
    exp_p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    dev = F.col("n").cast("double") - F.col("total") * exp_p
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            qround(F.col("n").cast("double") / F.col("total"), 6).alias(
                "obs_freq"
            ),
            qround(exp_p, 6).alias("exp_freq"),
            qround(dev * dev / (F.col("total") * exp_p), 6).alias(
                "chi2_term"
            ),
        )
    )


# modified z-score threshold 3.5 (Iglewicz & Hoaglin 1993) restated as
# |x − med| > (3.5 / 0.6745) · MAD so no division ever runs; the
# constant is an expression, not a decimal literal, so both engines
# derive the identical double
_MAD_K_NUM = 3.5
_MAD_K_DEN = 0.6745


@query(
    "dq_outlier_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, ABS(e.value - med.med) AS dv
        FROM events e JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(dv) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_qround('MAX(med.med)', 6)} AS med,
           {sql_qround('MAX(mad.mad)', 6)} AS mad,
           CAST(SUM(CASE WHEN FLOOR(d.dv * 1000000.0 + 0.5) / 1000000.0
                        > FLOOR(({_MAD_K_NUM} / {_MAD_K_DEN}) * mad.mad
                                * 1000000.0 + 0.5) / 1000000.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier census: median / MAD / modified
    z-score count per event type (Iglewicz & Hoaglin 1993's |M| > 3.5
    rule) — the data-quality gate that survives the exact heavy tails
    that break mean±kσ fences (one spike inflates σ and hides itself;
    the median/MAD pair is 50%-breakdown-robust). Emits the census,
    not the flagged rows, so the output is group-sized.

    The threshold is restated multiplicatively (|x−med| > (3.5/0.6745)
    ·MAD): no division, so an all-constant group (MAD = 0) counts any
    deviation as an outlier instead of throwing ANSI DIVIDE_BY_ZERO.
    Both compare sides are qround(6)'d before the >, the cross-engine
    float-predicate discipline (repo working notes). Exact medians are
    interpolated identically (mean of middle two) by both engines.

    Shape: two keyed exact-median aggregates (each one shuffle on
    event_type — the key is low-cardinality, so AQE coalesces) with
    metadata-sized med/MAD tables broadcast back between passes. At
    100 TB the exact median swaps for approx_percentile or the
    distributed_rank primitive (same module) — the census logic is
    unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dv")
    )
    mad = dev.groupBy("event_type").agg(F.median("dv").alias("mad"))
    thr = qround(
        F.lit(_MAD_K_NUM) / F.lit(_MAD_K_DEN) * F.col("mad"), 6
    )
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            qround(F.max("med"), 6).alias("med"),
            qround(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(qround(F.col("dv"), 6) > thr, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# the two cheap "annotators" whose agreement kappa scores: length in
# characters vs length in words — correlated but not identical rules,
# so the fixture exercises every cell of the 2x2 table
_KAPPA_CHARS_MIN = 300
_KAPPA_WORDS_MIN = 50


@query(
    "stat_cohens_kappa",
    oracle=f"""
    WITH lab AS (
        SELECT CASE WHEN n_chars >= {_KAPPA_CHARS_MIN} THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_filter(str_split(text, ' '),
                                         w -> w <> '')) >= {_KAPPA_WORDS_MIN}
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lab
    )
    SELECT n11, n10, n01, n00,
           {sql_qround(
               '(CAST(n11 AS DOUBLE) + n00) / n', 6
           )} AS po,
           CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
                              + (n00 + n10) * (n00 + n01)) <> 0
                THEN {sql_qround(
                    'CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)'
                    ' + (n00 + n10) * (n00 + n01)) AS DOUBLE)'
                    ' / CAST(n * n - ((n11 + n10) * (n11 + n01)'
                    ' + (n00 + n10) * (n00 + n01)) AS DOUBLE)', 6
                )} END AS kappa
    FROM c
    """,
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two cheap document-quality annotators
    (char-length ≥ 300 vs word-count ≥ 50) — chance-corrected
    agreement (Cohen 1960), THE statistic for "do two labelers /
    filters / weak supervisors agree beyond what their marginal rates
    force?". Raw agreement po flatters imbalanced labelers; kappa is
    what an annotation-QA gate should alert on.

    Rearranged all-integer: kappa = [N(n₁₁+n₀₀) − (r₁c₁ + r₀c₀)] /
    [N² − (r₁c₁ + r₀c₀)] — numerator and denominator are exact int64
    (safe to N ≈ 3·10⁹ docs), ONE double division at emit, qround(6).
    The degenerate all-one-cell table (pe = 1, e.g. every doc long)
    NULLs instead of ANSI-throwing. One scan, one global aggregate —
    four SUMs of {0,1} products, metadata-sized output.
    """
    docs = load_table(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= _KAPPA_CHARS_MIN, 1).otherwise(0)
    b = F.when(
        F.size(F.filter(F.split("text", " "), lambda w: w != F.lit("")))
        >= _KAPPA_WORDS_MIN,
        1,
    ).otherwise(0)
    c = docs.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n00") + F.col("n10")
    ) * (F.col("n00") + F.col("n01"))
    num = F.col("n") * (F.col("n11") + F.col("n00")) - chance
    den = F.col("n") * F.col("n") - chance
    return c.select(
        "n11",
        "n10",
        "n01",
        "n00",
        qround(
            (F.col("n11").cast("double") + F.col("n00")) / F.col("n"), 6
        ).alias("po"),
        F.when(
            den != 0, qround(num.cast("double") / den.cast("double"), 6)
        ).alias("kappa"),
    )


@query(
    "llm_calibration_bins",
    oracle="""
    WITH p AS (
        SELECT vec_id,
               1.0 / (1.0 + exp(-list_sum(CAST(embedding AS DOUBLE[]))))
                   AS conf,
               label % 2 AS y
        FROM embeddings
    ),
    b AS (
        SELECT LEAST(CAST(FLOOR(FLOOR(conf * 1000000.0 + 0.5)
                                / 1000000.0 * 10.0) AS BIGINT), 9) AS bin,
               conf, y
        FROM p
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(conf) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
               AS avg_conf,
           FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
               / 1000000.0 AS acc,
           FLOOR(ABS(SUM(conf) / COUNT(*)
                     - CAST(SUM(y) AS DOUBLE) / COUNT(*))
                 * 1000000.0 + 0.5) / 1000000.0 AS gap
    FROM b GROUP BY bin
    """,
)
def llm_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram / ECE decomposition (Guo et al. 2017): a
    deterministic pseudo-classifier (sigmoid of the embedding
    component sum) scores each vector, confidences bin into 10
    equal-width buckets, and each bucket reports mean confidence vs
    empirical accuracy against the parity label — the per-bin |gap|
    whose n-weighted sum IS expected calibration error. The eval-side
    op a model-quality pipeline runs after every fine-tune; emitted
    per-bin (not pre-summed) so both ECE and the reliability plot
    read straight off the output.

    The sigmoid is one fixed-shape double expression over the
    SEQUENTIAL fold sum of the (double-cast) embedding — identical
    elementary ops both engines; the bin edge floors a qround(6)'d
    confidence so a 1-ulp exp() divergence cannot flip buckets (the
    threshold-predicate discipline). Per-bin means are
    SUM/COUNT-shaped with exact int64 counts, qround(6) at emit.
    Map-side binning + one ≤10-key aggregate — no shuffle pressure at
    any corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    s = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    conf = F.lit(1.0) / (F.lit(1.0) + F.exp(-s))
    p = emb.select(
        conf.alias("conf"), (F.col("label") % 2).alias("y")
    )
    b = p.select(
        F.least(
            F.floor(qround(F.col("conf"), 6) * 10.0).cast("long"), F.lit(9)
        ).alias("bin"),
        "conf",
        "y",
    )
    cnt = F.count(F.lit(1))
    avg_conf = F.sum("conf") / cnt
    acc = F.sum("y").cast("double") / cnt
    return b.groupBy("bin").agg(
        cnt.cast("long").alias("n"),
        qround(avg_conf, 6).alias("avg_conf"),
        qround(acc, 6).alias("acc"),
        qround(F.abs(avg_conf - acc), 6).alias("gap"),
    )


@query(
    "agg_theil_index",
    oracle=f"""
    WITH x AS (
        SELECT event_type, value AS v FROM events WHERE value > 0
    ),
    g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng, SUM(v) AS sg
        FROM x GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(sg) AS s FROM g),
    terms AS (
        SELECT SUM((x.v / t.s) * ln(x.v * t.n / t.s)) AS tot,
               SUM((x.v / t.s) * ln(x.v * g.ng / g.sg)) AS win
        FROM x JOIN g USING (event_type), t
    ),
    btw AS (
        SELECT SUM((g.sg / t.s) * ln(g.sg * t.n / (t.s * g.ng))) AS b
        FROM g, t
    )
    SELECT t.n,
           {sql_qround('terms.tot', 6)} AS theil_total,
           {sql_qround('btw.b', 6)} AS theil_between,
           {sql_qround('terms.win', 6)} AS theil_within
    FROM terms, btw, t
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's T inequality index over event values WITH its exact
    between/within-group decomposition by event type — the property
    that makes Theil (not Gini, agg_gini same module) the drift
    monitor of choice: T = T_between + T_within additively, so "did
    inequality rise because the groups diverged or because spread
    inside a group grew?" reads directly off the output (the identity
    is pinned in tests/test_stat_invariants.py; no relation to
    ts_theil_sen_daily, which is the Theil–Sen slope).

    Per-row terms are rearranged scale-free: (x/S)·ln(x·N/S) for the
    total and (x/S)·ln(x·N_g/S_g) for within — the group anchors
    broadcast in, the GLOBAL anchors re-aggregated from the (pinned,
    metadata-sized) group table so the corpus scans once for the
    groups and once for the terms, never per consumer; between comes
    from the group table alone. Both engines derive S as Σ of the
    per-group sums — same shape, so the ln arguments match. All
    divisions have positive denominators (x > 0 filter ⇒ S, S_g > 0);
    the sums are the order-dependent floats → qround(6) both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    x = ev.select("event_type", F.col("value").alias("v"))
    g = (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("v").alias("sg"),
        )
        # group-count rows, THREE consumers (terms join, between,
        # global re-aggregate) — pin once (the ts_acf recipe)
        .transform(pin)
    )
    t = g.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("sg").alias("s")
    )
    tot = (F.col("v") / F.col("s")) * F.log(
        F.col("v") * F.col("n") / F.col("s")
    )
    win = (F.col("v") / F.col("s")) * F.log(
        F.col("v") * F.col("ng") / F.col("sg")
    )
    terms = (
        x.join(F.broadcast(g), "event_type")
        .crossJoin(F.broadcast(t))
        .agg(F.sum(tot).alias("tot"), F.sum(win).alias("win"))
    )
    btw = (
        g.crossJoin(F.broadcast(t))
        .agg(
            F.sum(
                (F.col("sg") / F.col("s"))
                * F.log(
                    F.col("sg") * F.col("n") / (F.col("s") * F.col("ng"))
                )
            ).alias("b")
        )
    )
    return (
        terms.crossJoin(F.broadcast(btw))
        .crossJoin(F.broadcast(t))
        .select(
            "n",
            qround(F.col("tot"), 6).alias("theil_total"),
            qround(F.col("b"), 6).alias("theil_between"),
            qround(F.col("win"), 6).alias("theil_within"),
        )
    )


@query(
    "stat_wilcoxon_signed",
    oracle="""
    WITH pairs AS (
        SELECT a.doc_id // 2 AS pid,
               CAST(a.n_chars AS BIGINT) - CAST(b.n_chars AS BIGINT) AS d
        FROM documents a JOIN documents b
          ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
    ),
    nz AS (SELECT pid, d, ABS(d) AS ad FROM pairs WHERE d <> 0),
    rk AS (
        SELECT pid, d, ad,
               CAST(ROW_NUMBER() OVER (ORDER BY ad, pid) AS BIGINT) AS rn
        FROM nz
    ),
    mid AS (
        SELECT pid, d,
               (MIN(rn) OVER (PARTITION BY ad)
                + MAX(rn) OVER (PARTITION BY ad)) / 2.0 AS mr
        FROM rk
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CASE WHEN d > 0 THEN mr ELSE 0.0 END) AS w_plus,
               SUM(CASE WHEN d < 0 THEN mr ELSE 0.0 END) AS w_minus
        FROM mid
    )
    SELECT n,
           FLOOR(w_plus * 1000000.0 + 0.5) / 1000000.0 AS w_plus,
           FLOOR(w_minus * 1000000.0 + 0.5) / 1000000.0 AS w_minus,
           CASE WHEN n > 0 THEN
               FLOOR((w_plus - CAST(n * (n + 1) AS DOUBLE) / 4.0)
                     / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE)
                            / 24.0) * 1000000.0 + 0.5) / 1000000.0
           END AS z
    FROM s
    """,
)
def stat_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED samples — the paired
    sibling of stat_mann_whitney (which compares independent groups):
    consecutive documents pair up (2k vs 2k+1, the A/B-halves
    convention split_train_test uses), zero differences drop
    (Wilcoxon's rule), |d| midranks sum by sign, and the normal
    approximation z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24) is emitted
    (tie-variance correction omitted — documented, both engines
    identical).

    Midranks — required because integer character counts tie often —
    need no per-row rank at all (the r10 stat_kendall_w fusion
    argument taken one step further): W⁺ = Σ_|d| c⁺(|d|)·mr(|d|)
    depends only on the SIGNED (|d|, count) cell table, so one
    distributed_cumsum_multi pass over the distinct-|d| grid yields
    every midrank ((prefix) + (c+1)/2, an exact .5-rational) AND n,
    and the rank sums are sums of exact half-integers — deterministic
    in any order, so the emitted values are bit-identical to the r9
    rank-and-join-back ladder (same oracle, hash unchanged; census
    12 → 1 exchange with the checkpointed midrank table). The z division is guarded on n > 0 (an
    all-tied corpus — the edge fixture's constant docs — yields NULL,
    not DIVIDE_BY_ZERO).
    """
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("x")
    )
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pid"),
        F.col("x").alias("xa"),
    )
    b = docs.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pid"),
        F.col("x").alias("xb"),
    )
    nz = (
        a.join(b, "pid")
        .select("pid", (F.col("xa") - F.col("xb")).alias("d"))
        .filter(F.col("d") != 0)
        .select("d", F.abs("d").alias("ad"))
    )
    # the signed cell table is the sufficient statistic: midranks come
    # from the total count, the sign split carries the rank sums
    cells = (
        nz.groupBy("ad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("long")
            .alias("cp"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .transform(pin)
    )
    rc = distributed_cumsum_multi(cells, ["ad"], ["c"], ["cum"], ["nt"])
    mr = (F.col("cum") - F.col("c")).cast("double") + (
        F.col("c") + 1
    ) / 2.0
    # midrank table checkpointed (the kendall_w/ts_acf precedent):
    # distinct-|d|-sized, so the cumsum bookkeeping executes once and
    # the censused plan is scan + one aggregate
    mids = rc.select(
        "cp", "cn", F.col("nt").alias("n"), mr.alias("mr")
    ).transform(pin)
    # empty-corpus contract (all pairs tied): the oracle's COUNT(*)
    # over zero rows is 0 with NULL sums — coalesce n only
    s = mids.agg(
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n"),
        F.sum(F.col("cp") * F.col("mr")).alias("w_plus"),
        F.sum(F.col("cn") * F.col("mr")).alias("w_minus"),
    )
    z = (
        F.col("w_plus") - (F.col("n") * (F.col("n") + 1)).cast("double") / 4.0
    ) / F.sqrt(
        (F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)).cast("double")
        / 24.0
    )
    return s.select(
        "n",
        qround(F.col("w_plus"), 6).alias("w_plus"),
        qround(F.col("w_minus"), 6).alias("w_minus"),
        F.when(F.col("n") > 0, qround(z, 6)).alias("z"),
    )


# Shared global-midrank machinery for the rank-test family: ONE
# definition of the m/rk/mid/g/ties/tt/tot CTE chain, used verbatim by
# BOTH stat_kruskal_wallis and stat_dunn_posthoc oracles (the
# _SEAS_DECOMP_SQL pattern — a tie-handling fix propagates to both or
# neither, and the Dunn docstring's "SAME global midranks" claim stays
# structurally true).
_MIDRANK_SQL = """
    m AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    rk AS (
        SELECT source, x,
               CAST(ROW_NUMBER() OVER (ORDER BY x, doc_id) AS BIGINT) AS rn
        FROM m
    ),
    mid AS (
        SELECT source,
               (MIN(rn) OVER (PARTITION BY x)
                + MAX(rn) OVER (PARTITION BY x)) / 2.0 AS mr
        FROM rk
    ),
    g AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS ng, SUM(mr) AS rg
        FROM mid GROUP BY source
    ),
    ties AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM m GROUP BY x),
    tt AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS sum_t3 FROM ties),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT source) AS INT) AS k
        FROM m
    )
"""


def _midrank_tables(spark, sf_dir):
    """Spark side of _MIDRANK_SQL: one distributed_rank pass over
    (source, n_chars), the (min+max)/2 midrank tie table, the k-row
    group table (localCheckpointed — it feeds totals AND the
    consuming statistic, and without the checkpoint each consumer
    re-executes the whole rank pipeline), and the tie-cube total.
    Returns (g, tt) with columns (source, ng, rg) / (sum_t3,)."""
    from etl_geonames_spark.operators.relational import distributed_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )
    rk = distributed_rank(docs, ["x", "doc_id"]).select(
        "source", "x", F.col("_grn").cast("long").alias("rn")
    )
    ties = rk.groupBy("x").agg(
        ((F.min("rn") + F.max("rn")) / 2.0).alias("mr"),
        F.count(F.lit(1)).cast("long").alias("t"),
    ).transform(pin)
    g = (
        rk.join(F.broadcast(ties.select("x", "mr")), "x")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("mr").alias("rg"),
        )
        .transform(pin)
    )
    tt = ties.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("sum_t3")
    )
    return g, tt


@query(
    "stat_kruskal_wallis",
    oracle=f"""
    WITH {_MIDRANK_SQL},
    hh AS (
        SELECT tot.n, tot.k, tt.sum_t3,
               12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
                 * SUM(g.rg * g.rg / CAST(g.ng AS DOUBLE))
               - 3.0 * (tot.n + 1) AS h
        FROM g, tot, tt GROUP BY tot.n, tot.k, tt.sum_t3
    )
    SELECT n, k, {sql_qround('h', 6)} AS h,
           CASE WHEN n > 1 AND
                     1.0 - CAST(sum_t3 AS DOUBLE)
                           / (CAST(n AS DOUBLE) * n * n - n) <> 0.0
                THEN {sql_qround(
                    'h / (1.0 - CAST(sum_t3 AS DOUBLE)'
                    ' / (CAST(n AS DOUBLE) * n * n - n))', 6)}
           END AS h_tie
    FROM hh
    """,
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: the k-group generalization of
    stat_mann_whitney — do the per-source document-length
    distributions share a location? The one-way ANOVA a curation
    pipeline can trust without normality (lengths are heavy-tailed).

    Same distributed machinery as the two-sample tests: ONE global
    midrank pass (``distributed_rank`` + the tie table's (min+max)/2 —
    exact .5-rationals, no global window), one k-row group aggregate,
    then H = 12/(N(N+1))·ΣR_g²/n_g − 3(N+1) with the standard tie
    correction H/(1 − Σ(t³−t)/(N³−N)), guarded NULL when every value
    ties (C = 0 — ANSI would throw). The ΣR²/n float sum is k terms,
    qround-ed on both sides (the chi-square precedent for unavoidable
    float sums). At 100 TB the rank pass is the only corpus-scale
    exchange; everything after is k rows. The rank machinery is the
    shared :func:`_midrank_tables` / ``_MIDRANK_SQL`` pair — one
    definition for this test and stat_dunn_posthoc."""
    g, tt = _midrank_tables(spark, sf_dir)
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("int").alias("k"),
    )
    hh = (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tt))
        .groupBy("n", "k", "sum_t3")
        .agg(
            (
                F.lit(12.0)
                / (F.col("n").cast("double") * (F.col("n") + 1))
                * F.sum(
                    F.col("rg") * F.col("rg") / F.col("ng").cast("double")
                )
                - 3.0 * (F.col("n") + 1)
            ).alias("h")
        )
    )
    tie_c = F.lit(1.0) - F.col("sum_t3").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return hh.select(
        "n",
        "k",
        qround(F.col("h"), 6).alias("h"),
        F.when(
            (F.col("n") > 1) & (tie_c != 0.0), qround(F.col("h") / tie_c, 6)
        ).alias("h_tie"),
    )


@query(
    "stat_anova_oneway",
    oracle=f"""
    WITH m AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
    g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(x) AS BIGINT) AS sg,
               CAST(SUM(x * x) AS BIGINT) AS qg
        FROM m GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(sg) AS BIGINT) AS s,
               CAST(SUM(qg) AS BIGINT) AS q
        FROM g
    ),
    parts AS (
        SELECT tot.n, tot.k, tot.s, tot.q,
               SUM(CAST(g.sg AS DOUBLE) * g.sg / g.ng) AS sgn
        FROM g, tot GROUP BY tot.n, tot.k, tot.s, tot.q
    ),
    ss AS (
        SELECT n, k,
               sgn - CAST(s AS DOUBLE) * s / n AS ssb,
               CAST(q AS DOUBLE) - sgn AS ssw
        FROM parts
    )
    SELECT n, CAST(k AS INT) AS k,
           {sql_qround('ssb', 6)} AS ss_between,
           {sql_qround('ssw', 6)} AS ss_within,
           CASE WHEN k > 1 AND n > k AND ssw > 0.0
                THEN {sql_qround(
                    '(ssb / (k - 1)) / (ssw / (n - k))', 6)}
           END AS f_stat
    FROM ss
    """,
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over per-source document lengths — the
    parametric sibling of stat_kruskal_wallis (report both; when they
    disagree the lengths are non-normal and the rank test wins).

    Entirely from exact int64 group moments (n_g, Σx, Σx²): one
    corpus-scale hash aggregate to k rows, then
    SSB = Σs_g²/n_g − S²/N and SSW = Q − Σs_g²/n_g as fixed-shape
    double expressions. The k-term Σs²/n float sum is qround-ed on
    both sides (chi-square precedent); F is guarded NULL for k ≤ 1,
    n ≤ k, or SSW = 0 (all groups internally constant — ANSI throws
    otherwise). The partial aggregation does all the work map-side —
    this is the cheapest possible k-group test at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("qg"),
    ).transform(pin)
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("n", "k", "s", "q")
        .agg(
            F.sum(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng")
            ).alias("sgn")
        )
    )
    ssb = F.col("sgn") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q").cast("double") - F.col("sgn")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return parts.select(
        "n",
        F.col("k").cast("int").alias("k"),
        qround(ssb, 6).alias("ss_between"),
        qround(ssw, 6).alias("ss_within"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0.0),
            qround(f_stat, 6),
        ).alias("f_stat"),
    )


@query(
    "stat_two_proportion_z",
    oracle=f"""
    WITH m AS (
        SELECT doc_id % 2 AS grp,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS hit
        FROM documents
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN grp = 0 THEN hit ELSE 0 END) AS BIGINT) AS x1,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN grp = 1 THEN hit ELSE 0 END) AS BIGINT) AS x2
        FROM m
    )
    SELECT n1, x1, n2, x2,
           CASE WHEN n1 > 0 THEN {sql_qround(
               'CAST(x1 AS DOUBLE) / n1', 6)} END AS p1,
           CASE WHEN n2 > 0 THEN {sql_qround(
               'CAST(x2 AS DOUBLE) / n2', 6)} END AS p2,
           CASE WHEN n1 > 0 AND n2 > 0
                     AND x1 + x2 > 0 AND x1 + x2 < n1 + n2
                THEN {sql_qround(
                    '(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)'
                    ' / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))'
                    '        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))'
                    '        * (1.0 / n1 + 1.0 / n2))', 6)}
           END AS z
    FROM s
    """,
)
def stat_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (pooled): is the share of English docs
    the same in the even and odd doc_id halves? The A/B guardrail
    check every experimentation pipeline ships — four int64 counts in
    ONE map-side-combined aggregate, then a single fixed-shape double
    expression (deterministic IEEE both engines). Guarded NULL when a
    group is empty or the pooled proportion is degenerate (0 or 1 —
    zero variance, ANSI would throw on the division)."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias(
            "hit"
        ),
    )
    s = docs.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("hit")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("hit")).otherwise(0))
        .cast("long")
        .alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (p1 - p2) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    return s.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.when(F.col("n1") > 0, qround(p1, 6)).alias("p1"),
        F.when(F.col("n2") > 0, qround(p2, 6)).alias("p2"),
        F.when(
            (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (F.col("x1") + F.col("x2") > 0)
            & (F.col("x1") + F.col("x2") < F.col("n1") + F.col("n2")),
            qround(z, 6),
        ).alias("z"),
    )


@query(
    "stat_mann_kendall",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.c > a.c THEN 1
                    WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
        FROM dc a JOIN dc b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (
        SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat
        FROM pairs GROUP BY event_type
    ),
    ties AS (
        SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
        FROM dc GROUP BY event_type, c
    ),
    v AS (
        SELECT event_type,
               CAST(SUM(t) AS BIGINT) AS n,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM ties GROUP BY event_type
    )
    SELECT s.event_type, v.n, s.s_stat,
           CASE WHEN CAST(v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_term
                          AS DOUBLE) / 18.0 > 0.0
                THEN {sql_qround(
                    '(CAST(s.s_stat AS DOUBLE)'
                    ' - CASE WHEN s.s_stat > 0 THEN 1'
                    '        WHEN s.s_stat < 0 THEN -1 ELSE 0 END)'
                    ' / sqrt(CAST(v.n * (v.n - 1) * (2 * v.n + 5)'
                    '             - v.tie_term AS DOUBLE) / 18.0)', 6)}
           END AS z
    FROM s JOIN v USING (event_type)
    """,
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type: S = Σ_{{i<j}} sign(c_j −
    c_i) over the daily-count series (Kendall's tau against time) with
    the tie-corrected variance and continuity-corrected z — the
    standard nonparametric is-this-metric-drifting monitor, immune to
    outlier days that wreck a least-squares slope (ts_theil_sen_daily
    is its slope-estimating sibling; this one decides significance).

    S and the tie term are EXACT int64 (the only float is the final
    z expression); the day-pair self-join is O(days²) per series —
    days are a bounded domain (10 years ≈ 3.7k rows → 6.7M pairs per
    type, metadata-scale next to the corpus), and the corpus-scale
    work is the one daily hash aggregate. Zero-variance series (all
    days tied) emit NULL, not DIVIDE_BY_ZERO."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    a, b = dc.alias("a"), dc.alias("b")
    sgn = F.when(F.col("b.c") > F.col("a.c"), 1).when(
        F.col("b.c") < F.col("a.c"), -1
    ).otherwise(0)
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    ties = dc.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    v = ties.groupBy("event_type").agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
        .cast("long")
        .alias("tie_term"),
    )
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("double") / 18.0
    cc = F.when(F.col("s_stat") > 0, 1).when(
        F.col("s_stat") < 0, -1
    ).otherwise(0)
    z = (F.col("s_stat").cast("double") - cc) / F.sqrt(var)
    return s.join(v, "event_type").select(
        "event_type",
        "n",
        "s_stat",
        F.when(var > 0.0, qround(z, 6)).alias("z"),
    )


@query(
    "stat_cronbach_alpha",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM dc),
    items AS (SELECT DISTINCT event_type FROM dc),
    dense AS (
        SELECT i.event_type, d.day, COALESCE(dc.c, 0) AS x
        FROM days d CROSS JOIN items i
        LEFT JOIN dc ON dc.event_type = i.event_type AND dc.day = d.day
    ),
    per_item AS (
        SELECT event_type,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q
        FROM dense GROUP BY event_type
    ),
    per_day AS (
        SELECT day, CAST(SUM(x) AS BIGINT) AS t FROM dense GROUP BY day
    ),
    m AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM items) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM days) AS n,
               (SELECT CAST(SUM(n_i.q) AS BIGINT) FROM per_item n_i)
                   AS sum_q,
               (SELECT CAST(SUM(n_i.s * n_i.s) AS BIGINT) FROM per_item n_i)
                   AS sum_s2,
               (SELECT CAST(SUM(t) AS BIGINT) FROM per_day) AS st,
               (SELECT CAST(SUM(t * t) AS BIGINT) FROM per_day) AS qt
    )
    SELECT CAST(k AS INT) AS k, n AS n_days,
           CASE WHEN k > 1 AND n * qt - st * st <> 0
                THEN {sql_qround(
                    '(CAST(k AS DOUBLE) / (k - 1))'
                    ' * (1.0 - CAST(n * sum_q - sum_s2 AS DOUBLE)'
                    '          / CAST(n * qt - st * st AS DOUBLE))', 6)}
           END AS alpha
    FROM m
    """,
)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α over the day × event-type count matrix: do the
    per-type daily series move together enough to be summed into one
    composite activity metric? (α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) —
    the internal-consistency gate before publishing a composite KPI.)

    The day grid is densified (missing (type, day) cells are real
    zeros — skipping them would bias every variance), and BOTH
    variance sums are driven to exact int64: Σσ²ᵢ = (n·Σqᵢ − Σsᵢ²)/n²
    and σ²_total = (n·Q_T − S_T²)/n² share the n² denominator, so α's
    ratio cancels it and the whole statistic is one division of two
    exact integers — no per-item float variance sum to order. Guarded
    NULL for k ≤ 1 or a constant composite (zero total variance).
    Corpus-scale work: one (type, day) aggregate; everything after is
    k·|days| cells."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    days = dc.select("day").distinct()
    items = dc.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(items))
        .join(dc, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce(F.col("c"), F.lit(0)).alias("x")
        )
        .transform(pin)
    )
    per_item = dense.groupBy("event_type").agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    per_day = dense.groupBy("day").agg(F.sum("x").cast("long").alias("t"))
    mi = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("sum_s2"),
    )
    md = per_day.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("qt"),
    )
    m = mi.crossJoin(F.broadcast(md))
    den = F.col("n") * F.col("qt") - F.col("st") * F.col("st")
    alpha = (
        F.col("k").cast("double") / (F.col("k") - 1)
    ) * (
        1.0
        - (
            F.col("n") * F.col("sum_q") - F.col("sum_s2")
        ).cast("double")
        / den.cast("double")
    )
    return m.select(
        F.col("k").cast("int").alias("k"),
        F.col("n").alias("n_days"),
        F.when((F.col("k") > 1) & (den != 0), qround(alpha, 6)).alias(
            "alpha"
        ),
    )


@query(
    "stat_xi_correlation",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS x,
               CAST(len(list_filter(str_split(text, ' '), w -> w <> ''))
                    AS BIGINT) AS y
        FROM documents
    ),
    tx AS (
        SELECT doc_id, y,
               CAST(ROW_NUMBER() OVER (ORDER BY x, doc_id) AS BIGINT) AS t
        FROM m
    ),
    ry AS (
        SELECT doc_id, y,
               CAST(ROW_NUMBER() OVER (ORDER BY y, doc_id) AS BIGINT) AS rn
        FROM m
    ),
    yt AS (
        SELECT y, CAST(MAX(rn) AS BIGINT) AS r,
               CAST(MIN(rn) AS BIGINT) AS mn
        FROM ry GROUP BY y
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM m),
    rr AS (
        SELECT tx.t, yt.r, tot.n - yt.mn + 1 AS l
        FROM tx JOIN yt ON yt.y = tx.y, tot
    ),
    num AS (
        SELECT CAST(SUM(ABS(b.r - a.r)) AS BIGINT) AS s_num
        FROM rr a JOIN rr b ON b.t = a.t + 1
    ),
    den AS (
        SELECT CAST(SUM(l * (tot.n - l)) AS BIGINT) AS s_den
        FROM rr, tot GROUP BY tot.n
    )
    SELECT tot.n,
           CASE WHEN den.s_den > 0
                THEN {sql_qround(
                    '1.0 - CAST(tot.n AS DOUBLE) * num.s_num'
                    ' / (2.0 * den.s_den)', 6)}
           END AS xi
    FROM tot, num, den
    """,
)
def stat_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ (JASA 2020) between document length and token
    count — the modern rank correlation that detects ARBITRARY
    functional dependence (not just monotone like Spearman/Kendall):
    ξ → 1 iff y is a measurable function of x, → 0 iff independent.
    The feature-redundancy probe for curation signals: ξ(len, tokens)
    near 1 says the second feature adds nothing.

    Tie-robust form: ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n−l_i)),
    rows ordered by x; r_i = #{y_j ≤ y_i} (max rank of the y tie
    group), l_i = #{y_j ≥ y_i} (n − min rank + 1) — both from ONE
    y-rank pass plus a distinct-y tie table (the midrank machinery
    with max/min instead of mean). Ordering and y-ranks route through
    ``distributed_rank``; consecutive-by-x pairing is the t+1
    equi-join (the ACF lag pattern — never a global lag window).
    Numerator and denominator are EXACT int64; one guarded division.
    Ties in x break by doc_id (documented determinism — Chatterjee's
    randomized tie-break replaced by a stable one, identically in
    both engines)."""
    from etl_geonames_spark.operators.relational import distributed_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.size(
            F.filter(F.split("text", " "), lambda w: w != F.lit(""))
        )
        .cast("long")
        .alias("y"),
    ).transform(pin)
    tx = distributed_rank(docs, ["x", "doc_id"]).select(
        "doc_id", "y", F.col("_grn").cast("long").alias("t")
    )
    ry = distributed_rank(docs, ["y", "doc_id"]).select(
        "y", F.col("_grn").cast("long").alias("rn")
    )
    yt = ry.groupBy("y").agg(
        F.max("rn").cast("long").alias("r"),
        F.min("rn").cast("long").alias("mn"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    rr = (
        tx.join(F.broadcast(yt), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "t", "r", (F.col("n") - F.col("mn") + 1).alias("l"), "n"
        )
        .transform(pin)
    )
    a, b = rr.alias("a"), rr.alias("b")
    num = a.join(b, F.col("b.t") == F.col("a.t") + 1).agg(
        F.sum(F.abs(F.col("b.r") - F.col("a.r")))
        .cast("long")
        .alias("s_num")
    )
    den = rr.groupBy("n").agg(
        F.sum(F.col("l") * (F.col("n") - F.col("l")))
        .cast("long")
        .alias("s_den")
    )
    xi = 1.0 - F.col("n").cast("double") * F.col("s_num") / (
        2.0 * F.col("s_den")
    )
    return (
        den.crossJoin(F.broadcast(num))
        .select(
            "n",
            F.when(F.col("s_den") > 0, qround(xi, 6)).alias("xi"),
        )
    )


_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621   # 80% power


@query(
    "stat_sample_size",
    oracle=f"""
    WITH m AS (
        SELECT doc_id % 2 AS grp,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS hit
        FROM documents
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN grp = 0 THEN hit ELSE 0 END) AS BIGINT) AS x1,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN grp = 1 THEN hit ELSE 0 END) AS BIGINT) AS x2
        FROM m
    ),
    p AS (
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / n1 AS p1,
               CAST(x2 AS DOUBLE) / n2 AS p2
        FROM s WHERE n1 > 0 AND n2 > 0
    )
    SELECT {sql_qround('p1', 6)} AS p1,
           {sql_qround('p2', 6)} AS p2,
           {sql_qround('ABS(p1 - p2)', 6)} AS delta,
           CASE WHEN p1 <> p2 THEN
               CAST(CEIL(
                   ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
                   * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
                   / ((p1 - p2) * (p1 - p2))) AS BIGINT)
           END AS n_per_arm
    FROM p
    """,
)
def stat_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample-size calculator seeded by the OBSERVED
    split (α=5% two-sided, 80% power, normal approximation):
    n/arm = (z_α+z_β)²·(p₁q₁+p₂q₂)/Δ² — the how-long-must-this-test-
    run number every experimentation readout needs next to its
    p-value (stat_two_proportion_z says "not significant YET"; this
    says what sample would make the observed effect detectable).

    One integer-count aggregate (shared shape with the z-test), then
    a single fixed-shape double expression — the z constants are
    literals, identical bits both engines; Δ=0 (identical arms) emits
    NULL rather than an infinite n. ceil() of the same double cannot
    straddle engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias(
            "hit"
        ),
    )
    s = docs.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("hit")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("hit")).otherwise(0))
        .cast("long")
        .alias("x2"),
    ).filter((F.col("n1") > 0) & (F.col("n2") > 0))
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    # (a+b)*(a+b), not **2: Python pow could differ from the oracle's
    # explicit multiplication in the last ulp
    zz = (_Z_ALPHA + _Z_BETA) * (_Z_ALPHA + _Z_BETA)
    n_arm = F.ceil(
        F.lit(zz)
        * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
        / ((p1 - p2) * (p1 - p2))
    ).cast("long")
    return s.select(
        qround(p1, 6).alias("p1"),
        qround(p2, 6).alias("p2"),
        qround(F.abs(p1 - p2), 6).alias("delta"),
        F.when(p1 != p2, n_arm).alias("n_per_arm"),
    )


@query(
    "stat_wilson_ci",
    oracle=f"""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM documents
    ),
    c AS (
        SELECT n, x,
               CAST(x AS DOUBLE) / n AS p,
               1.959964 * 1.959964 AS z2
        FROM s WHERE n > 0
    )
    SELECT n, x, {sql_qround('p', 6)} AS p_hat,
           {sql_qround(
               '(p + z2 / (2 * n)'
               ' - 1.959964 * sqrt(p * (1.0 - p) / n'
               '                   + z2 / (4.0 * n * n)))'
               ' / (1.0 + z2 / n)', 6)} AS ci_lo,
           {sql_qround(
               '(p + z2 / (2 * n)'
               ' + 1.959964 * sqrt(p * (1.0 - p) / n'
               '                   + z2 / (4.0 * n * n)))'
               ' / (1.0 + z2 / n)', 6)} AS ci_hi
    FROM c
    """,
)
def stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for the English-share proportion — the
    binomial CI that behaves at the edges (never escapes [0,1],
    stays sane for p near 0/1 and small n, unlike the Wald interval
    every naive dashboard ships). The per-slice quality-rate
    companion to stat_two_proportion_z / stat_sample_size.

    One integer-count aggregate; lo/hi are single fixed-shape double
    expressions with the z² literal written identically on both
    engines. The sqrt argument is ≥ 0 algebraically (p(1−p) ≥ 0,
    z²/4n² > 0), so no guard is needed beyond n > 0."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    ).filter(F.col("n") > 0)
    p = F.col("x").cast("double") / F.col("n")
    z = 1.959964
    z2 = z * z
    n = F.col("n")
    center = p + F.lit(z2) / (2 * n)
    half = F.lit(z) * F.sqrt(
        p * (1.0 - p) / n + F.lit(z2) / (4.0 * n * n)
    )
    denom = F.lit(1.0) + F.lit(z2) / n
    return s.select(
        "n",
        "x",
        qround(p, 6).alias("p_hat"),
        qround((center - half) / denom, 6).alias("ci_lo"),
        qround((center + half) / denom, 6).alias("ci_hi"),
    )


@query(
    "ts_crosscorr_lags",
    oracle=f"""
    WITH dx AS (
      SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN dx a ON TRUE
      JOIN dx b ON b.d = a.d + l.lag
    ),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN {sql_qround(
                    '(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)'
                    ' / sqrt(CAST(n AS DOUBLE) * sxx'
                    '        - CAST(sx AS DOUBLE) * sx)'
                    ' / sqrt(CAST(n AS DOUBLE) * syy'
                    '        - CAST(sy AS DOUBLE) * sy)', 6)}
           END AS xcorr
    FROM m
    """,
)
def ts_crosscorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of the click and view daily series at lags
    −3..+3 — the LEAD-LAG detector: the argmax lag says which metric
    moves first and by how many days (instrumentation pipelines that
    should be synchronous showing xcorr peaked off zero are buffering
    or backfilling). ts_rolling_corr watches lag-0 over time; this
    profiles the lag axis over the whole span.

    Same exact-int64 moment discipline as the ACF family: the lag
    alignment is a (lag, day)-keyed equi-join against the
    7-row broadcast lag table — never a window — and the correlation
    is the guarded fixed-shape expression written as two sequential
    sqrt divisions on both engines."""
    from etl_geonames_spark.operators.timeseries import (
        _daily_click_view,
        _pearson_from_moments,
    )

    dx = _daily_click_view(spark, sf_dir)
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = dx.select(F.col("d").alias("ad"), F.col("x").alias("x"))
    b = dx.select(F.col("d").alias("bd"), F.col("y").alias("y"))
    m = (
        F.broadcast(lags)
        .join(a)
        .join(b, F.col("bd") == F.col("ad") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    corr, ok = _pearson_from_moments()
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.when(ok, qround(corr, 6)).alias("xcorr"),
    )


@query(
    "stat_friedman",
    oracle=f"""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                  FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    dc AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT days.day, types.event_type, COALESCE(dc.c, 0) AS c
      FROM days CROSS JOIN types
      LEFT JOIN dc ON dc.day = days.day
                  AND dc.event_type = types.event_type
    ),
    ranked AS (
      SELECT day, event_type, c,
             RANK() OVER (PARTITION BY day ORDER BY c)
               + (COUNT(*) OVER (PARTITION BY day, c) - 1) / 2.0
               AS r
      FROM grid
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
             SUM(r * r) AS a1
      FROM ranked
    ),
    rsums AS (
      SELECT event_type, SUM(r) AS rj FROM ranked GROUP BY event_type
    ),
    num AS (
      SELECT SUM((rj - (SELECT n * (k + 1) / 2.0 FROM dims))
                 * (rj - (SELECT n * (k + 1) / 2.0 FROM dims))) AS a
      FROM rsums
    )
    SELECT dims.n AS n_blocks, dims.k AS k_treatments,
           CASE WHEN dims.a1
                     - dims.n * dims.k * (dims.k + 1) * (dims.k + 1)
                       / 4.0 <> 0
                THEN {sql_qround(
                    '(dims.k - 1) * num.a'
                    ' / (dims.a1 - dims.n * dims.k * (dims.k + 1)'
                    '    * (dims.k + 1) / 4.0)', 6)}
           END AS q_friedman
    FROM dims, num
    """,
)
def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test over blocks = days, treatments = event types,
    response = daily event count: "do the event types rank the same
    way day after day?" — the repeated-measures companion to
    stat_kruskal_wallis (which compares independent groups; Friedman
    ranks WITHIN each block, so day-level traffic swings cancel).
    Conover's tie-safe form: Q = (k−1)·Σⱼ(Rⱼ − n(k+1)/2)² /
    (Σᵢⱼ r²ᵢⱼ − nk(k+1)²/4), which reduces to the textbook
    12/(nk(k+1))·ΣRⱼ² − 3n(k+1) when no ties exist; all-tied blocks
    make the denominator 0 → NULL (ANSI-guarded), not a throw.

    Midranks via RANK + (COUNT(day, c) − 1)/2 — multiples of 0.5, so
    every sum is exact in doubles and order-independent (qround(6)
    only at the emit is belt-and-braces). The day × type grid is
    dense-filled with zero counts so a type absent one day ranks
    lowest rather than silently shrinking the block. Scale shape: one
    fact-scale aggregate to the |days|×|types| grid; every window
    partitions by day (never global); dims/rank-sums are
    metadata-sized."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dc = ev.select(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    days = dc.select("day").distinct()
    types = dc.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(dc, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
        )
    )
    wr = Window.partitionBy("day").orderBy("c")
    wt = Window.partitionBy("day", "c")
    ranked = grid.select(
        "day",
        "event_type",
        (
            F.rank().over(wr)
            + (F.count(F.lit(1)).over(wt) - 1) / F.lit(2.0)
        ).alias("r"),
    ).transform(pin)
    dims = ranked.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("k"),
        F.sum(F.col("r") * F.col("r")).alias("a1"),
    )
    rsums = ranked.groupBy("event_type").agg(F.sum("r").alias("rj"))
    num = (
        rsums.crossJoin(F.broadcast(dims))
        .agg(
            F.sum(
                (F.col("rj") - F.col("n") * (F.col("k") + 1) / F.lit(2.0))
                * (F.col("rj") - F.col("n") * (F.col("k") + 1) / F.lit(2.0))
            ).alias("a")
        )
    )
    den = (
        F.col("a1")
        - F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
        / F.lit(4.0)
    )
    return (
        dims.crossJoin(F.broadcast(num))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("k").alias("k_treatments"),
            F.when(
                den != 0, qround((F.col("k") - 1) * F.col("a") / den, 6)
            ).alias("q_friedman"),
        )
    )


_PERM_K = 200
_PERM_P = 2147483647
_PERM_A = 2654435761
_PERM_B = 40503
_PERM_C = 2246822519


@query(
    "stat_permutation_test",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp
      FROM documents
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN v END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN grp = 0 THEN v END) AS BIGINT) AS s2,
             CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n1,
             CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n2
      FROM d
    ),
    perms AS (
      SELECT d.doc_id, d.v, gp.p,
             ((d.doc_id % {_PERM_P})
              * (({_PERM_A} + gp.p * {_PERM_C}) % {_PERM_P})
              + gp.p * {_PERM_B}) % {_PERM_P} AS h
      FROM d, LATERAL unnest(generate_series(0, {_PERM_K - 1})) AS gp(p)
    ),
    assigned AS (
      SELECT p, v,
             CASE WHEN ROW_NUMBER() OVER (
                      PARTITION BY p ORDER BY h, doc_id)
                  <= (SELECT n1 FROM obs)
                  THEN 1 ELSE 0 END AS grp
      FROM perms
    ),
    pstats AS (
      SELECT p,
             CAST(SUM(CASE WHEN grp = 1 THEN v ELSE 0 END) AS BIGINT)
               AS s1p,
             CAST(SUM(CASE WHEN grp = 0 THEN v ELSE 0 END) AS BIGINT)
               AS s2p
      FROM assigned GROUP BY p
    ),
    extreme AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_extreme
      FROM pstats, obs
      WHERE ABS(s1p * obs.n2 - s2p * obs.n1)
            >= ABS(obs.s1 * obs.n2 - obs.s2 * obs.n1)
    )
    SELECT CAST({_PERM_K} AS BIGINT) AS n_perms,
           CASE WHEN obs.n1 > 0 AND obs.n2 > 0
                THEN {sql_qround(
                    'CAST(obs.s1 AS DOUBLE) / obs.n1'
                    ' - CAST(obs.s2 AS DOUBLE) / obs.n2', 6)}
           END AS obs_diff,
           CASE WHEN obs.n1 > 0 AND obs.n2 > 0
                THEN extreme.n_extreme END AS n_extreme,
           CASE WHEN obs.n1 > 0 AND obs.n2 > 0
                THEN CAST(1 + extreme.n_extreme AS DOUBLE)
                     / CAST({_PERM_K + 1} AS DOUBLE)
           END AS p_value
    FROM obs, extreme
    """,
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the mean document-length difference
    between English and non-English docs — the distribution-free
    p-value every A/B readout should cross-check against its t-test
    (stat_welch_ttest assumes approximate normality; the permutation
    null assumes only exchangeability). K=200 fixed pseudo-random
    permutations: per permutation, docs are re-ranked by a
    deterministic integer hash and the first n₁ ranks form the
    pseudo-treatment group — EXACT group sizes like a true
    permutation (not a binomial randomization), so the null matches
    the observed design. p = (1 + #extreme)/(K+1), the add-one form
    that never returns 0.

    The extreme-count comparison is the float trap: |s̄₁ − s̄₂| on
    both sides would compare libm quotients at a boundary. Cross-
    multiplying by n₁n₂ makes it ALL-INTEGER: |S₁ₚn₂ − S₂ₚn₁| ≥
    |S₁n₂ − S₂n₁| — exact on both engines (the permuted group sizes
    equal the observed ones, so both sides scale identically). The
    per-permutation hash uses a p-DEPENDENT MULTIPLIER
    ((A + p·C) mod P), not just an additive offset — an additive
    h = id·A + p·B only rotates one fixed circular order (nearly
    every "permutation" assigns the same groups), whereas a fresh
    multiplier per p reshuffles the order itself. Both factors are
    mod-P-reduced BEFORE multiplying so the product stays < 2⁶² at
    any corpus size. One-sided corpora (n₂ = 0,
    the edge fixture) NULL every statistic rather than dividing.

    Scale shape: the K-fold fan-out is the honest cost of a
    permutation test (bounded: K × corpus rows, map-generated, no
    shuffle to build); per-perm ranking windows partition by perm id;
    the per-perm reduction is a K-row aggregate. Production would
    permute a SAMPLE (sample_per_key) first — the test's power grows
    like √n, so the fan-out never needs the full corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("v"),
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(0))
        .alias("grp"),
    )
    obs = docs.agg(
        F.sum(F.when(F.col("grp") == 1, F.col("v"))).cast("long").alias("s1"),
        F.sum(F.when(F.col("grp") == 0, F.col("v"))).cast("long").alias("s2"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("long").alias("n1"),
        F.count(F.when(F.col("grp") == 0, 1)).cast("long").alias("n2"),
    ).transform(pin)
    perms = docs.select(
        "doc_id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_K - 1))).alias("p"),
    ).withColumn(
        "h",
        (
            (F.col("doc_id") % _PERM_P)
            * ((F.lit(_PERM_A) + F.col("p") * F.lit(_PERM_C)) % _PERM_P)
            + F.col("p") * F.lit(_PERM_B)
        )
        % _PERM_P,
    )
    wp = Window.partitionBy("p").orderBy("h", "doc_id")
    assigned = perms.crossJoin(F.broadcast(obs.select("n1"))).select(
        "p",
        "v",
        F.when(F.row_number().over(wp) <= F.col("n1"), 1)
        .otherwise(0)
        .alias("grp"),
    )
    pstats = assigned.groupBy("p").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("v")).otherwise(0))
        .cast("long")
        .alias("s1p"),
        F.sum(F.when(F.col("grp") == 0, F.col("v")).otherwise(0))
        .cast("long")
        .alias("s2p"),
    )
    extreme = (
        pstats.crossJoin(F.broadcast(obs))
        .filter(
            F.abs(F.col("s1p") * F.col("n2") - F.col("s2p") * F.col("n1"))
            >= F.abs(F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1"))
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_extreme"))
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            F.lit(_PERM_K).cast("long").alias("n_perms"),
            F.when(
                ok,
                qround(
                    F.col("s1").cast("double") / F.col("n1")
                    - F.col("s2").cast("double") / F.col("n2"),
                    6,
                ),
            ).alias("obs_diff"),
            F.when(ok, F.col("n_extreme")).alias("n_extreme"),
            F.when(
                ok,
                (F.lit(1) + F.col("n_extreme")).cast("double")
                / F.lit(float(_PERM_K + 1)),
            ).alias("p_value"),
        )
    )


_TOST_MARGIN = 20.0
_TOST_CRIT = 1.645


@query(
    "stat_tost_equivalence",
    oracle=f"""
    WITH m AS (
        SELECT CAST(n_chars AS BIGINT) AS x,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    s AS (
        SELECT CAST(SUM(g) AS BIGINT) AS n1,
               CAST(SUM(1 - g) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN g = 1 THEN x * x ELSE 0 END) AS BIGINT)
                   AS q1,
               CAST(SUM(CASE WHEN g = 0 THEN x * x ELSE 0 END) AS BIGINT)
                   AS q2
        FROM m
    ),
    v AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS d,
               (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1
               + (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                   / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2 AS se2
        FROM s WHERE n1 >= 2 AND n2 >= 2
        UNION ALL
        SELECT n1, n2, NULL, NULL FROM s WHERE n1 < 2 OR n2 < 2
    ),
    t AS (
        SELECT n1, n2,
               {sql_qround('d', 6)} AS mean_diff,
               CASE WHEN se2 > 0 THEN
                   {sql_qround(f'(d + {_TOST_MARGIN}) / sqrt(se2)', 6)}
               END AS t_lower,
               CASE WHEN se2 > 0 THEN
                   {sql_qround(f'({_TOST_MARGIN} - d) / sqrt(se2)', 6)}
               END AS t_upper
        FROM v
    )
    SELECT n1, n2, mean_diff, t_lower, t_upper,
           CASE WHEN t_lower IS NULL THEN NULL
                WHEN LEAST(t_lower, t_upper) >= {_TOST_CRIT}
                THEN 1 ELSE 0 END AS equivalent
    FROM t
    """,
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987, two one-sided tests)
    on English vs non-English mean document length: the INVERSE of
    the difference tests this module already ships — instead of
    "can we reject equal means?" it asks "can we reject a difference
    larger than ±δ?", which is what a curation pipeline needs before
    declaring two shards interchangeable (failing to reject equality
    is NOT evidence of equivalence; TOST is). δ = 20 chars fixed;
    t_lower tests d > −δ, t_upper tests d < +δ; equivalence is
    declared when min(t_lower, t_upper) ≥ 1.645 (z-approximate
    critical — the Welch df here is in the thousands, where t ≈ z).

    Float discipline: the decision predicate compares the qround(6)'d
    statistics against the literal critical value on BOTH engines
    (the threshold-predicate rule, repo working notes) — never raw libm
    output. Same six exact int64 moments and one-row shape as
    stat_welch_ttest; degenerate groups NULL out. One corpus scan at
    any scale."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.col("n_chars").cast("long").alias("x"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    s = m.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("g") == 0, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(F.col("g") == 1, F.col("x") * F.col("x")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("q1"),
        F.sum(
            F.when(F.col("g") == 0, F.col("x") * F.col("x")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("q2"),
    )
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    d = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s2").cast("double") / F.col("n2")
    )
    se2 = (
        (F.col("n1").cast("double") * F.col("q1")
         - F.col("s1").cast("double") * F.col("s1"))
        / (F.col("n1").cast("double") * (F.col("n1") - 1))
        / F.col("n1")
        + (F.col("n2").cast("double") * F.col("q2")
           - F.col("s2").cast("double") * F.col("s2"))
        / (F.col("n2").cast("double") * (F.col("n2") - 1))
        / F.col("n2")
    )
    # se2 = 0 (both groups constant) must NULL, not throw: Spark ANSI
    # raises DIVIDE_BY_ZERO where DuckDB's double x/0.0 quietly NULLs
    # (the working-notes ratio rule; caught in round-6 self-review)
    ok2 = ok & (se2 > 0)
    t_lower = qround((d + F.lit(_TOST_MARGIN)) / F.sqrt(se2), 6)
    t_upper = qround((F.lit(_TOST_MARGIN) - d) / F.sqrt(se2), 6)
    return s.select(
        "n1",
        "n2",
        F.when(ok, qround(d, 6)).alias("mean_diff"),
        F.when(ok2, t_lower).alias("t_lower"),
        F.when(ok2, t_upper).alias("t_upper"),
        F.when(
            ok2,
            F.when(F.least(t_lower, t_upper) >= _TOST_CRIT, F.lit(1))
            .otherwise(F.lit(0)),
        ).alias("equivalent"),
    )


@query(
    "stat_grubbs",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q
        FROM m
    ),
    dev AS (
        SELECT CAST(MAX(ABS(m.x * s.n - s.s)) AS BIGINT) AS maxdev
        FROM m, s
    ),
    pick AS (
        SELECT CAST(MIN(m.doc_id) AS BIGINT) AS outlier_doc_id,
               CAST(arg_min(m.x, m.doc_id) AS BIGINT) AS x_outlier
        FROM m, s, dev
        WHERE ABS(m.x * s.n - s.s) = dev.maxdev
    )
    SELECT s.n,
           CASE WHEN s.n >= 3 AND s.n * s.q - s.s * s.s <> 0
                THEN {sql_qround(
                    'dev.maxdev / CAST(s.n AS DOUBLE)'
                    ' / sqrt(CAST(s.n * s.q - s.s * s.s AS DOUBLE)'
                    '        / (CAST(s.n AS DOUBLE) * (s.n - 1)))', 6)}
           END AS g_stat,
           CASE WHEN s.n >= 3 AND s.n * s.q - s.s * s.s <> 0
                THEN pick.outlier_doc_id END AS outlier_doc_id,
           CASE WHEN s.n >= 3 AND s.n * s.q - s.s * s.s <> 0
                THEN pick.x_outlier END AS x_outlier
    FROM s, dev, pick
    """,
)
def stat_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate statistic over document
    lengths: G = max|x − x̄| / s, plus WHICH document achieves it —
    the single-most-suspicious-point screen (dq_outlier_mad flags all
    points past a robust gate; Grubbs ranks the one worst point on
    the classical normal-theory scale, the number you compare to a
    t-derived critical value at your chosen α downstream).

    Integer argmax discipline: |x − x̄| ordering equals |n·x − Σx|
    ordering (multiply through by n), so the max deviation AND the
    argmax document are found on exact int64 keys — no float-boundary
    argmax (the weighted-sampling ORDER BY rule). G itself is one
    fixed-shape double expression over (maxdev, n, Σx, Σx²),
    qround(6). Ties break to the smallest doc_id on both engines.

    Shape: one moment aggregate, then one column-pruned re-scan for
    the integer max-dev + argmax against the broadcast 1-row moments
    (the honest-extra-pass pattern, cf. dq_freshness — the scan reads
    two columns). Degenerate inputs (n < 3 or zero variance) NULL out
    rather than throw."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select("doc_id", F.col("n_chars").cast("long").alias("x"))
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    ).transform(pin)
    withdev = m.crossJoin(F.broadcast(s)).select(
        "doc_id",
        "x",
        F.abs(F.col("x") * F.col("n") - F.col("s")).alias("dev"),
    )
    # n/s/q come from the checkpointed 1-row moments aggregate, NOT
    # re-derived via max() over the per-row scan: on an EMPTY corpus
    # max() yields n = NULL while the oracle's COUNT(*)-based CTE
    # yields n = 0 (ADVICE r6 item 1) — the agg over the empty scan
    # still emits one row (maxdev/pick NULL), matching the oracle's
    # cross-join shape.
    agg = withdev.agg(
        F.max("dev").alias("maxdev"),
        F.min_by(
            F.struct(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("x").cast("long").alias("x"),
            ),
            F.struct((-F.col("dev")).alias("negdev"), F.col("doc_id")),
        ).alias("pick"),
    ).crossJoin(F.broadcast(s))
    ok = (F.col("n") >= 3) & (
        F.col("n") * F.col("q") - F.col("s") * F.col("s") != 0
    )
    g_stat = (
        F.col("maxdev") / F.col("n").cast("double")
        / F.sqrt(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            .cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return agg.select(
        "n",
        F.when(ok, qround(g_stat, 6)).alias("g_stat"),
        F.when(ok, F.col("pick.doc_id")).alias("outlier_doc_id"),
        F.when(ok, F.col("pick.x")).alias("x_outlier"),
    )


@query(
    "ts_entropy_rate",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS next_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    t AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
        FROM c GROUP BY prev_type
    ),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM c)
    SELECT g.grand AS n_transitions,
           CAST(COUNT(DISTINCT c.prev_type) AS BIGINT) AS n_states,
           {sql_qround(
               'SUM(CASE WHEN c.n = t.tot THEN 0.0 ELSE '
               '-(c.n / CAST(g.grand AS DOUBLE))'
               ' * ln(c.n / CAST(t.tot AS DOUBLE)) END)', 6)}
               AS entropy_rate_nats,
           {sql_qround(
               'SUM(CASE WHEN c.n = t.tot THEN 0.0 ELSE '
               '-(c.n / CAST(g.grand AS DOUBLE))'
               ' * ln(c.n / CAST(t.tot AS DOUBLE)) END)'
               ' / ln(2.0)', 6)} AS entropy_rate_bits
    FROM c JOIN t USING (prev_type), g
    GROUP BY g.grand
    """,
)
def ts_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the per-user event-type process —
    H = −Σᵢⱼ p̂(i,j)·ln p̂(j|i) over the first-order transition
    counts (the plug-in estimator of the Markov chain's entropy
    rate): how PREDICTABLE the next event is given the current one.
    0 bits = deterministic sessions (bot-like replay), ln|types| =
    memoryless uniform churn — the single-number summary of the
    matrix stat_markov_transitions emits in full, and the quantity
    sequence-model pretraining uses to price a behavioural corpus
    (compressibility floor).

    Deterministic-row terms (n = tot ⟹ p(j|i) = 1) contribute
    exactly 0 and are CASE'd out so ln(1)'s sign-zero can't wobble;
    everything else divides exact int64 counts. The grand total
    re-aggregates from the transition-count table (global-anchor
    discipline — no second corpus scan). qround(6) on the one float
    sum, both engines.

    Shape: one user-keyed lag window (the allowed partitioned shape),
    one |types|²-row count aggregate; the entropy reduction runs on
    that metadata-sized table."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).transform(pin)
    t = c.groupBy("prev_type").agg(F.sum("n").cast("long").alias("tot"))
    g = c.agg(F.sum("n").cast("long").alias("grand"))
    term = F.when(F.col("n") == F.col("tot"), F.lit(0.0)).otherwise(
        -(F.col("n") / F.col("grand").cast("double"))
        * F.log(F.col("n") / F.col("tot").cast("double"))
    )
    joined = c.join(F.broadcast(t), "prev_type").crossJoin(F.broadcast(g))
    return joined.groupBy("grand").agg(
        F.max("grand").cast("long").alias("n_transitions"),
        F.count_distinct("prev_type").cast("long").alias("n_states"),
        qround(F.sum(term), 6).alias("entropy_rate_nats"),
        qround(F.sum(term) / F.log(F.lit(2.0)), 6).alias(
            "entropy_rate_bits"
        ),
    ).drop("grand")


@query(
    "stat_page_trend",
    oracle=f"""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                  FROM events),
    bins(b) AS (VALUES (0), (1), (2), (3)),
    dc AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(hour(ts) // 6 AS INT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT days.day, bins.b, COALESCE(dc.c, 0) AS c
      FROM days CROSS JOIN bins
      LEFT JOIN dc ON dc.day = days.day AND dc.b = bins.b
    ),
    ranked AS (
      SELECT day, b, c,
             RANK() OVER (PARTITION BY day ORDER BY c)
               + (COUNT(*) OVER (PARTITION BY day, c) - 1) / 2.0 AS r
      FROM grid
    ),
    l AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_blocks,
             CAST(SUM((b + 1) * CAST(2 * r AS BIGINT)) AS BIGINT) AS l2
      FROM ranked
    )
    SELECT n_blocks, CAST(4 AS BIGINT) AS k_treatments,
           l2 / 2.0 AS l_stat,
           25.0 * n_blocks AS e_l,
           CASE WHEN n_blocks > 0 THEN {sql_qround(
               '(l2 / 2.0 - 25.0 * n_blocks)'
               ' / sqrt(n_blocks * 25.0 / 3.0)', 6)}
           END AS z
    FROM l
    """,
)
def stat_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for ORDERED alternatives (Page 1963): blocks =
    days, treatments = the four intraday 6-hour bins in time-of-day
    order, response = event count. Friedman (stat_friedman) asks "do
    treatments differ AT ALL?"; Page asks the sharper monotone
    question — "does traffic RISE across the day?" — and has more
    power when the alternative really is ordered (the diurnal-load
    question capacity planning actually asks). L = Σⱼ j·Rⱼ with Rⱼ
    the rank-sum of bin j (midranks within each day); under H0
    E[L] = b·k(k+1)²/4 (= 25b for k = 4) and Var[L] =
    b(k³−k)²/(144(k−1)) (= 25b/3), giving the normal z
    approximation. Midrank ties make the variance slightly
    conservative — documented, standard.

    Integer core: midranks are halves, so 2r is exact int64 and L
    emits as l2/2.0 — no order-dependent float sum; only z divides
    (qround 6). Same dense zero-filled grid and day-partitioned
    rank windows as stat_friedman (shared discipline: a bin absent
    one day ranks lowest, never silently shrinks the block).

    Shape: one fact-scale aggregate to the |days|×4 grid; windows
    partition by day; the reduction is 1 row."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dc = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        (F.hour("ts") / 6).cast("int").alias("b"),
    ).groupBy("day", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    days = dc.select("day").distinct()
    bins = spark.range(4).select(F.col("id").cast("int").alias("b"))
    grid = (
        days.crossJoin(F.broadcast(bins))
        .join(dc, ["day", "b"], "left")
        .select(
            "day",
            "b",
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
        )
    )
    wr = Window.partitionBy("day").orderBy("c")
    wt = Window.partitionBy("day", "c")
    ranked = grid.select(
        "day",
        "b",
        (
            F.rank().over(wr)
            + (F.count(F.lit(1)).over(wt) - 1) / F.lit(2.0)
        ).alias("r"),
    )
    lt = ranked.agg(
        F.countDistinct("day").cast("long").alias("n_blocks"),
        F.sum(
            (F.col("b") + 1) * (F.lit(2.0) * F.col("r")).cast("long")
        )
        .cast("long")
        .alias("l2"),
    )
    z = (F.col("l2") / 2.0 - 25.0 * F.col("n_blocks")) / F.sqrt(
        F.col("n_blocks") * F.lit(25.0) / F.lit(3.0)
    )
    return lt.select(
        "n_blocks",
        F.lit(4).cast("long").alias("k_treatments"),
        (F.col("l2") / F.lit(2.0)).alias("l_stat"),
        (F.lit(25.0) * F.col("n_blocks")).alias("e_l"),
        F.when(F.col("n_blocks") > 0, qround(z, 6)).alias("z"),
    )


@query(
    "stat_mcnemar",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(list_filter(str_split(text, ' '),
                               w -> w <> '')) > 55
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS disc_b,
             CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS disc_c
      FROM m
    )
    SELECT n, disc_b, disc_c,
           CASE WHEN disc_b + disc_c > 0
                THEN {sql_qround(
                    'CAST((disc_b - disc_c) * (disc_b - disc_c) AS DOUBLE)'
                    ' / (disc_b + disc_c)', 6)}
           END AS chi2
    FROM c
    """,
)
def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for PAIRED binary raters — the model-eval
    comparison the unpaired two-proportion z gets wrong: when rater A
    (long-document gate, n_chars > 300) and rater B (long-token gate,
    > 55 tokens) judge the SAME documents, only the discordant cells
    b (A yes, B no) and c (A no, B yes) carry information about which
    rater fires more, and χ² = (b−c)²/(b+c) tests their symmetry.
    This is how two classifier/filter versions are compared on a
    shared eval set (did the new quality gate change decisions
    beyond noise?), complementing stat_two_proportion_z's
    independent-samples shape.

    All-integer core: both indicator columns and both discordant
    counts are exact int64; χ² is one fixed-shape double division
    over three integers, qround(6). b + c = 0 (perfect agreement)
    NULLs the statistic — χ² is undefined, not 0.

    Scale: one map-side pair of indicator expressions + one global
    aggregate — no shuffle beyond the 1-row reduce."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.when(F.col("n_chars") > 300, 1).otherwise(0).alias("a"),
        F.when(
            F.size(
                F.filter(F.split("text", " "), lambda w: w != F.lit(""))
            )
            > 55,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    c = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("long")
        .alias("disc_b"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("disc_c"),
    )
    diff = F.col("disc_b") - F.col("disc_c")
    chi2 = (diff * diff).cast("double") / (
        F.col("disc_b") + F.col("disc_c")
    )
    return c.select(
        "n",
        "disc_b",
        "disc_c",
        F.when(F.col("disc_b") + F.col("disc_c") > 0, qround(chi2, 6)).alias(
            "chi2"
        ),
    )


@query(
    "stat_cochran_q",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS x1,
             CASE WHEN len(list_filter(str_split(text, ' '),
                               w -> w <> '')) > 55
                  THEN 1 ELSE 0 END AS x2,
             CASE WHEN n_chars > 350 THEN 1 ELSE 0 END AS x3
      FROM documents
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS g1,
             CAST(SUM(x2) AS BIGINT) AS g2,
             CAST(SUM(x3) AS BIGINT) AS g3,
             CAST(SUM(x1 + x2 + x3) AS BIGINT) AS sl,
             CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sl2
      FROM m
    )
    SELECT n, g1, g2, g3,
           CASE WHEN 3 * sl - sl2 > 0
                THEN {sql_qround(
                    'CAST(3 * 2 * (9 * (g1 * g1 + g2 * g2 + g3 * g3)'
                    '     - 3 * (g1 + g2 + g3) * (g1 + g2 + g3))'
                    '     AS DOUBLE) / (9 * (3 * sl - sl2))', 6)}
           END AS q_stat
    FROM s
    """,
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for k = 3 MATCHED binary treatments (three quality
    gates — n_chars > 250, tokens > 55, n_chars > 350 — applied to
    the same documents): do the gates fire at the same rate, the
    k-treatment generalization of stat_mcnemar exactly as
    stat_friedman generalizes the paired signed-rank. Q =
    k(k−1)·Σ_j(G_j − Ḡ)² / (k·ΣL_i − ΣL_i²) with G_j the gate
    totals and L_i the per-document hit counts; under H₀ Q ~ χ²(k−1)
    — the screen run before treating one gate as a drop-in for
    another.

    Integer core via multiply-through: Σ(G_j − Ḡ)² = (9·ΣG² −
    3·(ΣG)²)/9 exactly, so the numerator 3·2·(9ΣG² − 3(ΣG)²) and the
    denominator 9·(3·ΣL − ΣL²) are exact int64 and Q is ONE double
    division, qround(6). Degenerate corpora (every document hits all
    gates or none ⟹ 3ΣL = ΣL²) NULL the statistic.

    Scale: three map-side indicators + one global aggregate of five
    integer sums — no shuffle beyond the 1-row reduce."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.size(F.filter(F.split("text", " "), lambda w: w != F.lit("")))
    m = docs.select(
        F.when(F.col("n_chars") > 250, 1).otherwise(0).alias("x1"),
        F.when(tok > 55, 1).otherwise(0).alias("x2"),
        F.when(F.col("n_chars") > 350, 1).otherwise(0).alias("x3"),
    ).withColumn("l", F.col("x1") + F.col("x2") + F.col("x3"))
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("g1"),
        F.sum("x2").cast("long").alias("g2"),
        F.sum("x3").cast("long").alias("g3"),
        F.sum("l").cast("long").alias("sl"),
        F.sum(F.col("l") * F.col("l")).cast("long").alias("sl2"),
    )
    gsum = F.col("g1") + F.col("g2") + F.col("g3")
    gsq = (
        F.col("g1") * F.col("g1")
        + F.col("g2") * F.col("g2")
        + F.col("g3") * F.col("g3")
    )
    num = (F.lit(6) * (F.lit(9) * gsq - F.lit(3) * gsum * gsum)).cast(
        "double"
    )
    den = F.lit(9) * (F.lit(3) * F.col("sl") - F.col("sl2"))
    return s.select(
        "n",
        "g1",
        "g2",
        "g3",
        F.when(den > 0, qround(num / den, 6)).alias("q_stat"),
    )


@query(
    "stat_jarque_bera",
    oracle=f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s1,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2,
             SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars) AS s3,
             SUM(CAST(n_chars AS DOUBLE) * n_chars * n_chars
                 * n_chars) AS s4
      FROM documents
    ),
    c AS (
      SELECT n,
             (s2 - CAST(s1 AS DOUBLE) * s1 / CAST(n AS DOUBLE)) / n AS m2,
             (s3 - 3.0 * s1 * s2 / n
                 + 2.0 * s1 * s1 * s1 / CAST(n AS DOUBLE) / n) / n AS m3,
             (s4 - 4.0 * s1 * s3 / n
                 + 6.0 * s1 * s1 * s2 / CAST(n AS DOUBLE) / n
                 - 3.0 * s1 * s1 * s1 * s1
                     / CAST(n AS DOUBLE) / n / n) / n AS m4
      FROM s
    )
    SELECT n,
           CASE WHEN n >= 2 AND m2 > 0
                THEN {sql_qround('m3 / (m2 * sqrt(m2))', 6)} END AS skewness,
           CASE WHEN n >= 2 AND m2 > 0
                THEN {sql_qround('m4 / (m2 * m2) - 3.0', 6)}
           END AS ex_kurtosis,
           CASE WHEN n >= 2 AND m2 > 0
                THEN {sql_qround(
                    'n / 6.0 * (m3 / (m2 * sqrt(m2)) * (m3 / (m2 * sqrt(m2)))'
                    ' + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)'
                    ' / 4.0)', 6)}
           END AS jb_stat
    FROM c
    """,
)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality screen over document lengths: JB =
    n/6·(S² + K²/4) with S the skewness and K the excess kurtosis —
    under normality JB ~ χ²(2), so a large JB says the length
    distribution has the heavy tail / asymmetry that makes
    mean±k·sd gates (dq-style outlier rules) miscalibrated. Run it
    BEFORE trusting a z-score-based quality threshold; its two
    components are exactly the 3rd/4th standardized moments
    agg_higher_moments reports per group, here composed into the one
    decision number (Jarque & Bera 1980).

    Mixed-precision core: S1/S2 are exact int64 sums (Σx² needs
    ~1e9 max-length docs to threaten 2⁶³); S3/S4 are DOUBLE sums
    with a per-term cast-before-multiply (CAST(x AS DOUBLE)·x·x·x)
    so no intermediate ever overflows at ANY corpus size — raw
    int64 power sums up to Σx⁴ would throw under ANSI at larger
    corpora than the fixture (ADVICE r7). The per-term products are
    identical IEEE doubles on both engines; summation-order drift
    is ~ulp-scale relative to the O(1) standardized moments and
    sits far inside the qround(6) grid. Zero variance NULLs all
    three.

    Scale: one map-side power expression + a 1-row global reduce —
    the same single-aggregate shape as agg_higher_moments."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("long")
    xd = F.col("n_chars").cast("double")
    s = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("s1"),
        F.sum(x * x).cast("long").alias("s2"),
        F.sum(xd * x * x).alias("s3"),
        F.sum(xd * x * x * x).alias("s4"),
    )
    n = F.col("n")
    nd = n.cast("double")
    # s1 cast-before-multiply: the int64 square overflows past
    # Σ n_chars ≈ 3e9 (same ANSI-overflow class as the s3/s4 fix)
    m2 = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / nd) / n
    m3 = (
        F.col("s3")
        - F.lit(3.0) * F.col("s1") * F.col("s2") / n
        + F.lit(2.0) * F.col("s1") * F.col("s1") * F.col("s1") / nd / n
    ) / n
    m4 = (
        F.col("s4")
        - F.lit(4.0) * F.col("s1") * F.col("s3") / n
        + F.lit(6.0) * F.col("s1") * F.col("s1") * F.col("s2") / nd / n
        - F.lit(3.0)
        * F.col("s1")
        * F.col("s1")
        * F.col("s1")
        * F.col("s1")
        / nd
        / n
        / n
    ) / n
    ok = (n >= 2) & (m2 > 0)
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + exk * exk / F.lit(4.0))
    return s.select(
        "n",
        F.when(ok, qround(skew, 6)).alias("skewness"),
        F.when(ok, qround(exk, 6)).alias("ex_kurtosis"),
        F.when(ok, qround(jb, 6)).alias("jb_stat"),
    )


@query(
    "stat_cohens_d",
    oracle=f"""
    WITH g AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             CAST(n_chars AS BIGINT) AS x
      FROM documents
    ),
    s AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM g GROUP BY grp
    ),
    w AS (
      SELECT a.n AS n1, a.s1 AS a1, a.s2 AS a2,
             b.n AS n0, b.s1 AS b1, b.s2 AS b2
      FROM s a, s b WHERE a.grp = 1 AND b.grp = 0
    )
    SELECT n1, n0,
           CASE WHEN n1 >= 2 AND n0 >= 2
                     AND (n1 * a2 - a1 * a1) + (n0 * b2 - b1 * b1) > 0
                THEN {sql_qround(
                    '(CAST(a1 AS DOUBLE) / n1 - CAST(b1 AS DOUBLE) / n0)'
                    ' / sqrt(((a2 - CAST(a1 AS DOUBLE) * a1 / n1)'
                    '         + (b2 - CAST(b1 AS DOUBLE) * b1 / n0))'
                    '        / (n1 + n0 - 2))', 6)}
           END AS cohens_d,
           CASE WHEN n1 >= 2 AND n0 >= 2
                     AND (n1 * a2 - a1 * a1) + (n0 * b2 - b1 * b1) > 0
                THEN {sql_qround(
                    '(CAST(a1 AS DOUBLE) / n1 - CAST(b1 AS DOUBLE) / n0)'
                    ' / sqrt(((a2 - CAST(a1 AS DOUBLE) * a1 / n1)'
                    '         + (b2 - CAST(b1 AS DOUBLE) * b1 / n0))'
                    '        / (n1 + n0 - 2))'
                    ' * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0))', 6)}
           END AS hedges_g
    FROM w
    """,
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-sd standardized mean difference) plus the
    small-sample Hedges' g correction, for English vs non-English
    document lengths: the EFFECT SIZE that p-value tests
    (stat_welch_ttest, agg_ab_ttest) deliberately do not report — at
    corpus scale everything is "significant", and d is the number
    that says whether the difference matters (0.2/0.5/0.8 small/
    medium/large). The standard companion printed next to every A/B
    verdict.

    Integer core: per-group (n, Σx, Σx²) are exact int64 over int64
    n_chars; d = (x̄₁−x̄₀)/s_pooled is one fixed-shape double
    expression over six integers, g = d·(1 − 3/(4(n₁+n₀)−9)), both
    qround(6). A group with n < 2 or zero pooled variance NULLs
    both (the one-sided-corpus edge fixture).

    Scale: one 2-group hash aggregate + a broadcast-sized self-pair
    — the agg_ab_ttest plan with a different emit."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.col("n_chars").cast("long").alias("x"),
    )
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    a = s.filter(F.col("grp") == 1).select(
        F.col("n").alias("n1"), F.col("s1").alias("a1"), F.col("s2").alias("a2")
    )
    b = s.filter(F.col("grp") == 0).select(
        F.col("n").alias("n0"), F.col("s1").alias("b1"), F.col("s2").alias("b2")
    )
    w = a.crossJoin(F.broadcast(b))
    ssw = (
        F.col("a2") - F.col("a1").cast("double") * F.col("a1") / F.col("n1")
    ) + (
        F.col("b2") - F.col("b1").cast("double") * F.col("b1") / F.col("n0")
    )
    # both bracketed terms are >= 0 (Cauchy-Schwarz), so their plain
    # sum tests pooled variance > 0 WITHOUT the n^2 multipliers that
    # overflow int64 at ~2x the sf0.1 fixture size (round-7 review)
    pooled_ok = (
        (F.col("n1") * F.col("a2") - F.col("a1") * F.col("a1"))
        + (F.col("n0") * F.col("b2") - F.col("b1") * F.col("b1"))
    ) > 0
    ok = (F.col("n1") >= 2) & (F.col("n0") >= 2) & pooled_ok
    d = (
        F.col("a1").cast("double") / F.col("n1")
        - F.col("b1").cast("double") / F.col("n0")
    ) / F.sqrt(ssw / (F.col("n1") + F.col("n0") - 2))
    gcorr = d * (
        F.lit(1.0)
        - F.lit(3.0) / (F.lit(4.0) * (F.col("n1") + F.col("n0")) - F.lit(9.0))
    )
    return w.select(
        "n1",
        "n0",
        F.when(ok, qround(d, 6)).alias("cohens_d"),
        F.when(ok, qround(gcorr, 6)).alias("hedges_g"),
    )


@query(
    "stat_cochran_armitage",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN n_chars < 250 THEN 0
                  WHEN n_chars < 350 THEN 1 ELSE 2 END AS wk,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS yy,
             CAST(SUM(wk * y) AS BIGINT) AS swy,
             CAST(SUM(wk) AS BIGINT) AS swn,
             CAST(SUM(wk * wk) AS BIGINT) AS sw2n
      FROM m
    )
    SELECT n, yy AS n_success, swn AS sum_w, swy AS sum_wy,
           CASE WHEN yy > 0 AND yy < n
                     AND n * sw2n - swn * swn > 0
                THEN {sql_qround(
                    '(swy - CAST(yy AS DOUBLE) * swn / n)'
                    ' / sqrt(CAST(yy AS DOUBLE) / n'
                    '        * (1.0 - CAST(yy AS DOUBLE) / n)'
                    '        * (sw2n - CAST(swn AS DOUBLE) * swn / n))',
                    6)}
           END AS z_trend
    FROM s
    """,
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the English rate MONOTONE in
    document length across the ordered buckets (<250 / 250-349 /
    ≥350 chars, scores 0/1/2)? The ordered-alternative sibling of
    stat_chi2_independence — chi-square spends power on every
    departure from independence, while the trend statistic
    z = (Σwy − p̄Σwn)/√(p̄q̄(Σw²n − (Σwn)²/n)) concentrates it on the
    dose-response direction, which is what a curation dashboard
    usually asks ("does quality rise with length?"); under H₀
    z ~ N(0,1) (Armitage 1955). Pairs with stat_page_trend (ranked
    blocks) as the proportions-version.

    Integer core: the five sufficient statistics (n, Y, Σwy, Σwn,
    Σw²n) are exact int64 over 0/1/2 scores and 0/1 outcomes; z is
    one fixed-shape double expression, qround(6). Degenerate corpora
    (all/no successes, single occupied bucket) NULL the statistic.

    Scale: two map-side CASE columns + a 1-row global reduce."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.when(F.col("n_chars") < 250, 0)
        .when(F.col("n_chars") < 350, 1)
        .otherwise(2)
        .alias("wk"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("yy"),
        F.sum(F.col("wk") * F.col("y")).cast("long").alias("swy"),
        F.sum("wk").cast("long").alias("swn"),
        F.sum(F.col("wk") * F.col("wk")).cast("long").alias("sw2n"),
    )
    n, yy = F.col("n"), F.col("yy")
    pbar = yy.cast("double") / n
    ok = (yy > 0) & (yy < n) & (
        n * F.col("sw2n") - F.col("swn") * F.col("swn") > 0
    )
    z = (
        F.col("swy") - yy.cast("double") * F.col("swn") / n
    ) / F.sqrt(
        pbar
        * (F.lit(1.0) - pbar)
        * (F.col("sw2n") - F.col("swn").cast("double") * F.col("swn") / n)
    )
    return s.select(
        "n",
        yy.alias("n_success"),
        F.col("swn").alias("sum_w"),
        F.col("swy").alias("sum_wy"),
        F.when(ok, qround(z, 6)).alias("z_trend"),
    )


@query(
    "stat_fleiss_kappa",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_filter(str_split(text, ' '), w -> w <> '') AS tk
      FROM documents
    ),
    v AS (
      SELECT doc_id,
             (CASE WHEN len(tk) >= 10 THEN 1 ELSE 0 END
              + CASE WHEN len(tk) > 0 AND
                          CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
                          >= 0.5 THEN 1 ELSE 0 END
              + CASE WHEN len(tk) > 0 AND
                          CAST(COALESCE(list_sum(list_transform(tk,
                              w -> length(w))), 0) AS DOUBLE) / len(tk)
                          BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END) AS n1
      FROM g
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(n1), 0) AS BIGINT) AS t1,
             CAST(COALESCE(SUM(n1 * n1 + (3 - n1) * (3 - n1)), 0)
                 AS BIGINT) AS sq
      FROM v
    )
    SELECT n, t1,
           CASE WHEN n > 0 THEN
             {sql_qround('(sq - 3.0 * n) / (6.0 * n)', 6)} END AS p_bar,
           CASE WHEN n > 0 THEN
             {sql_qround(
                 '(CAST(t1 AS DOUBLE) * t1'
                 ' + (3.0 * n - t1) * (3.0 * n - t1))'
                 ' / (9.0 * n * n)', 6)} END AS p_e,
           CASE WHEN n > 0 AND
                     (CAST(t1 AS DOUBLE) * t1
                      + (3.0 * n - t1) * (3.0 * n - t1))
                     / (9.0 * n * n) < 1.0 THEN
             {sql_qround(
                 '((sq - 3.0 * n) / (6.0 * n)'
                 ' - (CAST(t1 AS DOUBLE) * t1'
                 '    + (3.0 * n - t1) * (3.0 * n - t1)) / (9.0 * n * n))'
                 ' / (1.0 - (CAST(t1 AS DOUBLE) * t1'
                 '    + (3.0 * n - t1) * (3.0 * n - t1)) / (9.0 * n * n))',
                 6)}
           END AS kappa
    FROM s
    """,
)
def stat_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ (Fleiss 1971) for m = 3 raters × 2 categories: the
    multi-rater generalization of stat_cohens_kappa, here measuring
    agreement between three independent rule-based quality gates
    (token-count ≥ 10, type-token ratio ≥ 0.5, mean word length in
    [2, 12]) each voting good/bad per document. High κ says the
    cheap gates are redundant; κ near 0 says they capture different
    failure modes and a curation funnel needs all of them — the
    quantified version of the question llm_quality_funnel answers by
    stage counts.

    Exact integer core: per-doc good-vote count n1 ∈ {{0..3}} and the
    two corpus sums Σn1 and Σ(n1² + (3−n1)²); P̄, P_e and κ are
    fixed-shape double expressions over (n, t1, sq), qround(6).
    Unanimity (P_e = 1, κ undefined) and the empty corpus emit NULL.

    100 TB: the votes are map-only array expressions riding the scan;
    one 1-row global aggregate — the agg_global shape (spread() for
    the single-file fixture's one-partition scan, repo working notes)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tk = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    t = docs.select(tk.alias("tk"))
    n = F.size("tk")
    # NULL-guarded ratios: a plain n > 0 conjunct would not stop ANSI
    # from evaluating the division on empty docs (no short-circuit) —
    # the when() wraps make the ratio itself NULL, and NULL predicates
    # fall through to otherwise(0), matching the oracle's FALSE gates
    nd = F.when(n > 0, n.cast("double"))
    ttr = F.size(F.array_distinct("tk")) / nd
    mwl = (
        F.aggregate(
            F.transform("tk", F.length),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / nd
    )
    n1 = (
        F.when(n >= 10, 1).otherwise(0)
        + F.when(ttr >= 0.5, 1).otherwise(0)
        + F.when((mwl >= 2.0) & (mwl <= 12.0), 1).otherwise(0)
    )
    s = t.select(n1.alias("n1")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("n1"), F.lit(0)).cast("long").alias("t1"),
        F.coalesce(
            F.sum(
                F.col("n1") * F.col("n1")
                + (F.lit(3) - F.col("n1")) * (F.lit(3) - F.col("n1"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sq"),
    )
    nn = F.col("n")
    t1 = F.col("t1").cast("double")
    p_bar = (F.col("sq") - 3.0 * nn) / (6.0 * nn)
    p_e = (t1 * t1 + (3.0 * nn - t1) * (3.0 * nn - t1)) / (9.0 * nn * nn)
    return s.select(
        "n",
        "t1",
        F.when(nn > 0, qround(p_bar, 6)).alias("p_bar"),
        F.when(nn > 0, qround(p_e, 6)).alias("p_e"),
        F.when((nn > 0) & (p_e < 1.0), qround((p_bar - p_e) / (1.0 - p_e), 6)).alias(
            "kappa"
        ),
    )


def _esd_round_sql(src: str, rnd: int) -> str:
    """One unrolled generalized-ESD round over CTE ``src``: moments,
    integer argmax of |n·x − Σx| (doc_id tie-break), and the
    studentized R emitted as a summary row CTE trio (s{r}, o{r},
    r{r})."""
    return f"""
    s{rnd} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s,
             CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS q
      FROM {src}
    ),
    o{rnd} AS (
      SELECT m.doc_id, m.x
      FROM {src} m, s{rnd}
      ORDER BY abs(m.x * s{rnd}.n - s{rnd}.s) DESC, m.doc_id
      LIMIT 1
    ),
    r{rnd} AS (
      SELECT {rnd} AS round, s{rnd}.n,
             o{rnd}.doc_id AS outlier_doc,
             CAST(o{rnd}.x AS BIGINT) AS outlier_x,
             CASE WHEN s{rnd}.n >= 3
                       AND s{rnd}.n * s{rnd}.q - s{rnd}.s * s{rnd}.s > 0
                  THEN {sql_qround(
                    f'ABS(o{rnd}.x * s{rnd}.n - s{rnd}.s)'
                    f' / CAST(s{rnd}.n AS DOUBLE)'
                    f' / sqrt(CAST(s{rnd}.n * s{rnd}.q'
                    f' - s{rnd}.s * s{rnd}.s AS DOUBLE)'
                    f' / (CAST(s{rnd}.n AS DOUBLE) * (s{rnd}.n - 1)))',
                    6)}
             END AS r_stat
      FROM s{rnd}, o{rnd}
    )"""


@query(
    "dq_esd_outliers",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    {_esd_round_sql('m', 1)},
    m2 AS (SELECT * FROM m WHERE doc_id NOT IN (SELECT doc_id FROM o1)),
    {_esd_round_sql('m2', 2)},
    m3 AS (SELECT * FROM m2 WHERE doc_id NOT IN (SELECT doc_id FROM o2)),
    {_esd_round_sql('m3', 3)}
    SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
    SELECT * FROM r3
    """,
)
def dq_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner 1983), k = 3 rounds unrolled: the
    multi-outlier extension of stat_grubbs — Grubbs' test is only
    valid for ONE outlier (a second masks the first by inflating s),
    so ESD recomputes the studentized max deviate after removing the
    previous round's argmax, yielding the R_1..R_3 sequence you
    compare to the t-derived λ_i ladder downstream. The standard DQ
    screen when "how many points are bad?" matters, not just
    "is the worst point bad?".

    Integer argmax discipline per round (the stat_grubbs rule):
    |x − x̄| ordering ≡ |n·x − Σx| ordering, so each round's removal
    is picked on exact int64 keys with doc_id tie-break — no
    float-boundary selection anywhere; R_i is one fixed-shape double
    over that round's (n, Σx, Σx²), qround(6). n < 3 or zero
    variance NULLs R_i (the removal itself still proceeds, matching
    the oracle's LIMIT 1 on the all-tied key).

    100 TB shape: k = 3 fixed rounds, each one 1-row moment
    aggregate + one TakeOrdered(1) argmax over the column-pruned
    scan + one broadcast-anti removal — k·O(scan), never a sort; the
    removed set is ≤ k rows, broadcast by construction."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select("doc_id", F.col("n_chars").cast("long").alias("x"))
    out_rows = None
    remaining = m
    for rnd in (1, 2, 3):
        # moments agg has ONE consumer (the broadcast into the argmax
        # scan) — no checkpoint; `o` has two (summary row + anti
        # removal) and anchors each round's base, so it keeps one
        s = remaining.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("s"),
            F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
            .cast("long")
            .alias("q"),
        )
        o = (
            remaining.crossJoin(F.broadcast(s))
            .orderBy(
                F.abs(F.col("x") * F.col("n") - F.col("s")).desc(),
                "doc_id",
            )
            .limit(1)
            .transform(pin)
        )
        n, ssum, q = F.col("n"), F.col("s"), F.col("q")
        # EXACT int64 variance numerator AND stat_grubbs' exact
        # division order (maxdev / n / sqrt(var / (n·(n−1)))) —
        # round 1 ≡ Grubbs is a pinned invariant, and either a double
        # numerator or a reassociated divide chain could diverge by
        # an ulp across a qround boundary. Shares grubbs' documented
        # int64 headroom bound.
        var_num = n * q - ssum * ssum
        r_stat = (
            F.abs(F.col("x") * n - ssum) / n.cast("double")
            / F.sqrt(
                var_num.cast("double") / (n.cast("double") * (n - F.lit(1)))
            )
        )
        row = o.select(
            F.lit(rnd).alias("round"),
            "n",
            F.col("doc_id").alias("outlier_doc"),
            F.col("x").cast("long").alias("outlier_x"),
            F.when((n >= 3) & (var_num > 0), qround(r_stat, 6)).alias(
                "r_stat"
            ),
        )
        out_rows = row if out_rows is None else out_rows.unionByName(row)
        remaining = remaining.join(
            o.select("doc_id"), "doc_id", "anti"
        )
    return out_rows


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS qx
      FROM documents GROUP BY lang
    ),
    d AS (
      SELECT lang, nh, sx, qx,
             CASE WHEN nh >= 2 AND nh * qx - sx * sx >= 0
                  THEN sqrt(CAST(nh * qx - sx * sx AS DOUBLE)
                            / (CAST(nh AS DOUBLE) * (nh - 1)))
             END AS sd
      FROM s
    ),
    t AS (SELECT SUM(nh * sd) AS total FROM d)
    SELECT lang, nh AS n_docs,
           {sql_qround('sx / CAST(nh AS DOUBLE)', 6)} AS mean_chars,
           {sql_qround('sd', 6)} AS sd_chars,
           CASE WHEN sd IS NOT NULL AND t.total > 0
                THEN {sql_qround('nh * sd / t.total', 6)}
           END AS neyman_weight,
           CASE WHEN sd IS NOT NULL AND t.total > 0
                THEN {sql_qround('1000.0 * nh * sd / t.total', 4)}
           END AS alloc_1000
    FROM d, t
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation (Neyman 1934) for stratified
    sampling over language strata: n_h ∝ N_h·S_h — the sample-design
    table that tells a curation/eval pipeline how many documents to
    draw per stratum for a fixed labeling budget (here 1000) to
    minimize the variance of the estimated corpus mean. Strata that
    are large AND internally diverse get more budget; a
    zero-variance stratum needs none (one doc tells you everything).
    The design-stage companion to llm_sample_stratified (which draws
    proportionally) and sample_weighted_es (which draws by weight).

    Exact integer per-stratum moments (N_h, Σx, Σx²); S_h, the
    weights, and the allocation are fixed-shape double expressions,
    qround(6)/(4). Singleton strata (S_h undefined) and an all-
    degenerate corpus (total weight 0 — ANSI divide guard) emit NULL
    weights; the grand total re-aggregates from the ≤|langs|-row
    stratum table so both engines derive it identically (the
    global-anchor rule, repo working notes).

    100 TB: one hash aggregate to |strata| rows, then arithmetic on
    the metadata-sized table — the agg_group shape."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("qx"),
    )
    nh, sx, qx = F.col("nh"), F.col("sx"), F.col("qx")
    var_num = nh * qx - sx * sx
    d = s.select(
        "lang",
        "nh",
        "sx",
        F.when(
            (nh >= 2) & (var_num >= 0),
            F.sqrt(var_num.cast("double") / (nh.cast("double") * (nh - 1))),
        ).alias("sd"),
    )
    t = d.agg(F.sum(nh * F.col("sd")).alias("total"))
    j = d.crossJoin(F.broadcast(t))
    ok = F.col("sd").isNotNull() & (F.col("total") > 0)
    return j.select(
        "lang",
        nh.alias("n_docs"),
        qround(sx / nh.cast("double"), 6).alias("mean_chars"),
        qround(F.col("sd"), 6).alias("sd_chars"),
        F.when(ok, qround(nh * F.col("sd") / F.col("total"), 6)).alias(
            "neyman_weight"
        ),
        F.when(
            ok, qround(F.lit(1000.0) * nh * F.col("sd") / F.col("total"), 4)
        ).alias("alloc_1000"),
    )


@query(
    "stat_dunn_posthoc",
    oracle=f"""
    WITH {_MIDRANK_SQL}
    SELECT a.source AS source_a, b.source AS source_b,
           a.ng AS n_a, b.ng AS n_b,
           {sql_qround('a.rg / CAST(a.ng AS DOUBLE)', 6)} AS mean_rank_a,
           {sql_qround('b.rg / CAST(b.ng AS DOUBLE)', 6)} AS mean_rank_b,
           CASE WHEN tot.n > 1 AND
                     (CAST(tot.n AS DOUBLE) * (tot.n + 1) / 12.0
                      - CAST(tt.sum_t3 AS DOUBLE) / (12.0 * (tot.n - 1)))
                     > 0.0
                THEN {sql_qround(
                    '(a.rg / CAST(a.ng AS DOUBLE)'
                    ' - b.rg / CAST(b.ng AS DOUBLE))'
                    ' / sqrt((CAST(tot.n AS DOUBLE) * (tot.n + 1) / 12.0'
                    '   - CAST(tt.sum_t3 AS DOUBLE) / (12.0 * (tot.n - 1)))'
                    '  * (1.0 / a.ng + 1.0 / b.ng))', 6)}
           END AS z_dunn
    FROM g a, g b, tot, tt
    WHERE a.source < b.source
    """,
)
def stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964) with tie correction: after
    stat_kruskal_wallis rejects "all sources share a location", WHICH
    source pairs differ? z_ij = (R̄_i − R̄_j) / √((N(N+1)/12 −
    Σ(t³−t)/(12(N−1))) · (1/n_i + 1/n_j)) on the SAME global
    midranks — the pairwise drill-down every omnibus rank test needs
    (feed the z's to stat_bh_fdr for the multiple-comparison gate;
    that composition is the standard Kruskal-Wallis → Dunn → BH
    pipeline).

    LITERALLY the same rank machinery as Kruskal-Wallis — both ops
    call the shared :func:`_midrank_tables` (and both oracles embed
    the shared ``_MIDRANK_SQL``): one distributed_rank pass + the
    (min+max)/2 midrank tie table (exact .5-rationals), one k-row
    group table, then the k(k−1)/2 pair rows come from a broadcast
    self-join of the GROUP table — pairs of groups, never pairs of
    rows. All-tied corpora NULL z (variance 0, ANSI guard).

    100 TB: the rank pass is the only corpus-scale exchange;
    everything downstream is k rows."""
    g, tt = _midrank_tables(spark, sf_dir)
    tot = g.agg(F.sum("ng").cast("long").alias("n"))
    a = g.select(
        F.col("source").alias("source_a"),
        F.col("ng").alias("n_a"),
        F.col("rg").alias("rg_a"),
    )
    b = g.select(
        F.col("source").alias("source_b"),
        F.col("ng").alias("n_b"),
        F.col("rg").alias("rg_b"),
    )
    p = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tt))
    )
    nd = F.col("n").cast("double")
    var = nd * (F.col("n") + 1) / 12.0 - F.col("sum_t3").cast("double") / (
        12.0 * (F.col("n") - 1)
    )
    ra = F.col("rg_a") / F.col("n_a").cast("double")
    rb = F.col("rg_b") / F.col("n_b").cast("double")
    return p.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        qround(ra, 6).alias("mean_rank_a"),
        qround(rb, 6).alias("mean_rank_b"),
        F.when(
            (F.col("n") > 1) & (var > 0.0),
            qround(
                (ra - rb)
                / F.sqrt(
                    var
                    * (
                        F.lit(1.0) / F.col("n_a")
                        + F.lit(1.0) / F.col("n_b")
                    )
                ),
                6,
            ),
        ).alias("z_dunn"),
    )


@query(
    "dq_embedding_norm_qa",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    med AS (SELECT median(nrm) AS med FROM v),
    dev AS (
      SELECT v.nrm, abs(v.nrm - med.med) AS dv FROM v, med
    ),
    mad AS (SELECT median(dv) AS mad FROM dev)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN dev.nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
           {sql_qround('MAX(med.med)', 6)} AS med_norm,
           {sql_qround('MAX(mad.mad)', 6)} AS mad_norm,
           CAST(SUM(CASE WHEN {sql_qround('dev.dv', 6)}
                              > {sql_qround(
                                  f'({_MAD_K_NUM} / {_MAD_K_DEN})'
                                  ' * mad.mad', 6)}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev, med, mad
    """,
)
def dq_embedding_norm_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table health gate: L2-norm census with the robust
    median/MAD outlier rule (Iglewicz-Hoaglin |M| > 3.5, restated
    multiplicatively like dq_outlier_mad so MAD = 0 cannot ANSI-
    throw) plus the exact-zero-vector count — the QA pass run before
    any cosine-based dedup/ANN stage, because zero and extreme-norm
    vectors silently poison cosine gates (undefined similarity) and
    IVF centroid updates. The embeddings-table sibling of
    dq_outlier_mad's event census.

    The norm is llm.py's shared _dot/_as_double sequential fold
    (sqrt(list_dot_product) oracle form — the cosine family's
    order-compatibility contract, one fold definition repo-wide), so
    the doubles are bit-identical on both engines and the exact
    medians agree bit-for-bit before the qround(6) emit; both
    outlier compare sides are qround(6)'d (the float-predicate
    discipline). The even-count case additionally relies on both
    engines using the same lower + (upper−lower)/2 interpolation —
    pinned, not assumed, by the dedicated even-cardinality fixture in
    tests/test_edge_inputs.py (ADVICE r8 item 2).

    100 TB: one spread map pass computes norms ONCE into a
    localCheckpointed (vec_id, norm) projection — 16 bytes/vec,
    dims× smaller than the vectors — which the three downstream
    aggregates (median, MAD, census) consume without re-folding the
    embedding column per branch (the multi-consumer rule); the two
    exact medians swap for approx_percentile or distributed_rank at
    real scale, census logic unchanged."""
    from etl_geonames_spark.operators.llm import _as_double, _dot

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    ed = _as_double("embedding")
    v = emb.select(
        "vec_id", F.sqrt(_dot(ed, ed)).alias("nrm")
    ).transform(pin)
    med = v.agg(F.median("nrm").alias("med"))
    dev = v.crossJoin(F.broadcast(med)).select(
        "nrm", F.abs(F.col("nrm") - F.col("med")).alias("dv"), "med"
    )
    mad = dev.agg(F.median("dv").alias("mad"))
    thr = qround(
        F.lit(_MAD_K_NUM) / F.lit(_MAD_K_DEN) * F.col("mad"), 6
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero"),
            qround(F.max("med"), 6).alias("med_norm"),
            qround(F.max("mad"), 6).alias("mad_norm"),
            F.sum(
                F.when(qround(F.col("dv"), 6) > thr, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "stat_kendall_w",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS m0,
             CAST(len(list_distinct(list_filter(str_split(text, ' '),
                 w -> w <> ''))) AS BIGINT) AS m1,
             CAST(len(list_filter(str_split(text, ' '),
                 w -> w <> '')) AS BIGINT) AS m2
      FROM documents
    ),
    long AS (
      SELECT doc_id, 0 AS rid, m0 AS v FROM t
      UNION ALL SELECT doc_id, 1, m1 FROM t
      UNION ALL SELECT doc_id, 2, m2 FROM t
    ),
    rk AS (
      SELECT doc_id, rid, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY rid ORDER BY v, doc_id)
                  AS BIGINT) AS rn
      FROM long
    ),
    mid AS (
      SELECT doc_id, rid,
             (MIN(rn) OVER (PARTITION BY rid, v)
              + MAX(rn) OVER (PARTITION BY rid, v)) / 2.0 AS mr
      FROM rk
    ),
    ri AS (SELECT doc_id, SUM(mr) AS r FROM mid GROUP BY doc_id),
    ties AS (
      SELECT rid, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM long GROUP BY rid, v
    ),
    tt AS (SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS sum_t3 FROM ties),
    tot AS (
      SELECT CAST(SUM(c) / 3 AS BIGINT) AS n FROM ties
    ),
    s AS (
      SELECT tot.n, tt.sum_t3,
             SUM((ri.r - 3.0 * (tot.n + 1) / 2.0)
                 * (ri.r - 3.0 * (tot.n + 1) / 2.0)) AS ss
      FROM ri, tot, tt GROUP BY tot.n, tt.sum_t3
    )
    SELECT n, CAST(3 AS INT) AS m,
           CASE WHEN n > 1 AND
                     9.0 * (CAST(n AS DOUBLE) * n * n - n)
                     - 3.0 * sum_t3 > 0.0
                THEN {sql_qround(
                    '12.0 * ss / (9.0 * (CAST(n AS DOUBLE) * n * n - n)'
                    ' - 3.0 * sum_t3)', 6)}
           END AS w_stat,
           CASE WHEN n > 1 AND
                     9.0 * (CAST(n AS DOUBLE) * n * n - n)
                     - 3.0 * sum_t3 > 0.0
                THEN {sql_qround(
                    '3.0 * (n - 1) * (12.0 * ss'
                    ' / (9.0 * (CAST(n AS DOUBLE) * n * n - n)'
                    ' - 3.0 * sum_t3))', 6)}
           END AS chi2_r
    FROM s
    """,
)
def stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith 1939) across m = 3 metric "raters" ranking every document
    CORPUS-WIDE: length in chars, vocabulary size, token count — do
    the cheap quality signals produce the SAME document ordering
    (W → 1, they are redundant) or independent ones (W → 0, each adds
    information)? The k-rater completion of the agreement family:
    llm_metric_kendall (τ-b, 2 raters, slice pairs) and
    stat_fleiss_kappa (categorical votes) — W is the RANKING-valued
    m-rater statistic, with the tie-corrected denominator
    m²(n³−n) − m·ΣT and the χ²_r = m(n−1)W approximation emitted
    alongside.

    Rank machinery is the stat_moods_median sufficient-statistic
    argument applied to ranks (the r10 fusion of the r9 ladder, which
    ranked the 3n-row long table row-by-row): the (rid, v) CELL table
    — one count per distinct (rater, value) — determines midranks,
    the tie correction ΣT AND n all at once. Midrank of value v in
    rater rid = within-rater exclusive prefix count + (c+1)/2, and
    because raters are contiguous blocks of the (rid, v) order each
    holding exactly n counts, that prefix is the GLOBAL exclusive
    running sum minus rid·n — so ONE distributed_cumsum_multi pass
    over the cell table (carrying c and c³−c together) yields every
    midrank plus both grand moments, with no per-row rank, no
    rank-table re-execution, and no global window. Midranks and R_i
    are exact binary rationals, so S = Σ(R_i − m(n+1)/2)² is
    deterministic in both engines and the single qround(6) emit
    carries no accumulation-order risk beyond the accepted 1-row
    class. Verified unchanged vs the r9 ladder by the driver oracle
    hash (same oracle, same values).

    100 TB: tokenize runs ONCE (the doc-metric table is
    localCheckpointed — 4 longs per doc, the smallest sufficient
    data); the corpus-scale exchanges are the cell-table aggregate
    and the R_i doc-keyed aggregate, while the cumsum machinery runs
    on the (typically far smaller) cell table. The midrank broadcast
    assumes the distinct-value cardinality is broadcastable (same
    contract as the r9 shape); at pathological cardinality it
    degrades to a shuffled equi-join, never a window. Guard: n <= 1
    or an all-tied corpus (denominator 0) emits NULL, not an ANSI
    throw."""
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    tk = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    # spread(): the tokenize is a compute-bound map over the
    # single-file fixture's one scan partition (the r5 text-stack
    # rule); checkpointed so it runs ONCE — the R_i branch re-reads
    # 4 longs per doc instead of re-tokenizing the corpus
    t = (
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("m0"),
            F.size(F.array_distinct(tk)).cast("long").alias("m1"),
            F.size(tk).cast("long").alias("m2"),
        )
        .transform(pin)
    )
    long = t.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("rid"), F.col("m0").alias("v")),
                F.struct(F.lit(1).alias("rid"), F.col("m1").alias("v")),
                F.struct(F.lit(2).alias("rid"), F.col("m2").alias("v")),
            )
        ).alias("p"),
    ).select("doc_id", "p.rid", "p.v")
    # the (rid, v) cell table is the sufficient statistic: midranks,
    # the tie correction and n are all re-aggregates of it; c³−c is
    # carried as a column so ONE cumsum pass yields both moments
    cells = (
        long.groupBy("rid", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "t3", F.col("c") * F.col("c") * F.col("c") - F.col("c")
        )
        .transform(pin)
    )
    rc = distributed_cumsum_multi(
        cells, ["rid", "v"], ["c", "t3"], ["cs", "t3s"], ["n3", "sum_t3"]
    )
    # within-rater exclusive prefix = global exclusive prefix − rid·n
    # (rater blocks are contiguous and each holds exactly n counts;
    # n3 = 3n exactly, the double division is exact at these
    # magnitudes); midrank = prefix + (c+1)/2, the same exact
    # .5-rational as the r9 (min_rn + max_rn)/2
    n_col = (F.col("n3") / 3).cast("long")
    # checkpointed (the ts_acf shared-rank-table precedent): the
    # midrank table is broadcast-size by contract, so the cumsum
    # bookkeeping executes exactly once instead of riding the
    # broadcast subtree of every consumer
    mids = rc.select(
        "rid",
        "v",
        (
            (
                F.col("cs") - F.col("c") - F.col("rid").cast("long") * n_col
            ).cast("double")
            + (F.col("c") + 1) / 2.0
        ).alias("mr"),
        n_col.alias("n"),
        F.col("sum_t3").cast("long").alias("sum_t3"),
    ).transform(pin)
    # n and sum_t3 are constant columns riding the broadcast — max()
    # carries them through the aggregates so no separate moment
    # subplan executes (the moods_median multi-consumer rule)
    ri = (
        long.join(F.broadcast(mids), ["rid", "v"])
        .groupBy("doc_id")
        .agg(
            F.sum("mr").alias("r"),
            F.max("n").alias("n"),
            F.max("sum_t3").alias("sum_t3"),
        )
    )
    nn = F.col("n").cast("double")
    dev = F.col("r") - 3.0 * (F.col("n") + 1) / 2.0
    s = ri.groupBy("n", "sum_t3").agg(F.sum(dev * dev).alias("ss"))
    denom = 9.0 * (nn * nn * nn - nn) - 3.0 * F.col("sum_t3")
    w = 12.0 * F.col("ss") / denom
    ok = (F.col("n") > 1) & (denom > 0.0)
    return s.select(
        "n",
        F.lit(3).cast("int").alias("m"),
        F.when(ok, qround(w, 6)).alias("w_stat"),
        F.when(ok, qround(3.0 * (F.col("n") - 1) * w, 6)).alias("chi2_r"),
    )


@query(
    "stat_bartlett",
    oracle=f"""
    WITH x AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    g AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s,
               CAST(SUM(v * v) AS BIGINT) AS q
        FROM x GROUP BY lang
    ),
    gv AS (
        SELECT lang, n,
               CAST(n * q - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) AS s2
        FROM g WHERE n >= 2
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS nn,
               SUM((n - 1) * s2) AS pooled_num,
               SUM(CASE WHEN s2 > 0 THEN (n - 1) * ln(s2) END) AS sum_ln,
               SUM(1.0 / (n - 1)) AS sum_inv,
               CAST(MIN(CASE WHEN s2 > 0 THEN 1 ELSE 0 END) AS INT)
                   AS all_pos
        FROM gv
    )
    SELECT k, nn,
           CASE WHEN k >= 2 AND nn > k AND all_pos = 1
                THEN {sql_qround(
                    '((nn - k) * ln(pooled_num / (nn - k)) - sum_ln)'
                    ' / (1.0 + (sum_inv - 1.0 / (nn - k))'
                    '          / (3.0 * (k - 1)))', 6)}
           END AS t_stat
    FROM tot
    """,
)
def stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the per-lang
    document-length groups — the parametric (normality-assuming,
    maximally powerful) complement of the SAME comparison
    stat_levene runs robustly on the SAME column: a pipeline reports
    both, and Levene-rejects-while-Bartlett-doesn't flags heavy
    tails rather than true variance differences.
    T = [(N−k)·ln S_p² − Σ(n_i−1)·ln s_i²] / C with the standard
    Bartlett correction C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1)),
    ~χ²(k−1) under H0.

    Determinism: n_chars is integer, so every group moment (n, Σx,
    Σx²) is an EXACT int64 aggregate — the group variances
    s_i² = (n·q − s²)/(n(n−1)) are single IEEE divisions of exact
    integers, identical on both engines, and the k-term ln sums fold
    over identical doubles (k = 5 rows; the one qround(6) emit is
    the accepted k-term class). Groups with n_i < 2 are excluded
    from the statistic (their variance is undefined); a zero
    variance in any group or k < 2 or N ≤ k NULLs the statistic.
    The ln(s_i²) term is NULL-guarded SYMMETRICALLY: Spark's log()
    returns NULL on non-positive input while DuckDB's ln(0) THROWS —
    the oracle's CASE WHEN s2 > 0 mirror makes both engines drop the
    term and fall through to the all_pos NULL (zero-variance-group
    differential pinned in tests/test_edge_inputs.py).

    100 TB: one corpus-scale hash aggregate (map-side combined,
    integer sums); everything after is k rows."""
    x = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("long").alias("v")
    )
    g = x.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
    )
    nn_i = F.col("n")
    gv = g.filter(nn_i >= 2).select(
        "lang",
        "n",
        (
            (nn_i * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (nn_i.cast("double") * (nn_i - 1))
        ).alias("s2"),
    )
    tot = gv.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("pooled_num"),
        F.sum((F.col("n") - 1) * F.log(F.col("s2"))).alias("sum_ln"),
        F.sum(1.0 / (F.col("n") - 1).cast("double")).alias("sum_inv"),
        F.min(F.when(F.col("s2") > 0, 1).otherwise(0))
        .cast("int")
        .alias("all_pos"),
    )
    k = F.col("k")
    nn = F.col("nn")
    ok = (k >= 2) & (nn > k) & (F.col("all_pos") == 1)
    t = (
        (nn - k).cast("double")
        * F.log(F.col("pooled_num") / (nn - k).cast("double"))
        - F.col("sum_ln")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / (nn - k).cast("double"))
        / (3.0 * (k - 1).cast("double"))
    )
    return tot.select(
        "k", "nn", F.when(ok, qround(t, 6)).alias("t_stat")
    )


def _ad_prefix_sql(arr: str) -> str:
    """DuckDB BIGINT prefix-sum array with leading 0 (length
    len(arr)+1): cum[j+1] = sum of arr[1..j]."""
    return (
        f"list_reduce(list_prepend([CAST(0 AS BIGINT)],"
        f" list_transform({arr}, x -> [x])),"
        f" (acc, xv) -> list_append(acc, acc[len(acc)] + xv[1]))"
    )


_AD_FSUM = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), {terms}),"
    " (acc, y) -> acc + y)"
)


@query(
    "stat_ad_ksample",
    oracle=f"""
    WITH x AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    pv AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS l FROM x GROUP BY v
    ),
    pool0 AS (
        SELECT list_transform(list_sort(list({{'v': v, 'l': l}})), s -> s.v) AS vs,
               list_transform(list_sort(list({{'v': v, 'l': l}})), s -> s.l) AS ls,
               CAST(SUM(l) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS p
        FROM pv
    ),
    pool AS (
        SELECT vs, ls, n, p,
               {_ad_prefix_sql('ls')} AS lcum
        FROM pool0
    ),
    gi AS (
        SELECT lang,
               map_from_entries(list({{'k': v, 'v': c}})) AS m,
               CAST(SUM(c) AS BIGINT) AS ni
        FROM (
            SELECT lang, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM x GROUP BY lang, v
        ) GROUP BY lang
    ),
    gif AS (
        SELECT gi.lang, gi.ni, g.n, g.p, g.ls, g.lcum,
               {_ad_prefix_sql(
                   "list_transform(g.vs, vv ->"
                   " COALESCE(gi.m[vv][1], CAST(0 AS BIGINT)))")} AS fcum
        FROM gi, pool g
    ),
    pg AS (
        SELECT lang, ni, n, p,
               {_AD_FSUM.format(terms='''
                 list_transform(generate_series(1, CAST(p AS INT)), j ->
                   CAST(ls[j] AS DOUBLE)
                   * CAST(n * (2 * fcum[j + 1] - (fcum[j + 1] - fcum[j]))
                       - (2 * lcum[j + 1] - ls[j]) * ni AS DOUBLE)
                   * CAST(n * (2 * fcum[j + 1] - (fcum[j + 1] - fcum[j]))
                       - (2 * lcum[j + 1] - ls[j]) * ni AS DOUBLE)
                   / (CAST(n AS DOUBLE)
                      * ((2 * lcum[j + 1] - ls[j])
                         * (2 * n - (2 * lcum[j + 1] - ls[j]))
                         - n * ls[j])))''')} / ni AS contrib
        FROM gif WHERE p >= 2
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n, MAX(p) AS p,
               SUM(contrib) AS s, SUM(1.0 / ni) AS hh
        FROM pg
    ),
    hsum AS (
        SELECT k, n, p, hh,
               (n - 1.0) / n * s AS a2,
               {_AD_FSUM.format(terms=
                   "list_transform(generate_series(1, CAST(n AS INT) - 1),"
                   " r -> 1.0 / r)")} AS h
        FROM tot
    ),
    harm AS (
        SELECT k, n, p, hh, a2, h,
               list_reduce(
                 list_prepend([CAST(0 AS DOUBLE)],
                   list_transform(
                     generate_series(1, CAST(n AS INT) - 1),
                     r -> [CAST(0 AS DOUBLE)])),
                 (acc, xv) -> list_append(acc, acc[len(acc)]
                                               + 1.0 / len(acc))) AS harr
        FROM hsum
    ),
    gpoly AS (
        SELECT k, n, p, hh, a2, h,
               {_AD_FSUM.format(terms=
                   "list_transform(generate_series(2, CAST(n AS INT) - 1),"
                   " s2 -> (harr[CAST(n AS INT)]"
                   " - harr[CAST(n AS INT) - s2 + 1]) / s2)")} AS g
        FROM harm
    )
    SELECT k, CAST(n AS BIGINT) AS n,
           CASE WHEN p >= 2 THEN {sql_qround('a2', 6)} END AS a2akn,
           CASE WHEN p >= 2 AND n > 3 AND
                ((4.0*g - 6.0)*(k-1) + (10.0 - 6.0*g)*hh)
                  * n * n * n
                + ((2.0*g - 4.0)*k*k + 8.0*h*k
                   + (2.0*g - 14.0*h - 4.0)*hh - 8.0*h + 4.0*g - 6.0)
                  * n * n
                + ((6.0*h + 2.0*g - 2.0)*k*k
                   + (4.0*h - 4.0*g + 6.0)*k
                   + (2.0*h - 6.0)*hh + 4.0*h) * n
                + ((2.0*h + 6.0)*k*k - 4.0*h*k) > 0.0
           THEN {sql_qround(
               '(a2 - (k - 1.0)) / sqrt(('
               ' ((4.0*g - 6.0)*(k-1) + (10.0 - 6.0*g)*hh)'
               '   * n * n * n'
               ' + ((2.0*g - 4.0)*k*k + 8.0*h*k'
               '    + (2.0*g - 14.0*h - 4.0)*hh - 8.0*h + 4.0*g - 6.0)'
               '   * n * n'
               ' + ((6.0*h + 2.0*g - 2.0)*k*k'
               '    + (4.0*h - 4.0*g + 6.0)*k'
               '    + (2.0*h - 6.0)*hh + 4.0*h) * n'
               ' + ((2.0*h + 6.0)*k*k - 4.0*h*k)'
               ') / ((n - 1.0) * (n - 2.0) * (n - 3.0)))', 6)}
           END AS ad_stat
    FROM gpoly
    """,
)
def stat_ad_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling k-sample test (Scholz & Stephens 1987, the
    tie-aware midrank A²akN) across the per-lang document-length
    distributions — the omnibus distributional-equality completion of
    the rank-test family: stat_ks_two_sample compares two ECDFs at
    their sup-norm point, stat_kruskal_wallis compares k locations;
    AD k-sample weights EVERY quantile (tail-sensitively) across all
    k groups at once, which is the screen used before pooling corpora
    that "look similar on medians".

    Exactness: Bj and M_ij are half-integers; the implementation
    carries their DOUBLED forms (b2_j = 2·cum_j − l_j,
    m2_ij = 2·cumI_ij − f_ij — exact int64 from two prefix-sum
    folds), so each term's numerator N·m2 − b2·n_i is an EXACT int64
    difference squared in double (the chi-square cross-multiplied
    pattern) over an exact-int64 denominator; the per-group fold and
    the harmonic/g sums run in identical sequential order on both
    engines. Standardization follows the published variance
    polynomial (a·N³+b·N²+c·N+d)/((N−1)(N−2)(N−3)) — a in (k−1),
    b/c/d in k, the exact coefficient split the round-9 fourth review
    pass refuted a mistranscription of against exact permutation
    enumeration (now pinned in tests/test_stat_invariants.py) — with
    H = Σ1/n_i, h = H_{{N−1}}, and g restated as
    Σ_{{s=2}}^{{N−1}} (H_{{N−1}} − H_{{N−s}})/s so it costs one
    O(N) harmonic prefix array instead of the textbook O(N²) double
    sum. Guards: a single-distinct-value corpus (p < 2) or N ≤ 3 or
    a non-positive variance polynomial NULLs the statistics.

    100 TB: two corpus-scale hash aggregates (pooled per-value,
    per-group per-value); everything after is k rows x O(p)-array
    arithmetic plus one O(N) fold — same bill class as
    stat_kruskal_wallis without the rank exchange (the value-count
    table IS the sufficient statistic)."""
    x = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("long").alias("v")
    )
    pv = x.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("l"))

    def dprefix(arr):
        return F.aggregate(
            arr,
            F.array(F.lit(0).cast("long")),
            lambda acc, y: F.concat(
                acc, F.array(F.element_at(acc, -1) + y)
            ),
        )

    def fsum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, y: acc + y)

    glob = pv.agg(
        F.array_sort(F.collect_list(F.struct("v", "l"))).alias("vl"),
        F.sum("l").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("p"),
    ).select(
        F.transform("vl", lambda s: s["v"]).alias("vs"),
        F.transform("vl", lambda s: s["l"]).alias("ls"),
        "n",
        "p",
    ).select(
        "vs", "ls", "n", "p", dprefix(F.col("ls")).alias("lcum")
    )
    gi = (
        x.groupBy("lang", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("lang")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("v", "c"))
            ).alias("m"),
            F.sum("c").cast("long").alias("ni"),
        )
    )
    gif = gi.crossJoin(F.broadcast(glob)).select(
        "lang",
        "ni",
        "n",
        "p",
        "ls",
        "lcum",
        dprefix(
            F.transform(
                "vs",
                lambda vv: F.coalesce(
                    F.element_at("m", vv), F.lit(0).cast("long")
                ),
            )
        ).alias("fcum"),
    )

    def term(j):
        fj = F.element_at("fcum", j + 1) - F.element_at("fcum", j)
        m2 = 2 * F.element_at("fcum", j + 1) - fj
        b2 = 2 * F.element_at("lcum", j + 1) - F.element_at("ls", j)
        lj = F.element_at("ls", j)
        diff = (F.col("n") * m2 - b2 * F.col("ni")).cast("double")
        den = (
            b2 * (2 * F.col("n") - b2) - F.col("n") * lj
        ).cast("double")
        return lj.cast("double") * diff * diff / (
            F.col("n").cast("double") * den
        )

    # p = 1 (single distinct value) makes every term's denominator
    # exactly 0 — ANSI throws on 0/0 doubles, so the whole corpus
    # filter mirrors the oracle's WHERE p >= 2 (output then comes
    # from the guarded tot/fin chain with k = 0 rows upstream)
    pg = gif.filter(F.col("p") >= 2).select(
        "lang",
        "ni",
        "n",
        "p",
        (
            fsum(
                F.transform(
                    F.sequence(F.lit(1), F.col("p").cast("int")), term
                )
            )
            / F.col("ni")
        ).alias("contrib"),
    )
    tot = pg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").alias("n"),
        F.max("p").alias("p"),
        F.sum("contrib").alias("s"),
        F.sum(1.0 / F.col("ni").cast("double")).alias("hh"),
    )
    nd = F.col("n").cast("double")
    ni32 = F.col("n").cast("int")
    hsum = tot.select(
        "k",
        "n",
        "p",
        "hh",
        ((nd - 1.0) / nd * F.col("s")).alias("a2"),
        # n = 1 would make Spark's sequence(1, 0) DESCEND into a 1/0
        # term (ANSI throw); the h consumer is NULL-guarded at n <= 3
        # anyway, so the lazy value branch is the safe home
        F.when(
            F.col("n") >= 2,
            fsum(
                F.transform(
                    F.sequence(F.lit(1), ni32 - 1), lambda r: 1.0 / r
                )
            ),
        ).alias("h"),
        F.aggregate(
            F.sequence(F.lit(1), ni32 - 1),
            F.array(F.lit(0.0)),
            lambda acc, _r: F.concat(
                acc,
                F.array(F.element_at(acc, -1) + 1.0 / F.size(acc)),
            ),
        ).alias("harr"),
    )
    gpoly = hsum.select(
        "k",
        "n",
        "p",
        "hh",
        "a2",
        "h",
        # n <= 2: Spark's sequence(2, n-1) DESCENDS (through s2 = 0
        # at n = 1 — a division throw); DuckDB's generate_series is
        # empty there, so the guard pins g = 0.0 to match
        F.when(
            F.col("n") >= 3,
            fsum(
                F.transform(
                    F.sequence(F.lit(2), ni32 - 1),
                    lambda s2: (
                        F.element_at("harr", ni32)
                        - F.element_at("harr", ni32 - s2 + 1)
                    )
                    / s2,
                )
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("g"),
    )
    k1 = (F.col("k") - 1).cast("double")
    kd = F.col("k").cast("double")
    hh, h, g = F.col("hh"), F.col("h"), F.col("g")
    # Scholz-Stephens variance polynomial — a in (k-1), b/c/d in k
    # (a first transcription used k-1 throughout plus a spurious
    # -4g+6 tail in a; review round 4 refuted it against exact
    # permutation enumeration and the paper's worked example, and
    # tests/test_stat_invariants.py now pins the enumeration)
    var_num = (
        ((4.0 * g - 6.0) * k1 + (10.0 - 6.0 * g) * hh)
        * nd
        * nd
        * nd
        + (
            (2.0 * g - 4.0) * kd * kd
            + 8.0 * h * kd
            + (2.0 * g - 14.0 * h - 4.0) * hh
            - 8.0 * h
            + 4.0 * g
            - 6.0
        )
        * nd
        * nd
        + (
            (6.0 * h + 2.0 * g - 2.0) * kd * kd
            + (4.0 * h - 4.0 * g + 6.0) * kd
            + (2.0 * h - 6.0) * hh
            + 4.0 * h
        )
        * nd
        + ((2.0 * h + 6.0) * kd * kd - 4.0 * h * kd)
    )
    varr = var_num / ((nd - 1.0) * (nd - 2.0) * (nd - 3.0))
    return gpoly.select(
        "k",
        F.col("n").cast("long").alias("n"),
        F.when(F.col("p") >= 2, qround(F.col("a2"), 6)).alias("a2akn"),
        F.when(
            (F.col("p") >= 2) & (F.col("n") > 3) & (var_num > 0.0),
            qround((F.col("a2") - k1) / F.sqrt(varr), 6),
        ).alias("ad_stat"),
    )


@query(
    "stat_moods_median",
    oracle=f"""
    WITH x AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    lv AS (
        SELECT lang, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM x GROUP BY lang, v
    ),
    pv AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS l FROM lv GROUP BY v
    ),
    pool AS (
        SELECT list_transform(list_sort(list({{'v': v, 'l': l}})),
                              s -> s.v) AS vs,
               {_ad_prefix_sql(
                   "list_transform(list_sort(list({'v': v, 'l': l})),"
                   " s -> s.l)")} AS lcum,
               CAST(SUM(l) AS BIGINT) AS n
        FROM pv
    ),
    med AS (
        SELECT n,
               vs[CAST(len(list_filter(lcum[2:],
                   c -> c < (n + 1) // 2)) AS INT) + 1] AS gm
        FROM pool
    ),
    g AS (
        SELECT lv.lang,
               CAST(SUM(lv.c) AS BIGINT) AS ni,
               CAST(SUM(CASE WHEN lv.v > med.gm THEN lv.c ELSE 0 END)
                    AS BIGINT) AS ai
        FROM lv, med GROUP BY lv.lang
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(ni) AS BIGINT) AS n,
               CAST(SUM(ai) AS BIGINT) AS a
        FROM g
    ),
    terms AS (
        SELECT tot.k, tot.n, tot.a,
               CAST(tot.n * g.ai - tot.a * g.ni AS DOUBLE)
               * CAST(tot.n * g.ai - tot.a * g.ni AS DOUBLE)
               * (1.0 / (CAST(tot.n AS DOUBLE) * tot.a * g.ni)
                  + 1.0 / (CAST(tot.n AS DOUBLE) * (tot.n - tot.a)
                           * g.ni)) AS t
        FROM g, tot
    )
    SELECT k, n, (SELECT CAST(gm AS BIGINT) FROM med) AS grand_median,
           CAST(k - 1 AS BIGINT) AS dof,
           CASE WHEN k >= 2 AND a > 0 AND a < n
                THEN {sql_qround('SUM(t)', 6)}
           END AS chi2
    FROM terms GROUP BY k, n, a
    """,
)
def stat_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the per-lang length distributions —
    the robust-counts member of the k-sample trio (stat_kruskal_wallis
    ranks everything, stat_ad_ksample weights every quantile; Mood's
    only asks "does each group straddle the POOLED median the same
    way?", making it the test of record under gross outliers or
    heavily censored values). Counts above vs not-above the grand
    median per group, Pearson chi2 over the k x 2 table with margins
    (a, n - a), ~chi2(k - 1).

    Conventions pinned for exactness: the grand median is the pooled
    LOWER median — the order statistic at ceil(N/2), an actual data
    value computed all-integer from the pooled value-count prefix
    array (#{{cum < (N+1)/2}} + 1 indexes the first value whose
    cumulative reaches the half) — and ties at the median count as
    "not above" (the ties='below' convention), so every cell count is
    an exact integer and chi2's per-cell terms use the chi-square
    cross-multiplied form (n·a_i − a·n_i is an exact int64, squared
    in double). No interpolated median, no float predicate anywhere.
    Guards: k < 2 or a degenerate split (every value above or none)
    NULLs the statistic.

    100 TB: ONE corpus-scale hash aggregate — the (lang, value) cell
    table is the sufficient statistic (localCheckpointed; it feeds
    both the pooled value counts and the per-group above counts as
    tiny re-aggregates), plus one broadcast of the 1-row median."""
    x = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("long").alias("v")
    )
    # ONE corpus-scale aggregate: the (lang, v) cell table is the
    # sufficient statistic; the pooled value counts AND the per-group
    # above counts are both broadcast re-aggregates of it (the module
    # rule — never a second corpus scan)
    lv = (
        x.groupBy("lang", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    pv = lv.groupBy("v").agg(F.sum("c").cast("long").alias("l"))
    pool = pv.agg(
        F.array_sort(F.collect_list(F.struct("v", "l"))).alias("vl"),
        F.sum("l").cast("long").alias("n"),
    ).select(
        F.transform("vl", lambda s: s["v"]).alias("vs"),
        F.aggregate(
            F.transform("vl", lambda s: s["l"]),
            F.array(F.lit(0).cast("long")),
            lambda acc, y: F.concat(
                acc, F.array(F.element_at(acc, -1) + y)
            ),
        ).alias("lcum"),
        "n",
    )
    # size guard: on an EMPTY corpus pool still aggregates to one row
    # with vs=[] and element_at(vs, 1) would THROW under ANSI (the
    # broadcast med subplan executes even though lv is empty); NULL gm
    # matches the oracle's empty-list-index NULL and the downstream
    # joins stay empty either way (ADVICE r9)
    med = pool.select(
        "n",
        F.when(
            F.size("vs") > 0,
            F.element_at(
                "vs",
                F.size(
                    F.filter(
                        F.slice(F.col("lcum"), 2, F.size("lcum") - 1),
                        lambda c: c
                        < F.floor(
                            (F.col("n") + 1).cast("double") / 2
                        ).cast("long"),
                    )
                ).cast("int")
                + 1,
            ),
        ).alias("gm"),
    )
    # gm rides the aggregates as a constant column (max of a
    # constant) so the final projection does not re-execute the
    # pooled-median subplan a second time (multi-consumer rule)
    g = (
        lv.crossJoin(F.broadcast(med.select("gm")))
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("ni"),
            F.sum(F.when(F.col("v") > F.col("gm"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("ai"),
            F.max("gm").alias("gm"),
        )
    )
    # r10 fusion (VERDICT r9 item 3): instead of broadcasting a
    # totals row back INTO the group table (a second execution of g's
    # subplan), collect the k×2 table itself — k = #langs, bounded —
    # into ONE final aggregate row and fold the chi2 terms with
    # F.aggregate. One corpus aggregate + one group aggregate + one
    # 1-row aggregate total; the k>0 filter preserves the 0-rows
    # empty-corpus contract (tests/test_edge_inputs.py).
    one = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("ai").cast("long").alias("a"),
        F.max("gm").alias("gm"),
        F.collect_list(F.struct("ni", "ai")).alias("cells"),
    )

    def term(acc, s):
        d = (F.col("n") * s["ai"] - F.col("a") * s["ni"]).cast("double")
        return acc + d * d * (
            1.0 / (F.col("n").cast("double") * F.col("a") * s["ni"])
            + 1.0
            / (
                F.col("n").cast("double")
                * (F.col("n") - F.col("a"))
                * s["ni"]
            )
        )

    ok = (F.col("k") >= 2) & (F.col("a") > 0) & (F.col("a") < F.col("n"))
    return one.where(F.col("k") > 0).select(
        "k",
        "n",
        F.col("gm").cast("long").alias("grand_median"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.when(
            ok, qround(F.aggregate("cells", F.lit(0.0), term), 6)
        ).alias("chi2"),
    )


@query(
    "stat_cvm_two_sample",
    oracle=f"""
    WITH m AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    pv AS (
        SELECT v,
               CAST(SUM(g) AS BIGINT) AS c1,
               CAST(SUM(1 - g) AS BIGINT) AS c2
        FROM m GROUP BY v
    ),
    c AS (
        SELECT v, c1, c2,
               SUM(c1) OVER (ORDER BY v) AS cum1,
               SUM(c2) OVER (ORDER BY v) AS cum2
        FROM pv
    ),
    t AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2
        FROM pv
    ),
    s AS (
        SELECT t.n1, t.n2,
               SUM(CAST(c.c1 + c.c2 AS DOUBLE)
                   * CAST(c.cum1 * t.n2 - c.cum2 * t.n1 AS DOUBLE)
                   * CAST(c.cum1 * t.n2 - c.cum2 * t.n1 AS DOUBLE)) AS num
        FROM c, t GROUP BY t.n1, t.n2
    )
    SELECT n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN {sql_qround(
                    'num / (CAST(n1 AS DOUBLE) * n2'
                    ' * (n1 + n2) * (n1 + n2)'
                    ' * (n1 + n2) * (n1 + n2))', 6)}
           END AS t_stat,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN {sql_qround(
                    '(num / (CAST(n1 AS DOUBLE) * n2'
                    ' * (n1 + n2) * (n1 + n2)'
                    ' * (n1 + n2) * (n1 + n2))'
                    ' - (n1 + n2 + 1.0) / (6.0 * (n1 + n2)))'
                    ' / sqrt((n1 + n2 + 1.0)'
                    ' * (4.0 * n1 * n2 * (n1 + n2)'
                    '    - 3.0 * (CAST(n1 AS DOUBLE) * n1'
                    '             + CAST(n2 AS DOUBLE) * n2)'
                    '    - 2.0 * n1 * n2)'
                    ' / (180.0 * CAST(n1 + n2 AS DOUBLE)'
                    '    * (n1 + n2) * n1 * n2))', 6)}
           END AS z_stat
    FROM s
    """,
)
def stat_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises criterion between the English and
    non-English length distributions — the INTEGRATED-difference
    member of the two-sample trio: stat_ks_two_sample takes the
    supremum |F1 − F2| (sensitive to one large local gap),
    stat_ad_ksample weights the tails, CvM integrates the squared gap
    over the pooled sample, T = n1·n2/N² · Σ_z (F1(z) − F2(z))²
    summed over all N pooled observations (per distinct value,
    weighted by its pooled multiplicity). The drift statistic of
    record when MANY small distributional shifts matter more than one
    spike. z standardizes with the exact no-ties null moments
    E[T] = (N+1)/(6N) and Var[T] = (N+1)(4n1n2N − 3(n1²+n2²) −
    2n1n2)/(180·N²·n1n2) (Anderson 1962) — BOTH verified against
    brute-force enumeration over all C(N, n1) assignments in
    tests/test_stat_invariants.py, the stat_ad_ksample precedent.

    Exactness: per distinct value the gap numerator cum1·n2 − cum2·n1
    is an exact integer (the stat_ks_two_sample grid); only the final
    weighted sum-of-squares accumulates in double (1-row qround(6)
    class). The cumulative table is value-distinct-sized and both
    running counts come from ONE distributed_cumsum_multi pass (range
    exchange + per-partition window + broadcast offsets — never a
    global window). Guards: an empty side (n1·n2 = 0) NULLs both
    statistics; an empty corpus emits zero rows.

    100 TB: one corpus-scale value-count aggregate, then cumsum
    machinery on the (typically tiny) distinct-value table — the
    stat_ks_two_sample bill exactly."""
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    docs = load_table(spark, sf_dir, "documents")
    pv = (
        docs.select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("g"),
        )
        .groupBy("v")
        .agg(
            F.sum("g").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("g")).cast("long").alias("c2"),
        )
        # the cumsum machinery consumes pv three ways (local rows,
        # per-partition totals, grand totals): checkpoint so the
        # documents scan + aggregate runs once (the ks convention)
        .transform(pin)
    )
    # cumulative table checkpointed (the r10 ladder-collapse sweep)
    rc = distributed_cumsum_multi(
        pv, ["v"], ["c1", "c2"], ["cum1", "cum2"], ["n1", "n2"]
    ).transform(pin)
    gap = (
        F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    ).cast("double")
    s = rc.groupBy("n1", "n2").agg(
        F.sum((F.col("c1") + F.col("c2")).cast("double") * gap * gap).alias(
            "num"
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    t_stat = F.col("num") / (n1d * n2d * nd * nd * nd * nd)
    et = (nd + 1.0) / (6.0 * nd)
    vt = (
        (nd + 1.0)
        * (4.0 * n1d * n2d * nd - 3.0 * (n1d * n1d + n2d * n2d) - 2.0 * n1d * n2d)
        / (180.0 * nd * nd * n1d * n2d)
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return s.select(
        "n1",
        "n2",
        F.when(ok, qround(t_stat, 6)).alias("t_stat"),
        F.when(ok, qround((t_stat - et) / F.sqrt(vt), 6)).alias("z_stat"),
    )


@query(
    "stat_cmh",
    oracle=f"""
    WITH x AS (
        SELECT lang, doc_id % 2 AS arm,
               CAST(n_chars AS BIGINT) AS v
        FROM documents
    ),
    lvc AS (
        SELECT lang, arm, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM x GROUP BY lang, arm, v
    ),
    pv AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS l FROM lvc GROUP BY v
    ),
    pool AS (
        SELECT list_transform(list_sort(list({{'v': v, 'l': l}})),
                              s -> s.v) AS vs,
               {_ad_prefix_sql(
                   "list_transform(list_sort(list({'v': v, 'l': l})),"
                   " s -> s.l)")} AS lcum,
               CAST(SUM(l) AS BIGINT) AS n
        FROM pv
    ),
    med AS (
        SELECT n,
               vs[CAST(len(list_filter(lcum[2:],
                   c -> c < (n + 1) // 2)) AS INT) + 1] AS gm
        FROM pool
    ),
    g AS (
        SELECT lvc.lang,
               CAST(SUM(lvc.c) AS BIGINT) AS nk,
               CAST(SUM(CASE WHEN lvc.arm = 1 THEN lvc.c ELSE 0 END)
                    AS BIGINT) AS n1k,
               CAST(SUM(CASE WHEN lvc.v > med.gm THEN lvc.c ELSE 0 END)
                    AS BIGINT) AS m1k,
               CAST(SUM(CASE WHEN lvc.arm = 1 AND lvc.v > med.gm
                             THEN lvc.c ELSE 0 END) AS BIGINT) AS ak,
               MAX(med.gm) AS gm
        FROM lvc, med GROUP BY lvc.lang
    ),
    f AS (SELECT * FROM g WHERE nk >= 2),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(nk) AS BIGINT) AS n,
               MAX(gm) AS gm,
               SUM(ak - CAST(n1k AS DOUBLE) * m1k / nk) AS dev,
               SUM(CAST(n1k AS DOUBLE) * (nk - n1k) * m1k * (nk - m1k)
                   / (CAST(nk AS DOUBLE) * nk * (nk - 1))) AS vsum,
               SUM(CAST(ak AS DOUBLE)
                   * (nk - n1k - m1k + ak) / nk) AS orn,
               SUM(CAST(n1k - ak AS DOUBLE) * (m1k - ak) / nk) AS ord
        FROM f
    )
    SELECT k, n, CAST(gm AS BIGINT) AS grand_median,
           CASE WHEN vsum > 0
                THEN {sql_qround('dev * dev / vsum', 6)}
           END AS chi2,
           CASE WHEN ord > 0 THEN {sql_qround('orn / ord', 6)}
           END AS or_mh
    FROM agg WHERE k > 0
    """,
)
def stat_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of a 2×2 association held ACROSS
    strata — the stratified-experiment primitive: arm = doc_id parity
    (the deterministic A/B split, split_train_test's convention),
    outcome = length above the pooled grand median (the
    stat_moods_median order statistic), strata = lang. CMH asks
    whether the arm→outcome association persists after conditioning
    on language — the guard against Simpson's paradox that a flat
    2×2 chi-square (stat_chi2_independence) cannot give. χ²_CMH =
    (Σ_k(a_k − n1k·m1k/nk))² / Σ_k n1k(nk−n1k)m1k(nk−m1k)/(nk²(nk−1))
    ~ χ²(1) (Mantel & Haenszel 1959, no continuity correction), with
    the MH common odds ratio Σ(a_k d_k/nk)/Σ(b_k c_k/nk) alongside.

    Exactness: every cell count a/b/c/d is an exact integer derived
    from the (lang, arm, value) CELL table — the sufficient statistic
    (the stat_moods_median argument): the pooled grand median, the
    per-stratum margins and the cells are ALL tiny re-aggregates of
    it, so the corpus is scanned and aggregated exactly once. Strata
    with nk < 2 are excluded from BOTH sums (V_k is undefined there)
    — stated, not hidden. The per-stratum E/V terms are rationals
    accumulated in double over k ≤ |langs| strata (1-row qround(6)
    class). Guards: all-tied corpus (vsum = 0) or an empty odds
    denominator NULLs; an empty corpus emits zero rows.

    100 TB: ONE corpus-scale hash aggregate (the cell table,
    localCheckpointed), a broadcast 1-row median, and bounded-k
    re-aggregates — the stat_moods_median bill exactly."""
    x = load_table(spark, sf_dir, "documents").select(
        "lang",
        (F.col("doc_id") % 2).alias("arm"),
        F.col("n_chars").cast("long").alias("v"),
    )
    lvc = (
        x.groupBy("lang", "arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    pv = lvc.groupBy("v").agg(F.sum("c").cast("long").alias("l"))
    pool = pv.agg(
        F.array_sort(F.collect_list(F.struct("v", "l"))).alias("vl"),
        F.sum("l").cast("long").alias("n"),
    ).select(
        F.transform("vl", lambda s: s["v"]).alias("vs"),
        F.aggregate(
            F.transform("vl", lambda s: s["l"]),
            F.array(F.lit(0).cast("long")),
            lambda acc, y: F.concat(
                acc, F.array(F.element_at(acc, -1) + y)
            ),
        ).alias("lcum"),
        "n",
    )
    med = pool.select(
        F.when(
            F.size("vs") > 0,
            F.element_at(
                "vs",
                F.size(
                    F.filter(
                        F.slice(F.col("lcum"), 2, F.size("lcum") - 1),
                        lambda c: c
                        < F.floor(
                            (F.col("n") + 1).cast("double") / 2
                        ).cast("long"),
                    )
                ).cast("int")
                + 1,
            ),
        ).alias("gm")
    )
    g = (
        lvc.crossJoin(F.broadcast(med))
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("nk"),
            F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n1k"),
            F.sum(F.when(F.col("v") > F.col("gm"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("m1k"),
            F.sum(
                F.when(
                    (F.col("arm") == 1) & (F.col("v") > F.col("gm")),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("ak"),
            F.max("gm").alias("gm"),
        )
        .filter(F.col("nk") >= 2)
    )
    nkd = F.col("nk").cast("double")
    ek = F.col("n1k").cast("double") * F.col("m1k") / nkd
    vk = (
        F.col("n1k").cast("double")
        * (F.col("nk") - F.col("n1k"))
        * F.col("m1k")
        * (F.col("nk") - F.col("m1k"))
        / (nkd * nkd * (nkd - 1))
    )
    dk = F.col("nk") - F.col("n1k") - F.col("m1k") + F.col("ak")
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("nk").cast("long").alias("n"),
        F.max("gm").alias("gm"),
        F.sum(F.col("ak") - ek).alias("dev"),
        F.sum(vk).alias("vsum"),
        F.sum(F.col("ak").cast("double") * dk / nkd).alias("orn"),
        F.sum(
            (F.col("n1k") - F.col("ak")).cast("double")
            * (F.col("m1k") - F.col("ak"))
            / nkd
        ).alias("ord"),
    )
    return agg.where(F.col("k") > 0).select(
        "k",
        "n",
        F.col("gm").cast("long").alias("grand_median"),
        F.when(
            F.col("vsum") > 0,
            qround(F.col("dev") * F.col("dev") / F.col("vsum"), 6),
        ).alias("chi2"),
        F.when(
            F.col("ord") > 0, qround(F.col("orn") / F.col("ord"), 6)
        ).alias("or_mh"),
    )


@query(
    "stat_lilliefors",
    oracle=f"""
    WITH pv AS (
        SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1
    ),
    mom AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(v * c) AS BIGINT) AS sv,
               CAST(SUM(v * v * c) AS BIGINT) AS svv
        FROM pv
    ),
    cc AS (
        SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM pv
    ),
    z AS (
        SELECT cc.v, cc.c, cc.cum, mom.n,
               CAST(mom.sv AS DOUBLE) / mom.n AS mu,
               CASE WHEN mom.n >= 4
                         AND mom.n * mom.svv - mom.sv * mom.sv > 0
                    THEN sqrt((CAST(mom.n AS DOUBLE) * mom.svv
                               - CAST(mom.sv AS DOUBLE) * mom.sv)
                              / (CAST(mom.n AS DOUBLE) * (mom.n - 1)))
               END AS sd
        FROM cc, mom
    ),
    ph AS (
        SELECT v, c, cum, n, mu, sd,
               {sql_norm_cdf('((v - mu) / sd)')} AS phi
        FROM z
    )
    SELECT n,
           {sql_qround('MAX(mu)', 6)} AS mean,
           {sql_qround('MAX(sd)', 6)} AS sd,
           {sql_qround(
               'MAX(GREATEST(cum / CAST(n AS DOUBLE) - phi,'
               ' phi - (cum - c) / CAST(n AS DOUBLE)))', 6)} AS d_stat
    FROM ph GROUP BY n
    """,
)
def stat_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors normality test on the pooled length distribution:
    the Kolmogorov-Smirnov D against a normal with ESTIMATED mean and
    variance (Lilliefors 1967) — the EDF-based member of the
    normality pair with stat_jarque_bera (moment-based; JB sees
    skew/kurtosis, Lilliefors sees any shape misfit including
    bimodality that third/fourth moments miss). D = sup_x of
    max(F̂(x) − Φ(z_x), Φ(z_x) − F̂(x⁻)) over the exact value-count
    grid — both one-sided gaps per distinct value, the same grid
    discipline as stat_ks_two_sample.

    Φ is the shared cross-engine Hastings polynomial
    (functions.norm_cdf / sql_norm_cdf — identical Horner IEEE
    arithmetic on both engines; see the primitive's contract). μ̂, σ̂
    come from exact int64 moment sums, so z per grid value is
    bit-identical before Φ; the sup is a MAX over per-row doubles
    both engines derive identically (never an argmax row — the
    float-ORDER-BY rule doesn't bite), and the one emitted row is
    the qround(6) class. Guards: n < 4 or zero variance NULLs sd and
    d_stat (mean still emits); an empty corpus emits zero rows.

    100 TB: one corpus-scale value-count aggregate, one
    distributed_cumsum_multi pass over the distinct-value grid, one
    1-row moment broadcast — the stat_ks_two_sample bill."""
    from etl_geonames_spark.functions import norm_cdf
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    pv = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("n_chars").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    mom = pv.agg(
        F.sum(F.col("v") * F.col("c")).cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v") * F.col("c"))
        .cast("long")
        .alias("svv"),
    )
    # cumulative table checkpointed (the r10 ladder-collapse sweep)
    cc = distributed_cumsum_multi(
        pv, ["v"], ["c"], ["cum"], ["n"]
    ).transform(pin)
    nd = F.col("n").cast("double")
    disc = nd * F.col("svv") - F.col("sv").cast("double") * F.col("sv")
    z = cc.crossJoin(F.broadcast(mom)).select(
        "v",
        "c",
        "cum",
        "n",
        (F.col("sv").cast("double") / F.col("n")).alias("mu"),
        F.when(
            (F.col("n") >= 4) & (disc > 0),
            F.sqrt(disc / (nd * (F.col("n") - 1))),
        ).alias("sd"),
    )
    ph = z.select(
        "v",
        "c",
        "cum",
        "n",
        "mu",
        "sd",
        norm_cdf((F.col("v") - F.col("mu")) / F.col("sd")).alias("phi"),
    )
    nd2 = F.col("n").cast("double")
    gap = F.greatest(
        F.col("cum") / nd2 - F.col("phi"),
        F.col("phi") - (F.col("cum") - F.col("c")) / nd2,
    )
    return ph.groupBy("n").agg(
        qround(F.max("mu"), 6).alias("mean"),
        qround(F.max("sd"), 6).alias("sd"),
        qround(F.max(gap), 6).alias("d_stat"),
    )


@query(
    "stat_fligner_killeen",
    oracle=f"""
    WITH lvc AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    gpool AS (
        SELECT lang,
               list_transform(list_sort(list({{'v': v, 'c': c}})),
                              s -> s.v) AS vs,
               {_ad_prefix_sql(
                   "list_transform(list_sort(list({'v': v, 'c': c})),"
                   " s -> s.c)")} AS lcum,
               CAST(SUM(c) AS BIGINT) AS ng
        FROM lvc GROUP BY lang
    ),
    gmed AS (
        SELECT lang,
               vs[CAST(len(list_filter(lcum[2:],
                   x -> x < (ng + 1) // 2)) AS INT) + 1] AS med
        FROM gpool
    ),
    dcell AS (
        SELECT lvc.lang, abs(lvc.v - gmed.med) AS d,
               CAST(SUM(lvc.c) AS BIGINT) AS c
        FROM lvc JOIN gmed USING (lang) GROUP BY 1, 2
    ),
    pooled AS (
        SELECT d, CAST(SUM(c) AS BIGINT) AS cd FROM dcell GROUP BY d
    ),
    nn AS (SELECT CAST(SUM(cd) AS BIGINT) AS n FROM pooled),
    sp AS (
        SELECT d, cd, nn.n,
               0.5 + ((SUM(cd) OVER (ORDER BY d) - cd) + (cd + 1) / 2.0)
                     / (2.0 * (nn.n + 1)) AS p
        FROM pooled, nn
    ),
    sa AS (SELECT d, cd, n, {sql_norm_ppf('p')} AS a FROM sp),
    gl AS (
        SELECT MAX(n) AS n, SUM(cd * a) AS s1, SUM(cd * a * a) AS s2
        FROM sa
    ),
    g AS (
        SELECT dcell.lang, CAST(SUM(dcell.c) AS BIGINT) AS ng,
               SUM(dcell.c * sa.a) AS sag
        FROM dcell JOIN sa USING (d) GROUP BY 1
    ),
    res AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(gl.n) AS n,
               SUM(g.ng * (g.sag / g.ng - gl.s1 / gl.n)
                        * (g.sag / g.ng - gl.s1 / gl.n)) AS st,
               MAX(gl.s2) AS s2, MAX(gl.s1) AS s1
        FROM g, gl
    )
    SELECT k, CAST(n AS BIGINT) AS n, CAST(k - 1 AS BIGINT) AS dof,
           CASE WHEN k >= 2 AND n >= 2
                     AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN {sql_qround(
                    'st / ((s2 - s1 * s1 / n) / (n - 1))', 6)}
           END AS chi2
    FROM res WHERE k > 0
    """,
)
def stat_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen test of variance homogeneity across the
    per-lang length distributions — the RANK-based member of the
    scale-test trio (stat_bartlett: parametric, normal-sensitive;
    stat_levene: mean-centered absolute deviations; FK: normal
    scores of ranked MEDIAN-centered deviations — the most
    outlier-robust of the three and R's recommended default for
    non-normal data). a_i = Φ⁻¹(1/2 + r̄_i/(2(N+1))) on midranks r̄ of
    |x − med_g| pooled across groups; χ² = Σ n_g(ā_g − ā)²/V with
    V the score variance, ~χ²(k−1) (Conover, Johnson & Johnson 1981).

    Machinery is the round-10 sufficient-statistic stack end to end:
    per-group LOWER medians from the (lang, value) cell table (the
    stat_moods_median fold per group), deviation cells re-aggregated,
    pooled midranks from ONE distributed_cumsum_multi pass (the
    stat_kendall_w trick — no per-row rank), and normal scores via
    the shared cross-engine Acklam polynomial (functions.norm_ppf /
    sql_norm_ppf; p ∈ (1/2, 1] by construction so only the central
    and upper branches evaluate). Per-group score sums accumulate in
    double (order-nondeterministic) but feed the single 1-row
    qround(6) emit — the stat_bartlett accepted class. Guards: k < 2
    or zero score variance (all deviations equal, e.g. a constant
    corpus) NULLs χ²; an empty corpus emits zero rows.

    100 TB: ONE corpus-scale cell aggregate (checkpointed), bounded
    re-aggregates, cumsum machinery on the deviation-value grid —
    the moods/kendall bill."""
    from etl_geonames_spark.functions import norm_ppf
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    lvc = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.col("n_chars").cast("long").alias("v"))
        .groupBy("lang", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    gpool = lvc.groupBy("lang").agg(
        F.array_sort(F.collect_list(F.struct("v", "c"))).alias("vl"),
        F.sum("c").cast("long").alias("ng"),
    ).select(
        "lang",
        F.transform("vl", lambda s: s["v"]).alias("vs"),
        F.aggregate(
            F.transform("vl", lambda s: s["c"]),
            F.array(F.lit(0).cast("long")),
            lambda acc, y: F.concat(
                acc, F.array(F.element_at(acc, -1) + y)
            ),
        ).alias("lcum"),
        "ng",
    )
    gmed = gpool.select(
        "lang",
        F.element_at(
            "vs",
            F.size(
                F.filter(
                    F.slice(F.col("lcum"), 2, F.size("lcum") - 1),
                    lambda x: x
                    < F.floor(
                        (F.col("ng") + 1).cast("double") / 2
                    ).cast("long"),
                )
            ).cast("int")
            + 1,
        ).alias("med"),
    )
    dcell = (
        lvc.join(F.broadcast(gmed), "lang")
        .select(
            "lang", F.abs(F.col("v") - F.col("med")).alias("d"), "c"
        )
        .groupBy("lang", "d")
        .agg(F.sum("c").cast("long").alias("c"))
        .transform(pin)
    )
    pooled = dcell.groupBy("d").agg(F.sum("c").cast("long").alias("cd"))
    rc = distributed_cumsum_multi(pooled, ["d"], ["cd"], ["cum"], ["nn"])
    mr = (F.col("cum") - F.col("cd")).cast("double") + (
        F.col("cd") + 1
    ) / 2.0
    p = 0.5 + mr / (2.0 * (F.col("nn") + 1))
    sa = rc.select(
        "d",
        "cd",
        F.col("nn").alias("n"),
        norm_ppf(p).alias("a"),
    ).transform(pin)
    glob = sa.agg(
        F.max("n").alias("n"),
        F.sum(F.col("cd") * F.col("a")).alias("s1"),
        F.sum(F.col("cd") * F.col("a") * F.col("a")).alias("s2"),
    )
    g = (
        dcell.join(F.broadcast(sa.select("d", "a")), "d")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("ng"),
            F.sum(F.col("c") * F.col("a")).alias("sag"),
        )
    )
    abar = F.col("s1") / F.col("n")
    dev = F.col("sag") / F.col("ng") - abar
    res = g.crossJoin(F.broadcast(glob)).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("ng") * dev * dev).alias("st"),
        F.max("s2").alias("s2"),
        F.max("s1").alias("s1"),
    )
    vv = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    return res.where(F.col("k") > 0).select(
        "k",
        "n",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.when(
            (F.col("k") >= 2) & (F.col("n") >= 2) & (vv > 0),
            qround(F.col("st") / vv, 6),
        ).alias("chi2"),
    )


@query(
    "stat_shapiro_francia",
    oracle=f"""
    WITH pv AS (
        SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1
    ),
    mom AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(v * c) AS BIGINT) AS sv,
               CAST(SUM(v * v * c) AS BIGINT) AS svv
        FROM pv
    ),
    cc AS (
        SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
               (SELECT n FROM mom) AS n
        FROM pv
    ),
    ms AS (
        SELECT v, c, n,
               list_transform(generate_series(1, CAST(c AS INT)),
                 _fj -> {sql_norm_ppf(
                     '((cum - c + _fj - 0.375) / (n + 0.25))')}) AS mm
        FROM cc
    ),
    cells AS (
        SELECT v, c, n,
               {_AD_FSUM.format(terms='mm')} AS sm,
               {_AD_FSUM.format(
                   terms='list_transform(mm, _y -> _y * _y)')} AS sm2
        FROM ms
    ),
    gl AS (
        SELECT MAX(n) AS n,
               SUM(v * sm) AS s1x,
               SUM(sm) AS sm,
               SUM(sm2) AS m2
        FROM cells
    ),
    fit AS (
        SELECT gl.n,
               (s1x - (CAST(mom.sv AS DOUBLE) / gl.n) * sm) AS num,
               (m2 - sm * sm / gl.n) AS m2c,
               (mom.svv - CAST(mom.sv AS DOUBLE) * mom.sv / gl.n)
                   AS sxx
        FROM gl, mom
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN n >= 5 AND m2c > 0 AND sxx > 0
                THEN {sql_qround('num * num / (m2c * sxx)', 6)}
           END AS w_stat,
           CASE WHEN n >= 5 AND m2c > 0 AND sxx > 0
                     AND num * num / (m2c * sxx) < 1.0
                THEN {sql_qround(
                    '(ln(1.0 - num * num / (m2c * sxx))'
                    ' - (1.0521 * (ln(ln(n)) - ln(n)) - 1.2725))'
                    ' / (1.0308 - 0.26758 * (ln(ln(n)) + 2.0 / ln(n)))',
                    6)}
           END AS z_stat
    FROM fit WHERE n IS NOT NULL
    """,
)
def stat_shapiro_francia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapiro-Francia normality W′ on the pooled length distribution:
    the squared correlation between the ordered sample and Blom's
    expected normal order statistics m_i = Φ⁻¹((i − 3/8)/(n + 1/4))
    (Shapiro & Francia 1972), with Royston's 1993 ln(1 − W′)
    standardization to z. The ORDER-STATISTIC member of the normality
    trio — stat_jarque_bera reads moments, stat_lilliefors reads the
    EDF, W′ reads the QQ-plot straightness — and deliberately
    Shapiro-FRANCIA rather than Shapiro-Wilk: Wilk's coefficients
    need the O(n²) order-statistic covariance matrix (a
    single-machine construct), Francia's simplification needs only
    Blom scores per rank and is the version a distributed engine can
    honestly compute.

    Ties discipline: distinct value v occupies the contiguous rank
    block (cum − c, cum]; Σ m_i x_(i) over the block = v·Σ m_i, so
    each value-cell folds its OWN rank range via the shared Acklam
    polynomial — O(c) per cell, Σc = n total work, never a
    corpus-length array on one row. Both the score sum and its square
    fold in the same order per cell on both engines; the cross-cell
    sums are the 1-row qround(6) accepted class. The numerator is
    CENTERED (S − x̄·Σm) because the Acklam branches make Σm only
    approximately 0. Guards: n < 5, zero variance, or zero score
    variance NULLs; W′ ≥ 1 (numerically) NULLs z; empty corpus emits
    zero rows (no pv cells).

    100 TB: one corpus-scale value-count aggregate, one cumsum pass
    over the distinct-value grid, one 1-row moment broadcast — the
    stat_lilliefors bill."""
    from etl_geonames_spark.functions import norm_ppf
    from etl_geonames_spark.operators.relational import (
        distributed_cumsum_multi,
    )

    pv = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("n_chars").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    mom = pv.agg(
        F.sum(F.col("v") * F.col("c")).cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v") * F.col("c"))
        .cast("long")
        .alias("svv"),
    )
    # cumulative table checkpointed (the r10 ladder-collapse sweep)
    cc = distributed_cumsum_multi(
        pv, ["v"], ["c"], ["cum"], ["n"]
    ).transform(pin)

    def blom(j):
        return norm_ppf(
            (F.col("cum") - F.col("c") + j - 0.375) / (F.col("n") + 0.25)
        )

    ms = cc.select(
        "v",
        "c",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.col("c").cast("int")), blom
        ).alias("mm"),
    )
    fsum = lambda col: F.aggregate(col, F.lit(0.0), lambda a, y: a + y)
    cells = ms.select(
        "v",
        "c",
        "n",
        fsum(F.col("mm")).alias("sm"),
        fsum(F.transform("mm", lambda y: y * y)).alias("sm2"),
    )
    glob = cells.agg(
        F.max("n").alias("n"),
        F.sum(F.col("v") * F.col("sm")).alias("s1x"),
        F.sum("sm").alias("sm"),
        F.sum("sm2").alias("m2"),
    )
    nd = F.col("n").cast("double")
    fit = glob.crossJoin(F.broadcast(mom)).select(
        "n",
        (
            F.col("s1x") - (F.col("sv").cast("double") / F.col("n")) * F.col("sm")
        ).alias("num"),
        (F.col("m2") - F.col("sm") * F.col("sm") / F.col("n")).alias(
            "m2c"
        ),
        (
            F.col("svv") - F.col("sv").cast("double") * F.col("sv") / F.col("n")
        ).alias("sxx"),
    )
    w = F.col("num") * F.col("num") / (F.col("m2c") * F.col("sxx"))
    ok = (F.col("n") >= 5) & (F.col("m2c") > 0) & (F.col("sxx") > 0)
    lnn = F.log(nd)
    mu_z = 1.0521 * (F.log(lnn) - lnn) - 1.2725
    sd_z = 1.0308 - 0.26758 * (F.log(lnn) + 2.0 / lnn)
    return fit.where(F.col("n").isNotNull()).select(
        F.col("n").cast("long").alias("n"),
        F.when(ok, qround(w, 6)).alias("w_stat"),
        F.when(ok & (w < 1.0), qround((F.log(1.0 - w) - mu_z) / sd_z, 6)).alias(
            "z_stat"
        ),
    )


@query(
    "stat_hellinger",
    oracle=f"""
    WITH m AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
        FROM documents
    ),
    pv AS (
        SELECT v,
               CAST(SUM(g) AS BIGINT) AS c1,
               CAST(SUM(1 - g) AS BIGINT) AS c2
        FROM m GROUP BY v
    ),
    t AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2
        FROM pv
    ),
    s AS (
        SELECT t.n1, t.n2,
               CAST(SUM(ABS(c1 * t.n2 - c2 * t.n1)) AS BIGINT)
                   AS tvd_num,
               SUM(sqrt((CASE WHEN t.n1 > 0
                              THEN c1 / CAST(t.n1 AS DOUBLE) END)
                        * (CASE WHEN t.n2 > 0
                                THEN c2 / CAST(t.n2 AS DOUBLE) END)))
                   AS bc
        FROM pv, t GROUP BY t.n1, t.n2
    )
    SELECT n1, n2, tvd_num,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN {sql_qround(
                    'tvd_num / (2.0 * n1 * n2)', 6)}
           END AS tvd,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN {sql_qround('bc', 6)}
           END AS bc,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN {sql_qround(
                    'sqrt(GREATEST(0.0, 1.0 - bc))', 6)}
           END AS hellinger
    FROM s
    """,
)
def stat_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-distance suite between the English and
    non-English length distributions on the exact value-count grid —
    total variation distance, Bhattacharyya coefficient and Hellinger
    distance in one pass. Completes the drift family along its third
    axis: stat_ks_two_sample reads the CDF supremum,
    stat_cvm_two_sample the integrated CDF gap, dq_psi_drift a binned
    log-ratio over time; TVD/Hellinger read the POINTWISE mass
    differences, the quantities that actually bound downstream error
    (TVD bounds any event-probability shift; Hellinger bounds sample
    distinguishability), which is why mixture-rebalance pipelines
    gate on them rather than on a sup-norm.

    Exactness: TVD = Σ|c1·n2 − c2·n1| / (2·n1·n2) carries an exact
    int64 numerator (the stat_ks_two_sample cross-multiplication —
    no division until the final expression); BC = Σ√(p̂·q̂) sums
    per-cell doubles both engines derive identically (1-row qround(6)
    class), and Hellinger = √(max(0, 1 − BC)) clamps the ≤1-ulp
    BC > 1 case of identical distributions instead of NaN-ing.
    Guards: an empty side (n1·n2 = 0) NULLs all three ratios
    (tvd_num still emits); an empty corpus emits zero rows.

    100 TB: one corpus-scale value-count aggregate + one broadcast
    totals row + one reduce — no cumsum, no join, the cheapest member
    of the family."""
    docs = load_table(spark, sf_dir, "documents")
    pv = (
        docs.select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("lang") == "en", F.lit(1))
            .otherwise(F.lit(0))
            .alias("g"),
        )
        .groupBy("v")
        .agg(
            F.sum("g").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("g")).cast("long").alias("c2"),
        )
        .transform(pin)
    )
    tot = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    p1 = F.when(
        F.col("n1") > 0, F.col("c1") / F.col("n1").cast("double")
    )
    p2 = F.when(
        F.col("n2") > 0, F.col("c2") / F.col("n2").cast("double")
    )
    s = (
        pv.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            )
            .cast("long")
            .alias("tvd_num"),
            F.sum(F.sqrt(p1 * p2)).alias("bc"),
        )
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return s.select(
        "n1",
        "n2",
        "tvd_num",
        F.when(
            ok,
            qround(
                F.col("tvd_num") / (2.0 * F.col("n1") * F.col("n2")), 6
            ),
        ).alias("tvd"),
        F.when(ok, qround(F.col("bc"), 6)).alias("bc"),
        F.when(
            ok,
            qround(
                F.sqrt(F.greatest(F.lit(0.0), 1.0 - F.col("bc"))), 6
            ),
        ).alias("hellinger"),
    )


@query(
    "stat_mann_kendall_seasonal",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               dayofweek(date_trunc('day', ts)) AS season,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM dc a JOIN dc b
          ON a.event_type = b.event_type
         AND a.season = b.season
         AND a.day < b.day
        GROUP BY 1
    ),
    ties AS (
        SELECT event_type, season, c, CAST(COUNT(*) AS BIGINT) AS t
        FROM dc GROUP BY 1, 2, 3
    ),
    vg AS (
        SELECT event_type, season,
               CAST(SUM(t) AS BIGINT) AS ng,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM ties GROUP BY 1, 2
    ),
    v AS (
        SELECT event_type,
               CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_seasons,
               SUM((CAST(ng AS DOUBLE) * (ng - 1) * (2 * ng + 5)
                    - tie_term) / 18.0) AS var_s
        FROM vg GROUP BY 1
    )
    SELECT v.event_type, v.n, v.n_seasons, s.s_stat,
           CASE WHEN var_s > 0.0 THEN {sql_qround(
               '(CAST(s.s_stat AS DOUBLE)'
               ' - (CASE WHEN s.s_stat > 0 THEN 1'
               '         WHEN s.s_stat < 0 THEN -1 ELSE 0 END))'
               ' / sqrt(var_s)', 6)}
           END AS z
    FROM v JOIN s USING (event_type)
    """,
)
def stat_mann_kendall_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test per event type (Hirsch &
    Slack 1984, basic form): the MK S statistic computed ONLY within
    like seasons — here day-of-week strata, so Monday compares to
    other Mondays — then S' = Σ_g S_g with Var' = Σ_g Var_g under the
    cross-season independence assumption (the serial-correlation
    covariance correction is a documented extension). THE standard
    drift monitor for metrics with strong weekly cycles, where plain
    stat_mann_kendall reads the weekend dip as trend reversals every
    7 days and loses power: stratifying removes the cycle without
    modeling it (complement of ts_seasonal_decompose, which models
    it, and ts_seasonal_strength, which measures it).

    S_g and the per-season tie terms are EXACT int64 (the
    stat_mann_kendall discipline); per-season Var_g sums in double
    over ≤7 strata (1-row-per-type qround(6) class); continuity
    correction on the summed S'. The within-season day-pair self-join
    is O(Σ_g n_g²) per type — 7× cheaper than plain MK's O(n²) on
    the same span, and days are a bounded domain (the corpus-scale
    work is the one daily hash aggregate, checkpointed). All-tied
    series (Var' = 0) emit NULL, never DIVIDE_BY_ZERO."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # Spark dayofweek is 1-7 (Sun=1) while DuckDB's is 0-6: the
        # values are ENGINE-LOCAL grouping keys whose partitions agree
        # — season must never be emitted or cross-engine-compared
        .withColumn("season", F.dayofweek("day"))
        .transform(pin)
    )
    a, b = dc.alias("a"), dc.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.season") == F.col("b.season"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    ties = dc.groupBy("event_type", "season", "c").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    vg = ties.groupBy("event_type", "season").agg(
        F.sum("t").cast("long").alias("ng"),
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
        .cast("long")
        .alias("tie_term"),
    )
    ngd = F.col("ng").cast("double")
    v = vg.groupBy("event_type").agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum(
            (ngd * (F.col("ng") - 1) * (2 * F.col("ng") + 5)
             - F.col("tie_term"))
            / 18.0
        ).alias("var_s"),
    )
    cc = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    z = (F.col("s_stat").cast("double") - cc) / F.sqrt(F.col("var_s"))
    return v.join(s, "event_type").select(
        "event_type",
        "n",
        "n_seasons",
        "s_stat",
        F.when(F.col("var_s") > 0.0, qround(z, 6)).alias("z"),
    )


@query(
    "stat_jonckheere",
    oracle="""
    WITH cells AS (
        SELECT source AS g, CAST(n_chars AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ),
    grid AS (
        SELECT g.g, v.x FROM (SELECT DISTINCT g FROM cells) g
        CROSS JOIN (SELECT DISTINCT x FROM cells) v
    ),
    full_g AS (
        SELECT grid.g, grid.x, COALESCE(cells.c, CAST(0 AS BIGINT)) AS c
        FROM grid LEFT JOIN cells USING (g, x)
    ),
    below AS (
        SELECT g, x, c,
               COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS b
        FROM full_g
    ),
    jt AS (
        SELECT CAST(SUM(2 * i.b * j.c + i.c * j.c) AS BIGINT) AS jt2
        FROM below i JOIN full_g j ON i.x = j.x AND i.g < j.g
    ),
    gs AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(c * c) AS BIGINT) AS sn2,
               CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS gA,
               CAST(SUM(c * (c - 1) * (c - 2)) AS BIGINT) AS gB,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS gC
        FROM (SELECT g, SUM(c) AS c FROM cells GROUP BY g)
    ),
    ts AS (
        SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tA,
               CAST(SUM(t * (t - 1) * (t - 2)) AS BIGINT) AS tB,
               CAST(SUM(t * (t - 1)) AS BIGINT) AS tC
        FROM (SELECT x, SUM(c) AS t FROM cells GROUP BY x)
    ),
    v AS (
        SELECT gs.n, gs.k, jt.jt2,
               CAST(gs.n * (gs.n - 1) * (2 * gs.n + 5) - gs.gA - ts.tA
                    AS DOUBLE) / 72.0
               + CAST(gs.gB AS DOUBLE) * CAST(ts.tB AS DOUBLE)
                 / CAST(36 * gs.n * (gs.n - 1) * (gs.n - 2) AS DOUBLE)
               + CAST(gs.gC AS DOUBLE) * CAST(ts.tC AS DOUBLE)
                 / CAST(8 * gs.n * (gs.n - 1) AS DOUBLE) AS var_jt,
               CAST(2 * jt.jt2 - (gs.n * gs.n - gs.sn2) AS BIGINT)
                   AS num4
        FROM gs, jt, ts
    )
    SELECT n, k, jt2, num4,
           CASE WHEN k >= 2 AND var_jt > 0 THEN
               FLOOR(CAST(num4 AS DOUBLE) / (4.0 * SQRT(var_jt))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS z
    FROM v
    """,
)
def stat_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across the
    per-source document-length distributions (sources ordered
    lexicographically — the fixture's ordinal stand-in; real
    pipelines order by crawl date, dose, model size): JT = Σ_{i<j}
    U_ij, the sum of pairwise Mann-Whitney counts in factor order.
    Strictly more powerful than stat_kruskal_wallis when the
    departure is monotone (KW spends power on every permutation of
    group means; JT spends it on the trend) — the between-groups
    sibling of stat_page_trend's within-block L.

    Sufficient-statistic form throughout: the corpus collapses to the
    (source, n_chars, count) cell table; per-group below-counts come
    from a group-PARTITIONED cumulative window over the pooled value
    grid (k·V rows, never a per-row rank), and JT2 = 2·JT =
    Σ_x Σ_{i<j} (2·b_i(x)·c_j(x) + c_i(x)·c_j(x)) is an EXACT int64
    assembled from a value-equi-join with group inequality (k²·V
    cell pairs, k and the value domain both bounded). The
    tie-corrected null variance (Hollander & Wolfe 1999, eq. 6.19)
    is three ratios of exact int64 polynomials summed in one fixed
    left-associative expression — both engines run identical IEEE
    ops; the only emitted float, z = (2·JT2 − (N²−Σn²))/(4σ), is
    qround(6)'d with an all-integer numerator. k = 1 or all-tied
    corpora NULL z (CASE, both engines). Int64 headroom: N³-scale
    terms stay exact to N ≈ 2·10⁶ rows per... per-statistic cell
    counts — beyond that move the polynomials to DECIMAL(38),
    documented not silent.

    100 TB shape: one map-side-combined hash aggregate down to cells
    (checkpointed: it feeds the grid, margins, and tie table), then
    everything is grid-sized."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy(
            F.col("source").alias("g"),
            F.col("n_chars").cast("long").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    grid = (
        cells.select("g").distinct()
        .crossJoin(F.broadcast(cells.select("x").distinct()))
    )
    full_g = grid.join(F.broadcast(cells), ["g", "x"], "left").select(
        "g", "x", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    below = full_g.select(
        "g",
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")).alias("b"),
    )
    i = below.select(
        F.col("g").alias("gi"), "x",
        F.col("c").alias("ci"), F.col("b").alias("bi"),
    )
    j = full_g.select(
        F.col("g").alias("gj"), "x", F.col("c").alias("cj")
    )
    jt = (
        i.join(F.broadcast(j), "x")
        .where(F.col("gi") < F.col("gj"))
        .agg(
            F.sum(
                2 * F.col("bi") * F.col("cj") + F.col("ci") * F.col("cj")
            )
            .cast("long")
            .alias("jt2")
        )
    )
    gs = (
        cells.groupBy("g")
        .agg(F.sum("c").alias("c"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sn2"),
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).cast("long").alias("gA"),
            F.sum(
                F.col("c") * (F.col("c") - 1) * (F.col("c") - 2)
            ).cast("long").alias("gB"),
            F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("gC"),
        )
    )
    ts = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tA"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.col("t") - 2)
            ).cast("long").alias("tB"),
            F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("tC"),
        )
    )
    n = F.col("n")
    # ANSI evaluates BOTH conjuncts of a when() CONDITION, and var_jt
    # feeds one: the tie-correction denominators 36n(n-1)(n-2) and
    # 8n(n-1) are 0 for n<=2 / n<=1, so wrap each ratio in a lazy
    # when() VALUE (NULL propagates through the sum, the condition
    # falls through to NULL z — matching the oracle's NULL).
    # stat_fleiss_kappa / stat_brunner_munzel df_den rule.
    var_jt = (
        (n * (n - 1) * (2 * n + 5) - F.col("gA") - F.col("tA")).cast(
            "double"
        )
        / F.lit(72.0)
        + F.when(
            n > 2,
            F.col("gB").cast("double")
            * F.col("tB").cast("double")
            / (36 * n * (n - 1) * (n - 2)).cast("double"),
        )
        + F.when(
            n > 1,
            F.col("gC").cast("double")
            * F.col("tC").cast("double")
            / (8 * n * (n - 1)).cast("double"),
        )
    )
    num4 = (2 * F.col("jt2") - (n * n - F.col("sn2"))).cast("long")
    return (
        gs.crossJoin(F.broadcast(jt))
        .crossJoin(F.broadcast(ts))
        .select(
            "n",
            "k",
            "jt2",
            num4.alias("num4"),
            F.when(
                (F.col("k") >= 2) & (var_jt > 0),
                qround(
                    num4.cast("double") / (F.lit(4.0) * F.sqrt(var_jt)), 6
                ),
            ).alias("z"),
        )
    )


# Two-group (en vs rest) value-grid CTE chain, ending at ``piv``:
# per pooled n_chars value, per-group counts (c0, c1) and per-group
# counts strictly below (b0, b1). Shared by stat_brunner_munzel and
# stat_ansari_bradley — the _MIDRANK_SQL pattern, so a grid fix
# propagates to the whole two-sample family or none of it.
_TWO_GROUP_GRID_SQL = """cells AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g,
               CAST(n_chars AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY g, x
    ),
    grid AS (
        SELECT gg.g, v.x FROM (SELECT 0 AS g UNION ALL SELECT 1) gg
        CROSS JOIN (SELECT DISTINCT x FROM cells) v
    ),
    full_g AS (
        SELECT grid.g, grid.x, COALESCE(cells.c, CAST(0 AS BIGINT)) AS c
        FROM grid LEFT JOIN cells USING (g, x)
    ),
    cum AS (
        SELECT g, x, c,
               COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS b
        FROM full_g
    ),
    piv AS (
        SELECT x,
               CAST(MAX(CASE WHEN g = 0 THEN c END) AS BIGINT) AS c0,
               CAST(MAX(CASE WHEN g = 1 THEN c END) AS BIGINT) AS c1,
               CAST(MAX(CASE WHEN g = 0 THEN b END) AS BIGINT) AS b0,
               CAST(MAX(CASE WHEN g = 1 THEN b END) AS BIGINT) AS b1
        FROM cum GROUP BY x
    )"""


def _two_group_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _TWO_GROUP_GRID_SQL: the checkpointed V-row
    pivot (x, c0, c1, b0, b1) both two-sample grid tests consume.
    One map-side-combined corpus aggregate + group-partitioned
    cumulative windows over the 2×V grid — the corpus scans once."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy(
            F.when(F.col("lang") == "en", F.lit(1))
            .otherwise(F.lit(0))
            .alias("g"),
            F.col("n_chars").cast("long").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    grid = (
        spark.range(2)
        .select(F.col("id").cast("int").alias("g"))
        .crossJoin(cells.select("x").distinct())
    )
    full_g = grid.join(cells, ["g", "x"], "left").select(
        "g", "x", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = full_g.select(
        "g",
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")).alias("b"),
    )

    def _of(gv, col):
        return F.max(F.when(F.col("g") == gv, F.col(col))).cast("long")

    return (
        cum.groupBy("x")
        .agg(
            _of(0, "c").alias("c0"),
            _of(1, "c").alias("c1"),
            _of(0, "b").alias("b0"),
            _of(1, "b").alias("b1"),
        )
        # V rows; every consumer runs ≥2 passes over it
        .transform(pin)
    )


@query(
    "stat_brunner_munzel",
    oracle=f"""
    WITH {_TWO_GROUP_GRID_SQL},
    tot AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0 * (2 * (b0 + b1) + c0 + c1 + 1)) AS BIGINT)
                   AS rs0,
               CAST(SUM(c1 * (2 * (b0 + b1) + c0 + c1 + 1)) AS BIGINT)
                   AS rs1
        FROM piv
    ),
    ss AS (
        SELECT
            SUM(p.c0 * POWER(CAST(
                t.n0 * ((2 * (p.b0 + p.b1) + p.c0 + p.c1 + 1)
                        - (2 * p.b0 + p.c0 + 1))
                - t.rs0 + t.n0 * (t.n0 + 1) AS DOUBLE), 2)) AS q0,
            SUM(p.c1 * POWER(CAST(
                t.n1 * ((2 * (p.b0 + p.b1) + p.c0 + p.c1 + 1)
                        - (2 * p.b1 + p.c1 + 1))
                - t.rs1 + t.n1 * (t.n1 + 1) AS DOUBLE), 2)) AS q1
        FROM piv p, tot t
    ),
    fin AS (
        SELECT t.n0, t.n1, t.rs0, t.rs1,
               CASE WHEN t.n0 > 1 THEN ss.q0
                    / (4.0 * t.n0 * t.n0 * (t.n0 - 1)) END AS s0,
               CASE WHEN t.n1 > 1 THEN ss.q1
                    / (4.0 * t.n1 * t.n1 * (t.n1 - 1)) END AS s1
        FROM tot t, ss
    )
    SELECT n0, n1,
           CASE WHEN n0 > 0 AND n1 > 0 THEN
               FLOOR(CAST(rs1 - n1 * (n1 + 1) AS DOUBLE)
                     / (2.0 * n0 * n1) * 1000000.0 + 0.5) / 1000000.0
           END AS p_hat,
           CASE WHEN n0 > 1 AND n1 > 1
                     AND n0 * s0 + n1 * s1 > 0 THEN
               FLOOR(CAST(n0 * rs1 - n1 * rs0 AS DOUBLE)
                     / (2.0 * (n0 + n1) * SQRT(n0 * s0 + n1 * s1))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS w_bm,
           CASE WHEN n0 > 1 AND n1 > 1
                     AND (CASE WHEN n0 > 1 THEN
                              (n0*s0) * (n0*s0) / (n0 - 1) END
                          + CASE WHEN n1 > 1 THEN
                              (n1*s1) * (n1*s1) / (n1 - 1) END) > 0 THEN
               FLOOR((n0 * s0 + n1 * s1) * (n0 * s0 + n1 * s1)
                     / (CASE WHEN n0 > 1 THEN
                            (n0*s0) * (n0*s0) / (n0 - 1) END
                        + CASE WHEN n1 > 1 THEN
                            (n1*s1) * (n1*s1) / (n1 - 1) END)
                     * 1000000.0 + 0.5) / 1000000.0
           END AS df
    FROM fin
    """,
)
def stat_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Behrens-Fisher test (Brunner &
    Munzel 2000): does P(X_en > X_other) = 1/2, WITHOUT assuming
    equal variances of the two length distributions — the modern
    replacement for Mann-Whitney when spread differs between groups
    (exactly the en-vs-rest length comparison where web/other
    sources have wildly different tails). Emits the relative effect
    p̂ = P(X₀ < X₁) + ½P(=), the studentized W, and the
    Welch-Satterthwaite df the t-approximation uses.

    Pure value-grid sufficient statistics: pooled and within-group
    midranks are EXACT integers on the doubled grid (pm2 = 2·cumP +
    t + 1, wm2 = 2·cum_g + c_g + 1 — the stat_wilcoxon_signed
    .5-rational trick), the rank-variance terms are c·A² where
    A = n_g·(pm2 − wm2) − Rsum2_g + n_g(n_g+1) is exact int64 cast
    to double before squaring (A² would overflow int64 at sf0.1),
    and every emitted float has an exact-int core divided once and
    qround(6)'d. p̂'s numerator Rsum2₁ − n₁(n₁+1) and W's numerator
    n₀·Rsum2₁ − n₁·Rsum2₀ are all-integer. One-sided corpora or
    n_g < 2 NULL the guarded statistics (CASE both engines).
    Int64 headroom: Rsum2 ≤ 2N² — exact to N ≈ 2·10⁹ rows.

    100 TB shape: one map-side-combined hash aggregate to the
    (group, value) cell table (checkpointed — feeds the pivot, the
    rank sums, and the variance pass), group-PARTITIONED cumulative
    windows over the 2×V grid, then 1-row algebra. The corpus scans
    once; no per-row ranks, no global window, no distributed_rank
    machinery at all."""
    piv = _two_group_grid(spark, sf_dir)
    pm2 = 2 * (F.col("b0") + F.col("b1")) + F.col("c0") + F.col("c1") + 1
    tot = piv.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c0") * pm2).cast("long").alias("rs0"),
        F.sum(F.col("c1") * pm2).cast("long").alias("rs1"),
    )
    wm2_0 = 2 * F.col("b0") + F.col("c0") + 1
    wm2_1 = 2 * F.col("b1") + F.col("c1") + 1
    a0 = (
        F.col("n0") * (pm2 - wm2_0) - F.col("rs0")
        + F.col("n0") * (F.col("n0") + 1)
    ).cast("double")
    a1 = (
        F.col("n1") * (pm2 - wm2_1) - F.col("rs1")
        + F.col("n1") * (F.col("n1") + 1)
    ).cast("double")
    ss = piv.crossJoin(F.broadcast(tot)).agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.max("rs0").alias("rs0"),
        F.max("rs1").alias("rs1"),
        F.sum(F.col("c0") * a0 * a0).alias("q0"),
        F.sum(F.col("c1") * a1 * a1).alias("q1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0 = F.when(
        n0 > 1, F.col("q0") / (F.lit(4.0) * n0 * n0 * (n0 - 1))
    )
    s1 = F.when(
        n1 > 1, F.col("q1") / (F.lit(4.0) * n1 * n1 * (n1 - 1))
    )
    fin = ss.select("n0", "n1", "rs0", "rs1", s0.alias("s0"), s1.alias("s1"))
    var_w = n0 * F.col("s0") + n1 * F.col("s1")
    # the /(n_g - 1) divisions live inside when-VALUES (lazy), never
    # bare in a condition: ANSI evaluates every conjunct of a when
    # CONDITION, and a single-doc group would fire DIVIDE_BY_ZERO
    # (the stat_fleiss_kappa rule; s_g is NULL there anyway so the
    # sum falls through to NULL)
    df_den = F.when(
        n0 > 1, (n0 * F.col("s0")) * (n0 * F.col("s0")) / (n0 - 1)
    ) + F.when(n1 > 1, (n1 * F.col("s1")) * (n1 * F.col("s1")) / (n1 - 1))
    return fin.select(
        "n0",
        "n1",
        F.when(
            (n0 > 0) & (n1 > 0),
            qround(
                (F.col("rs1") - n1 * (n1 + 1)).cast("double")
                / (F.lit(2.0) * n0 * n1),
                6,
            ),
        ).alias("p_hat"),
        F.when(
            (n0 > 1) & (n1 > 1) & (var_w > 0),
            qround(
                (n0 * F.col("rs1") - n1 * F.col("rs0")).cast("double")
                / (F.lit(2.0) * (n0 + n1) * F.sqrt(var_w)),
                6,
            ),
        ).alias("w_bm"),
        F.when(
            (n0 > 1) & (n1 > 1) & (df_den > 0),
            qround(var_w * var_w / df_den, 6),
        ).alias("df"),
    )


def _ab_s2_sql(x: str) -> str:
    """Doubled cumulative Ansari-Bradley score sum 2·S(x) =
    2·Σ_{r=1..x} min(r, N+1−r) as a closed form (c = (N+1) div 2 is
    the peak; both branches are exact int64). Inlined with the
    caller's x expression; mirrors :func:`_ab_s2_col`."""
    return (
        f"(CASE WHEN ({x}) <= ab_c THEN ({x}) * (({x}) + 1)"
        f" ELSE ab_c * (ab_c + 1)"
        f" + (2 * n - 1 - ab_c - ({x}) + 2) * (({x}) - ab_c) END)"
    )


def _ab_s2_col(x, c, n):
    """Spark twin of :func:`_ab_s2_sql` (identical branch arithmetic:
    2N+1−c−x written as 2n−1−c−x+2 in both so the expression trees
    match term for term)."""
    return F.when(x <= c, x * (x + 1)).otherwise(
        c * (c + 1) + (2 * n - 1 - c - x + 2) * (x - c)
    )


@query(
    "stat_ansari_bradley",
    oracle=f"""
    WITH {_TWO_GROUP_GRID_SQL},
    tot AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0 + c1) AS BIGINT) AS n,
               CAST((SUM(c0 + c1) + 1) // 2 AS BIGINT) AS ab_c
        FROM piv
    ),
    terms AS (
        SELECT t.n0, t.n1, t.n, t.ab_c,
               p.c1, p.c0 + p.c1 AS tv,
               {_ab_s2_sql("p.b0 + p.b1 + p.c0 + p.c1")}
               - {_ab_s2_sql("p.b0 + p.b1")} AS s2diff
        FROM piv p, tot t
    ),
    agg AS (
        SELECT MAX(n0) AS n0, MAX(n1) AS n1, MAX(n) AS n,
               MAX(ab_c) AS ab_c,
               SUM(CAST(c1 * s2diff AS DOUBLE) / tv) AS ab2,
               SUM(CAST(s2diff AS DOUBLE) * s2diff / (4.0 * tv))
                   AS ssbar
        FROM terms
    ),
    fin AS (
        SELECT n0, n1, n, ab2,
               {_ab_s2_sql("n")} AS s2n,
               ssbar
        FROM agg
    )
    SELECT n0, n1,
           FLOOR(ab2 / 2.0 * 1000000.0 + 0.5) / 1000000.0 AS ab,
           CASE WHEN n > 0 THEN
               FLOOR(CAST(n1 * s2n AS DOUBLE) / (2.0 * n)
                     * 1000000.0 + 0.5) / 1000000.0
           END AS e_ab,
           CASE WHEN n0 > 0 AND n1 > 0 AND n > 1
                     AND n * ssbar - (s2n / 2.0) * (s2n / 2.0) > 0 THEN
               FLOOR(
                 ((ab2 * n - n1 * s2n) / (2.0 * n))
                 / SQRT(CAST(n0 AS DOUBLE) * n1
                        * (n * ssbar - (s2n / 2.0) * (s2n / 2.0))
                        / (CAST(n AS DOUBLE) * n * (n - 1)))
                 * 1000000.0 + 0.5) / 1000000.0
           END AS z
    FROM fin
    """,
)
def stat_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley rank test for a SCALE alternative between the
    en and non-en length distributions (Ansari & Bradley 1960): do
    the two groups differ in dispersion around a common center?
    Completes the two-sample battery — Mann-Whitney/Brunner-Munzel
    answer location, stat_levene answers spread with moments, AB
    answers spread with ranks (heavy-tail-safe, like the rest of the
    rank family). Scores rank from BOTH ends (min(r, N+1−r), peaked
    at the center); tied runs get the AVERAGE of their scores —
    computed by the closed-form cumulative 2·S(x) (arithmetic-series
    split at the peak, exact int64; score-of-midrank would be WRONG
    for runs crossing the peak, the classic AB tie mistake). Normal
    approximation uses the tie-CONDITIONAL moments (sums over the
    actual assigned scores), matching R's ansari.test.

    Value-grid sufficient statistics on the shared _two_group_grid
    pivot: per pooled value the doubled score-sum difference
    S2(b)−S2(B) is exact int64; the group sum AB and the pooled
    second moment Σs̄² are assembled in double from those exact
    integers (per-term /t is one correctly-rounded division) and
    every emitted float is qround(6) with integer guards — z's
    structure (N·AB2 − n1·S2(N))/(2N·σ) keeps the mean subtraction
    on an exact-int spine. One-sided or constant corpora NULL z.

    100 TB shape: identical to stat_brunner_munzel — one corpus
    aggregate to cells, grid-sized everything after."""
    piv = _two_group_grid(spark, sf_dir)
    tot = piv.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c0") + F.col("c1")).cast("long").alias("n"),
        F.expr("(sum(c0 + c1) + 1) div 2").cast("long").alias("ab_c"),
    )
    n, c = F.col("n"), F.col("ab_c")
    b_lo = F.col("b0") + F.col("b1")
    b_hi = b_lo + F.col("c0") + F.col("c1")
    s2diff = _ab_s2_col(b_hi, c, n) - _ab_s2_col(b_lo, c, n)
    tv = F.col("c0") + F.col("c1")
    agg = piv.crossJoin(F.broadcast(tot)).agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.max("n").alias("n"),
        F.max("ab_c").alias("ab_c"),
        F.sum((F.col("c1") * s2diff).cast("double") / tv).alias("ab2"),
        F.sum(
            s2diff.cast("double") * s2diff / (F.lit(4.0) * tv)
        ).alias("ssbar"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s2n = _ab_s2_col(F.col("n"), F.col("ab_c"), F.col("n"))
    fin = agg.select(
        "n0", "n1", "n", "ab2", s2n.alias("s2n"), "ssbar"
    )
    n = F.col("n")
    var_core = n * F.col("ssbar") - (F.col("s2n") / F.lit(2.0)) * (
        F.col("s2n") / F.lit(2.0)
    )
    z = (
        (F.col("ab2") * n - n1 * F.col("s2n")) / (F.lit(2.0) * n)
    ) / F.sqrt(
        n0.cast("double") * n1 * var_core
        / (n.cast("double") * n * (n - 1))
    )
    return fin.select(
        "n0",
        "n1",
        qround(F.col("ab2") / F.lit(2.0), 6).alias("ab"),
        F.when(
            n > 0,
            qround(
                (n1 * F.col("s2n")).cast("double") / (F.lit(2.0) * n), 6
            ),
        ).alias("e_ab"),
        F.when(
            (n0 > 0) & (n1 > 0) & (n > 1) & (var_core > 0), qround(z, 6)
        ).alias("z"),
    )


@query(
    "stat_quade",
    oracle="""
    WITH dc AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, t.event_type, COALESCE(dc.c, CAST(0 AS BIGINT)) AS c
        FROM (SELECT DISTINCT day FROM dc) d
        CROSS JOIN (SELECT DISTINCT event_type FROM dc) t
        LEFT JOIN dc USING (day, event_type)
    ),
    ranked AS (
        SELECT day, event_type, c,
               CAST(2 * RANK() OVER (PARTITION BY day ORDER BY c)
                    + COUNT(*) OVER (PARTITION BY day, c) - 1
                    AS BIGINT) AS r2
        FROM grid
    ),
    blocks AS (
        SELECT day, CAST(MAX(c) - MIN(c) AS BIGINT) AS d
        FROM grid GROUP BY day
    ),
    dcnt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS t FROM blocks GROUP BY d),
    dlow AS (
        SELECT a.d,
               CAST(a.t AS BIGINT) AS t,
               CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS below
        FROM dcnt a LEFT JOIN dcnt b ON b.d < a.d
        GROUP BY a.d, a.t
    ),
    q AS (
        SELECT blocks.day, 2 * dlow.below + dlow.t + 1 AS q2
        FROM blocks JOIN dlow ON blocks.d = dlow.d
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                  CAST(COUNT(DISTINCT day) AS BIGINT) AS n
           FROM dc),
    s AS (
        SELECT r.event_type,
               CAST(SUM(q.q2 * (r.r2 - kk.k - 1)) AS BIGINT) AS sj4,
               CAST(SUM(q.q2 * (r.r2 - kk.k - 1)
                        * q.q2 * (r.r2 - kk.k - 1)) AS BIGINT) AS aj16
        FROM ranked r JOIN q USING (day), kk
        GROUP BY r.event_type
    ),
    agg AS (
        SELECT CAST(SUM(sj4 * sj4) AS BIGINT) AS sb,
               CAST(SUM(aj16) AS BIGINT) AS a16
        FROM s
    )
    SELECT kk.n AS n_blocks, kk.k AS k,
           CASE WHEN kk.n * agg.a16 - agg.sb > 0 THEN
               FLOOR(CAST((kk.n - 1) * agg.sb AS DOUBLE)
                     / CAST(kk.n * agg.a16 - agg.sb AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0
           END AS quade_f
    FROM kk, agg
    """,
)
def stat_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test (Quade 1979; Conover 1999 §5.8) over blocks = days,
    treatments = event types: Friedman's repeated-measures question —
    do the types rank the same way every day? — but with blocks
    WEIGHTED by their range midrank, so high-signal days (large
    spread between types) count more than flat days. More powerful
    than stat_friedman for small k; the pair ships both so the
    monitoring playbook can quote whichever assumption fits.

    ALL-INTEGER core, stronger than Friedman's: on the quadrupled
    scale S4_ij = q2_i·(r2_ij − k − 1) (doubled block-weight midrank
    × doubled centered within-block midrank) is exact int64, so
    A = ΣS4², B-sums, and the variance-ratio F = (n−1)·SB /
    (n·A16 − SB) have exact int64 numerator AND denominator — the
    positivity guard is an integer predicate, immune to float drift
    by construction (not merely absorbed by the grid). Headroom:
    Sj4² ≤ 16n⁴k² — exact past 10⁴ daily blocks, DECIMAL(38) beyond,
    documented. All-identical-ranking days (A = B) NULL the F (the
    Conover degenerate case).

    100 TB shape: one fact-scale aggregate to the day×type grid,
    day-partitioned rank windows (never global), the block-weight
    midranks from a tiny D-value self-join (broadcast, |distinct
    ranges|²), one keyed sum per treatment."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(pin)
    )
    days = dc.select("day").distinct()
    types = dc.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(dc, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
        )
        .transform(pin)
    )
    wr = Window.partitionBy("day").orderBy("c")
    wt = Window.partitionBy("day", "c")
    ranked = grid.select(
        "day",
        "event_type",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).cast("long").alias("r2"),
    )
    blocks = grid.groupBy("day").agg(
        (F.max("c") - F.min("c")).cast("long").alias("d")
    )
    dcnt = blocks.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    a = dcnt.select(F.col("d"), F.col("t"))
    b = dcnt.select(F.col("d").alias("bd"), F.col("t").alias("bt"))
    dlow = (
        a.join(F.broadcast(b), F.col("bd") < F.col("d"), "left")
        .groupBy("d", "t")
        .agg(F.coalesce(F.sum("bt"), F.lit(0)).cast("long").alias("below"))
    )
    q = blocks.join(F.broadcast(dlow), "d").select(
        "day", (2 * F.col("below") + F.col("t") + 1).alias("q2")
    )
    kk = dc.agg(
        F.countDistinct("event_type").cast("long").alias("k"),
        F.countDistinct("day").cast("long").alias("n"),
    )
    s4 = F.col("q2") * (F.col("r2") - F.col("k") - 1)
    s = (
        # q is day-sized (bounded domain at any corpus scale) —
        # broadcast so the grid side never shuffles for this join
        ranked.join(F.broadcast(q), "day")
        .crossJoin(F.broadcast(kk))
        .groupBy("event_type")
        .agg(
            F.sum(s4).cast("long").alias("sj4"),
            F.sum(s4 * s4).cast("long").alias("aj16"),
        )
    )
    agg = s.agg(
        F.sum(F.col("sj4") * F.col("sj4")).cast("long").alias("sb"),
        F.sum("aj16").cast("long").alias("a16"),
    )
    nb, k = F.col("n"), F.col("k")
    den = nb * F.col("a16") - F.col("sb")
    return (
        kk.crossJoin(F.broadcast(agg))
        .select(
            nb.alias("n_blocks"),
            k.alias("k"),
            F.when(
                den > 0,
                qround(
                    ((nb - 1) * F.col("sb")).cast("double")
                    / den.cast("double"),
                    6,
                ),
            ).alias("quade_f"),
        )
    )


@query(
    "stat_hodges_lehmann",
    oracle="""
    WITH dc AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type, list(c) AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dc GROUP BY event_type
    ),
    w AS (
        SELECT event_type, n, n * (n + 1) // 2 AS nw,
            list_sort(flatten(list_transform(
                generate_series(1, CAST(n AS INT)),
                _hi -> list_transform(
                    generate_series(_hi, CAST(n AS INT)),
                    _hj -> v[_hi] + v[_hj])))) AS ws
        FROM arr
    )
    SELECT event_type,
           n AS n_days,
           nw AS n_walsh,
           ws[CAST((nw + 1) // 2 AS INT)] AS walsh_lo,
           ws[CAST(nw // 2 + 1 AS INT)] AS walsh_hi,
           (CAST(ws[CAST((nw + 1) // 2 AS INT)] AS DOUBLE)
            + CAST(ws[CAST(nw // 2 + 1 AS INT)] AS DOUBLE))
               / CAST(4 AS DOUBLE) AS hl
    FROM w
    """,
)
def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann one-sample location estimator per event type
    (Hodges & Lehmann 1963): the median of all n(n+1)/2 Walsh
    averages (x_i + x_j)/2, i ≤ j — the robust location family's
    missing member next to stat_theil_sen (its regression sibling)
    and stat_wilcoxon_signed (whose confidence interval it inverts):
    ~real efficiency of the mean at the normal, 29% breakdown.

    ALL-INTEGER core: daily counts are int64, so every Walsh SUM
    (x_i + x_j, halving deferred) is exact, the median selection is
    integer array indexing over the sorted sum list (lower/upper
    middle emitted as exact integers), and the HL value itself is
    (lo + hi)/4 — sums of two integers divided by an exact power of
    two, exactly representable in a double on both engines (the
    0.25-grid; no qround needed, same class as the theta method's
    alpha = 0.5). Odd n_walsh makes lo = hi and hl = lo/2.

    100 TB shape: one corpus-scale daily aggregate (the ts_kpss bill
    class), then per-series O(n²) in-cell Walsh arithmetic over the
    metadata-sized day arrays; the year-scale escape hatch is the
    published O(n log n) HL selection (Monahan 1984), which replaces
    the in-cell sort with a rank-binary-search — same statistics."""
    ev = load_table(spark, sf_dir, "events")
    dc = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    arr = dc.groupBy("event_type").agg(
        F.collect_list("c").alias("v"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    n = F.col("n").cast("int")
    ws = F.array_sort(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.transform(
                    F.sequence(i.cast("int"), n),
                    lambda j: F.element_at(F.col("v"), i.cast("int"))
                    + F.element_at(F.col("v"), j.cast("int")),
                ),
            )
        )
    )
    nw = (F.col("n") * (F.col("n") + 1) / F.lit(2)).cast("long")
    w = arr.select(
        "event_type",
        F.col("n").alias("n_days"),
        nw.alias("nw"),
        ws.alias("ws"),
    )
    lo = F.element_at(
        F.col("ws"), ((F.col("nw") + 1) / F.lit(2)).cast("int")
    )
    hi = F.element_at(
        F.col("ws"), (F.col("nw") / F.lit(2) + 1).cast("int")
    )
    return w.select(
        "event_type",
        "n_days",
        F.col("nw").alias("n_walsh"),
        lo.alias("walsh_lo"),
        hi.alias("walsh_hi"),
        ((lo.cast("double") + hi.cast("double")) / F.lit(4.0)).alias(
            "hl"
        ),
    )


def _mpol_med_sql(src: str, key: str | None, val: str = "v") -> str:
    """Exact grid median of ``val`` per ``key`` (or globally when key
    is None): average of the two middle order statistics by integer
    list indexing — the stat_hodges_lehmann selection, never an
    engine median() (whose interpolation rule differs)."""
    k = f"{key}, " if key else ""
    g = f"GROUP BY {key}" if key else ""
    sel = f"{key} AS k, " if key else ""
    return (
        f"SELECT {sel}"
        f"(ws[CAST((n + 1) // 2 AS INT)]"
        f" + ws[CAST(n // 2 + 1 AS INT)]) / 2.0 AS m "
        f"FROM (SELECT {k}list_sort(list({val})) AS ws, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {src} {g})"
    )


@query(
    "stat_median_polish",
    oracle=f"""
    WITH z0 AS (
        SELECT event_type AS t, date_trunc('day', ts) AS d,
               CAST(COUNT(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    rm1 AS ({_mpol_med_sql("z0", "t")}),
    z1 AS (SELECT z.t, z.d, z.v - r.m AS v
           FROM z0 z JOIN rm1 r ON r.k = z.t),
    re1 AS (SELECT k AS t, m AS e FROM rm1),
    ce0 AS (SELECT DISTINCT d, CAST(0 AS DOUBLE) AS e FROM z0),
    dc1 AS ({_mpol_med_sql("ce0", None, "e")}),
    ce0b AS (SELECT d, e - (SELECT m FROM dc1) AS e FROM ce0),
    cm1 AS ({_mpol_med_sql("z1", "d")}),
    z2 AS (SELECT z.t, z.d, z.v - c.m AS v
           FROM z1 z JOIN cm1 c ON c.k = z.d),
    ce1 AS (SELECT ce0b.d, ce0b.e + c.m AS e
            FROM ce0b JOIN cm1 c ON c.k = ce0b.d),
    dr1 AS ({_mpol_med_sql("re1", None, "e")}),
    re2 AS (SELECT t, e - (SELECT m FROM dr1) AS e FROM re1),
    rm2 AS ({_mpol_med_sql("z2", "t")}),
    z3 AS (SELECT z.t, z.d, z.v - r.m AS v
           FROM z2 z JOIN rm2 r ON r.k = z.t),
    re3 AS (SELECT re2.t, re2.e + r.m AS e
            FROM re2 JOIN rm2 r ON r.k = re2.t),
    dc2 AS ({_mpol_med_sql("ce1", None, "e")}),
    ce2 AS (SELECT d, e - (SELECT m FROM dc2) AS e FROM ce1),
    cm2 AS ({_mpol_med_sql("z3", "d")}),
    z4 AS (SELECT z.t, z.d, z.v - c.m AS v
           FROM z3 z JOIN cm2 c ON c.k = z.d),
    ce3 AS (SELECT ce2.d, ce2.e + c.m AS e
            FROM ce2 JOIN cm2 c ON c.k = ce2.d),
    dr2 AS ({_mpol_med_sql("re3", None, "e")}),
    re4 AS (SELECT t, e - (SELECT m FROM dr2) AS e FROM re3)
    SELECT z4.t AS event_type, z4.d AS day,
           z4.v AS residual,
           re4.e AS row_effect,
           ce3.e AS col_effect,
           (SELECT m FROM dc1) + (SELECT m FROM dr1)
             + (SELECT m FROM dc2) + (SELECT m FROM dr2) AS overall
    FROM z4 JOIN re4 ON re4.t = z4.t JOIN ce3 ON ce3.d = z4.d
    """,
)
def stat_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the event_type × day count table
    (Tukey 1977; exactly R stats::medpolish's sweep order, 2
    iterations): alternately subtract row and column medians,
    absorbing the median of the opposite effect vector into the
    overall term — the ROBUST two-way decomposition x = overall +
    row_effect + col_effect + residual (the rank-one median analogue
    of two-way ANOVA; large |residual| = cell-level anomaly that
    neither a day effect nor a type effect explains — the outlier
    screen that mean-based decompositions smear).

    Cross-engine EXACT with no rounding grid: counts are integers,
    every median is the average of the two middle order statistics
    by INTEGER list indexing (the stat_hodges_lehmann selection —
    never an engine median(), whose even-n interpolation rule is the
    engine's own), so all intermediate values live on the exact
    2^-k binary grid and every subtraction is exact IEEE. The
    decomposition identity count = overall + re + ce + residual is
    pinned exactly in the replay test.

    100 TB shape (r14 ladder-collapse): one corpus-scale daily
    aggregate, then the 4 grid-wide sweeps as a SINGLE-CONSUMER chain
    of grid-partitioned windows — each half-step computes its
    row/col median over the t- (or d-) partition and subtracts it in
    the same projection, carrying the subtracted median along as a
    column. The whole chain is one lazy plan; only the final swept
    grid is checkpointed (it feeds the output rows AND the two
    effect-vector derivations), so the query is 2 blocking jobs
    instead of ~15 (was: a checkpoint per half-step + per scalar
    absorb — 2.8 s of scheduling floor for 150-row math, VERDICT
    r13). The effect algebra is applied in the oracle's exact op
    order on the carried medians; the first scalar absorb dc1 is the
    median of an all-zero vector — exactly +0.0 in IEEE (medians here
    are (lo+hi)/2 of order statistics; counts are positive and x−x
    rounds to +0.0, so −0.0 never arises) — and is kept as the
    literal 0.0 term so every emitted double is bit-identical to the
    unrolled sweep. Windows are partitioned by grid keys (never
    global; the grid is metadata-sized by construction)."""
    ev = load_table(spark, sf_dir, "events")
    z = (
        ev.select(
            F.col("event_type").alias("t"),
            F.date_trunc("day", "ts").alias("d"),
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
    )

    def med_of(ws):
        n = F.size(ws).cast("long")
        lo = F.element_at(ws, ((n + 1) / F.lit(2)).cast("int"))
        hi = F.element_at(ws, (n / F.lit(2) + 1).cast("int"))
        return (lo + hi) / F.lit(2.0)

    def sweep(df, key, mcol):
        """One half-step: median of v over the key-partition window,
        subtracted in place; the median rides along as ``mcol``."""
        w = Window.partitionBy(key)
        m = med_of(F.sort_array(F.collect_list("v").over(w)))
        return df.select(
            "t",
            "d",
            *[c for c in df.columns if c not in ("t", "d", "v")],
            m.alias(mcol),
            "v",
        ).select(
            *[c for c in df.columns if c != "v"],
            mcol,
            (F.col("v") - F.col(mcol)).alias("v"),
        )

    z4 = (
        sweep(sweep(sweep(sweep(z, "t", "rm1"), "d", "cm1"), "t", "rm2"),
              "d", "cm2")
        # 3 consumers: output rows + both effect vectors. EAGER by
        # measurement (r15 pin A/B, min-of-6 interleaved: eager 1.13 /
        # lazy 1.26 / none 1.69 s): the three consumers race the
        # window-chain blocks under the lazy form, and the grid is
        # tiny — the one blocking job is cheaper than the block-lock
        # contention it removes.
        .localCheckpoint()
    )

    def vmed(df, col):
        a = df.agg(F.sort_array(F.collect_list(col)).alias("ws"))
        return a.select(med_of(F.col("ws")).alias("m"))

    # row-effect vector (one row per t): oracle order
    # re4 = ((rm1 − dr1) + rm2) − dr2, dr1 = med(rm1), dr2 = med(re3)
    rv = z4.select("t", "rm1", "rm2").distinct()
    dr1 = vmed(rv, "rm1")
    rv3 = rv.crossJoin(F.broadcast(dr1)).select(
        "t", "rm1", "rm2",
        ((F.col("rm1") - F.col("m")) + F.col("rm2")).alias("re3"),
        F.col("m").alias("dr1"),
    )
    dr2 = vmed(rv3, "re3")
    # col-effect vector: ce3 = (((0.0 − dc1) + cm1) − dc2) + cm2 with
    # dc1 = med(all-zero) = +0.0 exactly; dc2 = med(ce1) = med(0.0 + cm1)
    cv = z4.select("d", "cm1", "cm2").distinct()
    cv1 = cv.select(
        "d", "cm1", "cm2",
        ((F.lit(0.0) - F.lit(0.0)) + F.col("cm1")).alias("ce1"),
    )
    dc2 = vmed(cv1, "ce1")
    effects_r = rv3.crossJoin(F.broadcast(dr2.withColumnRenamed("m", "dr2"))).select(
        "t",
        (F.col("re3") - F.col("dr2")).alias("row_effect"),
        F.col("dr1").alias("_dr1"),
        F.col("dr2").alias("_dr2"),
    )
    effects_c = cv1.crossJoin(F.broadcast(dc2.withColumnRenamed("m", "dc2"))).select(
        "d",
        ((F.col("ce1") - F.col("dc2")) + F.col("cm2")).alias("col_effect"),
        F.col("dc2").alias("_dc2"),
    )
    # overall = ((dc1 + dr1) + dc2) + dr2 in oracle order, dc1 = +0.0
    return (
        z4.join(F.broadcast(effects_r), "t")
        .join(F.broadcast(effects_c), "d")
        .select(
            F.col("t").alias("event_type"),
            F.col("d").alias("day"),
            F.col("v").alias("residual"),
            "row_effect",
            "col_effect",
            (
                ((F.lit(0.0) + F.col("_dr1")) + F.col("_dc2"))
                + F.col("_dr2")
            ).alias("overall"),
        )
    )
