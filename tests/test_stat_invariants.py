"""Mathematical invariants of the session-3d statistics/eval/sampling
operators — properties the differential hash can't see (it proves
Spark == DuckDB, not that either is *right*). Each test pins a bound
or identity the estimator must satisfy by construction, so a mutation
that breaks the math but breaks it identically in both the query and
its oracle still fails loudly here.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()

_EPS = 1e-6


def _rows(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir).collect()


def test_mutual_information_bounds(spark, sf_dir):
    """0 ≤ MI ≤ min(H_lang, H_source); NMI ∈ [0, 1] when defined."""
    (r,) = _rows(spark, sf_dir, "stat_mutual_information")
    assert r["mi_nats"] >= -_EPS
    assert r["mi_nats"] <= min(r["h_lang"], r["h_source"]) + _EPS
    if r["nmi"] is not None:
        assert -_EPS <= r["nmi"] <= 1 + _EPS


def test_cohens_kappa_identities(spark, sf_dir):
    """Cells partition the corpus; po ∈ [0,1]; kappa ≤ 1 and kappa ≤
    po/(1-pe)-scaled bound is implied by kappa ≤ 1."""
    (r,) = _rows(spark, sf_dir, "stat_cohens_kappa")
    n = r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert n > 0
    assert 0 <= r["po"] <= 1 + _EPS
    assert abs(r["po"] - (r["n11"] + r["n00"]) / n) < 1e-5
    if r["kappa"] is not None:
        assert -1 - _EPS <= r["kappa"] <= 1 + _EPS


def test_conformal_interval_quantile_index(spark, sf_dir):
    """k_target = min(⌈(n+1)·0.9⌉, n) — the finite-sample correction —
    and q̂ is a real residual (non-negative)."""
    (r,) = _rows(spark, sf_dir, "stat_conformal_interval")
    expect_k = min(math.ceil((r["n_cal"] + 1) * 9 / 10.0), r["n_cal"])
    assert r["k_target"] == expect_k
    assert r["q_hat"] is not None and r["q_hat"] >= 0


def test_benford_is_a_distribution(spark, sf_dir):
    """Digits ⊆ 1..9; observed and expected frequencies each sum to
    ~1 (expected sums to 1 only over all 9 digits, so check the
    digits that appear sum observed to 1 and lie in Benford's range)."""
    rows = _rows(spark, sf_dir, "stat_benford")
    assert rows
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert abs(sum(r["obs_freq"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        expect = math.log10(1 + 1 / r["digit"])
        assert abs(r["exp_freq"] - expect) < 1e-5
        assert r["chi2_term"] >= -_EPS


def test_calibration_bins_partition_and_ranges(spark, sf_dir):
    """Bins ⊆ 0..9; counts partition the vector set; conf/acc in
    [0,1]; gap = |avg_conf − acc|."""
    rows = _rows(spark, sf_dir, "llm_calibration_bins")
    assert rows
    assert all(0 <= r["bin"] <= 9 for r in rows)
    assert all(0 - _EPS <= r["avg_conf"] <= 1 + _EPS for r in rows)
    assert all(0 - _EPS <= r["acc"] <= 1 + _EPS for r in rows)
    for r in rows:
        assert abs(r["gap"] - abs(r["avg_conf"] - r["acc"])) < 1e-5


def test_outlier_mad_census_bounds(spark, sf_dir):
    """MAD ≥ 0 and outliers never exceed the group size."""
    rows = _rows(spark, sf_dir, "dq_outlier_mad")
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n"]


def test_freshness_window_bounds(spark, sf_dir):
    """Window counts bounded by the group size; the globally newest
    feed has lag 0."""
    rows = _rows(spark, sf_dir, "dq_freshness")
    assert rows
    assert min(r["lag_hours"] for r in rows) == 0
    for r in rows:
        assert 0 <= r["n_last24"] <= r["n"]
        assert 0 <= r["n_prev24"] <= r["n"]
        assert r["lag_hours"] >= 0


def test_image_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ ln(256); distinct values ≤ min(256, n_pix)."""
    rows = _rows(spark, sf_dir, "mm_image_entropy")
    assert rows
    hmax = math.log(256.0)
    for r in rows:
        assert -_EPS <= r["entropy"] <= hmax + _EPS
        assert 1 <= r["n_distinct"] <= min(256, r["n_pix"])


def test_decayed_score_bounds(spark, sf_dir):
    """Each event weighs in (0, 1], so 0 < decayed_n ≤ n."""
    rows = _rows(spark, sf_dir, "ts_decayed_score")
    assert rows
    for r in rows:
        assert 0 < r["decayed_n"] <= r["n"] + _EPS


def test_pacf_lag1_equals_acf1(spark, sf_dir):
    """Durbin–Levinson level 1 is the acf itself."""
    (r,) = _rows(spark, sf_dir, "ts_pacf")
    assert r["pacf1"] == r["acf1"]
    assert r["acf1"] is not None


def test_sax_alphabet_and_paa(spark, sf_dir):
    """Letters confined to the 4-symbol alphabet; PAA means positive
    for a count series."""
    rows = _rows(spark, sf_dir, "ts_sax_symbols")
    assert rows
    assert {r["sax"] for r in rows} <= {"a", "b", "c", "d"}
    assert all(r["paa"] > 0 for r in rows)
    assert all(1 <= r["n_days"] <= 4 for r in rows)


def test_bpe_apply_compression_bounds(spark, sf_dir):
    """Merges only shrink the stream; fired count is the exact
    difference."""
    rows = _rows(spark, sf_dir, "llm_bpe_apply")
    assert rows
    for r in rows:
        assert r["n_tokens_out"] <= r["n_symbols_in"]
        assert (
            r["n_merges_fired"] == r["n_symbols_in"] - r["n_tokens_out"]
        )
        assert r["n_merges_fired"] >= 0


def test_theil_decomposition_identity(spark, sf_dir):
    """Theil's defining property: T = T_between + T_within (within
    pre-round drift + three 1e-6 emit grids)."""
    (r,) = _rows(spark, sf_dir, "agg_theil_index")
    assert r["theil_total"] >= -_EPS
    assert r["theil_between"] >= -_EPS
    assert r["theil_within"] >= -_EPS
    assert (
        abs(r["theil_total"] - (r["theil_between"] + r["theil_within"]))
        < 1e-4
    )


def test_wilcoxon_rank_sum_identity(spark, sf_dir):
    """W⁺ + W⁻ = n(n+1)/2 — midranks re-partition the integer rank
    total exactly."""
    (r,) = _rows(spark, sf_dir, "stat_wilcoxon_signed")
    n = r["n"]
    assert n >= 0
    if n > 0:
        total = n * (n + 1) / 2.0
        assert abs((r["w_plus"] + r["w_minus"]) - total) < 1e-4
        assert r["z"] is not None


def test_weighted_es_sample_is_exact_topk(spark, sf_dir):
    """The selected rows per group are exactly the k smallest E–S keys
    — recomputed independently in Python from the same LCG/weight rule
    — and re-running selects the identical sample (resumability)."""
    from etl_geonames_spark.sources import load_table

    sel = _rows(spark, sf_dir, "sample_weighted_es")
    again = _rows(spark, sf_dir, "sample_weighted_es")
    assert sorted((r["event_type"], r["event_id"]) for r in sel) == sorted(
        (r["event_type"], r["event_id"]) for r in again
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    by_group: dict[str, list[tuple[float, int]]] = {}
    for r in ev:
        if r["value"] <= 0:
            continue
        u = ((r["event_id"] * 1103515245 + 12345) % 2147483648 + 1) / 2147483649.0
        key = -math.log(u) / r["value"]
        kq = math.floor(key * 1e9 + 0.5) / 1e9
        by_group.setdefault(r["event_type"], []).append((kq, r["event_id"]))
    expect = set()
    for g, pairs in by_group.items():
        for _, eid in sorted(pairs)[:5]:
            expect.add((g, eid))
    got = {(r["event_type"], r["event_id"]) for r in sel}
    assert got == expect


def test_adamic_adar_cap_is_lower_bound_of_exact(spark, sf_dir):
    """graph_adamic_adar applies the τ=64 center-degree cap (the hub
    skew mitigation). Pin the approximation's contract against the
    UNCAPPED exact computation, replayed in-process from the same
    edge list: (1) every capped pair exists in the exact result with
    cn_capped ≤ cn_exact and score_capped ≤ score_exact; (2) any
    exact pair ALL of whose common neighbors have deg ≤ τ appears
    with identical cn and score — the cap only ever removes
    hub-center contributions, never invents or perturbs others."""
    from collections import defaultdict

    from etl_geonames_spark.operators.graph import _AA_DEGREE_CAP, _und

    und = _und(spark, sf_dir).collect()
    nbrs: dict[int, list[int]] = defaultdict(list)
    for r in und:
        nbrs[r["s"]].append(r["t"])
    exact: dict[tuple[int, int], list[float]] = defaultdict(list)
    capped_only_centers: set[tuple[int, int]] = set()
    for z, ts in nbrs.items():
        d = len(ts)
        for i, na in enumerate(sorted(ts)):
            for nb in sorted(ts)[i + 1 :]:
                exact[(na, nb)].append(1.0 / math.log(d))
                if d > _AA_DEGREE_CAP:
                    capped_only_centers.add((na, nb))
    got = {
        (r["na"], r["nb"]): (r["cn"], r["adamic_adar"])
        for r in QUERIES["graph_adamic_adar"](spark, sf_dir).collect()
    }
    for (na, nb), (cn, score) in got.items():
        contribs = exact[(na, nb)]
        assert cn <= len(contribs)
        assert score <= sum(contribs) + _EPS
    for pair, contribs in exact.items():
        if len(contribs) >= 2 and pair not in capped_only_centers:
            assert pair in got
            cn, score = got[pair]
            assert cn == len(contribs)
            assert abs(score - sum(contribs)) <= 1e-5


def test_kruskal_wallis_bounds(spark, sf_dir):
    """H ≥ 0 and the tie correction divides by C ∈ (0,1] — h_tie ≥ h.
    Also H ≤ N−1 (attained when every group occupies a disjoint rank
    block)."""
    (r,) = _rows(spark, sf_dir, "stat_kruskal_wallis")
    assert r["h"] >= -_EPS
    assert r["h_tie"] is None or r["h_tie"] >= r["h"] - _EPS
    assert r["h"] <= r["n"] - 1 + _EPS


def test_anova_partition_identity(spark, sf_dir):
    """SSB + SSW = SST, recomputed from the raw moments in-process —
    the variance-decomposition identity the F-statistic rests on."""
    from etl_geonames_spark.sources import load_table

    (r,) = _rows(spark, sf_dir, "stat_anova_oneway")
    xs = [
        row["n_chars"]
        for row in load_table(spark, sf_dir, "documents")
        .select("n_chars")
        .collect()
    ]
    n = len(xs)
    sst = sum(x * x for x in xs) - sum(xs) ** 2 / n
    assert abs((r["ss_between"] + r["ss_within"]) - sst) < 1e-3 * max(sst, 1)
    assert r["ss_between"] >= -_EPS and r["ss_within"] >= -_EPS


def test_mann_kendall_bounds(spark, sf_dir):
    """|S| ≤ n(n−1)/2 and z carries S's sign."""
    for r in _rows(spark, sf_dir, "stat_mann_kendall"):
        assert abs(r["s_stat"]) <= r["n"] * (r["n"] - 1) / 2
        if r["z"] is not None and abs(r["s_stat"]) > 1:
            assert (r["z"] > 0) == (r["s_stat"] > 0) or r["z"] == 0


def test_ljung_box_nonnegative(spark, sf_dir):
    """Q is a weighted sum of squares — never negative; and each
    reported acf is a correlation in [−1, 1]."""
    (r,) = _rows(spark, sf_dir, "stat_ljung_box")
    if r["q_lb"] is not None:
        assert r["q_lb"] >= -_EPS
    for k in ("acf1", "acf2", "acf3"):
        if r[k] is not None:
            assert -1 - _EPS <= r[k] <= 1 + _EPS


def test_rsi_bounded(spark, sf_dir):
    """RSI ∈ [0, 100] wherever defined."""
    for r in _rows(spark, sf_dir, "ts_rsi"):
        if r["rsi"] is not None:
            assert -_EPS <= r["rsi"] <= 100 + _EPS


def test_interpolation_between_neighbors(spark, sf_dir):
    """Interpolated values lie inside [min, max] of the series'
    observed counts, and observed grid points reproduce the raw
    hourly counts exactly."""
    rows = _rows(spark, sf_dir, "ts_interpolate_linear")
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        obs = [r["value"] for r in rs if r["observed"]]
        lo, hi = min(obs), max(obs)
        for r in rs:
            assert lo - _EPS <= r["value"] <= hi + _EPS


def test_cc_bounded_census(spark, sf_dir):
    """Labels partition the node set: sizes sum to |V|; every label is
    the minimum node id of its own cluster's census row (labels are
    node ids propagated by min, so label ≤ every member — in the
    census the label row itself must exist among nodes)."""
    from pyspark.sql import functions as F

    from etl_geonames_spark.operators.graph import _und

    und = _und(spark, sf_dir)
    n_nodes = und.select("s").distinct().count()
    rows = _rows(spark, sf_dir, "graph_cc_bounded")
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    node_set = {
        r["s"] for r in und.select("s").distinct().collect()
    }
    for r in rows:
        assert r["label"] in node_set


def test_kmv_setops_sketch_algebra(spark, sf_dir):
    """Jaccard ∈ [0,1]; |A∪B| estimate within the KMV error band of
    the exact union (k=64 ⇒ σ≈12.6%; assert 4σ), and the
    inclusion-exclusion direction est_union ≤ est_a + est_b."""
    from etl_geonames_spark.sources import load_table

    (r,) = _rows(spark, sf_dir, "agg_kmv_setops")
    assert -_EPS <= r["jaccard_est"] <= 1 + _EPS
    assert r["est_union"] <= r["est_a"] + r["est_b"] + _EPS
    docs = load_table(spark, sf_dir, "documents").select("text").distinct()
    exact_union = docs.count()
    assert abs(r["est_union"] / exact_union - 1.0) < 0.5


def test_band_stats_covers_candidate_pairs(spark, sf_dir):
    """Σ_bands Σ_buckets C(sz,2) ≥ |distinct candidate pairs| (pairs
    colliding in both bands are counted twice in the census, never
    less than once), and colliding buckets never exceed bucket
    count."""
    rows = _rows(spark, sf_dir, "llm_dedup_band_stats")
    total_census = sum(r["n_candidate_pairs"] for r in rows)
    n_pairs = len(_rows(spark, sf_dir, "llm_minhash_verifiable"))
    assert total_census >= n_pairs
    for r in rows:
        assert r["n_colliding_buckets"] <= r["n_buckets"]
        assert r["max_bucket"] >= 1


def test_minhash_jaccard_est_matches_candidate_set(spark, sf_dir):
    """The estimation query's pair set IS the witness pipeline's
    candidate set (same bands), n_match ∈ [0, 8], and est = match/8."""
    est_rows = _rows(spark, sf_dir, "llm_minhash_jaccard_est")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _rows(spark, sf_dir, "llm_minhash_verifiable")
    }
    assert {(r["doc_a"], r["doc_b"]) for r in est_rows} == cand
    for r in est_rows:
        assert 0 <= r["n_match"] <= 8
        assert abs(r["est_jaccard"] - r["n_match"] / 8.0) < 1e-6


def test_rolling_corr_bounded(spark, sf_dir):
    for r in _rows(spark, sf_dir, "ts_rolling_corr"):
        if r["corr"] is not None:
            assert -1 - _EPS <= r["corr"] <= 1 + _EPS


def test_seasonal_decompose_additive_identity(spark, sf_dir):
    """c = trend + seasonal + residual on every emitted row (each
    component qround'd at 1e-6, so the identity holds to 3 grid
    steps)."""
    for r in _rows(spark, sf_dir, "ts_seasonal_decompose"):
        assert abs(
            r["c"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 5e-6


def test_cronbach_alpha_upper_bound(spark, sf_dir):
    """α ≤ 1 always (it can be negative for anti-correlated items)."""
    (r,) = _rows(spark, sf_dir, "stat_cronbach_alpha")
    if r["alpha"] is not None:
        assert r["alpha"] <= 1 + _EPS


def test_schema_drift_normalized(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dq_schema_drift")
    assert {r["metric"] for r in rows} == {
        "n_rows", "mean_chars", "n_langs", "n_sources", "empty_rate",
    }
    for r in rows:
        assert -_EPS <= r["rel_drift"] <= 1 + _EPS


def test_copurchase_pair_discipline(spark, sf_dir):
    for r in _rows(spark, sf_dir, "graph_copurchase"):
        assert r["part_a"] < r["part_b"]
        assert r["n_orders"] >= 2


def test_keyframe_within_clip(spark, sf_dir):
    for r in _rows(spark, sf_dir, "mm_video_keyframes"):
        assert 0 <= r["key_idx"] < r["n_frames"]
        assert r["key_delta"] >= 0
        if r["n_frames"] > 1:
            assert r["key_idx"] >= 1


def test_xi_correlation_bounds(spark, sf_dir):
    """ξ ≤ 1 always; for length→tokens (a near-functional relation on
    word-salad text) it should be clearly positive."""
    (r,) = _rows(spark, sf_dir, "stat_xi_correlation")
    assert r["xi"] is not None and r["xi"] <= 1 + _EPS
    assert r["xi"] > 0.2


def test_peaks_are_strict_maxima(spark, sf_dir):
    for r in _rows(spark, sf_dir, "ts_peaks"):
        assert r["c"] > r["prev_c"] and r["c"] > r["next_c"]
        assert r["height"] >= 1


def test_image_gradient_bounds(spark, sf_dir):
    """0 ≤ grad ≤ 765·(w−1)·h (each |Δgray| ≤ 765)."""
    for r in _rows(spark, sf_dir, "mm_image_gradient"):
        assert 0 <= r["grad_sum"] <= 765 * (r["width"] - 1) * r["height"]


def test_date_edge_calendar_bounds(spark, sf_dir):
    for r in _rows(spark, sf_dir, "fn_date_edge"):
        assert 28 <= r["days_in_month"] <= 31
        assert 1 <= r["day_of_year"] <= 366
        assert 1 <= r["quarter"] <= 4
        assert 0 <= r["days_to_month_end"] <= 30


def test_voronoi_assignment_is_nearest(spark, sf_dir):
    """Every point's assigned site achieves the minimum d² over ALL
    sites, recomputed in-process from the deterministic grids."""
    from etl_geonames_spark.operators.geo import _VOR_SITES

    rows = _rows(spark, sf_dir, "geo_voronoi_assign")
    for r in rows[:200]:
        k = r["c_custkey"]
        ilat, ilon = (k * 7919) % 18000, (k * 104729) % 36000
        best = min(
            (ilat - la) ** 2 + (ilon - lo) ** 2 for _, la, lo in _VOR_SITES
        )
        assert r["d2"] == best


def test_kneser_ney_is_a_smoother(spark, sf_dir):
    """0 < p_kn ≤ ~1 and KN discounts high-MLE bigrams: for every
    reported row, p_kn < p_mle + the continuation mass bound d/c1·k
    (loose), and p_mle ∈ (0, 1]."""
    rows = _rows(spark, sf_dir, "llm_kneser_ney_bigram")
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["p_mle"] <= 1 + _EPS
        assert 0 < r["p_kn"] <= 1 + _EPS


def test_lateness_cdf_monotone_ends_at_one(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "ts_lateness_histogram"),
        key=lambda r: r["bucket_days"],
    )
    cum = 0
    for r in rows:
        cum += r["n"]
        assert r["cum_n"] == cum
    assert abs(rows[-1]["cum_frac"] - 1.0) < 1e-5


def test_quality_funnel_conservation(spark, sf_dir):
    """Stage kills + passes = corpus size; survivors decrease
    monotonically down the funnel; the last stage's survivors equal
    the pass count; verdicts agree with llm_gopher_quality's gate."""
    rows = sorted(
        _rows(spark, sf_dir, "llm_quality_funnel"),
        key=lambda r: r["stage_idx"],
    )
    total = sum(r["n_docs"] for r in rows)
    gopher = _rows(spark, sf_dir, "llm_gopher_quality")
    assert total == len(gopher)
    n_pass = sum(1 for g in gopher if g["passes"])
    assert rows[-1]["stage"] == "pass" and rows[-1]["n_docs"] == n_pass
    surv = [r["n_remaining"] for r in rows[:-1]]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert rows[-1]["n_remaining"] == n_pass


def test_trajectory_geometry(spark, sf_dir):
    """Displacement ≤ n_steps·max_step (triangle inequality on the
    step decomposition) and single-point users have zero both."""
    for r in _rows(spark, sf_dir, "geo_trajectory_stats"):
        if r["n_steps"] == 0:
            assert r["displacement"] == 0.0
        else:
            assert (
                r["displacement"]
                <= r["n_steps"] * r["max_step"] + 1e-6
            )


def test_sample_size_scales_inverse_square(spark, sf_dir):
    """n/arm must exceed the detectability bound: with the observed
    Δ and variances, (z_α+z_β)²·(p₁q₁+p₂q₂)/Δ² ≤ n_per_arm < bound+1."""
    (r,) = _rows(spark, sf_dir, "stat_sample_size")
    if r["n_per_arm"] is not None:
        zz = (1.959964 + 0.841621) ** 2
        bound = (
            zz
            * (r["p1"] * (1 - r["p1"]) + r["p2"] * (1 - r["p2"]))
            / (r["p1"] - r["p2"]) ** 2
        )
        assert bound - 1e-6 <= r["n_per_arm"] <= bound + 1


def test_holt_fold_equals_python_replay(spark, sf_dir):
    """ts_holt_winters' fold == an in-process Python replay of the
    textbook recurrence over the same daily counts — catches a shared
    cross-engine bug the differential hash cannot (both oracles fold
    the same wrong way ⇒ hash still matches; Python is the third
    implementation)."""
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in dc:
        series.setdefault(r["event_type"], []).append((r["day"], r["c"]))
    got = {
        r["event_type"]: (r["level"], r["trend"])
        for r in _rows(spark, sf_dir, "ts_holt_winters")
    }
    for et, pairs in series.items():
        xs = [float(c) for _, c in sorted(pairs)]
        if len(xs) < 2:
            continue
        lv, tr = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            lev = 0.3 * x + 0.7 * (lv + tr)
            tr = 0.1 * (0.3 * x + 0.7 * (lv + tr) - lv) + 0.9 * tr
            lv = lev
        assert abs(got[et][0] - lv) < 2e-6
        assert abs(got[et][1] - tr) < 2e-6


def test_compaction_groups_are_target_sized(spark, sf_dir):
    """Every compaction group's total is < target + max_file_in_group
    (first-fit bound) and ≥ target except each partition's LAST
    group; groups are contiguous in file order."""
    from collections import defaultdict

    rows = _rows(spark, sf_dir, "maintenance_compaction_plan")
    target = 4096
    by_pg: dict = defaultdict(list)
    for r in rows:
        by_pg[(r["part"], r["compaction_group"])].append(r)
    last_group = {}
    for (p, g), _ in by_pg.items():
        last_group[p] = max(last_group.get(p, -1), g)
    for (p, g), fs in by_pg.items():
        total = sum(f["bytes"] for f in fs)
        assert total < target + max(f["bytes"] for f in fs)
        if g != last_group[p]:
            assert total >= target - max(f["bytes"] for f in fs)


def test_wilson_ci_contains_p_hat_within_unit(spark, sf_dir):
    """ci_lo ≤ p̂ ≤ ci_hi and the interval never escapes [0, 1] —
    the property Wald intervals violate and Wilson exists to fix."""
    (r,) = _rows(spark, sf_dir, "stat_wilson_ci")
    assert 0 - _EPS <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1 + _EPS


def test_crosscorr_lag0_matches_symmetry(spark, sf_dir):
    """xcorr ∈ [−1,1]; all 7 lags present; and xcorr(−k) relates to
    xcorr(+k) by series-role swap (not asserted equal — different
    alignment windows — but both defined on this fixture)."""
    rows = {r["lag"]: r for r in _rows(spark, sf_dir, "ts_crosscorr_lags")}
    assert set(rows) == set(range(-3, 4))
    for r in rows.values():
        if r["xcorr"] is not None:
            assert -1 - _EPS <= r["xcorr"] <= 1 + _EPS


def test_bpe_train_rounds_matches_python_bpe(spark, sf_dir):
    """llm_bpe_train_rounds equals a from-scratch Python BPE trainer —
    the third-implementation witness (stronger than the differential,
    which only proves Spark == DuckDB): 3 rounds of weighted pair
    census → argmax (count desc, pair lexicographic) → greedy
    left-to-right non-overlapping merge, recomputed on plain Python
    lists. Also pins the monotonicity invariant: the corpus symbol
    total strictly decreases every round that merges a real pair."""
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wf = Counter(
        w for r in docs for w in (r["text"] or "").split(" ") if w
    )
    vocab = {tuple(w): f for w, f in wf.items()}

    def census(v):
        c = Counter()
        for syms, f in v.items():
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += f
        return c

    def merge(v, pair):
        out = {}
        a, b = pair
        for syms, f in v.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            k = tuple(res)
            out[k] = out.get(k, 0) + f
        return out

    expect = []
    for rnd in (1, 2, 3):
        c = census(vocab)
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        vocab = merge(vocab, (a, b))
        total = sum(len(s) * f for s, f in vocab.items())
        expect.append((rnd, f"{a}+{b}", n, total))

    got = sorted(
        (r["round"], r["merge_pair"], r["pair_count"], r["total_symbols"])
        for r in _rows(spark, sf_dir, "llm_bpe_train_rounds")
    )
    assert got == expect
    totals = [t for _, _, _, t in got]
    assert all(x > y for x, y in zip(totals, totals[1:]))


def test_ann_ivf_witness_topk_is_true_topk_within_probed_cells(spark, sf_dir):
    """The IVF witness's top-10 per query is EXACTLY the 10 largest
    integer dot products among vectors assigned to the query's probed
    cells — recomputed from scratch in Python (quantize → integer-L2
    argmin assignment → probe 2 cells → integer dot re-rank), so both
    engines are checked against the algorithm's definition, not just
    each other."""
    import math as _m

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    q = {
        r["vec_id"]: [
            int(_m.floor(float(x) * 1000 + 0.5)) for x in r["embedding"]
        ]
        for r in rows
    }
    cents = {i: q[i] for i in q if i < 16}

    def d2(u, v):
        return sum((a - b) * (a - b) for a, b in zip(u, v))

    ranking = {
        vid: sorted(cents, key=lambda c: (d2(vec, cents[c]), c))
        for vid, vec in q.items()
    }
    cell = {vid: ranking[vid][0] for vid in q}
    expect = set()
    for qid in (v for v in q if v < 5):
        probed = set(ranking[qid][:2])
        cand = [c for c in q if cell[c] in probed and c != qid]
        dots = sorted(
            ((sum(a * b for a, b in zip(q[qid], q[c])), c) for c in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for dot, c in dots[:10]:
            expect.add((qid, c, dot))
    got = {
        (r["q_id"], r["c_id"], r["qdot"])
        for r in _rows(spark, sf_dir, "llm_ann_ivf_verifiable")
    }
    assert got == expect


def _qround6(x):
    import math as _m

    return _m.floor(x * 1e6 + 0.5) / 1e6


def test_friedman_matches_python_recomputation(spark, sf_dir):
    """stat_friedman equals a from-scratch Python recomputation of
    Conover's tie-safe Q over the dense day × type grid — the third
    implementation that catches a shared Spark↔DuckDB bug the
    differential can't (midrank construction, dense zero-fill,
    formula shape)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    rows = ev.collect()
    counts = defaultdict(int)
    days, types = set(), set()
    for r in rows:
        day = r["ts"].date()
        days.add(day)
        types.add(r["event_type"])
        counts[(day, r["event_type"])] += 1
    n, k = len(days), len(types)
    ranks = {}
    for day in days:
        vals = sorted((counts.get((day, t), 0), t) for t in types)
        by_c = defaultdict(list)
        for i, (c, t) in enumerate(vals):
            by_c[c].append((i + 1, t))
        for c, entries in by_c.items():
            mid = sum(i for i, _ in entries) / len(entries)
            for _, t in entries:
                ranks[(day, t)] = mid
    a1 = sum(r * r for r in ranks.values())
    rj = {t: sum(ranks[(d, t)] for d in days) for t in types}
    num = sum((v - n * (k + 1) / 2.0) ** 2 for v in rj.values())
    den = a1 - n * k * (k + 1) ** 2 / 4.0
    expect_q = _qround6((k - 1) * num / den) if den != 0 else None
    (r,) = _rows(spark, sf_dir, "stat_friedman")
    assert (r["n_blocks"], r["k_treatments"]) == (n, k)
    assert r["q_friedman"] == expect_q


def test_permutation_test_matches_python_recomputation(spark, sf_dir):
    """stat_permutation_test equals a from-scratch Python replay of
    the K=200 hash permutations: same hash, same rank assignment,
    same all-integer extreme comparison, same add-one p-value."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    data = [(r["doc_id"], r["n_chars"], r["lang"] == "en") for r in docs]
    s1 = sum(v for _, v, g in data if g)
    s2 = sum(v for _, v, g in data if not g)
    n1 = sum(1 for *_, g in data if g)
    n2 = len(data) - n1
    if n1 == 0 or n2 == 0:
        pytest.skip("one-sided corpus: no en/non-en split to permute")
    K, P, A, B, C = 200, 2147483647, 2654435761, 40503, 2246822519
    obs = abs(s1 * n2 - s2 * n1)
    n_extreme = 0
    groups = set()
    for p in range(K):
        ranked = sorted(
            data,
            key=lambda t: (
                ((t[0] % P) * ((A + p * C) % P) + p * B) % P,
                t[0],
            ),
        )
        s1p = sum(v for _, v, _ in ranked[:n1])
        s2p = sum(v for _, v, _ in ranked[n1:])
        groups.add(frozenset(d for d, _, _ in ranked[:n1]))
        if abs(s1p * n2 - s2p * n1) >= obs:
            n_extreme += 1
    # the permutation family must be non-degenerate: an additive-only
    # hash collapses the K "permutations" to a handful of distinct
    # group assignments (3 of 200 observed before the fix)
    assert len(groups) >= 0.9 * K
    (r,) = _rows(spark, sf_dir, "stat_permutation_test")
    assert r["n_perms"] == K
    assert r["n_extreme"] == n_extreme
    assert r["p_value"] == (1 + n_extreme) / (K + 1)
    assert r["obs_diff"] == _qround6(s1 / n1 - s2 / n2)


def test_period_detect_matches_python_recomputation(spark, sf_dir):
    """ts_period_detect equals a from-scratch Python fold of the
    hourly series, and strength stays in [0, 1] (it is a variance
    fraction by construction)."""
    import calendar
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("ts")
    hc = Counter(
        calendar.timegm(r["ts"].timetuple()) // 3600 for r in ev.collect()
    )
    n = len(hc)
    s = sum(hc.values())
    ss = sum(c * c for c in hc.values())
    got = {r["period"]: r for r in _rows(spark, sf_dir, "ts_period_detect")}
    assert set(got) == {6, 12, 24}
    for p in (6, 12, 24):
        phases = defaultdict(lambda: [0, 0])
        for h, c in hc.items():
            ph = phases[h % p]
            ph[0] += 1
            ph[1] += c
        ssb_part = sum(sp * sp / np for np, sp in phases.values())
        sst = n * float(ss) - float(s) * s
        expect = (
            _qround6((n * ssb_part - float(s) * s) / sst)
            if sst != 0
            else None
        )
        r = got[p]
        assert r["n_phases"] == len(phases)
        assert r["strength"] == expect
        if r["strength"] is not None:
            assert -1e-9 <= r["strength"] <= 1 + 1e-9


def test_hits_matches_python_recomputation(spark, sf_dir):
    """graph_hits equals a from-scratch Python replay of the two
    exact-integer mutual-reinforcement rounds (a¹ = in-degree,
    h¹ = Σ a¹ over out-neighbors, a², h²) including the
    (score desc, node) top-10 tie-break — the third implementation
    for the one graph op whose Spark and DuckDB sides share the same
    unrolled-join reading of Kleinberg's recurrence."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    edges = {
        (int(r["o_custkey"]), (r["o_custkey"] * 7 + r["o_orderkey"] * 3) % 2000)
        for r in orders.collect()
    }
    a1 = defaultdict(int)
    for _, d in edges:
        a1[d] += 1
    h1 = defaultdict(int)
    for s, d in edges:
        h1[s] += a1[d]
    a2 = defaultdict(int)
    for s, d in edges:
        a2[d] += h1[s]
    h2 = defaultdict(int)
    for s, d in edges:
        h2[s] += a2[d]
    top = lambda m: sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = {("hub", n, v) for n, v in top(h2)} | {
        ("authority", n, v) for n, v in top(a2)
    }
    got = {
        (r["kind"], r["node"], r["score"])
        for r in _rows(spark, sf_dir, "graph_hits")
    }
    assert got == expect


def test_bloom_prefilter_matches_python_recomputation(spark, sf_dir):
    """join_bloom_prefilter equals a from-scratch Python Bloom filter
    with the same 1024-bit / 4-hash mod-P geometry — and the replay
    doubles as the no-false-negatives proof: every true match passes,
    so n_bloom_pass ≥ n_true and n_false_pos ≥ 0 by construction."""
    from etl_geonames_spark.sources import load_table

    P, BITS = 2147483647, 1024
    A = [2654435761, 2246822519, 3266489917, 668265263]
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    keys = {
        int(r["p_partkey"]) for r in part.collect() if r["p_size"] == 1
    }
    bit = lambda k, j: ((k % P) * A[j] + (j * 97 + 13)) % BITS
    filt = {bit(k, j) for k in keys for j in range(4)}
    probes = [int(r["l_partkey"]) for r in li.collect()]
    n_probe = len(probes)
    n_pass = sum(
        1 for k in probes if all(bit(k, j) in filt for j in range(4))
    )
    n_true = sum(1 for k in probes if k in keys)
    assert n_pass >= n_true  # Bloom never false-negatives
    (r,) = _rows(spark, sf_dir, "join_bloom_prefilter")
    assert (r["n_probe"], r["n_bloom_pass"], r["n_true"]) == (
        n_probe,
        n_pass,
        n_true,
    )
    assert r["n_false_pos"] == n_pass - n_true
    neg = n_probe - n_true
    if neg > 0:
        assert abs(r["fp_rate"] - (n_pass - n_true) / neg) < 1e-12
    else:
        assert r["fp_rate"] is None


def _qround4(x):
    import math as _m

    return _m.floor(x * 1e4 + 0.5) / 1e4


def test_polygon_centroid_matches_python_recomputation(spark, sf_dir):
    """geo_polygon_centroid equals a from-scratch shoelace-centroid
    replay over each user's (ts, event_id)-ordered closed ring —
    same scaled-integer lat·100/lon·100 grid, same int64 cross-
    product sums, same single divide-at-emit, same ANSI-style NULL
    on a degenerate (zero signed area) ring.

    All-integer since ADVICE r5: every sum is exact int64 on both
    sides, so centroids compare EXACTLY (the former float form needed
    a grid-adjacent tolerance because partition-order drift could
    flip a 4dp qround cell)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    by_user = defaultdict(list)
    for r in ev.collect():
        by_user[r["user_id"]].append((r["ts"], int(r["event_id"])))
    lat = lambda k: (k * 7919) % 18000 - 9000
    lon = lambda k: (k * 104729) % 36000 - 18000
    expect = {}
    for u, pts in by_user.items():
        pts.sort()
        ring = [(lat(e), lon(e)) for _, e in pts]
        s = sx = sy = 0
        for (plat, plon), (clat, clon) in zip(ring, ring[1:]):
            cr = plon * clat - clon * plat
            s += cr
            sx += (plon + clon) * cr
            sy += (plat + clat) * cr
        (flat, flon), (llat, llon) = ring[0], ring[-1]
        ccr = llon * flat - flon * llat
        a2 = s + ccr
        sxc = sx + (llon + flon) * ccr
        syc = sy + (llat + flat) * ccr
        expect[u] = (
            len(ring),
            _qround4(sxc / (300.0 * a2)) if a2 != 0 else None,
            _qround4(syc / (300.0 * a2)) if a2 != 0 else None,
        )
    got = {
        r["user_id"]: (
            r["n_points"],
            r["centroid_lon"],
            r["centroid_lat"],
        )
        for r in _rows(spark, sf_dir, "geo_polygon_centroid")
    }
    assert set(got) == set(expect)
    for u, (n, lon, lat) in expect.items():
        gn, glon, glat = got[u]
        assert gn == n
        assert (glon, glat) == (lon, lat)


def test_pq_quantize_matches_python_recomputation(spark, sf_dir):
    """llm_pq_quantize equals a from-scratch Python product
    quantizer: same 1e-3 floor-form grid, same ceil-div subspace
    split, same integer squared-L2 argmin with smallest-cid
    tie-break, same summed reconstruction error — for EVERY vector,
    not a sample."""
    import math as _m

    from etl_geonames_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    vecs = {
        int(r["vec_id"]): [
            int(_m.floor(float(x) * 1000 + 0.5)) for x in r["embedding"]
        ]
        for r in emb.collect()
    }
    codebook = sorted((cid, q) for cid, q in vecs.items() if cid < 8)
    expect = {}
    for vid, q in vecs.items():
        sub_len = (len(q) + 3) // 4
        codes, err = [], 0
        for m in range(4):
            lo, hi = m * sub_len, min((m + 1) * sub_len, len(q))
            best = min(
                (
                    (
                        sum(
                            (q[i] - cq[i]) * (q[i] - cq[i])
                            for i in range(lo, hi)
                        ),
                        cid,
                    )
                    for cid, cq in codebook
                ),
            )
            codes.append(str(best[1]))
            err += best[0]
        expect[vid] = (",".join(codes), err)
    got = {
        r["vec_id"]: (r["pq_code"], r["recon_err"])
        for r in _rows(spark, sf_dir, "llm_pq_quantize")
    }
    assert got == expect


def test_dup_matrix_matches_python_recomputation(spark, sf_dir):
    """llm_cross_source_dup_matrix equals a from-scratch Python
    replay: nonempty-token 8-token prefix → set of (prefix, source)
    → per source pair (a < b) the count of shared prefixes. The
    third implementation that would catch a shared Spark↔DuckDB
    slicing/empty-doc bug the differential can't."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("text", "source")
    seen = set()
    for r in docs.collect():
        toks = [w for w in r["text"].split(" ") if w != ""]
        if not toks:
            continue
        seen.add((" ".join(toks[:8]), r["source"]))
    by_prefix = {}
    for p, s in seen:
        by_prefix.setdefault(p, set()).add(s)
    cells = Counter()
    for srcs in by_prefix.values():
        ordered = sorted(srcs)
        for i in range(len(ordered)):
            for j in range(i + 1, len(ordered)):
                cells[(ordered[i], ordered[j])] += 1
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_prefixes"]
        for r in _rows(spark, sf_dir, "llm_cross_source_dup_matrix")
    }
    assert got == dict(cells)


def test_image_ssim_bounds_and_moments(spark, sf_dir):
    """SSIM's defining bound |SSIM| ≤ 1 (Wang et al. 2004 — with the
    C1/C2 stabilizers the global index cannot exceed 1 in magnitude,
    equality only for identical means AND var = cov), plus the
    moment sanity n_px = 3·w·h implied by the (doc_id % 8 + 2,
    doc_id % 6 + 2) dims — pinned on the REAL codec path, so a
    stride/padding bug that inflates a moment breaks this even if
    both engines shared it."""
    rows = _rows(spark, sf_dir, "mm_image_ssim")
    assert rows
    for r in rows:
        d = r["doc_id"]
        assert r["n_px"] == 3 * (d % 8 + 2) * (d % 6 + 2)
        assert -1 - 1e-9 <= r["ssim"] <= 1 + 1e-9
        assert 0 <= r["sa"] <= 255 * r["n_px"]
        assert 0 <= r["sb"] <= 255 * r["n_px"]


def test_audio_pitch_matches_python_recomputation(spark, sf_dir):
    """mm_audio_pitch equals a from-scratch Python replay of the
    synthetic waveform formula + exact-integer autocorrelation
    argmax with the smallest-lag (fundamental) tie-break — a third
    vote alongside the codec-roundtrip Spark path and the
    formula-replaying DuckDB oracle, plus the Cauchy–Schwarz bound
    R(L) ≤ R(0) that any true autocorrelation must satisfy."""
    got = {r["doc_id"]: r for r in _rows(spark, sf_dir, "mm_audio_pitch")}
    assert got
    for d, r in got.items():
        n = d % 40 + 60
        s = [((d * 31 + i * 9973) % 65536) - 32768 for i in range(n)]
        r0 = sum(v * v for v in s)
        best_lag, r_best = None, None
        for lag in range(4, 11):
            rl = sum(s[i] * s[i + lag] for i in range(n - lag))
            if r_best is None or rl > r_best:
                best_lag, r_best = lag, rl
        assert (r["n_samples"], r["best_lag"], r["r_best"], r["r0"]) == (
            n,
            best_lag,
            r_best,
            r0,
        )
        assert r["r_best"] <= r["r0"]


def test_scc_bounded_matches_python_recomputation(spark, sf_dir):
    """graph_scc_bounded equals a from-scratch Python replay of the
    2×4 min-label half-steps over the derived edge list, AND its
    certified cells (fwd = bwd = c) are verified MUTUALLY REACHABLE
    through an independent BFS — the property the coloring claims,
    checked against the graph itself rather than the replay."""
    from collections import defaultdict, deque

    from etl_geonames_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    edges = {
        (int(r["o_custkey"]),
         (int(r["o_custkey"]) * 7 + int(r["o_orderkey"]) * 3) % 2000)
        for r in orders.collect()
    }
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    fwd_adj, bwd_adj = defaultdict(list), defaultdict(list)
    for u, v in edges:
        fwd_adj[v].append(u)   # labels flow src -> dst
        bwd_adj[u].append(v)   # labels flow dst -> src

    def propagate(adj):
        lbl = {v: v for v in nodes}
        for _ in range(4):
            nxt = dict(lbl)
            for v, nbrs in adj.items():
                m = min((lbl[u] for u in nbrs), default=lbl[v])
                nxt[v] = min(lbl[v], m)
            lbl = nxt
        return lbl

    f, b = propagate(fwd_adj), propagate(bwd_adj)
    expect = defaultdict(int)
    for v in nodes:
        expect[(f[v], b[v])] += 1
    got = {
        (r["fwd_label"], r["bwd_label"]): (r["n_nodes"], r["is_scc"])
        for r in _rows(spark, sf_dir, "graph_scc_bounded")
    }
    assert {k: v[0] for k, v in got.items()} == dict(expect)
    for (fl, bl), (_, is_scc) in got.items():
        assert is_scc == (1 if fl == bl else 0)
    # independent check: in a certified cell, the pivot c reaches
    # every member within 4 hops and vice versa (BFS, not min-label)
    out_adj = defaultdict(list)
    in_adj = defaultdict(list)
    for u, v in edges:
        out_adj[u].append(v)
        in_adj[v].append(u)

    def within4(src, adj):
        seen = {src}
        frontier = deque([(src, 0)])
        while frontier:
            x, d = frontier.popleft()
            if d == 4:
                continue
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    frontier.append((y, d + 1))
        return seen

    certified = defaultdict(list)
    for v in nodes:
        if f[v] == b[v]:
            certified[f[v]].append(v)
    checked = 0
    for c, members in list(certified.items())[:5]:
        reach = within4(c, out_adj)
        back = within4(c, in_adj)
        for v in members:
            assert v in reach and v in back, (c, v)
            checked += 1
    assert checked > 0


def test_hurst_rs_matches_python_recomputation(spark, sf_dir):
    """ts_hurst_rs equals a from-scratch Python fold: same hourly
    series, same integer prefix-deviation R and variance cores per
    full block, same qround grid, same 4-point regression. Also pins
    R_int ≥ 0 and the R/S ≥ 1 lower bound (max−min of a sequence
    that starts at its mean and returns to it spans at least one
    sd-scaled step is NOT guaranteed — only positivity is, so only
    positivity is pinned as the bound)."""
    import calendar
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    q6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    ev = load_table(spark, sf_dir, "events").select("ts")
    hc = Counter(
        calendar.timegm(r["ts"].timetuple()) // 3600 for r in ev.collect()
    )
    series = [c for _, c in sorted(hc.items())]
    pts = {}
    for m in (8, 16, 32, 64):
        logs = []
        for s0 in range(0, (len(series) // m) * m, m):
            blk = series[s0:s0 + m]
            S = sum(blk)
            Q = sum(c * c for c in blk)
            v_int = m * Q - S * S
            if v_int <= 0:
                continue
            cum = 0
            devs = []
            for i, c in enumerate(blk, start=1):
                cum += c
                devs.append(m * cum - i * S)
            r_int = max(devs) - min(devs)
            assert r_int >= 0
            logs.append(q6(math.log(r_int / math.sqrt(v_int))))
        pts[m] = (len(logs), q6(sum(logs) / len(logs)) if logs else None)
    # regression terms pre-quantized to the 1e-9 grid before summing,
    # mirroring the engine/oracle (ADVICE r6 item 2)
    q9 = lambda x: math.floor(x * 1e9 + 0.5) / 1e9
    xy = [
        (q9(math.log(float(m))), y)
        for m, (k, y) in pts.items()
        if y is not None and k > 0
    ]
    k = len(xy)
    if k >= 2:
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(q9(x * y) for x, y in xy)
        sxx = sum(q9(x * x) for x, _ in xy)
        den = k * sxx - sx * sx
        hurst = q6((k * sxy - sx * sy) / den) if den != 0 else None
    else:
        hurst = None
    got = {
        r["block_size"]: r for r in _rows(spark, sf_dir, "ts_hurst_rs")
    }
    assert set(got) == {8, 16, 32, 64}
    for m, (n_blocks, log_rs) in pts.items():
        r = got[m]
        assert r["n_blocks"] == n_blocks
        assert r["log_rs"] == log_rs
        assert r["hurst"] == hurst


def test_exact_shared_run_bounded_by_true_lcs(spark, sf_dir):
    """llm_exact_shared_run must NEVER exceed the true longest common
    token substring (computed by an independent O(n·m) DP, no seeds,
    no caps) — an overcount would mean the extension walked past a
    mismatch. Equality must hold for the vast majority of pairs (the
    df/occurrence caps may shorten a minority; at fixture scale the
    caps rarely bind)."""
    from etl_geonames_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    toks = {
        int(r["doc_id"]): [w for w in r["text"].split(" ") if w]
        for r in docs.collect()
    }
    out = _rows(spark, sf_dir, "llm_exact_shared_run")
    assert out, "no candidate pairs at this sf"
    equal = 0
    for r in out:
        a, b = toks[r["doc_a"]], toks[r["doc_b"]]
        # classic LCS-substring DP over token sequences
        prev = [0] * (len(b) + 1)
        best = 0
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            ai = a[i - 1]
            for j in range(1, len(b) + 1):
                if ai == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    if cur[j] > best:
                        best = cur[j]
            prev = cur
        assert r["exact_l"] <= best, (r["doc_a"], r["doc_b"])
        if r["exact_l"] == best:
            equal += 1
    assert equal >= 0.9 * len(out)


def test_pq_adc_matches_python_recomputation(spark, sf_dir):
    """llm_pq_search_adc equals a from-scratch Python replay: same
    1e-3 grid, same seed codebook, same per-subspace integer argmin
    codes, and ADC(q, v) = Σ_m ‖sub_q − codeword(code_v, m)‖² — the
    asymmetric-distance identity, checked for every emitted row, plus
    the top-10 sets themselves."""
    from etl_geonames_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    vecs = {
        int(r["vec_id"]): [
            math.floor(float(x) * 1000.0 + 0.5) for x in r["embedding"]
        ]
        for r in emb.collect()
    }
    d = len(next(iter(vecs.values())))
    M = 4
    sub = (d + M - 1) // M

    def subv(q, m):
        return q[m * sub:min((m + 1) * sub, d)]

    cb = {c: vecs[c] for c in range(8) if c in vecs}

    def code(v):
        out = []
        for m in range(M):
            best = min(
                cb,
                key=lambda c: (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(subv(v, m), subv(cb[c], m))
                    ),
                    c,
                ),
            )
            out.append(best)
        return out

    codes = {vid: code(v) for vid, v in vecs.items()}
    expect = {}
    for qid in [v for v in vecs if v < 5]:
        dists = []
        for vid, cds in codes.items():
            if vid == qid:
                continue
            d2 = sum(
                sum(
                    (a - b) ** 2
                    for a, b in zip(subv(vecs[qid], m), subv(cb[c], m))
                )
                for m, c in enumerate(cds)
            )
            dists.append((d2, vid))
        expect[qid] = {
            (vid, d2) for d2, vid in sorted(dists)[:10]
        }
    got = {}
    for r in _rows(spark, sf_dir, "llm_pq_search_adc"):
        got.setdefault(r["q_id"], set()).add((r["vec_id"], r["adc_d2"]))
    assert got == expect


def test_page_trend_bounds_and_expectation(spark, sf_dir):
    """Page's L identities the differential can't see: for k = 4
    treatments each block's contribution Σ(j+1)·rⱼ lies in [20, 30]
    (reversed vs sorted rank order), so L ∈ [20b, 30b]; e_l must be
    exactly 25·n_blocks; and z must reproduce (L − E)/√(25b/3) on the
    qround grid."""
    (r,) = _rows(spark, sf_dir, "stat_page_trend")
    b = r["n_blocks"]
    assert b > 0 and r["k_treatments"] == 4
    assert 20 * b - _EPS <= r["l_stat"] <= 30 * b + _EPS
    assert r["e_l"] == 25.0 * b
    q6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    assert r["z"] == q6(
        (r["l_stat"] - 25.0 * b) / math.sqrt(b * 25.0 / 3.0)
    )


def test_psi_terms_nonnegative_and_sum(spark, sf_dir):
    """Every PSI term (p − q)·ln(p/q) is ≥ 0 (the factors share
    sign), bins partition both periods' counts, and psi_total is the
    sum of the emitted terms (within the per-term qround grid)."""
    rows = _rows(spark, sf_dir, "dq_psi_drift")
    assert rows
    assert len({r["bin"] for r in rows}) == len(rows)
    for r in rows:
        assert r["psi_term"] >= -1e-6
        assert 0 <= r["bin"] <= 9
        assert r["psi_total"] == rows[0]["psi_total"]
    total = sum(r["psi_term"] for r in rows)
    assert abs(rows[0]["psi_total"] - total) < 1e-5
    assert rows[0]["psi_total"] >= -1e-6


def test_cms_join_size_never_underestimates(spark, sf_dir):
    """The CM inner-product guarantee: every depth row's dot ≥ the
    exact F₂ (collisions only ADD pair mass), hence est_f2 ≥
    exact_f2; and exact_f2 is recomputed independently in Python."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    f = Counter(
        int(r["l_partkey"])
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    )
    exact = sum(v * v for v in f.values())
    rows = _rows(spark, sf_dir, "join_size_cms_estimate")
    assert rows
    for r in rows:
        assert r["exact_f2"] == exact
        assert r["dot_f2"] >= exact
        assert r["est_f2"] >= exact
        assert r["est_f2"] <= r["dot_f2"]


def test_span_corruption_roundtrip_reconstructs_document(spark, sf_dir):
    """The T5 pair contract: splicing each <extra_id_k> target span
    back into the input at its sentinel position must reconstruct the
    original token stream exactly, the terminal sentinel index must
    equal n_spans, and sentinels must appear in increasing order in
    the input — for EVERY document."""
    import re

    from etl_geonames_spark.sources import load_table

    orig = {
        int(r["doc_id"]): [w for w in r["text"].split(" ") if w]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    sent = re.compile(r"^<extra_id_(\d+)>$")
    for r in _rows(spark, sf_dir, "llm_span_corruption"):
        doc = orig[r["doc_id"]]
        assert r["n_tokens"] == len(doc)
        tgt = r["target_text"].split(" ")
        spans: dict[int, list[str]] = {}
        cur = None
        for w in tgt:
            m = sent.match(w)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                assert cur is not None
                spans[cur].append(w)
        # terminal sentinel carries no tokens and equals n_spans
        assert spans.pop(r["n_spans"]) == []
        assert len(spans) == r["n_spans"]
        rebuilt: list[str] = []
        seen = []
        for w in (r["input_text"].split(" ") if r["input_text"] else []):
            m = sent.match(w)
            if m:
                k = int(m.group(1))
                seen.append(k)
                rebuilt.extend(spans[k])
            else:
                rebuilt.append(w)
        assert seen == sorted(seen)
        assert rebuilt == doc, r["doc_id"]


def test_allen_relations_partition_identity(spark, sf_dir):
    """The 13 relation counts must PARTITION the pair universe: their
    sum equals Σ_user C(|event_types(user)|, 2) recomputed
    independently in Python, every relation name is one of Allen's
    13, and symmetric pairs of point intervals land in 'equals'
    (the ladder-order bug class the round-6 review caught)."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    types_per_user = Counter()
    seen = set()
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    ):
        key = (r["user_id"], r["event_type"])
        assert key not in seen
        seen.add(key)
        types_per_user[r["user_id"]] += 1
    expect_pairs = sum(k * (k - 1) // 2 for k in types_per_user.values())
    rows = _rows(spark, sf_dir, "ts_allen_relations")
    names = {r["relation"] for r in rows}
    assert names <= {
        "before", "meets", "overlaps", "starts", "during", "finishes",
        "equals", "after", "met_by", "overlapped_by", "started_by",
        "contains", "finished_by",
    }
    assert len(names) == len(rows)
    assert sum(r["n_pairs"] for r in rows) == expect_pairs


def test_rouge_l_matches_python_dp(spark, sf_dir):
    """llm_rouge_l's nested-fold LCS equals the classic O(n·m) Python
    DP for EVERY eval pair — the third implementation that guards
    both engines' fold index arithmetic (an off-by-one in the
    prev/acc row indexing would differentially cancel, since the
    Spark and DuckDB folds are transliterations of each other)."""
    from etl_geonames_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        "doc_id < 200"
    )
    toks = {
        int(r["doc_id"]): [w for w in r["text"].split(" ") if w]
        for r in docs.collect()
    }

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for w in a:
            cur = [0]
            for j in range(1, len(b) + 1):
                cur.append(
                    prev[j - 1] + 1 if b[j - 1] == w
                    else max(cur[j - 1], prev[j])
                )
            prev = cur
        return prev[-1]

    out = _rows(spark, sf_dir, "llm_rouge_l")
    assert out
    for r in out:
        a = toks[2 * r["pair_id"]]
        b = toks[2 * r["pair_id"] + 1]
        want = lcs(a, b)
        assert r["lcs"] == want, r["pair_id"]
        # and the subsequence LCS dominates the contiguous-run length
        assert r["lcs"] <= min(len(a), len(b))


def test_cdc_chunk_dedup_matches_python_replay(spark, sf_dir):
    """llm_cdc_chunk_dedup equals a from-scratch Python replay of the
    whole pipeline — token poly-hash, window-4 rolling boundary gate,
    per-chunk Horner id — including the implicit invariant that
    chunks PARTITION each document (sum of chunk lengths = token
    count, checked inside the replay before aggregation)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    P, W, MASK = 1_000_003, 4, 16

    def ph(w):
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % P
        return h

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    agg = defaultdict(lambda: [None, set(), 0])  # len, docs, occ
    for r in docs.collect():
        tk = [w for w in r["text"].split(" ") if w]
        if not tk:
            continue
        hw = [ph(w) for w in tk]
        n = len(hw)
        bpos = []
        if n >= W + 1:
            for i in range(W, n):  # 1-based i in [4, n-1]
                rh = hw[i - 4]
                for x in hw[i - 3:i]:
                    rh = (rh * 131 + x) % P
                if rh % MASK == 0:  # i ranges [4, n-1]: never the end
                    bpos.append(i)
        ends = bpos + [n]
        start = 1
        total = 0
        for e in ends:
            span = hw[start - 1:e]
            total += len(span)
            ch = 0
            for x in span:
                ch = (ch * 131 + x) % P
            ent = agg[ch]
            ent[0] = len(span) if ent[0] is None else min(ent[0], len(span))
            ent[1].add(int(r["doc_id"]))
            ent[2] += 1
            start = e + 1
        assert total == n, r["doc_id"]  # chunks partition the doc
    want = {
        ch: (l, len(ds), occ)
        for ch, (l, ds, occ) in agg.items()
        if len(ds) >= 2
    }
    got = {
        r["chunk_hash"]: (r["chunk_len"], r["n_docs"], r["n_occ"])
        for r in _rows(spark, sf_dir, "llm_cdc_chunk_dedup")
    }
    assert got == want


def test_round7_stat_invariants(spark, sf_dir):
    """Mathematical identities/bounds for the round-7 stat family —
    the differential hash proves Spark == DuckDB, these prove the
    statistics are the right ones:
    - McNemar: chi2 = (b-c)^2/(b+c) recomputed from the emitted
      cells; chi2 >= 0.
    - Cochran Q: Q >= 0 and the emitted gate totals are consistent
      (each G_j <= n).
    - Jarque-Bera: JB = n/6*(S^2 + K^2/4) recomputed from the
      emitted skewness/kurtosis (to the qround grid); JB >= 0.
    - Cohen's d vs Hedges' g: |g| < |d| and g = d*(1-3/(4N-9)).
    - permutation entropy: 0 <= H <= ln 6, probabilities sum to 1,
      h_norm = H/ln 6.
    - harmonic centrality: harmonic6 <= 6*n_within_k (every term is
      at most 1/1) and >= 2*n_within_k (at least 1/3 each).
    """
    import math

    (r,) = _rows(spark, sf_dir, "stat_mcnemar")
    if r["chi2"] is not None:
        b, c = r["disc_b"], r["disc_c"]
        assert r["chi2"] >= 0
        assert r["chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=1e-6)

    (r,) = _rows(spark, sf_dir, "stat_cochran_q")
    assert all(r[g] <= r["n"] for g in ("g1", "g2", "g3"))
    if r["q_stat"] is not None:
        assert r["q_stat"] >= 0

    (r,) = _rows(spark, sf_dir, "stat_jarque_bera")
    if r["jb_stat"] is not None:
        s, k, n = r["skewness"], r["ex_kurtosis"], r["n"]
        assert r["jb_stat"] >= 0
        assert r["jb_stat"] == pytest.approx(
            n / 6.0 * (s * s + k * k / 4.0), abs=1e-3
        )

    rows = _rows(spark, sf_dir, "stat_cohens_d")
    if rows and rows[0]["cohens_d"] is not None:
        r = rows[0]
        nn = r["n1"] + r["n0"]
        assert abs(r["hedges_g"]) < abs(r["cohens_d"]) or r["cohens_d"] == 0
        assert r["hedges_g"] == pytest.approx(
            r["cohens_d"] * (1 - 3.0 / (4 * nn - 9)), abs=1e-5
        )

    rows = _rows(spark, sf_dir, "ts_permutation_entropy")
    assert rows
    h = rows[0]["h_perm"]
    assert -1e-9 <= h <= math.log(6) + 1e-6
    assert sum(r["p"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert rows[0]["h_norm"] == pytest.approx(
        h / math.log(6), abs=1e-5
    )

    for r in _rows(spark, sf_dir, "graph_harmonic_centrality"):
        assert 2 * r["n_within_k"] <= r["harmonic6"] <= 6 * r["n_within_k"]
        assert r["harmonic"] == pytest.approx(r["harmonic6"] / 6.0, abs=1e-6)


def test_watermark_detect_matches_binomial_replay(spark, sf_dir):
    """llm_watermark_detect's z equals the one-proportion z-test
    recomputed in Python from the emitted counts, and the flag fires
    exactly at z >= 2 — plus a planted check: a doc made ONLY of
    greenlist tokens must flag, an empty doc must not."""
    import math

    out = _rows(spark, sf_dir, "llm_watermark_detect")
    assert out
    for r in out:
        if r["n_tokens"] == 0:
            assert r["z"] is None and r["flagged"] is False
            continue
        z = (4 * r["n_green"] - r["n_tokens"]) / math.sqrt(
            3.0 * r["n_tokens"]
        )
        assert r["z"] == pytest.approx(z, abs=1e-6)
        assert r["flagged"] == (z >= 2.0)


def test_round7_batch3_invariants(spark, sf_dir):
    """Cross-op and bound invariants for the batch-3 operators:
    - blockiness: g_boundary + g_interior equals mm_image_gradient's
      grad_sum per image (same pixels, partitioned two ways) and the
      position counts partition w-1 columns x h rows.
    - polyline simplify: kept interior <= interior, n_out <= n_points,
      and interior = max(n_points - 2, 0).
    - SPC: lcl_x <= xbar <= ucl_x, rbar <= ucl_r, flags bounded by
      subgroup count.
    - Cochran-Armitage: consistent sufficient statistics
      (0 <= sum_wy <= sum_w, n_success <= n).
    """
    blk = {
        r["doc_id"]: r for r in _rows(spark, sf_dir, "mm_image_blockiness")
    }
    grad = {
        r["doc_id"]: r["grad_sum"]
        for r in _rows(spark, sf_dir, "mm_image_gradient")
    }
    assert set(blk) == set(grad)
    for d, r in blk.items():
        assert r["g_boundary"] + r["g_interior"] == grad[d], d
        assert (
            r["n_boundary"] + r["n_interior"]
            == (r["width"] - 1) * r["height"]
        ), d

    for r in _rows(spark, sf_dir, "geo_polyline_simplify"):
        assert r["n_interior"] == max(r["n_points"] - 2, 0)
        assert 0 <= r["n_kept_interior"] <= r["n_interior"]
        assert r["n_out"] <= r["n_points"]

    for r in _rows(spark, sf_dir, "ts_spc_xbar_r"):
        assert r["lcl_x"] <= r["xbar"] <= r["ucl_x"]
        assert r["rbar"] <= r["ucl_r"]
        assert 0 <= r["n_out_xbar"] <= r["n_subgroups"]
        assert 0 <= r["n_out_r"] <= r["n_subgroups"]

    (r,) = _rows(spark, sf_dir, "stat_cochran_armitage")
    assert 0 <= r["n_success"] <= r["n"]
    assert 0 <= r["sum_wy"] <= r["sum_w"]


def test_substring_census_exact_vs_python_and_dominates_capped(
    spark, sf_dir
):
    """llm_substring_census is the uncapped ground truth of the
    shared-substring family: (a) on a bounded sub-slice it EQUALS a
    pure-Python brute-force third implementation pair-for-pair, and
    (b) corpus-wide it dominates both capped approximations —
    llm_exact_shared_run's seed-and-extend (df/occ/extension caps)
    and llm_longest_shared_gram's doubling probe (df caps) can only
    report real shared runs, so census.lcs_tokens >= their reported
    lengths on every common pair."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    census = {
        (r["doc_a"], r["doc_b"]): (r["lcs_tokens"], r["n_shared_3grams"])
        for r in qs["llm_substring_census"](spark, sf_dir).collect()
    }
    assert census, "census must find shared runs on the fixture"

    # (a) exact equality vs python brute force on doc_id < 60
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .collect()
    )
    toks = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w != ""]
        for r in rows
    }
    gram_docs: dict = {}
    for d, tk in toks.items():
        n = len(tk)
        seen = set()
        for l in range(3, n + 1):
            for s in range(0, n - l + 1):
                g = (l, tuple(tk[s : s + l]))
                if g not in seen:
                    seen.add(g)
                    gram_docs.setdefault(g, []).append(d)
    want: dict = {}
    for (l, _), ds in gram_docs.items():
        for i in range(len(ds)):
            for k in range(i + 1, len(ds)):
                pair = (ds[i], ds[k])
                best, c3 = want.get(pair, (0, 0))
                want[pair] = (max(best, l), c3 + (1 if l == 3 else 0))
    got_sub = {
        p: v for p, v in census.items() if p[0] < 60 and p[1] < 60
    }
    assert got_sub == want

    # (b) census dominates the capped approximations on common pairs
    dominated = 0
    for name, lcol in (
        ("llm_exact_shared_run", "exact_l"),
        ("llm_longest_shared_gram", "longest_l"),
    ):
        for r in qs[name](spark, sf_dir).collect():
            if r["doc_a"] < 200 and r["doc_b"] < 200 and r[lcol] >= 3:
                pair = (r["doc_a"], r["doc_b"])
                assert pair in census, (name, pair)
                assert census[pair][0] >= r[lcol], (name, pair)
                dominated += 1
    assert dominated > 0


def test_kendall_and_fleiss_match_python_replay(spark, sf_dir):
    """Pure-Python third implementations of the round-8 agreement
    stats: tau-b recomputed pair-by-pair from the fixture texts and
    Fleiss' kappa recomputed vote-by-vote must equal the engine
    outputs on the same qround grid (the differential only proves
    Spark == DuckDB; this pins the math)."""
    import math

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.sources import load_table

    qs = entry_mod.queries()

    # --- Kendall tau-b
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "n_chars", "text")
        .collect()
    )
    pts = []
    for r in rows:
        tk = [w for w in r["text"].split(" ") if w != ""]
        pts.append((r["n_chars"], len(set(tk))))
    C = D = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            if xa == xb:
                tx += 1
            if ya == yb:
                ty += 1
            if (xa < xb and ya < yb) or (xa > xb and ya > yb):
                C += 1
            elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
                D += 1
    n = len(pts)
    n0 = n * (n - 1) // 2
    want_tau = math.floor(
        (C - D) / math.sqrt((n0 - tx) * (n0 - ty)) * 1e6 + 0.5
    ) / 1e6
    got = qs["llm_metric_kendall"](spark, sf_dir).collect()[0]
    assert (got["n"], got["concordant"], got["discordant"]) == (n, C, D)
    assert (got["ties_x"], got["ties_y"]) == (tx, ty)
    assert got["tau_b"] == want_tau

    # --- Fleiss kappa
    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    t1 = sq = 0
    for text in texts:
        tk = [w for w in text.split(" ") if w != ""]
        nw = len(tk)
        votes = 0
        if nw >= 10:
            votes += 1
        if nw > 0 and len(set(tk)) / nw >= 0.5:
            votes += 1
        if nw > 0 and 2.0 <= sum(len(w) for w in tk) / nw <= 12.0:
            votes += 1
        t1 += votes
        sq += votes * votes + (3 - votes) * (3 - votes)
    N = len(texts)
    p_bar = (sq - 3.0 * N) / (6.0 * N)
    p_e = (t1 * t1 + (3.0 * N - t1) * (3.0 * N - t1)) / (9.0 * N * N)
    want_kappa = math.floor((p_bar - p_e) / (1.0 - p_e) * 1e6 + 0.5) / 1e6
    gf = qs["stat_fleiss_kappa"](spark, sf_dir).collect()[0]
    assert (gf["n"], gf["t1"]) == (N, t1)
    assert gf["kappa"] == want_kappa
    # agreement bound: kappa <= 1 always; P_bar in [1/3, 1] for m=3
    assert gf["kappa"] <= 1.0 and 1.0 / 3.0 <= gf["p_bar"] <= 1.0


def test_esd_outliers_matches_python_replay(spark, sf_dir):
    """Pure-Python replay of the 3 generalized-ESD rounds: integer
    argmax of |n·x − Σx| with doc_id tie-break, then removal — the
    engine's round table must match doc-for-doc and R-for-R; the
    round-1 row must equal stat_grubbs' maximum studentized deviate
    (ESD round 1 IS Grubbs)."""
    import math

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.sources import load_table

    qs = entry_mod.queries()
    xs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    want = []
    remaining = dict(xs)
    for rnd in (1, 2, 3):
        if not remaining:
            break
        n = len(remaining)
        s = sum(remaining.values())
        q = sum(v * v for v in remaining.values())
        pick = min(
            remaining, key=lambda d: (-abs(remaining[d] * n - s), d)
        )
        r_stat = None
        var = n * q - s * s  # exact int, like both engines
        if n >= 3 and var > 0:
            # same division order as stat_grubbs / the engine:
            # maxdev / n / sqrt(var / (n·(n−1)))
            r = (
                abs(remaining[pick] * n - s)
                / float(n)
                / math.sqrt(var / (float(n) * (n - 1)))
            )
            r_stat = math.floor(r * 1e6 + 0.5) / 1e6
        want.append((rnd, n, pick, remaining[pick], r_stat))
        del remaining[pick]
    got = [
        (r["round"], r["n"], r["outlier_doc"], r["outlier_x"], r["r_stat"])
        for r in qs["dq_esd_outliers"](spark, sf_dir)
        .orderBy("round")
        .collect()
    ]
    assert got == want
    # round 1 is Grubbs: same statistic from the sibling op
    g = qs["stat_grubbs"](spark, sf_dir).collect()[0]
    assert got[0][4] == g["g_stat"]
    # distinct removals, and R non-increasing is NOT guaranteed
    # (masking is the point) — but docs must be distinct
    assert len({row[2] for row in got}) == len(got)


def test_neyman_allocation_invariants(spark, sf_dir):
    """Neyman weights are a probability vector over the defined
    strata (Σw = 1 on the qround grid), the allocation sums to the
    1000 budget, and equal-variance strata reduce to proportional
    allocation: w_h ∝ N_h·S_h replayed in Python from the collected
    stratum table."""
    import math

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["sample_neyman_allocation"](
        spark, sf_dir
    ).collect()
    defined = [r for r in rows if r["neyman_weight"] is not None]
    assert defined, "fixture has multi-doc strata"
    assert abs(sum(r["neyman_weight"] for r in defined) - 1.0) < 1e-4
    assert abs(sum(r["alloc_1000"] for r in defined) - 1000.0) < 1e-2
    # python replay of w_h from the emitted (n_docs, sd_chars)
    total = sum(r["n_docs"] * r["sd_chars"] for r in defined)
    for r in defined:
        want = math.floor(r["n_docs"] * r["sd_chars"] / total * 1e6 + 0.5) / 1e6
        # sd_chars is already qround(6)-coarsened, so replay on that
        # grid agrees only to ~1e-6-scale slack, not exactly
        assert abs(r["neyman_weight"] - want) < 5e-5


def test_dunn_posthoc_consistent_with_kruskal_wallis(spark, sf_dir):
    """Dunn pairs share Kruskal-Wallis' rank machinery: the pair
    table covers exactly k(k−1)/2 source pairs, mean ranks are
    midranks (Σ n_g·R̄_g = N(N+1)/2, the rank-sum identity), and
    z antisymmetry holds by construction (a < b ordering)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    rows = qs["stat_dunn_posthoc"](spark, sf_dir).collect()
    kw = qs["stat_kruskal_wallis"](spark, sf_dir).collect()[0]
    k, n = kw["k"], kw["n"]
    assert len(rows) == k * (k - 1) // 2
    # rank-sum identity from the per-pair mean ranks: reconstruct
    # each group's rank sum once (every group appears in k-1 pairs)
    sums = {}
    for r in rows:
        sums[r["source_a"]] = r["n_a"] * r["mean_rank_a"]
        sums[r["source_b"]] = r["n_b"] * r["mean_rank_b"]
    total = sum(sums.values())
    want = n * (n + 1) / 2
    assert abs(total - want) / want < 1e-6


def test_seasonal_strength_bounds_and_python_replay(spark, sf_dir):
    """Strengths are clamped to [0, 1] by definition, and a
    pure-Python var_pop replay over the decomposition's own output
    rows must reproduce them on the qround grid (pins that the op is
    a pure aggregate of ts_seasonal_decompose, nothing more)."""
    import math

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    base = qs["ts_seasonal_decompose"](spark, sf_dir).collect()
    rows = qs["ts_seasonal_strength"](spark, sf_dir).collect()
    per = {}
    for r in base:
        per.setdefault(r["event_type"], []).append(
            (r["residual"], r["seasonal"], r["trend"])
        )

    def var_pop(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    assert rows
    for r in rows:
        vals = per[r["event_type"]]
        assert r["n_days"] == len(vals)
        vr = var_pop([v[0] for v in vals])
        vsr = var_pop([v[1] + v[0] for v in vals])
        vtr = var_pop([v[2] + v[0] for v in vals])
        for got, vden in (
            (r["seasonal_strength"], vsr),
            (r["trend_strength"], vtr),
        ):
            # the engine gates on the qround(6)'d variance
            if math.floor(vden * 1e6 + 0.5) / 1e6 <= 0:
                assert got is None
                continue
            assert 0.0 <= got <= 1.0
            want = math.floor(max(0.0, 1.0 - vr / vden) * 1e6 + 0.5) / 1e6
            # engine var_pop is a streaming algorithm; python's is
            # two-pass — agree to ~1e-6-scale slack, not bit-exact
            assert abs(got - want) < 5e-5


def test_lcs_corpus_exact_matches_census_on_slice(spark, sf_dir):
    """llm_lcs_corpus_exact is llm_substring_census without the slice
    bound (threshold >= 8 instead): restricted to pairs with both
    doc_ids inside the census slice, its lcs_tokens must equal the
    census's pair-for-pair on every census pair with lcs_tokens >= 8
    — the VERDICT r8 item 4 exactness pin for the corpus-wide path.
    Also checks the corpus op finds pairs OUTSIDE the slice (it is
    genuinely corpus-wide, not a re-sliced census)."""
    census = {
        (r["doc_a"], r["doc_b"]): r["lcs_tokens"]
        for r in _rows(spark, sf_dir, "llm_substring_census")
        if r["lcs_tokens"] >= 8
    }
    corpus_rows = _rows(spark, sf_dir, "llm_lcs_corpus_exact")
    corpus_slice = {
        (r["doc_a"], r["doc_b"]): r["lcs_tokens"]
        for r in corpus_rows
        if r["doc_a"] < 200 and r["doc_b"] < 200
    }
    assert census, "fixture must have slice pairs with lcs >= 8"
    assert corpus_slice == census
    assert any(
        r["doc_a"] >= 200 or r["doc_b"] >= 200 for r in corpus_rows
    ), "corpus-wide op must also report pairs outside the census slice"
    # every reported run is >= the seed threshold and every pair
    # carries at least one shared seed gram by construction
    for r in corpus_rows:
        assert r["lcs_tokens"] >= 8
        assert r["n_shared_seed_grams"] >= 1


def test_kendall_w_matches_python_replay(spark, sf_dir):
    """Pure-Python third implementation of Kendall's W: midranks per
    metric-rater recomputed from the fixture texts, tie correction
    included — must equal the engine outputs on the qround grid (the
    differential only proves Spark == DuckDB)."""
    import math

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    metrics = []
    for r in rows:
        tk = [w for w in r["text"].split(" ") if w != ""]
        metrics.append((r["doc_id"], r["n_chars"], len(set(tk)), len(tk)))
    n = len(metrics)
    m = 3
    ranks = {d: 0.0 for d, *_ in metrics}
    sum_t3 = 0
    for col in (1, 2, 3):
        order = sorted(metrics, key=lambda t: (t[col], t[0]))
        byval: dict = {}
        for pos, t in enumerate(order, start=1):
            byval.setdefault(t[col], []).append((pos, t[0]))
        for v, entries in byval.items():
            mr = (entries[0][0] + entries[-1][0]) / 2.0
            tcnt = len(entries)
            sum_t3 += tcnt**3 - tcnt
            for _, d in entries:
                ranks[d] += mr
    s = sum((r - m * (n + 1) / 2.0) ** 2 for r in ranks.values())
    denom = m * m * (n**3 - n) - m * sum_t3
    w = 12.0 * s / denom
    got = _rows(spark, sf_dir, "stat_kendall_w")[0]
    assert got["n"] == n and got["m"] == m

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert abs(got["w_stat"] - q6(w)) <= 1e-6
    assert abs(got["chi2_r"] - q6(m * (n - 1) * w)) <= 1e-6
    assert 0.0 <= got["w_stat"] <= 1.0  # W is a concordance in [0, 1]


def test_dsir_weights_python_replay(spark, sf_dir):
    """Pure-Python DSIR replay: hashed-bigram counts, add-1 smoothed
    target/raw models, per-doc log-likelihood-ratio weights — per-lang
    aggregates must match the engine outputs on the qround grid, and
    the scored/doc counts exactly."""
    import math
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    B, P = 512, 1_000_003
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )

    def ph(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % P
        return h

    raw = Counter()
    tgt = Counter()
    docs = []
    for r in rows:
        tk = [w for w in r["text"].split(" ") if w != ""]
        bs = [
            ph(tk[i] + "\x01" + tk[i + 1]) % B
            for i in range(len(tk) - 1)
        ]
        docs.append((r["lang"], Counter(bs)))
        raw.update(bs)
        if r["lang"] == "en":
            tgt.update(bs)
    rr, tt = sum(raw.values()), sum(tgt.values())
    lam = {
        b: math.log((tgt.get(b, 0) + 1) / (tt + B))
        - math.log((c + 1) / (rr + B))
        for b, c in raw.items()
    }
    per_lang = defaultdict(lambda: [0, 0, 0.0, 0])  # docs, scored, sum, pos
    for lang, cnt in docs:
        per_lang[lang][0] += 1
        if cnt:
            w = sum(nb * lam[b] for b, nb in cnt.items())
            per_lang[lang][1] += 1
            per_lang[lang][2] += w
            if math.floor(w * 1e6 + 0.5) / 1e6 > 0:
                per_lang[lang][3] += 1
    got = {r["lang"]: r for r in _rows(spark, sf_dir, "llm_dsir_weights")}
    assert set(got) == set(per_lang)
    for lang, (nd, ns, sw, np_) in per_lang.items():
        g = got[lang]
        assert g["n_docs"] == nd and g["n_scored"] == ns
        assert g["n_positive"] == np_
        if ns:
            assert abs(g["avg_logweight"] - sw / ns) <= 2e-6
        else:
            # a lang whose docs are all empty/single-token has no
            # scored docs: the engine must emit NULL, not crash
            assert g["avg_logweight"] is None


def test_ad_ksample_matches_python_replay(spark, sf_dir):
    """Pure-Python third implementation of Scholz-Stephens A²akN
    (midrank version) plus the variance polynomial — must match the
    engine outputs on the qround grid, with the g double-sum computed
    the TEXTBOOK O(N²) way (the engines use the harmonic-prefix
    restatement; agreeing across the two formulations pins the
    restatement, not just the transcription)."""
    import math
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(int(r["n_chars"]))
    k = len(by_lang)
    pooled = Counter(v for vs in by_lang.values() for v in vs)
    zstar = sorted(pooled)
    n = sum(pooled.values())
    a2 = 0.0
    for vs in by_lang.values():
        ni = len(vs)
        ci = Counter(vs)
        cum_pool = 0
        cum_i = 0
        inner = 0.0
        for v in zstar:
            lj = pooled[v]
            fij = ci.get(v, 0)
            cum_pool += lj
            cum_i += fij
            bj = cum_pool - lj / 2.0
            mij = cum_i - fij / 2.0
            den = bj * (n - bj) - n * lj / 4.0
            inner += lj / n * (n * mij - bj * ni) ** 2 / den
        a2 += inner / ni
    a2 *= (n - 1.0) / n
    hh = sum(1.0 / len(vs) for vs in by_lang.values())
    h = sum(1.0 / r for r in range(1, n))
    g = sum(
        1.0 / ((n - i) * j)
        for i in range(1, n - 1)
        for j in range(i + 1, n)
    )
    m = k - 1
    a = (4 * g - 6) * m + (10 - 6 * g) * hh
    b = (
        (2 * g - 4) * k * k
        + 8 * h * k
        + (2 * g - 14 * h - 4) * hh
        - 8 * h
        + 4 * g
        - 6
    )
    c = (
        (6 * h + 2 * g - 2) * k * k
        + (4 * h - 4 * g + 6) * k
        + (2 * h - 6) * hh
        + 4 * h
    )
    d = (2 * h + 6) * k * k - 4 * h * k
    var = (a * n**3 + b * n**2 + c * n + d) / (
        (n - 1.0) * (n - 2.0) * (n - 3.0)
    )
    stat = (a2 - m) / math.sqrt(var)
    got = _rows(spark, sf_dir, "stat_ad_ksample")[0]
    assert got["k"] == k and got["n"] == n
    assert abs(got["a2akn"] - a2) <= 2e-6
    assert abs(got["ad_stat"] - stat) <= 2e-6
    assert got["a2akn"] >= 0.0  # sum of squared terms


def test_moods_median_matches_python_replay(spark, sf_dir):
    """Pure-Python Mood's median replay: pooled lower median, per-group
    above counts with ties-below, Pearson chi2 over the k x 2 table —
    exact integer agreement on counts and qround-grid agreement on
    chi2."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(int(r["n_chars"]))
    pooled = sorted(v for vs in by_lang.values() for v in vs)
    n = len(pooled)
    gm = pooled[(n + 1) // 2 - 1]  # lower median (order stat ceil(N/2))
    k = len(by_lang)
    a = sum(1 for v in pooled if v > gm)
    chi2 = 0.0
    for vs in by_lang.values():
        ni, ai = len(vs), sum(1 for v in vs if v > gm)
        for obs, margin in ((ai, a), (ni - ai, n - a)):
            e = margin * ni / n
            chi2 += (obs - e) ** 2 / e
    got = _rows(spark, sf_dir, "stat_moods_median")[0]
    assert got["k"] == k and got["n"] == n
    assert got["grand_median"] == gm
    assert got["dof"] == k - 1
    assert abs(got["chi2"] - math.floor(chi2 * 1e6 + 0.5) / 1e6) <= 1e-6
    assert got["chi2"] >= 0.0


def test_dickey_fuller_matches_python_replay(spark, sf_dir):
    """Pure-Python OLS replay of the constant-only Dickey-Fuller
    regression per event type (Δy on 1, y_lag): γ̂ and its t-ratio
    must match the engines on the qround grid, and the residual-sum
    identity RSS = Sdd − α̂Σd − γ̂Σxd holds to float tolerance
    (normal-equations check, independent of the fold order)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F2

    from etl_geonames_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F2.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in ev:
        series[r["event_type"]][r["day"]] = r["count"]
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_dickey_fuller")}
    checked = 0
    for et, dd in series.items():
        v = [float(dd[k]) for k in sorted(dd)]
        n = len(v)
        if n < 4:
            assert et not in got
            continue
        xs = v[:-1]
        ds = [v[i + 1] - v[i] for i in range(n - 1)]
        m = n - 1
        sx, sd = sum(xs), sum(ds)
        sxd = sum(a * b for a, b in zip(xs, ds))
        sxx = sum(a * a for a in xs)
        det = m * sxx - sx * sx
        if det <= 0:
            # constant series: the engine filters it out (det > 0)
            assert et not in got
            continue
        gam = (m * sxd - sx * sd) / det
        alpha = (sd - gam * sx) / m
        rss = sum((b - alpha - gam * a) ** 2 for a, b in zip(xs, ds))
        t = gam / math.sqrt(rss / (m - 2) / (det / m))
        g = got[et]
        assert g["n_days"] == n
        assert abs(g["gamma_hat"] - gam) <= 2e-6
        assert abs(g["df_t"] - t) <= 2e-6
        sdd = sum(b * b for b in ds)
        assert abs(rss - (sdd - alpha * sd - gam * sxd)) <= 1e-6 * max(
            1.0, abs(rss)
        )
        checked += 1
    assert checked > 0


def test_ad_ksample_variance_polynomial_matches_exact_enumeration():
    """The Scholz-Stephens variance polynomial (a·N³+b·N²+c·N+d)/
    ((N−1)(N−2)(N−3)) — a in (k−1), b/c/d in k — IS the exact
    permutation variance of A²kN under no ties: full enumeration over
    all assignments of distinct ranks must reproduce it (and the mean
    must be exactly k−1). This pins the COEFFICIENT SPLIT itself: the
    round-9 fourth review pass refuted a mistranscription (k−1
    everywhere plus a spurious −4g+6 term) that Spark, the oracle,
    and the replay all shared — the one error class no differential
    can see. Uses the right-continuous A²kN (whose variance the
    polynomial is); the engine's midrank A²akN is standardized by the
    same σ per the published convention."""
    from collections import Counter
    from itertools import combinations

    def a2kn_right(groups):
        pooled = Counter(v for g in groups for v in g)
        zstar = sorted(pooled)[:-1]
        n = sum(len(g) for g in groups)
        a2 = 0.0
        for vs in groups:
            ni = len(vs)
            ci = Counter(vs)
            cum_pool = cum_i = 0
            inner = 0.0
            for v in zstar:
                lj = pooled[v]
                cum_pool += lj
                cum_i += ci.get(v, 0)
                inner += (
                    lj
                    / n
                    * (n * cum_i - cum_pool * ni) ** 2
                    / (cum_pool * (n - cum_pool))
                )
            a2 += inner / ni
        return a2

    def poly_var(k, ns):
        # the SAME coefficient split the engines ship
        n = sum(ns)
        hh = sum(1.0 / x for x in ns)
        h = sum(1.0 / r for r in range(1, n))
        g = sum(
            1.0 / ((n - i) * j)
            for i in range(1, n - 1)
            for j in range(i + 1, n)
        )
        a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * hh
        b = (
            (2 * g - 4) * k * k
            + 8 * h * k
            + (2 * g - 14 * h - 4) * hh
            - 8 * h
            + 4 * g
            - 6
        )
        c = (
            (6 * h + 2 * g - 2) * k * k
            + (4 * h - 4 * g + 6) * k
            + (2 * h - 6) * hh
            + 4 * h
        )
        d = (2 * h + 6) * k * k - 4 * h * k
        return (a * n**3 + b * n**2 + c * n + d) / (
            (n - 1.0) * (n - 2.0) * (n - 3.0)
        )

    for ns in [(4, 4), (3, 5), (3, 3, 3)]:
        vals = list(range(1, sum(ns) + 1))
        stats = []
        if len(ns) == 2:
            for combo in combinations(vals, ns[0]):
                g1 = list(combo)
                g2 = [v for v in vals if v not in combo]
                stats.append(a2kn_right([g1, g2]))
        else:
            for c1 in combinations(vals, ns[0]):
                rest = [v for v in vals if v not in c1]
                for c2 in combinations(rest, ns[1]):
                    g3 = [v for v in rest if v not in c2]
                    stats.append(a2kn_right([list(c1), list(c2), g3]))
        mean = sum(stats) / len(stats)
        var = sum((s - mean) ** 2 for s in stats) / len(stats)
        assert abs(mean - (len(ns) - 1)) < 1e-9, ns
        assert abs(var - poly_var(len(ns), ns)) < 1e-9, ns


def _daily_series_py(spark, sf_dir):
    from collections import defaultdict

    from pyspark.sql import functions as F2

    from etl_geonames_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F2.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in ev:
        series[r["event_type"]][r["day"]] = r["count"]
    return {
        et: [float(dd[k]) for k in sorted(dd)] for et, dd in series.items()
    }


def test_variance_ratio_python_replay(spark, sf_dir):
    """Pure-Python replay of VR(4) and its z per event type; VR > 0
    by construction whenever emitted."""
    series = _daily_series_py(spark, sf_dir)
    got = {
        r["event_type"]: r for r in _rows(spark, sf_dir, "ts_variance_ratio")
    }
    q = 4
    checked = 0
    for et, v in series.items():
        n = len(v)
        if n < 8:
            assert et not in got
            continue
        m = n - 1
        mu = (v[-1] - v[0]) / m
        s1 = sum((v[t + 1] - v[t] - mu) ** 2 for t in range(m))
        sq = sum((v[t + q] - v[t] - q * mu) ** 2 for t in range(m - q + 1))
        g = got[et]
        if s1 <= 0:
            assert g["vr"] is None
            continue
        vr = (sq / (q * (m - q + 1))) / (s1 / m)
        z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * m))
        assert vr > 0
        assert abs(g["vr"] - vr) <= 2e-6
        assert abs(g["z_stat"] - z) <= 2e-6
        checked += 1
    assert checked > 0


def test_arch_lm_python_replay(spark, sf_dir):
    """Pure-Python replay of the lag-1 squared-shock regression;
    0 ≤ R² ≤ 1 and LM = (m−1)·R² ≥ 0 whenever emitted."""
    series = _daily_series_py(spark, sf_dir)
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_arch_lm")}
    checked = 0
    for et, v in series.items():
        n = len(v)
        if n < 5:
            assert et not in got
            continue
        m = n - 1
        mu = (v[-1] - v[0]) / m
        u = [(v[t + 1] - v[t] - mu) ** 2 for t in range(m)]
        xs, ys = u[:-1], u[1:]
        np_ = len(xs)
        sx, sy = sum(xs), sum(ys)
        cxx = sum(a * a for a in xs) - sx * sx / np_
        cyy = sum(b * b for b in ys) - sy * sy / np_
        cxy = sum(a * b for a, b in zip(xs, ys)) - sx * sy / np_
        g = got[et]
        if cxx <= 0 or cyy <= 0:
            assert g["r2"] is None
            continue
        r2 = cxy * cxy / (cxx * cyy)
        assert -_EPS <= r2 <= 1 + _EPS
        assert abs(g["r2"] - r2) <= 2e-6
        assert abs(g["lm_stat"] - np_ * r2) <= 2e-5
        checked += 1
    assert checked > 0


def test_durbin_watson_python_replay_and_bounds(spark, sf_dir):
    """Pure-Python OLS-on-time replay; DW ∈ [0, 4] by the
    Cauchy-Schwarz argument whenever emitted."""
    series = _daily_series_py(spark, sf_dir)
    got = {
        r["event_type"]: r for r in _rows(spark, sf_dir, "ts_durbin_watson")
    }
    checked = 0
    for et, v in series.items():
        n = len(v)
        if n < 4:
            assert et not in got
            continue
        st = n * (n + 1) // 2
        stt = n * (n + 1) * (2 * n + 1) // 6
        sy = sum(v)
        sty = sum((t + 1) * v[t] for t in range(n))
        det = n * stt - st * st
        b = (n * sty - st * sy) / det
        a = (sy - b * st) / n
        e = [v[t] - a - b * (t + 1) for t in range(n)]
        den = sum(x * x for x in e)
        num = sum((e[t] - e[t - 1]) ** 2 for t in range(1, n))
        g = got[et]
        assert abs(g["slope"] - b) <= 2e-6
        if den <= 0:
            assert g["dw"] is None
            continue
        dw = num / den
        assert -_EPS <= dw <= 4 + _EPS
        assert abs(g["dw"] - dw) <= 2e-5
        checked += 1
    assert checked > 0


def test_turning_points_python_replay(spark, sf_dir):
    """Exact integer replay of the strict-extrema count and the
    closed-form null moments."""
    series = _daily_series_py(spark, sf_dir)
    got = {
        r["event_type"]: r for r in _rows(spark, sf_dir, "ts_turning_points")
    }
    checked = 0
    for et, v in series.items():
        n = len(v)
        if n < 4:
            assert et not in got
            continue
        t_count = sum(
            1
            for t in range(1, n - 1)
            if (v[t] - v[t - 1]) * (v[t] - v[t + 1]) > 0
        )
        g = got[et]
        assert g["t_count"] == t_count
        exp_t = 2.0 * (n - 2) / 3.0
        z = (t_count - exp_t) / math.sqrt((16.0 * n - 29.0) / 90.0)
        assert abs(g["expected"] - exp_t) <= 2e-6
        assert abs(g["z_stat"] - z) <= 2e-6
        checked += 1
    assert checked > 0


def test_granger_matches_numpy_lstsq(spark, sf_dir):
    """Third implementation by a DIFFERENT method: numpy least-squares
    on the actual design matrices (restricted AR(1) vs unrestricted
    ADL(1,1)) must reproduce the closed-form Cramer F within the
    qround grid — validating the centered-moment algebra, not just
    the fold order. Also pins F ≥ 0 (nested models)."""
    import numpy as np

    series = _daily_series_py(spark, sf_dir)
    got = {
        (r["cause"], r["effect"]): r
        for r in _rows(spark, sf_dir, "ts_granger_lag1")
    }
    # common-day alignment: rebuild from per-day dicts
    from collections import defaultdict

    from pyspark.sql import functions as F2

    from etl_geonames_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F2.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    per = defaultdict(dict)
    for r in ev:
        per[r["event_type"]][r["day"]] = float(r["count"])
    types = sorted(per)
    checked = 0
    for ca in types:
        for ef in types:
            if ca == ef:
                continue
            days = sorted(set(per[ca]) & set(per[ef]))
            n = len(days)
            if n < 6:
                assert (ca, ef) not in got
                continue
            vx = [per[ca][d] for d in days]
            vy = [per[ef][d] for d in days]
            m = n - 1
            y = np.array(vy[1:])
            Xu = np.column_stack(
                [np.ones(m), np.array(vy[:-1]), np.array(vx[:-1])]
            )
            Xr = Xu[:, :2]
            if (ca, ef) not in got:
                continue  # singular fit dropped by the engine guard
            ssr_u = float(
                np.sum((y - Xu @ np.linalg.lstsq(Xu, y, rcond=None)[0]) ** 2)
            )
            ssr_r = float(
                np.sum((y - Xr @ np.linalg.lstsq(Xr, y, rcond=None)[0]) ** 2)
            )
            g = got[(ca, ef)]
            if g["f_stat"] is None:
                continue
            f = (ssr_r - ssr_u) * (m - 3) / ssr_u
            assert f >= -1e-6
            assert abs(g["f_stat"] - f) <= max(2e-5, 1e-5 * abs(f))
            checked += 1
    assert checked > 0


def test_cvm_null_moments_match_exact_enumeration():
    """The z-standardization constants E[T] = (N+1)/(6N) and
    Var[T] = (N+1)(4n1n2N − 3(n1²+n2²) − 2n1n2)/(180N²n1n2)
    (Anderson 1962) verified by brute-force enumeration of ALL
    C(N, n1) group assignments over distinct pooled values — the
    stat_ad_ksample variance-polynomial precedent (where exactly this
    kind of constant was wrong and both engines agreed on the wrong
    answer)."""
    from fractions import Fraction
    from itertools import combinations

    def t_stat(assign, n1, n2):
        N = n1 + n2
        cum1 = cum2 = 0
        s = Fraction(0)
        for v in range(N):
            if v in assign:
                cum1 += 1
            else:
                cum2 += 1
            gap = cum1 * n2 - cum2 * n1
            s += Fraction(gap * gap)
        return s / (n1 * n2 * N * N)

    for n1, n2 in [(4, 4), (3, 5), (2, 6)]:
        N = n1 + n2
        ts = [t_stat(set(c), n1, n2) for c in combinations(range(N), n1)]
        k = len(ts)
        mean = sum(ts) / k
        var = sum((t - mean) ** 2 for t in ts) / k
        assert mean == Fraction(N + 1, 6 * N)
        assert var == Fraction(N + 1) * (
            4 * n1 * n2 * N - 3 * (n1 * n1 + n2 * n2) - 2 * n1 * n2
        ) / (180 * N * N * n1 * n2)


def test_cvm_two_sample_python_replay(spark, sf_dir):
    """Pure-Python replay of T over the fixture corpus; T ≥ 0 by
    construction and agrees with the engines on the qround grid."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("n_chars", "lang")
        .collect()
    )
    c1, c2 = Counter(), Counter()
    for r in rows:
        (c1 if r["lang"] == "en" else c2)[int(r["n_chars"])] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    (g,) = _rows(spark, sf_dir, "stat_cvm_two_sample")
    assert (g["n1"], g["n2"]) == (n1, n2)
    if n1 == 0 or n2 == 0:
        assert g["t_stat"] is None
        return
    cum1 = cum2 = 0
    num = 0.0
    for v in sorted(set(c1) | set(c2)):
        cum1 += c1[v]
        cum2 += c2[v]
        gap = cum1 * n2 - cum2 * n1
        num += (c1[v] + c2[v]) * float(gap) * float(gap)
    N = n1 + n2
    t = num / (n1 * n2 * N**4)
    assert t >= 0
    assert abs(g["t_stat"] - t) <= 2e-6
    et = (N + 1.0) / (6.0 * N)
    vt = (
        (N + 1.0)
        * (4.0 * n1 * n2 * N - 3.0 * (n1 * n1 + n2 * n2) - 2.0 * n1 * n2)
        / (180.0 * N * N * n1 * n2)
    )
    assert abs(g["z_stat"] - (t - et) / math.sqrt(vt)) <= 2e-6


def test_cmh_python_replay(spark, sf_dir):
    """Exact pure-Python replay of the stratified 2×2 machinery:
    grand median (pooled lower order statistic), per-stratum cells,
    CMH chi2 and the MH common odds ratio; chi2 ≥ 0 whenever
    emitted."""
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    if not rows:
        assert _rows(spark, sf_dir, "stat_cmh") == []
        return
    pooled = Counter(int(r["n_chars"]) for r in rows)
    n_total = sum(pooled.values())
    half = (n_total + 1) // 2
    cum = 0
    gm = None
    for v in sorted(pooled):
        cum += pooled[v]
        if cum >= half:
            gm = v
            break
    cells = defaultdict(lambda: [0, 0, 0, 0])  # nk, n1k, m1k, ak
    for r in rows:
        arm = int(r["doc_id"]) % 2
        above = int(r["n_chars"]) > gm
        c = cells[r["lang"]]
        c[0] += 1
        c[1] += arm
        c[2] += int(above)
        c[3] += int(arm and above)
    dev = vsum = orn = ordn = 0.0
    k = n = 0
    for nk, n1k, m1k, ak in cells.values():
        if nk < 2:
            continue
        k += 1
        n += nk
        dev += ak - n1k * m1k / nk
        vsum += n1k * (nk - n1k) * m1k * (nk - m1k) / (nk * nk * (nk - 1))
        dk = nk - n1k - m1k + ak
        orn += ak * dk / nk
        ordn += (n1k - ak) * (m1k - ak) / nk
    got = _rows(spark, sf_dir, "stat_cmh")
    if k == 0:
        assert got == []
        return
    (g,) = got
    assert (g["k"], g["n"], g["grand_median"]) == (k, n, gm)
    if vsum > 0:
        chi2 = dev * dev / vsum
        assert chi2 >= 0
        assert abs(g["chi2"] - chi2) <= 2e-6
    else:
        assert g["chi2"] is None
    if ordn > 0:
        assert abs(g["or_mh"] - orn / ordn) <= 2e-6
    else:
        assert g["or_mh"] is None


def test_chrf_python_replay_and_bounds(spark, sf_dir):
    """Counter-based pure-Python replay of the char n-gram clipping
    and the β = 2 combination; 0 ≤ chrF2 ≤ 1 always, and a pair whose
    sides are identical non-empty strings scores exactly 1."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 200")
        .select("doc_id", "text")
        .collect()
    )
    sides = {}
    for r in rows:
        s = r["text"].replace(" ", "")[:256]
        sides[(int(r["doc_id"]) // 2, int(r["doc_id"]) % 2)] = s
    got = {r["pair_id"]: r for r in _rows(spark, sf_dir, "llm_chrf")}
    checked = 0
    for pid in sorted({p for p, _ in sides}):
        if (pid, 0) not in sides or (pid, 1) not in sides:
            assert pid not in got
            continue
        ref, cand = sides[(pid, 0)], sides[(pid, 1)]
        ps, rs = [], []
        ms = []
        for n in (1, 2, 3):
            rg = Counter(ref[i : i + n] for i in range(len(ref) - n + 1))
            cg = Counter(cand[i : i + n] for i in range(len(cand) - n + 1))
            m = sum(min(c, rg[w]) for w, c in cg.items())
            ms.append(m)
            ps.append(m / sum(cg.values()) if cg else 0.0)
            rs.append(m / sum(rg.values()) if rg else 0.0)
        chrp, chrr = sum(ps) / 3.0, sum(rs) / 3.0
        chrf = (
            5.0 * chrp * chrr / (4.0 * chrp + chrr)
            if 4.0 * chrp + chrr > 0
            else 0.0
        )
        g = got[pid]
        assert (g["m1"], g["m2"], g["m3"]) == tuple(ms)
        assert -_EPS <= g["chrf2"] <= 1 + _EPS
        assert abs(g["chrf2"] - chrf) <= 2e-6
        if ref and ref == cand:
            assert abs(g["chrf2"] - 1.0) <= 2e-6
        checked += 1
    assert checked > 0


def _true_cdf(x):
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _true_ppf(p):
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if _true_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_norm_primitives_match_erf_reference(spark):
    """The shared cross-engine polynomials (functions.norm_cdf /
    norm_ppf) vs math.erf + bisection: |Phi err| <= 1e-7 and
    |Phi^-1 err| <= 1e-8 over a deterministic grid, INCLUDING the
    Acklam branch boundaries — validating the approximation itself,
    which engine-vs-engine hashing cannot see."""
    from pyspark.sql import functions as F2

    from etl_geonames_spark.functions import norm_cdf, norm_ppf

    xs = [i / 10.0 for i in range(-60, 61)]
    ps = [0.001, 0.01, 0.02425, 0.024251, 0.1, 0.3, 0.5, 0.7, 0.9,
          0.97574, 0.97575, 0.99, 0.999]
    df = spark.createDataFrame(
        [(x,) for x in xs], "x double"
    ).select("x", norm_cdf(F2.col("x")).alias("c"))
    for r in df.collect():
        assert abs(r["c"] - _true_cdf(r["x"])) <= 1e-7
    dfp = spark.createDataFrame(
        [(p,) for p in ps], "p double"
    ).select("p", norm_ppf(F2.col("p")).alias("q"))
    for r in dfp.collect():
        assert abs(r["q"] - _true_ppf(r["p"])) <= 1e-8


def test_lilliefors_python_replay(spark, sf_dir):
    """Replay D with the TRUE Phi (math.erf): the Hastings polynomial
    error (<= 7.5e-8) must not move the emitted grid statistic at the
    assertion tolerance. 0 <= D <= 1 by construction."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    vals = [
        int(r["n_chars"])
        for r in load_table(spark, sf_dir, "documents")
        .select("n_chars")
        .collect()
    ]
    got = _rows(spark, sf_dir, "stat_lilliefors")
    if not vals:
        assert got == []
        return
    (g,) = got
    n = len(vals)
    cnt = Counter(vals)
    sv, svv = sum(vals), sum(v * v for v in vals)
    mu = sv / n
    assert g["n"] == n
    assert abs(g["mean"] - mu) <= 2e-6
    if n < 4 or n * svv - sv * sv <= 0:
        assert g["sd"] is None and g["d_stat"] is None
        return
    sd = math.sqrt((n * svv - sv * sv) / (n * (n - 1)))
    assert abs(g["sd"] - sd) <= 2e-6
    cum = 0
    d = 0.0
    for v in sorted(cnt):
        lo = cum
        cum += cnt[v]
        ph = _true_cdf((v - mu) / sd)
        d = max(d, cum / n - ph, ph - lo / n)
    assert 0 <= d <= 1
    assert abs(g["d_stat"] - d) <= 2e-6


def test_fligner_killeen_python_replay(spark, sf_dir):
    """Replay with TRUE normal quantiles (bisection on math.erf):
    per-lang lower medians, pooled midranks of |x - med_g|, normal
    scores, chi2 = sum n_g(abar_g - abar)^2 / V; chi2 >= 0."""
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    got = _rows(spark, sf_dir, "stat_fligner_killeen")
    if not rows:
        assert got == []
        return
    per = defaultdict(list)
    for r in rows:
        per[r["lang"]].append(int(r["n_chars"]))
    devs = defaultdict(Counter)  # lang -> Counter of |x - med|
    for lang, xs in per.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1]
        for x in xs:
            devs[lang][abs(x - med)] += 1
    pooled = Counter()
    for c in devs.values():
        pooled.update(c)
    n = sum(pooled.values())
    mr = {}
    cum = 0
    for d in sorted(pooled):
        mr[d] = cum + (pooled[d] + 1) / 2.0
        cum += pooled[d]
    a = {d: _true_ppf(0.5 + r / (2.0 * (n + 1))) for d, r in mr.items()}
    s1 = sum(pooled[d] * a[d] for d in pooled)
    s2 = sum(pooled[d] * a[d] ** 2 for d in pooled)
    abar = s1 / n
    k = len(devs)
    (g,) = got
    assert (g["k"], g["n"], g["dof"]) == (k, n, k - 1)
    vv = (s2 - s1 * s1 / n) / (n - 1) if n >= 2 else 0.0
    if k < 2 or n < 2 or vv <= 0:
        assert g["chi2"] is None
        return
    st = sum(
        sum(c.values())
        * (sum(cc * a[d] for d, cc in c.items()) / sum(c.values()) - abar)
        ** 2
        for c in devs.values()
    )
    chi2 = st / vv
    assert chi2 >= 0
    assert abs(g["chi2"] - chi2) <= max(2e-5, 1e-5 * chi2)


def test_shapiro_francia_python_replay(spark, sf_dir):
    """Replay W' with TRUE Blom scores (bisection on math.erf) and
    Royston's z; 0 <= W' <= 1 by Cauchy-Schwarz."""
    from etl_geonames_spark.sources import load_table

    vals = sorted(
        int(r["n_chars"])
        for r in load_table(spark, sf_dir, "documents")
        .select("n_chars")
        .collect()
    )
    got = _rows(spark, sf_dir, "stat_shapiro_francia")
    if not vals:
        assert got == []
        return
    (g,) = got
    n = len(vals)
    assert g["n"] == n
    m = [_true_ppf((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)]
    xbar = sum(vals) / n
    sm = sum(m)
    num = sum(mi * x for mi, x in zip(m, vals)) - xbar * sm
    m2c = sum(mi * mi for mi in m) - sm * sm / n
    sxx = sum((x - xbar) ** 2 for x in vals)
    if n < 5 or m2c <= 0 or sxx <= 0:
        assert g["w_stat"] is None
        return
    w = num * num / (m2c * sxx)
    assert -_EPS <= w <= 1 + _EPS
    assert abs(g["w_stat"] - w) <= 2e-5
    if w < 1.0:
        u = math.log(n)
        mu_z = 1.0521 * (math.log(u) - u) - 1.2725
        sd_z = 1.0308 - 0.26758 * (math.log(u) + 2.0 / u)
        z = (math.log(1.0 - w) - mu_z) / sd_z
        assert abs(g["z_stat"] - z) <= max(2e-4, 1e-4 * abs(z))


def test_hellinger_python_replay_and_bounds(spark, sf_dir):
    """Counter replay of TVD/BC/Hellinger; identities: 0 ≤ TVD ≤ 1,
    0 ≤ BC ≤ 1, H² = 1 − BC, and H² ≤ TVD ≤ H·√(2 − H²) (the
    standard Hellinger-TVD sandwich)."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("n_chars", "lang")
        .collect()
    )
    got = _rows(spark, sf_dir, "stat_hellinger")
    if not rows:
        assert got == []
        return
    c1, c2 = Counter(), Counter()
    for r in rows:
        (c1 if r["lang"] == "en" else c2)[int(r["n_chars"])] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    (g,) = got
    assert (g["n1"], g["n2"]) == (n1, n2)
    tvd_num = sum(
        abs(c1[v] * n2 - c2[v] * n1) for v in set(c1) | set(c2)
    )
    assert g["tvd_num"] == tvd_num
    if n1 == 0 or n2 == 0:
        assert g["tvd"] is None and g["bc"] is None
        return
    tvd = tvd_num / (2.0 * n1 * n2)
    bc = sum(
        math.sqrt((c1[v] / n1) * (c2[v] / n2))
        for v in set(c1) | set(c2)
    )
    h = math.sqrt(max(0.0, 1.0 - bc))
    assert -_EPS <= tvd <= 1 + _EPS
    assert -_EPS <= bc <= 1 + _EPS
    assert abs(g["tvd"] - tvd) <= 2e-6
    assert abs(g["bc"] - bc) <= 2e-6
    assert abs(g["hellinger"] - h) <= 2e-6
    assert h * h <= tvd + 1e-9
    assert tvd <= h * math.sqrt(2.0 - h * h) + 1e-9


def test_mann_kendall_seasonal_python_replay(spark, sf_dir):
    """Exact integer replay of the within-season S and tie-corrected
    variance sums (day-of-week strata); consistency: |S'| is bounded
    by the total within-season pair count."""
    from collections import defaultdict

    from pyspark.sql import functions as F2

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F2.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    per = defaultdict(lambda: defaultdict(list))
    for r in rows:
        d = r["day"]
        per[r["event_type"]][d.weekday()].append((d, r["count"]))
    got = {
        r["event_type"]: r
        for r in _rows(spark, sf_dir, "stat_mann_kendall_seasonal")
    }
    checked = 0
    for et, seasons in per.items():
        s_tot = 0
        var = 0.0
        n = 0
        pairs = 0
        for xs in seasons.values():
            xs.sort()
            ng = len(xs)
            n += ng
            pairs += ng * (ng - 1) // 2
            for i in range(ng):
                for j in range(i + 1, ng):
                    d = xs[j][1] - xs[i][1]
                    s_tot += (d > 0) - (d < 0)
            from collections import Counter

            t = Counter(c for _, c in xs)
            tie = sum(v * (v - 1) * (2 * v + 5) for v in t.values())
            var += (ng * (ng - 1) * (2 * ng + 5) - tie) / 18.0
        g = got[et]
        assert (g["n"], g["n_seasons"], g["s_stat"]) == (
            n,
            len(seasons),
            s_tot,
        )
        assert abs(s_tot) <= pairs
        if var > 0:
            cc = (s_tot > 0) - (s_tot < 0)
            assert abs(g["z"] - (s_tot - cc) / math.sqrt(var)) <= 2e-6
        else:
            assert g["z"] is None
        checked += 1
    assert checked > 0


def test_d4_diversify_python_replay(spark, sf_dir):
    """Pure-Python third implementation of the full D4 pipeline —
    1-round k=32 k-means cells, SemDeDup survivor set (τ = 0.40),
    per-cell prototype direction, prototypicality ranking and the
    4·r > n_c keep rule — must match llm_d4_diversify row for row
    (vec_id, cluster, AND the emitted proto value on the qround
    grid). All folds run left-to-right like the engines'
    aggregate()/list_reduce forms."""
    import math

    from etl_geonames_spark.sources import load_table

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = sorted(
        (
            (int(r["vec_id"]), [float(v) for v in r["embedding"]])
            for r in load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
    )
    K, TAU = 32, 0.40

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = {vid: emb for vid, emb in rows if vid < K}

    def assign(c):
        out = {}
        for vid, emb in rows:
            best = min(c, key=lambda cl: (d2(emb, c[cl]), cl))
            out[vid] = best
        return out

    def update(a):
        sums, cnts = {}, {}
        for vid, emb in rows:
            cl = a[vid]
            if cl not in sums:
                sums[cl] = [0.0] * len(emb)
                cnts[cl] = 0
            cnts[cl] += 1
            for i, v in enumerate(emb):
                sums[cl][i] += v
        return {
            cl: [q6(s / cnts[cl]) for s in sums[cl]] for cl in sums
        }

    a1 = assign(update(assign(cents)))

    u = {
        vid: [x / max(math.sqrt(dot(emb, emb)), 1e-12) for x in emb]
        for vid, emb in rows
    }
    dropped = set()
    ids = [vid for vid, _ in rows]
    for i in ids:
        for j in ids:
            if i < j and a1[i] == a1[j] and q6(dot(u[i], u[j])) >= TAU:
                dropped.add(j)
    keep = [vid for vid in ids if vid not in dropped]

    proto = {}
    for cl in set(a1[v] for v in keep):
        members = [v for v in keep if a1[v] == cl]
        dim = len(u[members[0]])
        pd_ = []
        for i in range(dim):
            s = 0.0
            for v in members:
                s += u[v][i]
            pd_.append(q6(s / len(members)))
        proto[cl] = pd_
    scored = [(v, a1[v], q6(dot(u[v], proto[a1[v]]))) for v in keep]
    expect = {}
    for cl in proto:
        cell = sorted(
            [s for s in scored if s[1] == cl],
            key=lambda s: (-s[2], s[0]),
        )
        nc = len(cell)
        for r_, (v, _, p) in enumerate(cell, start=1):
            if 4 * r_ > nc:
                expect[v] = (cl, p)

    got = {
        int(r["vec_id"]): (int(r["cluster"]), float(r["proto"]))
        for r in _rows(spark, sf_dir, "llm_d4_diversify")
    }
    assert set(got) == set(expect)
    for v, (cl, p) in expect.items():
        assert got[v][0] == cl
        # avg-fold order in the engines' per-dim means is partial-
        # aggregate shaped; the qround grid absorbs it, so proto
        # values agree to one grid step
        assert abs(got[v][1] - p) <= 2e-6


def test_quality_classifier_python_replay(spark, sf_dir):
    """Pure-Python third implementation of the 2-round diagonal-IRLS
    logistic probe — hashed features, Gopher labels, exact-int round
    1, gridded sigmoid, exact-int round 2 — must match
    llm_quality_classifier EXACTLY on every column (the op's core
    claim is integer-exactness everywhere except the one gridded
    sigmoid, so no tolerance except one grid step on the emitted
    rounded doubles)."""
    import math
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    B, P = 32, 1_000_003
    STOP = {"the", "a", "an", "and", "of", "to", "in", "is", "it"}
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )

    def ph(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % P
        return h

    feats = {}
    labels = {}
    for r in rows:
        did = int(r["doc_id"])
        toks_all = r["text"].split(" ")
        toks = [w for w in toks_all if w != ""]
        c = Counter(ph(w) % B for w in toks)
        c[B] = 1  # intercept
        feats[did] = c
        n_words = len(toks_all)
        mean_wl = (len(r["text"]) - (n_words - 1)) / n_words
        alpha = sum(
            1 for w in toks_all if any(ch.isascii() and ch.isalpha() for ch in w)
        ) / n_words
        n_stop = sum(1 for w in toks_all if w in STOP)
        labels[did] = int(
            n_words >= 10
            and 2.0 <= mean_wl <= 12.0
            and alpha >= 0.7
            and n_stop >= 1
        )

    g1num = defaultdict(int)
    g1den = defaultdict(int)
    supp = defaultdict(int)
    for did, c in feats.items():
        y = labels[did]
        for d, x in c.items():
            supp[d] += x
            g1num[d] += x * (2 * y - 1)
            g1den[d] += x * x
    w1 = {d: (2 * g1num[d]) / g1den[d] for d in g1den}
    w1q = {d: math.floor(w1[d] * 1000000.0 + 0.5) for d in w1}

    pq = {}
    for did, c in feats.items():
        z = sum(x * w1q[d] for d, x in c.items())
        if z > 30_000_000:
            pq[did] = 1_000_000
        elif z < -30_000_000:
            pq[did] = 0
        else:
            pq[did] = math.floor(
                1000000.0 / (1.0 + math.exp(-(z / 1000000.0))) + 0.5
            )

    gnum = defaultdict(int)
    hden = defaultdict(int)
    for did, c in feats.items():
        y, p = labels[did], pq[did]
        h = math.floor(p * (1_000_000 - p) / 1000000.0)
        for d, x in c.items():
            gnum[d] += x * (1_000_000 * y - p)
            hden[d] += x * x * h

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    got = {
        int(r["dim"]): r
        for r in _rows(spark, sf_dir, "llm_quality_classifier")
    }
    assert set(got) == set(w1)
    for d in w1:
        g = got[d]
        assert g["support"] == supp[d]
        assert abs(g["w1"] - q6(w1[d])) <= 1.1e-6, (d, g["w1"], w1[d])
        w2 = (
            w1q[d] / 1000000.0 + gnum[d] / hden[d]
            if hden[d] > 0
            else w1q[d] / 1000000.0
        )
        assert abs(g["w2"] - q6(w2)) <= 1.1e-6, (d, g["w2"], w2)


def test_classifier_eval_counts_consistent(spark, sf_dir):
    """Cross-query consistency: the eval's confusion matrix must
    tile the corpus (tp+fp+tn+fn = n_docs) with the positive margin
    equal to llm_gopher_quality's pass count (tp+fn = #passes), and
    the emitted ratios must equal their count identities on the
    qround grid."""
    import math

    (r,) = _rows(spark, sf_dir, "llm_classifier_eval")
    gq = _rows(spark, sf_dir, "llm_gopher_quality")
    n_docs = len(gq)
    n_pass = sum(1 for g in gq if g["passes"])
    tp, fp, tn, fn = r["tp"], r["fp"], r["tn"], r["fn"]
    assert tp + fp + tn + fn == n_docs
    assert tp + fn == n_pass

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert r["accuracy"] == q6((tp + tn) / n_docs)
    if tp + fp > 0:
        assert r["prec"] == q6(tp / (tp + fp))
    else:
        assert r["prec"] is None
    if 2 * tp + fp + fn > 0:
        assert r["f1"] == q6(2 * tp / (2 * tp + fp + fn))


def test_jonckheere_python_replay(spark, sf_dir):
    """Brute-force JT replay: count pairwise (a < b) + half-ties over
    all cross-group pairs in lexicographic source order, plus the
    Hollander-Wolfe tie-corrected variance — must match the engine's
    grid form exactly (jt2, num4 are int64; z to one grid step)."""
    import math
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    )
    groups = sorted(set(r["source"] for r in rows))
    vals = {g: [int(r["n_chars"]) for r in rows if r["source"] == g]
            for g in groups}
    jt2 = 0
    for ii in range(len(groups)):
        for jj in range(ii + 1, len(groups)):
            for a in vals[groups[ii]]:
                for b in vals[groups[jj]]:
                    if a < b:
                        jt2 += 2
                    elif a == b:
                        jt2 += 1
    ns = [len(vals[g]) for g in groups]
    N = sum(ns)
    sn2 = sum(n * n for n in ns)
    t = Counter(int(r["n_chars"]) for r in rows)
    gA = sum(n * (n - 1) * (2 * n + 5) for n in ns)
    gB = sum(n * (n - 1) * (n - 2) for n in ns)
    gC = sum(n * (n - 1) for n in ns)
    tA = sum(c * (c - 1) * (2 * c + 5) for c in t.values())
    tB = sum(c * (c - 1) * (c - 2) for c in t.values())
    tC = sum(c * (c - 1) for c in t.values())
    var_jt = (
        float(N * (N - 1) * (2 * N + 5) - gA - tA) / 72.0
        + float(gB) * float(tB) / float(36 * N * (N - 1) * (N - 2))
        + float(gC) * float(tC) / float(8 * N * (N - 1))
    )
    num4 = 2 * jt2 - (N * N - sn2)

    (r,) = _rows(spark, sf_dir, "stat_jonckheere")
    assert r["n"] == N and r["k"] == len(groups)
    assert r["jt2"] == jt2
    assert r["num4"] == num4
    # bound: 0 <= JT2 <= N^2 - sum n_i^2, so |num4| <= N^2 - sum n_i^2
    assert 0 <= jt2 <= N * N - sn2
    if len(groups) >= 2 and var_jt > 0:
        want = math.floor(
            num4 / (4.0 * math.sqrt(var_jt)) * 1e6 + 0.5
        ) / 1e6
        assert abs(r["z"] - want) <= 1.1e-6
    else:
        assert r["z"] is None


def test_brunner_munzel_python_replay(spark, sf_dir):
    """From-scratch BM replay on raw midranks (no grid): pooled and
    within-sample midranks per observation, S_g^2 rank variances,
    p-hat / W / Welch df — must match the engine's value-grid form on
    the qround grid."""
    import math

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    g0 = sorted(int(r["n_chars"]) for r in rows if r["lang"] != "en")
    g1 = sorted(int(r["n_chars"]) for r in rows if r["lang"] == "en")
    pooled = sorted(g0 + g1)

    def midranks(vals, within):
        # midrank of each element of vals within the sorted list
        # `within` (1-based): count_less + (count_eq + 1) / 2
        import bisect

        out = []
        for v in vals:
            lo = bisect.bisect_left(within, v)
            hi = bisect.bisect_right(within, v)
            out.append(lo + (hi - lo + 1) / 2)
        return out

    n0, n1 = len(g0), len(g1)
    (r,) = _rows(spark, sf_dir, "stat_brunner_munzel")
    assert r["n0"] == n0 and r["n1"] == n1
    if n0 < 2 or n1 < 2:
        assert r["w_bm"] is None
        return
    pm0 = midranks(g0, pooled)
    pm1 = midranks(g1, pooled)
    wm0 = midranks(g0, g0)
    wm1 = midranks(g1, g1)
    rb0 = sum(pm0) / n0
    rb1 = sum(pm1) / n1
    s0 = sum(
        (pm0[i] - wm0[i] - rb0 + (n0 + 1) / 2) ** 2 for i in range(n0)
    ) / (n0 - 1)
    s1 = sum(
        (pm1[i] - wm1[i] - rb1 + (n1 + 1) / 2) ** 2 for i in range(n1)
    ) / (n1 - 1)
    N = n0 + n1
    p_hat = (rb1 - (n1 + 1) / 2) / n0
    var_w = n0 * s0 + n1 * s1
    w_bm = n0 * n1 * (rb1 - rb0) / (N * math.sqrt(var_w))
    df = var_w * var_w / (
        (n0 * s0) ** 2 / (n0 - 1) + (n1 * s1) ** 2 / (n1 - 1)
    )
    assert abs(r["p_hat"] - p_hat) <= 2e-6
    assert abs(r["w_bm"] - w_bm) <= 2e-6
    assert abs(r["df"] - df) <= max(2e-6, abs(df) * 1e-9)
    # relative-effect bound: p_hat in [0, 1]
    assert -1e-9 <= r["p_hat"] <= 1 + 1e-9


def test_ansari_bradley_python_replay(spark, sf_dir):
    """From-scratch AB replay with explicit per-position scores and
    tie-averaging (no closed forms): assign min(r, N+1-r) to every
    pooled position, average within tie runs, sum over the en group;
    conditional moments from the assigned scores. Must match the
    engine's closed-form grid on the qround grid — this is the test
    that would catch a peak-crossing tie-run mistake."""
    import math
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    data = sorted(
        (int(r["n_chars"]), 1 if r["lang"] == "en" else 0) for r in rows
    )
    N = len(data)
    scores = [min(r, N + 1 - r) for r in range(1, N + 1)]
    # average scores over tie runs
    runs = Counter(v for v, _ in data)
    assigned = {}
    pos = 0
    for v in sorted(runs):
        t = runs[v]
        assigned[v] = sum(scores[pos:pos + t]) / t
        pos += t
    ab = sum(assigned[v] for v, g in data if g == 1)
    n1 = sum(g for _, g in data)
    n0 = N - n1
    s_all = [assigned[v] for v, _ in data]
    e_ab = n1 * sum(s_all) / N
    var_ab = (
        n0 * n1
        * (N * sum(s * s for s in s_all) - sum(s_all) ** 2)
        / (N * N * (N - 1))
    ) if N > 1 else 0.0

    (r,) = _rows(spark, sf_dir, "stat_ansari_bradley")
    assert r["n0"] == n0 and r["n1"] == n1
    assert abs(r["ab"] - ab) <= 2e-6
    assert abs(r["e_ab"] - e_ab) <= 2e-6
    if n0 > 0 and n1 > 0 and N > 1 and var_ab > 0:
        want = (ab - e_ab) / math.sqrt(var_ab)
        assert abs(r["z"] - want) <= 2e-6
    else:
        assert r["z"] is None


def test_cointegration_python_replay(spark, sf_dir):
    """Pure-Python Engle-Granger replay: align the daily series on
    common days, OLS y~x, no-constant DF on the residuals — every
    pair's (b, gamma, t_stat) must match on the qround grid."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in dc:
        series[r["event_type"]][r["day"]] = float(r["count"])

    got = {
        (r["y_type"], r["x_type"]): r
        for r in _rows(spark, sf_dir, "ts_cointegration")
    }
    expect = {}
    types = sorted(series)
    for yt in types:
        for xt in types:
            if yt == xt:
                continue
            days = sorted(set(series[yt]) & set(series[xt]))
            n = len(days)
            if n < 6:
                continue
            vy = [series[yt][d] for d in days]
            vx = [series[xt][d] for d in days]
            sx = sum(vx)
            sy = sum(vy)
            sxx = sum(v * v for v in vx)
            sxy = sum(a * b for a, b in zip(vx, vy))
            detx = n * sxx - sx * sx
            if detx <= 0:
                continue
            b = (n * sxy - sx * sy) / detx
            a = (sy - b * sx) / n
            e = [vy[t] - a - b * vx[t] for t in range(n)]
            see = sum(e[t] * e[t] for t in range(n - 1))
            if see <= 0:
                continue
            sed = sum(e[t] * (e[t + 1] - e[t]) for t in range(n - 1))
            gam = sed / see
            rss = sum(
                (e[t + 1] - e[t] - gam * e[t]) ** 2 for t in range(n - 1)
            )
            t_stat = (
                gam / math.sqrt(rss / (n - 2) / see)
                if rss > 0 and n > 3
                else None
            )
            expect[(yt, xt)] = (n, b, gam, t_stat)

    assert set(got) == set(expect)
    for k, (n, b, gam, t_stat) in expect.items():
        g = got[k]
        assert g["n_days"] == n
        assert abs(g["b"] - b) <= 2e-6
        assert abs(g["gamma"] - gam) <= 2e-6
        if t_stat is None:
            assert g["t_stat"] is None
        else:
            assert abs(g["t_stat"] - t_stat) <= 2e-6


def test_rich_club_python_replay_and_bounds(spark, sf_dir):
    """From-scratch rich-club replay over the orders-derived graph,
    plus the structural bounds: rows2 is even (symmetrized list),
    phi in [0, 1], and both n_club and rows2 are non-increasing in
    k (clubs nest)."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    orows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .collect()
    )
    und = set()
    for r in orows:
        s = int(r["o_custkey"])
        t = (s * 7 + int(r["o_orderkey"]) * 3) % 2000
        if s != t:
            und.add((s, t))
            und.add((t, s))
    deg = defaultdict(int)
    for s, _ in und:
        deg[s] += 1

    got = {int(r["k"]): r for r in _rows(spark, sf_dir, "graph_rich_club")}
    assert set(got) == {1, 2, 4, 8, 16}
    prev_n, prev_r = None, None
    for k in (1, 2, 4, 8, 16):
        club = {v for v, d in deg.items() if d > k}
        rows2 = sum(1 for s, t in und if s in club and t in club)
        g = got[k]
        assert g["n_club"] == len(club)
        assert g["rows2"] == rows2
        assert rows2 % 2 == 0
        if len(club) >= 2:
            phi = rows2 / (len(club) * (len(club) - 1))
            assert abs(g["phi"] - math.floor(phi * 1e6 + 0.5) / 1e6) < 1e-12
            assert -1e-12 <= g["phi"] <= 1 + 1e-12
        else:
            assert g["phi"] is None
        if prev_n is not None:
            assert g["n_club"] <= prev_n and g["rows2"] <= prev_r
        prev_n, prev_r = g["n_club"], g["rows2"]


def test_phillips_perron_python_replay(spark, sf_dir):
    """Pure-Python PP replay: DF regression, Bartlett-weighted
    Newey-West long-run variance with the all-integer lag rule,
    Hamilton 17.6.6/17.6.8 corrections — per type, against the
    engine on the qround grid. Consistency: with white residuals
    (l2 == g0) z_tau reduces to the plain DF t-ratio."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in dc:
        series[r["event_type"]][r["day"]] = float(r["count"])

    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_phillips_perron")}
    expect = {}
    for et, sd in series.items():
        v = [sd[d] for d in sorted(sd)]
        n = len(v)
        if n < 6:
            continue
        m = n - 1
        x = v[:m]
        d = [v[t + 1] - v[t] for t in range(m)]
        sx, sdd = sum(x), sum(d)
        sxd = sum(a * b for a, b in zip(x, d))
        sxx = sum(a * a for a in x)
        det = m * sxx - sx * sx
        if det <= 0:
            continue
        gam = (m * sxd - sx * sdd) / det
        alpha = (sdd - gam * sx) / m
        ssx = det / m
        u = [d[t] - alpha - gam * x[t] for t in range(m)]
        su2 = sum(e * e for e in u)
        l = sum(1 for j in range(1, 129) if 256 * m >= 100 * j ** 4)
        gw = sum(
            (l + 1 - j) / (l + 1)
            * (sum(u[t] * u[t + j] for t in range(m - j)) if m > j else 0.0)
            for j in range(1, l + 1)
        )
        g0 = su2 / m
        l2 = su2 / m + 2.0 * gw / m
        row = {"n": n, "l": l, "gam": gam}
        if l2 > 0 and su2 > 0 and m > 2:
            s2 = su2 / (m - 2)
            se2 = s2 / ssx
            row["z_tau"] = (
                math.sqrt(g0 / l2) * (gam / math.sqrt(se2))
                - 0.5 * (l2 - g0) / math.sqrt(l2)
                * (m * math.sqrt(se2) / math.sqrt(s2))
            )
            row["z_rho"] = m * gam - 0.5 * (l2 - g0) * (m * m * se2 / s2)
            # white-residual consistency: if the NW correction is
            # zero, z_tau IS the DF t-ratio
            if abs(l2 - g0) < 1e-12:
                assert abs(row["z_tau"] - gam / math.sqrt(se2)) < 1e-9
        expect[et] = row

    assert set(got) == set(expect)
    for et, e in expect.items():
        g = got[et]
        assert g["n_days"] == e["n"] and g["lag_l"] == e["l"]
        assert abs(g["gamma"] - e["gam"]) <= 2e-6
        if "z_tau" in e:
            assert abs(g["z_tau"] - e["z_tau"]) <= 2e-6
            assert abs(g["z_rho"] - e["z_rho"]) <= max(2e-6, abs(e["z_rho"]) * 1e-9)
        else:
            assert g["z_tau"] is None


def test_quade_python_replay(spark, sf_dir):
    """From-scratch Quade replay with literal definitions (scipy's
    formulation): within-block midranks, block-range midrank weights,
    S_ij = Q_i*(r_ij - (k+1)/2), F = (n-1)B/(A-B) — must match the
    engine's quadrupled-integer form on the qround grid."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .count()
        .collect()
    )
    days = sorted(set(r["day"] for r in dc))
    types = sorted(set(r["event_type"] for r in dc))
    cnt = defaultdict(int)
    for r in dc:
        cnt[(r["day"], r["event_type"])] = int(r["count"])

    def midranks(vals):
        order = sorted(vals)
        return [
            (
                sum(1 for o in order if o < v)
                + (sum(1 for o in order if o == v) + 1) / 2
            )
            for v in vals
        ]

    n, k = len(days), len(types)
    r = {}
    D = []
    for d in days:
        row = [cnt[(d, t)] for t in types]
        mr = midranks(row)
        for j, t in enumerate(types):
            r[(d, t)] = mr[j]
        D.append(max(row) - min(row))
    Q = midranks(D)
    S = defaultdict(float)
    A = 0.0
    for i, d in enumerate(days):
        for t in types:
            sij = Q[i] * (r[(d, t)] - (k + 1) / 2)
            S[t] += sij
            A += sij * sij
    B = sum(v * v for v in S.values()) / n
    (row,) = _rows(spark, sf_dir, "stat_quade")
    assert row["n_blocks"] == n and row["k"] == k
    if A - B > 0:
        want = (n - 1) * B / (A - B)
        assert abs(row["quade_f"] - want) <= max(2e-6, want * 1e-9)
    else:
        assert row["quade_f"] is None


def test_fim_transform_python_replay(spark, sf_dir):
    """FIM replay: recompute the hash split points and both
    renderings in Python; also the reconstruction property — joining
    (prefix, middle, suffix) recovers the tokenized document."""
    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    got = {int(r["doc_id"]): r for r in _rows(spark, sf_dir, "llm_fim_transform")}
    P = 1_000_003
    assert set(got) == {int(r["doc_id"]) for r in rows}
    for r in rows:
        did = int(r["doc_id"])
        tk = [w for w in r["text"].split(" ") if w != ""]
        n = len(tk)
        p1 = (did * 2654435761 + 17) % P % (n + 1)
        p2 = p1 + (did * 48271 + 99991) % P % (n - p1 + 1)
        pre = " ".join(tk[:p1])
        mid = " ".join(tk[p1:p2])
        suf = " ".join(tk[p2:])
        g = got[did]
        assert g["p1"] == p1 and g["p2"] == p2
        assert g["psm"] == f"<PRE> {pre} <SUF> {suf} <MID> {mid}"
        assert g["spm"] == f"<PRE> <SUF> {suf} <MID> {pre} {mid}"
        # reconstruction: parts tile the document
        assert (pre + " " + mid + " " + suf).split() == tk


def test_pettitt_python_replay(spark, sf_dir):
    """Brute-force Pettitt replay from the DEFINITION (double sum of
    sgn over cross pairs at every split) — pins the rank identity
    U_t = t(n+1) - sum r2_i the engine uses, plus K/cp/p."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in dc:
        series[r["event_type"]][r["day"]] = int(r["count"])
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_pettitt_changepoint")}
    expect = {}
    for et, sd in series.items():
        v = [sd[d] for d in sorted(sd)]
        n = len(v)
        if n < 2:
            continue
        us = []
        for t in range(1, n):
            u = sum(
                (v[j] > v[i]) - (v[j] < v[i])
                for i in range(t)
                for j in range(t, n)
            )
            us.append(u)
        k = max(abs(u) for u in us)
        cp = next(i + 1 for i, u in enumerate(us) if abs(u) == k)
        p = min(1.0, 2.0 * math.exp(-(6.0 * k * k) / (n**3 + n**2)))
        expect[et] = (n, k, cp, p)
    assert set(got) == set(expect)
    for et, (n, k, cp, p) in expect.items():
        g = got[et]
        assert g["n_days"] == n and g["k_stat"] == k
        assert g["cp_index"] == cp
        assert abs(g["p_value"] - p) <= 2e-6


def test_source_winrate_complementarity_and_replay(spark, sf_dir):
    """winrate(a,b) + winrate(b,a) must equal 1 EXACTLY in the
    integer domain (W2(a,b) + W2(b,a) = 2 n_a n_b), and a brute-force
    pair count over the qround'd scores must reproduce every W2."""
    from collections import defaultdict

    rows = _rows(spark, sf_dir, "llm_source_winrate")
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    for (sa, sb), r in got.items():
        mirror = got[(sb, sa)]
        assert r["w2"] + mirror["w2"] == 2 * r["n_a"] * r["n_b"]
        assert r["n_a"] == mirror["n_b"] and r["n_b"] == mirror["n_a"]

    qs = _rows(spark, sf_dir, "llm_quality_score")
    from etl_geonames_spark.sources import load_table

    src_of = {
        int(d["doc_id"]): d["source"]
        for d in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    by_src = defaultdict(list)
    for q in qs:
        by_src[src_of[int(q["doc_id"])]].append(q["quality"])
    for (sa, sb), r in got.items():
        w2 = 0
        for x in by_src[sa]:
            for y in by_src[sb]:
                if x > y:
                    w2 += 2
                elif x == y:
                    w2 += 1
        assert r["w2"] == w2, (sa, sb)
        assert r["n_a"] == len(by_src[sa])


def test_modularity_python_replay_and_bounds(spark, sf_dir):
    """From-scratch modularity replay over the orders-derived graph
    with 3-round min-label propagation; bound |Q| <= 1 and the exact
    integer identity Q_num = 2m*W - sum D_c^2."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    orows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .collect()
    )
    und = set()
    for r in orows:
        s = int(r["o_custkey"])
        t = (s * 7 + int(r["o_orderkey"]) * 3) % 2000
        und.add((s, t))
        und.add((t, s))
    nodes = sorted(set(s for s, _ in und))
    label = {v: v for v in nodes}
    adj = defaultdict(list)
    for s, t in und:
        adj[s].append(t)
    for _ in range(3):
        new = {}
        for v in nodes:
            cand = [label[u] for u in adj[v]]
            new[v] = min([label[v]] + cand)
        label = new
    m2 = len(und)
    w = sum(1 for s, t in und if label[s] == label[t])
    deg = defaultdict(int)
    for s, _ in und:
        deg[s] += 1
    dcsum = defaultdict(int)
    for v in nodes:
        dcsum[label[v]] += deg[v]
    sd2 = sum(d * d for d in dcsum.values())
    q_num = m2 * w - sd2
    q = q_num / (m2 * m2)
    (r,) = _rows(spark, sf_dir, "graph_modularity")
    assert r["m2"] == m2 and r["w"] == w
    assert r["n_comm"] == len(set(label.values()))
    assert r["q_num"] == q_num
    assert abs(r["modularity"] - math.floor(q * 1e6 + 0.5) / 1e6) < 1e-12
    assert -1 - 1e-9 <= r["modularity"] <= 1 + 1e-9


def test_char_entropy_python_replay(spark, sf_dir):
    """Replay H = ln L - (sum c ln c)/L per doc from raw text; bound
    0 <= H <= ln(n_distinct)."""
    import math
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    got = {int(r["doc_id"]): r for r in _rows(spark, sf_dir, "llm_char_entropy_gate")}
    for r in rows:
        did = int(r["doc_id"])
        text = r["text"]
        g = got[did]
        assert g["n_chars"] == len(text)
        if len(text) == 0:
            assert g["char_entropy"] is None
            continue
        c = Counter(text)
        h = math.log(len(text)) - sum(
            n * math.log(n) for n in c.values()
        ) / len(text)
        hq = math.floor(h * 1e6 + 0.5) / 1e6
        assert abs(g["char_entropy"] - hq) <= 1.1e-6
        assert g["n_distinct"] == len(c)
        assert -1e-9 <= h <= math.log(len(c)) + 1e-9
        assert g["flag_low"] == bool(g["char_entropy"] < 1.5)
        assert g["flag_high"] == bool(g["char_entropy"] > 4.5)


def test_lsh_pr_eval_python_replay(spark, sf_dir):
    """Brute-force replay of BOTH sides of the evaluation: exact
    hashed-shingle Jaccard ground truth (3i >= na+nb) and the
    4-perm/2-band candidate generation — tp/fp/fn must match
    exactly. Also LSH soundness: identical shingle sets are ALWAYS
    candidates (identical signatures share every bucket)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    P = 1_000_003
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 200")
        .select("doc_id", "text")
        .collect()
    )

    def ph(s):
        h = 0
        for c in s:
            h = (h * 31 + ord(c)) % P
        return h

    sets = {}
    for r in rows:
        tk = r["text"].split(" ")
        grams = {
            " ".join(tk[i:i + 3]) for i in range(len(tk) - 2)
        } if len(tk) >= 3 else set()
        if grams:
            sets[int(r["doc_id"])] = {ph(g) for g in grams}
    ids = sorted(sets)
    gt = set()
    for i_, a in enumerate(ids):
        for b in ids[i_ + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and 3 * inter >= len(sets[a]) + len(sets[b]):
                gt.add((a, b))
    # signatures
    perms = [(2 * i * P + 1, i * 998_244_353 + 12_345) for i in range(4)]
    sig = {
        d: [min((a * x + b) % 2147483647 for x in s) for a, b in perms]
        for d, s in sets.items()
    }
    buckets = defaultdict(set)
    for d, sg in sig.items():
        for band in range(2):
            buckets[(band, sg[2 * band], sg[2 * band + 1])].add(d)
    cand = set()
    for mem in buckets.values():
        ms = sorted(mem)
        for i_, a in enumerate(ms):
            for b in ms[i_ + 1:]:
                cand.add((a, b))
    for a in ids:
        for b in ids:
            if a < b and sets[a] == sets[b]:
                assert (a, b) in cand  # identical sets always collide
    tp = len(gt & cand)
    fp = len(cand - gt)
    fn = len(gt - cand)
    (r,) = _rows(spark, sf_dir, "llm_lsh_pr_eval")
    assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)


def test_record_counts_python_replay(spark, sf_dir):
    """Replay records directly (running extremes) plus the harmonic
    expectation/variance; bound 1 <= U, L <= n."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in dc:
        series[r["event_type"]][r["day"]] = int(r["count"])
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_record_counts")}
    for et, sd in series.items():
        v = [sd[d] for d in sorted(sd)]
        n = len(v)
        if n < 2:
            assert et not in got
            continue
        u = l = 1
        mx = mn = v[0]
        for x in v[1:]:
            if x > mx:
                u += 1
                mx = x
            if x < mn:
                l += 1
                mn = x
        h_n = sum(1.0 / k for k in range(1, n + 1))
        var_d = sum(2.0 / k for k in range(2, n + 1))
        g = got[et]
        assert g["u_rec"] == u and g["l_rec"] == l
        assert 1 <= u <= n and 1 <= l <= n
        assert g["d_stat"] == u - l
        assert abs(g["e_records"] - h_n) <= 2e-6
        if var_d > 0:
            assert abs(g["z"] - (u - l) / math.sqrt(var_d)) <= 2e-6


def test_df_prune_python_replay(spark, sf_dir):
    """Replay the df-band prune per doc; bounds 0 <= kept <= tokens,
    and a word-level spot check that both predicates act."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    docs = {
        int(r["doc_id"]): [w for w in r["text"].split(" ") if w != ""]
        for r in rows
    }
    dfreq = defaultdict(set)
    for did, tk in docs.items():
        for w in tk:
            dfreq[w].add(did)
    n = len([d for d, tk in docs.items() if tk])
    got = {int(r["doc_id"]): r for r in _rows(spark, sf_dir, "llm_df_prune")}
    assert set(got) == {d for d, tk in docs.items() if tk}
    for did, tk in docs.items():
        if not tk:
            continue
        kept = sum(
            1
            for w in tk
            if not (2 * len(dfreq[w]) > n or len(dfreq[w]) == 1)
        )
        g = got[did]
        assert g["n_tokens"] == len(tk)
        assert g["n_kept"] == kept
        assert 0 <= kept <= len(tk)


def test_ewma_chart_python_replay(spark, sf_dir):
    """Sequential EWMA replay with the time-varying limits; also the
    steady-state property: the limit factor sqrt(1-(1-l)^2t) is
    monotone increasing toward 1."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in dc:
        series[r["event_type"]][r["day"]] = int(r["count"])
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "ts_spc_ewma_chart")}
    for et, sd in series.items():
        v = [sd[d] for d in sorted(sd)]
        n = len(v)
        s1, s2 = sum(v), sum(x * x for x in v)
        if n < 2 or n * s2 - s1 * s1 <= 0:
            assert et not in got
            continue
        mu = s1 / n
        sig = math.sqrt((n * s2 - s1 * s1) / (n * n * (n - 1)))
        z, viol, fpow = mu, 0, 1.0
        prev_lim = 0.0
        for x in v:
            z = 0.2 * x + 0.8 * z
            fpow *= 0.64
            lim = 3.0 * sig * math.sqrt(0.2 / 1.8 * (1.0 - fpow))
            assert lim >= prev_lim - 1e-12  # monotone toward steady state
            prev_lim = lim
            if abs(z - mu) > lim:
                viol += 1
        g = got[et]
        assert g["n_days"] == n
        assert g["n_violations"] == viol
        assert abs(g["ewma_final"] - math.floor(z * 1e6 + 0.5) / 1e6) <= 1.1e-6
        assert abs(g["mean_c"] - mu) <= 2e-6
        assert abs(g["sigma_c"] - sig) <= 2e-6


def test_unigram_em_round_python_replay(spark, sf_dir):
    """llm_unigram_em_round equals a from-scratch Python replay of
    the whole pipeline — seed census, vocab selection, and the
    forward-backward lattice in the SAME IEEE op order (Python floats
    are doubles; explicit loops reproduce the sorted-fold addition
    sequence bit-for-bit, so new_count_e9 must match EXACTLY, not to
    a tolerance). Also pins the posterior-mass invariant the EM
    construction guarantees: per word, the gridded posteriors of
    edges leaving boundary 0 sum to 1e9 within per-edge rounding."""
    import math
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    MAXW, MAXT, TOPK = 10, 4, 48
    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    wf = Counter(
        w
        for t in texts
        for w in t.split(" ")
        if w != "" and len(w) <= MAXW
    )
    cand = Counter()
    for w, f in wf.items():
        for j in range(len(w)):
            for l in range(1, min(MAXT, len(w) - j) + 1):
                cand[w[j : j + l]] += f
    vocab = {s: c for s, c in cand.items() if len(s) == 1}
    multis = sorted(
        ((s, c) for s, c in cand.items() if len(s) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:TOPK]
    vocab.update(dict(multis))
    C = sum(vocab.values())
    p = {s: c / C for s, c in vocab.items()}
    newc = defaultdict(int)
    mass_lo = True
    for w, f in wf.items():
        L = len(w)
        edges = [
            (j + l, j, w[j : j + l])
            for j in range(L)
            for l in range(1, min(MAXT, L - j) + 1)
            if w[j : j + l] in p
        ]
        ef = sorted(edges)  # (i asc, j asc)
        eb = sorted(edges, key=lambda e: (-e[1], -e[0]))  # j desc, i desc
        al = [1.0] + [0.0] * L
        for i, j, s in ef:
            al[i] = al[i] + al[j] * p[s]
        be = [0.0] * L + [1.0]
        for i, j, s in eb:
            be[j] = be[j] + be[i] * p[s]
        start_mass = 0
        for i, j, s in ef:
            e9 = math.floor(((al[j] * p[s]) * be[i]) / al[L] * 1e9 + 0.5)
            newc[s] += f * e9
            if j == 0:
                start_mass += e9
        # boundary-mass invariant: paths out of 0 carry posterior 1
        assert abs(start_mass - 1_000_000_000) <= len(ef)
    got = {
        r["token"]: (r["seed_count"], r["new_count_e9"])
        for r in _rows(spark, sf_dir, "llm_unigram_em_round")
    }
    assert set(got) == set(vocab)
    for s in vocab:
        assert got[s] == (vocab[s], newc[s]), (s, got[s], vocab[s], newc[s])


def test_renyi_efficiency_bounds_and_replay(spark, sf_dir):
    """llm_renyi_efficiency: the emitted integers are a SUFFICIENT
    STATISTIC — renyi2 must equal qround(2·ln C − ln Σc², 6)
    recomputed in Python from the emitted counts, and collision
    entropy is bounded by the uniform maximum: 0 ≤ H₂ ≤ ln V, so
    efficiency ∈ [0, 1]."""
    import math

    (r,) = _rows(spark, sf_dir, "llm_renyi_efficiency")
    C, V, S2 = r["n_tokens"], r["vocab_size"], r["sum_sq"]
    assert S2 >= C  # sum c^2 >= sum c for integer counts
    want = math.floor(
        (2 * math.log(float(C)) - math.log(float(S2))) * 1e6 + 0.5
    ) / 1e6
    assert r["renyi2"] == want
    assert 0 <= r["renyi2"] <= math.log(V) + 1e-6
    assert 0 <= r["efficiency"] <= 1


def test_unigram_viterbi_python_replay(spark, sf_dir):
    """llm_unigram_viterbi_apply equals a from-scratch Python replay:
    flog2 recomputed by the same normalize + square-and-shift integer
    folds, the DP by the same sorted-edge strict-> updates — integer
    end-to-end, so viterbi_count must match EXACTLY. Also pins the
    tiling invariant (chosen pieces concatenate back to each word)
    and flog2's defining bound 2^16·log2 c − 1 < flog2(c) ≤
    2^16·log2 c."""
    import math
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    MAXW, MAXT, TOPK, B = 10, 4, 48, 16

    def flog2(c):
        y, e = c, 30
        for _ in range(63):
            if y >= 1 << 31:
                y, e = y >> 1, e + 1
            elif y < 1 << 30:
                y, e = y << 1, e - 1
        acc = 0
        for _ in range(B):
            y = (y * y) >> 30
            if y >= 1 << 31:
                y, acc = y >> 1, acc * 2 + 1
            else:
                acc = acc * 2
        return e * (1 << B) + acc

    for c in (1, 2, 3, 7, 1000, 12949, (1 << 31) + 12345):
        got = flog2(c)
        exact = (1 << B) * math.log2(c)
        assert exact - 1 < got <= exact + 1e-6, (c, got, exact)

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    wf = Counter(
        w
        for t in texts
        for w in t.split(" ")
        if w != "" and len(w) <= MAXW
    )
    cand = Counter()
    for w, f in wf.items():
        for j in range(len(w)):
            for l in range(1, min(MAXT, len(w) - j) + 1):
                cand[w[j : j + l]] += f
    vocab = {s: c for s, c in cand.items() if len(s) == 1}
    vocab.update(
        dict(
            sorted(
                ((s, c) for s, c in cand.items() if len(s) > 1),
                key=lambda x: (-x[1], x[0]),
            )[:TOPK]
        )
    )
    C = sum(vocab.values())
    fC = flog2(C)
    wgt = {s: flog2(c) - fC for s, c in vocab.items()}
    vit = defaultdict(int)
    for w, f in wf.items():
        L = len(w)
        edges = sorted(
            (j + l, j, wgt[w[j : j + l]])
            for j in range(L)
            for l in range(1, min(MAXT, L - j) + 1)
            if w[j : j + l] in wgt
        )
        best = [0] + [-(1 << 40)] * L
        bp = [0] * (L + 1)
        for i, j, g in edges:
            if best[j] + g > best[i]:
                best[i], bp[i] = best[j] + g, j
        chain, pos = [L], L
        while pos > 0:
            pos = bp[pos]
            chain.insert(0, pos)
        pieces = [
            w[chain[k] : chain[k + 1]] for k in range(len(chain) - 1)
        ]
        assert "".join(pieces) == w  # tiling invariant
        for s in pieces:
            vit[s] += f
    got = {
        r["token"]: (r["seed_count"], r["viterbi_count"])
        for r in _rows(spark, sf_dir, "llm_unigram_viterbi_apply")
    }
    assert set(got) == set(vocab)
    for s in vocab:
        assert got[s] == (vocab[s], vit[s]), (s, got[s], vocab[s], vit[s])


def test_unigram_prune_python_replay(spark, sf_dir):
    """llm_unigram_prune equals a from-scratch Python replay of the
    SentencePiece prune rule: per multi-char piece, alt = best
    re-segmentation score of the piece ITSELF without its full-span
    edge (same flog2 grid, same sorted strict-> DP), loss = vfreq ·
    (wgt − alt), pruned = bottom n//5 by (loss, token). Also pins the
    invariants alt ≤ wgt is NOT required (a composable piece can be
    beaten by its parts) but alt > _VIT_NEG always (single-char
    coverage guarantees a path), and |pruned| == n_multis // 5."""
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    MAXW, MAXT, TOPK, B = 10, 4, 48, 16

    def flog2(c):
        y, e = c, 30
        for _ in range(63):
            if y >= 1 << 31:
                y, e = y >> 1, e + 1
            elif y < 1 << 30:
                y, e = y << 1, e - 1
        acc = 0
        for _ in range(B):
            y = (y * y) >> 30
            if y >= 1 << 31:
                y, acc = y >> 1, acc * 2 + 1
            else:
                acc = acc * 2
        return e * (1 << B) + acc

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    wf = Counter(
        w
        for t in texts
        for w in t.split(" ")
        if w != "" and len(w) <= MAXW
    )
    cand = Counter()
    for w, f in wf.items():
        for j in range(len(w)):
            for l in range(1, min(MAXT, len(w) - j) + 1):
                cand[w[j : j + l]] += f
    vocab = {s: c for s, c in cand.items() if len(s) == 1}
    vocab.update(
        dict(
            sorted(
                ((s, c) for s, c in cand.items() if len(s) > 1),
                key=lambda x: (-x[1], x[0]),
            )[:TOPK]
        )
    )
    C = sum(vocab.values())
    fC = flog2(C)
    wgt = {s: flog2(c) - fC for s, c in vocab.items()}

    def viterbi_best(w, skip_full):
        L = len(w)
        edges = sorted(
            (j + l, j, wgt[w[j : j + l]])
            for j in range(L)
            for l in range(1, min(MAXT, L - j) + 1)
            if w[j : j + l] in wgt
            and not (skip_full and j == 0 and l == L)
        )
        best = [0] + [-(1 << 40)] * L
        bp = [0] * (L + 1)
        for i, j, g in edges:
            if best[j] + g > best[i]:
                best[i], bp[i] = best[j] + g, j
        return best, bp

    vit = defaultdict(int)
    for w, f in wf.items():
        _best, bp = viterbi_best(w, skip_full=False)
        chain, pos = [len(w)], len(w)
        while pos > 0:
            pos = bp[pos]
            chain.insert(0, pos)
        for k in range(len(chain) - 1):
            vit[w[chain[k] : chain[k + 1]]] += f

    multis = sorted(s for s in vocab if len(s) > 1)
    want = {}
    for s in multis:
        alt = viterbi_best(s, skip_full=True)[0][len(s)]
        assert alt > -(1 << 40)
        want[s] = (vit[s], wgt[s], alt, vit[s] * (wgt[s] - alt))
    losses = sorted((want[s][3], s) for s in multis)
    k = len(multis) // 5
    cut = {s for _l, s in losses[:k]}

    got = {
        r["token"]: (
            r["viterbi_count"],
            r["piece_wgt"],
            r["alt_score"],
            r["loss"],
            r["pruned"],
        )
        for r in _rows(spark, sf_dir, "llm_unigram_prune")
    }
    assert set(got) == set(multis)
    for s in multis:
        assert got[s] == (*want[s], int(s in cut)), (s, got[s], want[s])
    assert sum(v[4] for v in got.values()) == k


def test_betweenness_pivots_python_replay(spark, sf_dir):
    """graph_betweenness_pivots equals a from-scratch Python replay
    of Brandes' dependency accumulation from the same hash-chosen
    pivots, truncated at depth 3: sigma and stress must match as
    EXACT integers; betweenness must match to the 1e-9 emit grid with
    the replay folding successor terms in the same w-sorted order.
    Also pins stress(v) = exact count of depth-bounded shortest paths
    through v (brute-force path enumeration on the sf0.001 graph
    would be slow — the recursion identity psi(v) = sum(1+psi(w)) IS
    the definition, so the replay recomputes it independently)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    MULT, HMOD, K, DEPTH = 2654435761, 1000003, 16, 3

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    ).collect()
    adj = defaultdict(set)
    for r in orders:
        s = r["o_custkey"]
        t = (r["o_custkey"] * 7 + r["o_orderkey"] * 3) % 2000
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    pivots = [
        v
        for _h, v in sorted(
            ((v * MULT) % HMOD, v) for v in adj
        )[:K]
    ]
    assert pivots, "fixture must yield at least one pivot"

    n_piv = defaultdict(int)
    stress = defaultdict(int)
    deps = defaultdict(list)  # v -> [(p, delta)]
    for p in pivots:
        dist = {p: 0}
        sigma = {p: 1}
        frontier = [p]
        order = []
        for d in range(1, DEPTH + 1):
            nxt = defaultdict(int)
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] += sigma[v]
            for w, sg in nxt.items():
                dist[w], sigma[w] = d, sg
            frontier = sorted(nxt)
            order.append(frontier)
        delta = defaultdict(float)
        psi = defaultdict(int)
        for d in range(DEPTH - 1, 0, -1):
            for v in order[d - 1]:
                succs = sorted(
                    w
                    for w in adj[v]
                    if dist.get(w, -1) == d + 1
                )
                acc = 0.0
                for w in succs:
                    acc += (sigma[v] / sigma[w]) * (1.0 + delta[w])
                    psi[v] += 1 + psi[w]
                delta[v] = acc
        for lvl in order:
            for v in lvl:
                n_piv[v] += 1
                stress[v] += sigma[v] * psi[v]
                deps[v].append((p, delta[v]))

    want_btw = {}
    for v, terms in deps.items():
        acc = 0.0
        for _p, dl in sorted(terms):
            acc += dl
        import math

        want_btw[v] = math.floor(acc * 1e9 + 0.5) / 1e9

    got = {
        r["node"]: (r["n_pivots"], r["stress"], r["betweenness"])
        for r in _rows(spark, sf_dir, "graph_betweenness_pivots")
    }
    assert set(got) == set(n_piv)
    for v in n_piv:
        assert got[v][0] == n_piv[v], (v, got[v], n_piv[v])
        assert got[v][1] == stress[v], (v, got[v], stress[v])
        assert abs(got[v][2] - want_btw[v]) < 2e-9, (
            v,
            got[v][2],
            want_btw[v],
        )
    # endpoint exclusion: a pivot only appears via OTHER pivots
    for p in pivots:
        assert got.get(p, (0,))[0] <= max(0, len(pivots) - 1)


def test_ktruss_peel_python_replay(spark, sf_dir):
    """graph_ktruss_peel equals a from-scratch Python replay of the
    2-round K=4 support peel; also pins the monotonicity invariants
    support_final <= support0 (peeling only removes triangles) and
    in_truss = 1 => support0 >= 2 (a survivor passed round 0)."""
    from collections import Counter

    from etl_geonames_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    ).collect()
    edges = set()
    for r in orders:
        s = r["o_custkey"]
        t = (r["o_custkey"] * 7 + r["o_orderkey"] * 3) % 2000
        if s != t:
            edges.add((min(s, t), max(s, t)))

    def support(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
        sup = Counter()
        for a, b in es:
            for c in adj.get(b, ()):
                if (a, c) in es:
                    sup[(a, b)] += 1
                    sup[(b, c)] += 1
                    sup[(a, c)] += 1
        return sup

    sup0 = support(edges)
    e = {k for k, v in sup0.items() if v >= 2}
    e = {k for k, v in support(e).items() if v >= 2}
    supf = support(e)

    got = {
        (r["s"], r["t"]): (
            r["support0"],
            r["in_truss"],
            r["support_final"],
        )
        for r in _rows(spark, sf_dir, "graph_ktruss_peel")
    }
    assert set(got) == set(sup0)
    for k in sup0:
        want = (sup0[k], int(k in e), supf.get(k, 0) if k in e else 0)
        assert got[k] == want, (k, got[k], want)
        assert got[k][2] <= got[k][0]
        if got[k][1] == 1:
            assert got[k][0] >= 2


def test_dtw_pairs_python_replay_and_bounds(spark, sf_dir):
    """ts_dtw_pairs equals a from-scratch Python DP replay (integer
    end-to-end, so EXACT); also pins the diagonal upper bound
    DTW(a,b) ≤ Σ|a_i − b_i| for equal-length series and DTW ≥ 0."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in daily:
        series[r["event_type"]][r["day"]] = r["count"]
    vecs = {
        t: [c for _d, c in sorted(d.items())] for t, d in series.items()
    }

    def dtw(a, b):
        INF = 1 << 40
        prev = [0] + [INF] * len(b)
        for x in a:
            cur = [INF]
            for j, y in enumerate(b, start=1):
                cur.append(
                    abs(x - y) + min(prev[j], prev[j - 1], cur[j - 1])
                )
            prev = cur
        return prev[len(b)]

    got = {
        (r["type_a"], r["type_b"]): (r["dtw"], r["n_a"], r["n_b"])
        for r in _rows(spark, sf_dir, "ts_dtw_pairs")
    }
    types = sorted(vecs)
    want_pairs = {
        (ta, tb) for ta in types for tb in types if ta < tb
    }
    assert set(got) == want_pairs
    for ta, tb in want_pairs:
        a, b = vecs[ta], vecs[tb]
        d = dtw(a, b)
        assert got[(ta, tb)] == (d, len(a), len(b))
        assert d >= 0
        if len(a) == len(b):
            assert d <= sum(abs(x - y) for x, y in zip(a, b))


def test_deterministic_walks_python_replay(spark, sf_dir):
    """graph_deterministic_walks equals a from-scratch Python replay
    of the argmin-hash transition; every step of every walk is a real
    edge and every node starts exactly one walk."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table

    HA, HB, HP = 2654435761, 40503, 1000003

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    ).collect()
    adj = defaultdict(set)
    for r in orders:
        s = r["o_custkey"]
        t = (r["o_custkey"] * 7 + r["o_orderkey"] * 3) % 2000
        if s != t:
            adj[s].add(t)
            adj[t].add(s)

    def nxt(u, t):
        return min(
            adj[u],
            key=lambda w: ((u * HA + w * HB + t * 97) % HP) * 100000 + w,
        )

    want = {}
    for v in adj:
        walk = [v]
        for t in range(1, 5):
            walk.append(nxt(walk[-1], t))
        want[v] = ",".join(str(x) for x in walk)

    got = {
        r["start"]: (r["walk"], r["end_node"])
        for r in _rows(spark, sf_dir, "graph_deterministic_walks")
    }
    assert set(got) == set(want)
    for v, w in want.items():
        assert got[v] == (w, int(w.split(",")[-1])), (v, got[v], w)
        steps = [int(x) for x in w.split(",")]
        for a, b in zip(steps, steps[1:]):
            assert b in adj[a]


def test_bowtie_census_python_replay(spark, sf_dir):
    """graph_bowtie_census equals a from-scratch Python replay of the
    4+4 FW-BW min-label rounds, largest-certified-cell core pick, and
    3 set-BFS reach rounds; also pins the tiling invariant (census
    sums to |V|) and CORE ⊆ both reach sets."""
    from collections import Counter, defaultdict

    from etl_geonames_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    ).collect()
    fwd = defaultdict(set)
    rev = defaultdict(set)
    nodes = set()
    for r in orders:
        s = r["o_custkey"]
        t = (r["o_custkey"] * 7 + r["o_orderkey"] * 3) % 2000
        fwd[s].add(t)
        rev[t].add(s)
        nodes.add(s)
        nodes.add(t)

    def labels(adj_in):
        lab = {v: v for v in nodes}
        for _ in range(4):
            nxt = dict(lab)
            for v in nodes:
                for u in adj_in.get(v, ()):
                    if lab[u] < nxt[v]:
                        nxt[v] = lab[u]
            lab = nxt
        return lab

    fl = labels(rev)  # min id that REACHES v: propagate down edges
    bl = labels(fwd)  # min id v reaches: propagate up edges
    cert = Counter(
        fl[v] for v in nodes if fl[v] == bl[v]
    )
    c = min(cert, key=lambda k: (-cert[k], k))
    core = {v for v in nodes if fl[v] == c and bl[v] == c}

    def reach(adj):
        r = set(core)
        for _ in range(3):
            r = r | {w for v in r for w in adj.get(v, ())}
        return r

    fr, bq = reach(fwd), reach(rev)
    want = Counter()
    for v in nodes:
        if v in core:
            want["CORE"] += 1
        elif v in fr and v in bq:
            want["BOTH"] += 1
        elif v in bq:
            want["IN"] += 1
        elif v in fr:
            want["OUT"] += 1
        else:
            want["DISCONNECTED"] += 1

    got = {
        r["component"]: r["n_nodes"]
        for r in _rows(spark, sf_dir, "graph_bowtie_census")
    }
    assert got == dict(want), (got, dict(want))
    assert sum(got.values()) == len(nodes)
    assert core <= fr and core <= bq


def test_kcenter_coreset_python_replay(spark, sf_dir):
    """llm_kcenter_coreset equals a from-scratch greedy replay on the
    quantized grid; pins the covering-radius monotonicity (d2_sel
    non-increasing after the seed) and the Gonzalez invariant that
    every selection is a true farthest point at its step."""
    from etl_geonames_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    q = {
        r["vec_id"]: [
            int(__import__("math").floor(float(x) * 100 + 0.5))
            for x in r["embedding"]
        ]
        for r in emb
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = min(q)
    sel = [(1, seed, 0)]
    mind = {v: d2(q[v], q[seed]) for v in q}
    for r in range(2, 9):
        pick = min(mind, key=lambda v: (-mind[v], v))
        sel.append((r, pick, mind[pick]))
        for v in q:
            dv = d2(q[v], q[pick])
            if dv < mind[v]:
                mind[v] = dv

    got = sorted(
        (r["sel_order"], r["vec_id"], r["d2_sel"])
        for r in _rows(spark, sf_dir, "llm_kcenter_coreset")
    )
    assert got == sel, (got, sel)
    radii = [d for _o, _v, d in sel[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_hodges_lehmann_python_replay_and_bounds(spark, sf_dir):
    """stat_hodges_lehmann equals a brute-force Python replay of the
    Walsh-average median; pins min(x) ≤ HL ≤ max(x) and the odd-N
    identity walsh_lo = walsh_hi."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append(r["count"])

    got = {
        r["event_type"]: (
            r["n_days"],
            r["n_walsh"],
            r["walsh_lo"],
            r["walsh_hi"],
            r["hl"],
        )
        for r in _rows(spark, sf_dir, "stat_hodges_lehmann")
    }
    assert set(got) == set(series)
    for t, xs in series.items():
        n = len(xs)
        sums = sorted(
            xs[i] + xs[j] for i in range(n) for j in range(i, n)
        )
        nw = n * (n + 1) // 2
        lo, hi = sums[(nw + 1) // 2 - 1], sums[nw // 2]
        hl = (lo + hi) / 4
        assert got[t] == (n, nw, lo, hi, hl), (t, got[t])
        assert min(xs) <= hl <= max(xs)
        if nw % 2 == 1:
            assert lo == hi


def test_sample_entropy_python_replay_and_bounds(spark, sf_dir):
    """ts_sample_entropy: brute-force Python replay from the
    definition (Chebyshev template censuses over the daily series)
    matches b/a counts exactly; A ≤ B structurally (every m+1 match
    is an m match) so SampEn ≥ 0."""
    import math
    from collections import Counter

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = {}
    for row in daily:
        series.setdefault(row["event_type"], []).append(
            (row["day"], row["count"])
        )
    got = {
        r["event_type"]: r
        for r in _rows(spark, sf_dir, "ts_sample_entropy")
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        v = [c for _, c in sorted(pts)]
        nn = len(v)
        rr = max(1, (max(v) - min(v)) >> 3)
        g = got[et]
        assert g["n_days"] == nn and g["r"] == rr
        if nn < 4:
            assert g["b_count"] is None and g["a_count"] is None
            continue

        def cens(m):
            hi = nn - m
            return sum(
                1
                for i in range(hi)
                for j in range(i + 1, hi)
                if all(abs(v[i + d] - v[j + d]) <= rr for d in range(m + 1))
            )

        b, a = cens(1), cens(2)
        assert (g["b_count"], g["a_count"]) == (b, a)
        assert a <= b
        if a > 0:
            want = math.floor(
                (math.log(float(b)) - math.log(float(a))) * 1e6 + 0.5
            ) / 1e6
            assert g["sampen"] == want and g["sampen"] >= 0


def test_local_bridges_python_replay(spark, sf_dir):
    """graph_local_bridges equals a from-scratch Python replay on the
    same synthetic edge rule (adjacency sets, no common neighbor),
    and no local bridge ever appears in the (capped) adamic_adar
    candidate set — AA scores are wedge-derived, and a capped wedge
    set is a SUBSET of the exact one."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    ed = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("src"),
            (
                (F.col("o_custkey") * 7 + F.col("o_orderkey") * 3)
                % 2000
            ).alias("dst"),
        )
        .distinct()
        .collect()
    )
    adj = defaultdict(set)
    for r in ed:
        s, t = r["src"], r["dst"]
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    want = {
        (u, v)
        for u in adj
        for v in adj[u]
        if u < v and not (adj[u] & adj[v])
    }
    rows = _rows(spark, sf_dir, "graph_local_bridges")
    got = {(r["s"], r["t"]) for r in rows}
    assert got == want
    for r in rows:
        assert r["deg_s"] == len(adj[r["s"]])
        assert r["deg_t"] == len(adj[r["t"]])
    aa_pairs = {
        (r["na"], r["nb"])
        for r in _rows(spark, sf_dir, "graph_adamic_adar")
    }
    assert not (got & aa_pairs)


def test_matrix_profile_python_replay(spark, sf_dir):
    """ts_matrix_profile equals a brute-force Python replay from the
    definition (z-normalized distances via the same integer
    sufficient statistics, argmin with the same exclusion zone and
    tie-break) — the doubles are identical IEEE, so indices AND
    distances must match exactly. Also pins symmetry-flavored sanity:
    every reported nn_dist is the true minimum, and d(i, nn(i)) ≥
    matrix-profile value of nn(i) can't be smaller than its own
    minimum."""
    import math
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    M = 4
    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = {}
    for row in daily:
        series.setdefault(row["event_type"], []).append(
            (row["day"], row["count"])
        )
    got = {}
    for r in _rows(spark, sf_dir, "ts_matrix_profile"):
        got[(r["event_type"], r["w_idx"])] = (r["nn_idx"], r["nn_dist"])
    seen = set()
    for et, pts in series.items():
        v = [c for _, c in sorted(pts)]
        n = len(v)
        if n < 2 * M:
            continue
        W = n - M + 1
        S = [sum(v[i : i + M]) for i in range(W)]
        Q = [sum(x * x for x in v[i : i + M]) for i in range(W)]
        den = [M * Q[i] - S[i] * S[i] for i in range(W)]
        for i in range(W):
            seen.add((et, i + 1))
            if den[i] <= 0:
                assert got[(et, i + 1)] == (None, None)
                continue
            best = (1e300, 0)
            for j in range(W):
                if abs(j - i) < M or den[j] <= 0:
                    continue
                num = float(
                    M * sum(v[i + k] * v[j + k] for k in range(M))
                    - S[i] * S[j]
                )
                d2 = (2.0 * M) * (
                    1.0
                    - num
                    / (math.sqrt(float(den[i])) * math.sqrt(float(den[j])))
                )
                if d2 < best[0]:
                    best = (d2, j + 1)
            if best[1] == 0:
                assert got[(et, i + 1)] == (None, None)
            else:
                want = math.floor(
                    math.sqrt(max(0.0, best[0])) * 1e6 + 0.5
                ) / 1e6
                assert got[(et, i + 1)] == (best[1], want), (
                    et, i + 1, got[(et, i + 1)], best, want,
                )
    assert seen == set(got)


def test_ses_grid_search_python_replay(spark, sf_dir):
    """ts_ses_grid_search equals a from-scratch Python replay (same
    fold shapes, same IEEE ops, same strict-< argmin with
    smaller-alpha ties) — best_alpha_x10 and the qround SSE must
    match exactly; the winner's SSE is the true grid minimum."""
    import math
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = {}
    for row in daily:
        series.setdefault(row["event_type"], []).append(
            (row["day"], row["count"])
        )
    got = {
        r["event_type"]: (r["n_days"], r["best_alpha_x10"], r["sse"])
        for r in _rows(spark, sf_dir, "ts_ses_grid_search")
    }
    for et, pts in series.items():
        v = [float(c) for _, c in sorted(pts)]
        if len(v) < 2:
            assert et not in got
            continue
        best = (1e300, 0)
        for k in range(1, 10):
            a = float(k) / 10.0
            s, sse = v[0], 0.0
            for x in v[1:]:
                sse = sse + (x - s) * (x - s)
                s = a * x + (1.0 - a) * s
            if sse < best[0]:
                best = (sse, k)
        want_sse = math.floor(best[0] * 1e6 + 0.5) / 1e6
        assert got[et] == (len(v), best[1], want_sse), (et, got[et], best)


def test_ediv_changepoint_python_replay(spark, sf_dir):
    """ts_ediv_changepoint equals a brute-force Python replay from
    the DEFINITION (between/within absolute-difference sums at every
    admissible split, no incremental transition) — pins both the
    B/W_L/W_R recurrence and the exact-double argmax."""
    import math
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    M = 4
    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = {}
    for row in daily:
        series.setdefault(row["event_type"], []).append(
            (row["day"], row["count"])
        )
    got = {
        r["event_type"]: (r["n_days"], r["cp_tau"], r["best_q"])
        for r in _rows(spark, sf_dir, "ts_ediv_changepoint")
    }
    for et, pts in series.items():
        v = [c for _, c in sorted(pts)]
        n = len(v)
        if n < 2 * M:
            assert et not in got
            continue
        best = (-1e300, 0)
        for tau in range(M, n - M + 1):
            L, R = v[:tau], v[tau:]
            B = float(sum(abs(a - b) for a in L for b in R))
            WL = float(
                sum(
                    abs(L[i] - L[j])
                    for i in range(tau)
                    for j in range(i + 1, tau)
                )
            )
            WR = float(
                sum(
                    abs(R[i] - R[j])
                    for i in range(n - tau)
                    for j in range(i + 1, n - tau)
                )
            )
            nd, td = float(n), float(tau)
            q = (
                (2.0 * B) / nd
                - (2.0 * WL * (nd - td)) / (nd * (td - 1.0))
                - (2.0 * WR * td) / (nd * (nd - td - 1.0))
            )
            if q > best[0]:
                best = (q, tau)
        want_q = math.floor(best[0] * 1e6 + 0.5) / 1e6
        assert got[et] == (n, best[1], want_q), (et, got[et], best)


def test_ediv_significance_reproduces_changepoint_and_bounds(spark, sf_dir):
    """ts_ediv_significance's b = 0 row must EQUAL
    ts_ediv_changepoint per series (shared semantics pinned
    differentially — the two ops are separate code); the permutation
    p-value is bounded in [1/(B+1), 1] and perm_ge ∈ [0, B]."""
    sig = {
        r["event_type"]: r
        for r in _rows(spark, sf_dir, "ts_ediv_significance")
    }
    cp = {
        r["event_type"]: r
        for r in _rows(spark, sf_dir, "ts_ediv_changepoint")
    }
    assert set(sig) == set(cp)
    for et, s in sig.items():
        c = cp[et]
        assert (s["n_days"], s["cp_tau"], s["best_q"]) == (
            c["n_days"], c["cp_tau"], c["best_q"],
        ), et
        assert 0 <= s["perm_ge"] <= 16
        assert abs(s["p_value"] - (1 + s["perm_ge"]) / 17.0) < 1e-6


def test_theta_forecast_python_replay(spark, sf_dir):
    """ts_theta_forecast equals a from-scratch Python replay (OLS
    moments, theta-2 SES fold at alpha = 0.5, equal-weight
    combination) — identical IEEE ops, exact match. Also pins the
    structural identities: forecasts advance by slope/2 per step
    and the h-step forecast equals the closed combination."""
    import math
    from pyspark.sql import functions as F

    from etl_geonames_spark.sources import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series = {}
    for row in daily:
        series.setdefault(row["event_type"], []).append(
            (row["day"], row["count"])
        )
    got = {}
    for r in _rows(spark, sf_dir, "ts_theta_forecast"):
        got[(r["event_type"], r["h"])] = (
            r["forecast"], r["slope"], r["ses_level"],
        )
    seen = set()
    for et, pts in series.items():
        v = [c for _, c in sorted(pts)]
        n = len(v)
        if n < 3:
            continue
        st = n * (n + 1) // 2
        st2 = n * (n + 1) * (2 * n + 1) // 6
        sy = sum(v)
        sty = sum((i + 1) * v[i] for i in range(n))
        b = float(n * sty - st * sy) / float(n * st2 - st * st)
        a = (float(sy) - b * float(st)) / float(n)
        l = 2.0 * float(v[0]) - (a + b * 1.0)
        for i in range(2, n + 1):
            zi = 2.0 * float(v[i - 1]) - (a + b * float(i))
            l = 0.5 * zi + 0.5 * l
        for h in range(1, 8):
            seen.add((et, h))
            f = ((a + b * (float(n) + float(h))) + l) / 2.0
            want = (
                math.floor(f * 1e6 + 0.5) / 1e6,
                math.floor(b * 1e6 + 0.5) / 1e6,
                math.floor(l * 1e6 + 0.5) / 1e6,
            )
            assert got[(et, h)] == want, (et, h, got[(et, h)], want)
    assert seen == set(got)
    # step identity: consecutive forecasts differ by slope/2 (up to
    # the emit grid)
    for (et, h), (f, b, _l) in got.items():
        if (et, h + 1) in got:
            assert abs((got[(et, h + 1)][0] - f) - b / 2) < 2e-6


def test_texttiling_python_replay(spark, sf_dir):
    """llm_texttiling_boundaries equals a from-scratch Python replay
    of the block/overlap/strict-valley pipeline; pins that every
    boundary gap index is interior (2 ≤ g ≤ nb−2) and that docs under
    2 blocks are excluded."""
    from etl_geonames_spark.sources import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    W = 10
    want = {}
    for d, txt in texts.items():
        tk = [w for w in txt.split(" ") if w != ""]
        nb = len(tk) // W
        if len(tk) < 2 * W:
            continue
        blocks = [
            set(tk[b * W : (b + 1) * W]) for b in range(nb)
        ]
        sims = [
            len(blocks[g - 1] & blocks[g]) for g in range(1, nb)
        ]
        bnd = [
            g
            for g in range(2, nb - 1)
            if sims[g - 1] < sims[g - 2] and sims[g - 1] < sims[g]
        ]
        want[d] = (
            len(tk),
            nb,
            len(bnd),
            ",".join(str(g) for g in bnd),
        )

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_blocks"],
            r["n_boundaries"],
            r["boundary_gaps"],
        )
        for r in _rows(spark, sf_dir, "llm_texttiling_boundaries")
    }
    assert got == want, (len(got), len(want))
    for d, (_n, nb, _c, gaps) in got.items():
        for g in gaps.split(","):
            if g:
                assert 2 <= int(g) <= nb - 2


def test_abc_xyz_python_replay(spark, sf_dir):
    """ts_abc_xyz equals a from-scratch Python replay of the
    cents-grid monthly aggregation, whole-dollar flooring, Pareto
    cross-multiplied cuts, and CV cross-multiplied cuts; also pins
    that every nation's A-class revenue share is ≥ its B-class
    members' (ranking sanity) and the class alphabet."""
    import math
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_totalprice",
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .collect()
    )
    nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    monthly = defaultdict(int)
    for r in orders:
        monthly[(r["o_custkey"], r["mon"])] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    per_cust = defaultdict(list)
    for (ck, _m), cents in monthly.items():
        per_cust[ck].append(cents // 100)
    stats = {}
    by_nation = defaultdict(list)
    for ck, ds in per_cust.items():
        if ck not in nat:
            continue
        s, s2, n = sum(ds), sum(d * d for d in ds), len(ds)
        stats[ck] = (nat[ck], s, s2, n)
        by_nation[nat[ck]].append((s, ck))
    want = {}
    for nk, lst in by_nation.items():
        tot = sum(s for s, _c in lst)
        cum = 0
        for s, ck in sorted(lst, key=lambda x: (-x[0], x[1])):
            cum += s
            _nk, _s, s2, n = stats[ck]
            var_n = n * s2 - s * s
            abc = (
                "A"
                if 5 * cum <= 4 * tot
                else "B" if 20 * cum <= 19 * tot else "C"
            )
            xyz = (
                "X"
                if 4 * var_n <= s * s
                else "Y" if var_n <= s * s else "Z"
            )
            want[ck] = (nk, s, n, abc, xyz)

    got = {
        r["custkey"]: (
            r["nation"],
            r["revenue"],
            r["n_months"],
            r["abc"],
            r["xyz"],
        )
        for r in _rows(spark, sf_dir, "ts_abc_xyz")
    }
    assert got == want, (len(got), len(want))
    for nk in by_nation:
        a = [got[c][1] for c in got if got[c][0] == nk and got[c][3] == "A"]
        b = [got[c][1] for c in got if got[c][0] == nk and got[c][3] == "B"]
        if a and b:
            assert min(a) >= max(b)


def test_median_polish_python_replay_and_identity(spark, sf_dir):
    """stat_median_polish equals R-medpolish(2 iterations) replayed
    in Python, and the decomposition identity holds EXACTLY:
    count = overall + row_effect + col_effect + residual for every
    cell (all values on the exact 2^-k binary grid, so == not
    approx)."""
    from collections import defaultdict

    from etl_geonames_spark.sources import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    x = {(r["event_type"], r["day"]): float(r["count"]) for r in daily}
    ts = sorted({t for t, _d in x})
    ds = sorted({d for _t, d in x})

    def med(vals):
        s = sorted(vals)
        n = len(s)
        return (s[(n + 1) // 2 - 1] + s[n // 2]) / 2

    z = dict(x)
    re = {t: 0.0 for t in ts}
    ce = {d: 0.0 for d in ds}
    ov = 0.0
    for _ in range(2):
        for t in ts:
            m = med([z[(t, d)] for d in ds if (t, d) in z])
            for d in ds:
                if (t, d) in z:
                    z[(t, d)] -= m
            re[t] += m
        dm = med(list(ce.values()))
        for d in ds:
            ce[d] -= dm
        ov += dm
        for d in ds:
            m = med([z[(t, d)] for t in ts if (t, d) in z])
            for t in ts:
                if (t, d) in z:
                    z[(t, d)] -= m
            ce[d] += m
        dm = med(list(re.values()))
        for t in ts:
            re[t] -= dm
        ov += dm

    got = {
        (r["event_type"], r["day"]): (
            r["residual"],
            r["row_effect"],
            r["col_effect"],
            r["overall"],
        )
        for r in _rows(spark, sf_dir, "stat_median_polish")
    }
    assert set(got) == set(x)
    for k, (res, rf, cf, o) in got.items():
        t, d = k
        assert res == z[k], (k, res, z[k])
        assert rf == re[t] and cf == ce[d] and o == ov
        assert o + rf + cf + res == x[k]  # exact identity
