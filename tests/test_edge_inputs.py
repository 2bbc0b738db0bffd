"""Adversarial-input regressions: run registered queries against a
synthetic sf dir whose rows hit the edge cases the driver fixtures
don't — single-token/empty documents (Spark's sequence(1, 0) is
DESCENDING and out-of-bounds t[i] THROWS under ANSI mode) and all-zero
embeddings (absmax 0 → x/0 NaN divergence). Each case runs the actual
registry query AND its DuckDB oracle over the same Parquet, so the fix
is pinned differentially, not just "doesn't crash".
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3, 4, 5], dtype="int64"),
            "text": [
                "single",            # 1 token: no bigrams, ANSI crash bait
                "",                  # split('') = [''] — also 1 token
                "the cat sat on the mat",
                "the cat sat on a mat",
                "alpha beta gamma alpha beta",
                "alpha beta gamma delta",
            ],
            "lang": ["en"] * 6,
            "source": ["edge"] * 6,
            "n_chars": pd.array([6, 0, 22, 20, 27, 22], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2], dtype="int64"),
            "embedding": [
                [0.0, 0.0, 0.0, 0.0],  # absmax 0: x/0 → NaN without clamp
                [1.0, -2.0, 0.5, 0.25],
                [0.1, 0.2, -0.3, 0.4],
            ],
            "label": pd.array([0, 1, 1], dtype="int32"),
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(
        emb,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_ddb(edge_sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{edge_sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize(
    "name",
    [
        "llm_bigram_logprob",
        "llm_bigram_f1",
        "llm_quantize_embeddings",
        # round-3 bigram/shingle-shaped additions: single-token and
        # empty docs hit the ANSI sequence(1,0)-descends trap
        "llm_pmi_collocations",
        "llm_ngram_span_dedup",
        "llm_source_overlap",
        "llm_minhash_verifiable",
        "llm_feature_hashing",
        "llm_zipf_slope",
        "llm_lm_crossentropy",
        # session-3b additions over documents: winnowing's gram/window
        # CASE guards are exactly the short-doc edge; the others assert
        # group/dedup logic under degenerate (empty-text) rows
        "llm_winnowing",
        "llm_dpo_pairs",
        "llm_url_dedup",
        "llm_shard_manifest",
        # session-3c additions: 5-gram shapes (empty on every edge doc
        # — the guards must yield empty arrays, not ANSI throws),
        # zero-vector ranker inputs in RRF, and the stats family on a
        # degenerate all-'en' corpus (n2 = 0 → NULL/NaN statistics
        # must agree across engines)
        "llm_ngram_novelty",
        "llm_boilerplate_ngrams",
        # round-9: corpus-wide exact LCS — every edge doc is shorter
        # than the 8-token seed threshold, so the prefix-array build
        # must filter them out (empty result, no ANSI sequence throw);
        # Kendall W's rank pass over the degenerate 6-doc corpus
        # (ties everywhere, the empty doc ranks with 0 tokens);
        # Bartlett on the single-lang corpus (k = 1 → NULL statistic,
        # no ln(0) divergence)
        "llm_lcs_corpus_exact",
        "stat_kendall_w",
        "stat_bartlett",
        # AD k-sample on the single-group corpus: every per-value
        # doubled count equals the pooled one, so each term's
        # N*m2 - b2*ni is exactly 0 and A2akN = 0; k=1 NULLs the
        # standardized stat via the variance-polynomial guard
        "stat_ad_ksample",
        # Mood's median on the single-group corpus: k=1 NULLs chi2;
        # the lower-median order statistic (20 on the 6-doc fixture)
        # must still emit identically from both prefix arrays
        "stat_moods_median",
        # DSIR on the degenerate all-'en' corpus: target == raw, so
        # smoothed log-ratios collapse toward 0; single-token/empty
        # docs are unscored (n >= 2 bigram guard) but still counted
        "llm_dsir_weights",
        "llm_rrf_fusion",
        "stat_mann_whitney",
        "stat_ks_two_sample",
        "stat_chi2_independence",
        "stat_bh_fdr",
        "stat_welch_ttest",
        "stat_levene",
        "stat_bootstrap_diff",
        "stat_runs_test",
        "llm_mrr_eval",
        "stat_best_split",
        "llm_mix_kl_divergence",
        "llm_sft_render",
        "llm_bpe_apply",
        "stat_conformal_interval",
        "stat_mutual_information",
        "stat_benford",
        "mm_image_entropy",
        "stat_cohens_kappa",
        "llm_calibration_bins",
        "stat_wilcoxon_signed",
        # round-4 value-hash witnesses: empty/single-token docs feed
        # the simhash sign sums; the zero vector quantizes to all-zero
        # and must land in a bucket (dot 0 ≥ 0 on every plane), not
        # throw or NaN
        "llm_simhash_verifiable",
        "llm_ann_lsh_verifiable",
        # batch-2 round-4: shingle-shaped estimation on empty/short
        # docs; half-comparison on a 4-row corpus (odd half has 2
        # rows); real-codec keyframes on tiny ids
        "llm_minhash_jaccard_est",
        "dq_schema_drift",
        "mm_video_keyframes",
        # batch-3: xi's t+1 pairing on a 4-row corpus; gradient on
        # tiny real bitmaps
        "stat_xi_correlation",
        "mm_image_gradient",
        # batch-4/5: bigram LM on no-bigram docs; funnel where every
        # doc dies at the first gate; degenerate all-'en' split
        # (delta 0 → NULL sample size)
        "llm_kneser_ney_bigram",
        "llm_quality_funnel",
        "stat_sample_size",
        # post-review sweep: one-sided corpora (all-'en', single
        # source) and the zero vector must not vanish rows, throw, or
        # pass undefined-cosine gates
        "agg_kmv_setops",
        "stat_kruskal_wallis",
        "stat_anova_oneway",
        "stat_two_proportion_z",
        "stat_wilson_ci",
        "llm_dedup_embedding_verifiable",
        # round-12: semantic decontamination over the edge embeddings
        # (zero vector in BOTH the eval slice and the corpus — the
        # n2/ne > 0 guards must drop it from both sides, never pass
        # the 0 >= 0 gate)
        "llm_decontaminate_semantic",
        # round-12: unigram-LM EM over empty/single-char-word docs —
        # one-edge lattices (alpha[L] = p(char), gamma exactly 1e9)
        # and the empty-corpus path (empty vocab, no division)
        "llm_unigram_em_round",
        # round-12: Rényi efficiency where the edge corpus may have
        # 0 or 1 distinct tokens (the vocab_size > 1 ln-denominator
        # guard and the empty-aggregate CASE must agree)
        "llm_renyi_efficiency",
        # round-12: Viterbi apply on the same degenerate lattices as
        # the EM round (one-edge words, empty corpus) — the integer
        # DP/backtrace must agree, not just not-crash
        "llm_unigram_viterbi_apply",
        # round-13: prune step where the edge corpus may seed ZERO
        # multi-char pieces (empty ml table, k = 0, empty rank join)
        "llm_unigram_prune",
        # round-13: overlap census over edge fixtures where the
        # universe join may be empty and zero vectors sit on both
        # sides of the semantic gate (n2/ne > 0 guards)
        "llm_decontamination_overlap",
        # round-13: k-center greedy where the edge corpus may have
        # fewer than K points or all-coincident points (deterministic
        # re-pick of the smallest id at mind 0 — documented)
        "llm_kcenter_coreset",
        # round-13: TextTiling over short/empty docs (every edge doc
        # is under 2 blocks — empty output; the nb >= 4 CASE guards
        # Spark's descending sequence)
        "llm_texttiling_boundaries",
        "mm_image_histogram",
        "mm_audio_resample",
        "mm_modality_route",
        "mm_decode_meta",
        "dq_observed_metrics",
        "maintenance_compaction_plan",
        # round-5: dim stats over the zero vector (zero_frac 1.0,
        # variance 0 — must not NaN); feature extract on tiny ids
        # (2×2 images, quadrant floors at w//2 = 1); BPE training on
        # a corpus with single-char and empty words (slice(t,1,0)
        # must be empty, not an ANSI throw); HTML extraction over the
        # empty document; IVF witness where the zero vector IS a
        # centroid (d2 ties broken on cid, dot 0 rows still rank)
        "llm_embedding_dim_stats",
        "mm_feature_extract",
        "llm_bpe_train_rounds",
        "llm_html_extract",
        "llm_ann_ivf_verifiable",
        # round-5 batch 2: gram probes over 1-token/empty docs (all
        # three lengths must yield empty arrays, not ANSI throws);
        # prefix fingerprints exclude the empty doc; recall eval on a
        # 3-vector corpus incl. the zero vector; one-sided (all-'en')
        # permutation test NULLs every statistic; heavy hitters with
        # empty-text docs contributing no words
        "llm_longest_shared_gram",
        "llm_cross_source_dup_matrix",
        "llm_ann_recall_eval",
        "agg_heavy_hitters",
        "stat_permutation_test",
        # round-5 batch 3: SSIM and pitch on tiny doc_ids (2×2
        # images; 60-sample clips) through the real codecs
        "mm_image_ssim",
        "mm_audio_pitch",
        # PQ on a 3-vector 4-dim corpus: every vector is a codeword,
        # subvector length 1, zero vector snaps at d2 ties → cid 0
        "llm_pq_quantize",
        # round-6: one-sided all-'en' corpus NULLs TOST; Grubbs on a
        # 6-row corpus (n ≥ 3 holds, argmax tie-break exercised);
        # TTR buckets collapse to bucket 0; DP noise on a single lang
        # key; seed-and-extend where most docs are too short to seed
        "stat_tost_equivalence",
        "stat_grubbs",
        "llm_ttr_curve",
        "llm_dp_histogram",
        "llm_exact_shared_run",
        # BLEU over pairs where the candidate has no bigrams (NULL)
        # or zero overlap (0.0); band tuning where the single-token
        # and empty docs produce no shingles at all
        "llm_bleu_bigram",
        "llm_minhash_band_tuning",
        # self-repeat over 1-token/empty docs (guarded CASE -> 0) and
        # the 'the cat sat on the mat' repeated-unigram doc (l = 1)
        "llm_longest_self_repeat",
        # ADC search on the 3-vector corpus incl. the zero vector
        # (every vector is its own codeword; LUT rows with d2 = 0)
        "llm_pq_search_adc",
        # span corruption over empty/1-token docs: no eligible spans,
        # input = original text, target = the terminal sentinel only
        "llm_span_corruption",
        # round-7: CDC chunking over empty (no chunks) and 1-token
        # (single forced chunk) docs; stitch/watermark/edit/rouge over
        # the empty-text pair (lev vs '' = len, LCS 0, z NULL); the
        # paired-binary and moments tests on the degenerate corpus
        # (all indicators 0 -> NULL statistics); all-'en' corpus
        # empties BOTH cohens_d groups' pairing consistently (0 rows)
        "llm_cdc_chunk_dedup",
        "llm_overlap_stitch",
        "llm_watermark_detect",
        "llm_edit_distance_ratio",
        "llm_rouge_l",
        "stat_mcnemar",
        "stat_cochran_q",
        "stat_jarque_bera",
        "stat_cohens_d",
        "mm_audio_clipping_detect",
        # prefix-cache probing where only the 6-token docs reach k=4
        # and none reach k=8/16 (zero eligible rows must still emit
        # the per-k summary row)
        "llm_prefix_cache_stats",
        # batch-3: all-'en' corpus makes the trend test's Y = n
        # (NULL z); 2-wide images have no 2-grid boundary columns
        # (n_boundary 0 rows must agree)
        "stat_cochran_armitage",
        "mm_image_blockiness",
        # round-8: feature export over empty/1-token docs (NULL
        # ratios, LEFT-JOIN NULL logprob, gopher_pass coalesces to
        # FALSE); packing over the tiny-bucket-only corpus; the
        # substring census where no doc reaches 3 tokens (0 rows)
        "llm_quality_features",
        "llm_pack_bins",
        "llm_substring_census",
        # kendall over the near-degenerate slice (tie-dominated
        # denominators NULL tau_b when a factor hits zero); fleiss
        # gates on empty docs (NULL-guarded ratios vote 0, never
        # throw) and unanimity NULLs kappa
        "llm_metric_kendall",
        "stat_fleiss_kappa",
        # ESD rounds over the tiny edge corpus (rounds past the
        # remaining-set size drop out identically on both engines;
        # zero-variance remainders NULL r_stat but still remove)
        "dq_esd_outliers",
        # Neyman allocation on the single-stratum all-'en' corpus
        # (weight 1.0; singleton/zero-variance strata NULL out)
        "sample_neyman_allocation",
        # Dunn on the single-source edge corpus: zero pair rows on
        # both engines (no a.source < b.source pairs exist)
        "stat_dunn_posthoc",
        # norm QA over the 3-vector edge table INCLUDING the zero
        # vector (n_zero = 1; MAD-0 restatement must not throw)
        "dq_embedding_norm_qa",
        # round-10: CvM on the all-'en' corpus (n2 = 0 NULLs both
        # statistics, no divide); CMH's pooled median + strata cells
        # on the 6-doc single-lang corpus (one stratum, tied cells);
        # chrF over the empty-text pair (zero grams on one side must
        # average P_n = 0, emit chrf2 = 0.0, never ANSI-throw on the
        # sequence(1, 0) trap)
        "stat_cvm_two_sample",
        "stat_cmh",
        "llm_chrf",
        # round-10 normal-theory trio on the 6-doc corpus: lilliefors
        # emits D from 5 distinct values; fligner's single stratum
        # (k = 1) NULLs chi2 without evaluating the tail branches;
        # shapiro-francia's Blom folds cover rank blocks of size 2
        # (the tied 22s)
        "stat_lilliefors",
        "stat_fligner_killeen",
        "stat_shapiro_francia",
        # the distance suite on the all-'en' corpus: n2 = 0 NULLs the
        # three ratios while the exact tvd_num still emits
        "stat_hellinger",
        # round-11: SemDeDup + D4 over the 3-vector corpus incl. the
        # zero vector (norm divisor clamp → zero u, dot 0 < τ keeps
        # it; D4 cells of size 1 rank r=1 > nc/4 and all survive)
        "llm_semdedup",
        "llm_d4_diversify",
        # IRLS probe on the one-sided 6-doc corpus (every Gopher
        # label is 0): round-1 weights go uniformly negative, the
        # empty doc contributes only its intercept row, and the
        # saturated-cell hden = 0 fallback must emit w2 = w1 from
        # both engines, not divide
        "llm_quality_classifier",
        # eval on the same one-sided corpus: tp = fn = 0, so
        # precision/recall/F1 all hit their CASE guards (prec is
        # defined iff the probe predicts any positive)
        "llm_classifier_eval",
        # QL retrieval where NO query term occurs in the corpus: the
        # candidate set is empty and both engines must return zero
        # rows (not every-doc length-only scores)
        "llm_query_likelihood",
        # JT on the single-source corpus: k = 1 gives jt2 = 0 and a
        # NULL z from both engines (no cross-group pairs exist)
        "stat_jonckheere",
        # BM on the one-sided corpus: n0 = 0 NULLs p_hat/W/df and the
        # guarded /(n_g - 1) terms must never evaluate (ANSI fires on
        # both conjuncts of a condition — the fleiss_kappa rule)
        "stat_brunner_munzel",
        # AB on the one-sided corpus: n0 = 0 NULLs z while ab/e_ab
        # still emit (every doc is group 1)
        "stat_ansari_bradley",
        # FIM on empty/one-token docs: n = 0 forces p1 = p2 = 0 and
        # all three parts empty — both engines must render the bare
        # sentinel skeleton, not throw or emit NULL
        "llm_fim_transform",
        # winrate on the single-source corpus: no cross-source pairs
        # exist, so the matrix is EMPTY from both engines
        "llm_source_winrate",
        # char entropy on the empty doc (L = 0 NULLs everything
        # derived; both engines split '' to ['']) and the 1-token doc
        "llm_char_entropy_gate",
        # LSH eval where no doc has 3 tokens: empty hash/band/gt
        # tables, tp=fp=fn=0, all three ratios NULL
        "llm_lsh_pr_eval",
        # df-prune on the 6-doc corpus: the empty doc vanishes (no
        # token rows), 'the' has df 2 of 5 docs-with-tokens (kept),
        # hapax singles drop
        "llm_df_prune",
    ],
)
def test_edge_query_matches_oracle(name, spark, edge_sf_dir, edge_ddb):
    spark_pd = QUERIES[name](spark, edge_sf_dir).toPandas()
    duck_pd = edge_ddb.sql(ORACLES[name]).df()
    assert len(spark_pd) == len(duck_pd), name
    # sort by ALL (hashable) columns — a first-key-only sort leaves
    # multi-row-per-key outputs (e.g. feature dims) order-ambiguous
    keys = [
        c for c in spark_pd.columns
        if not spark_pd[c].map(
            lambda v: isinstance(v, (list, dict)) or hasattr(v, 'tolist')
        ).any()
    ] or list(spark_pd.columns[:1])
    s = spark_pd.sort_values(keys, ignore_index=True)
    o = duck_pd.sort_values(keys, ignore_index=True)
    assert sorted(s.columns) == sorted(o.columns), name
    for col in sorted(s.columns):
        for i, (a, b) in enumerate(zip(s[col], o[col])):
            if hasattr(a, "tolist"):
                a = list(a)
            if hasattr(b, "tolist"):
                b = list(b)
            both_nan = (
                isinstance(a, float)
                and isinstance(b, float)
                and a != a
                and b != b
            )
            if both_nan:  # NULL aggregate over empty set on both sides
                continue
            assert a == pytest.approx(b, abs=1e-9), (name, col, i)


def test_single_token_doc_does_not_inflate_context_counts(
    spark, edge_sf_dir
):
    """The descending-sequence junk row (w1='single', w2=NULL) used to
    survive into the left-context counts; with the guard, docs 0 and 1
    contribute nothing anywhere and every avg_logprob is exact."""
    out = {
        r["doc_id"]: r["n_bigrams"]
        for r in QUERIES["llm_bigram_logprob"](spark, edge_sf_dir).collect()
    }
    assert 0 not in out and 1 not in out
    assert out[2] == 5 and out[3] == 5


def test_zero_vector_quantizes_to_zero_ints(spark, edge_sf_dir):
    rows = {
        r["vec_id"]: (r["scale"], [int(x) for x in r["q"].split(",")])
        for r in QUERIES["llm_quantize_embeddings"](
            spark, edge_sf_dir
        ).collect()
    }
    assert rows[0] == (0.0, [0, 0, 0, 0])
    assert rows[1][1][0] == 64  # 1.0/2.0*127 = 63.5 → floor(+0.5) = 64


def test_compression_ratio_matches_stdlib_zlib_exactly(spark, sf_dir):
    """llm_compression_ratio has no SQL oracle (DEFLATE isn't SQL);
    instead pin it bit-exactly against the SAME stdlib zlib the UDF
    uses, recomputed in-process over the raw parquet. Catches a
    broken/reordered UDF the driver's rows-only row never would."""
    import zlib

    import numpy as np

    got = (
        entry_mod.queries()["llm_compression_ratio"](spark, sf_dir)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def ratio(s: str) -> float:
        raw = s.encode("utf-8")
        return len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0

    docs = docs.assign(ratio=docs["text"].map(ratio))

    def q6(x: float) -> float:
        return np.floor(x * 1e6 + 0.5) / 1e6

    exp = (
        docs.groupby("source")
        .agg(
            n_docs=("ratio", "size"),
            avg_ratio=("ratio", lambda s: q6(s.mean())),
            min_ratio=("ratio", lambda s: q6(s.min())),
            max_ratio=("ratio", lambda s: q6(s.max())),
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()
    assert got["avg_ratio"].tolist() == pytest.approx(
        exp["avg_ratio"].tolist(), abs=1e-9
    )
    assert got["min_ratio"].tolist() == exp["min_ratio"].tolist()
    assert got["max_ratio"].tolist() == exp["max_ratio"].tolist()


def test_sft_render_span_recovers_response(spark, edge_sf_dir):
    """The emitted (asst_start, asst_len) span must cut exactly the
    response text back out of the rendered string — the property an
    SFT trainer's loss mask depends on."""
    rows = QUERIES["llm_sft_render"](spark, edge_sf_dir).collect()
    for r in rows:
        cut = r["rendered"][r["asst_start"] - 1 : r["asst_start"] - 1 + r["asst_len"]]
        assert len(cut) == r["asst_len"]
        assert r["rendered"].endswith(cut + "<|end|>")


def test_html_extract_strips_script_body_containing_lt(
    spark, tmp_path
):
    """A script/style body containing a literal '<' (e.g. `a<b`) must
    be stripped WHOLESALE — the [^<]* body form under-stripped it,
    leaking `var q='a` into the extracted text (and the oracle shared
    the regex, so the differential could never catch it). Also pins
    the \\s+ whitespace collapse: a tab inside the doc text must
    collapse to one space. Differential + absolute no-leak assertion
    over a self-contained fixture."""
    import duckdb

    d = tmp_path / "sf_html"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0], dtype="int64"),
            "text": [
                "before <script>var q='a<b';</script>\tafter "
                "<style>p { c: 1 } .x</style> end"
            ],
            "lang": ["en"],
            "source": ["edge"],
            "n_chars": pd.array([78], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    spark_pd = (
        QUERIES["llm_html_extract"](spark, str(d))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    duck_pd = (
        con.sql(ORACLES["llm_html_extract"])
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    for col in sorted(spark_pd.columns):
        assert spark_pd[col].tolist() == duck_pd[col].tolist(), col
    prefix = spark_pd["clean_prefix"][0]
    assert "var q" not in prefix and "a<b" not in prefix
    assert "{ c: 1 }" not in prefix
    # skeleton h1 text + doc body with script/style gone, tab collapsed
    # (tags strip to nothing, so h1/p text runs together: "0before")
    assert prefix.startswith("Doc & 0before after end")


def test_exact_shared_run_recovers_planted_lengths(spark, tmp_path):
    """llm_exact_shared_run must report the EXACT planted shared-run
    length — the property that distinguishes it from the factor-2
    doubling probe (llm_longest_shared_gram would bucket 13 down to
    8). Planted: docs 0/1 share exactly a 13-token run, docs 2/3
    exactly 6, docs 4/5 exactly 4, doc 6 shares nothing (unique
    tokens), doc 7 is too short to seed. Also differential vs the
    DuckDB oracle on the same fixture."""
    import duckdb

    run13 = " ".join(f"r{i}" for i in range(13))
    run6 = " ".join(f"s{i}" for i in range(6))
    run4 = " ".join(f"t{i}" for i in range(4))
    texts = [
        f"a0 a1 {run13} a2 a3",
        f"b0 {run13} b1 b2 b3",
        f"c0 c1 {run6} c2",
        f"{run6} d0 d1",
        f"e0 {run4} e1",
        f"f0 f1 f2 {run4}",
        "u0 u1 u2 u3 u4 u5 u6 u7",
        "v0 v1 v2",
    ]
    d = tmp_path / "sf_runs"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["edge"] * len(texts),
            "n_chars": pd.array(
                [len(t) for t in texts], dtype="int64"
            ),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    got = {
        (r["doc_a"], r["doc_b"]): r["exact_l"]
        for r in QUERIES["llm_exact_shared_run"](spark, str(d)).collect()
    }
    assert got == {(0, 1): 13, (2, 3): 6, (4, 5): 4}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    duck = {
        (int(r.doc_a), int(r.doc_b)): int(r.exact_l)
        for r in con.sql(ORACLES["llm_exact_shared_run"]).df().itertuples()
    }
    assert duck == got


def test_exact_shared_run_extension_cap(spark, tmp_path):
    """A shared run longer than _ESR_EXT_CAP (512) must report
    exact_l = 512 with capped = true (a lower bound, honestly
    marked), while below-cap pairs stay exact with capped = false —
    and the DuckDB oracle must agree on both. The cap bounds the
    match-flag array a degenerate near-identical long document pair
    would otherwise materialize at full document length."""
    import duckdb

    long_run = " ".join(f"r{i}" for i in range(600))
    short_run = " ".join(f"s{i}" for i in range(7))
    texts = [
        f"a0 a1 {long_run} a2",
        f"b0 {long_run} b1 b2",
        f"c0 {short_run} c1",
        f"{short_run} d0 d1 d2",
    ]
    d = tmp_path / "sf_cap"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["edge"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    got = {
        (r["doc_a"], r["doc_b"]): (r["exact_l"], r["capped"])
        for r in QUERIES["llm_exact_shared_run"](spark, str(d)).collect()
    }
    assert got == {(0, 1): (512, True), (2, 3): (7, False)}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    duck = {
        (int(r.doc_a), int(r.doc_b)): (int(r.exact_l), bool(r.capped))
        for r in con.sql(ORACLES["llm_exact_shared_run"]).df().itertuples()
    }
    assert duck == got


def test_grubbs_empty_corpus_matches_oracle(spark, tmp_path):
    """stat_grubbs on an EMPTY documents table must emit one row with
    n = 0 and NULL statistics on BOTH engines (ADVICE r6 item 1: the
    old max()-derived n was NULL on Spark while the oracle's
    COUNT(*)-based CTE said 0 — n now comes from the moments
    aggregate, whose count over an empty scan is 0)."""
    import duckdb

    d = tmp_path / "sf_empty"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([], dtype="int64"),
            "text": pd.array([], dtype="str"),
            "lang": pd.array([], dtype="str"),
            "source": pd.array([], dtype="str"),
            "n_chars": pd.array([], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    rows = QUERIES["stat_grubbs"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 0
    assert r["g_stat"] is None and r["outlier_doc_id"] is None
    assert r["x_outlier"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    o = con.sql(ORACLES["stat_grubbs"]).df()
    assert len(o) == 1 and int(o["n"][0]) == 0
    assert pd.isna(o["g_stat"][0]) and pd.isna(o["outlier_doc_id"][0])


def test_tost_zero_variance_nulls_not_throws(spark, tmp_path):
    """Both groups constant (se2 = 0) must NULL the TOST statistics —
    Spark ANSI would otherwise throw DIVIDE_BY_ZERO where DuckDB's
    double x/0.0 quietly NULLs (round-6 self-review finding).
    Differential over a self-contained fixture."""
    import duckdb

    d = tmp_path / "sf_tost"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "text": ["a a", "b b", "c c", "d d"],
            "lang": ["en", "en", "fr", "fr"],
            "source": ["edge"] * 4,
            "n_chars": pd.array([10, 10, 30, 30], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    (r,) = QUERIES["stat_tost_equivalence"](spark, str(d)).collect()
    assert (r["n1"], r["n2"]) == (2, 2)
    assert r["mean_diff"] == -20.0
    assert r["t_lower"] is None and r["t_upper"] is None
    assert r["equivalent"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    (dr,) = con.sql(ORACLES["stat_tost_equivalence"]).fetchall()
    assert dr[0] == 2 and dr[1] == 2 and dr[2] == -20.0
    assert dr[3] is None and dr[4] is None and dr[5] is None


def test_edit_distance_non_ascii_matches_oracle(spark, tmp_path):
    """Spark levenshtein counts CODE POINTS, DuckDB counts BYTES —
    they diverge on multibyte characters (round-7 review finding).
    The contractual ASCII fold (non-ASCII -> '?') must make both
    engines agree on a corpus where the raw distance would differ:
    'café' vs 'cafe' is lev 1 on Spark but 2 on raw DuckDB bytes."""
    import duckdb

    texts = ["café au lait", "cafe au lait",
             "naïve résumé", "naive resume"]
    d = tmp_path / "sf_uni"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["fr", "en", "fr", "en"],
            "source": ["edge"] * 4,
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    got = {
        r["pair_id"]: (r["n_a"], r["n_b"], r["lev"], r["near_dup"])
        for r in QUERIES["llm_edit_distance_ratio"](spark, str(d)).collect()
    }
    # after the fold both sides see 'caf? au lait' vs 'cafe au lait'
    assert got[0] == (12, 12, 1, True)
    # 'na?ve r?sum?' vs 'naive resume': 3 substitutions
    assert got[1] == (12, 12, 3, True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    duck = {
        int(r.pair_id): (int(r.n_a), int(r.n_b), int(r.lev),
                         bool(r.near_dup))
        for r in con.sql(
            ORACLES["llm_edit_distance_ratio"]
        ).df().itertuples()
    }
    assert duck == got


def test_fleiss_empty_corpus_matches_oracle(spark, tmp_path):
    """stat_fleiss_kappa on an EMPTY documents table: one row with
    n = 0, t1 = 0, NULL p_bar/p_e/kappa on BOTH engines — the
    oracle's SUMs carry COALESCE(., 0) to match Spark's coalesced
    conditional sums (the NULL-vs-0 family, round-8 review)."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_empty"
    d.mkdir()
    # explicit arrow schema: an all-empty pandas frame otherwise
    # writes `text` as a non-string type and the oracle's str_split
    # fails to bind
    tbl = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    rows = QUERIES["stat_fleiss_kappa"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n"], r["t1"]) == (0, 0)
    assert r["p_bar"] is None and r["p_e"] is None and r["kappa"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    o = con.sql(ORACLES["stat_fleiss_kappa"]).df()
    assert len(o) == 1
    assert int(o["n"][0]) == 0 and int(o["t1"][0]) == 0
    assert pd.isna(o["kappa"][0])


def test_norm_qa_even_count_median_interpolation(spark, tmp_path):
    """dq_embedding_norm_qa's docstring asserts Spark F.median and
    DuckDB median agree bit-for-bit; for EVEN counts both must use
    lower + (upper - lower)/2 interpolation between two DISTINCT
    middle norms — this fixture pins that identity (ADVICE r8
    item 2) instead of assuming it: 4 vectors whose L2 norms are
    4 distinct values (3, 5, 13, 25), so med = (5+13)/2 = 9 and
    MAD = median(|{6,4,4,16}|) = (4+6)/2 = 5 exactly; no vector
    crosses the Iglewicz-Hoaglin gate (max dv 16 < 3.5/0.6745*5 ≈
    25.9), and both engines must agree on that count through the
    same interpolated medians."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_even"
    d.mkdir()
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                [3.0, 0.0],     # norm 3
                [3.0, 4.0],     # norm 5
                [5.0, 12.0],    # norm 13
                [7.0, 24.0],    # norm 25
            ],
            "label": pd.array([0, 1, 0, 1], dtype="int32"),
        }
    )
    tbl = pa.Table.from_pandas(
        emb,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    rows = QUERIES["dq_embedding_norm_qa"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 4 and r["n_zero"] == 0
    assert r["med_norm"] == 9.0      # interpolated (5+13)/2
    assert r["mad_norm"] == 5.0      # interpolated (4+6)/2
    # dv values are {6, 4, 4, 16}; the MAD gate is 3.5/0.6745 * 5
    # ≈ 25.9, so no outliers here — the pin is that BOTH engines
    # derive the same interpolated medians and agree on the count
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    o = con.sql(ORACLES["dq_embedding_norm_qa"]).df()
    assert len(o) == 1
    assert float(o["med_norm"][0]) == 9.0
    assert float(o["mad_norm"][0]) == 5.0
    assert int(o["n_outliers"][0]) == r["n_outliers"]
    assert int(o["n_zero"][0]) == 0


def test_bartlett_zero_variance_group_nulls_not_throws(spark, tmp_path):
    """A lang group whose lengths are all identical has exact sample
    variance 0: DuckDB ln(0) THROWS where Spark log(0) is NULL — the
    oracle's CASE WHEN s2 > 0 guard must make both engines drop the
    term and NULL the statistic via the all_pos gate (code-review
    r9 finding). Differential over a self-contained fixture."""
    import duckdb

    d = tmp_path / "sf_zv"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
            "text": ["a b", "c d", "e f g", "h i", "j k l m"],
            "lang": ["en", "en", "de", "de", "de"],
            "source": ["s"] * 5,
            # en group: constant length -> s2 = 0 exactly
            "n_chars": pd.array([7, 7, 9, 11, 13], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    rows = QUERIES["stat_bartlett"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 2 and r["nn"] == 5
    assert r["t_stat"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    o = con.sql(ORACLES["stat_bartlett"]).df()
    assert len(o) == 1 and int(o["k"][0]) == 2 and int(o["nn"][0]) == 5
    assert pd.isna(o["t_stat"][0])


def test_ad_ksample_single_distinct_value_nulls_not_throws(spark, tmp_path):
    """Every document sharing one n_chars value gives p = 1: every
    AD term's denominator is exactly 0, which ANSI would throw on —
    the p >= 2 corpus filter must NULL the statistics on BOTH engines
    instead (code-review r9 pass-4 finding). Differential over a
    self-contained fixture."""
    import duckdb

    d = tmp_path / "sf_onev"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "text": ["a b", "c d", "e f", "g h"],
            "lang": ["en", "en", "de", "de"],
            "source": ["s"] * 4,
            "n_chars": pd.array([7, 7, 7, 7], dtype="int64"),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    rows = QUERIES["stat_ad_ksample"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 0  # no group survives the p >= 2 filter
    assert r["a2akn"] is None and r["ad_stat"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    o = con.sql(ORACLES["stat_ad_ksample"]).df()
    assert len(o) == 1 and int(o["k"][0]) == 0
    assert pd.isna(o["a2akn"][0]) and pd.isna(o["ad_stat"][0])


def test_moods_median_empty_corpus_matches_oracle(spark, tmp_path):
    """stat_moods_median on an EMPTY documents table: the pooled
    aggregate still produces one row with vs = [], and the
    grand-median projection must NULL through (size-guarded
    element_at) rather than throw INVALID_ARRAY_INDEX under ANSI;
    both engines then emit 0 rows because the per-group table is
    empty (ADVICE r9)."""
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_empty"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    rows = QUERIES["stat_moods_median"](spark, str(d)).collect()
    assert rows == []
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    assert len(con.sql(ORACLES["stat_moods_median"]).df()) == 0
