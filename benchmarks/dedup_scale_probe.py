#!/usr/bin/env python
"""Dedup-stack scale probe: 10x-replicated sf0.1 documents (50k docs,
every doc in a 10-copy exact-dup clique — adversarially dup-heavy, so
candidate generation faces maximal cliques).

Writes the replicated corpus to a temp dir shaped like a fixture dir,
then times each dedup operator end-to-end (noop sink, steady-state
second run not used here: the probe measures the cold cost a real
one-shot dedup pass pays). Results go to stdout as one JSON line;
paste into BASELINE.md when they move.

Usage: python benchmarks/dedup_scale_probe.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC_SF = "/root/testdata/sf0.1"
N_COPIES = 10
OPS = [
    "llm_dedup_minhash",
    "llm_dedup_verified",
    "llm_dedup_cluster",
    "llm_dedup_canonical",
    "llm_dedup_simhash",
    "llm_dedup_exact",
    # round-4 witness family + census (oracle-checked twins must scale
    # like their production siblings — banded/bucketed, never corpus²)
    "llm_simhash_verifiable",
    "llm_minhash_verifiable",
    "llm_minhash_jaccard_est",
    "llm_dedup_band_stats",
    # round-5 additions that face the corpus: the exact-substring
    # probe must survive maximal 10-copy gram cliques (its df-cap is
    # the pair-bill guard under test); heavy hitters and the dup
    # matrix are aggregate-shaped and should stay near-flat
    "llm_longest_shared_gram",
    "llm_cross_source_dup_matrix",
    "agg_heavy_hitters",
    # round-6 additions (VERDICT r5 item 6): the round-5 map-heavy ops
    # not yet probed — HTML extraction over markup-wrapped replicas
    # (pure codegen, should scale linearly), BPE training over the
    # replicated corpus (vocab-sized state: replication multiplies
    # counts, not keys — rounds should stay near-flat beyond the count
    # pass), and the two-stage Arrow encode->decode feature extract
    # (per-doc pixel work, linear; pins the Arrow transport cost)
    "llm_html_extract",
    "llm_bpe_train_rounds",
    "mm_feature_extract",
    # round-6: exact seed-and-extend under maximal 10-copy cliques —
    # the df-16/occ-8 caps are the pair-bill guard under test (orig
    # df-1 seeds hit df 10, still kept; df>=2 seeds cap out at 20)
    "llm_exact_shared_run",
    # round-11: IRLS probe over the replicated corpus — hashed
    # features replicate (10x counts, same 33 dims), labels replicate,
    # so every per-dim sum multiplies while group keys stay fixed:
    # near-flat expectation like the BPE counts pass
    "llm_quality_classifier",
    # map-only per-doc array expressions: must scale linearly with
    # corpus size, indifferent to the duplication structure
    "llm_longest_self_repeat",
    # round-7: content-defined chunking (one chunk-hash agg — dup
    # chunks' n_docs multiplies 10x under replication, keys don't);
    # suffix=prefix stitch (span-hash equi-join — every base stitch
    # pair becomes a 10x10 clique, plus nothing else: the hash join
    # is the bill)
    "llm_cdc_chunk_dedup",
    "llm_overlap_stitch",
    # round-8 (VERDICT r7 item 4): fused prefix-cache stats — one
    # (k, prefix-hash) keyed agg; replication multiplies group SIZES
    # 10x, keys stay fixed, so wall should track the explode/count
    # pass (~linear in docs), like the CDC chunk census
    "llm_prefix_cache_stats",
    # round-8 corpus-facing additions: packing (one range exchange +
    # bucket histogram — linear in docs), the feature export (one
    # corpus explode + vocab broadcast — replication multiplies
    # counts, not keys), the 3-gate agreement scan (map-only + 1-row
    # agg), and ESD's 3 remove-and-recompute passes (3·O(scan));
    # the substring census and kendall are slice-bounded by contract
    # (replicas shift doc_ids out of the < 200 window) and are
    # probed on the length axis / pinned by plan shape instead
    "llm_pack_bins",
    "llm_quality_features",
    "stat_fleiss_kappa",
    "dq_esd_outliers",
    # round-9 corpus-facing additions: DSIR (bucket keys are FIXED at
    # 512 — replication multiplies counts, wall tracks the explode);
    # Kendall W (one range-shuffle rank pass over 3n rows — sublinear
    # via AQE); Bartlett (one integer-moment agg, flat). ts_kpss is
    # events-facing and lives in ops_scale_probe.py
    "llm_dsir_weights",
    "stat_kendall_w",
    "stat_bartlett",
    # round-9: corpus-wide exact LCS under maximal 10-copy cliques —
    # the 8-token seed threshold is the pair-bill guard under test
    # (every within-clique pair shares everything: candidates = all
    # 45 pairs x 5k cliques, and the binary search converges up in
    # ~2 steps since share(hi) is true for exact copies)
    "llm_lcs_corpus_exact",
    # round-10 corpus-facing additions: CvM (value-count grid —
    # replication multiplies counts, keys fixed: flat like Bartlett);
    # CMH (one (lang, arm, value) cell agg + bounded-k re-aggregates
    # — same contract); chrF is slice-bounded by doc_id < 200
    # (replicas shift out of the window) like bleu/rouge and is
    # pinned by plan shape instead
    "stat_cvm_two_sample",
    "stat_cmh",
    # round-10 batch 2: the normal-theory trio + distance suite are
    # all value-count-grid shapes — replication multiplies counts,
    # keys fixed, so walls must stay near-flat; shapiro additionally
    # pins that the per-cell Blom folds scale with Σc = n (10x longer
    # rank blocks per cell, one pass)
    "stat_lilliefors",
    "stat_fligner_killeen",
    "stat_shapiro_francia",
    "stat_hellinger",
]


def main() -> None:
    from pyspark.sql import functions as F

    from etl_geonames_spark import get_spark
    from etl_geonames_spark.registry import collect
    from etl_geonames_spark.sources import load_table

    spark = get_spark("dedup-scale-probe")
    qs, _ = collect()

    tmp = tempfile.mkdtemp(prefix="dedup_probe_")
    docs = load_table(spark, SRC_SF, "documents")
    replicated = None
    for i in range(N_COPIES):
        part = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
        )
        replicated = part if replicated is None else replicated.union(part)
    replicated.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    n_docs = spark.read.parquet(f"{tmp}/documents.parquet").count()

    timings: dict[str, dict] = {}
    for name in OPS:
        t0 = time.perf_counter()
        df = qs[name](spark, tmp)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        rows = df.count()
        timings[name] = {"wall_s": wall, "rows": rows}
        print(f"# {name}: {wall}s, {rows} rows", file=sys.stderr)

    # ROUGE-L length-scaling stanza (VERDICT r7 item 4): the eval
    # slice is pinned at doc_id < 200 (pairs can't be replicated into
    # it), so the per-pair O(m·n) DP bill is probed on the LENGTH
    # axis instead — text x4 (~390 tokens/side, under the 512 cap:
    # ~16x DP cells vs base) and x8 (~780 tokens, the cap CLAMPS both
    # sides to 512: cells grow ~27x vs base instead of the uncapped
    # 64x, and every pair flips `capped`). Linear-in-pairs follows
    # from the plan shape (one equi-join + map-side DP); this pins
    # the other factor of the bill and proves the guard engages.
    rouge_probe = {}
    for mult in (1, 4, 8):
        rdir = f"{tmp}/rouge_x{mult}"
        docs.select(
            "doc_id",
            F.concat_ws(
                " ", F.array_repeat(F.col("text"), mult)
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        ).write.mode("overwrite").parquet(f"{rdir}/documents.parquet")
        t0 = time.perf_counter()
        df = qs["llm_rouge_l"](spark, rdir)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        n_capped = df.filter(F.col("capped")).count()
        rouge_probe[f"x{mult}"] = {"wall_s": wall, "n_capped": n_capped}
        print(f"# llm_rouge_l x{mult}: {wall}s, capped={n_capped}",
              file=sys.stderr)

    print(json.dumps(
        {"n_docs": n_docs, "ops": timings, "rouge_len_probe": rouge_probe}
    ))


if __name__ == "__main__":
    main()
