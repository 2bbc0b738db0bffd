#!/usr/bin/env python
"""r15 open-vs-close bench comparison: totals, per-query geomean over
all 504, and the touched-family detail. Both records come from the
same box on the same day (open 05:43, close at round end), and the
close record carries the new calibration probe."""

from __future__ import annotations

import json
import math
import sys

open_d = json.load(open("benchmarks/BENCH_DETAIL_r15_open504.json"))
close_d = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"))

qo, qc = open_d["queries"], close_d["queries"]
common = sorted(set(qo) & set(qc))
ratios = [qo[n] / qc[n] for n in common if qc[n] > 0]
geomean = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
print(f"n_common={len(common)}")
print(f"warm total: {open_d['value']:.1f} -> {close_d['value']:.1f} "
      f"({open_d['value']/close_d['value']:.3f}x)")
print(f"cold total: {open_d['cold_value']:.1f} -> {close_d['cold_value']:.1f} "
      f"({open_d['cold_value']/close_d['cold_value']:.3f}x)")
print(f"per-query geomean speedup (open/close): {geomean:.3f}")
med_o = sorted(qo.values())[len(qo)//2]
med_c = sorted(qc.values())[len(qc)//2]
print(f"median: {med_o:.3f} -> {med_c:.3f}")
if "calibration" in close_d:
    print("calibration:", close_d["calibration"])

touched = [
    "graph_betweenness_pivots", "graph_cc_bounded", "graph_scc_bounded",
    "graph_bowtie_census", "graph_ktruss_peel", "llm_dedup_simhash",
    "llm_simhash_verifiable", "llm_dedup_verified", "llm_dedup_embedding",
    "llm_dedup_cluster", "llm_dedup_canonical", "llm_exact_shared_run",
    "llm_longest_shared_gram", "llm_lcs_corpus_exact", "llm_substring_census",
    "llm_longest_self_repeat", "llm_minhash_band_tuning",
    "llm_minhash_jaccard_est", "llm_dedup_minhash", "llm_semdedup",
    "llm_d4_diversify", "llm_kmeans", "llm_kmeans_quality",
    "stat_median_polish",
]
print(f"\n{'query':32s} {'open':>7s} {'close':>7s}  speedup")
for n in touched:
    if n in qo and n in qc:
        print(f"{n:32s} {qo[n]:7.3f} {qc[n]:7.3f}  {qo[n]/qc[n]:5.2f}x")
tt_o = sum(qo[n] for n in touched if n in qo)
tt_c = sum(qc[n] for n in touched if n in qc)
print(f"{'touched-family total':32s} {tt_o:7.1f} {tt_c:7.1f}  {tt_o/tt_c:5.2f}x")
