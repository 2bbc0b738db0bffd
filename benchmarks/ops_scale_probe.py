#!/usr/bin/env python
"""Scale probe for the round-6 pair/iterative operators that don't
face the documents corpus (VERDICT r6 item 5): 10x-replicated sf0.1
orders / events / customer / embeddings with SHIFTED keys, so graphs
gain 10x nodes+edges, the event timeline gains 10x intervals inside
the SAME time range (grid cells get 10x denser — the adversarial
direction for cell-blocked interval joins), the customer point cloud
gains 10x points in the same bbox (denser KDE cells), and the vector
corpus gains 10x vectors (every source vector heads a 10-copy
identical clique for ADC).

Each op's docstring promises a candidate/cost bill; this probe is the
measurement against that promise:
- graph_scc_bounded: 8 FW-BW rounds, each one join + one agg over
  |E| — wall should grow ~linearly in |E| per round.
- join_interval_grid: candidate bill = sum over grid cells of
  n_a(cell) * n_b(cell) — 10x denser cells => ~100x cell bill, the
  honest quadratic of overlap joins under densification (caps in the
  op bound output, not candidates).
- ts_allen_relations: same cell-join core, 13-relation census output
  stays 13 rows.
- geo_kde_grid: per-point kernel over neighboring cells — linear in
  points at fixed grid.
- llm_pq_search_adc: ADC = |q| x LUT build (k x d) + m lookups per
  vector — linear in vectors, indifferent to duplication.

Usage: python benchmarks/ops_scale_probe.py   (quiet box only)
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

# table -> columns to shift per copy (primary/foreign ids; everything
# else replicates verbatim)
SHIFTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "embeddings": ["vec_id"],
    # round-12: texts replicate verbatim (10x exact-dup cliques), so
    # the unigram word-frequency table keeps the SAME keys with wf*10
    # - the "corpus collapses to vocab-sized work" bill is exactly
    # what the probe must show staying flat
    "documents": ["doc_id"],
}
OPS = [
    "graph_scc_bounded",
    "join_interval_grid",
    "ts_allen_relations",
    "geo_kde_grid",
    "llm_pq_search_adc",
    # round-8 (VERDICT r7 item 4): frontier BFS with min-dist labels —
    # bill = rounds x |E| (one edge equi-join + one (seed, node)
    # min-agg per hop); 10x edges should give ~linear wall like the
    # khop sibling, never path-count blowup (the min-agg dedups)
    "graph_harmonic_centrality",
    # round-9: KPSS over the densified event stream — same days, 10x
    # denser daily counts: per-series array lengths are UNCHANGED, so
    # the wall must track the daily hash agg only (measured 0.5 ->
    # 1.0 s at 10x, BASELINE.md)
    "ts_kpss",
    # round-10 econometric battery: same contract as ts_kpss (daily
    # agg dominates, arrays unchanged); granger additionally pins
    # that the pairwise join stays metadata-sized (days x types) —
    # 10x denser events must NOT grow the pair table
    # round-11: D4 over the 10x vector corpus — every source vector
    # heads a 10-copy identical clique, so SemDeDup collapses each
    # clique to its min-id member (pair bill = within-cell pairs, the
    # k~sqrt(n) lever) and D4 ranks the survivors; wall should track
    # the semdedup pair join, with the prototype pass cell-bounded
    "llm_d4_diversify",
    "ts_variance_ratio",
    "ts_granger_lag1",
    "ts_durbin_watson",
    # round-12 batch:
    # - decontaminate_semantic: 10x corpus vs the FIXED vec_id<50 eval
    #   slice (only copy 0 holds it) - the broadcast-BNLJ bill is
    #   linear in corpus, eval side constant
    # - unigram EM/viterbi + renyi: 10x docs replicate texts verbatim,
    #   word/vocab tables keep the same keys (wf*10) - wall must track
    #   the one corpus collapse, the lattice work is unchanged
    # - sample_entropy / matrix_profile: same days, 10x denser daily
    #   counts - per-series arrays unchanged, daily agg dominates
    # - local_bridges: shifted src keys but dst stays mod-2000, so hub
    #   degrees grow 10x and the wedge bill is the honest quadratic
    #   (sum deg^2) the docstring promises on hub growth
    "llm_decontaminate_semantic",
    "llm_unigram_em_round",
    "llm_unigram_viterbi_apply",
    "llm_renyi_efficiency",
    "ts_sample_entropy",
    "ts_matrix_profile",
    "graph_local_bridges",
    # round-13 batch:
    # - betweenness_pivots: pivot count is FIXED at 16 (the published
    #   constant-k sampling), so the bill is k x bounded-frontier —
    #   10x edges (hub degrees grow 10x) must give ~linear wall,
    #   NEVER k-scales-with-|V| quadratic (that design was rejected
    #   at review: an arithmetic |V|/1009 gate would have 100x'd)
    # - unigram_prune: inherits the viterbi apply's corpus collapse
    #   (10x wf on the same word keys) + vocab-sized lattice work —
    #   wall must track the one corpus pass like the EM/apply pair
    "graph_betweenness_pivots",
    "llm_unigram_prune",
    # - ktruss: shifted src keys, dst mod-2000 hubs grow 10x — the
    #   oriented wedge bill grows with forward degree (the honest
    #   triangle-growth direction), peel rounds shrink it
    # - dtw/walks/overlap: daily agg / per-node argmin / broadcast
    #   eval passes — all corpus-linear, arrays and pair tables fixed
    "graph_ktruss_peel",
    "ts_dtw_pairs",
    "graph_deterministic_walks",
    "llm_decontamination_overlap",
    # - bowtie: node-sized label/frontier BSP rounds — linear in |E|
    #   per round like scc/cc; census output fixed at 5 rows
    # - kcenter: K map passes x corpus + K TakeOrdereds — linear in
    #   vectors, indifferent to the 10-copy cliques (a duplicate has
    #   mind 0 and is never picked)
    "graph_bowtie_census",
    "llm_kcenter_coreset",
    # round-14 (VERDICT r13 item 3 — the four r13 ops that shipped
    # without a recorded probe):
    # - hodges_lehmann: per-group pairwise Walsh averages over
    #   metadata-sized per-lang value vectors — daily/document volume
    #   grows 10x but the vectors are value-domain bounded, so wall
    #   must track the corpus aggregate (near-flat beyond the scan)
    # - texttiling: pure map over documents (valley rule inside each
    #   doc) — linear in docs, zero shuffles
    # - abc_xyz: one monthly per-customer aggregate (10x customers =>
    #   ~linear) + nation-partitioned windows over customer rows
    # - median_polish: corpus daily aggregate + metadata-grid window
    #   sweeps (r14 single-consumer chain) — 10x denser days, same
    #   grid, wall tracks the one corpus aggregate
    "stat_hodges_lehmann",
    "llm_texttiling_boundaries",
    "ts_abc_xyz",
    "stat_median_polish",
]


def main() -> None:
    from pyspark.sql import functions as F

    from etl_geonames_spark import get_spark
    from etl_geonames_spark.registry import collect
    from etl_geonames_spark.sources import load_table

    spark = get_spark("ops-scale-probe")
    qs, _ = collect()

    tmp = tempfile.mkdtemp(prefix="ops_probe_")
    counts = {}
    for table, keys in SHIFTS.items():
        src = load_table(spark, SRC_SF, table)
        parts = []
        for i in range(N_COPIES):
            p = src
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
            parts.append(p)
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.union(p)
        rep.write.mode("overwrite").parquet(f"{tmp}/{table}.parquet")
        counts[table] = spark.read.parquet(f"{tmp}/{table}.parquet").count()
    # non-shifted tables copy verbatim so ops that read dims
    # (ts_abc_xyz's nation join) resolve against the probe dir
    from etl_geonames_spark.sources.tables import TABLE_NAMES

    for table in TABLE_NAMES:
        if table in SHIFTS:
            continue
        load_table(spark, SRC_SF, table).write.mode("overwrite").parquet(
            f"{tmp}/{table}.parquet"
        )
    print(f"# replicated: {counts}", file=sys.stderr)

    timings: dict[str, dict] = {}
    for name in OPS:
        t0 = time.perf_counter()
        df = qs[name](spark, tmp)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        rows = df.count()
        timings[name] = {"wall_s": wall, "rows": rows}
        print(f"# {name}: {wall}s, {rows} rows", file=sys.stderr)

    print(json.dumps({"counts": counts, "ops": timings}))


if __name__ == "__main__":
    main()
