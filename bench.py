#!/usr/bin/env python
"""Per-round benchmark: run every registered engine query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is forced to full materialization with the `noop` sink —
``df.count()`` would let Catalyst prune the projected columns and
under-measure — so the number is end-to-end plan execution: scan,
shuffle, codegen, everything.

Writes only the summary line to stdout; Spark noise goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


_ADJ_CAP = 15  # max solo re-times per record
_ADJ_FLOOR = 0.4  # absolute materiality floor (same as the breach gate)


def _drop_rdds_since(sc, pre_rdds: set) -> None:
    """Unpersist every RDD persisted since ``pre_rdds`` was
    snapshotted — the storage hygiene both the main bench loop and
    the solo adjudication apply between query executions (ONE
    definition; two copies drifted once in review)."""
    post = sc._jsc.getPersistentRDDs()
    for rid in set(post.keySet().toArray()) - pre_rdds:
        rdd = post.get(rid)
        if rdd is not None:
            rdd.unpersist(True)


def _adjudicate(
    spark, qs, sf_dir, names, timings, baselines, settle
) -> dict[str, dict]:
    """Solo re-time each breached query — GC settle, one discarded
    warm-up, 3 timed noop-sink runs — and return both numbers plus a
    reverts/elevated verdict vs the breach gate (2x baseline AND the
    0.4 s materiality floor, the same double condition that flagged
    it — a sub-0.4 s solo wall is never 'elevated'). This is the
    BASELINE.md solo adjudication ritual, run by the bench itself so
    the committed artifact carries its own adjudication."""
    out: dict[str, dict] = {}
    sc = spark.sparkContext
    for name in names:
        settle()
        # same persisted-RDD hygiene as the main loop: 15 breaches x 4
        # executions of localCheckpoint-ing queries would otherwise
        # accumulate storage and time later entries under growing heap
        # pressure — the interference adjudication exists to rule out
        pre_rdds = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # discarded warm-up
        _drop_rdds_since(sc, pre_rdds)
        solo = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            solo.append(round(time.perf_counter() - t0, 4))
            _drop_rdds_since(sc, pre_rdds)
        solo_min = min(solo)
        out[name] = {
            "in_bench": timings[name],
            "baseline": baselines[name],
            "solo": solo,
            "solo_min": solo_min,
            "verdict": (
                "reverts"
                if solo_min <= max(2.0 * baselines[name], _ADJ_FLOOR)
                else "elevated"
            ),
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # derive sf from the dir name (e.g. .../sf0.1 -> 0.1)
    tail = Path(sf_dir).name
    try:
        sf = float(tail[2:]) if tail.startswith("sf") else None
    except ValueError:
        sf = None

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.session import get_spark

    spark = get_spark("etl-geonames-spark-bench")

    qs = entry_mod.queries()

    # Warm-up: one tiny JVM plan plus one trivial Arrow round-trip, so
    # query #1 isn't charged session start-up and the first pandas-UDF
    # query isn't charged the Python-worker pool spawn (both one-time
    # session costs, not query costs).
    from etl_geonames_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    # touch every fixture table once (file listing + parquet footers +
    # first-scan codegen are session costs, not query costs — round 2's
    # bench charged them to the alphabetically-first query), and run one
    # tiny shuffle so exchange machinery is warm too
    from etl_geonames_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().count()
    # first *runtime* use of case-mapping string functions loads the
    # collation machinery (seconds, once per session) — must run over
    # a column: literal forms constant-fold away before execution
    spark.sql(
        "SELECT upper(cast(id AS STRING)) u, lower(cast(id AS STRING)) l, "
        "regexp_extract(cast(id AS STRING), '([0-9])', 1) r, "
        "trim(cast(id AS STRING)) t, lpad(cast(id AS STRING), 4, '0') p, "
        "substring(cast(id AS STRING), 1, 2) s, initcap(cast(id AS STRING)) i, "
        "cast(id AS STRING) LIKE '%1%' k "
        "FROM range(10)"
    ).count()
    # first sketch aggregate (HLL++ / ApproximatePercentile) initializes
    # the ObjectHashAggregate path (~3 s, once per session) — without
    # this, the two alphabetically-first queries agg_approx_distinct /
    # agg_approx_percentile absorb it (measured 14.5 s vs 0.6 s steady)
    spark.range(100).agg(
        F.approx_count_distinct("id", rsd=0.02),
        F.percentile_approx("id", F.lit(0.5), F.lit(100)),
        F.collect_list("id"),
    ).count()
    # first noop-sink write resolves the datasource (once per session)
    spark.range(10).write.format("noop").mode("overwrite").save()

    # BOX-CALIBRATION PROBE (VERDICT r14 item 4 / r15 item 6): the
    # round-over-round totals have been dominated by ±50–70% box-state
    # drift (r14: the 8-core cold total beat the 32-core cold total).
    # This times a PINNED, never-optimized synthetic workload — a
    # fixed-size range → hash-keyed sum/count aggregate, independent
    # of the registry, the fixtures, and every optimization target —
    # solo, right after warm-up, 3 runs. Cross-round total comparisons
    # can then divide out the box: probe ratio ≈ box-speed ratio.
    # Additions-only: no existing field changes meaning. Documented in
    # BASELINE.md ("Box-calibration probe").
    def _calibration_run() -> float:
        spark.sparkContext.setJobDescription("box-calibration probe")
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .groupBy((F.col("id") % 100003).alias("k"))
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(None)
        return dt

    _calibration_run()  # discarded warm-up (JIT for this exact plan)
    calibration = {
        "workload": "range20M_mod100003_sum_count_noop",
        "runs": [_calibration_run() for _ in range(3)],
    }
    calibration["sec"] = min(calibration["runs"])

    # Two passes: pass 1 warms (JVM C2-compiles the codegen'd scan/agg
    # loops, parquet column decoders, Python worker pool — tiny warmups
    # above can't reach these: count(*) never even decodes columns);
    # pass 2 is the recorded steady-state number. At 100 TB steady-state
    # IS the metric — JIT warm-up is a fixed cost amortized over hours,
    # and charging it to whichever queries sort alphabetically first
    # made round-2 numbers swing 0.6 s ↔ 14.5 s run to run.
    # ROVING DEDUP-NEIGHBORHOOD SPIKE (r5-r7, VERDICT r7 item 2): in
    # three consecutive rounds exactly ONE member of the alphabetical
    # llm_dedup_* block ran 2-4x its solo time in SOME full-bench
    # record (canonical r6, verified committed-r7, embedding
    # driver-r7), moving between neighbors run to run; every solo
    # noop-sink adjudication fully reverts (BASELINE.md, rounds 6-8).
    # Hypothesis under test: ~170 queries of accumulated garbage +
    # broadcast blocks reach the JVM old-gen threshold right around
    # this block (its members build the bench's largest broadcast
    # join sides back-to-back), so a major GC lands INSIDE whichever
    # member crosses it. Intervention: force a full GC + 1 s settle
    # in the UNTIMED gap before the block, so the collection happens
    # between queries instead of inside one.
    # ADJUDICATION POLICY (driver-visible; long form in BASELINE.md
    # "Round-5/6/7 adjudications"): an in-bench 2x-vs-first-seen
    # elevation on an llm_dedup_* query is adjudicated collectively
    # as run-shape noise UNLESS a solo noop-sink run (quiet box,
    # warmed session, 3 runs) confirms the elevation.
    # ROUND-11 EXTENSION (VERDICT r10 item 4): the r10 driver record
    # showed the same roving class on the cheap llm_* TEXT aggregates
    # (llm_lang_dist .. llm_topp_vocab, 4-10x in-bench, all revert
    # solo), and the r11 opening anchor's two spikes landed OUTSIDE
    # the text block entirely (win_distinct_rolling,
    # join_interval_grid) — both observations say position/GC-shape,
    # not query-shape. Experiment: settle barriers at the heads of
    # the two text-stat neighborhoods too, so any old-gen collection
    # triggered by the preceding dedup/embedding broadcasts lands in
    # an UNTIMED gap. A/B read-out = whether the text-block spike
    # class still appears in warm-box driver records (BASELINE.md).
    # ROUND-13 EXTENSION (VERDICT r12 item 3): 7 of the 8 r12 driver
    # in-bench spikes clustered on the classifier/quality block
    # (llm_classifier_eval was the most expensive in-bench read two
    # driver rounds running, 4.86 → 8.27 s, vs ~2 s solo) — the r11
    # barrier treatment covered the text-stat neighborhoods but not
    # this block. Settle in the untimed gap before each recurring
    # spike name. A/B read-out = whether BENCH_r13's in-bench reads
    # for the block sit within 2x pins without adjudication.
    _GC_BEFORE = {
        "llm_dedup_band_stats",  # alphabetical head of the dedup block
        "llm_lang_dist",  # head of the lang/mix text-stat run
        "llm_text_stats",  # head of the llm_t* token-stat run
        "llm_classifier_eval",  # r12 spike: 8.27 in-bench / 2.02 solo
        "llm_curate_pipeline",  # r12 spike: 2.16 in-bench / 0.71 solo
        "llm_quality_classifier",  # r12 spike: 4.25 in-bench / 1.56 solo
    }

    def _settle_gc() -> None:
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    sc = spark.sparkContext
    for pass_timings in (cold, timings):
        for name in sorted(qs):
            if name in _GC_BEFORE:
                _settle_gc()
            # construction is INSIDE the timed window: iterative queries
            # (dedup clustering) and scalar-subquery queries (tfidf's
            # doc count) execute real work eagerly at build time — timing
            # only the write would hide it
            pre_rdds = set(sc._jsc.getPersistentRDDs().keySet().toArray())
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            pass_timings[name] = round(time.perf_counter() - t0, 4)
            # drop this query's localCheckpoint blocks BETWEEN queries
            # (outside the timed window): checkpointed RDDs persist
            # MEMORY_AND_DISK and the driver's weak-ref cleaner frees
            # them lazily, so without this the storage footprint grows
            # monotonically across 400+ queries. Measured effect on
            # totals: ~nil at sf0.1 (the 128 GiB heap absorbs it) —
            # this is attribution hygiene and a guard for smaller
            # heaps, NOT the explanation for in-bench vs solo per-query
            # deltas (those remain run-shape noise; solo noop timings
            # stay the adjudication tool, BASELINE.md). Only THIS
            # query's new RDDs are dropped (pre-query id snapshot): a
            # future queries() callable that deliberately persists
            # state across the cold/warm passes keeps it (ADVICE r6
            # item 3). Today no cross-query reuse exists — every
            # callable rebuilds from the parquet scans — so the delta
            # equals the full set.
            # blocking: async removal would overlap the NEXT query's
            # timed window — the interference this exists to remove;
            # the cost lands in the untimed gap
            _drop_rdds_since(sc, pre_rdds)

    total = round(sum(timings.values()), 4)
    cold_total = round(sum(cold.values()), 4)

    # SELF-ADJUDICATION (VERDICT r8 item 3): the roving in-bench spike
    # lands on a different query each full-registry record and has
    # fully reverted in EVERY solo noop-sink re-run across rounds 4-8
    # (BASELINE.md adjudication sections). Rather than minting a fresh
    # un-adjudicated 2x-vs-first-seen breach per round for a human to
    # chase, the bench now adjudicates its own record: any query whose
    # warm in-bench wall exceeds 2x its baseline (first-seen from the
    # committed BENCH_DETAIL history, overridden by the re-baselines
    # documented in BASELINE.md) AND 0.4 s absolute is re-timed solo in
    # the same session — GC settle, one discarded warm-up, then 3 timed
    # noop-sink runs — and BOTH numbers ship in BENCH_DETAIL.json. The
    # warm `queries` map stays the honest in-bench record; the
    # adjudication column is evidence, not a substitute.
    bench_dir = Path(__file__).resolve().parent / "benchmarks"
    first_seen: dict[str, float] = {}
    fs_path = bench_dir / "first_seen.json"
    if fs_path.exists():
        first_seen = json.loads(fs_path.read_text())
    rb_path = bench_dir / "rebaselines.json"
    rebaselines = (
        {k: v["sec"] for k, v in json.loads(rb_path.read_text()).items()}
        if rb_path.exists()
        else {}
    )
    baselines = {**first_seen, **rebaselines}

    # baselines are sf0.1 records — the gate (and the re-times it
    # triggers) only means anything at the driver's sf0.1
    breaches = sorted(
        (
            n
            for n, w in timings.items()
            if sf == 0.1
            and n in baselines
            and w > 0.4
            and w > 2.0 * baselines[n]
        ),
        key=lambda n: timings[n] / baselines[n],
        reverse=True,
    )
    # bound the adjudication bill; anything dropped is named, not silent
    adjudication_skipped = breaches[_ADJ_CAP:]
    adjudications = _adjudicate(
        spark, qs, sf_dir, breaches[:_ADJ_CAP], timings, baselines, _settle_gc
    )
    # self-maintain the first-seen record: a query with no baseline yet
    # (new this round) gets min(cold, warm) pinned here, so next
    # round's gate covers it too. min() because the roving in-bench
    # spike can land on EITHER pass of a new query's first record — a
    # spiked pin would permanently inflate the baseline and blind the
    # 2x gate for that query; the spike never hits the same query in
    # both passes (every adjudication on record reverts solo). ONLY at
    # the driver's sf0.1 — a local sf0.01 smoke run would otherwise
    # pin a ~10x-too-low baseline that the next official record then
    # "breaches"
    new_firsts = (
        {
            n: min(w, cold.get(n, w))
            for n, w in timings.items()
            if n not in first_seen
        }
        if sf == 0.1
        else {}
    )
    if new_firsts:
        first_seen.update(new_firsts)
        fs_path.write_text(json.dumps(dict(sorted(first_seen.items())), indent=1))

    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                "metric": "total_wall_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "cold_value": cold_total,
                "n_queries": len(timings),
                "adjudications": adjudications,
                "adjudication_skipped": adjudication_skipped,
                "calibration": calibration,
                "sf": sf,
            },
            indent=1,
        )
    )
    # Two stdout lines. Line 1: the COMPLETE per-query map (round-1's
    # data loss — the driver artifact kept only a 2000-char stdout
    # tail — must not recur; BENCH_DETAIL.json keeps the same map plus
    # cold-pass timings on disk as a second copy). Line 2 (LAST, and
    # guaranteed < 2000 chars): a compact self-contained summary —
    # totals + the 20 slowest queries — so the driver's tail capture
    # ALWAYS ends with one fully-parseable JSON line even though the
    # full 336-entry map cannot fit in the capture window (r2/r3
    # artifacts had `parsed: null` because the single huge line was
    # cut mid-JSON).
    ascending = dict(sorted(timings.items(), key=lambda kv: kv[1]))
    # Closing-checklist guard (VERDICT r11 item 3): the exchange
    # census must cover the WHOLE registry, or its "0 cartesian at N
    # plans" claim silently under-counts. Non-fatal (the bench line
    # must always print) but loud in both JSON records.
    census_path = Path(__file__).parent / "benchmarks/exchange_census.json"
    census_n = 0
    if census_path.exists():
        # parse each line as JSON rather than string-matching a
        # formatting convention (ADVICE r12): a reformat of the census
        # file must not silently zero the count
        for ln in census_path.read_text().splitlines():
            if not ln.strip():
                continue
            try:
                obj = json.loads(ln)
            except ValueError:
                continue
            if isinstance(obj, dict) and "query" in obj:
                census_n += 1
    census_stale = census_n != len(qs)
    if census_stale:
        print(
            f"WARNING: exchange census covers {census_n} of {len(qs)} "
            "registered queries — rerun benchmarks/exchange_census.py",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "queries": ascending,
                "calibration": calibration,
                "cold_value": cold_total,
                "n_queries": len(timings),
                "census_plans": census_n,
                "census_stale": census_stale,
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
                "unit": "sec",
                "metric": "total_wall_all_queries",
                "value": total,
            },
            separators=(",", ":"),
        )
    )
    # The compact summary must fit the driver's capture tail; rather
    # than asserting (a crash here would lose the one guaranteed-
    # parseable line), drop slowest-query entries until it fits.
    slowest = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
    adj_compact = {
        n: [a["solo_min"], a["verdict"]] for n, a in adjudications.items()
    }
    while True:
        compact = json.dumps(
            {
                "metric": "total_wall_all_queries",
                "value": total,
                "unit": "sec",
                "queries": dict(slowest),
                "adjudicated": adj_compact,
                "n_queries": len(timings),
                "census_stale": census_stale,
                "median": round(
                    sorted(timings.values())[len(timings) // 2], 4
                ),
                "calib_sec": calibration["sec"],
                "cold_value": cold_total,
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
        if len(compact) < 1900 or (not slowest and not adj_compact):
            break
        if slowest:
            slowest = slowest[:-1]
        else:
            # adjudications are ordered worst-breach-first: trim from
            # the TAIL so the guaranteed-parseable line keeps the
            # biggest elevations
            adj_compact.popitem()
    print(compact)


if __name__ == "__main__":
    main()
