"""Exchange census: a per-query physical-plan audit over the WHOLE
registry.

For every registered query this builds the (non-executed) physical
plan and counts the operators that dominate cost at 100 TB:

- shuffle exchanges (hash/range/single-partition) — each one is a
  full materialize-and-redistribute of its input;
- broadcast exchanges — cheap when the broadcast side is small, and
  the census makes "how many joins rely on broadcast" visible;
- joins by strategy (broadcast-hash / shuffled-hash / sort-merge /
  broadcast-nested-loop) — a BNLJ is acceptable only against a tiny
  broadcast side (join_theta, fn_ip_cidr's routing table);
- whether any cartesian product appears (must be zero everywhere —
  also enforced as a hard test in tests/test_plans.py).

Output: one JSON line per query to ``benchmarks/exchange_census.json``
plus an aggregate histogram, and a refreshed summary block in
PLANS.md between the census markers. Plan-only (no query executes),
so the census runs in ~a minute and can be re-run after any change:

    python benchmarks/exchange_census.py

The point is a number the eye can audit: a query whose shuffle count
jumps round-over-round is a scale regression even while correctness
stays green.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_CENSUS_BEGIN = "<!-- exchange-census:begin -->"
_CENSUS_END = "<!-- exchange-census:end -->"


def census_row(name: str, df) -> dict:
    from etl_geonames_spark.plans import explain_str

    plan = explain_str(df, mode="simple")
    return {
        "query": name,
        "shuffles": len(
            re.findall(
                r"\bExchange (?:hashpartitioning|rangepartitioning|"
                r"SinglePartition)",
                plan,
            )
        ),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
    }


def main() -> None:
    from etl_geonames_spark import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        "exchange-census", master="local[8]", shuffle_partitions=8
    )
    queries = entry.queries()
    rows = []
    for name, fn in queries.items():
        try:
            rows.append(census_row(name, fn(spark, SF_DIR)))
        except Exception as exc:  # pragma: no cover - diagnostic path
            rows.append({"query": name, "error": str(exc)[:200]})
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exchange_census.json")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ok = [r for r in rows if "error" not in r]
    hist: dict[int, int] = {}
    for r in ok:
        hist[r["shuffles"]] = hist.get(r["shuffles"], 0) + 1
    worst = sorted(ok, key=lambda r: -r["shuffles"])[:10]
    total_cart = sum(r["cartesian"] for r in ok)
    total_bnlj = sum(r["bnlj"] for r in ok)
    lines = [
        _CENSUS_BEGIN,
        "## Exchange census (auto-generated — "
        "`python benchmarks/exchange_census.py`)",
        "",
        f"{len(ok)} query plans audited at `{SF_DIR}` "
        f"(plan-only, pre-AQE).",
        "",
        "| shuffles per query | queries |",
        "|---|---|",
    ]
    for k in sorted(hist):
        lines.append(f"| {k} | {hist[k]} |")
    lines += [
        "",
        f"Cartesian products: **{total_cart}** (sweep-enforced zero). "
        f"Broadcast nested loops: **{total_bnlj}** — each one is a "
        "deliberate tiny-broadcast theta join (join_theta, join_cross, "
        "fn_ip_cidr's routing table, 1-row normalizer crossJoins).",
        "",
        "Heaviest plans by shuffle count (iterative/multi-stage by "
        "design — kmeans rounds, pagerank rounds, CC propagation):",
        "",
        "| query | shuffles | broadcasts | joins (bhj/smj/shj) |",
        "|---|---|---|---|",
    ]
    for r in worst:
        lines.append(
            f"| {r['query']} | {r['shuffles']} | {r['broadcasts']} | "
            f"{r['bhj']}/{r['smj']}/{r['shj']} |"
        )
    lines.append(_CENSUS_END)
    block = "\n".join(lines)

    plans_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    text = open(plans_md).read() if os.path.exists(plans_md) else ""
    if _CENSUS_BEGIN in text and _CENSUS_END in text:
        pre = text.split(_CENSUS_BEGIN)[0]
        post = text.split(_CENSUS_END)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(plans_md, "w") as f:
        f.write(text)
    print(
        json.dumps(
            {
                "queries": len(ok),
                "errors": len(rows) - len(ok),
                "cartesian": total_cart,
                "bnlj": total_bnlj,
                "max_shuffles": worst[0]["shuffles"] if worst else 0,
            }
        )
    )


if __name__ == "__main__":
    main()
