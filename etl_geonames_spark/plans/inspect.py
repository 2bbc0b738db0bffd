"""Physical-plan inspection helpers.

The reference hard-codes its physical execution (SURVEY.md §4); this
engine delegates physical choices to Catalyst — which makes the chosen
plan a *testable contract*. These helpers extract the properties that
matter at 100 TB (broadcast vs shuffle joins, scan-level filter
pushdown, column pruning, top-k strategy) so ``tests/test_plans.py``
can pin them: a code change that silently turns a broadcast join into
a sort-merge shuffle, or un-pushes a scan filter, fails CI before it
burns a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` prints, returned instead."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node name in the formatted plan
    (matched at word start: 'Exchange' won't count 'BroadcastExchange')."""
    plan = explain_str(df)
    return len(re.findall(rf"\b{re.escape(node)}", plan))


def has_node(df: DataFrame, node: str) -> bool:
    return count_nodes(df, node) > 0


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return has_node(df, "BroadcastHashJoin")


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans in the FINAL
    adaptive plan. AQE finalizes the physical plan only at execution,
    so this *executes the query* (collect) — use on test-sized data
    only. Wider/more spans = more of the plan runs as fused generated
    code."""
    df.collect()
    plan = explain_str(df, mode="simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only — BroadcastExchange is not a shuffle.
    Simple mode: the tree form keeps 'Exchange <partitioning>' on one
    line (formatted mode splits the arguments into a detail section)."""
    plan = explain_str(df, mode="simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def global_windows(df: DataFrame) -> list[str]:
    """Window nodes in the optimized logical plan whose partitionSpec
    is EMPTY — i.e. windows that funnel every row through one task.
    An un-partitioned window is the canonical single-node scale trap
    (the reason win_ntile is a decomposition, not ``F.ntile`` over a
    bare ``Window.orderBy``); tests/test_plans.py sweeps every
    registered query and asserts this list is empty."""
    bad: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            bad.append(node.simpleString(120))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())  # noqa: SLF001
    return bad


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters entries from every scan in the plan."""
    plan = explain_str(df)
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the scans actually read (ReadSchema) — the column-
    pruning contract: a 2-column projection must not read 19 columns."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols
