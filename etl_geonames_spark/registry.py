"""Query registry: the driver-facing inventory of engine operators.

Every implemented operator from SURVEY.md §2 registers here twice:

- a PySpark implementation ``(spark, sf_dir) -> DataFrame``;
- (when SQL-expressible) an ANSI-SQL oracle string that DuckDB runs
  on the same Parquet tables for differential correctness checking.

Registration is decorator-based so each operator module keeps its
query and oracle side by side. ``collect()`` imports all operator
modules and returns the merged registries — ``__spark_entry__.py`` is
a thin shim over it.

Alias discipline (the correctness gate hashes values under sorted
column names): every computed/aggregate column is aliased identically
in the Spark code and the SQL, and floating-point aggregates are
rounded identically on both sides so accumulation-order differences
between engines cannot flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "etl_geonames_spark.operators.relational",
    "etl_geonames_spark.operators.sql_queries",
    "etl_geonames_spark.operators.functions",
    "etl_geonames_spark.operators.timeseries",
    "etl_geonames_spark.operators.udfs",
    "etl_geonames_spark.operators.llm",
    "etl_geonames_spark.operators.multimodal",
    "etl_geonames_spark.operators.pit",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its SQL oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (approximate/stateful/UDF-defined) — the driver then records a
    weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query name {name!r} — a dict overwrite would "
                "silently drop one implementation from the driver contract"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return QUERIES, ORACLES
