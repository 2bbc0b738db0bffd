"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_geonames_spark.registry` — every operator
module registers its queries and DuckDB oracles there; this file just
collects them. ``entry`` runs the flagship pit_pipeline (the
reference's whole transform dataflow in one plan) on sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_geonames_spark.operators.pit import flagship_nested
    from etl_geonames_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return flagship_nested(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_geonames_spark.registry import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys (approximate /
    LSH / engine-specific hashing ops) get rows-only checks."""
    from etl_geonames_spark.registry import collect

    return collect()[1]
