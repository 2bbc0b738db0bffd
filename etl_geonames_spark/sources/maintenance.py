"""Table maintenance: small-file compaction.

At 100 TB the silent killer is millions of small files — every one
costs a listing call, an open, a footer read, and a task. Streaming
sinks and fine-grained partitioning both produce them; periodic
compaction rewrites a directory to approximately target-sized files.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a Parquet directory into ceil(size/target) files.

    Returns the new file count. Writes to a staging path then swaps,
    so a failed compaction never destroys the source. (On a real
    cluster the swap is a metastore/table-format operation — Iceberg
    or Delta `rewrite_data_files`; plain directories get rename.)
    """
    import shutil

    backup = path.rstrip("/") + "._precompact"
    if os.path.exists(backup) and not os.path.exists(path):
        # recover from a crash between the two renames of a prior run
        os.rename(backup, path)
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    staging = path.rstrip("/") + "._compacting"
    (
        spark.read.parquet(path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(staging)
    )
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(backup, path)  # restore the canonical path
        raise
    shutil.rmtree(backup)
    return n_files


def cluster_parquet_by(
    spark,
    path: str,
    out_path: str,
    cols: list[str],
    n_files: int = 8,
) -> None:
    """Rewrite a Parquet directory range-clustered on ``cols``:
    ``repartitionByRange`` splits the key space into disjoint file
    ranges, ``sortWithinPartitions`` orders rows inside each file, so
    every row group's min/max stats cover a narrow slice and a point
    or range predicate on ``cols`` skips whole files/row-groups at
    scan time (parquet stats pruning — the poor man's Z-order for a
    single clustering axis; use geo_morton_cell codes as the cluster
    key for two axes).

    At 100 TB this is THE difference between scanning a table and
    scanning a partition's worth of it: clustering by the dominant
    filter column makes parquet min/max do partition pruning's job at
    file granularity without a partition column explosion.
    """
    (
        spark.read.parquet(path)
        .repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
