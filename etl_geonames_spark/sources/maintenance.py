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
