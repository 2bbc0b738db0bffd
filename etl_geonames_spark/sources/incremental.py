"""Incremental manifest-based ingest: process only files added since
the last run.

The reference re-downloads and re-transforms the FULL GeoNames dump
every run (geonames.js:184-221 — `download` always fetches all three
files); at 100 TB a landing zone receives files continuously and a
full rescan per run is the difference between minutes and days. The
standard fix is a processed-files manifest: list the landing dir,
anti-join against the manifest, read only the new files, and commit
the extended manifest atomically AFTER the downstream write succeeds
— crash between read and commit ⇒ the files are simply re-processed
next run (at-least-once; pair with an idempotent downstream like
streaming_upsert's last-wins merge or dedup-on-ingest for effective
exactly-once).

File listing is driver-side by design — Spark's own file index does
the same; the listing is O(|files|) metadata, never data. The
manifest stores RELATIVE paths, so the landing zone can move.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_manifest(manifest_path: str) -> set[str]:
    """The set of already-processed relative paths ([] if no manifest
    yet — first run processes everything)."""
    if not os.path.exists(manifest_path):
        return set()
    with open(manifest_path) as f:
        doc = json.load(f)
    return set(doc["files"])


def list_landing(data_dir: str, suffix: str = ".parquet") -> list[str]:
    """Deterministically ordered relative paths under the landing dir."""
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for name in files:
            if name.endswith(suffix) and not name.startswith(("_", ".")):
                full = os.path.join(root, name)
                out.append(os.path.relpath(full, data_dir))
    return sorted(out)


def incremental_read(
    spark: SparkSession, data_dir: str, manifest_path: str
) -> tuple[DataFrame | None, list[str]]:
    """(DataFrame over only-the-new files | None if nothing new,
    the new files' relative paths). Schema comes from the files
    themselves; callers commit the manifest only after their
    downstream write lands (see module docstring)."""
    seen = read_manifest(manifest_path)
    new = [p for p in list_landing(data_dir) if p not in seen]
    if not new:
        return None, []
    df = spark.read.parquet(*[os.path.join(data_dir, p) for p in new])
    return df, new


def commit_manifest(manifest_path: str, new_files: list[str]) -> None:
    """Extend the manifest with the just-processed files, atomically:
    write a temp file in the same directory and rename over — readers
    see the old or the new manifest, never a torn one (the same
    single-rename promote as sinks.publish_atomic)."""
    files = sorted(read_manifest(manifest_path) | set(new_files))
    d = os.path.dirname(os.path.abspath(manifest_path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix="._manifest_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"version": 1, "files": files}, f)
        os.replace(tmp, manifest_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
