"""A write-side Python DataSource: plain TSV sink, batch AND
streaming, with the rename-on-commit protocol.

The reference's only sink is driver-side NDJSON writing (geonames.js
:172-174 via its writer tool); sources/sinks.py re-expresses that with
Spark's built-in JSON/text sinks. This module covers the remaining
connector quadrant — a CUSTOM Spark 4 ``DataSource`` that *writes*
(the geonames DataSource demonstrates custom *reads*), in both batch
(``df.write.format("tsv_sink")``) and Structured Streaming
(``df.writeStream.format("tsv_sink")``) modes:

  - Arrow batches in (``DataSourceArrowWriter`` /
    ``DataSourceStreamArrowWriter``) — columnar transfer, vectorized
    tab-join line assembly, no Python row loop;
  - two-phase commit: tasks write hidden ``.**.tmp`` files, the
    driver-side ``commit`` renames them visible — a failed/speculated
    task never leaves a half-visible file;
  - streaming exactly-once per batch: files carry the epoch in their
    name (``part-b{batchId}-*``), and a replayed micro-batch DELETES
    its epoch's files before renaming the new ones, so a retry
    after a crash-between-write-and-checkpoint overwrites instead of
    duplicating — the idempotent-per-epoch contract Spark's
    foreachBatch users must hand-roll.

Any all-atomic schema is accepted (columns are cast to string, NULL →
empty field). At 100 TB the same protocol holds; an object store
replaces rename with a manifest swap in ``commit`` — message flow
unchanged.
"""

from __future__ import annotations

import contextlib
import glob
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


class TsvCommit(WriterCommitMessage):
    """Per-task message: temp file name + row count (picklable)."""

    def __init__(self, tmp_file: str, rows: int) -> None:
        self.tmp_file = tmp_file
        self.rows = rows


def _write_tmp(path: str, prefix: str, iterator) -> TsvCommit:
    """Shared task body: Arrow batches → tab-joined lines in a hidden
    temp file. Casting to string and NULL→'' happen vectorized in
    Arrow compute."""
    import pyarrow as pa
    import pyarrow.compute as pc

    os.makedirs(path, exist_ok=True)
    name = f".{prefix}-{uuid.uuid4().hex}.tsv.tmp"
    rows = 0
    with open(os.path.join(path, name), "w", encoding="utf-8") as fh:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            cols = [
                pc.fill_null(batch.column(i).cast(pa.string()), "")
                for i in range(batch.num_columns)
            ]
            lines = (
                cols[0]
                if len(cols) == 1
                else pc.binary_join_element_wise(*cols, "\t")
            )
            fh.write("\n".join(lines.to_pylist()))
            fh.write("\n")
            rows += batch.num_rows
    return TsvCommit(name, rows)


def _publish(path: str, messages, *, replace_glob: str | None) -> int:
    """Driver-side commit: optionally clear files matching
    replace_glob (overwrite / epoch replay), then rename temps."""
    if replace_glob is not None:
        for old in glob.glob(os.path.join(path, replace_glob)):
            os.remove(old)
    total = 0
    for m in messages:
        final = m.tmp_file.removeprefix(".").removesuffix(".tmp")
        os.replace(
            os.path.join(path, m.tmp_file), os.path.join(path, final)
        )
        total += m.rows
    return total


def _discard(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(path, m.tmp_file))


class TsvBatchWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool) -> None:
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator) -> TsvCommit:
        return _write_tmp(self._path, "part", iterator)

    def commit(self, messages) -> None:
        total = _publish(
            self._path,
            messages,
            replace_glob="part-*.tsv" if self._overwrite else None,
        )
        with open(os.path.join(self._path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages) -> None:
        _discard(self._path, messages)


class TsvStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink half: same line assembly, epoch-scoped names.

    ``commit(messages, batchId)`` is the exactly-once pivot: epoch
    files are ``part-b{batchId}-*.tsv`` and commit clears that epoch's
    glob before renaming, so Spark's replay of an uncheckpointed batch
    (crash between sink commit and offset-log write) converges to one
    copy. The ``_epochs`` log records (batchId, rows) per commit for
    downstream consumers that need the watermark frontier."""

    def __init__(self, path: str) -> None:
        self._path = path

    def write(self, iterator) -> TsvCommit:
        # batchId is not visible inside the task in this API; the
        # temp name is epoch-less and commit() stamps the epoch at
        # rename time (driver side, where batchId is authoritative).
        return _write_tmp(self._path, "stage", iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        total = 0
        for old in glob.glob(
            os.path.join(self._path, f"part-b{batchId}-*.tsv")
        ):
            os.remove(old)
        for m in messages:
            final = (
                f"part-b{batchId}-"
                + m.tmp_file.removeprefix(".stage-").removesuffix(".tmp")
            )
            os.replace(
                os.path.join(self._path, m.tmp_file),
                os.path.join(self._path, final),
            )
            total += m.rows
        with open(os.path.join(self._path, "_epochs"), "a") as fh:
            fh.write(f"{batchId}\t{total}\n")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard(self._path, messages)


class TsvSinkDataSource(DataSource):
    """``format("tsv_sink")`` — custom connector: batch write,
    streaming write, and streaming read (tail the epoch log)."""

    @classmethod
    def name(cls) -> str:
        return "tsv_sink"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("tsv_sink requires a path")
        return path

    def schema(self) -> str:
        # Default when the stream reader gets no explicit schema:
        # whole lines, unsplit (TSV itself is untyped).
        return "line string"

    def writer(self, schema, overwrite: bool) -> TsvBatchWriter:
        return TsvBatchWriter(self._path(), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> TsvStreamWriter:  # noqa: N802
        return TsvStreamWriter(self._path())

    def streamReader(self, schema) -> "TsvStreamReader":  # noqa: N802
        return TsvStreamReader(self._path(), len(schema.fieldNames()))


def register_tsv_sink(spark) -> None:
    spark.dataSource.register(TsvSinkDataSource)


class _EpochPartition(InputPartition):
    def __init__(self, epoch: int, files: list[str]) -> None:
        self.epoch = epoch
        self.files = files


class TsvStreamReader(DataSourceStreamReader):
    """Streaming READ half — tails the sink's ``_epochs`` commit log.

    Offsets are ``{"epoch": n}`` = "all epochs ≤ n consumed"; the
    commit log (not a directory listing) is the source of truth, so a
    half-renamed crash window can never surface uncommitted files.
    ``partitions(start, end)`` emits one InputPartition per newly
    committed epoch carrying its file list — epochs scan in parallel
    and replaying a micro-batch re-reads exactly the same files
    (offsets pin the work, the idempotent-read contract).

    The directory therefore becomes a durable, replayable queue:
    writer and reader coordinate only through _epochs appends, the
    same log-compaction-free pattern as a file-based message bus.
    The schema is fixed string columns (c0..cN-1 for ``ncols``) —
    TSV carries no types; readers cast downstream."""

    def __init__(self, path: str, ncols: int) -> None:
        self._path = path
        self._ncols = ncols

    def initialOffset(self) -> dict:  # noqa: N802
        return {"epoch": -1}

    def _committed(self) -> list[int]:
        log = os.path.join(self._path, "_epochs")
        if not os.path.exists(log):
            return []
        out = []
        for ln in open(log).read().splitlines():
            if ln.strip():
                out.append(int(ln.split("\t")[0]))
        return out

    def latestOffset(self) -> dict:  # noqa: N802
        eps = self._committed()
        return {"epoch": max(eps) if eps else -1}

    def partitions(self, start: dict, end: dict):
        parts = []
        for e in self._committed():
            if start["epoch"] < e <= end["epoch"]:
                files = sorted(
                    glob.glob(os.path.join(self._path, f"part-b{e}-*.tsv"))
                )
                parts.append(_EpochPartition(e, files))
        # Spark requires ≥1 partition per batch; an empty epoch range
        # yields one no-file partition (reads nothing).
        return parts or [_EpochPartition(end["epoch"], [])]

    def read(self, partition: _EpochPartition):
        for f in partition.files:
            with open(f, encoding="utf-8") as fh:
                for ln in fh.read().splitlines():
                    if self._ncols == 1:
                        yield (ln,)
                        continue
                    cells = ln.split("\t")
                    cells += [""] * (self._ncols - len(cells))
                    yield tuple(cells[: self._ncols])

    def commit(self, end: dict) -> None:
        pass
