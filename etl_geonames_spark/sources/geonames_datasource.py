"""A Spark 4 Python DataSource for the raw GeoNames dump format.

The reference implements its own reader: readline → split('\\t') →
zipObj on one thread (geonames.js:69-80, 239-242). The engine's
primary scan path is Spark's built-in CSV source (sources/tsv.py), but
this module re-expresses the reference's *custom reader* idea the
Spark-native way: a ``DataSource`` V2 implementation in Python
(``spark.dataSource.register`` + ``format("geonames")``) with

  - one input partition per dump file — a multi-file dump
    (allCountries split, or per-country files) scans in parallel;
  - Arrow ``RecordBatch`` output from ``pyarrow.csv`` — batch-at-a-
    time columnar transfer, never a Python row loop;
  - ``EqualTo`` filter pushdown on the 19 string columns — a
    ``countryCode = 'NL'`` predicate is applied inside the scan
    (vectorized ``pyarrow.compute``), so filtered dumps never
    materialize unfiltered rows into Spark.

Semantics match ``sources.tsv.read_all_countries``: 19 positional
string columns, empty field → NULL, no quote handling (GeoNames TSVs
carry raw ``"`` characters).

At 100 TB the built-in CSV reader stays the default (JVM, whole-stage
codegen, block-level splits of single huge files); the Python source
is the template for formats Spark has no reader for — it demonstrates
partition planning, Arrow transfer, and pushdown, which are the three
things a custom connector must get right.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)

from etl_geonames_spark.schemas import ALL_COUNTRIES_COLUMNS, ALL_COUNTRIES_SCHEMA


class GeonamesDataSource(DataSource):
    """``spark.read.format("geonames").load(path)`` for GeoNames TSVs."""

    @classmethod
    def name(cls) -> str:
        return "geonames"

    def schema(self):
        return ALL_COUNTRIES_SCHEMA

    def reader(self, schema) -> "GeonamesReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("geonames datasource requires a path")
        return GeonamesReader(path)

    def writer(self, schema, overwrite: bool) -> "GeonamesArrowWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("geonames datasource requires a path")
        if list(schema.fieldNames()) != ALL_COUNTRIES_COLUMNS:
            raise ValueError(
                "geonames writer needs the 19 dump columns in dump order; "
                f"got {schema.fieldNames()}"
            )
        return GeonamesArrowWriter(path, overwrite)


class GeonamesReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self._path = path
        self._pushed: list[EqualTo] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Accept EqualTo on dump columns; everything else stays in
        Spark. Spark re-applies even accepted filters only if we
        returned them — consumed ones are fully handled here."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and (
                f.attribute[0] in ALL_COUNTRIES_COLUMNS
            ):
                self._pushed.append(f)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        """One partition per dump file (dir/glob/single file). File
        paths resolve on the driver; executors receive only the path
        string inside the InputPartition."""
        import glob
        import os

        p = self._path
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.txt")))
        else:
            files = sorted(glob.glob(p)) or [p]
        if not files:
            raise FileNotFoundError(f"no geonames dump files under {p!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator:
        """Yield Arrow RecordBatches for one dump file, applying pushed
        equality filters vectorized before anything reaches Spark."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyarrow import csv as pacsv

        table = pacsv.read_csv(
            partition.value,
            read_options=pacsv.ReadOptions(
                column_names=ALL_COUNTRIES_COLUMNS
            ),
            parse_options=pacsv.ParseOptions(
                delimiter="\t", quote_char=False
            ),
            convert_options=pacsv.ConvertOptions(
                column_types={c: pa.string() for c in ALL_COUNTRIES_COLUMNS},
                null_values=[""],
                strings_can_be_null=True,
            ),
        )
        for f in self._pushed:
            table = table.filter(
                pc.equal(table.column(f.attribute[0]), pa.scalar(f.value))
            )
        yield from table.to_batches()


def register_geonames_source(spark) -> None:
    # implementing pushFilters requires opting in (off by default in 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GeonamesDataSource)


class GeonamesCommit(WriterCommitMessage):
    """Per-task commit record: the temp file a task wrote + row count.

    Must be picklable (travels executor → driver)."""

    def __init__(self, tmp_file: str, rows: int) -> None:
        self.tmp_file = tmp_file
        self.rows = rows


class GeonamesArrowWriter(DataSourceArrowWriter):
    """TSV dump writer: Arrow batches → tab-separated text, one part
    file per task, two-phase commit.

    Tasks write to hidden ``.part-<uuid>.txt.tmp`` names; only
    :meth:`commit` (driver, after ALL tasks succeed) renames them to
    visible ``part-*.txt`` — a speculative/retried task that loses
    the race leaves at most an orphaned ``.tmp`` that ``abort``
    or the next overwrite sweeps, never a half-visible file. This is
    the same rename-on-commit protocol Spark's FileFormatWriter uses
    (valid on any filesystem with atomic rename; object stores swap
    in a manifest commit instead, same message flow).
    """

    def __init__(self, path: str, overwrite: bool) -> None:
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator) -> GeonamesCommit:
        import os
        import uuid

        import pyarrow.compute as pc

        os.makedirs(self._path, exist_ok=True)
        name = f".part-{uuid.uuid4().hex}.txt.tmp"
        tmp = os.path.join(self._path, name)
        rows = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                # Vectorized line assembly (NULL → empty field, the
                # reader's null_values=[""] convention). pyarrow's CSV
                # writer refuses raw '"' under quoting_style="none"
                # (RFC4180), but the GeoNames dump format is quote-less
                # TSV with literal quotes in names — so the tab join
                # happens in Arrow compute, not a CSV writer.
                cols = [
                    pc.fill_null(batch.column(i), "")
                    for i in range(batch.num_columns)
                ]
                lines = pc.binary_join_element_wise(*cols, "\t")
                fh.write("\n".join(lines.to_pylist()))
                fh.write("\n")
                rows += batch.num_rows
        return GeonamesCommit(name, rows)

    def commit(self, messages) -> None:
        import glob
        import os

        if self._overwrite:
            for old in glob.glob(os.path.join(self._path, "part-*.txt")):
                os.remove(old)
        total = 0
        for m in messages:
            final = m.tmp_file.removeprefix(".").removesuffix(".tmp")
            os.replace(
                os.path.join(self._path, m.tmp_file),
                os.path.join(self._path, final),
            )
            total += m.rows
        with open(os.path.join(self._path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages) -> None:
        import contextlib
        import os

        for m in messages:
            if m is None:
                continue
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(self._path, m.tmp_file))
