"""Distributed .xlsx scan — a Spark 4 Python Data Source (S6 at scale).

``read_excel_source`` parses ONE workbook on the driver, which is the
reference's own position for a single crawler-landed artifact
(``zavod/zavod/helpers/excel.py:72-210``). A crawl that lands thousands
of workbooks needs the parse distributed: this DataSource plans one
input partition per .xlsx file, so executors run the same stdlib
zip+XML parser in parallel and the scan scales with the cluster, not
the driver.

Usage::

    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .option("sheet", "Sheet1")     # sheet name or index, default 0
          .load("/landed/*.xlsx"))       # file, glob, or directory

Schema: inferred from the header row of the first matching file (every
cell STRING — the reference's cell-to-string semantics); pass an
explicit ``.schema(...)`` to skip inference. Each file's own header row
is dropped; data rows are padded / truncated to the schema width, so a
ragged workbook cannot poison the scan.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


def _matching_files(path: str) -> list[str]:
    pattern = os.path.join(path, "*.xlsx") if os.path.isdir(path) else path
    files = sorted(p for p in glob.glob(pattern) if p.lower().endswith(".xlsx"))
    if not files:
        raise FileNotFoundError(f"no .xlsx files match {path!r}")
    return files


def _sheet_option(options) -> str | int:
    sheet = options.get("sheet", "0")
    return int(sheet) if isinstance(sheet, str) and sheet.lstrip("-").isdigit() else sheet


def header_names(first_row: list[str | None]) -> list[str]:
    """Header cells → unique column names (None → positional)."""
    return [h if h else f"col_{i}" for i, h in enumerate(first_row)]


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx")`` — partition-per-workbook scan."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        from opensanctions_spark.sources import _xlsx_rows

        files = _matching_files(self.options["path"])
        rows = _xlsx_rows(files[0], _sheet_option(self.options))
        if not rows:
            raise ValueError(f"empty worksheet in {files[0]}")
        return StructType(
            [StructField(h, StringType()) for h in header_names(rows[0])]
        )

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(schema, self.options)


class XlsxReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        self.width = len(schema.fields)
        self.files = _matching_files(options["path"])
        self.sheet = _sheet_option(options)

    def partitions(self) -> list[InputPartition]:
        # one partition per workbook: the parse parallelizes across the
        # cluster, and a huge landing directory never serializes on the
        # driver (file listing stays driver-side and tiny — paths only)
        return [InputPartition(p) for p in self.files]

    def read(self, partition: InputPartition):
        from opensanctions_spark.sources import _xlsx_rows

        rows = _xlsx_rows(partition.value, self.sheet)
        for row in rows[1:]:  # this file's header row
            yield tuple((row + [None] * self.width)[: self.width])
