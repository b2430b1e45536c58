"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a partition-planned JSONL (line-delimited JSON) reader.

Why this exists: the reference's ingest edge accepts line-delimited
JSON exports alongside CSV (`src/ingest_metrics.py` handles the
pipe-encoded CSV shape; this is the JSON sibling), and Spark 4's
Python DataSource API is the sanctioned way to add a format without a
JVM jar — the reader declares one InputPartition PER FILE, so Spark
schedules files across executors exactly like a built-in source, and
the per-partition `read()` streams tuples without ever materializing
a file list's worth of rows on the driver.

Semantics (pinned by tests/test_pydatasource.py):
- schema is caller-declared (`.schema(...)`) or the documents-shaped
  default; supported field types: bigint/long, double, string.
- one JSON object per line; a malformed line, or a field that is
  missing or of the wrong JSON type, yields NULL for that field — the
  same null-not-error contract as s3_props_json's from_json and the
  alias-tolerant CSV source (sources/csv.py).
- files are read in sorted-name order within a deterministic
  partition list, so the (file -> partition) mapping is stable across
  runs.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
)


class JsonlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _coerce(value, dtype):
    """JSON value -> Spark field value, null on type mismatch (the
    from_json stance: integers for long — a JSON float/string/bool is
    NOT silently truncated into one)."""
    if value is None:
        return None
    if isinstance(dtype, LongType):
        # bool is an int subclass in Python; JSON true must NOT be 1
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return value if -(2**63) <= value < 2**63 else None
    if isinstance(dtype, DoubleType):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        return float(value)
    if isinstance(dtype, StringType):
        return value if isinstance(value, str) else None
    return None


class JsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_rows: the 'path' option is required")
        self._schema = schema

    def partitions(self):
        pattern = (
            os.path.join(self._path, "*.jsonl")
            if os.path.isdir(self._path)
            else self._path
        )
        files = sorted(glob.glob(pattern))
        if not files:
            raise FileNotFoundError(f"jsonl_rows: no files match {pattern}")
        return [JsonlFilePartition(f) for f in files]

    def read(self, partition: JsonlFilePartition):
        fields = [(f.name, f.dataType) for f in self._schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    obj = None
                if not isinstance(obj, dict):
                    yield tuple(None for _ in fields)
                    continue
                yield tuple(_coerce(obj.get(n), t) for n, t in fields)


class JsonlDataSource(DataSource):
    """spark.read.format("jsonl_rows").schema(...).option("path", d)"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_rows"

    def schema(self) -> str:
        # documents-shaped default; callers usually declare their own
        return "doc_id bigint, text string, lang string, source string"

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
