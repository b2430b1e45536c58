"""Object-store source routing (SURVEY §2.1 S3).

The reference opens `gs://` objects through a thin helper
(`src/gcs_utils.py:18-34`, `src/bulk_ingest.py:81-99`). In Spark the
data path is scheme-routed by the Hadoop filesystem layer, so one
reader covers local files, `gs://` (GCS connector), `s3a://`, and
`abfss://` identically — the engine code does not change per store.
Tests exercise the routing with `file://` URIs; cloud schemes need
only the connector jar + credentials on the cluster classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "text"}


def read_objects(
    spark: SparkSession,
    uri: str,
    fmt: str = "parquet",
    **options,
) -> DataFrame:
    """Read a dataset from any Hadoop-filesystem URI (file://, gs://,
    s3a://, ...). Format-specific options pass through (e.g.
    header=True for csv)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(uri)


def object_exists(spark: SparkSession, uri: str) -> bool:
    """Existence probe (`src/gcs_utils.py:27-34` analog) via the
    Hadoop FileSystem API, scheme-routed like the reads."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(conf)
    return bool(fs.exists(path))
