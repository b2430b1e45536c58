"""Streaming domain router: batch t_code_detect's code-vs-prose
routing applied to documents on arrival.

A mixture ingest pipeline partitions incoming documents by domain the
moment they land (code and prose get separate dedup rules, quality
thresholds, and sampling temperatures downstream), so the router is
the FIRST streaming stage in front of every other gate in this
package. Both signals (symbol-density ppm, code-keyword count) are
pure per-row expressions, so the streaming form is STATELESS — no
watermark, no state store, no shuffle; per-document cost is O(chars)
and the router scales with the scan at 100 TB. The route column is
exactly the partition key a `partitionBy("route")` sink consumes.

Batch and stream share ONE projection (`textstats.code_route_signals`)
— unlike the other gates, whose batch plans differ in shape, the two
paths here are the identical stateless select, so the definition lives
once and the parity test pins the wiring rather than a hand-mirrored
copy.

Trigger guidance: quality.py's measured policy applies unchanged
(stateless gates share the ~0.55 s per-micro-batch floor) — use
`quality.apply_trigger` / `BACKFILL_TRIGGER` / `INGEST_TRIGGER`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.textstats import code_route_signals


def with_route(docs: DataFrame, plant: bool = True) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, n_sym, n_kw, sym_ppm, route).
    Works identically on batch and streaming DataFrames; see
    `textstats.code_route_signals` (the single shared definition)."""
    return code_route_signals(docs, plant=plant)


def stream_route(
    spark: SparkSession, docs_dir: str, plant: bool = False
) -> DataFrame:
    """Streaming source over a documents directory -> per-document
    route verdicts on arrival.

    ``plant`` defaults to False: this is the real-ingest entry point,
    and `code_route_signals`' planted snippet schedule exists only so
    the synthetic all-prose corpus exercises the code branch in tests
    and the driver oracle. The batch-parity test passes ``plant=True``
    explicitly to pin the shared projection against t_code_detect."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return with_route(stream, plant=plant)
