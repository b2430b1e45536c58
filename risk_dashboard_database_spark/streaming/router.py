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

Parity contract (tested): availableNow replay over the real documents
table (with the same planted-snippet schedule) emits per document the
identical (n_sym, n_kw, sym_ppm, route) row as the DuckDB-oracle-
verified batch `t_code_detect` — a cross-implementation check against
the shared column expressions.

Trigger guidance: quality.py's measured policy applies unchanged
(stateless gates share the ~0.55 s per-micro-batch floor) — use
`quality.apply_trigger` / `BACKFILL_TRIGGER` / `INGEST_TRIGGER`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.textstats import _CODE_KW_RE, _CODE_SNIPPET, _CODE_SYM_RE


def with_route(docs: DataFrame, plant: bool = True) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, n_sym, n_kw, sym_ppm, route).
    Works identically on batch and streaming DataFrames. `plant`
    mirrors t_code_detect's deterministic snippet schedule (the
    synthetic corpus carries no code); pass False for real ingest."""
    text = (
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit(_CODE_SNIPPET)),
        ).otherwise(F.col("text"))
        if plant
        else F.col("text")
    )
    t = docs.select("doc_id", text.alias("__t"))
    n_sym = F.size(F.regexp_extract_all("__t", F.lit(_CODE_SYM_RE), F.lit(0)))
    n_kw = F.size(F.regexp_extract_all("__t", F.lit(_CODE_KW_RE), F.lit(0)))
    n_tok = F.size(F.split(F.col("__t"), " "))
    sig = t.select(
        "doc_id",
        n_sym.cast("long").alias("n_sym"),
        n_kw.cast("long").alias("n_kw"),
        n_tok.cast("long").alias("n_tok"),
    )
    sym_ppm = F.expr("(n_sym * 1000000) div n_tok")
    return sig.select(
        "doc_id",
        "n_sym",
        "n_kw",
        sym_ppm.cast("long").alias("sym_ppm"),
        F.when((F.col("n_kw") >= 2) & (sym_ppm >= 50000), "code")
        .otherwise("prose")
        .alias("route"),
    )


def stream_route(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Streaming source over a documents directory -> per-document
    route verdicts on arrival."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return with_route(stream)
