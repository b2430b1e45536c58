"""Sources and sinks (SURVEY §2.1).

- csv: alias-tolerant CSV reader + tolerant bool coercion (S1)
- series: pipe-encoded series explode (S2)
- sinks: MERGE upsert w/ conditional merge, date-partitioned writes,
  window rebuild, CSV/JSON serving sinks, TTL cache (S6-S11, S13)
- bucketed: bucketed tables for co-located, exchange-free joins
- object_store: scheme-routed object reads (S3/GCS/local) + existence
"""

from . import bucketed, csv, object_store, series, sinks  # noqa: F401
