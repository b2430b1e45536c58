"""PySpark-native analytics engine with the query semantics of
PatrickRyanLane/risk-dashboard-database.

The reference (read-only at /root/reference) is a Postgres + Flask
reputation-risk analytics stack; it has no custom execution engine of
its own — Postgres plans/executes and Python post-processes. This
package re-expresses the reference's entire operator inventory
(SURVEY.md §2) Spark-first: declarative DataFrame/SQL plans optimized
by Catalyst, columnar Parquet storage partitioned by date, window
functions for the temporal semantics, and Arrow-batched Pandas UDFs
only where built-ins genuinely can't express the semantics.

Layout:
    session     -- SparkSession factory tuned for the workload
    tables      -- testdata loaders / temp-view registration
    functions/  -- scalar function library (urls, text, scoring, hashing)
    operators/  -- reusable DataFrame->DataFrame operators
    sources/    -- readers (CSV alias-tolerant, pipe-series, parquet)
    plans/      -- named query library (the reference's ~40 endpoint
                   queries re-expressed over the synthetic star schema,
                   plus the MV-stack builders)
    streaming/  -- Structured Streaming mappings of the daily batch ops
"""

__version__ = "0.1.0"
