"""Source-operator query entries (SURVEY §2.1 S2).

s2 round-trips the pipe-encoded series format through the REAL source
operator: it first ENCODES the daily series into the reference's
interchange shape (`price_history='v1|v2|..'`, `date_history=
'd1|d2|..'`, `src/ingest_metrics.py:8-26`), then decodes it with
`explode_pipe_series` (split + arrays_zip + explode). The oracle skips
the round trip entirely and aggregates the daily grain directly — if
encode or decode drops/reorders/misaligns anything, the hash breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.series import explode_pipe_series
from ..tables import load_table
from .common import USER_DAY_CTE, user_day
from .registry import query

DATE_FMT = "yyyy-MM-dd"


@query(
    "s2_pipe_series_explode",
    oracle=f"""
    WITH {USER_DAY_CTE}
    SELECT user_id,
           STRFTIME(date, '%Y-%m-%d') AS date,
           CAST(total AS BIGINT) AS value
    FROM user_day
    """,
)
def s2_pipe_series_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-encoded series encode->decode round trip (S2)."""
    ud = user_day(spark, sf_dir)
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("date"), F.col("total")))
    )
    encoded = ud.groupBy("user_id").agg(
        F.array_join(
            F.transform(pairs, lambda p: F.date_format(p["date"], DATE_FMT)), "|"
        ).alias("date_history"),
        F.array_join(
            F.transform(pairs, lambda p: p["total"].cast("string")), "|"
        ).alias("value_history"),
    )
    exploded = explode_pipe_series(encoded, "date_history", "value_history")
    return exploded.select(
        "user_id", "date", F.col("value").cast("long").alias("value")
    )


# ---------------------------------------------------------- s_profile
# ANALYZE-style table statistics — the stats card a cost-based
# optimizer (and every capacity-planning review) reads: per column,
# null count and distinct-value count over one pass of the table.
# TWO registered forms: s_table_profile is the EXACT card — the
# once-per-dataset audit/build path (its multi-COUNT(DISTINCT) Expand
# is linear but heavy: 18.5x at 100x, measured r11) —
# s_table_profile_approx is the serving path you run on every
# refresh: d26's KMV sketch for NDV, corpus-independent merge
# traffic, still hash-exact cross-engine because KMV is
# deterministic.

_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate",
)


@query(
    "s_table_profile",
    oracle="\n    UNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def s_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics card for the biggest fact table: one row per
    column with row count, null count, and exact NDV. This is the
    AUDIT/BUILD form (run once per dataset, e.g. to calibrate the
    sketch); the per-refresh serving form is s_table_profile_approx.

    Spark shape: ONE agg over ONE scan computes every column's
    count/ndv together (the multi-COUNT(DISTINCT) Expand — each input
    row fans to |cols|+1 grouping rows BEFORE the map-side combine
    absorbs them, the standard single-pass ANALYZE plan); the 1-row
    result unpivots to the card via a stack() projection, no second
    scan. The oracle reads the table once per column instead — the
    gate pins that the fused pass equals the per-column truth."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__ndv_{c}"))
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, ndv)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "ndv")


# ----------------------------------------------- s_table_profile_approx
# The 100 TB serving form of the profile card (VERDICT r11 "what's
# missing" #1, turning the BENCH_NOTES prose into code): the NDV
# column comes from d26's deterministic KMV sketch instead of the
# exact multi-COUNT(DISTINCT) Expand. The exact card stays registered
# as the once-per-dataset audit/build path; THIS is the card you run
# on every refresh. KMV over md5 is a pure function of the data, so
# the estimate is bit-identical on any engine and any partitioning —
# the same cross-engine-exact stance as d26/d11 — and the driver gate
# checks it hash-exactly, not "approximately".
#
# Scale shape — MEASURED, two candidate plans A/B'd at 100x lineitem
# before merge (the d66 discipline; full table in BENCH_NOTES r12):
# a mapInPandas partition-local KMV fold (corpus-independent merge
# traffic by construction) measured 2.53 s / 125 s (sf0.1 / 100x) —
# the Arrow transfer of 11 x n (col_id, hv) rows through Python
# dwarfs everything — and was REJECTED for the declarative d26 shape
# shipped here: hash JVM-side, partial-agg dedup (map-side combine),
# ONE distinct-volume exchange, then a WindowGroupLimit rank whose
# second exchange moves only ~K x partitions rows per column:
# 1.32 s / 44.6 s. For comparison the exact card reads 0.81 s / 15 s
# on the same box — the stack-to-string + md5 tax is real, and at
# local[32] scale the exact card is simply faster. What the sketch
# buys is not local latency but STATE: the exact card's final agg
# holds every distinct value of every column at once (NDV-sized
# reduce state per column — the thing that falls over first on a
# 1000-executor 100 TB run), while the sketch's post-dedup state is
# K longs per column per partition, rank-pushed before the merge.
# Run the exact card once per dataset as the audit; run this one on
# every refresh where reduce-state headroom matters.

PROFILE_KMV_K = 256  # rel. std. error ~ 1/sqrt(K-2) ~ 6.3%

# Canonical per-type string encodings, chosen to be engine-identical:
# integers and 2dp fixed-point floors print the same on Spark and
# DuckDB; timestamps go through an explicit second-grain format (the
# j12 STRFTIME convention); raw doubles NEVER hit md5 directly (their
# shortest-round-trip printing differs between engines).
_PROF_ENC_SPARK = {
    "int": "CAST({c} AS STRING)",
    "dec2": "CAST(CAST(FLOOR({c} * 100.0) AS BIGINT) AS STRING)",
    "ts": "date_format({c}, 'yyyy-MM-dd HH:mm:ss')",
    "str": "{c}",
}
_PROF_ENC_DUCK = {
    "int": "CAST({c} AS VARCHAR)",
    "dec2": "CAST(CAST(FLOOR({c} * 100.0) AS BIGINT) AS VARCHAR)",
    "ts": "STRFTIME({c}, '%Y-%m-%d %H:%M:%S')",
    "str": "{c}",
}
_PROFILE_TYPES = {
    "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
    "l_linenumber": "int", "l_quantity": "dec2",
    "l_extendedprice": "dec2", "l_discount": "dec2", "l_tax": "dec2",
    "l_returnflag": "str", "l_linestatus": "str", "l_shipdate": "ts",
}


def _profile_approx_oracle() -> str:
    from .dedup import _KMV_HEX_CHARS, _KMV_SCALE

    k = PROFILE_KMV_K
    legs = []
    for c in _PROFILE_COLS:
        enc = _PROF_ENC_DUCK[_PROFILE_TYPES[c]].format(c=c)
        hv = f"""list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, {_KMV_HEX_CHARS + 1}),
                   i -> CAST(instr('0123456789abcdef',
                                   substr(md5(sval), i, 1)) - 1 AS BIGINT))),
               (acc, v) -> acc * 16 + v)"""
        legs.append(f"""SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           (SELECT CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE ({k} - 1) / (CAST(MAX(hv) AS DOUBLE) / {_KMV_SCALE}.0)
                   END
            FROM (SELECT DISTINCT hv FROM
                    (SELECT {hv} AS hv FROM
                       (SELECT DISTINCT {enc} AS sval FROM lineitem
                        WHERE {c} IS NOT NULL))
                  ORDER BY hv LIMIT {k})) AS ndv_est
    FROM lineitem""")
    return "\n    UNION ALL\n".join(legs)


@query("s_table_profile_approx", oracle=_profile_approx_oracle())
def s_table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile card with KMV-sketch NDV (the 100 TB serving path).

    stack() unpivots each row to (col_id, canonical string) pairs;
    the exact n_rows/n_nulls counts are a map-side-combinable agg on
    that stream; the NDV branch dedups the (col_id, sval) pairs FIRST
    (partial-agg map-side combine — the ONE corpus-sized exchange,
    exactly the oracle's inner SELECT DISTINCT enc), so md5 runs once
    per DISTINCT value (r15, guide §1.2: measured 754k distinct vs
    6.6M stacked instances at sf0.1 — an 8.75x cut in hash work;
    interleaved A/B med 1.04 -> 0.71 s, parity exact). The hash (md5
    -> 52-bit prefix, d26's convention) then ranks per column with a
    dense_rank window — dense_rank, not row_number, because two
    distinct svals may collide to one hv and the oracle re-distincts
    the hv stream; countDistinct(hv) under the rank cut reproduces
    its COUNT(*) over DISTINCT hv LIMIT K exactly, with no extra
    hv-grain exchange. A mapInPandas partial fold was measured and
    rejected (see the block comment above). The estimate
    (K-1)/frac(h_K) uses one IEEE division of engine-exact integers,
    so DuckDB reproduces it to the last bit. Columns with NDV < K
    report the exact count (the sketch IS the value set)."""
    from .dedup import _KMV_HEX_CHARS, _KMV_SCALE

    li = load_table(spark, sf_dir, "lineitem")
    k = PROFILE_KMV_K
    pairs = ", ".join(
        f"{i}, {_PROF_ENC_SPARK[_PROFILE_TYPES[c]].format(c=c)}"
        for i, c in enumerate(_PROFILE_COLS)
    )
    stacked = li.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {pairs}) AS (col_id, sval)"
        )
    )
    # OPTIMIZATION r14 (guide §2.3 "shuffle fewer bytes" / §1.2): the
    # first-shipped plan ran the n_rows/n_nulls branch as a SECOND
    # full pass over the stack()-encoded string stream — 6.6M
    # canonical strings (date_format, fixed-point casts, concat)
    # built twice per execution. Exact counts don't need the string
    # encodings at all: one native 1-row columnar aggregate over the
    # raw columns (count + per-column null sums, no stack, no
    # strings) replaces that branch, and the md5/KMV leg keeps its
    # original shape. Plan diff: the counts-side Project[11 string
    # exprs]+partial-agg over 6.6M rows collapses to a 1-row
    # HashAggregate over the native columns; A/B at sf0.1:
    # 2.22 -> 1.57 s min solo, identical output (oracle re-verified
    # at both SFs).
    count_aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in _PROFILE_COLS:
        count_aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
    one = li.agg(*count_aggs)
    cstack = ", ".join(
        f"{i}, __nulls_{c}" for i, c in enumerate(_PROFILE_COLS)
    )
    counts = one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {cstack}) AS (col_id, n_nulls)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_id", "n_rows", "n_nulls")
    vals = stacked.where(F.col("sval").isNotNull()).distinct()
    kmv_in = vals.select(
        "col_id",
        F.conv(F.substring(F.md5(F.col("sval")), 1, _KMV_HEX_CHARS), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    rk = F.dense_rank().over(Window.partitionBy("col_id").orderBy("hv"))
    kept = kmv_in.withColumn("rk", rk).where(F.col("rk") <= k)
    sketch = kept.groupBy("col_id").agg(
        F.countDistinct("hv").alias("k_kept"), F.max("hv").alias("hv_k")
    )
    est = F.when(
        F.col("k_kept") < k, F.col("k_kept").cast("double")
    ).otherwise(
        F.lit(k - 1) / (F.col("hv_k").cast("double") / F.lit(float(_KMV_SCALE)))
    )
    names = F.array(*[F.lit(c) for c in _PROFILE_COLS])
    return (
        counts.join(sketch, "col_id", "left")
        .select(
            F.element_at(names, F.col("col_id") + 1).alias("column_name"),
            "n_rows",
            "n_nulls",
            F.coalesce(est, F.lit(0.0)).alias("ndv_est"),
        )
    )


# ---------------------------------------------------------- s3_props
# Semi-structured extraction with an EXPLICIT schema — the events
# table's `props` column is a JSON payload, and the 100 TB form of
# reading it is from_json with a declared struct (one expression, no
# schema-inference pass over the corpus, exactly the a18
# explicit-value-list stance applied to JSON). The oracle extracts
# the same field with DuckDB's JSON functions, so the gate pins the
# two engines' JSON parsing against each other.


_S3_K_DUCK_SQL = """CASE WHEN props IS NOT NULL AND json_valid(props)
                  AND json_type(json_extract(props, '$.k'))
                      IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract_string(props, '$.k')
                                AS BIGINT) END"""


@query(
    "s3_props_json",
    # The oracle mirrors Spark's from_json('k BIGINT') semantics
    # EXACTLY, not just on clean data (code-review r12 #1): Spark
    # yields a non-null k ONLY for a JSON integer token that fits
    # BIGINT — malformed JSON, missing key, 1.5, "7" (string-typed),
    # true, null, and uint64-overflow all parse to NULL. The naive
    # json_extract_string + CAST diverges on every one of those
    # (raises on invalid JSON; rounds '1.5' to 2; accepts '"7"'), so
    # the guard below checks json_valid + the JSON token TYPE and
    # TRY_CASTs for overflow. Pinned against Spark on a 13-case edge
    # corpus in tests/test_r12_ops.py.
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_unparsed,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max
    FROM (
      SELECT event_type,
             {_S3_K_DUCK_SQL} AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def s3_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over a JSON-extracted property: count,
    unparsed count, and integer sum/min/max of props.k.

    Spark shape: from_json(props, 'k BIGINT') — the declared-schema
    parse that keeps the scan single-pass (schema inference would be
    a second corpus read) and null-safe (malformed JSON yields a null
    struct, counted in n_unparsed, never an error) — then one
    map-side-combinable agg. Integer aggregates only, so the hash
    comparison is exact by construction."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.count(F.lit(1)) - F.count("k")).cast("long").alias("n_unparsed"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


# ---------------------------------------------------------------- s5
# Spark 4 VARIANT surface (the third new-API exercise after r12's
# Python DataSource and transformWithState): semi-structured event
# properties parsed ONCE into the binary VARIANT encoding, then typed
# paths extracted without re-parsing — the open-schema ingestion shape
# (shredded at scan time on managed tables). The corpus's stored props
# are uniform {"k": int}, so the card CONSTRUCTS its semi-structured
# payload deterministically from event fields — nested object, array,
# a json-null leg (event_id % 7) and a truncated/malformed leg
# (event_id % 13) — with ONE builder SQL text shared by both engines,
# so every edge class the r12 s3 lesson catalogued (malformed JSON,
# json null vs missing, typed extraction) is value-checked.
_S5_JSON_BUILD = """
  '{"id": ' || CAST(event_id AS STRING)
  || ', "meta": {"type": "' || event_type
  || '", "vals": [' || CAST(user_id AS STRING)
  || ', ' || CAST(event_id % 100 AS STRING)
  || ']}, "score": '
  || CASE WHEN event_id % 7 = 0 THEN 'null'
          ELSE CAST(event_id % 5 AS STRING) END
  || '}'
"""
_S5_MANGLE = (
    "CASE WHEN event_id % 13 = 0 THEN substring(j0, 1, length(j0) - 1)"
    " ELSE j0 END"
)


@query(
    "s5_props_variant",
    oracle=f"""
    WITH built AS (
      SELECT event_id, ({_S5_JSON_BUILD}) AS j0 FROM events
    ),
    src AS (
      SELECT event_id, {_S5_MANGLE} AS j FROM built
    )
    SELECT event_id,
           CAST(json_valid(j) AS INTEGER) AS parsed,
           CASE WHEN json_valid(j)
                THEN json_extract_string(j, '$.meta.type') END AS etype,
           CASE WHEN json_valid(j)
                THEN TRY_CAST(json_extract(j, '$.meta.vals[1]') AS BIGINT)
           END AS val1,
           CASE WHEN json_valid(j)
                 AND json_type(j, '$.score') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract(j, '$.score') AS BIGINT)
           END AS score,
           CASE WHEN json_valid(j)
                THEN CAST(json_type(j, '$.score') = 'NULL' AS INTEGER)
           END AS score_is_null
    FROM src
    """,
)
def s5_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a VARIANT column: parse the (built)
    payload with try_parse_json — malformed rows become a NULL
    variant, never an error — then pull '$.meta.type' as string,
    '$.meta.vals[1]' as bigint (0-based JSON path, verified equal on
    both engines), '$.score' as bigint (json-null -> NULL value), and
    the json-null DISCRIMINATOR via is_variant_null, which
    distinguishes 'score was json null' from 'row did not parse'
    (Spark's is_variant_null(NULL variant) is false, not null — so
    the parsed-guard is explicit, mirroring the oracle's CASE).

    Scale shape: map-only — one pass, no exchange at all; on a
    managed table the same variant column arrives shredded so the
    typed paths prune like ordinary columns. The parse happens ONCE
    per row into the binary encoding; every path extraction after is
    a binary traversal, which is the point of VARIANT over
    from_json-per-field at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    built = ev.select("event_id", F.expr(_S5_JSON_BUILD).alias("j0"))
    src = built.select("event_id", F.expr(_S5_MANGLE).alias("j"))
    v = F.try_parse_json(F.col("j"))
    s = src.select("event_id", v.alias("v"))
    parsed = F.col("v").isNotNull()
    return s.select(
        "event_id",
        parsed.cast("int").alias("parsed"),
        F.try_variant_get(F.col("v"), "$.meta.type", "string").alias("etype"),
        F.try_variant_get(F.col("v"), "$.meta.vals[1]", "bigint").alias(
            "val1"
        ),
        F.try_variant_get(F.col("v"), "$.score", "bigint").alias("score"),
        F.when(
            parsed,
            F.is_variant_null(
                F.try_variant_get(F.col("v"), "$.score", "variant")
            ),
        )
        .cast("int")
        .alias("score_is_null"),
    )
