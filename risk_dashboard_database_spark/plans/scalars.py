"""Scalar-function queries (SURVEY §2.8: URL, hash, regex, string,
date/time, JSON, array, math, conditional families; §2.2 P5).

Each query runs the engine's REAL scalar operator (functions/urls.py,
functions/textnorm.py — parse_url pipelines, regex families, token
normalizers) over deterministic synthetic inputs; each oracle derives
the expected output from k via hand-built CASE truth tables
(plans/synth.py), so the Spark implementation and the oracle never
share code paths.

Scale notes: every query here is a pure narrow projection — no
shuffle at all except the final (tiny) aggregates. All string work is
JVM-side codegen; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import normalize_lookup_text, singularize_lookup_text
from ..functions.urls import (
    classify_control,
    has_material_risk_terms,
    hostname,
    is_financial_routine,
    normalize_url,
    should_neutralize_finance_routine,
    url_hash,
)
from ..tables import load_table
from .registry import query
from .synth import (
    K_SQL,
    k_col,
    normalized_url_sql,
    source_host_col,
    source_host_sql,
    title_col,
    title_sql,
    url_col,
)


@query(
    "s_url_normalize",
    oracle=f"""
    SELECT event_id,
           {normalized_url_sql()} AS normalized_url,
           sha256({normalized_url_sql()}) AS url_hash,
           'src' || CAST(({K_SQL}) % 20 AS VARCHAR) || '.com' AS host
    FROM events
    """,
)
def s_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization + sha256 identity hash (§1.3,
    `src/url_utils.py:12-47`): the Spark side parses and normalizes a
    deliberately messy URL (uppercase www host, doubled slashes,
    tracking params, unsorted query, fragment); the oracle constructs
    the expected result directly."""
    ev = load_table(spark, sf_dir, "events")
    k = k_col()
    url = url_col(k, F.col("event_type"))
    return ev.select(
        "event_id",
        normalize_url(url).alias("normalized_url"),
        url_hash(url).alias("url_hash"),
        hostname(url).alias("host"),
    )


# truth table for s_control_classify: (variant, is_ceo) -> controlled
_CONTROL_CASES_SQL = """
    CASE ({k}) % 8
      WHEN 0 THEN TRUE            -- facebook page (non-post)
      WHEN 1 THEN FALSE           -- facebook /posts/
      WHEN 2 THEN CASE WHEN ({k}) % 2 = 1 THEN FALSE ELSE FALSE END  -- wikipedia: ceo-uncontrolled; brand: no match
      WHEN 3 THEN TRUE            -- x.com brand handle
      WHEN 4 THEN TRUE            -- brand token in host
      WHEN 5 THEN FALSE           -- third-party news site
      WHEN 6 THEN TRUE            -- linkedin company page
      ELSE CASE WHEN ({k}) % 2 = 1 THEN FALSE ELSE TRUE END          -- youtube channel: ceo-uncontrolled domain
    END
"""


@query(
    "s_control_classify",
    oracle=f"""
    SELECT event_id,
           CASE WHEN ({K_SQL}) % 2 = 1 THEN 'ceo' ELSE 'company' END AS entity_type,
           CAST({_CONTROL_CASES_SQL.format(k=K_SQL)} AS BOOLEAN) AS controlled
    FROM events
    """,
)
def s_control_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control classification (F5, `src/risk_rules.py:284-346`):
    always/never-controlled domains, social post-vs-page paths, brand
    handle and company-page checks, brand-token-in-host — evaluated by
    the real expression pipeline over 8 URL variants; the oracle is a
    hand-derived truth table."""
    ev = load_table(spark, sf_dir, "events")
    k = k_col()
    company = F.lit("Acme")
    variant = k % 8
    url = (
        F.when(variant == 0, F.lit("https://www.facebook.com/AcmePage"))
        .when(variant == 1, F.lit("https://facebook.com/acme/posts/123"))
        .when(variant == 2, F.lit("https://en.wikipedia.org/wiki/Acme"))
        .when(variant == 3, F.lit("https://x.com/acme"))
        .when(variant == 4, F.lit("https://acme.com/products"))
        .when(variant == 5, F.lit("https://news5.example.com/story"))
        .when(variant == 6, F.lit("https://linkedin.com/company/acme/about"))
        .otherwise(F.lit("https://youtube.com/@acme/videos"))
    )
    etype = F.when(k % 2 == 1, "ceo").otherwise("company")
    return ev.select(
        "event_id",
        etype.alias("entity_type"),
        classify_control(company, url, etype).alias("controlled"),
    )


@query(
    "s_risk_regex",
    oracle=f"""
    SELECT event_id,
           {title_sql()} AS title,
           CAST(CASE WHEN ({K_SQL}) % 11 IN (8, 9) OR ({K_SQL}) % 9 = 0
                          OR ({K_SQL}) % 13 = 0
                THEN 1 ELSE 0 END AS BOOLEAN) AS finance_routine,
           CAST(CASE WHEN ({K_SQL}) % 11 IN (0, 1, 2, 4)
                THEN 1 ELSE 0 END AS BOOLEAN) AS material_risk,
           CAST(CASE WHEN event_type IN ('purchase','signup','error')
                      AND (({K_SQL}) % 11 IN (8, 9) OR ({K_SQL}) % 9 = 0
                           OR ({K_SQL}) % 13 = 0)
                      AND NOT (({K_SQL}) % 11 IN (0, 1, 2, 4))
                THEN 1 ELSE 0 END AS BOOLEAN) AS neutralized
    FROM events
    """,
)
def s_risk_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex classification families (§2.8, `src/risk_rules.py:27-52,
    351-381`): ~40 case-insensitive finance + material-risk patterns as
    one rlike each, plus the finance-routine neutralization rule
    (routine finance noise is neutralized unless material terms
    co-occur). Oracle = phrase-wheel truth table."""
    ev = load_table(spark, sf_dir, "events")
    k = k_col()
    title = title_col(k)
    host = source_host_col(k)
    sentiment = (
        F.when(F.col("event_type").isin("purchase", "signup"), "positive")
        .when(F.col("event_type") == "error", "negative")
        .otherwise("neutral")
    )
    return ev.select(
        "event_id",
        title.alias("title"),
        is_financial_routine(title, host).alias("finance_routine"),
        has_material_risk_terms(title).alias("material_risk"),
        should_neutralize_finance_routine(sentiment, title, host).alias("neutralized"),
    )


@query(
    "s_name_normalize",
    oracle="""
    SELECT c_custkey,
           trim(regexp_replace(regexp_replace(replace(lower(trim(c_name)), '&', ' and '),
                '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS lookup_key,
           trim(regexp_replace(regexp_replace(replace(lower(trim(c_name)), '&', ' and '),
                '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS stripped_key,
           -- singularize: our synthetic names 'Customer#000000042' have no
           -- plural tokens, so singularized == normalized except the word
           -- 'customer' stays; mirror the token rule on the last char
           trim(regexp_replace(regexp_replace(replace(lower(trim(c_name)), '&', ' and '),
                '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS singular_key
    FROM customer
    """,
)
def s_name_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup-text normalization (§2.8 String, `app.py:964-995`):
    casefold, &->and, strip punctuation, collapse spaces, company
    suffix stripping and token singularization. Customer names carry
    no plural/suffix tokens, so the three keys coincide here — the
    suffix/singular edge cases are covered by unit tests in
    tests/test_textnorm.py with hand-built fixtures."""
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        normalize_lookup_text(name).alias("lookup_key"),
        normalize_lookup_text(name, strip_company_suffixes=True).alias("stripped_key"),
        singularize_lookup_text(name).alias("singular_key"),
    )


@query(
    "s_date_bounds",
    oracle="""
    SELECT DISTINCT
           STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS date,
           STRFTIME(date_trunc('month', CAST(ts AS DATE)), '%Y-%m-%d') AS month_start,
           STRFTIME(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(quarter(CAST(ts AS DATE)) AS INTEGER) AS quarter,
           CAST(year(CAST(ts AS DATE)) AS INTEGER) AS year,
           STRFTIME(date_trunc('week', CAST(ts AS DATE)), '%Y-%m-%d') AS week_start,
           STRFTIME(CAST(ts AS DATE) - 1, '%Y-%m-%d') AS prev_day,
           STRFTIME(CAST(ts AS DATE) + 1, '%Y-%m-%d') AS next_day,
           STRFTIME(CAST(ts AS DATE) - 30, '%Y-%m-%d') AS rolling_30_start
    FROM events
    """,
)
def s_date_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family (§2.8, F6 period bounds): month/quarter/
    week bounds and day arithmetic — the building blocks of the
    reference's period parser (`insights agent/period_parser.py:19-35`)
    and rolling-window predicates (`app.py:2777`)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        F.date_format(d, "yyyy-MM-dd").alias("date"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("quarter"),
        F.year(d).alias("year"),
        F.date_format(F.trunc(d, "week"), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.date_sub(d, 1), "yyyy-MM-dd").alias("prev_day"),
        F.date_format(F.date_add(d, 1), "yyyy-MM-dd").alias("next_day"),
        F.date_format(F.date_sub(d, 30), "yyyy-MM-dd").alias("rolling_30_start"),
    ).distinct()


@query(
    "s_json_array_math",
    oracle=f"""
    SELECT event_id,
           {K_SQL} AS k,
           to_json([({K_SQL}), ({K_SQL}) * 2, ({K_SQL}) * 3]) AS arr_json,
           to_json([({K_SQL}), ({K_SQL}) * 2]) AS arr_slice_json,
           md5(event_type) AS type_md5,
           ROUND(value, 1) AS value_1dp,
           ROUND(value, 6) AS value_6dp,
           CAST(GREATEST(({K_SQL}) - 50, 0) AS INTEGER) AS over_50,
           CAST(COALESCE(NULLIF(({K_SQL}) % 5, 0), -1) AS INTEGER) AS mod5_nullif
    FROM events
    """,
)
def s_json_array_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON / array / hash / math / conditional scalar families (§2.8):
    JSON extraction (`to_jsonb(r)->>...` analog, `app.py:3011`), array
    build + slice emitted as canonical JSON, md5, rounding parity
    (`sql/article_daily_counts_mv.sql:16,37`), and the
    greatest/nullif/coalesce conditionals
    (`sql/entity_daily_metrics_v.sql:32,136-138`)."""
    ev = load_table(spark, sf_dir, "events")
    k = k_col()
    arr = F.array(k, k * 2, k * 3)
    return ev.select(
        "event_id",
        k.alias("k"),
        F.to_json(arr).alias("arr_json"),
        F.to_json(F.slice(arr, 1, 2)).alias("arr_slice_json"),
        F.md5("event_type").alias("type_md5"),
        F.round("value", 1).alias("value_1dp"),
        F.round("value", 6).alias("value_6dp"),
        F.greatest(k - 50, F.lit(0)).alias("over_50"),
        F.coalesce(F.nullif(k % 5, F.lit(0)), F.lit(-1)).alias("mod5_nullif"),
    )


@query(
    "p5_ilike_match",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) = lower('bUiLdInG')
       OR c_name ILIKE '%00001%'
    """,
)
def p5_ilike_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive matching (P5): `lower(x) = lower(y)` equality
    and `ilike '%..%'` containment (`app.py:1271,1646`)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(
        (F.lower("c_mktsegment") == F.lower(F.lit("bUiLdInG")))
        | F.col("c_name").ilike("%00001%")
    ).select("c_custkey", "c_name", "c_mktsegment")
