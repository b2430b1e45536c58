"""S5: the spark.sql surface over registered temp views produces the
same results (and the same Catalyst plans) as the DataFrame builders."""

from __future__ import annotations

from risk_dashboard_database_spark.plans import QUERIES
from risk_dashboard_database_spark.tables import register_views

SF_DIR = "/root/testdata/sf0.001"


def test_sql_equals_dataframe_daily_counts(spark):
    register_views(spark, SF_DIR)
    via_sql = spark.sql(
        """
        SELECT date_format(CAST(ts AS DATE), 'yyyy-MM-dd') AS date,
               user_id,
               CAST(SUM(CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS positive_count,
               CAST(SUM(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) AS BIGINT) AS neutral_count,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS negative_count,
               COUNT(*) AS total_count,
               ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS neg_pct
        FROM events
        GROUP BY 1, 2
        """
    )
    via_df = QUERIES["a1_daily_event_counts"](spark, SF_DIR)
    s = {tuple(r) for r in via_sql.collect()}
    d = {tuple(r) for r in via_df.collect()}
    assert s == d and len(s) > 0


def test_views_registered_for_all_tables(spark):
    register_views(spark, SF_DIR)
    names = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        assert t in names
        assert spark.table(t).count() > 0
