"""Serving-layer queries — the Grafana/dashboard read path (SURVEY.md §2.7).

The reference's dashboards read the sink tables back with plain SQL:
recent-ticks panels (`ORDER BY event_time DESC LIMIT 200`,
grafana/dashboards/overview.json:46), per-instrument latest values
(TimescaleDB `LAST()`), and ordered bucket series. Expressed Spark-first:
per-key top-N is a rank-partitioned window (per-partition heaps after one
hash shuffle); latest-value is `max_by` (one partial-aggregated pass, no
sort at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_signals.io.sources import load_ticks

RECENT_N = 50


def recent_ticks_per_instrument(ticks: DataFrame, n: int = RECENT_N) -> DataFrame:
    """Last n ticks per instrument (the recent-trades panel, per key)."""
    w = Window.partitionBy("product_id").orderBy(
        F.desc("event_time"), F.desc("sequence")
    )
    return (
        ticks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("product_id", "event_time", "sequence", "price", "rn")
    )


def latest_price_per_instrument(ticks: DataFrame) -> DataFrame:
    """TimescaleDB LAST(price, event_time) analog — max_by, no sort."""
    return ticks.groupBy("product_id").agg(
        F.expr("max_by(price, struct(event_time, sequence))").alias("last_price"),
        F.max("event_time").alias("last_event_time"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def q_recent_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recent_ticks_per_instrument(load_ticks(spark, sf_dir))


SQL_RECENT_TICKS = f"""
WITH t AS (
    SELECT 'P-' || CAST(user_id AS VARCHAR) AS product_id, ts AS event_time,
           event_id AS sequence, value AS price
    FROM events
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY product_id ORDER BY event_time DESC, sequence DESC) AS rn
    FROM t
)
SELECT product_id, event_time, sequence, price, rn FROM r WHERE rn <= {RECENT_N}"""


def q_latest_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_price_per_instrument(load_ticks(spark, sf_dir))


SQL_LATEST_PRICE = """
WITH t AS (
    SELECT 'P-' || CAST(user_id AS VARCHAR) AS product_id, ts AS event_time,
           event_id AS sequence, value AS price
    FROM events
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY product_id ORDER BY event_time DESC, sequence DESC) AS rn,
        max(event_time) OVER (PARTITION BY product_id) AS last_event_time,
        count(*) OVER (PARTITION BY product_id) AS n_ticks
    FROM t
)
SELECT product_id, price AS last_price, last_event_time, n_ticks
FROM r WHERE rn = 1"""


SERVING_QUERIES = {
    "recent_ticks_per_instrument": (q_recent_ticks, SQL_RECENT_TICKS),
    "latest_price_per_instrument": (q_latest_price, SQL_LATEST_PRICE),
}
