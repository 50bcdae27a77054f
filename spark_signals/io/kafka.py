"""Kafka source/sink builders — S1-S4 in their native streaming form.

This container has no Kafka broker (and Spark's kafka connector jar may not
be on the classpath), so these builders are exercised for plan construction
only; the file-based sources in io.sources / streaming.job carry the tested
path. The options mirror the reference DDLs:

  * source: latest-offset startup, JSON with parse errors dropped, 5s
    watermark (reference __main__.py:51-74)
  * sinks: JSON value with ISO-8601 timestamps (reference __main__.py:76-142)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.io.sources import PRICES_RAW_SCHEMA


def read_kafka_ticks(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "prices.raw",
    starting_offsets: str = "latest",
    starting_timestamp_ms: int | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """S1 — Kafka JSON tick source with schema-enforced decode.

    `from_json` with a fixed schema nulls malformed payloads; filtering the
    contract's NOT NULL columns reproduces `json.ignore-parse-errors=true`.
    `starting_timestamp_ms` maps the replay service's seek-by-timestamp
    (reference replay/service.py:60-71) onto the connector's
    startingTimestamp option.
    """
    cfg = cfg or EngineConfig()
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    if starting_timestamp_ms is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp_ms))
    else:
        reader = reader.option("startingOffsets", starting_offsets)
    raw = reader.load()
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), PRICES_RAW_SCHEMA).alias("r")
    ).select("r.*")
    return parsed.filter(
        F.col("product_id").isNotNull()
        & F.col("price").isNotNull()
        & F.col("event_time").isNotNull()
    ).withWatermark("event_time", cfg.watermark_delay)


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_column: str | None = "product_id",
):
    """S2-S4 — JSON-encoded Kafka sink writer (ISO-8601 timestamps come free
    from to_json's default timestamp formatting)."""
    cols = [F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")]
    if key_column and key_column in df.columns:
        cols.insert(0, F.col(key_column).cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


DEFAULT_TOPICS = {
    # reference scripts/bootstrap_data.py:16-23 (S11) — partition counts are
    # broker-side; recorded here for the provisioning script analog
    "prices.raw": 3,
    "prices.normalized": 3,
    "prices.features": 3,
    "signals.decisions": 3,
    "metrics.performance": 3,
    "prices.replay": 6,
}
