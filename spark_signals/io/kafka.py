"""Kafka source/sink builders — S1-S4 in their native streaming form.

This container has no Kafka broker (and Spark's kafka connector jar may not
be on the classpath), so these builders are exercised for plan construction
only; the file-based sources in io.sources / streaming.job carry the tested
path. The options mirror the reference DDLs:

  * source: latest-offset startup, JSON with parse errors dropped, 5s
    watermark (reference __main__.py:51-74)
  * sinks: JSON value with ISO-8601 timestamps (reference __main__.py:76-142)

DEPLOY-TIME CHECKLIST (the parts this sandbox cannot test end-to-end;
run these against a real broker before going live):

1. Classpath: submit with
   ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``
   (the connector is not bundled with pyspark).
2. Smoke the wire contract live: produce one tick via
   ``tick_sink_query``, consume it via ``tick_source``, and assert the
   event_time microseconds survive the round trip — the same property
   tests/test_kafka_contract.py pins broker-less with golden bytes.
3. Checkpointing: every sink query needs a durable
   ``checkpointLocation`` (object store, not local disk); resuming from it
   gives the at-least-once redelivery the foreachBatch dynamic-partition
   overwrite dedupes (streaming/job.py T5).
4. Topic provisioning: create DEFAULT_TOPICS with production partition
   counts (source parallelism = topic partitions) and a retention matching
   the replay window you want replayable.
5. Offsets: production uses ``startingOffsets=latest`` (reference
   parity); backfills/replays should switch to ``earliest`` or explicit
   per-partition offsets plus the replay window bounds (replay.py S10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.io.sources import PRICES_RAW_SCHEMA

# The wire contract for every JSON topic: ISO-8601 timestamps, microsecond
# precision, explicit UTC 'Z' (reference __main__.py:80-94,
# json.timestamp-format.standard=ISO-8601). Spark's default JSON
# timestampFormat truncates to milliseconds, which would silently lose the
# microsecond component of tick event times on a broker round-trip — so the
# format is pinned here and used by BOTH the sink encoder and the source
# decoder. tests/test_kafka_contract.py holds parse(encode(x)) == x and
# golden bytes against this contract.
ISO8601_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_JSON_OPTS = {"timestampFormat": ISO8601_US}


def encode_json_value(df: DataFrame, key_column: str | None = "product_id") -> DataFrame:
    """The exact (key, value) projection every Kafka sink writes: value is
    the row as a JSON object (field order = column order, null fields
    omitted), key is the optional partitioning column as bytes."""
    cols = [
        F.to_json(F.struct(*[F.col(c) for c in df.columns]), _JSON_OPTS).alias("value")
    ]
    if key_column and key_column in df.columns:
        cols.insert(0, F.col(key_column).cast("string").alias("key"))
    return df.select(*cols)


def decode_tick_payloads(payloads: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """The exact decode the Kafka tick source applies to `value` bytes:
    schema-enforced from_json (malformed payloads null out), NOT NULL
    contract columns filtered — reproducing the reference's
    `json.ignore-parse-errors=true` drop semantics (__main__.py:51-74)."""
    cfg = cfg or EngineConfig()
    parsed = payloads.select(
        F.from_json(F.col("value").cast("string"), PRICES_RAW_SCHEMA, _JSON_OPTS).alias("r")
    ).select("r.*")
    out = parsed.filter(
        F.col("product_id").isNotNull()
        & F.col("price").isNotNull()
        & F.col("event_time").isNotNull()
    )
    if out.isStreaming:
        out = out.withWatermark("event_time", cfg.watermark_delay)
    return out


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
    return decode_tick_payloads(raw, cfg)


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_column: str | None = "product_id",
):
    """S2-S4 — JSON-encoded Kafka sink writer (pinned ISO-8601 µs timestamp
    contract; see encode_json_value / ISO8601_US)."""
    return (
        encode_json_value(df, key_column)
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
