"""Kafka wire-contract tests — no broker required.

The sandbox has no Kafka broker, so the source/sink builders in
``io/kafka.py`` can't be exercised end-to-end. What CAN be pinned is the
entire value contract: the sink's JSON encode and the source's JSON decode
are pure DataFrame expressions, shared verbatim between the broker writers
and these tests (``encode_json_value`` / ``decode_tick_payloads``). Three
gates:

1. parse(encode(x)) == x for every tick-schema shape (nulls, µs
   timestamps, negative values) — the round-trip a broker deployment relies
   on;
2. golden bytes — the exact serialized payload, pinning field order and the
   ISO-8601 µs UTC timestamp format (reference __main__.py:80-94,
   `json.timestamp-format.standard=ISO-8601`);
3. malformed payloads are dropped, not poison — the reference's
   `json.ignore-parse-errors=true` (__main__.py:51-74).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_signals.io.kafka import decode_tick_payloads, encode_json_value
from spark_signals.io.sources import PRICES_RAW_SCHEMA

TS = dt.datetime(2024, 6, 1, 12, 34, 56, 123456)


def _ticks_df(spark):
    rows = [
        ("P-1", 100.5, 100.45, 100.55, None, 7, "buy", TS, "events"),
        # null quotes + null sequence/side survive the trip
        ("P-2", 0.0625, None, None, None, None, None, TS, "events"),
        # negative price (spread instruments), large sequence
        ("P-3", -12.25, -12.26, -12.24, 123.5, 2**41, "sell", TS, "replay"),
    ]
    return spark.createDataFrame(rows, PRICES_RAW_SCHEMA)


def test_roundtrip_encode_decode(spark):
    src = _ticks_df(spark)
    wire = encode_json_value(src)
    assert wire.columns == ["key", "value"]
    back = decode_tick_payloads(wire)
    # from_json re-derives everything nullable; names and types must match
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]
    orig = {tuple(r) for r in src.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_golden_iso8601_bytes(spark):
    """Exact payload bytes: field order = schema order, null fields omitted,
    timestamps as ISO-8601 with microseconds and explicit UTC offset."""
    one = _ticks_df(spark).filter(F.col("product_id") == "P-1")
    value = encode_json_value(one).select("value").collect()[0][0]
    assert value == (
        '{"product_id":"P-1","price":100.5,"best_bid":100.45,'
        '"best_ask":100.55,"sequence":7,"side":"buy",'
        '"event_time":"2024-06-01T12:34:56.123456Z","source":"events"}'
    )
    key = encode_json_value(one).select("key").collect()[0][0]
    assert key == "P-1"


def test_microseconds_survive(spark):
    """The default Spark JSON timestamp format truncates to millis; the
    pinned contract must not."""
    back = decode_tick_payloads(encode_json_value(_ticks_df(spark)))
    times = [r[0] for r in back.select("event_time").collect()]
    assert all(t.microsecond == 123456 for t in times)


def test_malformed_payloads_dropped(spark):
    payloads = spark.createDataFrame(
        [
            ("not json at all",),
            ('{"price": 1.0}',),  # missing NOT NULL product_id/event_time
            ('{"product_id":"P-9","price":"NaNope","event_time":"junk"}',),
            (
                '{"product_id":"P-4","price":7.5,'
                '"event_time":"2024-06-01T12:34:56.123456Z","source":"events"}',
            ),
        ],
        "value string",
    )
    out = decode_tick_payloads(payloads).collect()
    assert [r["product_id"] for r in out] == ["P-4"]
    assert out[0]["event_time"] == TS


def test_sink_schemas_encode_parseable(spark):
    """Every pipeline sink relation encodes to one JSON object per row with
    all non-null fields present — the S2-S4 value contract beyond ticks."""
    from spark_signals.config import EngineConfig
    from spark_signals.pipeline.builder import build_pipeline
    from tests.conftest import make_ticks

    cfg = EngineConfig()
    outs = build_pipeline(make_ticks(spark, [100 + i * 0.5 for i in range(40)]), cfg)
    for name, df in outs.sinks().items():
        # materialize the 5 sample rows ONCE per sink and run the encode →
        # decode trip over a local relation of them: the former version's
        # per-column count() pairs re-executed the full pipeline chain
        # ~2×columns times per sink (~95 s of this one test's runtime) and,
        # because each action re-evaluated limit(5) independently, compared
        # null counts across potentially different row picks. Same
        # assertions, one execution, one consistent sample.
        head = spark.createDataFrame(df.limit(5).collect(), df.schema)
        wire = encode_json_value(head, key_column=None)
        decoded = wire.select(
            F.from_json("value", df.schema, {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}).alias("r")
        ).select("r.*")
        orig_rows = head.collect()
        dec_rows = decoded.collect()
        assert len(dec_rows) == len(orig_rows), name
        # schema-faithful decode: no column nulls out that wasn't null
        for col in decoded.columns:
            before = sum(r[col] is not None for r in orig_rows)
            after = sum(r[col] is not None for r in dec_rows)
            assert before == after, f"{name}.{col}"
