"""Skew lever: symbol×day re-keyed feature stage (SCALE.md "Skew").

The per-key window stage is sequential per instrument, so one pathological
hot key serializes on a single task. ``enriched_ticks_rekeyed`` splits the
key into (product_id, day-bucket) with lookback-row carry. These tests hold
the two claims that make it a safe lever:

1. bit-identical output to the single-key plan on dense fixtures (hot key,
   multi-day, across bucket boundaries, with empty-bucket gaps);
2. the physical plan actually partitions the window stage on the finer
   (product_id, bucket) key — more tasks than instruments.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.io.sources import PRICES_RAW_SCHEMA
from spark_signals.pipeline.normalize import (
    enriched_ticks,
    enriched_ticks_rekeyed,
    lookback_rows,
)
from tests.test_plans import plan_str

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)

CFG = EngineConfig()


def _mid(i: int, salt: int) -> float:
    # deterministic wavy series: crossings, no randomness
    return 100.0 + ((i * 7 + salt) % 13) - 6 + 0.01 * ((i * 3 + salt) % 7)


def _make_days(spark, spec):
    """spec: list of (product_id, day_index, rows_in_day)."""
    rows = []
    seq = 0
    for product, day, n in spec:
        for i in range(n):
            t = T0 + dt.timedelta(days=day, seconds=i * 513)
            m = _mid(i + day * 1000, salt=hash(product) % 97)
            rows.append(
                (product, m, m - 0.05, m + 0.05, None, seq, "buy", t, "events")
            )
            seq += 1
    return spark.createDataFrame(rows, PRICES_RAW_SCHEMA)


def _assert_identical(a, b):
    ka = sorted([tuple(r) for r in a.collect()])
    kb = sorted([tuple(r) for r in b.collect()])
    assert ka == kb  # exact — including float bits


def test_rekeyed_matches_single_key_hot_key(spark):
    """90%-hot key over 3 dense days: the exact fixture the lever exists
    for. Every bucket holds >= lookback_rows, so outputs are identical."""
    L = lookback_rows(CFG)
    n_hot, n_cold = 6 * L, L + 5
    ticks = _make_days(
        spark,
        [("BTC-USD", d, n_hot) for d in range(3)]
        + [("ALT-USD", d, n_cold) for d in range(3)],
    )
    _assert_identical(
        enriched_ticks(ticks, CFG), enriched_ticks_rekeyed(ticks, CFG)
    )


def test_rekeyed_matches_across_empty_bucket_gap(spark):
    """A key absent for a whole day: carry must route to the next NON-EMPTY
    bucket, not the calendar-next day."""
    L = lookback_rows(CFG)
    ticks = _make_days(
        spark, [("GAP-USD", 0, 2 * L), ("GAP-USD", 2, 2 * L), ("GAP-USD", 5, 2 * L)]
    )
    _assert_identical(
        enriched_ticks(ticks, CFG), enriched_ticks_rekeyed(ticks, CFG)
    )


def test_rekeyed_matches_hourly_bucket(spark):
    """The bucket unit is a dial: finer HOUR bucketing for intraday-hot
    keys, same exactness contract."""
    L = lookback_rows(CFG)
    rows = []
    for h in range(4):
        for i in range(2 * L):
            t = T0 + dt.timedelta(hours=h, seconds=i * 13)
            m = _mid(i + h * 100, salt=7)
            rows.append(("BTC-USD", m, m - 0.05, m + 0.05, None, h * 1000 + i, "buy", t, "events"))
    ticks = spark.createDataFrame(rows, PRICES_RAW_SCHEMA)
    _assert_identical(
        enriched_ticks(ticks, CFG),
        enriched_ticks_rekeyed(ticks, CFG, bucket="HOUR"),
    )


def test_rekeyed_plan_partitions_on_finer_key(spark):
    """The body window must hash-partition on (product_id, bucket_ts) —
    that's the whole point: parallelism beyond instrument cardinality."""
    ticks = _make_days(spark, [("BTC-USD", 0, 10)])
    p = plan_str(enriched_ticks_rekeyed(ticks, CFG))
    assert "hashpartitioning(product_id" in p and "bucket_ts" in p
    # and the fine window sort includes the bucket in its partition key
    assert any(
        "bucket_ts" in line and "hashpartitioning" in line for line in p.splitlines()
    )


def test_auto_route_engages_above_threshold(spark):
    """choose_tick_plan routes by the OBSERVED hottest-key count: skewed
    input above the threshold takes the re-keyed plan, uniform input below
    it stays on the single-key plan (SCALE.md routing policy, executable)."""
    from spark_signals.pipeline.normalize import (
        choose_tick_plan,
        enriched_ticks_auto,
    )

    L = lookback_rows(CFG)
    skewed = _make_days(
        spark,
        [("BTC-USD", d, 4 * L) for d in range(2)] + [("ALT-USD", 0, L + 5)],
    )
    uniform = _make_days(spark, [("A-USD", 0, L + 5), ("B-USD", 0, L + 5)])

    assert choose_tick_plan(skewed, CFG, hot_key_rows=3 * L) == "rekeyed"
    assert choose_tick_plan(uniform, CFG, hot_key_rows=3 * L) == "single"

    # routed output is bit-identical to the single-key plan either way
    _assert_identical(
        enriched_ticks_auto(skewed, CFG, hot_key_rows=3 * L),
        enriched_ticks(skewed, CFG),
    )
    # and the hot route really produced the finer-key physical plan
    p = plan_str(enriched_ticks_auto(skewed, CFG, hot_key_rows=3 * L))
    assert "bucket_ts" in p
    p_single = plan_str(enriched_ticks_auto(uniform, CFG, hot_key_rows=3 * L))
    assert "bucket_ts" not in p_single
