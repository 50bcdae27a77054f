"""Normalization stage — P1, P2, W1, W2.

prices_raw → normalized_prices: typed projection, mid-price with bid/ask
fallback, previous-tick lag, percent return with null/zero guard, rolling
60-tick population-stddev volatility.

Reference semantics: sma_cross.py:57-105 (normalized_base / normalized_prices
views). One deliberate strengthening: all window orderings add ``sequence`` as
a tiebreaker after ``event_time`` — the reference orders by event_time alone,
which is nondeterministic under timestamp ties; with the tiebreaker the plan
is deterministic and oracle-checkable.

Scale notes: a single window spec (partitionBy product_id, orderBy event_time,
sequence) is shared by every rolling feature in this stage and the strategy
stage, so Catalyst plans ONE shuffle + ONE sort for all of W1-W7. Instrument
key cardinality is the parallelism bound — at 100 TB the stream has thousands
of instruments, far more keys than executor slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig


def tick_window(cfg: EngineConfig | None = None):
    """The per-instrument event-time window every rolling feature shares."""
    return Window.partitionBy("product_id").orderBy("event_time", "sequence")


def normalized_base(ticks: DataFrame) -> DataFrame:
    """P1 — typed casts + mid-price (reference: sma_cross.py:57-73)."""
    has_quotes = F.col("best_bid").isNotNull() & F.col("best_ask").isNotNull()
    return ticks.select(
        "product_id",
        "event_time",
        F.col("sequence").cast("long").alias("sequence"),
        F.col("price").cast("double").alias("price"),
        F.col("best_bid").cast("double").alias("best_bid"),
        F.col("best_ask").cast("double").alias("best_ask"),
        F.when(has_quotes, (F.col("best_bid") + F.col("best_ask")) / F.lit(2.0))
        .otherwise(F.col("price").cast("double"))
        .alias("mid_price"),
    )


def enriched_ticks(ticks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """All per-tick window-derived columns in ONE window stage.

    normalized_prices ∪ sma_enriched ∪ the crossover lag — every rolling
    feature shares the same (partitionBy product_id, orderBy event_time,
    sequence) spec, so Catalyst plans a single shuffle + sort and stacks the
    Window operators on top. Downstream stages (signals, positions, metrics,
    counts) are pure projections off this one frame; branches that fork from
    it share the exchange via ReuseExchange instead of recomputing the scan.
    """
    w = tick_window(cfg)
    base = normalized_base(ticks)
    prev_mid = F.lag("mid_price").over(w)
    vol_frame = w.rowsBetween(-(cfg.volatility_window - 1), 0)
    fast = F.avg("mid_price").over(w.rowsBetween(-(cfg.sma_fast_window - 1), 0))
    slow = F.avg("mid_price").over(w.rowsBetween(-(cfg.sma_slow_window - 1), 0))
    df = base.select(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "best_bid",
        "best_ask",
        F.when(prev_mid.isNull() | (prev_mid == 0), F.lit(None).cast("double"))
        .otherwise((F.col("mid_price") - prev_mid) / prev_mid)
        .alias("returns"),
        F.stddev_pop("mid_price").over(vol_frame).alias("volatility"),
        fast.alias("fast_sma"),
        slow.alias("slow_sma"),
    )
    df = df.withColumn("sig_spread", F.col("fast_sma") - F.col("slow_sma"))
    return df.withColumn("prev_sig_spread", F.lag("sig_spread", cfg.confirmation).over(w))


def normalized_prices(ticks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P2 + W1 + W2 — returns and rolling volatility
    (reference: sma_cross.py:76-105)."""
    w = tick_window(cfg)
    base = normalized_base(ticks)
    prev_mid = F.lag("mid_price").over(w)
    vol_frame = w.rowsBetween(-(cfg.volatility_window - 1), 0)
    return base.select(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "best_bid",
        "best_ask",
        F.when(prev_mid.isNull() | (prev_mid == 0), F.lit(None).cast("double"))
        .otherwise((F.col("mid_price") - prev_mid) / prev_mid)
        .alias("returns"),
        F.stddev_pop("mid_price").over(vol_frame).alias("volatility"),
    )
