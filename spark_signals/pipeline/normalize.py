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


# The same window spec as SQL OVER-clause text. The rolling-feature
# expressions below are built as SQL strings (ONE py4j round trip each via
# selectExpr instead of dozens of Column calls — plan construction was
# 30-60% of pipeline-query wall at sf0.1, r16); parameterizing the
# PARTITION BY keeps the single-key and skew-rekeyed plans on literally the
# same expression text. Parses to the identical Catalyst operators as the
# former Column DSL — pinned by tests/test_plan_equality.py.
TICK_OVER = "PARTITION BY product_id ORDER BY event_time, sequence"
TICK_OVER_REKEYED = "PARTITION BY product_id, bucket_ts ORDER BY event_time, sequence"


def normalized_base(ticks: DataFrame) -> DataFrame:
    """P1 — typed casts + mid-price (reference: sma_cross.py:57-73)."""
    return ticks.selectExpr(
        "product_id",
        "event_time",
        "CAST(sequence AS BIGINT) AS sequence",
        "CAST(price AS DOUBLE) AS price",
        "CAST(best_bid AS DOUBLE) AS best_bid",
        "CAST(best_ask AS DOUBLE) AS best_ask",
        "CASE WHEN (best_bid IS NOT NULL) AND (best_ask IS NOT NULL)"
        " THEN (best_bid + best_ask) / 2.0D"
        " ELSE CAST(price AS DOUBLE) END AS mid_price",
    )


# Volatility decision grid: mids are recovered as exact dp=5 integer
# micro-units and the rolling variance is computed from BIGINT window sums
# (Σu, Σu²) — exact int64 arithmetic on both engines, so the stddev is
# bit-identical regardless of accumulation order. Native STDDEV_POP's
# last ulp is order- and engine-dependent, which flipped a dp=9-rounded
# volatility_ratio cell at sf0.1 (and would flip breakout band decisions).
# Precondition: frame_rows · (max_mid · 10^dp)² < 2^63, i.e. at dp=5 over a
# 60-row frame max_mid ≲ 3.9e3 (driver data tops out at ~560 — 7× margin;
# a single u² already overflows int64 at mid ≈ 3e4). For larger quote
# magnitudes re-derive dp: dp=3 allows mids to ~3.9e5.
VOL_DP = 5


def _rolling_features(over: str, cfg: EngineConfig):
    """The shared rolling-feature expressions, as SQL text over an OVER
    clause ``over`` — factored so the single-key plan (enriched_ticks) and
    the skew-re-keyed plan (enriched_ticks_rekeyed) compute literally the
    same expressions. SQL strings parse to the identical Catalyst
    expressions a Column DSL build would (tests/test_plan_equality.py).

    Returns ``(cum_exprs, returns, volatility, fast, slow)``: callers add
    the three ``cum_exprs`` running-sum columns in a projection FIRST, then
    compute the features (which consume ``_c1/_c2/_cn``) and drop them.

    **Why running sums + lag instead of bounded frames** (r16): Spark
    re-evaluates a bounded sliding frame from scratch for every row —
    O(rows x frame) aggregate updates; the 60-row volatility frame with
    three aggregates was ~180 updates/row, the dominant CPU of the whole
    window stage (measured: no skew, no fetch wait, pure executor run
    time). An UNBOUNDED PRECEDING frame updates incrementally (O(1)/row),
    and the 60-row frame sum is recovered exactly as cum(i) - cum(i-60)
    via lag — the operands are exact integers, so the difference is
    bit-identical to the frame sum (verified by value-hash at sf0.1 and by
    the oracle; the volatility expression consumes the identical doubles).
    enriched_ticks execute: 0.93 -> 0.66 s at sf0.1 on local[32].

    Overflow budget: the RUNNING sums are unbounded where the frame sums
    were 60-row-bounded, so each accumulator is sized explicitly.
    _c1 = Σu with u = mid·10^5 ≲ 5.6e7 at observed magnitudes -> BIGINT
    holds ~1.6e11 rows per key; _cn ≤ rows per key. _c2 = Σu² with
    u² ≲ 3.1e15 would overflow BIGINT at ~3e3 rows per key, so it
    accumulates as DECIMAL(38,0) — exact, headroom ~3e22 rows per key, and
    still O(1)/row. The recovered 60-row differences stay inside the
    original micro_units precondition, and the final CAST AS DOUBLE is
    exact (< 2^53), so values are unchanged to the bit.

    Per-ROW product ceiling (r16 advisory): the u·u below multiplies in
    BIGINT *before* the DECIMAL(38,0) cast — deliberately, because a
    DECIMAL(19,0) operand would leave Spark's Long-backed Decimal fast
    path (MAX_LONG_DIGITS=18) and put a BigDecimal multiply on the
    hottest per-row path. That caps mid_price at ~3.0e4 at dp=5
    (u² < 2^63 ⇔ u ≲ 3.04e9 ⇔ mid ≲ 3.04e4) — the same ceiling the
    module-level VOL_DP note states for a single u², 54× above observed
    data. Under Spark 4's default ANSI mode an excursion past it THROWS
    (loud, not silent); re-derive VOL_DP before disabling ANSI or
    ingesting quote magnitudes near 3e4.
    """
    from spark_signals.rounding import micro_units_sql

    V = cfg.volatility_window
    u = micro_units_sql("mid_price", VOL_DP)
    scale = float(10**VOL_DP)
    unbounded = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    cum_exprs = [
        f"sum({u}) OVER ({over} {unbounded}) AS _c1",
        f"sum(CAST(({u}) * ({u}) AS DECIMAL(38,0))) OVER ({over} {unbounded}) AS _c2",
        f"count(mid_price) OVER ({over} {unbounded}) AS _cn",
    ]
    prev_mid = f"lag(mid_price) OVER ({over})"
    returns = (
        f"CASE WHEN (({prev_mid}) IS NULL) OR (({prev_mid}) = 0)"
        f" THEN CAST(NULL AS DOUBLE)"
        f" ELSE (mid_price - ({prev_mid})) / ({prev_mid}) END"
    )
    m1 = f"CAST(_c1 - COALESCE(lag(_c1, {V}) OVER ({over}), 0L) AS DOUBLE)"
    m2 = (
        f"CAST(_c2 - COALESCE(lag(_c2, {V}) OVER ({over}),"
        " CAST(0 AS DECIMAL(38,0))) AS DOUBLE)"
    )
    n = f"CAST(_cn - COALESCE(lag(_cn, {V}) OVER ({over}), 0L) AS DOUBLE)"
    mean_u = f"(({m1}) / ({n}))"
    var_u = f"(({m2}) / ({n}) - {mean_u} * {mean_u})"
    volatility = f"SQRT(GREATEST({var_u}, 0.0D)) / {scale!r}D"
    fast = (
        f"avg(mid_price) OVER ({over} ROWS BETWEEN"
        f" {cfg.sma_fast_window - 1} PRECEDING AND CURRENT ROW)"
    )
    slow = (
        f"avg(mid_price) OVER ({over} ROWS BETWEEN"
        f" {cfg.sma_slow_window - 1} PRECEDING AND CURRENT ROW)"
    )
    return cum_exprs, returns, volatility, fast, slow


def enriched_ticks(ticks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """All per-tick window-derived columns in ONE window stage.

    normalized_prices ∪ sma_enriched ∪ the crossover lag — every rolling
    feature shares the same (partitionBy product_id, orderBy event_time,
    sequence) spec, so Catalyst plans a single shuffle + sort and stacks the
    Window operators on top. Downstream stages (signals, positions, metrics,
    counts) are pure projections off this one frame; branches that fork from
    it share the exchange via ReuseExchange instead of recomputing the scan.
    """
    base = normalized_base(ticks)
    cum_exprs, returns, volatility, fast, slow = _rolling_features(TICK_OVER, cfg)
    cum = base.selectExpr("*", *cum_exprs)
    df = cum.selectExpr(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "best_bid",
        "best_ask",
        f"{returns} AS returns",
        f"{volatility} AS volatility",
        f"{fast} AS fast_sma",
        f"{slow} AS slow_sma",
    )
    # one projection for both spread columns (driver-side analysis is paid
    # per DataFrame op): sig_spread materializes fast-slow, and the lag takes
    # the same subtraction as its argument directly — Catalyst extracts it
    # into the identical pre-window projection a lag over the materialized
    # column would use, so plan and values are unchanged vs the former
    # withColumn pair.
    return df.selectExpr(
        "*",
        "fast_sma - slow_sma AS sig_spread",
        f"lag(fast_sma - slow_sma, {cfg.confirmation}) OVER ({TICK_OVER})"
        " AS prev_sig_spread",
    )


def lookback_rows(cfg: EngineConfig) -> int:
    """Rows of history any feature in the stage can reach: the confirmation
    lag chains onto the deepest rolling frame."""
    return cfg.confirmation + max(cfg.volatility_window, cfg.sma_slow_window)


def enriched_ticks_rekeyed(
    ticks: DataFrame, cfg: EngineConfig, bucket: str = "DAY"
) -> DataFrame:
    """The hot-key scale lever: enriched_ticks re-keyed on (product_id,
    time-bucket) with lookback carry, so one pathological instrument (BTC)
    no longer serializes on a single task.

    The per-key window stage is sequential by semantics (Flink shares the
    property), so parallelism is bounded by key cardinality. Re-keying on
    symbol×day multiplies the key space by the day count; to keep rolling
    frames exact across bucket boundaries, the last ``lookback_rows(cfg)``
    rows of each key's bucket are replicated into that key's NEXT bucket
    (skipping empty buckets), features are computed on the finer key, and
    the carry rows are dropped after. Every frame then sees the identical
    ordered predecessor rows as the global plan, so the output is
    bit-identical — asserted by tests/test_skew_rekey.py.

    Contract: each (product_id, bucket) with a successor must hold at least
    ``lookback_rows(cfg)`` rows (one bucket of carry is chained, not a
    recursive history). That always holds in the hot-key regime this lever
    exists for; sparse keys should stay on the single-key plan — at scale
    you route keys by observed cardinality.

    Cost: one extra shuffle of the tiny tail relation (≤ L rows per
    key-bucket) plus the bucket-list window; the body shuffles once on the
    finer key, same as the single-key plan shuffles once on the coarse key.
    """
    L = lookback_rows(cfg)
    base = normalized_base(ticks).withColumn(
        "bucket_ts", F.date_trunc(bucket, F.col("event_time"))
    )

    # last L rows of each (product, bucket), candidates to carry forward
    w_desc = Window.partitionBy("product_id", "bucket_ts").orderBy(
        F.desc("event_time"), F.desc("sequence")
    )
    tail = (
        base.withColumn("_rn", F.row_number().over(w_desc))
        .filter(F.col("_rn") <= L)
        .drop("_rn")
    )
    # route each bucket's tail to the key's next non-empty bucket
    buckets = base.select("product_id", "bucket_ts").distinct()
    w_next = Window.partitionBy("product_id").orderBy("bucket_ts")
    nxt = buckets.withColumn("_next", F.lead("bucket_ts").over(w_next)).filter(
        F.col("_next").isNotNull()
    )
    carry = (
        tail.join(nxt, ["product_id", "bucket_ts"], "inner")
        .withColumn("bucket_ts", F.col("_next"))
        .drop("_next")
        .withColumn("_carry", F.lit(1))
    )

    allrows = base.withColumn("_carry", F.lit(0)).unionByName(carry)
    cum_exprs, returns, volatility, fast, slow = _rolling_features(
        TICK_OVER_REKEYED, cfg
    )
    allrows = allrows.selectExpr("*", *cum_exprs)
    df = allrows.selectExpr(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "best_bid",
        "best_ask",
        f"{returns} AS returns",
        f"{volatility} AS volatility",
        f"{fast} AS fast_sma",
        f"{slow} AS slow_sma",
        "bucket_ts",
        "_carry",
    )
    df = df.selectExpr("*", "fast_sma - slow_sma AS sig_spread")
    df = df.selectExpr(
        "*",
        f"lag(sig_spread, {cfg.confirmation}) OVER ({TICK_OVER_REKEYED})"
        " AS prev_sig_spread",
    )
    return df.filter(F.col("_carry") == 0).drop("_carry", "bucket_ts")


# Default hot-key threshold for auto-routing: rows one task can sort +
# window-scan inside a comfortable memory/latency envelope. A window-stage
# task over k rows is O(k log k) sort + O(k) scan of ~6 numeric columns
# (~80 B/row → 10M rows ≈ 800 MB spill-managed sort, minutes of task time).
# Beyond that a single pathological key (BTC) serializes the stage; below
# it the extra carry shuffle of the re-keyed plan is pure overhead.
HOT_KEY_ROWS_DEFAULT = 10_000_000


def choose_tick_plan(
    ticks: DataFrame, cfg: EngineConfig, hot_key_rows: int = HOT_KEY_ROWS_DEFAULT
) -> str:
    """Decide 'single' vs 'rekeyed' from the OBSERVED hottest-key row count.

    SCALE.md documents the routing policy ("at scale you route keys by
    observed cardinality"); this makes the policy executable instead of
    leaving the choice to every caller. The statistic is one cheap
    partial-aggregated job — a per-key count (map-side combined, shuffles
    #keys rows) reduced to a single max on the driver, the same shape of
    stats collection AQE itself performs. It reads only ``product_id``
    (column-pruned scan), so at 100 TB the stats pass touches one thin
    column, not the tick payload.

    Deliberately a scalar ``.first()`` — NOT a ``.collect()`` loop over
    data; tests/test_plans.py's no-driver-side-iteration audit stays valid.
    """
    row = (
        ticks.groupBy("product_id")
        .count()
        .agg(F.max("count").alias("max_rows"))
        .first()
    )
    hottest = row["max_rows"] or 0
    return "rekeyed" if hottest > hot_key_rows else "single"


def enriched_ticks_auto(
    ticks: DataFrame,
    cfg: EngineConfig,
    hot_key_rows: int = HOT_KEY_ROWS_DEFAULT,
    bucket: str = "DAY",
) -> DataFrame:
    """enriched_ticks with the hot-key lever engaged automatically.

    Routes to :func:`enriched_ticks_rekeyed` when the hottest instrument
    exceeds ``hot_key_rows`` rows, else the cheaper single-key plan. Both
    plans are bit-identical in output (tests/test_skew_rekey.py), so the
    route changes only the physical shape, never the result.
    """
    if choose_tick_plan(ticks, cfg, hot_key_rows) == "rekeyed":
        return enriched_ticks_rekeyed(ticks, cfg, bucket=bucket)
    return enriched_ticks(ticks, cfg)


def normalized_prices(ticks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P2 + W1 + W2 — returns and rolling volatility
    (reference: sma_cross.py:76-105)."""
    base = normalized_base(ticks)
    prev_mid = f"lag(mid_price) OVER ({TICK_OVER})"
    vol_frame = (
        f"{TICK_OVER} ROWS BETWEEN {cfg.volatility_window - 1} PRECEDING"
        " AND CURRENT ROW"
    )
    return base.selectExpr(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "best_bid",
        "best_ask",
        f"CASE WHEN (({prev_mid}) IS NULL) OR (({prev_mid}) = 0)"
        f" THEN CAST(NULL AS DOUBLE)"
        f" ELSE (mid_price - ({prev_mid})) / ({prev_mid}) END AS returns",
        f"stddev_pop(mid_price) OVER ({vol_frame}) AS volatility",
    )
