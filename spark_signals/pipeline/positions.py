"""Position & cost-model stage — J1, W6, W7, P5-P10.

crossover signals → continuous positions (sparse-signal forward-fill) →
position transitions, dynamic slippage/latency, simulated executions.

Reference semantics: sma_cross.py:186-360. Two deliberate choices, documented
per SURVEY.md §7:

* **J1 inlining.** The reference left-joins ``normalized_prices`` back to
  ``crossover_signals`` on (product_id, event_time) — an identity
  re-attachment, since both derive row-for-row from the same stream
  (sma_cross.py:186-208). We compute the signal columns inline on one
  DataFrame: same semantics, zero extra shuffle. ``positions_base_join``
  keeps the explicit join form for parity checking (oracle query q-j1).

* **Sparse-signal forward-fill.** As written, the reference joins the
  *unfiltered* signal view, whose HOLD rows carry position 0.0 — which would
  make the ``LAST_VALUE(signal_position, TRUE) IGNORE NULLS`` forward-fill
  (sma_cross.py:223-230) a no-op. The evident intent (ignore-nulls +
  COALESCE seed; SURVEY.md §2.3 W6; FIXTURES.md §2 "positions forward-fill
  to 1.0 thereafter") is that only non-HOLD signals attach and holds leave
  NULLs to be filled. We implement the intended semantics: signal_position is
  NULL unless a crossover fired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_signals.config import EngineConfig
from spark_signals.pipeline import jsonfmt as J
from spark_signals.pipeline.normalize import tick_window


def positions_base_inline(enriched: DataFrame, cfg: EngineConfig) -> DataFrame:
    """normalize.enriched_ticks → positions_base, as a pure projection.

    Semantically equals the reference's J1 left join of sparse (non-HOLD)
    signals (sma_cross.py:186-208) but reuses the shared window stage — no
    join, no second shuffle.
    """
    from spark_signals.pipeline.sma_cross import SPREAD_DECISION_DP
    from spark_signals.rounding import sround

    df = enriched
    # same dp=9 decision grid as every other crossover implementation
    # (sround∘lag ≡ lag∘sround, so this matches the join variant exactly)
    spread_r = sround(F.col("sig_spread"), SPREAD_DECISION_DP)
    prev_r = sround(F.col("prev_sig_spread"), SPREAD_DECISION_DP)
    long_cond = (spread_r > 0) & (prev_r <= 0)
    short_cond = (spread_r < 0) & (prev_r >= 0)
    quote_spread = F.when(
        F.col("best_bid").isNotNull() & F.col("best_ask").isNotNull(),
        F.col("best_ask") - F.col("best_bid"),
    )
    return df.select(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "returns",
        "volatility",
        "best_bid",
        "best_ask",
        quote_spread.alias("spread"),
        # sparse: NULL unless a crossover fired (see module docstring)
        F.when(long_cond, F.lit(1.0)).when(short_cond, F.lit(-1.0)).alias("signal_position"),
    )


def positions_base_join(norm: DataFrame, signals: DataFrame) -> DataFrame:
    """J1 — explicit left-join form (reference: sma_cross.py:186-208), with the
    sparse-signal fix: only non-HOLD signals re-attach.

    Kept for operator parity / correctness checks. Both sides are already
    hash-partitioned by product_id from their window stages; with the tick
    stream as the big side this is a co-partitioned sort-merge join.
    """
    sparse = signals.filter(F.col("signal_type") != "HOLD").select(
        F.col("instrument_id"),
        F.col("signal_time"),
        F.col("sequence").alias("signal_sequence"),
        F.col("position").alias("signal_position"),
    )
    quote_spread = F.when(
        norm["best_bid"].isNotNull() & norm["best_ask"].isNotNull(),
        norm["best_ask"] - norm["best_bid"],
    )
    joined = norm.join(
        sparse,
        on=[
            norm["product_id"] == sparse["instrument_id"],
            norm["event_time"] == sparse["signal_time"],
            norm["sequence"] == sparse["signal_sequence"],
        ],
        how="left",
    )
    return joined.select(
        norm["product_id"],
        norm["event_time"],
        norm["sequence"],
        norm["mid_price"],
        norm["returns"],
        norm["volatility"],
        norm["best_bid"],
        norm["best_ask"],
        quote_spread.alias("spread"),
        sparse["signal_position"],
    )


#: Internal sparse marker column: non-null exactly on non-HOLD signal rows.
#: Lets downstream tumbling aggregates count signals (A2) in the SAME pass
#: as the performance metrics instead of re-deriving the signal chain from a
#: second scan and joining window-to-window.
SIGNAL_MARKER = "_signal_marker"


def positions_stream(
    base: DataFrame, cfg: EngineConfig, *, keep_signal_marker: bool = False
) -> DataFrame:
    """W6 — ignore-nulls last_value forward-fill, seeded flat
    (reference: sma_cross.py:211-233).

    ``keep_signal_marker=True`` retains the sparse pre-fill signal column as
    :data:`SIGNAL_MARKER` for single-pass metric chains; the default drops
    it so sink-facing relations keep the reference schema."""
    w = tick_window(cfg).rowsBetween(Window.unboundedPreceding, 0)
    position = F.coalesce(
        F.last("signal_position", ignorenulls=True).over(w), F.lit(0.0)
    )
    # one projection (same column order as the former withColumn +
    # rename/drop pair — position appended last): each extra DataFrame op
    # re-analyzes the whole deep chain on the driver
    if keep_signal_marker:
        cols = [
            F.col(c).alias(SIGNAL_MARKER) if c == "signal_position" else F.col(c)
            for c in base.columns
        ]
    else:
        cols = [F.col(c) for c in base.columns if c != "signal_position"]
    return base.select(*cols, position.alias("position"))


def positions_enriched(stream: DataFrame, cfg: EngineConfig) -> DataFrame:
    """W7 + P5 — previous position and guarded ratios
    (reference: sma_cross.py:236-262)."""
    w = tick_window(cfg)
    mid_bad = F.col("mid_price").isNull() | (F.col("mid_price") == 0)
    # one projection for all three derived columns (the two ratios don't
    # reference prev_position, so the lag and the plain expressions coexist
    # in a single select; same column order as the former withColumn chain)
    return stream.select(
        "*",
        F.lag("position").over(w).alias("prev_position"),
        F.when(mid_bad, F.lit(0.0))
        .otherwise(F.coalesce(F.col("volatility"), F.lit(0.0)) / F.col("mid_price"))
        .alias("volatility_ratio"),
        F.when(mid_bad | F.col("spread").isNull(), F.lit(0.0))
        .otherwise(F.col("spread") / F.col("mid_price"))
        .alias("spread_ratio"),
    )


def positions_costs(enriched: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P6 + P8 — position delta, clamped dynamic slippage, clamped dynamic
    fill latency (reference: sma_cross.py:265-314).

    All cost knobs fold into the plan as literals (Catalyst constant-folds the
    clamp bounds), exactly as the reference interpolates config into SQL text.
    """
    slip_raw = (
        F.lit(cfg.slippage_rate)
        + F.col("volatility_ratio") * F.lit(cfg.slippage_volatility_multiplier)
        + F.col("spread_ratio") * F.lit(cfg.slippage_spread_multiplier)
    )
    # reference clamp is a CASE chain (sma_cross.py:270-275): <0 → 0, >max → max
    slippage = (
        F.when(slip_raw < 0, F.lit(0.0))
        .when(slip_raw > cfg.slippage_max_rate, F.lit(cfg.slippage_max_rate))
        .otherwise(slip_raw)
    )
    # latency increment truncates toward zero (Flink CAST DOUBLE→BIGINT;
    # volatility_ratio ≥ 0 so floor ≡ trunc), then clamps to
    # [base, base + jitter] (sma_cross.py:276-288). The product is gridded
    # at dp=6 before the floor: its raw last ulp is engine-dependent and can
    # straddle an integer (observed 424 vs 425 at sf0.1) — the oracle grids
    # identically.
    from spark_signals.rounding import sround

    lat_inc = F.floor(
        sround(F.lit(float(cfg.fill_latency_volatility_ms)) * F.col("volatility_ratio"), 6)
    ).cast("long")
    lat_raw = F.lit(cfg.fill_latency_ms) + lat_inc
    lat_hi = cfg.fill_latency_ms + cfg.fill_latency_jitter_ms
    latency = (
        F.when(lat_raw < cfg.fill_latency_ms, F.lit(cfg.fill_latency_ms))
        .when(lat_raw > lat_hi, F.lit(lat_hi))
        .otherwise(lat_raw)
        .cast("long")
    )
    # marker-bearing chains (positions_stream(keep_signal_marker=True))
    # forward the sparse signal column for the fused A1+A2 aggregate
    marker = [F.col(SIGNAL_MARKER)] if SIGNAL_MARKER in enriched.columns else []
    return enriched.select(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "returns",
        "volatility",
        "best_bid",
        "best_ask",
        "spread",
        "position",
        "prev_position",
        (F.col("position") - F.coalesce(F.col("prev_position"), F.lit(0.0))).alias(
            "position_change"
        ),
        "volatility_ratio",
        "spread_ratio",
        slippage.alias("slippage_rate"),
        F.lit(cfg.transaction_cost_rate).alias("transaction_cost_rate"),
        (slippage + F.lit(cfg.transaction_cost_rate)).alias("trade_cost_rate"),
        latency.alias("fill_latency_ms"),
        *marker,
    )


def executions(costs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P7 + P10 — simulated fills: latency-shifted execution_time,
    direction-signed slippage on price, per-fill costs; only rows that trade
    (reference: sma_cross.py:318-353)."""
    chg = F.col("position_change")
    exec_price = (
        F.when(chg > 0, F.col("mid_price") * (F.lit(1.0) + F.col("slippage_rate")))
        .when(chg < 0, F.col("mid_price") * (F.lit(1.0) - F.col("slippage_rate")))
        .otherwise(F.col("mid_price"))
    )
    metadata = F.to_json(
        F.struct(
            F.col("fill_latency_ms").cast("string").alias("fill_latency_ms"),
            J.fmt_fixed(F.col("slippage_rate"), 9).alias("slippage_rate"),
            F.lit(cfg.execution_mode).alias("execution_mode"),
        )
    )
    return costs.filter(chg != 0).select(
        F.lit(cfg.strategy_run_id).alias("strategy_run_id"),
        "product_id",
        F.col("sequence"),
        F.col("event_time").alias("signal_time"),
        F.expr("timestampadd(MILLISECOND, fill_latency_ms, event_time)").alias(
            "execution_time"
        ),
        chg.alias("position_change"),
        exec_price.alias("execution_price"),
        F.col("mid_price").alias("base_price"),
        (F.abs(chg) * F.col("mid_price") * F.lit(cfg.transaction_cost_rate)).alias(
            "transaction_cost"
        ),
        (F.abs(chg) * F.col("mid_price") * F.col("slippage_rate")).alias("slippage_cost"),
        metadata.alias("metadata"),
    )


def position_transitions(costs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Position-transition ledger: rows only where the position changed
    (reference: sma_cross.py:356-378)."""
    chg = F.col("position_change")
    metadata = F.to_json(
        F.struct(
            J.fmt_fixed(F.coalesce(F.col("prev_position"), F.lit(0.0)), 1).alias("prev_position"),
            F.lit(str(cfg.transaction_cost_bps)).alias("transaction_cost_bps"),
            F.lit(str(cfg.slippage_bps)).alias("slippage_bps"),
            J.fmt_fixed(F.col("slippage_rate"), 9).alias("effective_slippage_rate"),
            F.lit(cfg.execution_mode).alias("execution_mode"),
        )
    )
    return costs.filter(
        F.col("prev_position").isNull() | (F.col("position") != F.col("prev_position"))
    ).select(
        F.lit(cfg.strategy_run_id).alias("strategy_run_id"),
        "product_id",
        "event_time",
        "sequence",
        "position",
        "position_change",
        (F.abs(chg) * F.col("mid_price") * F.lit(cfg.transaction_cost_rate)).alias(
            "transaction_cost"
        ),
        (F.abs(chg) * F.col("mid_price") * F.col("slippage_rate")).alias("slippage_cost"),
        (F.abs(chg) * F.col("mid_price") * F.col("trade_cost_rate")).alias("trade_cost"),
        "mid_price",
        metadata.alias("metadata"),
    )
