"""Performance-metrics stage — A1, A2, A3, J2.

positions_costs → per-tick position returns → event-time tumbling-window
performance aggregates (Sharpe/Sortino/cumulative return/drawdown/volatility,
exposures, cost totals) left-joined with tumbling trade counts.

Reference semantics: metrics/performance.py:36-157. Deliberately preserved
quirks (SURVEY.md §7.5): "drawdown" is MIN(realized_pnl) within the window
(not peak-to-trough), and Sharpe/Sortino annualize 5-minute windows with
SQRT(12.0).

Scale notes: the tumbling aggregation is a partial-aggregating hash
aggregate — map-side combine happens before the (window, …) shuffle, so the
shuffle carries one row per (window) per upstream partition, not per tick.
The J2 window-to-window join joins two already-aggregated tiny relations —
Spark broadcasts the count side automatically under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.pipeline import jsonfmt as J
from spark_signals.pipeline.positions import SIGNAL_MARKER as P_SIGNAL_MARKER
from spark_signals.rounding import micro_units as _micro


def position_returns(costs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P8 + P9 — per-tick cost and realized-pnl series
    (reference: performance.py:36-61)."""
    chg_notional = F.abs(F.col("position_change")) * F.col("mid_price")
    # single-pass chains (positions_stream(keep_signal_marker=True)) forward
    # the sparse signal marker so A2's count fuses into A1's aggregate
    marker = [F.col(P_SIGNAL_MARKER)] if P_SIGNAL_MARKER in costs.columns else []
    return costs.select(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        F.coalesce(F.col("returns"), F.lit(0.0)).alias("asset_return"),
        "position",
        "prev_position",
        "position_change",
        "transaction_cost_rate",
        "slippage_rate",
        "trade_cost_rate",
        (chg_notional * F.col("transaction_cost_rate")).alias("transaction_cost"),
        (chg_notional * F.col("slippage_rate")).alias("slippage_cost"),
        (chg_notional * F.col("trade_cost_rate")).alias("trade_cost"),
        (
            F.coalesce(F.col("prev_position"), F.lit(0.0))
            * F.coalesce(F.col("returns"), F.lit(0.0))
            - chg_notional * F.col("trade_cost_rate")
        ).alias("realized_pnl"),
        (F.abs(F.col("position")) * F.col("mid_price")).alias("notional_exposure"),
        F.abs(F.col("position")).alias("unit_exposure"),
        *marker,
    )


def performance_windows(returns: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A1 — 5-minute tumbling performance aggregates
    (reference: performance.py:62-100)."""
    pnl = F.col("realized_pnl")
    win = F.window("event_time", cfg.metrics_window)
    # fused A2: when the chain carries the sparse signal marker
    # (non-null exactly on non-HOLD signal rows; signal_time == event_time
    # by construction), the signal count folds into THIS aggregate —
    # COUNT(marker) over the same rows equals signal_counts' COUNT(*) over
    # the filtered signal relation, eliminating a second base-table scan,
    # its window chain, and the window-to-window join.
    fused = (
        [F.count(F.col(P_SIGNAL_MARKER)).alias("trades_executed")]
        if P_SIGNAL_MARKER in returns.columns
        else []
    )
    return (
        returns.groupBy(win.alias("w"))
        .agg(
            *fused,
            F.avg(pnl).alias("avg_return"),
            F.stddev_pop(pnl).alias("volatility"),
            F.sum(pnl).alias("cumulative_return"),
            # exact integer micro-unit sum (see rounding.micro_units): p² is
            # per-row-deterministic, but a raw double SUM is summation-order
            # -dependent and at ~1e8 magnitude its ulp straddles the dp=6
            # output grid (observed at sf0.1)
            (
                F.sum(F.when(pnl < 0, _micro(pnl * pnl, 6)).otherwise(F.lit(0)))
                .cast("double") / F.lit(1e6)
            ).alias("downside_sum"),
            F.count(pnl).alias("sample_size"),
            F.count(F.when(pnl < 0, F.lit(1))).alias("negative_samples"),
            F.min(pnl).alias("min_return"),
            F.avg("notional_exposure").alias("avg_notional_exposure"),
            F.avg("unit_exposure").alias("avg_unit_exposure"),
            F.sum("trade_cost").alias("total_trade_cost"),
            F.sum("transaction_cost").alias("total_transaction_cost"),
            F.sum("slippage_cost").alias("total_slippage_cost"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(["trades_executed"] if fused else []),
            "avg_return",
            "volatility",
            "cumulative_return",
            "downside_sum",
            "sample_size",
            "negative_samples",
            "min_return",
            "avg_notional_exposure",
            "avg_unit_exposure",
            "total_trade_cost",
            "total_transaction_cost",
            "total_slippage_cost",
        )
    )


def signal_counts(signals: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A2 — tumbling count of non-HOLD signals
    (reference: performance.py:102-118)."""
    win = F.window("signal_time", cfg.metrics_window)
    return (
        signals.filter(F.col("signal_type") != "HOLD")
        .groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("trades_executed"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "trades_executed",
        )
    )


def metrics_enriched(
    perf: DataFrame, counts: DataFrame | None, cfg: EngineConfig
) -> DataFrame:
    """A3 + J2 — ratio post-aggregates and the window-to-window left join
    (reference: performance.py:120-157).

    ``counts=None`` selects the single-pass form: ``perf`` already carries a
    fused ``trades_executed`` (performance_windows over a marker-bearing
    chain) and the join is skipped entirely — same relation, one base-table
    scan instead of two. The join form remains the J2 witness."""
    sharpe = F.when(
        F.col("volatility").isNull() | (F.col("volatility") == 0), F.lit(None).cast("double")
    ).otherwise((F.col("avg_return") / F.col("volatility")) * F.sqrt(F.lit(12.0)))
    downside_dev = F.sqrt(F.col("downside_sum") / F.col("negative_samples"))
    sortino = F.when(
        F.col("downside_sum").isNull() | (F.col("negative_samples") == 0),
        F.lit(None).cast("double"),
    ).otherwise(
        (F.col("avg_return") / F.nullif(downside_dev, F.lit(0.0))) * F.sqrt(F.lit(12.0))
    )
    metadata = F.to_json(
        F.struct(
            F.col("sample_size").cast("string").alias("sample_size"),
            F.col("negative_samples").cast("string").alias("negative_samples"),
            J.fmt_fixed(F.col("avg_unit_exposure"), 6).alias("average_unit_exposure"),
            J.fmt_fixed(F.col("total_trade_cost"), 9).alias("total_trade_cost"),
            J.fmt_fixed(F.col("total_transaction_cost"), 9).alias("total_transaction_cost"),
            J.fmt_fixed(F.col("total_slippage_cost"), 9).alias("total_slippage_cost"),
            F.lit(cfg.execution_mode).alias("execution_mode"),
        )
    )
    if counts is None:
        joined = perf
        trades = F.col("trades_executed")  # fused COUNT — never null
    else:
        joined = perf.join(counts, on=["window_start", "window_end"], how="left")
        trades = F.coalesce(F.col("trades_executed"), F.lit(0))
    return joined.select(
        F.lit(cfg.strategy_run_id).alias("strategy_run_id"),
        F.col("window_start"),
        F.col("window_end").alias("metric_time"),
        F.lit(cfg.metrics_window_label).alias("window_label"),
        sharpe.alias("sharpe_ratio"),
        sortino.alias("sortino_ratio"),
        F.col("cumulative_return"),
        F.col("min_return").alias("drawdown"),
        F.col("volatility"),
        trades.alias("trades_executed"),
        F.col("avg_notional_exposure").alias("avg_exposure_notional"),
        F.col("total_trade_cost"),
        F.col("total_transaction_cost"),
        F.col("total_slippage_cost"),
        metadata.alias("metadata"),
        F.col("sample_size"),
        F.col("negative_samples"),
    )
