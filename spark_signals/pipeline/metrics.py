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
from spark_signals.rounding import sql_str_lit
from spark_signals.pipeline.positions import SIGNAL_MARKER as P_SIGNAL_MARKER


def position_returns(costs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P8 + P9 — per-tick cost and realized-pnl series
    (reference: performance.py:36-61)."""
    chg_notional = "ABS(position_change) * mid_price"
    # single-pass chains (positions_stream(keep_signal_marker=True)) forward
    # the sparse signal marker so A2's count fuses into A1's aggregate.
    # SQL-text projection (one py4j round trip; identical Catalyst
    # expressions — tests/test_plan_equality.py).
    marker = [P_SIGNAL_MARKER] if P_SIGNAL_MARKER in costs.columns else []
    return costs.selectExpr(
        "product_id",
        "event_time",
        "sequence",
        "mid_price",
        "COALESCE(returns, 0.0D) AS asset_return",
        "position",
        "prev_position",
        "position_change",
        "transaction_cost_rate",
        "slippage_rate",
        "trade_cost_rate",
        f"{chg_notional} * transaction_cost_rate AS transaction_cost",
        f"{chg_notional} * slippage_rate AS slippage_cost",
        f"{chg_notional} * trade_cost_rate AS trade_cost",
        "COALESCE(prev_position, 0.0D) * COALESCE(returns, 0.0D)"
        f" - {chg_notional} * trade_cost_rate AS realized_pnl",
        "ABS(position) * mid_price AS notional_exposure",
        "ABS(position) AS unit_exposure",
        *marker,
    )


def performance_windows(returns: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A1 — 5-minute tumbling performance aggregates
    (reference: performance.py:62-100)."""
    win = F.window("event_time", cfg.metrics_window)
    # fused A2: when the chain carries the sparse signal marker
    # (non-null exactly on non-HOLD signal rows; signal_time == event_time
    # by construction), the signal count folds into THIS aggregate —
    # COUNT(marker) over the same rows equals signal_counts' COUNT(*) over
    # the filtered signal relation, eliminating a second base-table scan,
    # its window chain, and the window-to-window join.
    fused = (
        [f"count({P_SIGNAL_MARKER}) AS trades_executed"]
        if P_SIGNAL_MARKER in returns.columns
        else []
    )
    from spark_signals.rounding import micro_units_sql

    # exact integer micro-unit sum (see rounding.micro_units): p² is
    # per-row-deterministic, but a raw double SUM is summation-order
    # -dependent and at ~1e8 magnitude its ulp straddles the dp=6
    # output grid (observed at sf0.1)
    downside = (
        "CAST(sum(CASE WHEN realized_pnl < 0 THEN "
        + micro_units_sql("realized_pnl * realized_pnl", 6)
        + " ELSE 0 END) AS DOUBLE) / 1000000.0D AS downside_sum"
    )
    aggs = [
        *fused,
        "avg(realized_pnl) AS avg_return",
        "stddev_pop(realized_pnl) AS volatility",
        "sum(realized_pnl) AS cumulative_return",
        downside,
        "count(realized_pnl) AS sample_size",
        "count(CASE WHEN realized_pnl < 0 THEN 1 END) AS negative_samples",
        "min(realized_pnl) AS min_return",
        "avg(notional_exposure) AS avg_notional_exposure",
        "avg(unit_exposure) AS avg_unit_exposure",
        "sum(trade_cost) AS total_trade_cost",
        "sum(transaction_cost) AS total_transaction_cost",
        "sum(slippage_cost) AS total_slippage_cost",
    ]
    return (
        returns.groupBy(win.alias("w"))
        .agg(*[F.expr(a) for a in aggs])
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
    sharpe = (
        "CASE WHEN (volatility IS NULL) OR (volatility = 0)"
        " THEN CAST(NULL AS DOUBLE)"
        " ELSE (avg_return / volatility) * SQRT(12.0D) END"
    )
    downside_dev = "SQRT(downside_sum / negative_samples)"
    sortino = (
        "CASE WHEN (downside_sum IS NULL) OR (negative_samples = 0)"
        " THEN CAST(NULL AS DOUBLE)"
        f" ELSE (avg_return / NULLIF({downside_dev}, 0.0D)) * SQRT(12.0D) END"
    )
    metadata = (
        "to_json(struct("
        "CAST(sample_size AS STRING) AS sample_size, "
        "CAST(negative_samples AS STRING) AS negative_samples, "
        f"{J.fmt_fixed_sqltext('avg_unit_exposure', 6)} AS average_unit_exposure, "
        f"{J.fmt_fixed_sqltext('total_trade_cost', 9)} AS total_trade_cost, "
        f"{J.fmt_fixed_sqltext('total_transaction_cost', 9)} AS total_transaction_cost, "
        f"{J.fmt_fixed_sqltext('total_slippage_cost', 9)} AS total_slippage_cost, "
        f"{sql_str_lit(cfg.execution_mode)} AS execution_mode))"
    )
    if counts is None:
        joined = perf
        trades = "trades_executed"  # fused COUNT — never null
    else:
        joined = perf.join(counts, on=["window_start", "window_end"], how="left")
        trades = "COALESCE(trades_executed, 0)"
    return joined.selectExpr(
        f"{sql_str_lit(cfg.strategy_run_id)} AS strategy_run_id",
        "window_start",
        "window_end AS metric_time",
        f"{sql_str_lit(cfg.metrics_window_label)} AS window_label",
        f"{sharpe} AS sharpe_ratio",
        f"{sortino} AS sortino_ratio",
        "cumulative_return",
        "min_return AS drawdown",
        "volatility",
        f"{trades} AS trades_executed",
        "avg_notional_exposure AS avg_exposure_notional",
        "total_trade_cost",
        "total_transaction_cost",
        "total_slippage_cost",
        f"{metadata} AS metadata",
        "sample_size",
        "negative_samples",
    )
