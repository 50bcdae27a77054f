"""Hourly rollup — A4, the continuous-aggregate analog.

metrics_enriched → 1-hour buckets with AVG(sharpe), AVG(sortino),
LAST(cumulative_return ORDER BY metric_time) via max_by, MAX(drawdown),
SUM(trades_executed).

Reference semantics: docker/postgres/init/03_continuous_aggregates.sql:3-22
(TimescaleDB continuous aggregate `strategy_metrics_hourly`, time_bucket
'1 hour', refreshed every 15 min). In Spark this is either a second streaming
aggregation or — as here — a scheduled batch aggregation over the metrics
table; both produce the same relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig


# re-exported from spark_signals.rounding (shared with the telemetry rollup
# and the streaming chained rollup)
from spark_signals.rounding import exact_avg, micro_units  # noqa: E402,F401


def hourly_rollup_exact(metrics: DataFrame, cfg: EngineConfig, *, avg_dp: int = 6) -> DataFrame:
    """Order-independent A4 rollup for cross-engine parity (and deterministic
    re-runs at any partitioning).

    ``AVG`` over doubles is summation-order-dependent at the last ulp; with
    721 buckets × 4 float columns that ulp occasionally flipped the outer
    grid rounding (driver CORRECTNESS r01+r02 red). Here the AVG inputs are
    pre-gridded to integer micro-units and summed as BIGINT — exact and
    associative — with ONE division at the end. max_by/MAX/SUM(int) are
    already order-independent on gridded inputs.

    Reference semantics: docker/postgres/init/03_continuous_aggregates.sql:3-22.
    """
    from spark_signals.rounding import micro_units_sql

    win = F.window("metric_time", cfg.rollup_window)
    scale = float(10**avg_dp)
    aggs = [
        f"sum({micro_units_sql('sharpe_ratio', avg_dp)}) AS sharpe_sum_u",
        "count(sharpe_ratio) AS sharpe_n",
        f"sum({micro_units_sql('sortino_ratio', avg_dp)}) AS sortino_sum_u",
        "count(sortino_ratio) AS sortino_n",
        "max_by(cumulative_return, metric_time) AS cumulative_return_last",
        "max(drawdown) AS max_drawdown",
        "sum(trades_executed) AS trades_executed_sum",
    ]
    return (
        metrics.groupBy("strategy_run_id", "window_label", win.alias("w"))
        .agg(*[F.expr(a) for a in aggs])
        .selectExpr(
            "strategy_run_id",
            "window_label",
            "w.start AS bucket",
            "(CAST(sharpe_sum_u AS DOUBLE) / CAST(sharpe_n AS DOUBLE))"
            f" / {scale!r}D AS sharpe_avg",
            "(CAST(sortino_sum_u AS DOUBLE) / CAST(sortino_n AS DOUBLE))"
            f" / {scale!r}D AS sortino_avg",
            "cumulative_return_last",
            "max_drawdown",
            "trades_executed_sum",
        )
    )


def hourly_rollup(metrics: DataFrame, cfg: EngineConfig) -> DataFrame:
    win = F.window("metric_time", cfg.rollup_window)
    return (
        metrics.groupBy(
            "strategy_run_id",
            "window_label",
            win.alias("w"),
        )
        .agg(
            F.avg("sharpe_ratio").alias("sharpe_avg"),
            F.avg("sortino_ratio").alias("sortino_avg"),
            # TimescaleDB LAST(value, time) == max_by(value, time)
            F.expr("max_by(cumulative_return, metric_time)").alias("cumulative_return_last"),
            F.max("drawdown").alias("max_drawdown"),
            F.sum("trades_executed").alias("trades_executed_sum"),
        )
        .select(
            "strategy_run_id",
            "window_label",
            F.col("w.start").alias("bucket"),
            "sharpe_avg",
            "sortino_avg",
            "cumulative_return_last",
            "max_drawdown",
            "trades_executed_sum",
        )
    )
