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
