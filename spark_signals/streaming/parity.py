"""Streaming parity queries.

The stateful streaming path is held to the SAME DuckDB oracle as the batch
window plan: `streaming_positions_costs` runs the real Structured Streaming
pipeline (file source → watermark → applyInPandasWithState → memory sink,
availableNow trigger) and must hash-match SQL_POSITIONS_COSTS — the
bit-parity claim from streaming/features.py, checked end-to-end by the
driver. `streaming_metrics_5m` additionally runs the native watermarked
tumbling aggregation on top of the feature stream (complete output mode so
trailing windows are emitted in the drain run).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.io.sources import load_ticks
from spark_signals.parity import (
    _COST_ROUND,
    SQL_POSITIONS_COSTS,
    _round_cols,
)
from spark_signals.streaming.features import stateful_features
from spark_signals.streaming.job import read_tick_stream, streaming_metrics

CFG = EngineConfig()

_COST_COLS = [
    "product_id", "event_time", "sequence", "mid_price", "returns", "volatility",
    "best_bid", "best_ask", "spread", "position", "prev_position", "position_change",
    "volatility_ratio", "spread_ratio", "slippage_rate", "transaction_cost_rate",
    "trade_cost_rate", "fill_latency_ms",
]


def _materialize_tick_files(spark: SparkSession, sf_dir: str) -> str:
    """Write the adapted tick stream as a single sorted parquet file so the
    file source replays it as one in-order micro-batch (the deterministic-
    backtest mode, T7; multi-batch replay is exercised in tests).

    The cache key includes the source's mtime+size: the driver has
    regenerated the testdata in place between rounds (even switching
    parquet timestamp flavor), and a path-only key would silently replay
    STALE ticks against a freshly-generated oracle."""
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        # nanosecond mtime: a same-second regeneration with equal byte size
        # must still invalidate
        token = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        token = "nosrc"
    key = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(tempfile.gettempdir(), f"spark_signals_ticks_{key}_{token}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        # drop superseded caches for this sf_dir first: each testdata
        # regeneration changes the token, and without cleanup every
        # regeneration leaks one full tick copy into the temp dir
        import glob
        import shutil

        for stale in glob.glob(
            os.path.join(tempfile.gettempdir(), f"spark_signals_ticks_{key}_*")
        ):
            if stale != out:
                shutil.rmtree(stale, ignore_errors=True)
        ticks = load_ticks(spark, sf_dir).orderBy("event_time", "sequence")
        ticks.coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _run_stream_to_table(spark: SparkSession, df: DataFrame, name: str, mode: str) -> DataFrame:
    import uuid

    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    query = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(qname)


def q_streaming_positions_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _materialize_tick_files(spark, sf_dir)
    ticks = read_tick_stream(spark, src).withWatermark("event_time", CFG.watermark_delay)
    feats = stateful_features(ticks, CFG)
    table = _run_stream_to_table(spark, feats, "stream_costs", "append")
    return _round_cols(table.select(*_COST_COLS), _COST_ROUND)


def q_streaming_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling streaming metrics drained through an in-memory table.

    ``outputMode("complete")`` is correct ONLY for this availableNow drain
    harness (one bounded replay, final state read once). It re-emits the
    full aggregation state every trigger and is NOT the production shape —
    the production path (``job.run_streaming_job``) uses append mode with
    watermark-closed windows and foreachBatch sinks."""
    src = _materialize_tick_files(spark, sf_dir)
    ticks = read_tick_stream(spark, src)
    feats = stateful_features(
        ticks.withWatermark("event_time", CFG.watermark_delay), CFG
    )
    metr = streaming_metrics(feats, CFG).drop("window")
    table = _run_stream_to_table(spark, metr, "stream_metrics", "complete")
    rounded = _round_cols(
        table,
        {
            "avg_return": 9,
            "volatility": 9,
            "cumulative_return": 9,
            "downside_sum": 6,
            "min_return": 9,
            "total_trade_cost": 9,
        },
    )
    return rounded


def _streaming_metrics_oracle() -> str:
    """Reuse the batch performance_windows CTE chain, re-projected to the
    streaming aggregate's column set."""
    from spark_signals import oracle

    return (
        oracle.with_chain(CFG, upto="metrics")
        + """
SELECT window_start, window_end,
       floor((avg_return) * 1e9 + 0.5000001) / 1e9 AS avg_return,
       floor((volatility) * 1e9 + 0.5000001) / 1e9 AS volatility,
       floor((cumulative_return) * 1e9 + 0.5000001) / 1e9 AS cumulative_return,
       floor((downside_sum) * 1e6 + 0.5000001) / 1e6 AS downside_sum,
       sample_size, negative_samples,
       floor((min_return) * 1e9 + 0.5000001) / 1e9 AS min_return,
       floor((total_trade_cost) * 1e9 + 0.5000001) / 1e9 AS total_trade_cost
FROM performance_windows"""
    )


def q_streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 as a chained second streaming aggregation (append mode): hourly
    windows emit only once their 5-minute children are all finalized under
    the watermark — the oracle models that cut explicitly."""
    from spark_signals.streaming.job import streaming_hourly_rollup

    src = _materialize_tick_files(spark, sf_dir)
    ticks = read_tick_stream(spark, src)
    feats = stateful_features(
        ticks.withWatermark("event_time", CFG.watermark_delay), CFG
    )
    # Round-before-aggregate + exact integer re-aggregation (same doctrine
    # as parity.q_hourly_rollup / pipeline.rollup.hourly_rollup_exact): the
    # 5-minute sums carry cross-engine ulp drift from partial-agg sum order,
    # so grid them at dp=9 on BOTH engines; streaming_hourly_rollup then
    # recovers the gridded values as BIGINT micro-units and SUMs integers —
    # order-independent, so micro-batch boundaries can't flip the outer
    # rounding. The oracle's metrics_rounded_s/hourly CTEs mirror this.
    metr5 = _round_cols(
        streaming_metrics(feats, CFG),
        {"cumulative_return": 9, "min_return": 9, "total_trade_cost": 9},
    )
    roll = streaming_hourly_rollup(metr5, CFG)
    table = _run_stream_to_table(spark, roll, "stream_rollup", "append")
    return _round_cols(
        table,
        {
            "cumulative_return_sum": 9,
            "min_return": 9,
            "total_trade_cost_sum": 9,
        },
    )


def _streaming_rollup_oracle() -> str:
    """Batch hourly rollup of performance_windows, cut to hourly windows
    fully finalized under the final watermark (max event_time − 5s).

    The hourly bucket keys on window_time(window) = window_end − 1µs, so a
    5-minute window ending exactly on the hour belongs to the PREVIOUS hour
    — mirrored with (window_end − INTERVAL 1 MICROSECOND).
    """
    from spark_signals import oracle

    return (
        oracle.with_chain(CFG, upto="metrics")
        + """
, metrics_rounded_s AS (
    SELECT
        window_end, sample_size,
        floor(cumulative_return * 1e9 + 0.5000001) / 1e9 AS cumulative_return,
        floor(min_return * 1e9 + 0.5000001) / 1e9 AS min_return,
        floor(total_trade_cost * 1e9 + 0.5000001) / 1e9 AS total_trade_cost
    FROM performance_windows
),
hourly AS (
    -- dp=9-gridded inputs recovered as exact BIGINT micro-units, summed as
    -- integers (order-independent), ONE division at the end — mirrors
    -- streaming_hourly_rollup's arithmetic bit-for-bit
    SELECT
        time_bucket(INTERVAL '1 hour', window_end - INTERVAL 1 MICROSECOND) AS bucket,
        CAST(SUM(CAST(floor(cumulative_return * 1e9 + 0.5000001) AS BIGINT)) AS DOUBLE) / 1e9
            AS cumulative_return_sum,
        MIN(min_return) AS min_return,
        -- CAST: DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64, but Spark's
        -- sum(long) stays int64; the driver hash sees 5.0 vs 5. Pin to BIGINT.
        CAST(SUM(sample_size) AS BIGINT) AS sample_size_sum,
        CAST(SUM(CAST(floor(total_trade_cost * 1e9 + 0.5000001) AS BIGINT)) AS DOUBLE) / 1e9
            AS total_trade_cost_sum,
        COUNT(*) AS n_windows
    FROM metrics_rounded_s
    GROUP BY 1
),
wm AS (SELECT max(event_time) - INTERVAL 5 SECOND AS w FROM ticks)
SELECT bucket,
       floor((cumulative_return_sum) * 1e9 + 0.5000001) / 1e9 AS cumulative_return_sum,
       floor((min_return) * 1e9 + 0.5000001) / 1e9 AS min_return,
       sample_size_sum,
       floor((total_trade_cost_sum) * 1e9 + 0.5000001) / 1e9 AS total_trade_cost_sum,
       n_windows
FROM hourly, wm
WHERE bucket + INTERVAL '1 hour' <= wm.w"""
    )


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (the Flink interval-join analog): a
    trades stream joins a quotes stream on product within a trailing 1-day
    event-time bound. Both sides carry watermarks, so Spark bounds the join
    state buffers — the stream-stream join pattern a live deployment uses to
    re-attach enrichment topics. availableNow drain makes it deterministic;
    the oracle is the identical batch join."""
    src = _materialize_tick_files(spark, sf_dir)
    trades = (
        read_tick_stream(spark, src)
        .filter(F.col("sequence") % 2 == 1)
        .select(
            F.col("product_id"),
            F.col("event_time").alias("t_time"),
            F.col("sequence").alias("t_seq"),
            F.col("price").alias("t_price"),
        )
        .withWatermark("t_time", CFG.watermark_delay)
    )
    quotes = (
        read_tick_stream(spark, src)
        .filter((F.col("sequence") % 2 == 0) & F.col("best_bid").isNotNull())
        .select(
            F.col("product_id").alias("q_product"),
            F.col("event_time").alias("q_time"),
            F.col("sequence").alias("q_seq"),
            F.col("best_bid").alias("q_bid"),
        )
        .withWatermark("q_time", CFG.watermark_delay)
    )
    joined = trades.join(
        quotes,
        F.expr(
            "product_id = q_product AND "
            "q_time >= t_time - INTERVAL 1 DAY AND q_time < t_time"
        ),
        "inner",
    ).select("product_id", "t_time", "t_seq", "t_price", "q_time", "q_seq", "q_bid")
    return _run_stream_to_table(spark, joined, "stream_ivjoin", "append")


def _streaming_interval_join_oracle() -> str:
    from spark_signals import oracle

    return (
        "WITH "
        + oracle.ticks_cte().strip()
        + """
SELECT t.product_id, t.event_time AS t_time, t.sequence AS t_seq, t.price AS t_price,
       q.event_time AS q_time, q.sequence AS q_seq, q.best_bid AS q_bid
FROM ticks t
JOIN ticks q
  ON q.product_id = t.product_id
 AND q.event_time >= t.event_time - INTERVAL 1 DAY
 AND q.event_time < t.event_time
WHERE t.sequence % 2 = 1 AND q.sequence % 2 = 0 AND q.best_bid IS NOT NULL"""
    )


STREAMING_QUERIES = {
    "streaming_positions_costs": (q_streaming_positions_costs, SQL_POSITIONS_COSTS),
    "streaming_metrics_5m": (q_streaming_metrics, _streaming_metrics_oracle()),
    "streaming_hourly_rollup_chained": (q_streaming_hourly_rollup, _streaming_rollup_oracle()),
    "streaming_interval_join": (
        q_streaming_interval_join,
        _streaming_interval_join_oracle(),
    ),
}
