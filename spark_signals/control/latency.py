"""Per-component latency telemetry — the `latency_metrics` hypertable analog.

The reference persists component latencies to a TimescaleDB hypertable
(docker/postgres/init/02_schema.sql:119-136: latency_time, component,
value_ms, strategy_run_id, metadata; 6-hour chunks, (component, time DESC)
index) fed by its monitoring path. The Spark analog:

* telemetry capture — every Structured Streaming micro-batch reports
  per-component wall times in ``StreamingQuery.lastProgress["durationMs"]``
  (addBatch, getBatch, latestOffset, queryPlanning, triggerExecution,
  walCommit, commitOffsets) plus row throughput; ``progress_to_rows``
  flattens one progress dict into typed latency rows.
* storage — ``persist_latency`` appends to parquet partitioned by
  ``latency_date`` (the chunk_time_interval analog; partition pruning
  serves the dashboard's trailing-window reads the way chunk exclusion
  does), with the (component, time) read path served by per-partition
  predicate pushdown instead of a secondary index (SURVEY.md D3 doctrine).
* serving — ``latency_rollup`` is the dashboard query: hourly
  avg/max/total/count per component, with the same exact integer
  micro-unit arithmetic as the A4 rollups so re-runs at any partitioning
  are bit-identical.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_signals.pipeline.rollup import exact_avg, micro_units

LATENCY_SCHEMA = T.StructType(
    [
        T.StructField("latency_time", T.TimestampType(), False),
        T.StructField("component", T.StringType(), False),
        T.StructField("value_ms", T.DoubleType(), False),
        T.StructField("strategy_run_id", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)

# durationMs keys a Spark progress dict reports; kept as the component
# vocabulary so dashboards can pivot on a closed set
COMPONENTS = (
    "latestOffset",
    "getBatch",
    "queryPlanning",
    "addBatch",
    "walCommit",
    "commitOffsets",
    "triggerExecution",
)


def progress_to_rows(progress: dict, strategy_run_id: str | None = None) -> list[dict]:
    """Flatten one StreamingQuery progress dict into latency rows.

    Each durationMs component becomes one row; batch-level context (batchId,
    numInputRows, processedRowsPerSecond) rides along as JSON metadata the
    way the reference's JSONB column does.
    """
    ts = dt.datetime.fromisoformat(progress["timestamp"].replace("Z", "+00:00"))
    import json

    meta = json.dumps(
        {
            "batchId": progress.get("batchId"),
            "numInputRows": progress.get("numInputRows"),
            "processedRowsPerSecond": progress.get("processedRowsPerSecond"),
        },
        sort_keys=True,
    )
    return [
        {
            "latency_time": ts,
            "component": comp,
            "value_ms": float(ms),
            "strategy_run_id": strategy_run_id,
            "metadata": meta,
        }
        for comp, ms in sorted((progress.get("durationMs") or {}).items())
    ]


def sweep_queries(queries: dict[str, object], strategy_run_id: str | None = None) -> list[dict]:
    """One monitor sweep: collect latency rows from every live query handle
    (the cron-cadence capture the reference's healthcheck scripts do against
    the Flink REST API)."""
    rows: list[dict] = []
    for _name, q in queries.items():
        progress = getattr(q, "lastProgress", None)
        if progress:
            rows.extend(progress_to_rows(progress, strategy_run_id))
    return rows


class LatencyListener:
    """Push-based capture: a ``StreamingQueryListener`` that buffers one set
    of latency rows per micro-batch progress event — the always-on analog of
    the reference's cron-cadence healthcheck scrape.

    Rows are buffered in memory (thread-safe) and drained by the caller
    (monitor loop, shutdown hook, scheduled flush) into ``persist_latency``;
    the listener itself never runs Spark actions, since listener callbacks
    execute on the event bus thread. Register/unregister with
    ``spark.streams.addListener(l)`` / ``removeListener(l)``.
    """

    def __init__(self, strategy_run_id: str | None = None, max_buffer: int = 100_000):
        import threading

        from pyspark.sql.streaming import StreamingQueryListener

        self._run_id = strategy_run_id
        self._max = max_buffer
        self._rows: list[dict] = []
        self._dropped = 0
        self._lock = threading.Lock()
        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                import json as _json

                # the whole handler is guarded: an exception escaping a
                # listener callback kills further event delivery silently —
                # a malformed progress payload must drop one sample, not
                # the capture
                try:
                    progress = _json.loads(event.progress.json)
                    rows = progress_to_rows(progress, outer._run_id)
                except Exception:
                    return
                with outer._lock:
                    space = outer._max - len(outer._rows)
                    if space < len(rows):
                        outer._dropped += len(rows) - max(0, space)
                    outer._rows.extend(rows[: max(0, space)])

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.listener = _L()

    def pending(self) -> int:
        """Buffered row count without draining — lets a monitor (or test)
        poll for arrival instead of guessing event-bus delivery latency."""
        with self._lock:
            return len(self._rows)

    def drain(self) -> list[dict]:
        """Return and clear the buffered rows (plus a loud marker if the
        bounded buffer overflowed between drains)."""
        with self._lock:
            rows, self._rows = self._rows, []
            dropped, self._dropped = self._dropped, 0
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "LatencyListener dropped %d rows (buffer cap %d exceeded between drains)",
                dropped, self._max,
            )
        return rows


def persist_latency(spark: SparkSession, rows: list[dict], path: str) -> None:
    """Append latency rows to the date-partitioned telemetry table."""
    if not rows:
        return
    df = spark.createDataFrame(rows, LATENCY_SCHEMA)
    (
        df.withColumn("latency_date", F.to_date("latency_time"))
        .repartition("latency_date")
        .write.mode("append")
        .partitionBy("latency_date")
        .parquet(path)
    )


def read_latency(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("latency_date")


# Micro-unit grid for the latency rollup — shared by the Spark expressions
# and the oracle SQL below so bumping it cannot desynchronize the two sides.
LATENCY_AVG_DP = 6


def latency_rollup(lat: DataFrame, avg_dp: int = LATENCY_AVG_DP) -> DataFrame:
    """Hourly per-component latency rollup (the Grafana latency panel).

    AVG/SUM use exact BIGINT micro-units (see pipeline.rollup) so the result
    is independent of partitioning and engine; MAX/COUNT are already
    order-independent on raw values.
    """
    win = F.window("latency_time", "1 hour")
    u = micro_units(F.col("value_ms"), avg_dp)
    return (
        lat.groupBy("component", win.alias("w"))
        .agg(
            F.sum(u).alias("sum_u"),
            F.count(F.col("value_ms")).alias("n_samples"),
            F.max("value_ms").alias("max_ms"),
        )
        .select(
            "component",
            F.col("w.start").alias("bucket"),
            exact_avg(F.col("sum_u"), F.col("n_samples"), avg_dp).alias("avg_ms"),
            (F.col("sum_u").cast("double") / F.lit(float(10**avg_dp))).alias("total_ms"),
            "max_ms",
            "n_samples",
        )
    )


# ------------------------------------------------------------ driver query
def q_latency_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latency_rollup over a deterministic telemetry relation derived from
    the events table (real progress timings are wall-clock nondeterministic,
    so the oracle-checkable path synthesizes rows the oracle can mirror;
    capture/persist of REAL progress dicts is unit-tested instead —
    tests/test_healthchecks.py)."""
    from spark_signals.io.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    comp = F.element_at(
        F.array(*[F.lit(c) for c in COMPONENTS]),
        (F.col("event_id") % len(COMPONENTS) + 1).cast("int"),
    )
    lat = ev.select(
        F.col("ts").alias("latency_time"),
        comp.alias("component"),
        F.abs(F.col("value")).alias("value_ms"),
    )
    return latency_rollup(lat)


def _sql_latency_rollup() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(COMPONENTS)
    )
    return f"""
WITH lat AS (
    SELECT ts AS latency_time,
           CASE event_id % {len(COMPONENTS)} {cases} END AS component,
           abs(value) AS value_ms
    FROM events
),
hourly AS (
    SELECT component,
           time_bucket(INTERVAL '1 hour', latency_time) AS bucket,
           SUM(CAST(floor(value_ms * 1e{LATENCY_AVG_DP} + 0.5000001) AS BIGINT)) AS sum_u,
           COUNT(value_ms) AS n_samples,
           MAX(value_ms) AS max_ms
    FROM lat
    GROUP BY 1, 2
)
SELECT component, bucket,
       (CAST(sum_u AS DOUBLE) / CAST(n_samples AS DOUBLE)) / 1e{LATENCY_AVG_DP} AS avg_ms,
       CAST(sum_u AS DOUBLE) / 1e{LATENCY_AVG_DP} AS total_ms,
       max_ms, n_samples
FROM hourly"""


LATENCY_QUERIES = {
    "latency_metrics_rollup": (q_latency_rollup, _sql_latency_rollup()),
}
