"""Continuous-aggregate refresh policy — the Spark analog of TimescaleDB's
``add_continuous_aggregate_policy`` (reference:
docker/postgres/init/03_continuous_aggregates.sql:17-22, which refreshes
``strategy_metrics_hourly`` every 15 minutes over the window
[now - 7 days, now - 1 hour]).

Spark has no in-engine scheduler, so the policy splits into two parts:

* **Policy math** (:class:`RefreshPolicy`): pure functions deciding WHEN a
  refresh is due and WHICH bucket-aligned window it covers. Deterministic —
  ``now`` is always an explicit argument, never wall-clock — so runs are
  replayable and testable.
* **Incremental refresh** (:func:`refresh_hourly_rollup`): recomputes ONLY
  the stale window's buckets from the base relation and rewrites ONLY the
  touched day-partitions of the materialized rollup (dynamic partition
  overwrite). At 100 TB the base-table read is bounded by the refresh
  window (time predicate pushes into the parquet/partition pruning), and
  the write never touches settled history — the same incremental contract
  TimescaleDB's policy job provides.

Any external scheduler (cron, Airflow, Databricks jobs, a while-loop driver)
calls ``due() -> refresh_hourly_rollup()`` on its own cadence; the policy
object carries the cadence so schedulers stay dumb.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.pipeline import rollup as R

#: Partition column of the materialized rollup: day of the hourly bucket.
#: Hour-grain buckets -> day-grain partitions keeps partition counts sane
#: (365/year) while still letting a 7-day refresh rewrite <=8 partitions.
PARTITION_COL = "bucket_date"


@dataclass(frozen=True)
class RefreshPolicy:
    """Mirror of add_continuous_aggregate_policy's three intervals."""

    start_offset: timedelta = timedelta(days=7)
    end_offset: timedelta = timedelta(hours=1)
    schedule_interval: timedelta = timedelta(minutes=15)
    bucket: timedelta = timedelta(hours=1)

    def __post_init__(self) -> None:
        if self.start_offset <= self.end_offset:
            raise ValueError("start_offset must exceed end_offset")
        if self.bucket <= timedelta(0):
            raise ValueError("bucket must be positive")

    def _floor_bucket(self, t: datetime) -> datetime:
        epoch = datetime(1970, 1, 1, tzinfo=t.tzinfo)
        n = int((t - epoch).total_seconds() // self.bucket.total_seconds())
        return epoch + n * self.bucket

    def refresh_window(self, now: datetime) -> tuple[datetime, datetime]:
        """Bucket-aligned [start, end) stale window for a run at ``now``.

        TimescaleDB semantics: start is aligned DOWN (a bucket straddling
        the raw start is included), end is aligned DOWN (a bucket still
        inside end_offset — possibly receiving data — is excluded, so only
        settled buckets materialize)."""
        start = self._floor_bucket(now - self.start_offset)
        end = self._floor_bucket(now - self.end_offset)
        return start, end

    def due(self, now: datetime, last_run: datetime | None) -> bool:
        """True when a scheduler should trigger a refresh at ``now``."""
        if last_run is None:
            return True
        return now - last_run >= self.schedule_interval

    def next_run(self, last_run: datetime) -> datetime:
        return last_run + self.schedule_interval


def refresh_hourly_rollup(
    metrics: DataFrame,
    target_dir: str,
    policy: RefreshPolicy,
    now: datetime,
    cfg: EngineConfig | None = None,
) -> tuple[datetime, datetime]:
    """Incrementally refresh the materialized hourly rollup at ``target_dir``.

    ``metrics`` is the base relation (metrics_enriched-shaped; at scale, a
    partitioned table read — the window filter below prunes its scan).
    Recomputes :func:`spark_signals.pipeline.rollup.hourly_rollup_exact`
    over the stale window only, then rewrites exactly the touched
    day-partitions via dynamic partition overwrite — settled history is
    never read or written. Returns the refreshed [start, end) window.

    A bucket whose rows straddle the window start is safe: buckets are
    aligned to the window (both are floor_bucket-aligned), so every bucket
    is recomputed either fully or not at all — the partial-bucket corruption
    a naive timestamp filter would cause cannot happen.
    """
    cfg = cfg or EngineConfig()
    start, end = policy.refresh_window(now)
    if start >= end:
        return start, end
    window = metrics.filter(
        (F.col("metric_time") >= F.lit(start)) & (F.col("metric_time") < F.lit(end))
    )
    refreshed = R.hourly_rollup_exact(window, cfg).withColumn(
        PARTITION_COL, F.to_date("bucket")
    )
    (
        refreshed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(target_dir)
    )
    return start, end


def read_rollup(spark: SparkSession, target_dir: str) -> DataFrame:
    return spark.read.parquet(target_dir).drop(PARTITION_COL)


def run_refresh_if_due(
    metrics: DataFrame,
    target_dir: str,
    policy: RefreshPolicy,
    now: datetime,
    cfg: EngineConfig | None = None,
) -> tuple[datetime, datetime] | None:
    """Scheduler entry point: one policy tick. Reads/writes a last-run
    marker file next to the rollup so any dumb cron can drive the policy."""
    marker = os.path.join(target_dir + "_refresh", "last_run.txt")
    last_run: datetime | None = None
    try:
        with open(marker, encoding="utf-8") as fh:
            last_run = datetime.fromisoformat(fh.read().strip())
    except (OSError, ValueError):
        last_run = None
    if not policy.due(now, last_run):
        return None
    window = refresh_hourly_rollup(metrics, target_dir, policy, now, cfg)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(now.isoformat())
    return window


# --------------------------------------------- IVF serving-index retrain
# The retrieval analog of the rollup refresh: the continuous KNN serving
# lane (datapipe.streaming.serve_knn_stream) reads a persisted
# (centroids, index) pair every micro-batch, and nightly appends go
# through assignment (ann_index_delta) — but drifted centroids need a
# scheduled FULL retrain, the compaction-class job. A retrain must never
# hand the reader a TORN pair (new centroids + old index), so versions
# are immutable subdirectories of one serving root and readers resolve a
# CURRENT pointer file whose rewrite is a POSIX-atomic rename:
#
#   <root>/v000001/centroids/   <root>/v000001/index/
#   <root>/v000002/...          <root>/CURRENT  -> "v000002"
#
# Old versions stay on disk for in-flight readers; pruning them after a
# grace period is ordinary retention (io.sinks retention utilities).

_IVF_CURRENT = "CURRENT"


def current_ivf_dirs(serving_root: str) -> tuple[str, str]:
    """Resolve the root's CURRENT version to its (centroids_dir,
    index_dir) pair. Raises FileNotFoundError before the first retrain."""
    with open(os.path.join(serving_root, _IVF_CURRENT), encoding="utf-8") as fh:
        version = fh.read().strip()
    vdir = os.path.join(serving_root, version)
    return os.path.join(vdir, "centroids"), os.path.join(vdir, "index")


def retrain_ivf_serving(
    embeddings: DataFrame,
    serving_root: str,
    k: int | None = None,
    iters: int | None = None,
    train_cap: int | None = None,
) -> tuple[str, str]:
    """Full retrain of the serving IVF pair into a NEW immutable version
    under ``serving_root``, then atomically repoint CURRENT. Returns the
    new (centroids_dir, index_dir). Parameters default to the production
    knobs (derived k, bounded-sample trainer)."""
    from spark_signals.datapipe import similarity as S

    kwargs: dict = {}
    if iters is not None:
        kwargs["iters"] = iters
    if train_cap is not None:
        kwargs["train_cap"] = train_cap
    centroids, index = S.ivf_serving_index(embeddings, k=k, **kwargs)

    os.makedirs(serving_root, exist_ok=True)
    existing = sorted(
        d for d in os.listdir(serving_root)
        if d.startswith("v") and d[1:].isdigit()
    )
    version = f"v{(int(existing[-1][1:]) + 1) if existing else 1:06d}"
    vdir = os.path.join(serving_root, version)
    cdir, idir = os.path.join(vdir, "centroids"), os.path.join(vdir, "index")
    centroids.write.parquet(cdir)
    # at warehouse scale: .bucketBy(n, "label") via saveAsTable so query
    # probes shuffle only the query side; plain parquet in this sandbox
    index.write.parquet(idir)

    tmp = os.path.join(serving_root, f".{_IVF_CURRENT}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(serving_root, _IVF_CURRENT))  # atomic swap
    return cdir, idir
