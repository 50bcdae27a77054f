"""Continuous-aggregate refresh policy (control.maintenance) — the analog of
the reference's add_continuous_aggregate_policy
(docker/postgres/init/03_continuous_aggregates.sql:17-22)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from spark_signals.control.maintenance import (
    PARTITION_COL,
    RefreshPolicy,
    read_rollup,
    refresh_hourly_rollup,
    run_refresh_if_due,
)
from spark_signals.pipeline import metrics as M
from spark_signals.pipeline import rollup as R
from spark_signals.parity import CFG, _metrics_chain

SF = "/root/testdata/sf0.001"


def _metrics(spark):
    perf, counts = _metrics_chain(spark, SF)
    return M.metrics_enriched(perf, counts, CFG)


# ------------------------------------------------------------ policy math
def test_refresh_window_is_bucket_aligned():
    p = RefreshPolicy(
        start_offset=timedelta(days=7),
        end_offset=timedelta(hours=1),
        schedule_interval=timedelta(minutes=15),
    )
    now = datetime(2024, 3, 5, 14, 37, 23)
    start, end = p.refresh_window(now)
    assert start == datetime(2024, 2, 27, 14, 0)  # floor(now - 7d) to the hour
    assert end == datetime(2024, 3, 5, 13, 0)  # floor(now - 1h): settled only
    assert start.minute == end.minute == 0


def test_due_respects_schedule_interval():
    p = RefreshPolicy(schedule_interval=timedelta(minutes=15))
    t0 = datetime(2024, 3, 5, 14, 0)
    assert p.due(t0, None)  # never ran -> due
    assert not p.due(t0 + timedelta(minutes=14), t0)
    assert p.due(t0 + timedelta(minutes=15), t0)
    assert p.next_run(t0) == t0 + timedelta(minutes=15)


def test_invalid_policy_rejected():
    import pytest

    with pytest.raises(ValueError):
        RefreshPolicy(start_offset=timedelta(hours=1), end_offset=timedelta(hours=2))


# ------------------------------------------------------------ refresh job
def test_refresh_matches_full_recompute_over_window(spark, tmp_path):
    metrics = _metrics(spark).persist()
    try:
        max_t = metrics.agg(F.max("metric_time")).first()[0]
        policy = RefreshPolicy()
        target = str(tmp_path / "rollup")
        start, end = refresh_hourly_rollup(metrics, target, policy, now=max_t)
        assert start < end
        got = sorted(tuple(r) for r in read_rollup(spark, target).collect())
        expected_df = R.hourly_rollup_exact(
            metrics.filter(
                (F.col("metric_time") >= F.lit(start))
                & (F.col("metric_time") < F.lit(end))
            ),
            CFG,
        )
        expected = sorted(tuple(r) for r in expected_df.collect())
        assert got == expected
        assert len(got) > 0
        # only settled buckets: nothing within end_offset of `now`
        assert max(r[2] for r in got) < end
    finally:
        metrics.unpersist()


def test_refresh_rewrites_only_touched_partitions(spark, tmp_path):
    metrics = _metrics(spark).persist()
    try:
        max_t = metrics.agg(F.max("metric_time")).first()[0]
        target = str(tmp_path / "rollup")
        # wide first pass materializes ~all history
        wide = RefreshPolicy(start_offset=timedelta(days=365))
        refresh_hourly_rollup(metrics, target, wide, now=max_t)
        before = {
            r[0]: r[1]
            for r in spark.read.parquet(target)
            .groupBy(PARTITION_COL)
            .count()
            .collect()
        }
        # narrow second pass over CHANGED base data must rewrite only the
        # narrow window's day-partitions; settled history stays as written
        narrow = RefreshPolicy(start_offset=timedelta(days=2))
        n_start, _ = narrow.refresh_window(max_t)
        changed = metrics.withColumn(
            "trades_executed",
            F.when(
                F.col("metric_time") >= F.lit(n_start),
                F.col("trades_executed") + F.lit(1000),
            ).otherwise(F.col("trades_executed")),
        )
        refresh_hourly_rollup(changed, target, narrow, now=max_t)
        rolled = spark.read.parquet(target)
        after = {
            r[0]: r[1] for r in rolled.groupBy(PARTITION_COL).count().collect()
        }
        assert set(after) == set(before)  # no partition dropped
        # the bumped counts appear only inside the narrow window
        bumped = rolled.filter(F.col("trades_executed_sum") >= 1000)
        assert bumped.count() > 0
        assert bumped.agg(F.min("bucket")).first()[0] >= n_start
        untouched = rolled.filter(F.col("bucket") < F.lit(n_start)).filter(
            F.col("trades_executed_sum") >= 1000
        )
        assert untouched.count() == 0
    finally:
        metrics.unpersist()


def test_run_refresh_if_due_honors_marker(spark, tmp_path):
    metrics = _metrics(spark).persist()
    try:
        max_t = metrics.agg(F.max("metric_time")).first()[0]
        policy = RefreshPolicy(schedule_interval=timedelta(minutes=15))
        target = str(tmp_path / "rollup")
        first = run_refresh_if_due(metrics, target, policy, now=max_t)
        assert first is not None
        # immediately re-ticking the scheduler is a no-op
        again = run_refresh_if_due(metrics, target, policy, now=max_t)
        assert again is None
        # next schedule tick refreshes again
        later = max_t + timedelta(minutes=15)
        third = run_refresh_if_due(metrics, target, policy, now=later)
        assert third is not None
    finally:
        metrics.unpersist()
