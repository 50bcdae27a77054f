"""Healthcheck threshold tables (reference tests/test_healthchecks.py style)."""

from __future__ import annotations

import datetime as dt

import pytest

from spark_signals.control.health import (
    evaluate_job_state,
    evaluate_lag,
    evaluate_producer,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)


@pytest.mark.parametrize(
    "lag,healthy",
    [(0, True), (1000, True), (1001, False), (-1, False), (None, False)],
)
def test_lag_thresholds(lag, healthy):
    assert evaluate_lag(lag).healthy is healthy


@pytest.mark.parametrize(
    "state,age_sec,healthy",
    [
        ("RUNNING", 10, True),
        ("ACTIVE", 180, True),
        ("RUNNING", 181, False),
        ("FAILED", 10, False),
        ("CANCELED", 10, False),
    ],
)
def test_job_state_thresholds(state, age_sec, healthy):
    cp = NOW - dt.timedelta(seconds=age_sec)
    assert evaluate_job_state(state, cp, now=NOW).healthy is healthy


def test_job_state_requires_checkpoint():
    assert evaluate_job_state("RUNNING", None, now=NOW).healthy is False


@pytest.mark.parametrize(
    "hb_age,queue,healthy",
    [(5, 0, True), (30, 250, True), (31, 0, False), (5, 251, False)],
)
def test_producer_thresholds(hb_age, queue, healthy):
    hb = NOW - dt.timedelta(seconds=hb_age)
    assert evaluate_producer(hb, queue, now=NOW).healthy is healthy


def test_producer_requires_heartbeat():
    assert evaluate_producer(None, 0, now=NOW).healthy is False


def test_monitor_sweeps_live_query(spark, tmp_path):
    """End-to-end: a live StreamingQuery registered with the monitor reports
    healthy while running, unhealthy after stop — the cron-script loop the
    reference runs, wired to real query handles."""
    import time

    from spark_signals.control.monitor import StreamingHealthMonitor

    alerts = []
    mon = StreamingHealthMonitor(
        interval_sec=0.2, on_unhealthy=lambda n, h: alerts.append((n, h.reason))
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "5").load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("health_probe_stream")
        .outputMode("append")
        .start()
    )
    try:
        mon.register("ticks", q)
        # wait for first progress so the probe has a timestamp
        deadline = time.time() + 30
        while not q.lastProgress and time.time() < deadline:
            time.sleep(0.2)
        res = mon.check_once()
        assert res["ticks"].healthy, res["ticks"].reason

        # the periodic thread populates history on its own cadence
        mon.start()
        time.sleep(1.0)
        mon.stop()
        assert len(mon.history) >= 2
    finally:
        q.stop()

    res = mon.check_once()
    assert not res["ticks"].healthy
    assert alerts and alerts[-1][0] == "ticks"


def test_monitor_survives_dead_handle():
    from spark_signals.control.monitor import StreamingHealthMonitor

    class Broken:
        @property
        def isActive(self):
            raise RuntimeError("gateway gone")

    mon = StreamingHealthMonitor()
    mon.register("broken", Broken())
    res = mon.check_once()
    assert not res["broken"].healthy
    assert "probe failed" in res["broken"].reason


def test_latency_telemetry_capture_persist_rollup(spark, tmp_path):
    """latency_metrics analog end-to-end on a REAL streaming query: progress
    sweep → typed rows → date-partitioned parquet → hourly rollup."""
    import time

    from spark_signals.control.latency import (
        COMPONENTS,
        latency_rollup,
        persist_latency,
        read_latency,
        sweep_queries,
    )

    stream = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    q = (
        stream.writeStream.format("memory")
        .queryName("latency_probe_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while not q.lastProgress and time.time() < deadline:
            time.sleep(0.2)
        rows = sweep_queries({"ticks": q}, strategy_run_id="run-1")
    finally:
        q.stop()

    assert rows, "no progress captured"
    comps = {r["component"] for r in rows}
    assert comps <= set(COMPONENTS)
    assert all(r["value_ms"] >= 0 for r in rows)
    assert all(r["strategy_run_id"] == "run-1" for r in rows)
    assert '"batchId"' in rows[0]["metadata"]

    path = str(tmp_path / "latency_metrics")
    persist_latency(spark, rows, path)
    persist_latency(spark, rows, path)  # append semantics, second sweep
    back = read_latency(spark, path)
    assert back.count() == 2 * len(rows)
    assert set(back.columns) == {
        "latency_time", "component", "value_ms", "strategy_run_id", "metadata"
    }

    roll = latency_rollup(back)
    out = {r["component"]: r for r in roll.collect()}
    some = rows[0]
    assert out[some["component"]]["n_samples"] == 2
    assert abs(out[some["component"]]["total_ms"] - 2 * round(some["value_ms"], 6)) < 1e-6


def test_latency_listener_push_capture(spark, tmp_path):
    """Push path: a registered StreamingQueryListener buffers latency rows
    for every micro-batch progress event; drain → persist → rollup."""
    import time

    from spark_signals.control.latency import (
        COMPONENTS,
        LatencyListener,
        latency_rollup,
        persist_latency,
        read_latency,
    )

    cap = LatencyListener(strategy_run_id="run-push")
    spark.streams.addListener(cap.listener)
    try:
        stream = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        q = (
            stream.writeStream.format("memory")
            .queryName("latency_listener_stream")
            .outputMode("append")
            .start()
        )
        try:
            # poll the listener buffer itself, not a fixed post-progress
            # sleep: event-bus delivery can lag several seconds when the
            # machine is loaded (this test flaked under a concurrent suite)
            deadline = time.time() + 60
            while cap.pending() == 0 and time.time() < deadline:
                time.sleep(0.2)
        finally:
            q.stop()
        rows = cap.drain()
    finally:
        spark.streams.removeListener(cap.listener)

    assert rows, "listener captured no progress rows"
    assert {r["component"] for r in rows} <= set(COMPONENTS)
    assert all(r["strategy_run_id"] == "run-push" for r in rows)
    assert cap.drain() == []  # drain clears

    path = str(tmp_path / "latency_push")
    persist_latency(spark, rows, path)
    assert latency_rollup(read_latency(spark, path)).count() >= 1
