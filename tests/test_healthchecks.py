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
