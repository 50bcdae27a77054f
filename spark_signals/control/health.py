"""Healthcheck evaluators — threshold logic for the operational envelope.

The reference ships healthcheck scripts with pure-function threshold
evaluators and tests them exhaustively (reference
scripts/healthcheck_kafka_lag.py:12, healthcheck_flink.py:16,
healthcheck_producer.py:15-16; tests/test_healthchecks.py:12-165). The
evaluators port directly — the probes differ (Structured Streaming exposes
progress via StreamingQuery.lastProgress instead of the Flink REST API).

SLO defaults from BASELINE.md: consumer lag ≤ 1000 messages, checkpoint
age ≤ 180 s, producer heartbeat ≤ 30 s, queue depth ≤ 250.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

MAX_LAG_MESSAGES = 1_000
MAX_CHECKPOINT_AGE_SEC = 180
MAX_HEARTBEAT_AGE_SEC = 30
MAX_QUEUE_DEPTH = 250


@dataclass(frozen=True)
class Health:
    healthy: bool
    reason: str


def evaluate_lag(lag_messages: int | None, max_lag: int = MAX_LAG_MESSAGES) -> Health:
    """Consumer lag SLO (reference healthcheck_kafka_lag.py)."""
    if lag_messages is None:
        return Health(False, "lag unknown")
    if lag_messages < 0:
        return Health(False, f"invalid lag {lag_messages}")
    if lag_messages > max_lag:
        return Health(False, f"lag {lag_messages} > {max_lag}")
    return Health(True, f"lag {lag_messages} within {max_lag}")


def evaluate_job_state(
    state: str,
    last_checkpoint_at: dt.datetime | None,
    now: dt.datetime | None = None,
    max_checkpoint_age_sec: int = MAX_CHECKPOINT_AGE_SEC,
) -> Health:
    """Job-state + checkpoint-staleness SLO (reference healthcheck_flink.py).

    For Spark, ``state`` is `"ACTIVE"` when StreamingQuery.isActive and
    ``last_checkpoint_at`` derives from lastProgress.timestamp.
    """
    now = now or dt.datetime.now(dt.timezone.utc)
    if state not in ("RUNNING", "ACTIVE"):
        return Health(False, f"job state {state}")
    if last_checkpoint_at is None:
        return Health(False, "no checkpoint recorded")
    age = (now - last_checkpoint_at).total_seconds()
    if age > max_checkpoint_age_sec:
        return Health(False, f"checkpoint {age:.0f}s old > {max_checkpoint_age_sec}s")
    return Health(True, f"checkpoint {age:.0f}s old")


def evaluate_producer(
    heartbeat_at: dt.datetime | None,
    queue_depth: int,
    now: dt.datetime | None = None,
    max_heartbeat_age_sec: int = MAX_HEARTBEAT_AGE_SEC,
    max_queue_depth: int = MAX_QUEUE_DEPTH,
) -> Health:
    """Producer liveness + backpressure SLO (reference healthcheck_producer.py)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    if heartbeat_at is None:
        return Health(False, "no heartbeat")
    age = (now - heartbeat_at).total_seconds()
    if age > max_heartbeat_age_sec:
        return Health(False, f"heartbeat {age:.0f}s old > {max_heartbeat_age_sec}s")
    if queue_depth > max_queue_depth:
        return Health(False, f"queue depth {queue_depth} > {max_queue_depth}")
    return Health(True, f"heartbeat {age:.0f}s, queue {queue_depth}")


def evaluate_streaming_query(query, now: dt.datetime | None = None) -> Health:
    """Probe a live StreamingQuery: active + recent progress."""
    if not query.isActive:
        return Health(False, "query inactive")
    progress = query.lastProgress
    if not progress:
        return Health(False, "no progress reported yet")
    ts = dt.datetime.fromisoformat(progress["timestamp"].replace("Z", "+00:00"))
    return evaluate_job_state("ACTIVE", ts, now)
