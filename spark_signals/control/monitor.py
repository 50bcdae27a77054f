"""Periodic streaming-health monitor — the cron-wrapper analog.

The reference runs its healthcheck scripts on a cron cadence against the
Flink REST API and the Kafka admin endpoints (reference
scripts/healthcheck_flink.py, healthcheck_kafka_lag.py; docker-compose
healthcheck stanzas). Here the probe surface is the live
``StreamingQuery`` handles themselves: a daemon thread evaluates every
registered query against the SLO evaluators in control.health on a fixed
interval, keeps a bounded result history, and fires a callback on any
unhealthy transition (the alerting hook).

``check_once`` is a pure synchronous sweep so tests — and callers that
already have a scheduler — can drive it without the thread.
"""

from __future__ import annotations

import datetime as dt
import threading
from collections import deque

from spark_signals.control.health import Health, evaluate_streaming_query


class StreamingHealthMonitor:
    def __init__(
        self,
        interval_sec: float = 15.0,
        history_limit: int = 1000,
        on_unhealthy=None,
    ) -> None:
        self.interval_sec = interval_sec
        self.on_unhealthy = on_unhealthy
        self.history: deque[tuple[dt.datetime, str, Health]] = deque(
            maxlen=history_limit
        )
        self._queries: dict[str, object] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def register(self, name: str, query) -> None:
        with self._lock:
            self._queries[name] = query

    def unregister(self, name: str) -> None:
        with self._lock:
            self._queries.pop(name, None)

    def check_once(self, now: dt.datetime | None = None) -> dict[str, Health]:
        """One synchronous sweep over every registered query."""
        now = now or dt.datetime.now(dt.timezone.utc)
        with self._lock:
            queries = dict(self._queries)
        results: dict[str, Health] = {}
        for name, query in queries.items():
            try:
                h = evaluate_streaming_query(query, now)
            except Exception as exc:  # a dead/garbage handle is unhealthy, not a crash
                h = Health(False, f"probe failed: {exc}")
            results[name] = h
            self.history.append((now, name, h))
            if not h.healthy and self.on_unhealthy is not None:
                self.on_unhealthy(name, h)
        return results

    def start(self) -> "StreamingHealthMonitor":
        if self._thread is not None:
            return self
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(self.interval_sec):
                self.check_once()

        self._thread = threading.Thread(
            target=loop, name="spark-signals-health", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_sec + 5)
            self._thread = None
