"""Tick feeder: payload validation + synthetic generation — S8, S9, P13, P14.

The reference's producer process validates Coinbase ticker payloads before
publishing (drop-on-error, ISO-8601 `Z`→`+00:00` normalization — reference
producer/run.py:62-98, producer/coinbase_client.py:97-116,
tests/test_producer_payload.py:6-31). The WebSocket/Kafka transport stays
out-of-engine (SURVEY.md §2.1 S8-S9); what the engine owns is the payload
contract, reproduced here, plus a deterministic synthetic generator for
tests and file-based streaming replay.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import time
from typing import Any, Callable, Iterable

REQUIRED_FIELDS = ("product_id", "price", "event_time")
OPTIONAL_FLOAT_FIELDS = ("best_bid", "best_ask", "volume_24h")


def parse_event_time(value: str) -> dt.datetime | None:
    """ISO-8601 with trailing Z → aware UTC datetime (P13, reference
    producer/run.py:94-98)."""
    if not isinstance(value, str):
        return None
    try:
        ts = dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=dt.timezone.utc)
    return ts.astimezone(dt.timezone.utc)


def prepare_payload(raw: dict[str, Any]) -> dict[str, Any] | None:
    """Validate/normalize one ticker payload; None = drop (P14).

    Mirrors the reference's golden cases: well-formed → exact field mapping;
    missing keys or uncastable types → dropped before publish."""
    if not isinstance(raw, dict):
        return None
    for fld in REQUIRED_FIELDS:
        if raw.get(fld) is None:
            return None
    event_time = parse_event_time(raw["event_time"])
    if event_time is None:
        return None
    try:
        price = float(raw["price"])
    except (TypeError, ValueError):
        return None
    if not math.isfinite(price):
        return None
    out: dict[str, Any] = {
        "product_id": str(raw["product_id"]),
        "price": price,
        "event_time": event_time.isoformat(),
        "source": str(raw.get("source", "coinbase")),
        "side": raw.get("side"),
    }
    for fld in OPTIONAL_FLOAT_FIELDS:
        v = raw.get(fld)
        if v is None:
            out[fld] = None
        else:
            try:
                out[fld] = float(v)
            except (TypeError, ValueError):
                return None
    seq = raw.get("sequence")
    try:
        out["sequence"] = None if seq is None else int(seq)
    except (TypeError, ValueError):
        return None
    return out


def generate_ticks(
    n: int,
    products: tuple[str, ...] = ("BTC-USD", "ETH-USD"),
    start: dt.datetime | None = None,
    base_price: float = 40_000.0,
    drift: float = 0.0001,
    seed: int = 42,
) -> list[dict[str, Any]]:
    """Deterministic synthetic ticker payloads (the test feeder the
    reference plans in README.md:273-285)."""
    import random

    rng = random.Random(seed)
    start = start or dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    prices = {p: base_price * (1 + 0.1 * i) for i, p in enumerate(products)}
    rows = []
    for i in range(n):
        product = products[i % len(products)]
        prices[product] *= 1 + drift + rng.gauss(0, 0.0005)
        px = prices[product]
        rows.append(
            {
                "product_id": product,
                "price": round(px, 2),
                "best_bid": round(px * 0.9995, 2),
                "best_ask": round(px * 1.0005, 2),
                "volume_24h": round(rng.uniform(100, 1000), 2),
                "sequence": i,
                "side": "buy" if rng.random() < 0.5 else "sell",
                "event_time": (start + dt.timedelta(seconds=i)).isoformat().replace("+00:00", "Z"),
                "source": "synthetic",
            }
        )
    return rows


def paced_replay(
    rows: Iterable[dict[str, Any]],
    emit: Callable[[dict[str, Any]], None],
    *,
    speedup_factor: float = 1.0,
    start_offset: int | None = None,
    start_timestamp_ms: int | None = None,
    end_timestamp_ms: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """S10 live re-feed: re-emit archived payloads with event-time-
    proportional pacing (reference flink_jobs/replay/service.py:17-124).

    Inter-event wall time = event-time delta ÷ ``speedup_factor``
    (service.py:108-115); the first emitted record goes out immediately.
    Seek-by-timestamp wins over seek-by-offset when both are given
    (service.py:53-76); iteration stops at ``end_timestamp_ms``
    (service.py:100-102). Malformed payloads are dropped (P14) and do not
    contribute pacing gaps. Returns the number of records emitted.

    Batch replay through the *engine* should use ``spark_signals.replay``
    (deterministic, predicate-pushed); this feeder-side path exists to
    drive the streaming job's file/Kafka source like the reference's
    replayed topic. ``sleep`` is injectable for tests, mirroring the
    reference's dummy-consumer test style (tests/test_replay_service.py).
    """
    if speedup_factor <= 0:
        raise ValueError("speedup_factor must be > 0")
    emitted = 0
    prev_ms: int | None = None
    for raw in rows:
        payload = prepare_payload(raw)
        if payload is None:
            continue
        ts = parse_event_time(payload["event_time"])
        assert ts is not None  # prepare_payload validated it
        ts_ms = int(ts.timestamp() * 1000)
        if start_timestamp_ms is not None:
            if ts_ms < start_timestamp_ms:
                continue
        elif start_offset is not None:
            seq = payload.get("sequence")
            if seq is None or seq < start_offset:
                continue
        if end_timestamp_ms is not None and ts_ms > end_timestamp_ms:
            break
        if prev_ms is not None and ts_ms > prev_ms:
            sleep((ts_ms - prev_ms) / 1000.0 / speedup_factor)
        emit(payload)
        emitted += 1
        prev_ms = ts_ms
    return emitted


def write_json_ticks(rows: list[dict[str, Any]], out_dir: str, batch_size: int = 1000) -> list[str]:
    """Write validated payloads as JSON-lines batch files — the file-based
    stand-in for the Kafka producer (each file ≙ one topic micro-batch)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for b in range(0, len(rows), batch_size):
        path = os.path.join(out_dir, f"ticks-{b // batch_size:05d}.json")
        with open(path, "w") as f:
            for raw in rows[b : b + batch_size]:
                payload = prepare_payload(raw)
                if payload is not None:
                    f.write(json.dumps(payload) + "\n")
        paths.append(path)
    return paths
