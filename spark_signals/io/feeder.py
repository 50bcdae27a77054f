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
from typing import Any

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
