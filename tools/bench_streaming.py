"""Streaming-path throughput micro-benchmark.

Feeds N synthetic ticks (JSON micro-batch files, the Kafka stand-in) through
the full Structured Streaming job — schema-enforced source → stateful
per-key rolling features (applyInPandasWithState) → multi-sink foreachBatch
fan-out — and reports end-to-end events/sec. This is the path whose
*correctness* is held bit-identical to the batch window plan by the oracle
suite; this tool pins its *throughput* so SCALE.md claims stay measured,
not guessed.

Context: the reference's live source is a Coinbase WebSocket ticker
(O(10-100) events/sec/instrument); its operational envelope (BASELINE.md)
is parallelism 2. Single-node numbers here in the tens of thousands of
events/sec mean the streaming path clears the reference's envelope by
orders of magnitude before any cluster scale-out.

Usage: python tools/bench_streaming.py [n_ticks] [n_products]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_products = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from spark_signals.io.feeder import generate_ticks, write_json_ticks
    from spark_signals.session import get_spark
    from spark_signals.streaming.job import run_streaming_job

    spark = get_spark("bench-streaming")
    products = tuple(f"P{i:02d}-USD" for i in range(n_products))
    rows = generate_ticks(n, products=products)

    work = tempfile.mkdtemp(prefix="bench_streaming_")
    try:
        src = f"{work}/src"
        out = f"{work}/out"
        write_json_ticks(rows, src, batch_size=max(1, n // 8))

        t0 = time.time()
        run_streaming_job(spark, src, out, available_now=True, fmt="json")
        wall = time.time() - t0

        got = spark.read.parquet(f"{out}/prices_normalized").count()
        result = {
            "metric": "streaming_events_per_sec",
            "value": round(n / wall, 1),
            "unit": "events/sec",
            "n_ticks": n,
            "n_products": n_products,
            "wall_sec": round(wall, 2),
            "rows_out": got,
        }
        print(json.dumps(result))
        return 0 if got == n else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
