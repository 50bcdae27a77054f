"""Job entry point — `python -m spark_signals`.

Mirrors the reference's job bootstrap (flink_jobs/__main__.py:230-241):
resolve config from env, resolve the strategy module, build the pipeline,
and execute — batch backtest over an archive directory, or Structured
Streaming over a file/Kafka source.

Examples
--------
Batch backtest over the driver's testdata::

    python -m spark_signals --mode batch \
        --source /root/testdata/sf0.001 --source-kind events \
        --out /tmp/spark_signals_out

Streaming over a tick-file directory::

    python -m spark_signals --mode stream --source /path/to/tick/parquet \
        --out /tmp/spark_signals_out
"""

from __future__ import annotations

import argparse
import os

from spark_signals.config import EngineConfig
from spark_signals.session import get_spark
from spark_signals.strategies import get_strategy_module


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spark_signals")
    ap.add_argument("--mode", choices=["batch", "stream"], default="batch")
    ap.add_argument("--source", required=True, help="archive dir (batch) or stream dir")
    ap.add_argument(
        "--source-kind",
        choices=["events", "prices"],
        default="prices",
        help="'events' adapts the driver's events.parquet; 'prices' reads the native tick schema",
    )
    ap.add_argument("--out", required=True, help="sink root directory")
    ap.add_argument("--strategy", default=os.getenv("STRATEGY_MODULE", "sma_cross"))
    ap.add_argument("--start-ts", default=None)
    ap.add_argument("--end-ts", default=None)
    args = ap.parse_args(argv)

    cfg = EngineConfig.from_env()
    spark = get_spark(f"spark-signals-{args.strategy}")

    if args.mode == "stream":
        from spark_signals.streaming.job import run_streaming_job

        run_streaming_job(spark, args.source, args.out, cfg)
        return 0

    from spark_signals.io.sources import load_ticks, read_prices_raw
    from spark_signals.io.sinks import write_sinks
    from spark_signals.replay import replay_window

    if args.source_kind == "events":
        ticks = load_ticks(spark, args.source)
    else:
        ticks = read_prices_raw(spark, args.source)
    ticks = replay_window(ticks, args.start_ts, args.end_ts)
    outputs = get_strategy_module(args.strategy).build_pipeline(ticks, cfg)
    paths = write_sinks(outputs, args.out)
    for name, path in sorted(paths.items()):
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
