"""Replay / backtest mode — S10 + U1 + T7.

The reference replays a long-retention Kafka topic into the live pipeline
with event-time pacing, offset/timestamp seek, and an end-timestamp bound
(reference flink_jobs/replay/service.py:17-124). The Spark-first design
makes *batch over the archive* the primary replay mode (deterministic, T7 —
a strictly stronger guarantee than paced re-publication), with the seek and
bound semantics mapped onto predicate-pushed filters:

  * seek by timestamp  (`offsets_for_times`, service.py:60-71)
      → ``event_time >= start_ts``   (partition/rowgroup pruned at the scan)
  * seek by offset      (service.py:72-76)
      → ``sequence >= start_offset``
  * end bound           (service.py:100-102)
      → ``event_time <= end_ts``
  * pacing / speedup    (service.py:108-115)
      → no-op in batch (results are time-independent); for live re-feed the
        streaming file source's ``maxFilesPerTrigger`` gives rate-limited
        replay (SURVEY.md §2.1 S10)

``union_with_replay`` (io.sources) provides the U1 live∪replay mode
(reference sma_cross.py:43-52).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.pipeline.builder import PipelineOutputs
from spark_signals.strategies import get_strategy_module


def replay_window(
    ticks: DataFrame,
    start_ts: dt.datetime | str | None = None,
    end_ts: dt.datetime | str | None = None,
    start_offset: int | None = None,
) -> DataFrame:
    """Time/offset-bounded slice of an archived tick stream.

    All three predicates push down to the parquet scan (shown as
    PushedFilters in `.explain`), so a replay of one day out of 90 reads
    only that day's row groups — the batch analog of Kafka seek.
    """
    out = ticks
    if start_ts is not None:
        out = out.filter(F.col("event_time") >= F.lit(start_ts))
    if end_ts is not None:
        out = out.filter(F.col("event_time") <= F.lit(end_ts))
    if start_offset is not None:
        out = out.filter(F.col("sequence") >= F.lit(start_offset))
    return out


def backtest(
    ticks: DataFrame,
    cfg: EngineConfig | None = None,
    strategy: str = "sma_cross",
    start_ts: dt.datetime | str | None = None,
    end_ts: dt.datetime | str | None = None,
    start_offset: int | None = None,
) -> PipelineOutputs:
    """Run a strategy over a bounded historical window — the BACKTEST /
    REPLAY run types of the reference's control plane."""
    cfg = cfg or EngineConfig()
    window = replay_window(ticks, start_ts, end_ts, start_offset)
    return get_strategy_module(strategy).build_pipeline(window, cfg)
