"""Baseline SMA-crossover strategy (the reference's only real strategy).

Thin strategy-contract wrapper over the pipeline builder; the reference's
mock_breakout / mock_mean_reversion configs reuse this module with different
parameters (reference configs/strategies/*.json), which maps to constructing
a different EngineConfig here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from spark_signals.config import EngineConfig
from spark_signals.pipeline.builder import PipelineOutputs, build_pipeline as _build


def build_pipeline(ticks: DataFrame, cfg: EngineConfig) -> PipelineOutputs:
    return _build(ticks, cfg)
