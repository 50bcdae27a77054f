"""Tests for the pandas-UDF EWMA z-score strategy (§2.9 extension point)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.strategies import get_strategy_module
from spark_signals.strategies.ewma_zscore import ALPHA, Z_ENTER, _ewma_signals
from tests.conftest import make_ticks

CFG = EngineConfig(strategy_run_id="ewma-test")


def test_ewma_recursion_matches_hand_computation():
    import pandas as pd

    mids = [100.0, 101.0, 99.0, 105.0, 100.0]
    pdf = pd.DataFrame(
        {
            "product_id": ["X"] * 5,
            "event_time": pd.date_range("2024-06-01", periods=5, freq="s"),
            "sequence": range(5),
            "mid_price": mids,
        }
    )
    out = _ewma_signals(pdf)
    m, v = mids[0], 0.0
    for i, x in enumerate(mids):
        d = x - m
        m += ALPHA * d
        v = (1 - ALPHA) * (v + ALPHA * d * d)
        z = (x - m) / math.sqrt(v) if v > 0 else 0.0
        assert abs(out.zscore.iloc[i] - z) < 1e-12


def test_spike_triggers_mean_reversion_short(spark):
    # flat series then a large upward spike → z crosses +Z_ENTER → SHORT
    mids = [100.0] * 40 + [115.0] * 3 + [100.0] * 10
    out = get_strategy_module("ewma_zscore").build_pipeline(make_ticks(spark, mids), CFG)
    sigs = out.signals_decisions.orderBy("signal_time").collect()
    assert sigs, "spike must produce at least one signal"
    assert sigs[0].signal_type == "SHORT"
    assert sigs[0].confidence > Z_ENTER
    # downstream machinery runs: positions forward-fill, metrics aggregate
    assert out.positions_costs.filter(F.col("position") == -1.0).count() > 0
    assert out.metrics.count() >= 1


def test_flat_series_no_signals(spark):
    out = get_strategy_module("ewma_zscore").build_pipeline(
        make_ticks(spark, [100.0] * 60), CFG
    )
    assert out.signals_decisions.count() == 0


def test_registry_resolves_ewma():
    mod = get_strategy_module("ewma_zscore")
    assert hasattr(mod, "build_pipeline")
