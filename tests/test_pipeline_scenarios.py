"""Scenario tests for the signal pipeline (FIXTURES.md §2).

These encode the behaviors the reference *intended* but never tested
(reference README.md:273-285 plans them; SURVEY.md §5 notes the gap):
trend → exactly one LONG; flat → no signals; debounce; null-quote fallback;
forward-fill; per-product isolation; hand-computed metric values.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.pipeline import build_pipeline
from tests.conftest import make_ticks

# small windows so scenarios stay tiny
CFG = EngineConfig(sma_fast_window=3, sma_slow_window=8, sma_confirmation_window=2)


def test_trend_up_single_long_and_forward_fill(spark):
    # monotone rise: fast SMA crosses above slow exactly once after warmup
    mids = [100.0 * (1.001 ** i) for i in range(60)]
    out = build_pipeline(make_ticks(spark, mids), CFG)
    sigs = out.signals_decisions.collect()
    # only LONGs; warmup can emit up to `confirmation` consecutive LONGs
    # (prev_spread is still 0 for the first rows after the frames diverge —
    # faithful to the reference's CASE semantics, sma_cross.py:155-164)
    assert {r.signal_type for r in sigs} == {"LONG"}
    assert 1 <= len(sigs) <= CFG.confirmation
    # positions forward-fill to 1.0 after the crossover and stay there
    pos = [r.position for r in out.positions_costs.orderBy("sequence").collect()]
    first_long = pos.index(1.0)
    assert all(p == 0.0 for p in pos[:first_long])
    assert all(p == 1.0 for p in pos[first_long:])


def test_trend_reverse_long_then_short(spark):
    mids = [100.0 + i * 0.5 for i in range(40)] + [120.0 - i * 0.5 for i in range(40)]
    out = build_pipeline(make_ticks(spark, mids), CFG)
    sigs = [r.signal_type for r in out.signals_decisions.orderBy("signal_time").collect()]
    # a leading block of LONGs (warmup + rise), then a block of SHORTs at the
    # reversal — each block at most `confirmation` long (the lagged spread
    # keeps its old sign for that many ticks after a transition)
    n_long = sigs.count("LONG")
    assert 1 <= n_long <= CFG.confirmation
    assert sigs[:n_long] == ["LONG"] * n_long
    assert set(sigs[n_long:]) == {"SHORT"} and len(sigs) - n_long <= CFG.confirmation
    # flip LONG→SHORT has position_change −2.0
    execs = out.executions.orderBy("signal_time").collect()
    changes = [r.position_change for r in execs]
    assert changes[0] == 1.0 and -2.0 in changes


def test_flat_no_signals(spark):
    out = build_pipeline(make_ticks(spark, [100.0] * 50), CFG)
    assert out.signals_decisions.count() == 0
    assert out.executions.count() == 0
    pos = out.positions_costs.agg(F.max(F.abs("position"))).first()[0]
    assert pos == 0.0


def test_null_quotes_mid_falls_back_to_price(spark):
    ticks = make_ticks(spark, [(100.0, None, None), (101.0, 100.9, 101.1)])
    out = build_pipeline(ticks, CFG)
    rows = out.normalized_prices.orderBy("sequence").collect()
    assert rows[0].mid_price == 100.0  # fallback (reference: sma_cross.py:67-70)
    assert abs(rows[1].mid_price - 101.0) < 1e-12
    # spread_ratio guard → 0.0 on null-quote rows (reference: sma_cross.py:258-260)
    costs = out.positions_costs.orderBy("sequence").collect()
    assert costs[0].spread_ratio == 0.0


def test_zero_prev_returns_null(spark):
    ticks = make_ticks(spark, [(0.0, None, None), (100.0, None, None), (101.0, None, None)])
    out = build_pipeline(ticks, CFG)
    rows = out.normalized_prices.orderBy("sequence").collect()
    assert rows[0].returns is None  # first tick
    assert rows[1].returns is None  # prev == 0 guard (reference: sma_cross.py:85-88)
    assert rows[2].returns is not None


def test_multi_product_isolation(spark):
    a = make_ticks(spark, [100.0 + i for i in range(30)], product_id="BTC-USD")
    b = make_ticks(spark, [100.0] * 30, product_id="ETH-USD")
    out = build_pipeline(a.unionByName(b), CFG)
    per_product = dict(
        out.signals_decisions.groupBy("instrument_id").count().collect()
    )
    assert per_product.get("BTC-USD", 0) >= 1
    assert "ETH-USD" not in per_product
    # ETH position stays flat, BTC fills to 1.0
    eth = out.positions_costs.filter(F.col("product_id") == "ETH-USD")
    assert eth.agg(F.max(F.abs("position"))).first()[0] == 0.0


def test_debounce_suppresses_fast_chop(spark):
    # oscillation faster than the confirmation window: spread and the
    # confirmation-lagged spread always share a sign → HOLD everywhere
    cfg = EngineConfig(sma_fast_window=2, sma_slow_window=4, sma_confirmation_window=4)
    mids = [100.0, 101.0] * 30
    out = build_pipeline(make_ticks(spark, mids), cfg)
    warm = out.crossover_signals.filter(F.col("sequence") >= 8)
    types = {r.signal_type for r in warm.collect()}
    assert types <= {"HOLD"}


def test_metrics_hand_computed(spark):
    # hand-check Sharpe/Sortino/drawdown on one 5-minute window
    # (reference: performance.py:127-137 — annualization SQRT(12))
    mids = [100.0, 101.0, 100.0, 102.0, 98.0, 99.0]
    cfg = EngineConfig(
        sma_fast_window=2,
        sma_slow_window=3,
        transaction_cost_bps=0,
        slippage_bps=0,
        slippage_max_bps=0,
        slippage_volatility_multiplier=0.0,
        slippage_spread_multiplier=0.0,
    )
    out = build_pipeline(make_ticks(spark, mids), cfg)
    rets = [
        r.realized_pnl for r in out.position_returns.orderBy("sequence").collect()
    ]
    metr = out.metrics.collect()
    assert len(metr) == 1  # 6 ticks in one 5-min window
    m = metr[0]
    n = len(rets)
    avg = sum(rets) / n
    vol = math.sqrt(sum((x - avg) ** 2 for x in rets) / n)
    assert abs(m.cumulative_return - sum(rets)) < 1e-12
    assert abs(m.drawdown - min(rets)) < 1e-12
    if vol > 0:
        assert abs(m.sharpe_ratio - (avg / vol) * math.sqrt(12.0)) < 1e-9
    neg = [x for x in rets if x < 0]
    if neg:
        downside = math.sqrt(sum(x * x for x in neg) / len(neg))
        assert abs(m.sortino_ratio - (avg / downside) * math.sqrt(12.0)) < 1e-9
    assert m.sample_size == n
    assert m.negative_samples == len(neg)


def test_hourly_rollup_aggregates_windows(spark):
    mids = [100.0 + (i % 7) for i in range(400)]  # ~6.6 min of 1s ticks
    out = build_pipeline(make_ticks(spark, mids), CFG)
    roll = out.hourly_rollup.collect()
    assert len(roll) == 1
    total_trades = out.metrics.agg(F.sum("trades_executed")).first()[0]
    assert roll[0].trades_executed_sum == total_trades


def test_execution_latency_shift(spark):
    mids = [100.0 + i for i in range(40)]
    out = build_pipeline(make_ticks(spark, mids), CFG)
    ex = out.executions.first()
    delta_ms = (ex.execution_time - ex.signal_time).total_seconds() * 1000
    cfg = CFG
    assert cfg.fill_latency_ms <= delta_ms <= cfg.fill_latency_ms + cfg.fill_latency_jitter_ms


# ------------------------------------------------------- breakout strategy
def test_breakout_fires_on_band_exit_only(spark):
    """Flat series inside the bands → no signals; a jump beyond
    slow_sma + 2·vol fires exactly one LONG at the entering tick (the
    in-band chop before it must not fire)."""
    from spark_signals.strategies import get_strategy_module

    mids = [100.0, 100.1] * 20 + [140.0, 140.0, 140.0]
    out = get_strategy_module("breakout").build_pipeline(make_ticks(spark, mids), CFG)
    dec = out.signals_decisions.collect()
    assert [r.signal_type for r in dec] == ["LONG"]
    # fires on the FIRST 140 tick (state enters +1 there)
    assert dec[0].signal_time == make_ticks(spark, mids).collect()[40].event_time


def test_breakout_short_on_lower_band_exit(spark):
    from spark_signals.strategies import get_strategy_module

    mids = [100.0, 100.1] * 20 + [60.0, 60.0]
    out = get_strategy_module("breakout").build_pipeline(make_ticks(spark, mids), CFG)
    dec = out.signals_decisions.collect()
    assert [r.signal_type for r in dec] == ["SHORT"]


def test_breakout_full_outputs_shape(spark):
    """The third strategy drives the ENTIRE downstream machinery (fills,
    costs, metrics) through the shared assemble_outputs contract."""
    from spark_signals.strategies import get_strategy_module

    mids = [100.0 + i * 0.5 for i in range(80)]
    out = get_strategy_module("breakout").build_pipeline(make_ticks(spark, mids), CFG)
    assert out.positions_costs.count() == 80
    assert out.metrics.columns == build_pipeline(make_ticks(spark, mids), CFG).metrics.columns
