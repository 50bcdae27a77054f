"""As-of join and range join — semantics, staleness, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_signals.temporal import asof_join, range_join_agg
from tests.test_plans import count_op, plan_str

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    trades = spark.createDataFrame(
        [("A", _t(10), 1, 100.0), ("A", _t(20), 3, 101.0), ("A", _t(5), 5, 99.0),
         ("B", _t(10), 7, 50.0)],
        "product_id string, event_time timestamp, sequence long, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _t(8), 100, 99.9, 100.1),
            ("A", _t(20), 102, 100.9, 101.1),  # exactly simultaneous with trade 3
            ("A", _t(25), 104, 101.9, 102.1),
            # B has no quote before its trade
            ("B", _t(60), 106, 49.9, 50.1),
        ],
        "product_id string, event_time timestamp, q_seq long, q_bid double, q_ask double",
    )
    return trades, quotes


def test_asof_semantics(spark):
    trades, quotes = _frames(spark)
    out = {
        r.sequence: r
        for r in asof_join(
            trades, quotes, on="product_id",
            right_values=["q_bid", "q_ask", "q_seq"], tiebreak="q_seq",
        ).collect()
    }
    assert out[1].q_seq == 100          # latest quote at t=8 <= t=10
    assert out[3].q_seq == 102          # exactly-simultaneous quote IS visible
    assert out[5].q_seq is None         # no quote yet at t=5
    assert out[7].q_seq is None         # B's only quote is in the future
    assert out[1].q_bid == 99.9 and out[1].matched_time == _t(8)


def test_asof_tolerance_nulls_stale_matches(spark):
    trades, quotes = _frames(spark)
    out = {
        r.sequence: r
        for r in asof_join(
            trades, quotes, on="product_id",
            right_values=["q_bid", "q_ask", "q_seq"], tiebreak="q_seq",
            tolerance="1 second",
        ).collect()
    }
    assert out[1].q_seq is None         # quote is 2s old, beyond the 1s bound
    assert out[1].matched_time is None  # staleness nulls the match time too
    assert out[3].q_seq == 102          # age 0 within tolerance


def test_asof_matches_duckdb_native_asof(spark):
    """Cross-check the operator against DuckDB's built-in ASOF JOIN on a
    tie-free fixture — an independent implementation of the semantics."""
    import duckdb

    trades, quotes = _frames(spark)
    got = {
        (r.product_id, r.sequence): r.q_seq
        for r in asof_join(
            trades, quotes, on="product_id",
            right_values=["q_bid", "q_ask", "q_seq"], tiebreak="q_seq",
        ).collect()
    }
    t_pd = trades.toPandas()
    q_pd = quotes.toPandas()
    ref = duckdb.sql(
        """
        SELECT t.product_id, t.sequence, q.q_seq
        FROM t_pd t ASOF LEFT JOIN q_pd q
          ON t.product_id = q.product_id AND t.event_time >= q.event_time
        """
    ).fetchall()
    for product, seq, q_seq in ref:
        assert got[(product, seq)] == q_seq


def test_asof_plan_single_window_shuffle(spark):
    trades, quotes = _frames(spark)
    p = plan_str(
        asof_join(trades, quotes, on="product_id", right_values=["q_bid"], tiebreak="q_seq")
    )
    assert count_op(p, "Exchange") == 1  # one hash shuffle for the window
    assert count_op(p, "Window") == 1
    assert "Join" not in p  # no join operator at all — union + fill


def test_range_join_counts(spark):
    trades, _ = _frames(spark)
    ticks = spark.createDataFrame(
        [("A", _t(s), float(s)) for s in (1, 4, 8, 9, 15, 30)]
        + [("B", _t(9), 1.0)],
        "product_id string, event_time timestamp, r_price double",
    )
    out = {
        r.sequence: r
        for r in range_join_agg(
            trades.select("product_id", "event_time", "sequence"),
            ticks, on="product_id", window="10 seconds",
            aggs=[F.count("r_price").alias("n"), F.sum("r_price").alias("s")],
        ).collect()
    }
    # trade t=10: ticks in [0,10) → s=1,4,8,9
    assert out[1].n == 4 and out[1].s == 22.0
    # trade t=20: ticks in [10,20) → s=15
    assert out[3].n == 1 and out[3].s == 15.0
    # trade t=5: ticks in [-5,5) → s=1,4
    assert out[5].n == 2
    # B trade t=10: tick at 9
    assert out[7].n == 1


def test_range_join_plan_no_nested_loop(spark):
    trades, _ = _frames(spark)
    ticks = spark.createDataFrame(
        [("A", _t(1), 1.0)], "product_id string, event_time timestamp, r_price double"
    )
    p = plan_str(
        range_join_agg(
            trades.select("product_id", "event_time", "sequence"),
            ticks, on="product_id", window="10 seconds",
            aggs=[F.count("r_price").alias("n")],
        )
    )
    # the inequality is applied as a post-equi-join filter, never as a
    # BroadcastNestedLoopJoin — the shape that dies at scale
    assert count_op(p, "BroadcastNestedLoopJoin") == 0
    assert "CartesianProduct" not in p
