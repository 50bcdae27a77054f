"""S5-S7 buffered JDBC sinks against a REAL database.

The reference's streaming jobs buffer-flush into TimescaleDB over JDBC
(reference __main__.py:144-227, sink.buffer-flush.max-rows=100-200). Spark
bundles Apache Derby, so the exact `df.write.format("jdbc")` path the
engine uses for Postgres runs here against an embedded Derby instance —
table auto-creation, batched inserts, append semantics, and read-back all
execute for real instead of staying behind a "no database in CI" gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_signals.io.sinks import write_sinks
from spark_signals.io.sources import load_ticks
from spark_signals.pipeline.builder import build_pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def derby_fanout(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{tmp}/sinkdb;create=true"
    out = build_pipeline(load_ticks(spark, SF))
    paths = write_sinks(out, str(tmp / "parquet"), jdbc_url=url, jdbc_batchsize=100)
    return url, paths


def _jdbc(spark, url, table):
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).load()


def test_jdbc_sinks_write_all_tables(spark, derby_fanout):
    url, paths = derby_fanout
    assert len(paths) == 6
    for name, path in paths.items():
        jn = _jdbc(spark, url, name).count()
        pn = spark.read.parquet(path).count()
        assert jn == pn > 0, name


def test_jdbc_roundtrip_values_exact(spark, derby_fanout):
    """Value fidelity through the database, not just row counts: the
    executions ledger read back over JDBC must match the parquet twin
    row-for-row (doubles bit-exact, timestamps to the microsecond)."""
    url, paths = derby_fanout
    cols = [
        "sequence", "product_id", "signal_time", "execution_time",
        "position_change", "execution_price", "transaction_cost", "slippage_cost",
    ]
    got = sorted(
        tuple(r) for r in _jdbc(spark, url, "strategy_executions").select(*cols).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(paths["strategy_executions"]).select(*cols).collect()
    )
    assert got == want


def test_jdbc_append_is_append(spark, derby_fanout, tmp_path):
    """mode('append') must accumulate — the redelivery/idempotency contract
    lives in the streaming writer's batch-id partitioning, NOT in the JDBC
    layer. Uses a scratch table so the shared fan-out tables stay pristine
    for the count-parity test regardless of execution order."""
    url, _ = derby_fanout
    df = _jdbc(spark, url, "signals_decisions").limit(7)
    for expected in (7, 14):
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "append_probe")
            .option("batchsize", 3)
            .mode("append")
            .save()
        )
        assert _jdbc(spark, url, "append_probe").count() == expected
