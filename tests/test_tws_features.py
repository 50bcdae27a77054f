"""transformWithStateInPandas (Spark 4 arbitrary-state v2) rolling features:
bit-parity with batch, state carry-over, and native state TTL (the Spark
analog of the reference's table.exec.state.ttl=PT6H, __main__.py:45)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.io.sources import load_ticks
from spark_signals.streaming.tws_features import stateful_features_tws
from tests.test_streaming import CHECK_COLS, SF, _drain, _sorted_rows

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

# transformWithStateInPandas's Python worker speaks protobuf to the state
# server (pyspark.sql.streaming.proto); without the protobuf package the
# worker crashes. compat.pbshim can bridge to the gcloud-vendored
# pure-python protobuf in this sandbox; gate on the bridge succeeding (the
# processor-level unit tests below run everywhere regardless).
from spark_signals.compat.pbshim import install as _pbshim_install

HAVE_PROTOBUF = _pbshim_install()

needs_protobuf = pytest.mark.skipif(
    not HAVE_PROTOBUF, reason="transformWithStateInPandas worker requires protobuf"
)


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


# availableNow drains must use time_mode="None": in "ProcessingTime" mode
# (the TTL path) Spark 4.1 keeps scheduling empty timer micro-batches after
# the data is drained, so an availableNow query never terminates (observed:
# 1390 stages of empty batches at sf0.001). The TTL test below uses a
# processingTime trigger with a manual stop instead.
NO_TTL = {"state_ttl_ms": None, "time_mode": "None"}


@needs_protobuf
def test_tws_matches_batch(spark, tmp_path, rocksdb_state):
    cfg = EngineConfig()
    src = str(tmp_path / "ticks")
    load_ticks(spark, SF).orderBy("event_time", "sequence").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(load_ticks(spark, SF).schema).parquet(src)
    feats = stateful_features_tws(stream, cfg, **NO_TTL)
    got = _sorted_rows(_drain(feats, spark), CHECK_COLS)
    from spark_signals.parity import _costs

    want = _sorted_rows(_costs(spark, SF), CHECK_COLS)
    assert got == want  # bit-identical to the batch window plan


@needs_protobuf
def test_tws_state_carries_across_microbatches(spark, tmp_path, rocksdb_state):
    cfg = EngineConfig()
    ticks = load_ticks(spark, SF).orderBy("event_time", "sequence").collect()
    n = len(ticks)
    src = str(tmp_path / "split")
    os.makedirs(src)
    schema = load_ticks(spark, SF).schema
    for i, chunk in enumerate([ticks[: n // 2], ticks[n // 2 :]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(f"{src}/part{i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/part*")
    )
    got = _sorted_rows(_drain(stateful_features_tws(stream, cfg, **NO_TTL), spark), CHECK_COLS)
    from spark_signals.parity import _costs

    want = _sorted_rows(_costs(spark, SF), CHECK_COLS)
    assert got == want


@needs_protobuf
def test_tws_state_ttl_expires_idle_keys(spark, tmp_path, rocksdb_state):
    """With a tiny TTL, state written by run 1 is expired by run 2 (same
    checkpoint): the frame deques restart, so the first row of run 2 has
    NULL returns. A control run with long TTL keeps the state.

    TTL requires time_mode="ProcessingTime", whose timer batches make
    availableNow spin forever (see NO_TTL above) — so each drain uses a
    processingTime trigger, polls the parquet sink for the expected row
    count, then stops the query manually. The memory sink can't be used
    here at all: it rejects checkpoint recovery, which run 2 depends on.
    """
    import datetime as dt

    from tests.conftest import make_ticks

    cfg = EngineConfig()
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    schema = make_ticks(spark, [100.0]).schema

    def drain(ttl_ms: int, src: str, ckpt: str, out: str, expect_rows: int) -> None:
        stream = spark.readStream.schema(schema).parquet(f"{src}/f*")
        q = (
            stateful_features_tws(stream, cfg, state_ttl_ms=ttl_ms)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= expect_rows:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(0.1)
            else:
                raise AssertionError(f"sink never reached {expect_rows} rows")
        finally:
            q.stop()
            q.awaitTermination()

    def run(ttl_ms: int) -> list:
        src = str(tmp_path / f"src_{ttl_ms}")
        ckpt = str(tmp_path / f"ckpt_{ttl_ms}")
        out = str(tmp_path / f"out_{ttl_ms}")
        os.makedirs(src)
        a = make_ticks(spark, [100.0, 101.0, 102.0], start=t0)
        a.coalesce(1).write.parquet(f"{src}/f0")
        drain(ttl_ms, src, ckpt, out, 3)
        time.sleep(1.5)  # let the 500ms TTL lapse between runs
        b = make_ticks(
            spark, [103.0, 104.0], start=t0 + dt.timedelta(minutes=1)
        ).withColumn("sequence", (F.col("sequence") + 100).cast("long"))
        b.coalesce(1).write.parquet(f"{src}/f1")
        drain(ttl_ms, src, ckpt, out, 5)
        rows = (
            spark.read.parquet(out)
            .filter("sequence >= 100")
            .orderBy("sequence")
            .select("returns")
            .collect()
        )
        return [r.returns for r in rows]

    expired = run(ttl_ms=500)
    kept = run(ttl_ms=3_600_000)
    # TTL hit: frame restarted, first post-gap row has no previous mid
    assert expired[0] is None and expired[1] is not None
    # control: state survived, returns computed from the pre-gap mid
    assert kept[0] is not None


class _FakeValueState:
    def __init__(self):
        self._val = None

    def exists(self):
        return self._val is not None

    def get(self):
        return self._val

    def update(self, v):
        self._val = v


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, _FakeValueState())


def test_processor_unit_matches_batch_replay(spark):
    """Drive RollingFeatureProcessor directly (no streaming runtime, so no
    protobuf needed): two consecutive micro-batches through one processor
    must equal one replay_batch pass over the concatenation."""
    from pyspark.sql.streaming.stateful_processor import TimerValues

    from spark_signals.streaming.features import FRESH_STATE, replay_batch
    from spark_signals.streaming.tws_features import RollingFeatureProcessor

    cfg = EngineConfig()
    pdf = (
        load_ticks(spark, SF)
        .filter(F.col("product_id") == "P-12")
        .orderBy("event_time", "sequence")
        .toPandas()
    )
    assert len(pdf) > 10
    cut = len(pdf) // 2

    proc = RollingFeatureProcessor(cfg, ttl_ms=6 * 3600 * 1000)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttls["features"] == 6 * 3600 * 1000
    timers = TimerValues(currentProcessingTimeInMs=0, currentWatermarkInMs=-1)
    out1 = list(proc.handleInputRows(("P-12",), iter([pdf.iloc[:cut]]), timers))
    out2 = list(proc.handleInputRows(("P-12",), iter([pdf.iloc[cut:]]), timers))
    got = pd.concat(out1 + out2, ignore_index=True)

    want_rows, _ = replay_batch(
        cfg, "P-12", pdf.sort_values(["event_time", "sequence"]), FRESH_STATE
    )
    want = pd.DataFrame(want_rows, columns=list(got.columns))
    pd.testing.assert_frame_equal(got, want)


@needs_protobuf
def test_tws_breakout_matches_batch_strategy(spark, tmp_path, rocksdb_state):
    """Strategy plugging on the Spark-4 state API: stateful_features_tws
    with strategy='breakout' must be bit-identical to strategies.breakout's
    batch plan — positions/costs AND the sparse signal set — mirroring the
    applyInPandasWithState gate in test_streaming."""
    from spark_signals.strategies import get_strategy_module

    cfg = EngineConfig()
    src = str(tmp_path / "ticks_bk_tws")
    load_ticks(spark, SF).orderBy("event_time", "sequence").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(load_ticks(spark, SF).schema).parquet(src)
    got_df = _drain(stateful_features_tws(stream, cfg, strategy="breakout", **NO_TTL), spark)
    got = _sorted_rows(got_df, CHECK_COLS)

    out = get_strategy_module("breakout").build_pipeline(load_ticks(spark, SF), cfg)
    want = _sorted_rows(out.positions_costs, CHECK_COLS)
    assert got == want

    sig_cols = ["sequence", "signal_type", "confidence"]
    got_sig = [
        tuple(r)
        for r in got_df.filter(got_df.signal_type != "HOLD")
        .select(*sig_cols)
        .orderBy("sequence")
        .collect()
    ]
    want_sig = [
        tuple(r)
        for r in out.crossover_signals.filter("signal_type <> 'HOLD'")
        .select(*sig_cols)
        .orderBy("sequence")
        .collect()
    ]
    assert got_sig == want_sig and len(got_sig) > 0


def test_processor_unit_breakout_matches_batch_replay(spark):
    """Processor-level breakout parity (no streaming runtime, runs without
    protobuf): RollingFeatureProcessor(strategy='breakout') across two
    micro-batches must equal one replay_batch pass with the breakout rule."""
    from pyspark.sql.streaming.stateful_processor import TimerValues

    from spark_signals.streaming.features import (
        FRESH_STATE,
        STREAMING_RULES,
        replay_batch,
    )
    from spark_signals.streaming.tws_features import RollingFeatureProcessor

    cfg = EngineConfig()
    pdf = (
        load_ticks(spark, SF)
        .filter(F.col("product_id") == "P-12")
        .orderBy("event_time", "sequence")
        .toPandas()
    )
    assert len(pdf) > 10
    cut = len(pdf) // 2

    proc = RollingFeatureProcessor(cfg, ttl_ms=None, strategy="breakout")
    proc.init(_FakeHandle())
    timers = TimerValues(currentProcessingTimeInMs=0, currentWatermarkInMs=-1)
    out1 = list(proc.handleInputRows(("P-12",), iter([pdf.iloc[:cut]]), timers))
    out2 = list(proc.handleInputRows(("P-12",), iter([pdf.iloc[cut:]]), timers))
    got = pd.concat(out1 + out2, ignore_index=True)

    want_rows, _ = replay_batch(
        cfg,
        "P-12",
        pdf.sort_values(["event_time", "sequence"]),
        FRESH_STATE,
        STREAMING_RULES["breakout"](cfg),
    )
    want = pd.DataFrame(want_rows, columns=list(got.columns))
    pd.testing.assert_frame_equal(got, want)
    assert (got.signal_type != "HOLD").any()
