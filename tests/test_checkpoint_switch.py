"""The one-key cluster-durability switch (r12 verdict #4): every stage-
boundary lineage pin routes through spark_signals.checkpoint.pin, which is
an eager localCheckpoint by default and a RELIABLE checkpoint under
spark.signals.checkpointDir when that key is set — so the 100 TB
durability story is a config flip, not a ~40-site edit."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_signals.checkpoint import CHECKPOINT_DIR_KEY, pin


def _sample(spark):
    return spark.range(1000).withColumn("v", F.col("id") * 2)


def _unset(spark):
    try:
        spark.conf.unset(CHECKPOINT_DIR_KEY)
    except Exception:
        pass


def test_default_path_is_local_checkpoint(spark, tmp_path):
    _unset(spark)
    out = _sample(spark).transform(pin)
    assert out.count() == 1000
    # nothing written anywhere: the tmp dir the reliable path would use
    # stays untouched
    assert list(tmp_path.iterdir()) == []


def test_reliable_checkpoint_when_dir_set(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_KEY, ckdir)
    try:
        out = _sample(spark).transform(pin)
        rows = sorted(r["v"] for r in out.collect())
        assert rows == [2 * i for i in range(1000)]
        # blocks landed under the configured dir (Spark creates a unique
        # per-app subdir containing rdd-* checkpoint data)
        found = [
            name
            for _, dirs, _ in os.walk(ckdir)
            for name in dirs
            if name.startswith("rdd-")
        ]
        assert found, "reliable checkpoint wrote no rdd-* dirs"
    finally:
        _unset(spark)


def test_flip_moves_no_values(spark, tmp_path):
    """Zero oracle movement: a pin-heavy operator returns value-identical
    results with the switch on and off."""
    from spark_signals.datapipe import dedup as D

    run = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, f"{run} tail{i}", "en", "src", 0) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _unset(spark)
    base = sorted(map(tuple, D.dedup_spans_incr_snapshot(docs).collect()))
    spark.conf.set(CHECKPOINT_DIR_KEY, str(tmp_path / "ck2"))
    try:
        flipped = sorted(map(tuple, D.dedup_spans_incr_snapshot(docs).collect()))
    finally:
        _unset(spark)
    assert base == flipped


def test_streaming_frames_pass_through(spark):
    stream = spark.readStream.format("rate").load()
    assert pin(stream) is stream
