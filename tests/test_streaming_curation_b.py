"""Streaming curation, shard B: windowed trending terms, the quality
monitor, the streaming near-dup lane, and the incremental packing lane.
Shard A (test_streaming_curation.py) carries the stateless/ingest/replay
contracts; helpers in _streaming_curation_common."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests._streaming_curation_common import DOC_SCHEMA, SF, drain as _drain, rows as _rows

def test_trending_terms_stream_matches_batch_and_drops_late(spark, tmp_path):
    """Sliding-window term counts: the drained stream must equal the same
    windowed aggregation run as a batch query, late rows must be dropped at
    the aggregate, and serving-side top-k ranks deterministically."""
    from spark_signals.datapipe.streaming import top_terms_of, trending_terms_stream

    t0 = dt.datetime(2024, 1, 8, 12, 0, 0)
    rows = [
        (1, "alpha beta alpha", t0),
        (2, "beta gamma", t0 + dt.timedelta(minutes=1)),
        (3, "alpha alpha", t0 + dt.timedelta(minutes=2)),
        # watermark driver: pushes the watermark past the late row below
        (4, "omega", t0 + dt.timedelta(minutes=30)),
        # LATE: 25 min older than the max event at file order; beyond the
        # 10-min watermark delay, so the aggregate must drop it
        (5, "late late late", t0 + dt.timedelta(minutes=1)),
    ]
    schema = "doc_id long, text string, ingest_time timestamp"
    src = str(tmp_path / "feed")
    out = str(tmp_path / "counts")
    ck = str(tmp_path / "ck")

    def drain() -> None:
        # identical query + file sink both runs: the shared checkpoint
        # carries the watermark forward, so run 2 sees a watermark already
        # past the late row's window (memory sinks can't recover, hence
        # parquet)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            trending_terms_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination()

    # two files in arrival order: the late row arrives AFTER the watermark
    # has advanced past its window
    spark.createDataFrame(rows[:4], schema).coalesce(1).write.parquet(src)
    drain()
    spark.createDataFrame(rows[4:], schema).coalesce(1).write.mode("append").parquet(src)
    drain()
    counts = spark.read.parquet(out)
    got = {
        (r["window_start"], r["word"]): r["n"] for r in counts.collect()
    }
    # batch reference over the NON-late rows only
    from spark_signals.datapipe.text import words_col
    from spark_signals.datapipe.util import explode_strings

    batch = (
        explode_strings(
            spark.createDataFrame(rows[:4], schema).withColumn(
                "words", words_col(F.col("text"))
            ),
            F.col("words"),
            "word",
            "ingest_time",
        )
        .filter(F.col("word") != "")
        .groupBy(F.window("ingest_time", "5 minutes", "1 minute"), "word")
        .agg(F.count(F.lit(1)).alias("n"))
        # append mode emits a window only once the watermark passes its
        # END: final watermark = max event (12:30) - 10 min delay = 12:20,
        # so omega's still-open windows are correctly absent
        .filter(F.col("window.end") <= t0 + dt.timedelta(minutes=20))
        .select(F.col("window.start").alias("window_start"), "word", "n")
    )
    want = {(r["window_start"], r["word"]): r["n"] for r in batch.collect()}
    assert got == want
    assert not any(w == "late" for (_, w) in got)
    # serving-side rank: alpha dominates every window it appears in
    ranked = top_terms_of(counts, k=1)
    for r in ranked.collect():
        if (r["window_start"], "alpha") in got:
            assert r["word"] == "alpha"


def test_stream_and_batch_share_one_content_digest(spark):
    """A padded redelivery must hash identically in the streaming filter and
    the batch exact-dedup pass — one shared content_digest definition."""
    from spark_signals.datapipe import dedup as batch_dedup
    from spark_signals.datapipe import streaming as stream_dedup

    assert stream_dedup.content_digest is batch_dedup.content_digest

    rows = [(1, "Hello   world"), (2, "  hello WORLD \n"), (3, "other doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    digests = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", batch_dedup.content_digest(F.col("text")).alias("d")
        ).collect()
    }
    assert digests[1] == digests[2] != digests[3]
    # and the batch pass agrees: docs 1 and 2 are one group
    groups = batch_dedup.dedup_exact(df)
    canon = {r["doc_id"]: r["canonical_doc_id"] for r in groups.collect()}
    assert canon == {1: 1, 2: 1, 3: 3}


def test_quality_monitor_stream_counts_gate_failures(spark, tmp_path):
    from spark_signals.datapipe.streaming import quality_monitor_stream

    t0 = dt.datetime(2024, 1, 8, 12, 0, 0)
    rep = ("spam " * 40).strip()
    rows = [
        (1, "perfectly ordinary clean document body here", t0),
        (2, rep, t0 + dt.timedelta(minutes=1)),                      # repetitive
        (3, "contact me at someone@example.com please", t0 + dt.timedelta(minutes=2)),  # pii
        (4, "watermark driver doc", t0 + dt.timedelta(minutes=30)),
    ]
    schema = "doc_id long, text string, ingest_time timestamp"
    src = str(tmp_path / "qfeed")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        quality_monitor_stream(stream)
        .writeStream.format("memory")
        .queryName("qmon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r["window_start"]: r for r in spark.table("qmon").collect()}
    w0 = dt.datetime(2024, 1, 8, 12, 0, 0)
    assert out[w0]["n_docs"] == 3
    assert out[w0]["n_repetitive"] == 1
    assert out[w0]["n_pii"] == 1
    assert out[w0]["avg_words"] > 0


def test_streaming_neardup_lane_matches_single_batch_over_union(spark, tmp_path):
    """The curate example's streaming near-dup lane (band_index_dir on):
    two ordered ingest drops through the band-index probe must admit
    exactly the documents that ONE batch pass of
    dedup_incremental_neardup over the union (empty history) admits —
    the stream is just the batch rule replayed drop by drop, with the
    persisted band index standing in for the earlier drop. Planted
    structure is pair-only (no chains), where the greedy first-wins rule
    is drop-order invariant."""
    from spark_signals.datapipe.dedup import dedup_incremental_neardup
    from spark_signals.datapipe.streaming import ingest_dedup_stream

    base_a = "alpha beta gamma delta epsilon zeta eta theta " * 6
    base_b = "one two three four five six seven eight nine ten " * 6
    rows = [
        (0, base_a, "en", "s", len(base_a)),
        (1, "totally unrelated content about spark shuffles here", "en", "s", 50),
        # cross-drop near-dup pair: 2 (drop 1) ~ 10 (drop 2)
        (2, base_b, "en", "s", len(base_b)),
        (10, base_b + " tail", "en", "s", len(base_b) + 5),
        # within-drop-2 near-dup pair: 11 ~ 12
        (11, base_a + " coda", "en", "s", len(base_a) + 5),
        (12, base_a + " coda!", "en", "s", len(base_a) + 6),
        (13, "another singleton document with its own words", "en", "s", 45),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.createDataFrame(rows, schema)
    # NOTE: doc 11 near-dups doc 0 too (shared base_a) — that makes 0's
    # clique {0, 11, 12}, still chain-free for the drop split below
    # because 0 is in drop 1 and survives, 11/12 are in drop 2.

    src = str(tmp_path / "drops")
    dirs = dict(
        index_dir=str(tmp_path / "digest_index"),
        survivors_dir=str(tmp_path / "survivors"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        band_index_dir=str(tmp_path / "bands"),
    )
    drop1 = docs.filter(F.col("doc_id") <= 9)
    drop2 = docs.filter(F.col("doc_id") > 9)
    for batch in (drop1, drop2):
        batch.write.mode("append").parquet(src)
        q = ingest_dedup_stream(
            spark.readStream.schema(docs.schema).parquet(src), **dirs
        )
        q.awaitTermination()
    streamed = {
        r["doc_id"] for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    }

    empty_index = spark.createDataFrame(
        [], "band int, k1 long, k2 long, doc_id long"
    )
    empty_hist = spark.createDataFrame([], schema)
    batch_survivors, _ = dedup_incremental_neardup(docs, empty_index, empty_hist)
    batched = {r["doc_id"] for r in batch_survivors.collect()}

    assert streamed == batched == {0, 1, 2, 13}


def test_ingest_batch_packing_lane_accumulates_and_replays(spark, tmp_path):
    """The pack_tail_dir/pack_manifest_dir flags turn on per-batch
    incremental packing of the ADMITTED documents: across drops the
    accumulated manifest equals the global pack_sequences over the
    accumulated survivors (the lane's equivalence invariant, here through
    the streaming plumbing), the persisted tail equals the survivors'
    pack_tail, and a replayed batch leaves both byte-identical."""
    from spark_signals.datapipe.pack import pack_sequences, pack_tail
    from spark_signals.datapipe.streaming import process_ingest_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    dirs = dict(
        index_dir=str(tmp_path / "idx"),
        survivors_dir=str(tmp_path / "sur"),
        pack_tail_dir=str(tmp_path / "tail"),
        pack_manifest_dir=str(tmp_path / "man"),
    )
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)
    process_ingest_batch(b1, 0, **dirs)
    process_ingest_batch(b2, 1, **dirs)

    survivors = spark.read.parquet(dirs["survivors_dir"]).select(*docs.columns)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(dirs["pack_manifest_dir"])
        .drop("batch_id")
        .collect()
    )
    want = sorted(tuple(r) for r in pack_sequences(survivors).collect())
    assert got == want and got
    # the latest tail (per-shard max across partitions) is the survivors' tail
    latest_tail = {
        r["shard"]: r["st"]
        for r in spark.read.parquet(dirs["pack_tail_dir"])
        .groupBy("shard")
        .agg(F.max("stream_tokens").alias("st"))
        .collect()
    }
    assert latest_tail == {
        r["shard"]: r["stream_tokens"] for r in pack_tail(survivors).collect()
    }
    # replay the last batch: manifest + tail byte-identical
    man_snap = sorted(
        tuple(r) for r in spark.read.parquet(dirs["pack_manifest_dir"]).collect()
    )
    tail_snap = sorted(
        tuple(r) for r in spark.read.parquet(dirs["pack_tail_dir"]).collect()
    )
    process_ingest_batch(b2, 1, **dirs)
    assert (
        sorted(
            tuple(r)
            for r in spark.read.parquet(dirs["pack_manifest_dir"]).collect()
        )
        == man_snap
    )
    assert (
        sorted(
            tuple(r) for r in spark.read.parquet(dirs["pack_tail_dir"]).collect()
        )
        == tail_snap
    )
