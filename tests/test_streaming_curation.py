"""Streaming curation: the batch operators must run UNCHANGED on a
readStream and produce the batch result, and redelivered documents must
dedup within the watermark with bounded state."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from spark_signals.datapipe.scrub import pii_scrub
from spark_signals.datapipe.streaming import dedup_docs_stream
from spark_signals.datapipe.text import text_stats, unigram_lm_quality

SF = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _drain(df, spark, mode="append"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _rows(df, key="doc_id"):
    return sorted([tuple(r) for r in df.collect()])


def test_stateless_curation_ops_run_unchanged_on_streams(spark, tmp_path):
    src = str(tmp_path / "docs")
    batch = spark.read.parquet(f"{SF}/documents.parquet")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    from spark_signals.datapipe.clean import clean_text
    from spark_signals.datapipe.dedup import dedup_intra_doc

    for op in (pii_scrub, text_stats, clean_text, dedup_intra_doc):
        got = _rows(_drain(op(stream), spark))
        want = _rows(op(spark.read.parquet(src)))
        assert got == want, f"{op.__name__} diverges between batch and stream"


def test_unigram_lm_requires_batch(spark, tmp_path):
    """The LM build is a full-corpus aggregate — explicitly NOT streamable
    in append mode; the API must fail loudly, not emit partial models."""
    src = str(tmp_path / "docs")
    batch = spark.read.parquet(f"{SF}/documents.parquet")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    import pyspark.errors

    try:
        _drain(unigram_lm_quality(stream), spark)
        raise AssertionError("expected streaming unigram LM to be rejected")
    except pyspark.errors.PySparkException:
        pass


def test_dedup_docs_stream_drops_redelivered(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 8, 12, 0, 0)
    rows = [
        (1, "first unique document body", t0),
        (2, "second unique document body", t0 + dt.timedelta(seconds=30)),
        # redelivery of doc 1's content (different doc_id, whitespace noise)
        (3, "first  unique   document body", t0 + dt.timedelta(seconds=60)),
        # redelivery that differs ONLY by leading/trailing padding — the r5
        # streaming digest missed the trim and let this one through
        (5, "  second unique document body \n", t0 + dt.timedelta(seconds=75)),
        (4, "third unique document body", t0 + dt.timedelta(seconds=90)),
    ]
    src = str(tmp_path / "redelivery")
    schema = "doc_id long, text string, ingest_time timestamp"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = _drain(dedup_docs_stream(stream), spark)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 4]
    # the helper column must not leak into the output schema
    assert out.columns == ["doc_id", "text", "ingest_time"]


def test_streaming_ingest_then_curate_matches_batch_curate(spark, tmp_path):
    """The production ingestion story end-to-end: batch N+1 streams in
    through ingest_dedup_stream against the digest index batch N produced;
    the full curate() composition over the ACCUMULATED survivors must equal
    batch curate() over the union, row for row (on the surviving docs)."""
    from spark_signals.datapipe.curate import curate
    from spark_signals.datapipe.streaming import ingest_dedup_stream

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    batch_a = docs.filter(F.col("doc_id") <= mid)
    batch_b = docs.filter(F.col("doc_id") > mid)

    src = str(tmp_path / "ingest")
    dirs = dict(
        index_dir=str(tmp_path / "digest_index"),
        survivors_dir=str(tmp_path / "survivors"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # two availableNow runs over one source dir + one checkpoint = two
    # ordered ingest drops (the nightly-batch shape)
    for batch in (batch_a, batch_b):
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = ingest_dedup_stream(stream, **dirs)
        q.awaitTermination()

    survivors = spark.read.parquet(dirs["survivors_dir"])
    # exact-dedup ground truth: one survivor per digest, min doc_id overall
    # (batch A holds the lower ids, so first-seen == global min)
    from spark_signals.datapipe.dedup import dedup_exact

    want_ids = {
        r["canonical_doc_id"]
        for r in dedup_exact(docs).select("canonical_doc_id").distinct().collect()
    }
    got_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert got_ids == want_ids

    # curate over the accumulated survivors == batch curate over the union,
    # restricted to the survivors (the canon corpus is identical, so every
    # corpus-level stat — passage dup, LM bands — must agree exactly)
    got = {
        r["doc_id"]: tuple(r)
        for r in curate(survivors).collect()
    }
    want = {
        r["doc_id"]: tuple(r)
        for r in curate(docs).filter(F.col("doc_id").isin(got_ids)).collect()
    }
    assert got == want


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the sink write and
    the checkpoint commit REPLAYS the micro-batch. Replaying a batch (same
    batch_id) must leave survivors and index byte-identical — no duplicate
    rows — and the batch must dedup against the pre-batch index, not its
    own partial output."""
    from spark_signals.datapipe.streaming import process_ingest_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    dirs = dict(
        index_dir=str(tmp_path / "idx"), survivors_dir=str(tmp_path / "sur")
    )
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)
    process_ingest_batch(b1, 0, **dirs)
    process_ingest_batch(b2, 1, **dirs)
    snap = sorted(
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    )
    idx_snap = sorted(
        tuple(r) for r in spark.read.parquet(dirs["index_dir"]).collect()
    )
    # replay the LAST batch (the only one Spark can replay)
    process_ingest_batch(b2, 1, **dirs)
    assert sorted(
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    ) == snap
    assert sorted(
        tuple(r) for r in spark.read.parquet(dirs["index_dir"]).collect()
    ) == idx_snap


def test_ingest_batch_neardup_flag_replay_is_idempotent(spark, tmp_path):
    """The band_index_dir flag turns on the signature-level pass: a batch-2
    NEAR-dup of a batch-1 survivor (not byte-equal — the digest index
    cannot see it) is dropped, the admitted docs' band rows land in the
    batch's band partition, and replaying the batch leaves survivors +
    both indexes byte-identical."""
    from spark_signals.datapipe.streaming import process_ingest_batch

    base = "the quick brown fox jumps over the lazy dog again and again today"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b1 = spark.createDataFrame(
        [
            (1, base, "en", "src", 60),
            (2, "completely unrelated first corpus text here", "en", "src", 43),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (10, base.replace("lazy", "sleepy"), "en", "src", 62),  # near-dup of 1
            (11, "genuinely new material nothing shared at all zero", "en", "src", 49),
            (12, base, "en", "src", 60),  # EXACT dup of 1 (digest pass catches)
        ],
        schema,
    )
    dirs = dict(
        index_dir=str(tmp_path / "idx"),
        survivors_dir=str(tmp_path / "sur"),
        band_index_dir=str(tmp_path / "bands"),
    )
    process_ingest_batch(b1, 0, **dirs)
    process_ingest_batch(b2, 1, **dirs)
    survivors = spark.read.parquet(dirs["survivors_dir"])
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 2, 11]
    # band index covers exactly the admitted docs, digest index too
    assert {r["doc_id"] for r in spark.read.parquet(dirs["band_index_dir"]).collect()} == {1, 2, 11}
    idx = spark.read.parquet(dirs["index_dir"])
    assert {r["canonical_doc_id"] for r in idx.collect()} == {1, 2, 11}

    snap = sorted((r["doc_id"], r["batch_id"]) for r in survivors.collect())
    band_snap = sorted(tuple(r) for r in spark.read.parquet(dirs["band_index_dir"]).collect())
    process_ingest_batch(b2, 1, **dirs)  # replay
    assert sorted(
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    ) == snap
    assert sorted(
        tuple(r) for r in spark.read.parquet(dirs["band_index_dir"]).collect()
    ) == band_snap


def test_ingest_batch_fails_loud_on_corrupt_index(spark, tmp_path):
    """A read error on a COMMITTED index partition must fail the micro-batch
    (so foreachBatch retries), not be swallowed as 'first batch: no index
    yet' — the r06 bare-except silently deduped against an empty index and
    admitted duplicates forever (advisor, medium)."""
    import pathlib

    import pytest

    from spark_signals.datapipe.streaming import process_ingest_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    dirs = dict(
        index_dir=str(tmp_path / "idx"), survivors_dir=str(tmp_path / "sur")
    )
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)
    process_ingest_batch(b1, 0, **dirs)
    # corrupt batch 0's committed index partition: truncate every footer
    part0 = pathlib.Path(dirs["index_dir"]) / "batch_id=0"
    corrupted = list(part0.glob("*.parquet"))
    assert corrupted, "expected committed parquet files to corrupt"
    for f in corrupted:
        f.write_bytes(b"PAR1 corrupted beyond recovery")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic|corrupt"):
        process_ingest_batch(b2, 1, **dirs)


def test_ingest_batch_zero_replay_ignores_own_partial_partition(spark, tmp_path):
    """A crash during batch 0's own index write can leave ONLY a partial
    batch_id=0 partition (uncommitted _temporary files, no parquet). The
    replay of batch 0 must still treat the index as empty — its own
    partition is excluded by path — and succeed."""
    import pathlib

    from spark_signals.datapipe.streaming import process_ingest_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    dirs = dict(
        index_dir=str(tmp_path / "idx"), survivors_dir=str(tmp_path / "sur")
    )
    # simulate the partial first-delivery write: directory exists, no data
    partial = pathlib.Path(dirs["index_dir"]) / "batch_id=0" / "_temporary"
    partial.mkdir(parents=True)
    process_ingest_batch(docs, 0, **dirs)
    assert spark.read.parquet(dirs["survivors_dir"]).count() > 0


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
