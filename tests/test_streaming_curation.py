"""Streaming curation, shard A: batch operators running UNCHANGED on a
readStream, redelivery dedup, and the ingest lane's replay/corruption
contracts. Shard B (test_streaming_curation_b.py) carries the windowed/
monitoring/near-dup/packing lanes; helpers in _streaming_curation_common."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_signals.datapipe.scrub import pii_scrub
from spark_signals.datapipe.streaming import dedup_docs_stream
from spark_signals.datapipe.text import text_stats, unigram_lm_quality

from tests._streaming_curation_common import DOC_SCHEMA, SF, drain as _drain, rows as _rows

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
