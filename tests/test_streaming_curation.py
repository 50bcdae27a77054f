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

    for op in (pii_scrub, text_stats):
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
