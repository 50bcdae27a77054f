"""Shared fixtures/helpers for the streaming-curation shard pair
(test_streaming_curation.py / test_streaming_curation_b.py — split per
the span-dedup shard precedent: the single file was the verify-fast
critical path at ~420 s solo, r15 verdict #7)."""

from __future__ import annotations

import uuid

SF = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def drain(df, spark, mode="append"):
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


def rows(df, key="doc_id"):
    return sorted([tuple(r) for r in df.collect()])
