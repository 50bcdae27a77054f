"""Streaming lane of examples/curate_corpus.py — split from
test_example_pipeline.py so the three ~10-minute example tests shard
across verify-fast workers instead of serializing in one file."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

def test_example_streaming_lane_matches_batch_dedup(spark, tmp_path):
    """The streaming lane of the example (JSONL-as-stream →
    ingest_dedup_stream with the NEAR-dup band index on → batch curate
    over survivors) must admit exactly the documents the batch rule
    admits on the union of the drops: exact dedup, then the
    signature-level near-dup pass with empty history."""
    from curate_corpus import run_streaming_ingest

    from spark_signals.datapipe.dedup import dedup_exact, dedup_incremental_neardup

    out = str(tmp_path / "stream")
    counts = run_streaming_ingest(spark, "/root/testdata/sf0.001", out)
    assert counts["input_docs"] == 500

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact_ids = {
        r["canonical_doc_id"]
        for r in dedup_exact(docs).select("canonical_doc_id").distinct().collect()
    }
    empty_index = spark.createDataFrame(
        [], "band int, k1 long, k2 long, doc_id long"
    )
    empty_hist = spark.createDataFrame([], docs.schema)
    batch_survivors, _ = dedup_incremental_neardup(
        docs.filter(F.col("doc_id").isin(list(exact_ids))), empty_index, empty_hist
    )
    want_ids = {r["doc_id"] for r in batch_survivors.collect()}
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "ingest_survivors")).collect()
    }
    assert got_ids == want_ids
    assert len(want_ids) < len(exact_ids)  # the near-dup lane really bites
    assert counts["ingested_survivors"] == len(want_ids)
    assert counts["neardup_index_docs"] == len(want_ids)
    cur = spark.read.parquet(os.path.join(out, "stream_curation"))
    assert cur.count() == len(want_ids)
    assert 0 < counts["stream_kept_docs"] <= counts["ingested_survivors"]
    # the packing lane packed exactly the admitted documents, and the
    # accumulated streaming manifest equals the global pack over them
    # (the incremental lane's equivalence invariant, via the example)
    from spark_signals.datapipe.pack import pack_sequences

    assert counts["stream_packed_docs"] == len(want_ids)
    got_man = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "stream_pack_manifest"))
        .drop("batch_id")
        .collect()
    )
    survivors = spark.read.parquet(os.path.join(out, "ingest_survivors")).select(
        *docs.columns
    )
    assert got_man == sorted(tuple(r) for r in pack_sequences(survivors).collect())
    # the drift monitor compares drop-0 state against the accumulated
    # corpus: fixed PSI_BINS rows, shares in (0, 1], old counts bounded
    # by new counts (NEW is a superset of OLD by construction)
    from spark_signals.datapipe.versioning import PSI_BINS

    psi = spark.read.parquet(os.path.join(out, "quality_drift"))
    assert psi.count() == PSI_BINS
    assert {"bin", "n_old", "n_new", "share_old", "share_new",
            "psi_contrib"} == set(psi.columns)
    assert psi.filter(F.col("n_old") > F.col("n_new")).count() == 0
    assert psi.agg(F.sum("n_new")).first()[0] == counts["ingested_survivors"]
