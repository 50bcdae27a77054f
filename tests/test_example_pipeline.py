"""The examples/curate_corpus.py pipeline must run end-to-end and its
artifacts must be mutually consistent."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_example_pipeline_end_to_end(spark, tmp_path):
    from curate_corpus import run_pipeline

    out = str(tmp_path / "curated")
    counts = run_pipeline(spark, "/root/testdata/sf0.001", out)
    assert counts["input_docs"] == 500
    assert 0 < counts["sampled_docs"] <= counts["kept_docs"] < counts["input_docs"]
    assert counts["packed_docs"] == counts["sampled_docs"]

    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert shards.count() == counts["sampled_docs"]
    report = spark.read.parquet(os.path.join(out, "curation_report"))
    rep = {r["source"]: r for r in report.collect()}
    assert sum(r["n_docs"] for r in rep.values()) == counts["input_docs"]
    assert sum(r["n_kept"] for r in rep.values()) == counts["kept_docs"]
    mix = spark.read.parquet(os.path.join(out, "mixture_manifest"))
    assert mix.count() == shards.select("source").distinct().count()
    # token accounting: the tokenizer report and the packing manifest price
    # the same sampled corpus in the same whitespace currency
    tok = spark.read.parquet(os.path.join(out, "tokens_report"))
    assert 0 < counts["tokenized_docs"] <= counts["sampled_docs"]
    manifest = spark.read.parquet(os.path.join(out, "pack_manifest"))
    tok_total = tok.agg({"n_tokens": "sum"}).first()[0]
    pack_total = manifest.agg({"n_tokens": "sum"}).first()[0]
    assert tok_total == pack_total
    # balance diagnostic covers every sampled doc exactly once
    comp = spark.read.parquet(os.path.join(out, "cluster_composition"))
    assert comp.agg({"n_docs": "sum"}).first()[0] == counts["sampled_docs"]
    # trainer-facing schedule: every (epoch, source) cell priced, weights
    # normalized within each epoch
    sched = spark.read.parquet(os.path.join(out, "curriculum_schedule"))
    n_sources = shards.select("source").distinct().count()
    by_epoch = {
        r["epoch"]: r["w"]
        for r in sched.groupBy("epoch").agg(F.sum("weight").alias("w")).collect()
    }
    assert len(by_epoch) > 1 and len(sched.collect()) == len(by_epoch) * n_sources
    assert all(abs(w - 1.0) < 1e-4 for w in by_epoch.values())
    # read plan: one row per packed window, same window population as the
    # packing manifest implies
    order = spark.read.parquet(os.path.join(out, "window_order"))
    n_windows = (
        manifest.selectExpr("shard", "explode(sequence(first_window, last_window)) w")
        .where("n_tokens > 0")
        .select("shard", "w")
        .distinct()
        .count()
    )
    assert order.count() == n_windows


def test_example_streaming_lane_matches_batch_dedup(spark, tmp_path):
    """The streaming lane of the example (JSONL-as-stream →
    ingest_dedup_stream → batch curate over survivors) must admit exactly
    the documents batch exact-dedup admits on the union of the drops."""
    from curate_corpus import run_streaming_ingest

    from spark_signals.datapipe.dedup import dedup_exact

    out = str(tmp_path / "stream")
    counts = run_streaming_ingest(spark, "/root/testdata/sf0.001", out)
    assert counts["input_docs"] == 500

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want_ids = {
        r["canonical_doc_id"]
        for r in dedup_exact(docs).select("canonical_doc_id").distinct().collect()
    }
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "ingest_survivors")).collect()
    }
    assert got_ids == want_ids
    assert counts["ingested_survivors"] == len(want_ids)
    cur = spark.read.parquet(os.path.join(out, "stream_curation"))
    assert cur.count() == len(want_ids)
    assert 0 < counts["stream_kept_docs"] <= counts["ingested_survivors"]


def test_retrieval_stack_example_end_to_end(spark, tmp_path):
    """The second north-star example: index build + three serving paths run
    end-to-end, artifacts land on disk, and the hybrid results stay
    consistent with their lexical arm (every fused doc with a lex_rank
    appears in the BM25 table for that query)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from retrieval_stack import run_pipeline

    out = str(tmp_path / "retrieval")
    results = run_pipeline(spark, "/root/testdata/sf0.001", out)
    assert set(results) == {
        "ivf_centroids", "ann_chunk_neighbors", "bm25_results", "hybrid_results"
    }
    for name in results:
        assert os.path.isdir(os.path.join(out, name)), name
    bm25 = spark.read.parquet(os.path.join(out, "bm25_results"))
    hybrid = spark.read.parquet(os.path.join(out, "hybrid_results"))
    assert bm25.count() > 0 and hybrid.count() > 0
    lex_pairs = {(r["query_id"], r["doc_id"]) for r in bm25.collect()}
    for r in hybrid.collect():
        if r["lex_rank"] is not None:
            assert (r["query_id"], r["doc_id"]) in lex_pairs
    cents = spark.read.parquet(os.path.join(out, "ivf_centroids"))
    assert cents.select("cluster_id").distinct().count() > 1
