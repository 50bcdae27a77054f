"""examples/retrieval_stack.py end-to-end — split from
test_example_pipeline.py so the three ~10-minute example tests shard
across verify-fast workers instead of serializing in one file."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

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
