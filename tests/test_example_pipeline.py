"""The examples/curate_corpus.py pipeline must run end-to-end and its
artifacts must be mutually consistent."""

from __future__ import annotations

import os
import sys

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
