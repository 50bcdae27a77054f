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
    blocks_before = len(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    counts = run_pipeline(spark, "/root/testdata/sf0.001", out, leak_check=True)
    # r12 ADVICE #2: the stage-boundary localCheckpoints must not leak —
    # repeated runs in a long-lived session would otherwise accumulate
    # block-manager storage until JVM GC happens to collect the frames
    blocks_after = len(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert blocks_after <= blocks_before
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
    # split-then-verify: every sampled doc gets exactly one split, and the
    # leakage report over the published cluster-grain splits contains NO
    # cross-split class — the zero-leak invariant the stage exists to prove
    splits = spark.read.parquet(os.path.join(out, "splits"))
    assert splits.count() == counts["sampled_docs"]
    assert splits.select("doc_id").distinct().count() == counts["sampled_docs"]
    assert set(
        r["split"] for r in splits.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    leak = spark.read.parquet(os.path.join(out, "leakage_report"))
    assert leak.filter(F.col("is_cross_split")).count() == 0
    # the curated corpus reaching this stage ALREADY passed the dedup
    # gates, so the expected report here is empty (no detected near-dup
    # pairs at all — stronger than "no cross-split pairs"); detection
    # non-vacuity on a corpus WITH planted twins is pinned separately in
    # tests/test_split_leakage.py. The artifact must still be readable
    # with the report schema.
    assert {"split_lo", "split_hi", "is_cross_split", "n_pairs"} <= set(leak.columns)
    # release audits: token yield covers the whole raw input and its
    # accounting closes (raw = unique + dup per source); the ablation
    # grid's grand-total cell prices the same input; the k-anonymity gate
    # covers every released doc at the fine QI grain
    ty = spark.read.parquet(os.path.join(out, "token_yield"))
    assert ty.agg({"n_docs": "sum"}).first()[0] == counts["input_docs"]
    assert ty.filter(
        F.col("raw_tokens") != F.col("unique_tokens") + F.col("dup_tokens")
    ).count() == 0
    grid = spark.read.parquet(os.path.join(out, "filter_ablation"))
    grand = grid.filter(
        (F.col("f_dup") == "all") & (F.col("f_short") == "all")
        & (F.col("f_lowq") == "all") & (F.col("f_nonen") == "all")
    ).first()
    assert grand["n_docs"] == counts["input_docs"]
    kan = spark.read.parquet(os.path.join(out, "kanon_report"))
    assert kan.agg({"n_docs": "sum"}).first()[0] == counts["sampled_docs"]
    # provenance audit: the overlap matrix rides the SAME pinned pair
    # relation as the yield report; its cells are well-formed and its
    # within-source duplication is consistent with the yield report
    # finding duplicate mass (the sf0.001 corpus plants near-dups)
    ov = spark.read.parquet(os.path.join(out, "source_overlap"))
    assert {"source_lo", "source_hi", "n_pairs", "is_cross_source",
            "mean_jaccard"} == set(ov.columns)
    assert ov.filter(F.col("n_pairs") <= 0).count() == 0
    assert ov.filter(
        (F.col("mean_jaccard") < 0) | (F.col("mean_jaccard") > 1)
    ).count() == 0
    has_dup_mass = ty.filter(F.col("dup_tokens") > 0).count() > 0
    assert (ov.count() > 0) == has_dup_mass
