"""The r16-built provenance pair: the CONTINUOUS cross-source overlap
lane (incremental-equals-batch, replay idempotency, committed-only
serving) and the benchmark x source contamination drill-down. Cross-engine
value parity is covered by the --extended oracle sweep (INCOMING
registry); these tests pin the operator CONTRACTS on hand-built corpora
where the right answer is checkable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _long_en(i: int) -> str:
    return ("the quick brown fox jumps over the lazy dog and then "
            f"it runs far away into the green fields of farm {i} "
            "while the sun is high and the wind is calm now")


# ------------------------------------------- incremental overlap lane
def test_overlap_incremental_chain_equals_batch_matrix(spark):
    """Bootstrap + incremental step reproduce the batch matrix over the
    union EXACTLY — the additive-cells invariant the continuous audit
    rides (same shape as the k-anonymity chain test)."""
    from spark_signals.datapipe.dedup import (
        source_overlap_bootstrap,
        source_overlap_incremental,
        source_overlap_matrix,
    )

    # near-dup twins across sources (licensed <-> crawl) + clean noise
    rows = [(i, _long_en(i), "en", "licensed", 120) for i in range(6)]
    rows += [(100 + i, _long_en(i) + " tail", "en", "crawl", 125) for i in range(6)]
    rows += [(200 + i, f"unrelated maritime law text number {i} about tides "
              f"and harbors and pilotage fees in winter", "en", "clean", 80)
             for i in range(3)]
    docs = _docs(spark, rows)
    snapshot = docs.filter(F.col("doc_id") < 100)
    batch = docs.filter(F.col("doc_id") >= 100)
    cells, idx = source_overlap_bootstrap(snapshot)
    matrix, _cells, _delta = source_overlap_incremental(batch, idx, snapshot, cells)
    got = sorted(map(tuple, matrix.collect()))
    want = sorted(map(tuple, source_overlap_matrix(docs).collect()))
    assert got == want
    by_cell = {(r[0], r[1]): r for r in got}
    assert ("crawl", "licensed") in by_cell  # the cross-source mirror is seen
    # clean's templated docs may pair among THEMSELVES (diagonal), but no
    # cross-source cell touches it
    assert not any(
        "clean" in k and k[0] != k[1] for k in by_cell
    )


def test_overlap_stream_chains_replays_and_serves_committed_only(spark, tmp_path):
    """The streaming lane: two availableNow drops issue matrices whose
    latest partition equals the batch matrix over the union; replaying a
    batch_id rewrites (not double-counts) its additive deltas; the
    serving reader refuses uncommitted partitions."""
    import os
    import shutil

    import pytest

    from spark_signals.datapipe.dedup import source_overlap_matrix
    from spark_signals.datapipe.streaming import (
        overlap_audit_stream,
        process_overlap_batch,
        read_latest_overlap_matrix,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    src = str(tmp_path / "ingest")
    dirs = dict(
        docs_dir=str(tmp_path / "docs_state"),
        band_dir=str(tmp_path / "band_state"),
        cells_dir=str(tmp_path / "cell_state"),
        matrix_dir=str(tmp_path / "matrices"),
    )
    ckpt = str(tmp_path / "ckpt")
    for batch in (
        docs.filter(F.col("doc_id") <= mid),
        docs.filter(F.col("doc_id") > mid),
    ):
        batch.write.mode("append").parquet(src)
        q = overlap_audit_stream(
            spark.readStream.schema(docs.schema).parquet(src),
            checkpoint_dir=ckpt,
            **dirs,
        )
        q.awaitTermination()

    want = sorted(map(tuple, source_overlap_matrix(docs).collect()))
    served = read_latest_overlap_matrix(spark, dirs["matrix_dir"])
    assert sorted(map(tuple, served.collect())) == want

    # replay the last batch_id: identical matrix, no delta double-count
    parts = sorted(
        int(p.split("=")[1])
        for p in os.listdir(dirs["matrix_dir"])
        if p.startswith("batch_id=")
    )
    process_overlap_batch(docs.filter(F.col("doc_id") > mid), parts[-1], **dirs)
    again = read_latest_overlap_matrix(spark, dirs["matrix_dir"])
    assert sorted(map(tuple, again.collect())) == want

    # a planted in-flight partition (no _SUCCESS) must not be served
    committed = os.path.join(dirs["matrix_dir"], f"batch_id={parts[-1]}")
    partial = os.path.join(dirs["matrix_dir"], f"batch_id={parts[-1] + 1}")
    shutil.copytree(committed, partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    still = read_latest_overlap_matrix(spark, dirs["matrix_dir"])
    assert sorted(map(tuple, still.collect())) == want
    for p in (partial, committed):
        succ = os.path.join(p, "_SUCCESS")
        if os.path.exists(succ):
            os.remove(succ)
    # earlier committed partitions still serve after the newest two lose
    # their markers only if one remains committed; with ALL uncommitted
    # the reader refuses rather than serving a partial matrix
    for p in sorted(os.listdir(dirs["matrix_dir"])):
        succ = os.path.join(dirs["matrix_dir"], p, "_SUCCESS")
        if os.path.exists(succ):
            os.remove(succ)
    with pytest.raises(FileNotFoundError, match="COMMITTED"):
        read_latest_overlap_matrix(spark, dirs["matrix_dir"])


# ------------------------------------- benchmark x source contamination
def test_decontam_source_matrix_localizes_planted_contamination(spark):
    """A dirty source carrying benchmark text shows up as exactly its
    (bench, source) cell; clean sources contribute no cell at all."""
    from spark_signals.datapipe.decontam import decontam_source_matrix

    bench_text = ("what is the integral of x squared from zero to one "
                  "answer one third by the power rule evaluated at the bounds")
    rows = [(900 + i, bench_text + f" variant {i}", "en", "bench1", 100)
            for i in range(2)]
    rows += [(i, bench_text + f" variant {i} copied into the crawl", "en",
              "dirty", 110) for i in range(2)]
    rows += [(100 + i, _long_en(i), "en", "clean", 120) for i in range(4)]
    docs = _docs(spark, rows)
    benchmarks = docs.filter(F.col("source") == "bench1").select(
        "doc_id", "text", F.lit("bench1").alias("bench")
    )
    train = docs.filter(F.col("source") != "bench1")
    out = {(r["bench"], r["source"]): r
           for r in decontam_source_matrix(train, benchmarks).collect()}
    assert set(out) == {("bench1", "dirty")}
    cell = out[("bench1", "dirty")]
    assert cell["n_contaminated_docs"] == 2
    assert cell["n_source_docs"] == 2
    assert cell["source_rate"] == 1.0
    assert cell["n_overlap_pairs"] >= cell["n_contaminated_docs"]


def test_decontam_source_matrix_cells_sum_to_report_totals(spark):
    """The drill-down is CONSISTENT with the checked per-benchmark report:
    summing a bench's cells over sources reproduces decontam_report's
    n_contaminated_train_docs and n_overlap_pairs exactly."""
    from spark_signals.datapipe.decontam import (
        decontam_report_snapshot,
        decontam_source_matrix_snapshot,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cells = decontam_source_matrix_snapshot(docs)
    got = {
        r["bench"]: (r["docs"], r["pairs"])
        for r in cells.groupBy("bench")
        .agg(
            F.sum("n_contaminated_docs").alias("docs"),
            F.sum("n_overlap_pairs").alias("pairs"),
        )
        .collect()
    }
    report = {
        r["bench"]: (r["n_contaminated_train_docs"], r["n_overlap_pairs"])
        for r in decontam_report_snapshot(docs).collect()
        if r["n_contaminated_train_docs"] > 0
    }
    assert got == report
    assert got, "sf0.001 plants real contamination — totals must be non-zero"
