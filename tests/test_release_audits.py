"""Semantics of the r15 release-audit quartet: the filter-ablation CUBE
grid, dedup-aware token-yield accounting, the k-anonymity metadata gate,
and the MinHash calibration report. Cross-engine value parity is covered
by the --extended oracle sweep (INCOMING registry); these tests pin the
operator CONTRACTS on hand-built corpora where the right answer is
checkable by eye.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _long_en(i: int) -> str:
    # 30 words, stopword-rich and punctuation-free: passes every ablation
    # flag except the ones a test plants deliberately
    return ("the quick brown fox jumps over the lazy dog and then "
            f"it runs far away into the green fields of farm {i} "
            "while the sun is high and the wind is calm now")


# ------------------------------------------------------- filter ablation grid
def test_ablation_grand_total_and_marginals(spark):
    """The all-'all' cell is the corpus total, and y+n = all along every
    dimension (the CUBE arithmetic users rely on for what-if deltas)."""
    from spark_signals.datapipe.curate import filter_ablation

    rows = [(i, _long_en(i), "en", "src", 120) for i in range(8)]
    rows += [(100, "tiny", "en", "src", 4),          # f_short + f_lowq
             (101, _long_en(0), "en", "src", 120),   # exact dup of doc 0
             (102, _long_en(2), "de", "src", 120)]   # dup of doc 2 AND f_nonen
    out = {(
        r["f_dup"], r["f_short"], r["f_lowq"], r["f_nonen"]): r
        for r in filter_ablation(_docs(spark, rows)).collect()}
    total = out[("all", "all", "all", "all")]
    assert total["n_docs"] == len(rows)
    # y + n = all along the f_dup axis
    y = out[("y", "all", "all", "all")]
    n = out[("n", "all", "all", "all")]
    assert y["n_docs"] + n["n_docs"] == total["n_docs"]
    assert y["n_tokens"] + n["n_tokens"] == total["n_tokens"]
    assert y["n_dropped"] + n["n_dropped"] == total["n_dropped"]
    # the two planted duplicates (doc 101 dups 0, doc 102 dups 2)
    assert y["n_docs"] == 2
    # every doc in a y-cell of any dimension counts as dropped
    assert y["n_dropped"] == y["n_docs"]


def test_ablation_fully_specified_cells_isolate_overlap(spark):
    """A doc failing two filters lands in the (y, y) joint cell — the
    overlap mass relaxing ONE of the two would not recover."""
    from spark_signals.datapipe.curate import filter_ablation

    rows = [(i, _long_en(i), "en", "src", 120) for i in range(6)]
    rows += [(50, "kurz", "de", "src", 4)]  # short AND non-en (and low-q)
    grid = {(
        r["f_dup"], r["f_short"], r["f_lowq"], r["f_nonen"]): r["n_docs"]
        for r in filter_ablation(_docs(spark, rows)).collect()}
    assert grid[("n", "y", "y", "y")] == 1
    assert grid.get(("n", "y", "all", "all")) == 1
    assert grid[("n", "n", "n", "n")] == 6


def test_ablation_data_null_stays_out_of_all_marginals(spark):
    """Data-level NULLs must never masquerade as the aggregation NULL and
    bucket into 'all' marginals (r15 advisory). Two layers: NULL-text
    docs carry no digest, so they are OUT of the grid entirely (the
    dedup_exact join — 0 tokens, so no mass distortion); a doc with real
    text but NULL lang reaches the cube through the coalesced f_nonen
    flag and must land in a concrete 'y'/'n' cell, keeping y+n = all."""
    from spark_signals.datapipe.curate import filter_ablation

    rows = [(i, _long_en(i), "en", "src", 120) for i in range(4)]
    rows += [(90, None, "en", "src", 0),               # NULL text: out of grid
             (91, None, None, "src", 0),               # NULL text + NULL lang
             (92, _long_en(92), None, "src", 120)]     # real text, NULL lang
    out = {(
        r["f_dup"], r["f_short"], r["f_lowq"], r["f_nonen"]): r
        for r in filter_ablation(_docs(spark, rows)).collect()}
    total = out[("all", "all", "all", "all")]
    assert total["n_docs"] == 5  # 4 en docs + the NULL-lang doc; NULL text out
    # the NULL-lang doc is a concrete f_nonen='y' cell, not an 'all' leak
    assert out[("all", "all", "all", "y")]["n_docs"] == 1
    for ax in range(4):
        key = lambda v: tuple(v if i == ax else "all" for i in range(4))
        got = sum(out[key(v)]["n_docs"] for v in ("y", "n") if key(v) in out)
        assert got == total["n_docs"], f"axis {ax}: y+n != all with NULL data"


# --------------------------------------------------- dedup-aware token yield
def test_token_yield_reconciles_and_counts_epochs(spark):
    """raw = unique + dup per source, and a source that is one document
    repeated k times implies ~k epochs."""
    from spark_signals.datapipe.dedup import token_yield_report

    base = _long_en(7)
    rows = [(i, base, "en", "dup4", 120) for i in range(4)]          # 4 copies
    # genuinely dissimilar texts (template reuse would minhash-cluster them)
    uniq_texts = [
        "gravity bends light around massive clusters in deep space surveys",
        "the sourdough starter doubled overnight after the third rye feeding",
        "quarterly freight volumes rebounded across the northern rail corridor",
    ]
    rows += [(10 + i, t, "en", "uniq", 60) for i, t in enumerate(uniq_texts)]
    out = {r["source"]: r for r in token_yield_report(_docs(spark, rows)).collect()}
    for r in out.values():
        assert r["raw_tokens"] == r["unique_tokens"] + r["dup_tokens"]
        assert r["n_canonical"] <= r["n_docs"]
    d4 = out["dup4"]
    assert d4["n_canonical"] == 1
    assert d4["implied_epochs"] == 4.0
    assert d4["dup_tokens"] == 3 * d4["unique_tokens"]
    uq = out["uniq"]
    assert uq["n_canonical"] == 3
    assert uq["dup_tokens"] == 0
    assert uq["implied_epochs"] == 1.0


def test_token_yield_attributes_cluster_to_canonical_source(spark):
    """A source whose only doc canonicalizes into another source's cluster
    reports zero unique yield — the materialized corpus's truth."""
    from spark_signals.datapipe.dedup import token_yield_report

    base = _long_en(3)
    rows = [(1, base, "en", "first", 120), (2, base, "en", "second", 120)]
    out = {r["source"]: r for r in token_yield_report(_docs(spark, rows)).collect()}
    assert out["first"]["unique_tokens"] == out["first"]["raw_tokens"]
    assert out["second"]["unique_tokens"] == 0
    assert out["second"]["dup_token_frac"] == 1.0


# ------------------------------------------------------------- k-anonymity
def test_kanon_suppression_and_generalization(spark):
    """Groups below k suppress; adjacent fine bands pooled by the coarse
    band can clear k after one generalization step."""
    from spark_signals.datapipe.scrub import kanonymity_report

    # fine band = floor(n_chars/256): three docs at band 0, two at band 1
    # -> both fine groups < 5, but the coarse band (0) holds 5 -> recovered
    rows = [(i, "x", "en", "s", 10) for i in range(3)]
    rows += [(10 + i, "x", "en", "s", 300) for i in range(2)]
    # a big group that never suppresses: six docs in band 8 (coarse 2)
    rows += [(20 + i, "x", "en", "s", 2100) for i in range(6)]
    out = {r["band_fine"]: r for r in kanonymity_report(_docs(spark, rows)).collect()}
    assert out[0]["suppressed"] and out[1]["suppressed"]
    assert not out[0]["suppressed_after_generalization"]
    assert not out[1]["suppressed_after_generalization"]
    assert out[0]["n_docs_coarse"] == 5
    assert not out[8]["suppressed"]
    assert out[8]["risk"] == round(1 / 6, 6) or abs(out[8]["risk"] - 1 / 6) < 1e-6


def test_kanon_coarse_suppression_implies_fine(spark):
    """n_docs_coarse >= n_docs, so a group still suppressed after
    generalization must have been suppressed before — the remediation
    ladder is monotone (checked over the real synthetic corpus)."""
    from spark_signals.datapipe.scrub import kanonymity_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = kanonymity_report(docs)
    assert rep.filter(
        F.col("suppressed_after_generalization") & ~F.col("suppressed")
    ).count() == 0
    assert rep.filter(F.col("n_docs_coarse") < F.col("n_docs")).count() == 0
    # population conservation at the fine grain
    assert (
        rep.agg(F.sum("n_docs")).first()[0] == docs.count()
    )


# ------------------------------------------------ minhash calibration report
def test_minhash_calibration_top_bin_is_tight(spark):
    """Planted near-identical pairs land in the top exact-Jaccard bin and
    the 12-hash estimate tracks the exact value closely there."""
    from spark_signals.datapipe.dedup import minhash_calibration_report

    rows = []
    for i in range(6):
        base = _long_en(i)
        rows.append((2 * i, base, "en", "s", 120))
        rows.append((2 * i + 1, base + " extra", "en", "s", 125))
    out = {r["jaccard_bin"]: r for r in
           minhash_calibration_report(_docs(spark, rows)).collect()}
    top = max(out)
    assert top >= 8
    r = out[top]
    assert r["n_pairs"] >= 6
    assert 0.0 <= r["mean_est"] <= 1.0
    assert abs(r["mean_est"] - r["mean_exact"]) <= r["mean_abs_err"] + 1e-9
    assert r["mean_abs_err"] < 0.2


def test_minhash_calibration_is_partition_invariant(spark):
    """Integer-unit gridding before the bin means makes the report exact
    under any input partitioning."""
    from spark_signals.datapipe.dedup import minhash_calibration_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, minhash_calibration_report(docs).collect()))
    b = sorted(map(tuple, minhash_calibration_report(docs.repartition(13)).collect()))
    assert a == b


def test_minhash_calibration_band_sampling(spark):
    """sample_bands=NUM_BANDS is the identity; sample_bands=1 audits the
    first band's collision population — a subset of the full candidate
    set with the same per-pair arithmetic (bins present in the sampled
    report carry plausible means; pair counts never exceed the full
    report's)."""
    import pytest

    from spark_signals.datapipe.dedup import NUM_BANDS, minhash_calibration_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = sorted(map(tuple, minhash_calibration_report(docs).collect()))
    ident = sorted(
        map(tuple, minhash_calibration_report(docs, sample_bands=NUM_BANDS).collect())
    )
    assert full == ident
    sampled = {
        r["jaccard_bin"]: r
        for r in minhash_calibration_report(docs, sample_bands=1).collect()
    }
    full_by_bin = {r[0]: r for r in full}  # jaccard_bin is the first column
    assert sampled, "one-band sample must still see the planted near-dups"
    for b, r in sampled.items():
        assert b in full_by_bin
        assert 0 < r["n_pairs"] <= full_by_bin[b][1]  # n_pairs is column 2
        assert 0.0 <= r["mean_est"] <= 1.0
    with pytest.raises(ValueError):
        minhash_calibration_report(docs, sample_bands=0)
    with pytest.raises(ValueError):
        minhash_calibration_report(docs, sample_bands=NUM_BANDS + 1)


def test_minhash_calibration_sampled_path_matches_oracle(spark):
    """Cross-engine value parity for the SAMPLED calibration path (r15
    advisory): the DuckDB twin takes the same ``sample_bands`` knob, so
    the warehouse-scale posture gets the identical value-level check the
    full-band audit has — not just the subset property above."""
    import duckdb

    from spark_signals.datapipe.dedup import (
        NUM_BANDS,
        minhash_calibration_report,
        sql_minhash_calibration_report,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        map(tuple, minhash_calibration_report(docs, sample_bands=1).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(sql_minhash_calibration_report(sample_bands=1)).fetchall())
    )
    assert got == want
    # the default twin is unchanged (identity at full bands)
    assert sql_minhash_calibration_report() == sql_minhash_calibration_report(
        sample_bands=NUM_BANDS
    )


def test_kanon_incremental_chain_equals_global(spark):
    """Three batches chained through kanon_incremental reproduce the
    global report exactly — the additive-counts invariant the continuous
    gate rides on."""
    from spark_signals.datapipe.scrub import kanon_incremental, kanonymity_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batches = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    index = None
    report = None
    for b in batches:
        if index is None:
            empty = spark.createDataFrame(
                [], "lang string, source string, band_fine long, n_docs long"
            )
            report, delta = kanon_incremental(b, empty)
            index = delta
        else:
            report, delta = kanon_incremental(b, index)
            index = index.unionByName(delta).groupBy(
                "lang", "source", "band_fine"
            ).agg(F.sum("n_docs").alias("n_docs"))
    want = sorted(map(tuple, kanonymity_report(docs).collect()))
    got = sorted(map(tuple, report.collect()))
    assert got == want


def test_kanon_gate_stream_reports_and_replays_idempotently(spark, tmp_path):
    """The streaming gate: two availableNow drops issue corpus-wide
    verdicts whose latest partition equals the batch report over the
    union, and replaying a batch_id rewrites (not duplicates) its
    partitions."""
    import os

    from spark_signals.datapipe.scrub import kanonymity_report
    from spark_signals.datapipe.streaming import kanon_gate_stream, process_kanon_batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    batch_a = docs.filter(F.col("doc_id") <= mid)
    batch_b = docs.filter(F.col("doc_id") > mid)

    src = str(tmp_path / "ingest")
    counts_dir = str(tmp_path / "qi_counts")
    report_dir = str(tmp_path / "kanon_reports")
    ckpt = str(tmp_path / "ckpt")
    for batch in (batch_a, batch_b):
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = kanon_gate_stream(
            stream, counts_dir=counts_dir, report_dir=report_dir, checkpoint_dir=ckpt
        )
        q.awaitTermination()

    # the latest report partition is the corpus-wide verdict
    parts = sorted(
        int(p.split("=")[1])
        for p in os.listdir(report_dir)
        if p.startswith("batch_id=")
    )
    latest = spark.read.parquet(os.path.join(report_dir, f"batch_id={parts[-1]}"))
    want = sorted(map(tuple, kanonymity_report(docs).collect()))
    assert sorted(map(tuple, latest.collect())) == want
    # the serving-side reader picks the same (highest) partition
    from spark_signals.datapipe.streaming import read_latest_kanon_report

    served = read_latest_kanon_report(spark, report_dir)
    assert sorted(map(tuple, served.collect())) == want
    # replay the last batch_id: same report, same state — no duplication
    process_kanon_batch(
        batch_b, parts[-1], counts_dir=counts_dir, report_dir=report_dir
    )
    latest2 = spark.read.parquet(os.path.join(report_dir, f"batch_id={parts[-1]}"))
    assert sorted(map(tuple, latest2.collect())) == want
    state = spark.read.parquet(counts_dir)
    assert (
        state.groupBy("lang", "source", "band_fine")
        .agg(F.sum("n_docs").alias("n"))
        .agg(F.sum("n"))
        .first()[0]
        == docs.count()
    )


def test_kanon_gate_chains_on_non_default_qi_spec(spark, tmp_path):
    """The QI set is a parameter, not code (r15 verdict #5): chaining the
    gate under a rotated spec — source-only key, narrower bands, k=3 —
    reproduces the batch report over the union exactly, with the state
    schema derived from the spec. The (lang, source, char-band) default
    face stays the oracle-checked one."""
    import os

    from spark_signals.datapipe.scrub import QISpec, kanonymity_report
    from spark_signals.datapipe.streaming import (
        process_kanon_batch,
        read_latest_kanon_report,
    )

    spec = QISpec(key_cols=("source",), band_width=128, coarse_factor=2, k=3)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    counts_dir = str(tmp_path / "qi_counts")
    report_dir = str(tmp_path / "kanon_reports")
    for bid, batch in enumerate(
        (docs.filter(F.col("doc_id") <= mid), docs.filter(F.col("doc_id") > mid))
    ):
        process_kanon_batch(
            batch, bid, counts_dir=counts_dir, report_dir=report_dir, spec=spec
        )
    served = read_latest_kanon_report(spark, report_dir)
    assert set(served.columns) == {
        "source", "band_fine", "band_coarse", "n_docs", "n_docs_coarse",
        "suppressed", "suppressed_after_generalization", "risk",
    }
    want = sorted(map(tuple, kanonymity_report(docs, spec).collect()))
    assert sorted(map(tuple, served.collect())) == want
    # state partitions carry the spec-derived schema
    state = spark.read.parquet(os.path.join(counts_dir, "batch_id=0"))
    assert set(state.columns) == {"source", "band_fine", "n_docs"}


def test_kanon_batch_commits_report_before_delta(spark, tmp_path):
    """The release verdict (report) must COMMIT before the count-state
    delta (r15 advisory, closed r17): a crash between the two writes then
    leaves a current verdict whose state write simply re-runs on retry —
    never an advanced state serving a stale verdict. Pinned via the
    _SUCCESS markers' commit times."""
    import os

    from spark_signals.datapipe.streaming import process_kanon_batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts_dir = str(tmp_path / "qi_counts")
    report_dir = str(tmp_path / "kanon_reports")
    process_kanon_batch(docs, 0, counts_dir=counts_dir, report_dir=report_dir)
    rep = os.stat(os.path.join(report_dir, "batch_id=0", "_SUCCESS")).st_mtime_ns
    cnt = os.stat(os.path.join(counts_dir, "batch_id=0", "_SUCCESS")).st_mtime_ns
    assert rep < cnt


def test_kanon_serving_reader_skips_uncommitted_partition(spark, tmp_path):
    """A `batch_id=` directory lists from the writer's first task file,
    before `_SUCCESS` lands — the serving reader must fall back to the
    newest COMMITTED partition instead of serving a partial verdict
    (r15 verdict #1), and must refuse when nothing is committed."""
    import os
    import shutil

    import pytest

    from spark_signals.datapipe.streaming import (
        process_kanon_batch,
        read_latest_kanon_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts_dir = str(tmp_path / "qi_counts")
    report_dir = str(tmp_path / "kanon_reports")
    process_kanon_batch(docs, 0, counts_dir=counts_dir, report_dir=report_dir)
    committed = os.path.join(report_dir, "batch_id=0")
    assert os.path.exists(os.path.join(committed, "_SUCCESS"))
    want = sorted(map(tuple, spark.read.parquet(committed).collect()))

    # plant an in-flight batch_id=1 next to it: data files, no _SUCCESS
    partial = os.path.join(report_dir, "batch_id=1")
    shutil.copytree(committed, partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    served = read_latest_kanon_report(spark, report_dir)
    assert sorted(map(tuple, served.collect())) == want

    # nothing committed at all -> error, never a partial verdict
    os.remove(os.path.join(committed, "_SUCCESS"))
    with pytest.raises(FileNotFoundError, match="COMMITTED"):
        read_latest_kanon_report(spark, report_dir)


def test_kanon_batch_writes_verdict_before_state(spark, tmp_path):
    """Write ORDER pin, REVERSED at r17 (r16 verdict #7, superseding the
    r15-era delta-first pin): the report commits BEFORE the QI-count
    delta. Both writes are idempotent per-batch overwrites that re-run on
    foreachBatch retry, so the order only matters to a reader between a
    crash and the retry — and there the failure modes are asymmetric: a
    committed delta with a stale report keeps the gate releasing under an
    OUTDATED suppression verdict (the dangerous direction for a release
    gate), while a committed report whose state write re-runs on retry
    never serves anything older than the persisted state. Simulated by
    making the delta write fail (counts_dir path occupied by a plain
    file): the report partition must already be published."""
    import os

    import pytest

    from spark_signals.datapipe.streaming import process_kanon_batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts_dir = str(tmp_path / "qi_counts")
    report_dir = str(tmp_path / "kanon_reports")
    with open(counts_dir, "w", encoding="utf-8") as fh:
        fh.write("not a directory")
    with pytest.raises(Exception):
        process_kanon_batch(docs, 0, counts_dir=counts_dir, report_dir=report_dir)
    assert os.path.exists(os.path.join(report_dir, "batch_id=0", "_SUCCESS"))


# ------------------------------------- cross-source overlap / drift monitor
def test_source_overlap_matrix_finds_planted_mirror(spark):
    """A source that mirrors another's documents shows up as a heavy
    cross-source cell; unrelated sources contribute nothing."""
    from spark_signals.datapipe.dedup import source_overlap_matrix

    rows = [(i, _long_en(i), "en", "licensed", 120) for i in range(5)]
    rows += [(100 + i, _long_en(i) + " tail", "en", "crawl", 125) for i in range(5)]
    rows += [(200, "completely unrelated text about maritime law and tides",
              "en", "clean", 55)]
    out = {(r["source_lo"], r["source_hi"]): r
           for r in source_overlap_matrix(_docs(spark, rows)).collect()}
    cell = out[("crawl", "licensed")]
    assert cell["is_cross_source"]
    assert cell["n_pairs"] >= 5
    assert cell["mean_jaccard"] > 0.5
    assert not any("clean" in k for k in out)


def test_quality_drift_psi_zero_on_identical_and_positive_on_shift(spark):
    """Identical versions score (near-)zero total PSI; a version whose
    lengths double scores clearly positive."""
    from spark_signals.datapipe.versioning import quality_drift_psi

    rows = [(i, " ".join(["word"] * (8 + i % 16)), "en", "s", 80) for i in range(64)]
    base = _docs(spark, rows)
    same = sum(r["psi_contrib"] for r in quality_drift_psi(base, base).collect())
    assert abs(same) < 1e-9
    doubled = _docs(
        spark,
        [(i, " ".join(["word"] * (2 * (8 + i % 16))), "en", "s", 160) for i in range(64)],
    )
    shifted = sum(r["psi_contrib"] for r in quality_drift_psi(base, doubled).collect())
    assert shifted > 0.2
    # every band is present exactly once, shares sum to ~1 on each side
    rep = quality_drift_psi(base, doubled).collect()
    assert sorted(r["bin"] for r in rep) == list(range(10))
    assert abs(sum(r["share_old"] for r in rep) - 1.0) < 1e-6


def test_quality_drift_empty_versions_score_zero(spark):
    """The drift monitor's degenerate contract differs from the sweep's
    empty-yields-empty: output is ALWAYS the fixed band relation; with
    both versions empty the smoothed shares are uniform and PSI is 0."""
    from spark_signals.datapipe.versioning import quality_drift_psi

    empty = spark.createDataFrame([], DOC_SCHEMA)
    rep = quality_drift_psi(empty, empty).collect()
    assert len(rep) == 10
    assert all(r["psi_contrib"] == 0.0 for r in rep)
    assert all(r["n_old"] == 0 and r["n_new"] == 0 for r in rep)
