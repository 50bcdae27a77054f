"""Exact duplicated-span dedup, shard B: span provenance (attrib), the
incremental + streaming span lanes, contamination span
localization/scrub, the hygiene opt-in, the bucketed index probe, the
random-corpus invariant fuzz, and the plan pin. Shard A
(tests/test_span_dedup.py) covers the reporter + strip faces; shared
fixtures live in tests/_span_common.py."""

from __future__ import annotations

import duckdb
import pandas as pd

from spark_signals.datapipe import dedup as D
from tests._span_common import (
    DOC_SCHEMA,
    K,
    SHARED,
    UNIQ_A,
    UNIQ_B,
    _assert_cross_engine,
    _attrib,
    _docs,
    _duck_on,
    _rows_set,
    _run,
    _spans,
    _strip,
)

def test_attrib_reports_exact_partner_sets(spark):
    """Three docs sharing one run: each span names the other two; a
    within-doc-only repeat has NO partners (empty string, the oracle's
    array_to_string([]) contract)."""
    p = _run(f"x{i}" for i in range(K))
    filler = _run(f"f{i}" for i in range(K + 2))
    rows = [
        f"{SHARED} {UNIQ_A}",
        f"{UNIQ_B} {SHARED}",
        f"{SHARED}",
        f"{p} {filler} {p}",  # doc3: repeats only itself
    ]
    at = _attrib(spark, rows)
    assert at[0] == [(0, K + 3, 3, "1,2", 2)]
    assert at[1] == [(10, 10 + K + 3, 3, "0,2", 2)]
    assert at[2] == [(0, K + 3, 3, "0,1", 2)]
    assert at[3] == [(0, K - 1, 2, "", 0), (2 * K + 2, 3 * K + 1, 2, "", 0)]


def test_attrib_hot_digest_cap_keeps_earliest_partners(spark):
    """A run shared by MORE docs than the cap: per-digest state is bounded
    at the cap globally-smallest occurrence keys, so later docs report
    exactly the cap earliest docs and early docs report cap-1 (self
    excluded); max_window_occ still counts ALL occurrences."""
    rows = [f"{SHARED} " + _run(f"u{i}_{j}" for i in range(4)) for j in range(6)]
    at = _attrib(spark, rows, cap=3)
    n = 6
    for j in range(n):
        spans = at[j]
        assert len(spans) == 1
        start, end, occ, partners, np_ = spans[0]
        assert (start, end) == (0, K + 3)
        assert occ == n  # count is corpus-wide, never capped
        if j <= 2:  # among the 3 earliest copies: the other 2 earliest
            assert partners == ",".join(str(d) for d in range(3) if d != j)
            assert np_ == 2
        else:  # later copies see the 3 earliest
            assert partners == "0,1,2" and np_ == 3


def test_attrib_cross_engine(spark):
    rows = [
        f"{SHARED} {UNIQ_A}",
        f"{UNIQ_B} {SHARED}",
        SHARED.upper(),
        _run(f"m{i}" for i in range(K)),
        f"\x01 {SHARED}",
    ]
    cols = [
        "doc_id", "span_start", "span_end", "n_windows", "max_window_occ",
        "partner_docs", "n_partners",
    ]
    a = (
        D.dedup_exact_spans_attrib(_docs(spark, rows))
        .toPandas()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    b = (
        _duck_on(rows)
        .execute(D.sql_dedup_exact_spans_attrib())
        .fetchdf()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert a["n_partners"].max() >= 3
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_attrib_geometry_matches_reporter(spark):
    """Attribution must never change the geometry: (doc_id, span_start,
    span_end, n_windows) equals dedup_exact_spans exactly on testdata."""
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    geo = ["doc_id", "span_start", "span_end", "n_windows"]
    a = sorted(map(tuple, D.dedup_exact_spans_attrib(docs).select(geo).collect()))
    b = sorted(map(tuple, D.dedup_exact_spans(docs).select(geo).collect()))
    assert a == b and len(a) > 0


# -------------------------------------------------------- incremental lane


def test_incremental_batches_match_global_strip(spark):
    """The lane's equivalence invariant, composed over sequential batches:
    each batch's output equals the global strip over (history ∪ batch)
    restricted to the batch's doc_ids, and the first delta reproduces
    span_index exactly."""
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    cut = 40  # two batches: [0, 40) then [40, ...)
    b1 = docs.filter(f"doc_id < {cut}")
    b2 = docs.filter(f"doc_id >= {cut}")
    empty_idx = spark.createDataFrame([], "digest string, min_key long")
    out1, d1 = D.dedup_spans_incremental(b1, empty_idx)
    out2, d2 = D.dedup_spans_incremental(b2, empty_idx.unionByName(d1))
    assert _rows_set(out1) == _rows_set(D.dedup_exact_spans_strip(b1))
    ref2 = D.dedup_exact_spans_strip(docs).filter(f"doc_id >= {cut}")
    assert _rows_set(out2) == _rows_set(ref2)
    assert _rows_set(d1) == _rows_set(D.span_index(b1))
    assert len(d2.columns) == 2


def test_incremental_cannot_retro_keep_cut_island(spark):
    """The documented asymmetry of the island-merge policy: a FUTURE
    duplicate of a window adjacent to an already-cut island would, in a
    full recompute, merge into a kept island — the lane (correctly, at
    batch time) already cut it. Pins that the divergence is exactly the
    already-admitted caveat, not a silent bug."""
    w1 = _run(f"v{i}" for i in range(K))   # later duplicated by doc2 only
    w2 = _run(f"y{i}" for i in range(K))   # canonical in doc0
    rows = [w2, f"{w1} {w2}", w1]
    docs = _docs(spark, rows)
    b1 = docs.filter("doc_id < 2")
    empty_idx = spark.createDataFrame([], "digest string, min_key long")
    out1, _d1 = D.dedup_spans_incremental(b1, empty_idx)
    r1 = {r["doc_id"]: r for r in out1.collect()}[1]
    # at batch-1 time w1 is unique → doc1 cuts exactly the w2 island
    assert r1["text_dedup"] == w1 and r1["n_cut_spans"] == 1
    # the full recompute instead merges [w1 w2] into one KEPT island
    g1 = {r["doc_id"]: r for r in D.dedup_exact_spans_strip(docs).collect()}[1]
    assert g1["was_modified"] is False


def test_incremental_replay_is_idempotent(spark):
    """Re-running an admitted batch against the updated index emits
    identical rows and an empty delta."""
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    hist = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    idx = D.span_index(hist)
    out1, d1 = D.dedup_spans_incremental(batch, idx)
    out2, d2 = D.dedup_spans_incremental(batch, idx.unionByName(d1))
    assert _rows_set(out1) == _rows_set(out2)
    assert d2.count() == 0


def test_incremental_out_of_order_batch_is_exact_vs_seen(spark):
    """A batch whose doc_ids PRECEDE history keys still matches the global
    strip over (history ∪ batch) restricted to the batch — least() makes
    the batch's earlier occurrence the canonical one."""
    p = _run(f"o{i}" for i in range(K))
    rows = [f"{p} {UNIQ_A}", f"{UNIQ_B} {p}"]
    docs = _docs(spark, rows)
    hist = docs.filter("doc_id = 1")  # the LATER doc is history
    batch = docs.filter("doc_id = 0")
    out, _ = D.dedup_spans_incremental(batch, D.span_index(hist))
    ref = D.dedup_exact_spans_strip(docs).filter("doc_id = 0")
    assert _rows_set(out) == _rows_set(ref)
    # the batch doc holds the earlier key: its occurrence is canonical
    assert out.collect()[0]["was_modified"] is False


def test_incr_snapshot_face_cross_engine(spark):
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    cols = ["doc_id", "text_dedup", "n_words", "n_cut_words", "n_cut_spans",
            "was_modified"]
    a = (
        D.dedup_spans_incr_snapshot(docs)
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        con.execute(D.sql_dedup_spans_incr_snapshot())
        .fetchdf()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---------------------------------------------------------- streaming lane
def test_span_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """process_span_ingest_batch: the batch-id-partition overwrite makes a
    foreachBatch replay byte-identical, and cross-batch cuts happen
    through the persisted index partitions alone."""
    from spark_signals.datapipe.streaming import process_span_ingest_batch

    rows1 = [f"{SHARED} {UNIQ_A}", _run(f"d{i}" for i in range(K))]
    rows2 = [f"{UNIQ_B} {SHARED}"]  # doc 2: SHARED cut vs history
    b1 = _docs(spark, rows1)
    b2 = spark.createDataFrame(
        [(2, rows2[0], "en", "src", len(rows2[0]))], DOC_SCHEMA
    )
    dirs = dict(
        span_index_dir=str(tmp_path / "span_idx"),
        stripped_dir=str(tmp_path / "stripped"),
    )
    process_span_ingest_batch(b1, 0, **dirs)
    process_span_ingest_batch(b2, 1, **dirs)
    out = {
        r["doc_id"]: r
        for r in spark.read.parquet(dirs["stripped_dir"]).collect()
    }
    assert out[0]["was_modified"] is False  # canonical occurrence kept
    assert out[2]["text_dedup"] == UNIQ_B  # cut via persisted index only
    snap = sorted(
        tuple(r) for r in spark.read.parquet(dirs["stripped_dir"]).collect()
    )
    idx_snap = sorted(
        tuple(r) for r in spark.read.parquet(dirs["span_index_dir"]).collect()
    )
    process_span_ingest_batch(b2, 1, **dirs)  # replay last batch
    assert sorted(
        tuple(r) for r in spark.read.parquet(dirs["stripped_dir"]).collect()
    ) == snap
    assert sorted(
        tuple(r) for r in spark.read.parquet(dirs["span_index_dir"]).collect()
    ) == idx_snap


def test_span_stream_matches_sequential_batches(spark, tmp_path):
    """Stream-vs-batch equivalence: two availableNow drops through
    ingest_spans_stream produce exactly the rows of running
    dedup_spans_incremental sequentially in batch."""
    from spark_signals.datapipe import dedup as DD
    from spark_signals.datapipe.streaming import ingest_spans_stream

    rows1 = [f"{SHARED} {UNIQ_A}", _run(f"e{i}" for i in range(K))]
    b1 = _docs(spark, rows1)
    t2 = f"{UNIQ_B} {SHARED}"
    b2 = spark.createDataFrame([(2, t2, "en", "src", len(t2))], DOC_SCHEMA)
    src = str(tmp_path / "drops")
    dirs = dict(
        span_index_dir=str(tmp_path / "span_idx"),
        stripped_dir=str(tmp_path / "stripped"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    for batch in (b1, b2):
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        q = ingest_spans_stream(stream, **dirs)
        q.awaitTermination()
    got = _rows_set(spark.read.parquet(dirs["stripped_dir"]).drop("batch_id"))
    empty_idx = spark.createDataFrame([], "digest string, min_key long")
    s1, d1 = DD.dedup_spans_incremental(b1, empty_idx)
    s2, _ = DD.dedup_spans_incremental(b2, empty_idx.unionByName(d1))
    assert got == _rows_set(s1) | _rows_set(s2)
    assert len(got) == 3


# --------------------------------------------- contamination localization
def test_decontam_spans_localizes_benchmark_collisions(spark):
    """decontam_spans reports exactly WHERE a training doc collides with
    the eval subset: planted benchmark runs localize to their word
    positions, train-side-only duplicates never flag, and two gapped
    collisions stay separate spans."""
    from spark_signals.datapipe import decontam as DC

    n = DC.DECONTAM_NGRAM
    bench = _run(f"q{i}" for i in range(n + 2))  # 7-word benchmark passage
    other = _run(f"r{i}" for i in range(n))
    gap = _run(f"g{i}" for i in range(n + 1))  # > n gap keeps spans apart
    trainshared = _run(f"t{i}" for i in range(n))  # dup among train only
    rows = [
        # doc0: the benchmark (source flips to the eval source below)
        f"{bench} {other}",
        # doc1: bench passage at word 3, then gap, then the other eval run
        f"x0 x1 x2 {bench} {gap} {other}",
        # doc2/doc3: train-side duplicate — must NOT flag
        f"{trainshared} y0 y1",
        f"z0 {trainshared}",
    ]
    docs = spark.createDataFrame(
        [
            (
                i,
                t,
                "en",
                DC.EVAL_SOURCE if i == 0 else "train",
                len(t),
            )
            for i, t in enumerate(rows)
        ],
        DOC_SCHEMA,
    )
    out = {}
    for r in DC.decontam_spans(docs).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_words"])
        )
    # doc1: bench run covers words [3, 3+n+1]; the trailing `other` run
    # starts after the gap at 3+(n+2)+(n+1) and covers n words
    o_start = 3 + (n + 2) + (n + 1)
    assert sorted(out[1]) == [
        (3, 3 + n + 1, n + 2),
        (o_start, o_start + n - 1, n),
    ]
    assert 2 not in out and 3 not in out  # train-train dup is dedup's job
    assert 0 not in out  # the eval doc itself is never reported


def test_decontam_scrub_cuts_only_benchmark_spans(spark):
    """decontam_scrub applies the work-order: the planted benchmark run is
    cut from the training page (original case preserved in the
    remainder), train-side duplicates survive untouched, and the eval doc
    never appears in the output."""
    from spark_signals.datapipe import decontam as DC

    n = DC.DECONTAM_NGRAM
    bench = _run(f"q{i}" for i in range(n))
    keep = " ".join(f"K{i}" for i in range(3))  # uppercase, must survive
    rows = [bench, f"{keep} {bench}", f"{keep} nothing shared here at all"]
    docs = spark.createDataFrame(
        [
            (i, t, "en", DC.EVAL_SOURCE if i == 0 else "train", len(t))
            for i, t in enumerate(rows)
        ],
        DOC_SCHEMA,
    )
    out = {r["doc_id"]: r for r in DC.decontam_scrub(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text_dedup"] == keep and out[1]["n_cut_words"] == n
    assert out[2]["text_dedup"] == rows[2] and not out[2]["was_modified"]


def test_decontam_spans_cross_engine(spark):
    from spark_signals.datapipe import decontam as DC
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet')"
    )
    cols = ["doc_id", "span_start", "span_end", "span_words", "n_windows"]
    a = (
        DC.decontam_spans(docs)
        .toPandas()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    b = (
        con.execute(DC.sql_decontam_spans())
        .fetchdf()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------ curate example opt-in
def test_hygiene_span_strip_opt_in(spark):
    """examples/curate_corpus._hygiene(span_strip=True) appends the
    cross-document span cut; the default path is byte-identical to before
    (the pinned artifact lineage must not move)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples")
    )
    from curate_corpus import _hygiene

    rows = [f"{SHARED} {UNIQ_A}", f"{UNIQ_B} {SHARED}"]
    docs = _docs(spark, rows)
    base = {r["doc_id"]: r["text"] for r in _hygiene(docs).collect()}
    # 2 occurrences < strip_boilerplate's min_occ, no intra-page repeats:
    # default hygiene leaves the shared run in BOTH pages
    assert base[0] == rows[0] and base[1] == rows[1]
    cut = {
        r["doc_id"]: r["text"]
        for r in _hygiene(docs, span_strip=True).collect()
    }
    assert cut[0] == rows[0]  # first occurrence kept
    assert cut[1] == UNIQ_B  # syndicated run cut from the later page


def test_bucketed_span_index_probe_shuffles_batch_side_only(spark, tmp_path):
    """span_index's warehouse layout claim, proven on the plan: with the
    index written digest-bucketed (io.sinks.write_bucketed), the probe
    join plans exactly ONE hash exchange — the batch side — while the
    index scans shuffle-free."""
    from spark_signals.datapipe.dedup import _span_wins
    from spark_signals.io.sources import read_table
    from spark_signals.io.sinks import write_bucketed

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    write_bucketed(
        D.span_index(docs),
        "bkt_span_idx",
        str(tmp_path / "bkt_span_idx"),
        key="digest",
        buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = _span_wins(docs, K).join(spark.table("bkt_span_idx"), "digest")
        p = probe._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange hashpartitioning") == 1, p
        assert "SortMergeJoin" in p
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_span_idx")


# ------------------------------------------------------ random invariants
def test_random_corpora_hold_span_invariants(spark):
    """Randomized semantic contract at k=4 over a 4-word alphabet (dense
    collisions): (a) token conservation — stripped token count equals
    n_words - n_cut_words; (b) keep-one — every duplicated k-gram of the
    original corpus survives verbatim in some stripped text; (c) reporter
    spans are per-doc disjoint, >= k words, and length-consistent."""
    import random

    k = 4
    alphabet = ["aa", "bb", "cc", "dd"]
    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            " ".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
            for _ in range(30)
        ]
        docs = _docs(spark, rows)
        stripped = {
            r["doc_id"]: r
            for r in D.dedup_exact_spans_strip(docs, k=k).collect()
        }
        # (a) token conservation
        for i, t in enumerate(rows):
            r = stripped[i]
            assert len(r["text_dedup"].split()) == r["n_words"] - r["n_cut_words"]
        # (b) keep-one: every duplicated k-gram survives somewhere
        grams: dict[str, int] = {}
        for t in rows:
            ws = t.split()
            for p in range(len(ws) - k + 1):
                g = " ".join(ws[p : p + k])
                grams[g] = grams.get(g, 0) + 1
        kept_texts = [r["text_dedup"] for r in stripped.values()]
        for g, n in grams.items():
            if n >= 2:
                assert any(
                    g in " ".join(t.split()) for t in kept_texts
                ), f"seed {seed}: duplicated gram lost: {g!r}"
        # (c) reporter span geometry
        spans: dict[int, list] = {}
        for r in D.dedup_exact_spans(docs, k=k).collect():
            assert r["span_words"] == r["span_end"] - r["span_start"] + 1 >= k
            spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        for ivs in spans.values():
            ivs.sort()
            for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
                assert s2 > e1 + 1, "spans overlap or touch — not maximal"


def test_plan_stays_jvm_side(spark):
    docs = _docs(spark, [f"{SHARED} {UNIQ_A}", f"{UNIQ_B} {SHARED}"])
    rep = D.dedup_exact_spans(docs)._jdf.queryExecution().executedPlan().toString()
    strip = (
        D.dedup_exact_spans_strip(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    attrib = (
        D.dedup_exact_spans_attrib(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan, tag in ((rep, "reporter"), (strip, "strip"), (attrib, "attrib")):
        for bad in ("EvalPython", "FlatMapGroupsInPandas", "CartesianProduct",
                    "BroadcastNestedLoopJoin"):
            assert bad not in plan, f"{bad} leaked into the span {tag} plan"
    # shuffle budget (the linear shape's signature): digest agg + digest
    # join side + doc-keyed island window = 3 for the reporter; the strip
    # adds the cut-interval agg and the rebuild join. An extra exchange
    # here means a lost partial agg or a join that stopped co-locating.
    assert rep.count("Exchange hashpartitioning") <= 3, rep
    assert strip.count("Exchange hashpartitioning") <= 5, strip
    # attrib consumes the PINNED dup-window subset: its visible plan is
    # the occurrence-cap window + two digest joins + the island window
    # over a leaf scan — the corpus-sized sort the first draft had must
    # never reappear (SCALE.md r13: 213-385 s -> 35 s)
    assert attrib.count("Exchange hashpartitioning") <= 5, attrib
