"""Exact duplicated-span dedup (dedup_exact_spans), shard A: the
reporter + strip faces — the Lee-et-al.-2022 ExactSubstr pass at word
grain (overlapping k-gram digests merged into maximal islands).

The driver's sf0.01 run exercises the operator on the synthetic corpus
(non-vacuous: ~1.7k duplicated 16-gram windows across 45 docs); the
semantic evidence — spans start/end exactly where the planted repetition
does, adjacent windows merge, gapped repeats don't — comes from the
crafted fixtures here, each mirrored through the DuckDB oracle SQL.
Shard B (tests/test_span_dedup_b.py) covers attribution, the
incremental/streaming lanes, decontam spans, and the invariant fuzz.
"""

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
    _assert_strip_cross_engine,
    _docs,
    _duck_on,
    _run,
    _spans,
    _strip,
)

def test_planted_shared_run_reports_exact_bounds(spark):
    rows = [
        f"{SHARED} {UNIQ_A}",  # doc0: span at words [0, K+3]
        f"{UNIQ_B} {SHARED}",  # doc1: span at words [10, 10+K+3]
        _run(f"c{i}" for i in range(2 * K)),  # doc2: unique, no rows
    ]
    spans = _spans(spark, rows)
    # 20-word shared run = 5 overlapping 16-windows, one merged span each
    assert spans[0] == [(0, K + 3, K + 4, 5)]
    assert spans[1] == [(10, 10 + K + 3, K + 4, 5)]
    assert 2 not in spans


def test_within_doc_repeat_yields_two_spans(spark):
    p = _run(f"x{i}" for i in range(K))
    filler = _run(f"f{i}" for i in range(K + 2))
    spans = _spans(spark, [f"{p} {filler} {p}"])
    # occurrences at word 0 and word 2K+2; gap > K keeps them separate
    assert spans[0] == [(0, K - 1, K, 1), (2 * K + 2, 3 * K + 1, K, 1)]


def test_adjacent_windows_merge_gapped_do_not(spark):
    p1 = _run(f"p{i}" for i in range(K))
    p2 = _run(f"q{i}" for i in range(K))
    filler = _run(f"g{i}" for i in range(K))
    rows = [f"{p1} {p2}", f"{p1} {filler} {p2}"]
    spans = _spans(spark, rows)
    # doc0: dup windows at 0 and K (the boundary windows are unique to
    # doc0) — coverage touches, ONE maximal span over both runs
    assert spans[0] == [(0, 2 * K - 1, 2 * K, 2)]
    # doc1: same two digests but a K-word gap between them — two spans
    assert spans[1] == [(0, K - 1, K, 1), (2 * K, 3 * K - 1, K, 1)]


def test_corpus_token_rule_ascii_case_insensitive(spark):
    spans = _spans(spark, [f"{SHARED} {UNIQ_A}", SHARED.upper()])
    assert spans[0] == [(0, K + 3, K + 4, 5)]
    assert spans[1] == [(0, K + 3, K + 4, 5)]


def test_short_docs_and_exact_k_boundary(spark):
    p = _run(f"z{i}" for i in range(K))
    short = _run(f"u{i}" for i in range(K - 1))  # below the window size
    spans = _spans(spark, [p, p, short, short])
    # exactly-K docs produce exactly one window each; short docs none
    assert spans[0] == [(0, K - 1, K, 1)]
    assert spans[1] == [(0, K - 1, K, 1)]
    assert 2 not in spans and 3 not in spans






def test_cross_engine_on_crafted_fixture(spark):
    rows = [
        f"{SHARED} {UNIQ_A}",
        f"{UNIQ_B} {SHARED}",
        SHARED.upper(),
        _run(f"m{i}" for i in range(K)) * 1,
    ]
    _assert_cross_engine(D.dedup_exact_spans(_docs(spark, rows)), _duck_on(rows))


def test_cross_engine_on_testdata(spark):
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    _assert_cross_engine(D.dedup_exact_spans(docs), con)


# ------------------------------------------------------------- strip face


def test_strip_keeps_first_occurrence_cuts_later(spark):
    rows = [
        f"{SHARED} {UNIQ_A}",  # doc0: canonical occurrence — kept whole
        f"{UNIQ_B} {SHARED}",  # doc1: repeat — SHARED cut
        _run(f"c{i}" for i in range(2 * K)),  # doc2: unique — untouched
    ]
    out = _strip(spark, rows)
    assert out[0]["text_dedup"] == rows[0] and not out[0]["was_modified"]
    assert out[1]["text_dedup"] == UNIQ_B
    assert out[1]["n_cut_words"] == K + 4 and out[1]["n_cut_spans"] == 1
    assert out[2]["text_dedup"] == rows[2] and not out[2]["was_modified"]


def test_strip_within_doc_repeat_cuts_second(spark):
    p = _run(f"x{i}" for i in range(K))
    filler = _run(f"f{i}" for i in range(K + 2))
    out = _strip(spark, [f"{p} {filler} {p}"])
    assert out[0]["text_dedup"] == f"{p} {filler}"
    assert out[0]["n_cut_words"] == K and out[0]["n_cut_spans"] == 1


def test_strip_compares_lowered_rebuilds_raw_case(spark):
    rows = [f"{SHARED} {UNIQ_A}", f"{UNIQ_B.upper()} {SHARED.upper()}"]
    out = _strip(spark, rows)
    # doc1's uppercased SHARED matches doc0's (corpus token rule) and is
    # cut; the surviving prefix keeps its ORIGINAL case
    assert out[1]["text_dedup"] == UNIQ_B.upper()
    assert out[0]["text_dedup"] == rows[0]


def test_strip_second_pass_converges_on_fixture(spark):
    rows = [f"{SHARED} {UNIQ_A}", f"{UNIQ_B} {SHARED}"]
    once = _strip(spark, rows)
    again = _strip(spark, [once[i]["text_dedup"] for i in sorted(once)])
    assert all(not r["was_modified"] for r in again.values())


def test_strip_cross_engine(spark):
    rows = [
        f"{SHARED} {UNIQ_A}",
        f"{UNIQ_B} {SHARED}",
        SHARED.upper(),
        _run(f"m{i}" for i in range(K)),
    ]
    cols = ["doc_id", "text_dedup", "n_words", "n_cut_words", "n_cut_spans",
            "was_modified"]
    a = (
        D.dedup_exact_spans_strip(_docs(spark, rows))
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        _duck_on(rows)
        .execute(D.sql_dedup_exact_spans_strip())
        .fetchdf()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_strip_cross_engine_on_testdata(spark):
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
        D.dedup_exact_spans_strip(docs)
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        con.execute(D.sql_dedup_exact_spans_strip())
        .fetchdf()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["was_modified"].any()  # non-vacuous on the synthetic corpus
    pd.testing.assert_frame_equal(a, b, check_dtype=False)





def test_gram_sep_byte_inside_tokens_is_position_safe(spark):
    """r12 ADVICE #1: a literal \\x01 — the explode round-trip's GRAM_SEP —
    inside a token must neither fragment its gram nor shift any later
    window position. Comparison tokens delete the byte in BOTH engines
    (position-preservingly: an all-\\x01 token stays a now-empty token),
    so the dirtied run still collides with its clean twin and the strip
    cuts exactly the right words."""
    dirty = SHARED.replace("s3", "s\x01\x013")  # \x01 *inside* a token
    rows = [
        f"{dirty} {UNIQ_A}",  # doc0: dirtied copy of the shared run
        f"{UNIQ_B} {SHARED}",  # doc1: clean copy
        f"\x01 {SHARED}",  # doc2: all-\x01 token shifts later positions by 1
    ]
    spans = {}
    for r in D.dedup_exact_spans(_docs(spark, rows)).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # deletion makes dirty == clean: all three docs report the shared run,
    # doc2's span shifted by its leading (empty-after-deletion) token
    assert spans[0] == [(0, K + 3)]
    assert spans[1] == [(10, 10 + K + 3)]
    assert spans[2] == [(1, K + 4)]
    con = _duck_on(rows)
    _assert_cross_engine(D.dedup_exact_spans(_docs(spark, rows)), con)
    a = _assert_strip_cross_engine(D.dedup_exact_spans_strip(_docs(spark, rows)), con)
    # the canonical (first) occurrence keeps its text VERBATIM — \x01 and
    # all — later copies are cut (doc2 keeps its non-duplicated "\x01" word)
    assert a.loc[0, "text_dedup"] == f"{dirty} {UNIQ_A}"
    assert a.loc[1, "text_dedup"] == UNIQ_B
    assert a.loc[2, "text_dedup"] == "\x01"


def test_null_and_empty_text_strip_cross_engine(spark):
    """r12 ADVICE #4: NULL text must not diverge cross-engine in the strip
    faces — Spark's size(NULL) is -1 where DuckDB's len(NULL) is NULL;
    both coalesce to an empty token array (n_words = 0, text_dedup '')."""
    rows = [(0, f"{SHARED} {UNIQ_A}"), (1, None), (2, ""), (3, f"{UNIQ_B} {SHARED}")]
    docs = spark.createDataFrame(
        [(i, t, "en", "src", 0) for i, t in rows], DOC_SCHEMA
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "text": [t for _, t in rows],
                "lang": "en",
                "source": "src",
                "n_chars": 0,
            }
        ),
    )
    a = _assert_strip_cross_engine(D.dedup_exact_spans_strip(docs), con)
    assert list(a["n_words"]) == [K + 24, 0, 0, K + 14]
    assert a.loc[1, "text_dedup"] == "" and not a.loc[1, "was_modified"]


# ------------------------------------------------------- attribution face
