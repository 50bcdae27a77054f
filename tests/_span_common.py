"""Shared fixtures/helpers for the exact duplicated-span test shards
(tests/test_span_dedup.py and tests/test_span_dedup_b.py — split so the
file is not scripts/verify_fast.sh's critical path; see the degenerate
sweep's shard precedent)."""

from __future__ import annotations

import duckdb
import pandas as pd

from spark_signals.datapipe import dedup as D

K = D.PASSAGE_WORDS
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


def _run(text_rows):
    return " ".join(text_rows)


def _spans(spark, rows):
    out = {}
    for r in D.dedup_exact_spans(_docs(spark, rows)).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_words"], r["n_windows"])
        )
    return {k: sorted(v) for k, v in out.items()}


def _duck_on(rows):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": rows,
                "lang": "en",
                "source": "src",
                "n_chars": [len(t) for t in rows],
            }
        ),
    )
    return con


def _assert_cross_engine(spark_df, con):
    cols = ["doc_id", "span_start", "span_end", "span_words", "n_windows"]
    a = (
        spark_df.toPandas()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    b = (
        con.execute(D.sql_dedup_exact_spans())
        .fetchdf()[cols]
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _strip(spark, rows):
    return {
        r["doc_id"]: r
        for r in D.dedup_exact_spans_strip(_docs(spark, rows)).collect()
    }


STRIP_COLS = [
    "doc_id", "text_dedup", "n_words", "n_cut_words", "n_cut_spans",
    "was_modified",
]


def _assert_strip_cross_engine(spark_df, con):
    a = spark_df.toPandas()[STRIP_COLS].sort_values("doc_id").reset_index(drop=True)
    b = (
        con.execute(D.sql_dedup_exact_spans_strip())
        .fetchdf()[STRIP_COLS]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return a


def _attrib(spark, rows, **kw):
    out = {}
    for r in D.dedup_exact_spans_attrib(_docs(spark, rows), **kw).collect():
        out.setdefault(r["doc_id"], []).append(
            (
                r["span_start"],
                r["span_end"],
                r["max_window_occ"],
                r["partner_docs"],
                r["n_partners"],
            )
        )
    return {k: sorted(v) for k, v in out.items()}


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


SHARED = _run(f"s{i}" for i in range(K + 4))  # 20-word duplicated run
UNIQ_A = _run(f"a{i}" for i in range(20))
UNIQ_B = _run(f"b{i}" for i in range(10))
