"""Semantics of the r07 incoming operators: train/val/test splitting,
markup cleaning, vocab coverage, BM25 retrieval, dedup cluster stats.
Cross-engine value parity is covered by the --extended oracle sweep; these
pin operator CONTRACTS on hand-built corpora (the synthetic corpus has no
markup, hyphenation artifacts, or known relevance ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ------------------------------------------------------------ split
def test_split_disjoint_exhaustive_and_stable_under_growth(spark):
    from spark_signals.datapipe.sampling import split_train_val_test

    rows = [(i, f"doc {i}", "en", "s", 10) for i in range(1000)]
    out = split_train_val_test(_docs(spark, rows), val_frac=0.1, test_frac=0.1)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 1000  # exhaustive, one split per doc
    frac = {s: sum(v == s for v in got.values()) / 1000 for s in ("train", "val", "test")}
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15 and 0.05 < frac["test"] < 0.15
    # stability: growing the corpus must never migrate an existing doc
    bigger = rows + [(i, f"doc {i}", "en", "s", 10) for i in range(1000, 2000)]
    got2 = {
        r["doc_id"]: r["split"]
        for r in split_train_val_test(
            _docs(spark, bigger), val_frac=0.1, test_frac=0.1
        ).collect()
    }
    assert all(got2[i] == got[i] for i in got)


def test_split_validates_fractions(spark):
    import pytest

    from spark_signals.datapipe.sampling import split_train_val_test

    with pytest.raises(ValueError):
        split_train_val_test(_docs(spark, [(1, "x", "en", "s", 1)]), 0.6, 0.5)


# ------------------------------------------------------------ cleaning
def test_clean_text_rules(spark):
    from spark_signals.datapipe.clean import clean_text

    rows = [
        (1, "<p>Hello <b>world</b></p>", "en", "s", 0),
        (2, "hyphen-\nated and multi-\n  line", "en", "s", 0),
        (3, "ctrl\x01chars\x1fhere", "en", "s", 0),
        (4, "  spaced    out \t text \n\n ok ", "en", "s", 0),
        (5, "already clean", "en", "s", 0),
        (6, "math 1 < 2 and 3 > 2 stays", "en", "s", 0),
    ]
    out = {r["doc_id"]: r for r in clean_text(_docs(spark, rows)).collect()}
    assert out[1]["text_clean"] == "Hello world"
    assert out[2]["text_clean"] == "hyphenated and multiline"
    assert out[3]["text_clean"] == "ctrl chars here"
    assert out[4]["text_clean"] == "spaced out text ok"
    assert out[5]["text_clean"] == "already clean" and not out[5]["was_dirty"]
    # lone < / > are not tag-shaped... but "< 2 and 3 >" IS bracketed: the
    # standard lossy tag strip takes it — document the behavior
    assert out[6]["text_clean"] == "math 1 2 stays" and out[6]["was_dirty"]
    assert all(
        r["n_chars_removed"] == len(rows[i - 1][1]) - r["n_chars_clean"]
        for i, r in out.items()
    )


def test_clean_text_cross_engine_on_matching_input(spark):
    """Java regex and DuckDB RE2 must agree on text the rules REWRITE —
    the synthetic corpus only exercises the pass-through path."""
    import duckdb

    from spark_signals.datapipe.clean import clean_text, sql_clean_text

    rows = [
        (1, "<div class='x'>tagged</div> body", "en", "s", 0),
        (2, "col-\numn broken", "en", "s", 0),
        (3, "a\x00b\x08c", "en", "s", 0),
        (4, " mixed <i>it</i>-\nall   up ", "en", "s", 0),
    ]
    got = sorted(tuple(r) for r in clean_text(_docs(spark, rows)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(sql_clean_text()).fetchall())
    assert got == want


# ------------------------------------------------------------ vocab coverage
def test_vocab_coverage_hand_corpus(spark):
    from spark_signals.datapipe.text import vocab_coverage

    # 10 tokens total: a x4, b x3, c x2, d x1
    rows = [
        (1, "a a b c", "en", "s", 0),
        (2, "a b", "en", "s", 0),
        (3, "a b c d", "en", "s", 0),
    ]
    out = {r["rank"]: r for r in vocab_coverage(_docs(spark, rows), v=3).collect()}
    assert [out[i]["word"] for i in (1, 2, 3)] == ["a", "b", "c"]
    assert out[1]["n_occurrences"] == 4 and out[1]["frac"] == 0.4
    assert out[2]["cum_frac"] == 0.7
    assert out[3]["cum_frac"] == 0.9  # top-3 covers 9/10 tokens


def test_vocab_coverage_ties_break_on_word(spark):
    from spark_signals.datapipe.text import vocab_coverage

    rows = [(1, "zz aa zz aa", "en", "s", 0)]
    out = [r["word"] for r in vocab_coverage(_docs(spark, rows), v=2).collect()]
    assert out == ["aa", "zz"]


# ------------------------------------------------------------ BM25
def test_bm25_relevance_ordering(spark):
    from spark_signals.datapipe.retrieval import bm25_topk

    rows = [
        (1, "hash join spark", "en", "s", 0),          # all three terms
        (2, "hash join filler filler", "en", "s", 0),  # two terms, longer
        (3, "hash only here", "en", "s", 0),           # one term
        (4, "nothing relevant at all", "en", "s", 0),  # no terms
        (5, "hash join", "en", "s", 0),                # two terms, shortest
    ]
    out = {r["doc_id"]: r for r in bm25_topk(_docs(spark, rows)).collect()}
    assert 4 not in out  # zero-match docs never surface
    assert out[1]["n_matched_terms"] == 3
    assert out[1]["rank"] == 1  # full-coverage doc wins
    # same matched terms: the shorter doc outscores the longer one
    assert out[5]["score"] > out[2]["score"]
    # more distinct matches beats fewer
    assert out[2]["score"] > out[3]["score"]
    ranks = sorted(r["rank"] for r in out.values())
    assert ranks == [1, 2, 3, 4]


def test_bm25_multi_query_agrees_with_single_query(spark):
    """bm25_topk_queries on a one-query table must reproduce bm25_topk
    exactly, and the salted two-stage top-k must be salt-invariant."""
    from spark_signals.datapipe.retrieval import bm25_topk, bm25_topk_queries

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = sorted(tuple(r) for r in bm25_topk(docs).collect())
    multi = bm25_topk_queries(docs, {"only": ("hash", "join", "spark")})
    got = sorted(
        tuple(r)
        for r in multi.drop("query_id").select(
            "doc_id", "score", "n_matched_terms", "rank"
        ).collect()
    )
    assert got == single and single
    for salts in (1, 3):
        again = bm25_topk_queries(
            docs, {"only": ("hash", "join", "spark")}, n_salts=salts
        )
        assert sorted(
            tuple(r)
            for r in again.drop("query_id").select(
                "doc_id", "score", "n_matched_terms", "rank"
            ).collect()
        ) == single


def test_bm25_multi_query_dataframe_input_normalizes_case(spark):
    from spark_signals.datapipe.retrieval import bm25_topk_queries

    rows = [
        (1, "hash join spark", "en", "s", 0),
        (2, "hash join filler filler", "en", "s", 0),
        (3, "nothing relevant at all", "en", "s", 0),
    ]
    docs = _docs(spark, rows)
    qrel = docs.sparkSession.createDataFrame(
        [("qa", "Hash"), ("qa", "JOIN"), ("qb", "filler")],
        "query_id string, term string",
    )
    out = bm25_topk_queries(docs, qrel).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q["qa"] == {1, 2}  # uppercase terms matched their lc forms
    assert by_q["qb"] == {2}


def test_retrieval_normalizes_query_case_on_both_arms(spark):
    """r7 advisory: corpus tokens are ASCII-lowered, so an uppercase query
    term must match its lowercase corpus form identically on the lexical
    AND dense paths (not silently match nothing)."""
    from spark_signals.datapipe.retrieval import bm25_topk, dense_hash_topk

    rows = [
        (1, "hash join spark", "en", "s", 0),
        (2, "hash join filler filler", "en", "s", 0),
        (3, "nothing relevant at all", "en", "s", 0),
    ]
    docs = _docs(spark, rows)
    for fn in (bm25_topk, dense_hash_topk):
        lower = {r["doc_id"]: r for r in fn(docs, ("hash", "join", "spark")).collect()}
        upper = {r["doc_id"]: r for r in fn(docs, ("Hash", "JOIN", "Spark")).collect()}
        assert lower and upper == lower


# ------------------------------------------------------------ cluster stats
def test_dedup_cluster_stats_reconciles(spark):
    from spark_signals.datapipe.dedup import dedup_cluster_stats, dedup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cl = dedup_clusters(docs).collect()
    stats = {r["cluster_size"]: r for r in dedup_cluster_stats(docs).collect()}
    assert sum(r["n_docs"] for r in stats.values()) == len(cl)
    assert sum(r["n_clusters"] for r in stats.values()) == len(
        {r["cluster_id"] for r in cl}
    )
    n_non_canonical = sum(not r["is_canonical"] for r in cl)
    assert sum(r["n_duplicates"] for r in stats.values()) == n_non_canonical
