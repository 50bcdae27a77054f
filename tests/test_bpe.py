"""Distributed BPE trainer/tokenizer semantics (datapipe.bpe).

The merge sequence on the Sennrich et al. textbook corpus is
hand-verifiable, so these tests pin exact merges, cross-engine parity,
pre-trained application to unseen words, and the subword currency swap
through the existing whitespace-priced consumers."""

from __future__ import annotations

import duckdb
import pytest

from spark_signals.datapipe.bpe import (
    bpe_apply,
    bpe_segment_text,
    bpe_token_counts,
    bpe_train,
    sql_bpe_token_counts,
    sql_bpe_train,
)

ROWS = [
    (1, "low low low low low lower lower newest newest", "en", "s", 0),
    (2, "newest newest newest newest widest widest widest", "en", "s", 0),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _duck():
    con = duckdb.connect()
    vals = ", ".join(f"({d}, '{t}', '{lg}', '{s}', {n})" for d, t, lg, s, n in ROWS)
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
        "t(doc_id, text, lang, source, n_chars)"
    )
    return con


def test_bpe_train_textbook_merge_sequence(docs):
    """Weighted pair counts: (e,s)=9 ties (s,t)=9 → lexicographic; then
    est, lo, low, ew, ewest — the classic low/lower/newest/widest run."""
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, 6).orderBy("merge_rank").collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
        (6, "ew", "est", "ewest", 6),
    ]


def test_bpe_train_matches_duckdb_oracle(docs):
    got = sorted(tuple(r) for r in bpe_train(docs, 6).collect())
    want = sorted(tuple(r) for r in _duck().execute(sql_bpe_train(6)).fetchall())
    assert got == want


def test_bpe_token_counts_matches_duckdb_oracle(docs):
    got = sorted(tuple(r) for r in bpe_token_counts(docs, 6).collect())
    want = sorted(
        tuple(r) for r in _duck().execute(sql_bpe_token_counts(6)).fetchall()
    )
    assert got == want
    # hand-checked: doc1 = 5·low(1) + 2·lower(low,e,r=3) + 2·newest(n,ewest=2)
    assert dict((d, t) for d, _, t in got) == {1: 15, 2: 20}


def test_bpe_apply_pretrained_handles_unseen_words(spark, docs):
    """Serving path: train once, tokenize a corpus the trainer never saw.
    'lowest' → low + est under the trained merges (5 chars → 2 pieces);
    'zzz' is fully OOV at the char-pair level → 3 single-char pieces."""
    merges = bpe_train(docs, 6)
    new = spark.createDataFrame(
        [(10, "lowest zzz", "en", "s", 0)], SCHEMA
    )
    out = {r["doc_id"]: r for r in bpe_apply(new, merges, 6).collect()}
    assert out[10]["n_words"] == 2
    assert out[10]["n_tokens_bpe"] == 2 + 3


def test_bpe_apply_self_equals_self_trained_counts(spark, docs):
    """Applying the trained merge table back to the training corpus must
    reproduce bpe_token_counts exactly (the no-re-application fast path
    and the replay path are the same function)."""
    merges = bpe_train(docs, 6)
    a = sorted(tuple(r) for r in bpe_apply(docs, merges, 6).collect())
    b = sorted(tuple(r) for r in bpe_token_counts(docs, 6).collect())
    assert a == b


def test_bpe_currency_swap_reconciles_with_mixture(spark, docs):
    """THE reconciliation the packing/mixture currency exists for: rewrite
    documents as space-joined BPE pieces, price them through the stock
    whitespace-counted mixture manifest — total must equal
    Σ bpe_token_counts on the original corpus."""
    from pyspark.sql import functions as F

    from spark_signals.datapipe.sampling import mixture_manifest

    seg = bpe_segment_text(docs, 6)
    redocs = docs.drop("text").join(seg, "doc_id").withColumnRenamed(
        "text_bpe", "text"
    )
    manifest_total = (
        mixture_manifest(redocs)
        .agg(F.sum("n_tokens_available").alias("t"))
        .collect()[0]["t"]
    )
    direct_total = (
        bpe_token_counts(docs, 6).agg(F.sum("n_tokens_bpe").alias("t")).collect()[0]["t"]
    )
    assert manifest_total == direct_total == 35


def test_bpe_exhausted_pairs_stop_cleanly(spark):
    """Single-char words have no pairs: every iteration hits the sentinel,
    the merge table comes back empty, and counts price 1 token per word."""
    docs = spark.createDataFrame([(1, "a b c a", "en", "s", 0)], SCHEMA)
    assert bpe_train(docs, 4).count() == 0
    out = bpe_token_counts(docs, 4).collect()[0]
    assert (out["n_words"], out["n_tokens_bpe"]) == (4, 4)


def test_bpe_empty_corpus(spark):
    docs = spark.createDataFrame([], SCHEMA)
    assert bpe_train(docs, 3).count() == 0
    assert bpe_token_counts(docs, 3).count() == 0


def test_bpe_fertility_by_lang_semantics(spark):
    """Hand-checkable fertility: with 0 merges every word prices at its
    char count, so fertility == chars/word and chars_per_token == 1 per
    language; the per-language split must follow the lang column."""
    from spark_signals.datapipe.bpe import bpe_fertility_by_lang

    rows = [
        (1, "aa bbb", "en", "s", 6),
        (2, "cccc", "en", "s", 4),
        (3, "dd ee", "de", "s", 5),
    ]
    d = spark.createDataFrame(rows, SCHEMA)
    got = {r["lang"]: r for r in bpe_fertility_by_lang(d, n_merges=0).collect()}
    en, de = got["en"], got["de"]
    assert (en["n_docs"], en["n_words"], en["n_tokens_bpe"]) == (2, 3, 9)
    assert en["fertility"] == 3.0  # 9 single-char tokens / 3 words
    assert (de["n_words"], de["n_tokens_bpe"]) == (2, 4)
    assert de["fertility"] == 2.0


def test_bpe_fertility_matches_duckdb_oracle(docs):
    from spark_signals.datapipe.bpe import (
        bpe_fertility_by_lang,
        sql_bpe_fertility_by_lang,
    )

    got = sorted(
        tuple(r) for r in bpe_fertility_by_lang(docs, 4).collect()
    )
    want = sorted(
        tuple(r) for r in _duck().execute(sql_bpe_fertility_by_lang(4)).fetchall()
    )
    assert got == want
