"""Semantics of the third r07 incoming wave: language-keyed mixture
manifest, quality-aware canonical selection, corpus snapshot diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ------------------------------------------------------ mixture by lang
def test_mixture_by_lang_groups_on_language(spark):
    from spark_signals.datapipe.sampling import mixture_manifest

    rows = [
        (1, "one two three", "en", "a", 0),
        (2, "four five", "en", "b", 0),
        (3, "eins zwei", "de", "a", 0),
    ]
    out = {r["lang"]: r for r in mixture_manifest(_docs(spark, rows), group_col="lang").collect()}
    assert set(out) == {"en", "de"}
    assert out["en"]["n_docs"] == 2 and out["de"]["n_docs"] == 1
    assert out["en"]["n_tokens_available"] == 5
    # uniform across 2 languages → half the default budget each
    assert out["en"]["target_tokens"] == out["de"]["target_tokens"]


def test_mixture_by_lang_strict_weights(spark):
    from spark_signals.datapipe.sampling import mixture_manifest

    rows = [(1, "a b", "en", "s", 0), (2, "c d", "de", "s", 0)]
    ok = mixture_manifest(
        _docs(spark, rows), weights={"en": 3.0, "de": 1.0}, group_col="lang"
    ).collect()
    targets = {r["lang"]: r["target_tokens"] for r in ok}
    assert targets["en"] == 3 * targets["de"]
    with pytest.raises(Exception, match="matches no observed lang: fr"):
        mixture_manifest(
            _docs(spark, rows), weights={"en": 1.0, "de": 1.0, "fr": 1.0},
            group_col="lang",
        ).collect()
    with pytest.raises(Exception, match="missing from weights"):
        mixture_manifest(
            _docs(spark, rows), weights={"en": 1.0}, group_col="lang"
        ).collect()


# ------------------------------------------------- quality-aware canonical
def test_canonical_quality_reconciles_with_clusters(spark):
    from spark_signals.datapipe.dedup import dedup_canonical_quality, dedup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cl = {r["doc_id"]: r for r in dedup_clusters(docs).collect()}
    out = dedup_canonical_quality(docs).collect()
    assert {r["doc_id"] for r in out} == set(cl)
    by_cluster: dict = {}
    for r in out:
        assert r["cluster_id"] == cl[r["doc_id"]]["cluster_id"]
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        canon = [r for r in members if r["is_canonical_quality"]]
        assert len(canon) == 1, f"cluster {cid}: {len(canon)} canonicals"
        best_q = max(r["quality_u"] for r in members)
        assert canon[0]["quality_u"] == best_q
        ties = [r["doc_id"] for r in members if r["quality_u"] == best_q]
        assert canon[0]["doc_id"] == min(ties)


# ------------------------------------------------------ corpus snapshot diff
def test_corpus_diff_statuses(spark):
    from spark_signals.datapipe.versioning import corpus_diff

    old = _docs(
        spark,
        [
            (1, "alpha beta", "en", "s", 0),
            (2, "gamma delta", "en", "s", 0),
            (3, "kept the same", "en", "s", 0),
            (4, "Extra   Spaces  here", "en", "s", 0),
        ],
    )
    new = _docs(
        spark,
        [
            (2, "gamma delta REWRITTEN", "en", "s", 0),
            (3, "kept the same", "en", "s", 0),
            (4, "extra spaces here", "en", "s", 0),  # digest-equal rewrite
            (5, "brand new doc", "en", "s", 0),
        ],
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "changed",
        3: "unchanged",
        4: "unchanged",  # trim/case/whitespace-only edits share the digest
        5: "added",
    }


def test_corpus_diff_snapshot_summary_consistent(spark):
    from spark_signals.datapipe.versioning import (
        DIFF_V1_MOD,
        DIFF_V2_MOD,
        corpus_diff_snapshot,
        diff_summary,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    diff = corpus_diff_snapshot(docs)
    summary = {r["status"]: r["n_docs"] for r in diff_summary(diff).collect()}
    # every doc in either snapshot appears exactly once
    n_v1 = docs.filter(F.col("doc_id") % DIFF_V1_MOD != 0).count()
    n_v2 = docs.filter(F.col("doc_id") % DIFF_V2_MOD != 0).count()
    n_union = docs.filter(
        (F.col("doc_id") % DIFF_V1_MOD != 0) | (F.col("doc_id") % DIFF_V2_MOD != 0)
    ).count()
    assert sum(summary.values()) == n_union
    assert summary["removed"] == n_union - n_v2
    assert summary["added"] == n_union - n_v1
    assert summary.get("changed", 0) > 0  # the %10 rewrite fires


# ------------------------------------------------------ vocab tokenization
def test_tokenize_with_vocab_ids_and_oov(spark):
    import hashlib

    from spark_signals.datapipe.text import tokenize_with_vocab

    rows = [
        (1, "a b c", "en", "s", 0),
        (2, "c a", "en", "s", 0),
        (3, "a a a b b", "en", "s", 0),
        (4, "   ", "en", "s", 0),  # wordless → absent
    ]
    out = {r["doc_id"]: r for r in tokenize_with_vocab(_docs(spark, rows), v=2).collect()}
    assert set(out) == {1, 2, 3}
    # corpus counts: a x5, b x3, c x2 → vocab a=1, b=2; c is OOV at v=2
    assert out[1]["ids_digest"] == hashlib.md5(b"1,2,0").hexdigest()
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 1)
    assert out[2]["ids_digest"] == hashlib.md5(b"0,1").hexdigest()  # order kept
    assert out[3]["n_oov"] == 0 and out[3]["oov_frac"] == 0.0
    assert abs(out[1]["oov_frac"] - 1 / 3) < 1e-15


def test_tokenize_oov_rate_matches_coverage_complement(spark):
    """Σ n_oov / Σ n_tokens must equal 1 − cum_frac(top-V) on the same
    corpus — the tokenizer's realized OOV rate IS the coverage curve's
    complement (the consistency vocab sizing decisions rely on)."""
    from spark_signals.datapipe.text import tokenize_with_vocab, vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    v = 20
    tok = tokenize_with_vocab(docs, v=v).collect()
    cov = vocab_coverage(docs, v=v).collect()
    realized_oov = sum(r["n_oov"] for r in tok) / sum(r["n_tokens"] for r in tok)
    cum = max(r["cum_frac"] for r in cov)
    assert abs(realized_oov - (1.0 - cum)) < 1e-5
