"""Semantics of the second r07 incoming wave: hybrid RRF retrieval,
intra-document passage dedup, CCNet perplexity tertiles, incremental IVF
index delta. Cross-engine value parity is covered by the --extended oracle
sweep; these pin operator CONTRACTS on hand-built corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ------------------------------------------------------------ hybrid RRF
def test_rrf_fuses_both_rank_lists(spark):
    from spark_signals.datapipe.retrieval import (
        RRF_K0,
        bm25_topk,
        dense_hash_topk,
        hybrid_rrf_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lex = {r["doc_id"]: r["rank"] for r in bm25_topk(docs).collect()}
    dense = {r["doc_id"]: r["rank"] for r in dense_hash_topk(docs).collect()}
    fused = hybrid_rrf_topk(docs).collect()
    assert fused, "fusion returned no rows"
    ranks = sorted(r["rank"] for r in fused)
    assert ranks == list(range(1, len(fused) + 1))
    for r in fused:
        # carried ranks match the source lists exactly
        assert r["lex_rank"] == lex.get(r["doc_id"])
        assert r["dense_rank"] == dense.get(r["doc_id"])
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (RRF_K0 + r["lex_rank"])
        if r["dense_rank"] is not None:
            want += 1.0 / (RRF_K0 + r["dense_rank"])
        assert abs(r["rrf_score"] - want) < 2e-9
    # every fused doc appears in at least one source list
    assert all(
        r["lex_rank"] is not None or r["dense_rank"] is not None for r in fused
    )


def test_rrf_dual_list_doc_beats_single_list_doc(spark):
    """A doc ranked #1 in BOTH lists must outscore any doc in only one."""
    from spark_signals.datapipe.retrieval import hybrid_rrf_topk

    rows = [
        (1, "hash join spark hash join spark", "en", "s", 0),  # dominant match
        (2, "hash filler filler filler", "en", "s", 0),
        (3, "unrelated words entirely here", "en", "s", 0),
    ]
    out = {r["doc_id"]: r for r in hybrid_rrf_topk(_docs(spark, rows)).collect()}
    both = [d for d, r in out.items() if r["lex_rank"] and r["dense_rank"]]
    only = [d for d, r in out.items() if (r["lex_rank"] is None) != (r["dense_rank"] is None)]
    assert 1 in both
    top_both = out[1]["rrf_score"]
    for d in only:
        assert top_both > out[d]["rrf_score"]


def test_dense_query_vector_matches_hash_embed(spark):
    """The plan-literal query vector must equal hash_embed's output for the
    same text — the contract that makes dense scoring 'embed the query the
    same way as the corpus'."""
    from spark_signals.datapipe.embed import EMBED_DIM, hash_embed
    from spark_signals.datapipe.retrieval import _query_vector

    terms = ("hash", "join", "spark")
    qv = _query_vector(tuple(sorted(set(terms))), EMBED_DIM)
    df = spark.createDataFrame([(0, " ".join(sorted(set(terms))))], "doc_id long, text string")
    got = hash_embed(df).collect()[0]["embedding"]
    for a, b in zip(qv, got):
        assert abs(a - b) < 1e-6


# ------------------------------------------------------------ intra-doc dedup
def test_intra_doc_strips_repeated_passages_keeps_first(spark):
    from spark_signals.datapipe.dedup import dedup_intra_doc

    rows = [
        (1, "a b c d a b", "en", "s", 0),     # passages: [a b][c d][a b]
        (2, "a b c d e f", "en", "s", 0),     # all distinct
        (3, "x y x y x y x y", "en", "s", 0),  # 4 copies of [x y]
        (4, "solo", "en", "s", 0),            # one partial passage
    ]
    out = {r["doc_id"]: r for r in dedup_intra_doc(_docs(spark, rows), k=2).collect()}
    assert out[1]["text_dedup"] == "a b c d"
    assert (out[1]["n_passages"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["was_modified"]
    assert out[2]["text_dedup"] == "a b c d e f" and not out[2]["was_modified"]
    assert out[3]["text_dedup"] == "x y" and out[3]["n_kept"] == 1
    assert out[4]["text_dedup"] == "solo" and out[4]["n_passages"] == 1


def test_intra_doc_partial_tail_passage_is_its_own_unit(spark):
    from spark_signals.datapipe.dedup import dedup_intra_doc

    # 5 words at k=2 → [a b][a b][a]: tail [a] is NOT equal to [a b]
    rows = [(1, "a b a b a", "en", "s", 0)]
    out = dedup_intra_doc(_docs(spark, rows), k=2).collect()[0]
    assert out["text_dedup"] == "a b a"
    assert (out["n_passages"], out["n_kept"]) == (3, 2)


def test_intra_doc_compares_case_insensitively_but_rebuilds_case(spark):
    from spark_signals.datapipe.dedup import dedup_intra_doc

    # "The Cat" repeats as "the cat" → second occurrence stripped under the
    # ASCII-lower compare rule, but the SURVIVING text keeps its casing
    rows = [
        (1, "The Cat the cat Next Block", "en", "s", 0),
        (2, "No Repeats Here At All OK", "en", "s", 0),
    ]
    out = {r["doc_id"]: r for r in dedup_intra_doc(_docs(spark, rows), k=2).collect()}
    assert out[1]["text_dedup"] == "The Cat Next Block"
    assert out[1]["was_modified"]
    # unmodified docs keep casing too (spacing collapses to single spaces —
    # callers gate substitution on was_modified for byte-identity)
    assert out[2]["text_dedup"] == "No Repeats Here At All OK"
    assert not out[2]["was_modified"]


def test_hygiene_preserves_unmodified_docs_byte_identically(spark):
    """r7 advisory: hygiene is a pure cleanup — a doc with no repeated
    passages must leave _hygiene with exactly its cleaned text (casing and
    spacing intact), not a words_col rebuild."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from curate_corpus import _hygiene

    from spark_signals.datapipe.clean import clean_text

    rows = [
        (1, "Mixed   CASE text,  spaced out — no repeats.", "en", "s", 0),
        (2, "dup block dup block tail words here", "en", "s", 0),
    ]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r["text"] for r in _hygiene(docs).collect()}
    cleaned = {r["doc_id"]: r["text_clean"] for r in clean_text(docs).collect()}
    assert out[1] == cleaned[1]  # byte-identical through hygiene
    assert "Mixed" in out[1] and "CASE" in out[1]


def test_intra_doc_drops_wordless_docs(spark):
    from spark_signals.datapipe.dedup import dedup_intra_doc

    rows = [(1, "   ", "en", "s", 0), (2, "ok then", "en", "s", 0)]
    got = {r["doc_id"] for r in dedup_intra_doc(_docs(spark, rows), k=2).collect()}
    assert got == {2}


# ------------------------------------------------------------ CCNet buckets
def test_ccnet_buckets_split_language_into_exact_thirds(spark):
    from spark_signals.datapipe.text import ccnet_lm_buckets

    # 6 'en' docs and 3 'de' docs with DISTINCT per-doc scores: each doc
    # mixes i+1 copies of a corpus-common bigram with fixed hapax filler,
    # so the fluent-transition fraction (and hence avg_logprob) varies per
    # doc; both paths must produce the same exact thirds
    rows = [
        (i, "the cat " * (i + 1) + f"u{i} v{i} w{i}", "en", "s", 0)
        for i in range(6)
    ]
    rows += [
        (10 + i, "wort und " * (i + 1) + f"x{i} y{i}", "de", "s", 0)
        for i in range(3)
    ]
    from collections import Counter

    for exact in (False, True):
        out = ccnet_lm_buckets(_docs(spark, rows), exact_rank=exact).collect()
        en = [r for r in out if r["lang"] == "en"]
        de = [r for r in out if r["lang"] == "de"]
        assert len(en) == 6 and len(de) == 3
        assert Counter(r["ppl_bucket"] for r in en) == {"head": 2, "middle": 2, "tail": 2}
        assert Counter(r["ppl_bucket"] for r in de) == {"head": 1, "middle": 1, "tail": 1}
        assert all(r["n_lang"] == len(grp) for grp in (en, de) for r in grp)
    # exact path additionally ranks contiguously by avg_logprob desc
    out = ccnet_lm_buckets(_docs(spark, rows), exact_rank=True).collect()
    for lang, n in (("en", 6), ("de", 3)):
        grp = sorted((r for r in out if r["lang"] == lang), key=lambda r: r["lm_rank"])
        assert [r["lm_rank"] for r in grp] == list(range(1, n + 1))
        scores = [r["avg_logprob"] for r in grp]
        assert scores == sorted(scores, reverse=True)


def test_ccnet_default_plan_has_no_per_language_window(spark):
    """The default path must never sort a whole language in one task (the
    r7 verdict's scale finding): no Window exchange keyed on lang — the
    tertile boundaries come from a map-side-combinable sketch aggregate."""
    from spark_signals.datapipe.text import ccnet_lm_buckets

    rows = [(i, f"w{i} common w{i}", "en", "s", 0) for i in range(4)]
    plan = ccnet_lm_buckets(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    assert "percentile_approx" in plan
    exact = ccnet_lm_buckets(_docs(spark, rows), exact_rank=True)
    assert "row_number" in exact._jdf.queryExecution().executedPlan().toString()


def test_ccnet_fluent_doc_outranks_word_salad(spark):
    from spark_signals.datapipe.text import ccnet_lm_buckets

    # doc 1 repeats one high-count bigram (fluent under the corpus's own
    # LM); doc 2 is hapax-only word salad (every transition backs off)
    rows = [
        (1, "the cat " * 8, "en", "s", 0),
        (2, "qq ww ee rr tt yy uu ii", "en", "s", 0),
        (3, "the cat " * 4 + "zz", "en", "s", 0),
    ]
    out = {r["doc_id"]: r for r in ccnet_lm_buckets(_docs(spark, rows)).collect()}
    assert out[1]["ppl_bucket"] == "head" and out[2]["ppl_bucket"] == "tail"
    exact = {
        r["doc_id"]: r
        for r in ccnet_lm_buckets(_docs(spark, rows), exact_rank=True).collect()
    }
    assert exact[1]["lm_rank"] < exact[2]["lm_rank"]
    assert exact[1]["ppl_bucket"] == "head" and exact[2]["ppl_bucket"] == "tail"


def test_ccnet_excludes_docs_without_transitions(spark):
    from spark_signals.datapipe.text import ccnet_lm_buckets

    rows = [(1, "single", "en", "s", 0), (2, "two words", "en", "s", 0)]
    got = {r["doc_id"] for r in ccnet_lm_buckets(_docs(spark, rows)).collect()}
    assert got == {2}


# ------------------------------------------------------------ ANN index delta
def _unit(x, y):
    n = (x * x + y * y) ** 0.5
    return [float(x / n), float(y / n)]


def test_index_delta_assigns_batch_to_nearest_trained_cell(spark):
    from spark_signals.datapipe.similarity import ann_index_delta, kmeans_train

    # snapshot: two tight 2-D clusters around (1,0) and (0,1)
    snap_rows = [(i, _unit(1.0, 0.05 * i), 0) for i in range(5)]
    snap_rows += [(10 + i, _unit(0.05 * i, 1.0), 0) for i in range(5)]
    snap = spark.createDataFrame(snap_rows, EMB_SCHEMA)
    centroids = kmeans_train(snap, k=2, iters=2)
    batch = spark.createDataFrame(
        [(100, _unit(1.0, 0.02), 0), (101, _unit(0.98, 0.1), 0), (102, _unit(0.03, 1.0), 0)],
        EMB_SCHEMA,
    )
    got = {r["vec_id"]: r["cell_id"] for r in ann_index_delta(batch, centroids).collect()}
    assert len(got) == 3
    assert got[100] == got[101]  # both near cluster A
    assert got[100] != got[102]  # B-side vector lands in the other cell
    # and the batch assignment agrees with where the snapshot's own members go
    snap_cells = {
        r["vec_id"]: r["cell_id"]
        for r in ann_index_delta(snap, centroids).collect()
    }
    assert snap_cells[0] == got[100] and snap_cells[10] == got[102]


def test_index_delta_snapshot_covers_exactly_the_batch(spark):
    from spark_signals.datapipe.similarity import (
        ANN_DELTA_MOD,
        KMEANS_K,
        ann_index_delta_snapshot,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ann_index_delta_snapshot(emb).collect()
    n_batch = emb.filter(F.col("vec_id") % ANN_DELTA_MOD == 0).count()
    assert len(out) == n_batch
    assert {r["vec_id"] % ANN_DELTA_MOD for r in out} == {0}
    assert all(0 <= r["cell_id"] < KMEANS_K for r in out)


# ------------------------------------------------------ per-language runner
def test_per_language_partition_is_exhaustive_and_disjoint(spark):
    """Every input row lands in exactly one shard (named langs + catch-all),
    and a per-row operator unions row-identically to the single-job run."""
    from pyspark.sql import functions as F

    from spark_signals.datapipe.text import per_language

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ident = lambda d: d.select("doc_id", "lang", F.length("text").alias("n"))  # noqa: E731
    sharded = per_language(docs, ident, ["en", "de"])
    whole = sorted(tuple(r) for r in ident(docs).collect())
    got = sorted(tuple(r) for r in sharded.collect())
    assert got == whole
    # without the catch-all only the named languages appear
    named = per_language(docs, ident, ["en", "de"], include_other=False)
    assert {r["lang"] for r in named.collect()} == {"en", "de"}


def test_per_language_ccnet_keeps_tertiles_per_shard(spark):
    """The CCNet-faithful composition: per-language LM + per-language
    tertiles — each language's bucket split stays ~thirds (its tertile
    boundaries are computed inside its own shard)."""
    from collections import Counter

    from spark_signals.datapipe.text import ccnet_lm_buckets, per_language

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = per_language(docs, ccnet_lm_buckets, ["en", "de", "fr", "es", "zh"]).collect()
    assert len(out) > 0
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], Counter())[r["ppl_bucket"]] += 1
    for lang, c in by_lang.items():
        n = sum(c.values())
        if n >= 9:  # tertiles only meaningful with a few rows per band
            assert min(c.values()) >= n // 3 - 2, (lang, c)
