"""Consistency of the r10 chained consolidation queries against the
sibling operators they carry evidence for.

Each chained query holds a driver slot on behalf of a whole incoming
family (datapipe/parity._r10_chained); the sf0.01 parity sweep pins their
cross-engine value equality, and these fixtures pin the CONSOLIDATION
claim itself — that the chained output agrees column-for-column with the
standalone siblings run separately, so a green chained slot really is
evidence for the family."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark):
    # two languages, three sources (src0/src1 are the decontam benches),
    # a planted near-dup pair (0, 1), and a contaminated train doc (20)
    long_a = "the quick brown fox jumps over the lazy dog again and again " * 4
    long_b = long_a + "with one extra tail clause"
    rows = [
        (0, long_a, "en", "src2", len(long_a)),
        (1, long_b, "en", "src2", len(long_b)),
        (2, "unrelated text about spark partitions and shuffles", "en", "src2", 50),
        (3, "der schnelle braune fuchs springt", "de", "src2", 33),
        (4, "ein ganz anderer deutscher satz hier", "de", "src3", 36),
        (10, "benchmark question one about foxes and dogs", "en", "src0", 43),
        (11, "benchmark question two about partitions", "en", "src1", 39),
        (20, "benchmark question one about foxes and dogs copied", "en", "src2", 50),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_bpe_chained_matches_standalone_siblings(spark):
    from spark_signals.datapipe.bpe import (
        bpe_fertility_by_lang,
        bpe_pipeline_report,
        bpe_train,
    )

    docs = _docs(spark)
    chained = {r["lang"]: r for r in bpe_pipeline_report(docs).collect()}
    fert = {r["lang"]: r for r in bpe_fertility_by_lang(docs).collect()}
    merges = bpe_train(docs).orderBy("merge_rank").collect()

    assert set(chained) == set(fert)
    for lang, row in chained.items():
        for c in (
            "n_docs", "n_words", "n_tokens_bpe", "n_chars",
            "fertility", "chars_per_token",
        ):
            assert row[c] == fert[lang][c], (lang, c)
        # the digest columns pin the merge table
        assert row["n_merges_trained"] == len(merges)
        assert row["merge_pair_total"] == sum(m["pair_count"] for m in merges)
        assert row["first_merge"] == merges[0]["merged"]
        assert row["last_merge"] == merges[-1]["merged"]
    assert len(merges) > 0  # the fixture corpus actually trains merges


def test_winnow_zipf_chained_matches_standalone_siblings(spark):
    from spark_signals.datapipe.dedup import (
        winnow_fingerprint_pairs,
        winnow_zipf_report,
    )
    from spark_signals.datapipe.text import zipf_lang_stats

    docs = _docs(spark)
    chained = {r["lang"]: r for r in winnow_zipf_report(docs).collect()}
    zipf = {r["lang"]: r for r in zipf_lang_stats(docs).collect()}
    pairs = winnow_fingerprint_pairs(docs).collect()

    assert set(chained) == set(zipf)
    for lang, row in chained.items():
        for c in zipf[lang].asDict():
            assert row[c] == zipf[lang][c], (lang, c)

    # the planted near-dup (0, 1) must be found, and its pair counted
    # exactly once under its (single, same-shard) language
    assert any({p["doc_a"], p["doc_b"]} == {0, 1} for p in pairs)
    lang_of = {r["doc_id"]: r["lang"] for r in docs.collect()}
    from collections import Counter

    expected_pairs = Counter()
    expected_res_u = Counter()
    for p in pairs:
        shards = {lang_of[p["doc_a"]], lang_of[p["doc_b"]]}
        for s in shards:
            expected_pairs[s] += 1
            expected_res_u[s] += int(p["resemblance"] * 1e6 + 0.5000001)
    for lang, row in chained.items():
        assert row["n_neardup_pairs"] == expected_pairs.get(lang, 0), lang
        assert row["sum_resemblance_u"] == expected_res_u.get(lang, 0), lang


def test_decontam_chained_matches_standalone_siblings(spark):
    from spark_signals.datapipe.decontam import (
        decontam_report_snapshot,
        decontam_suite_report,
        decontaminate_neardup,
    )

    docs = _docs(spark)
    chained = {r["bench"]: r for r in decontam_suite_report(docs).collect()}
    exact = {r["bench"]: r for r in decontam_report_snapshot(docs).collect()}

    assert set(chained) == set(exact) == {"src0", "src1"}
    for bench, row in chained.items():
        for c in exact[bench].asDict():
            assert row[c] == exact[bench][c], (bench, c)

    # fuzzy columns agree with the single-bench fuzzy operator run with
    # the SAME train set (docs outside every bench)
    train = docs.filter(~F.col("source").isin(["src0", "src1"]))
    for bench in ("src0", "src1"):
        fz = decontaminate_neardup(
            train, docs.filter(F.col("source") == bench)
        ).collect()
        hits = [r for r in fz if r["is_contaminated_fuzzy"]]
        assert chained[bench]["n_fuzzy_contaminated"] == len(hits), bench
        assert chained[bench]["n_fuzzy_matches"] == sum(
            r["n_eval_matches"] for r in hits
        ), bench
        assert chained[bench]["fuzzy_jaccard_u_max"] == max(
            (r["max_jaccard_u"] for r in fz), default=0
        ), bench
    # the planted contaminated doc (20) leaks src0: exact and fuzzy agree
    assert chained["src0"]["n_contaminated_train_docs"] >= 1
    assert chained["src0"]["n_fuzzy_contaminated"] >= 1
