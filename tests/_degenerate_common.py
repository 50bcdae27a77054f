"""Shared operator registry for the degenerate-input sweep shards.

Imported by tests/test_degenerate_inputs.py (shard A: even-indexed ops +
the non-parametrized cases) and tests/test_degenerate_inputs_b.py (shard B:
odd-indexed ops) — split so neither file dominates scripts/verify_fast.sh's
critical path (the unsplit file measured 389 s solo, r13 round notes).

At 100 TB there is always a shard with an empty file, a whitespace-only
document, or a single row — operators must return structurally valid
(usually empty) results, not throw or emit phantom rows. This pins the
``explode_strings`` caveat (split('') yields ['']) at the operator level:
every caller must guard empty token arrays BEFORE the explode round-trip.
"""

from __future__ import annotations

from spark_signals.datapipe import decontam as DC
from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import sampling as SMP
from spark_signals.datapipe import scrub as S
from spark_signals.datapipe import text as T

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


def _empty(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


OPS = {
    "text_stats": T.text_stats,
    "lang_id": T.lang_id,
    "fingerprint": T.fingerprint,
    "tfidf": T.tfidf_top_terms,
    "repetition": T.repetition_stats,
    "unigram_lm": T.unigram_lm_quality,
    "bigram_lm": T.bigram_lm_quality,
    "dedup_exact": D.dedup_exact,
    "dedup_minhash": D.dedup_minhash_lsh,
    "dedup_simhash": D.dedup_simhash,
    "dedup_ngram": D.dedup_ngram_jaccard,
    "dedup_passages": D.dedup_passages,
    "pii_scrub": S.pii_scrub,
    "sample_stratified": SMP.sample_stratified,
    "sample_quota": SMP.sample_quota,
    "sample_temperature": SMP.sample_temperature,
    "decontaminate": DC.decontaminate,
}


def _late_ops():
    # r06 operators, imported lazily to keep module import errors local
    from spark_signals.datapipe.classifier import quality_logreg
    from spark_signals.datapipe.curate import curate
    from spark_signals.datapipe.pack import pack_sequences

    from spark_signals.datapipe.clean import clean_text
    from spark_signals.datapipe.retrieval import (
        bm25_topk,
        dense_hash_topk,
        dense_ivf_topk,
        hybrid_rrf_ivf_topk,
        hybrid_rrf_topk,
    )
    from spark_signals.datapipe.text import ccnet_lm_buckets, vocab_coverage

    return {
        "pack_sequences": pack_sequences,
        "quality_logreg": quality_logreg,
        "curate": curate,
        # r07 operators
        "split_train_val_test": SMP.split_train_val_test,
        "clean_text": clean_text,
        "vocab_coverage": vocab_coverage,
        "bm25_topk": bm25_topk,
        # r07 wave 2
        "dense_hash_topk": dense_hash_topk,
        "hybrid_rrf_topk": hybrid_rrf_topk,
        # r08: IVF-probed dense arm + its hybrid, BPE trainer/tokenizer
        "dense_ivf_topk": dense_ivf_topk,
        "hybrid_rrf_ivf_topk": hybrid_rrf_ivf_topk,
        "bpe_train": _bpe_train_small,
        "bpe_token_counts": _bpe_counts_small,
        "bpe_fertility_by_lang": _bpe_fertility_small,
        "cluster_composition": _cluster_composition,
        "dsir_snapshot": _dsir_snapshot,
        "strip_boilerplate": _strip_boilerplate,
        "decontam_fuzzy": _decontam_fuzzy,
        "dedup_intra_doc": D.dedup_intra_doc,
        "ccnet_lm_buckets": ccnet_lm_buckets,
        # r07 wave 3
        "dedup_canonical_quality": D.dedup_canonical_quality,
        "corpus_diff_snapshot": _corpus_diff_snapshot,
        "mixture_by_lang": lambda docs: SMP.mixture_manifest(docs, group_col="lang"),
        "mixture_curriculum": SMP.mixture_curriculum,
        "shuffle_windows": _shuffle_windows,
        "decontam_report": _decontam_report,
        "tokenize_with_vocab": T.tokenize_with_vocab,
        # r08 wave 2 (fingerprint family). zipf_lang_stats is deliberately
        # absent: it is a per-shard REPORT (one row per configured language,
        # zeros included — "zh: 0 tokens" is signal), so an empty corpus
        # yields S zero-rows by design; its empty/zero path is pinned in
        # test_fingerprint_ops.py instead.
        "winnow_pairs": D.winnow_fingerprint_pairs,
        "media_phash_neardup": _media_phash,
        # r12: the exact duplicated-span family
        "dedup_exact_spans": D.dedup_exact_spans,
        "dedup_exact_spans_strip": D.dedup_exact_spans_strip,
        "dedup_spans_incr": D.dedup_spans_incr_snapshot,
        "decontam_spans": DC.decontam_spans,
        "decontam_scrub": DC.decontam_scrub,
        # r14: the token-budget keep-list, the packing tuning report, and
        # the incremental packing lane's face
        "mixture_budget_manifest": SMP.mixture_budget_manifest,
        "pack_efficiency_report": _pack_efficiency,
        "pack_incremental": _pack_incremental,
        # r13: span provenance + the D3 layout face + split-leakage QA
        "dedup_exact_spans_attrib": D.dedup_exact_spans_attrib,
        "zorder_zonemap": _zorder_zonemap,
        "split_leakage_report": SMP.split_leakage_report,
        "split_leakage_clustered": SMP.split_leakage_clustered,
        # r15: the release-audit quartet
        "filter_ablation": _filter_ablation,
        "token_yield_report": D.token_yield_report,
        "kanon_suppression": _kanon_report,
        "minhash_calibration": D.minhash_calibration_report,
        # r15 wave 2: provenance/monitoring pair. NOTE quality_drift is
        # NOT in this sweep's empty-yields-empty contract: its output is
        # the fixed PSI_BINS band relation by design (validated empty-safe
        # in tests/test_release_audits.py instead).
        "source_overlap_matrix": D.source_overlap_matrix,
        # r16: the continuous-provenance pair (the incremental overlap
        # face chains bootstrap + batch over the 80/20 split; empty or
        # degenerate corpora must yield an empty matrix, not a throw)
        "source_overlap_incr": D.source_overlap_incr_snapshot,
        "decontam_source_matrix": _decontam_source_matrix,
    }


def _decontam_source_matrix(docs):
    from spark_signals.datapipe.decontam import decontam_source_matrix_snapshot

    return decontam_source_matrix_snapshot(docs)


def _zorder_zonemap(docs):
    from spark_signals.io.layout import zorder_zonemap

    return zorder_zonemap(docs)


def _bpe_train_small(docs):
    from spark_signals.datapipe.bpe import bpe_train

    return bpe_train(docs, n_merges=2)  # 2 iterations keep the gate fast


def _bpe_counts_small(docs):
    from spark_signals.datapipe.bpe import bpe_token_counts

    return bpe_token_counts(docs, n_merges=2)


def _bpe_fertility_small(docs):
    from spark_signals.datapipe.bpe import bpe_fertility_by_lang

    return bpe_fertility_by_lang(docs, n_merges=2)


def _cluster_composition(docs):
    from spark_signals.datapipe.balance import cluster_composition

    return cluster_composition(docs)


def _strip_boilerplate(docs):
    return D.strip_boilerplate_passages(docs)


def _decontam_fuzzy(docs):
    from spark_signals.datapipe.decontam import decontaminate_fuzzy

    return decontaminate_fuzzy(docs, eval_source="s")


def _dsir_snapshot(docs):
    from spark_signals.datapipe.sampling import dsir_snapshot

    return dsir_snapshot(docs, target_source="s")  # degenerate fixtures use 's'


def _corpus_diff_snapshot(docs):
    from spark_signals.datapipe.versioning import corpus_diff_snapshot

    return corpus_diff_snapshot(docs)


def _shuffle_windows(docs):
    from spark_signals.datapipe.pack import shuffle_windows

    return shuffle_windows(docs)


def _decontam_report(docs):
    from spark_signals.datapipe.decontam import decontam_report_snapshot

    return decontam_report_snapshot(docs, benches=("s",))


def _media_phash(docs):
    from spark_signals.datapipe.multimodal import media_phash_neardup, synthesize_media

    return media_phash_neardup(synthesize_media(docs))


def _pack_efficiency(docs):
    from spark_signals.datapipe.pack import pack_efficiency_report

    return pack_efficiency_report(docs)


def _pack_incremental(docs):
    from spark_signals.datapipe.pack import pack_incremental_snapshot

    return pack_incremental_snapshot(docs)


def _filter_ablation(docs):
    from spark_signals.datapipe.curate import filter_ablation

    return filter_ablation(docs)


def _kanon_report(docs):
    from spark_signals.datapipe.scrub import kanonymity_report

    return kanonymity_report(docs)


OPS.update(_late_ops())
