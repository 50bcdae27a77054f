"""End-to-end training-data pipeline over a document corpus.

One runnable path through the datapipe surface — the pipeline a user of
this engine actually assembles:

    raw JSONL (or parquet)                      io.docs.read_documents_jsonl
      → page hygiene: markup clean +            datapipe.clean, datapipe.dedup
        corpus boilerplate removal +              .strip_boilerplate_passages
        intra-page repeated-passage strip         .dedup_intra_doc
      → curate: dedup-first gate set            datapipe.curate.curate
        (exact dup, passage dup, repetition,
         LM band, decontamination, length
         band; PII redacted in-place)
      → temperature-rebalanced sampling         datapipe.sampling
      → (opt-in) split-then-verify: cluster-    datapipe.sampling
        grain train/val/test splits + the         .split_then_verify
        leakage report proving zero
        cross-split near-dup pairs
      → packing manifest (ctx windows)          datapipe.pack
      → size-bounded training shards            io.docs.write_training_shards
      + audit artifacts: per-source curation report + mixing manifest
        + token-id/OOV report (top-V vocab)     datapipe.text.tokenize_with_vocab
        + cluster x source balance table        datapipe.balance
        + release audits: dedup-aware token     datapipe.dedup.token_yield_report
          yield, cross-source overlap matrix,     dedup.source_overlap_matrix
          filter-ablation grid, k-anonymity       curate.filter_ablation
          gate over the release                   scrub.kanonymity_report
          (one shared, pinned MinHash pair
           relation feeds yield + overlap)
      + streaming lane: exact/near-dup ingest  datapipe.streaming
        with O(drop) persisted state, plus the
        pre-vs-post-drop PSI drift monitor      versioning.quality_drift_psi

Usage::

    python examples/curate_corpus.py [corpus_path_or_sf_dir] [out_dir] [--leak-check]

Defaults to the sf0.001 testdata. ``--leak-check`` runs the
split-then-verify stage and writes splits/ + leakage_report/. Stages are lazy DataFrames, but the two
fan-out points — the hygiene output and the sampled corpus — are PINNED
before the seven writes read them: separate Spark actions share no plan,
so without the pin every artifact write re-ran the whole hygiene + curate
lineage from scratch (measured r10 at sf0.001: the end-to-end example
test fell from ~23 min to under 6 once the boundaries were pinned).
r12 refinement: the hygiene pin is an eager localCheckpoint, not a
persist — caching reuses the ROWS but every write still re-ran Catalyst
analysis over the deep hygiene tree, and that driver-side replanning was
most of the remaining wall (432 s → 51 s at sf0.001 from the swap alone;
see run_pipeline). At warehouse scale the same boundaries are parquet
stage writes.
"""

from __future__ import annotations

import os
import sys
from contextlib import contextmanager


def _load_corpus(spark, corpus_path: str):
    from spark_signals.io.docs import read_documents_jsonl

    if os.path.isdir(corpus_path) and os.path.exists(
        os.path.join(corpus_path, "documents.parquet")
    ):
        return spark.read.parquet(os.path.join(corpus_path, "documents.parquet"))
    return read_documents_jsonl(spark, corpus_path)


def _substitute(docs, rewritten, text_col):
    """Swap in a rewritten text ONLY where the stage modified the page
    (r7 advisory): untouched documents round-trip byte-identically —
    hygiene is a pure cleanup, and even modified pages keep their casing
    (both strips rebuild from case-preserving tokens)."""
    from pyspark.sql import functions as F

    return (
        docs.join(
            rewritten.select("doc_id", text_col, "was_modified"), "doc_id", "left"
        )
        .withColumn(
            "text",
            F.coalesce(
                F.when(F.col("was_modified"), F.col(text_col)), F.col("text")
            ),
        )
        .drop(text_col, "was_modified")
    )


def _hygiene(raw, span_strip: bool = False):
    """Page hygiene (C4/CCNet order: clean BEFORE any dedup digesting):
    markup/control/whitespace cleanup, then CORPUS-wide boilerplate
    passage removal (nav chrome / cookie banners repeating across pages),
    then intra-page repeated-passage strip. Pure text rewrites — hygiene
    never DROPS a document (that is curation's job); wordless docs pass
    through with their cleaned text.

    ``span_strip=True`` appends the cross-document exact duplicated-span
    cut (dedup.dedup_exact_spans_strip, the Lee-et-al. keep-first pass) —
    OPT-IN because it is a semantic choice, not pure hygiene: curate()'s
    exact-dup gate later drops whole duplicate DOCUMENTS, while the span
    pass rewrites partial overlaps (syndicated paragraphs, quoted blocks)
    out of every non-first page. Corpora heavy in partial syndication
    want it; defaults preserve the pinned artifact lineage."""
    from pyspark.sql import functions as F

    from spark_signals.datapipe.clean import clean_text
    from spark_signals.datapipe.dedup import (
        dedup_exact_spans_strip,
        dedup_intra_doc,
        strip_boilerplate_passages,
    )

    cleaned = raw.select("doc_id", "lang", "source").join(
        clean_text(raw).select("doc_id", F.col("text_clean").alias("text")),
        "doc_id",
    )
    deboiled = _substitute(
        cleaned, strip_boilerplate_passages(cleaned), "text_strip"
    )
    out = _substitute(deboiled, dedup_intra_doc(deboiled), "text_dedup")
    if span_strip:
        out = _substitute(out, dedup_exact_spans_strip(out), "text_dedup")
    return out.withColumn("n_chars", F.length("text"))


@contextmanager
def _checkpoint_scope(spark):
    """Deterministically free localCheckpoint blocks created in the scope.

    localCheckpointed blocks stay in the block manager until the JVM-side
    DataFrame is garbage-collected (ContextCleaner), so repeated
    run_pipeline calls in a long-lived session would accumulate storage —
    the leak the pre-r12 persist/unpersist pairing guarded against. The
    library's own persists are already paired with unpersist in finally,
    so any persistent RDD the scope leaves behind IS a pinned checkpoint:
    diff the context's persistent-RDD map and unpersist the additions.
    (Cluster caveat unchanged: localCheckpoint data is unrecoverable on
    executor loss — swap for a reliable checkpoint dir at cluster scale,
    spark_signals.checkpoint.pin.)"""
    jsc = spark.sparkContext._jsc
    before = {rid for rid in jsc.getPersistentRDDs().keySet().toArray()}
    try:
        yield
    finally:
        persistent = jsc.getPersistentRDDs()
        for rid in persistent.keySet().toArray():
            if rid not in before:
                persistent.get(rid).unpersist(False)


def run_pipeline(
    spark,
    corpus_path: str,
    out_dir: str,
    span_strip: bool = False,
    leak_check: bool = False,
) -> dict[str, int]:
    with _checkpoint_scope(spark):
        return _run_pipeline_inner(
            spark, corpus_path, out_dir, span_strip, leak_check
        )


def _run_pipeline_inner(
    spark,
    corpus_path: str,
    out_dir: str,
    span_strip: bool = False,
    leak_check: bool = False,
) -> dict[str, int]:
    # hygiene fans out into curate, the audit report, and the final join —
    # pin AND TRUNCATE it once. persist() alone is not enough: the cached
    # rows are reused, but every artifact write still re-runs Catalyst
    # ANALYSIS over the full hygiene tree (windows + nested higher-order
    # lambdas are expensive to replan), and that driver-side cost
    # dominated wall — measured at sf0.001: 432 s → 51 s default,
    # 1,200 s → 83 s with span_strip, identical counts, just by swapping
    # the persist for an eager localCheckpoint whose leaf plan makes
    # every downstream replan O(1). At warehouse scale the same boundary
    # is a parquet stage write (which truncates lineage the same way);
    # durability is one config key: spark.signals.checkpointDir routes
    # every pin to a reliable checkpoint (spark_signals.checkpoint.pin).
    docs = _hygiene(_load_corpus(spark, corpus_path), span_strip=span_strip)
    from spark_signals.checkpoint import pin

    docs = docs.transform(pin)
    return _run_pipeline_pinned(spark, docs, out_dir, leak_check=leak_check)


def _run_pipeline_pinned(
    spark, docs, out_dir: str, leak_check: bool = False
) -> dict[str, int]:
    from pyspark.sql import functions as F

    from spark_signals.checkpoint import pin

    from spark_signals.datapipe.curate import curate, curate_stats
    from spark_signals.datapipe.pack import pack_sequences
    from spark_signals.datapipe.pack import shuffle_windows
    from spark_signals.datapipe.sampling import (
        mixture_curriculum,
        mixture_manifest,
        sample_temperature,
    )
    from spark_signals.datapipe.text import tokenize_with_vocab
    from spark_signals.datapipe.balance import cluster_composition
    from spark_signals.io.docs import write_training_shards

    # 1. curation verdicts (audited: drop_reasons says WHY). The digest
    #    pass (dedup_exact) is pinned and SHARED with the filter-ablation
    #    audit artifact, and the verdicts relation itself is pinned and
    #    shared with the per-source curation report — neither the digest
    #    shuffle nor the whole multi-operator curate chain runs twice
    #    (r16 verdict #5). Each face's no-arg default stays the
    #    independently oracle-checked one.
    from spark_signals.datapipe.dedup import dedup_exact

    exact = dedup_exact(docs).transform(pin)
    verdicts = curate(docs, exact=exact).transform(pin)
    kept = (
        verdicts.filter(F.col("keep"))
        .select(
            "doc_id",
            "source",
            F.col("text_clean").alias("text"),  # PII already redacted
        )
        .join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    )

    # 2. rebalance sources (temperature sampling keeps the decision per-row
    #    and deterministic — re-runs pick the same documents)
    # the sampled corpus fans out into shards + five audit artifacts —
    # the second pinned stage boundary; localCheckpoint for the same
    # replanning-tax reason as the hygiene pin (run_pipeline)
    sampled = kept.join(
        sample_temperature(kept.select("doc_id", "source", "n_chars", "lang", "text"))
        .select("doc_id"),
        "doc_id",
    ).transform(pin)

    if leak_check:
        # 2b. split-then-verify (opt-in, like the span strip): publish
        # cluster-grain train/val/test splits of the SAMPLED corpus plus
        # the leakage report over them — near-dup twins co-travel by
        # construction, so the report's cross-split classes are empty
        # and the artifact pair is the publishable eval-integrity proof
        # (Lee et al. 2022 §6.2). One shared MinHash pass serves both.
        from spark_signals.datapipe.sampling import split_then_verify

        splits, leak_report = split_then_verify(
            sampled.select("doc_id", "text", "lang", "source", "n_chars")
        )
        splits.write.mode("overwrite").parquet(os.path.join(out_dir, "splits"))
        leak_report.write.mode("overwrite").parquet(
            os.path.join(out_dir, "leakage_report")
        )

    return _write_artifacts(
        spark, docs, kept, sampled, out_dir, exact=exact, verdicts=verdicts
    )


def _write_artifacts(
    spark, docs, kept, sampled, out_dir: str, exact=None, verdicts=None
) -> dict[str, int]:
    from spark_signals.checkpoint import pin
    from spark_signals.datapipe.curate import curate_stats
    from spark_signals.datapipe.pack import pack_sequences, shuffle_windows
    from spark_signals.datapipe.sampling import mixture_curriculum, mixture_manifest
    from spark_signals.datapipe.text import tokenize_with_vocab
    from spark_signals.datapipe.balance import cluster_composition
    from spark_signals.io.docs import write_training_shards

    # 3. packing manifest for the trainer's shard writers
    manifest = pack_sequences(sampled)

    # 4. writes: curated shards + manifest + audit artifacts
    write_training_shards(
        sampled.select("doc_id", "text", "lang", "source", "n_chars"),
        os.path.join(out_dir, "shards"),
        rows_per_shard=10_000,
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "pack_manifest"))
    curate_stats(docs, curated=verdicts).write.mode("overwrite").parquet(
        os.path.join(out_dir, "curation_report")
    )
    mixture_manifest(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "mixture_manifest")
    )
    # 5. token-id accounting under the sampled corpus's own top-V vocab —
    #    the OOV/coverage numbers a tokenizer decision reads, in the same
    #    whitespace token currency as the packing manifest
    tokenize_with_vocab(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "tokens_report")
    )
    # 6. pre-mixing balance diagnostic: topic-cluster x source composition
    #    of the SAMPLED corpus (what the mixture weights actually bought)
    cluster_composition(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "cluster_composition")
    )
    # 7. the trainer-facing schedule + read plan: per-epoch annealed mixing
    #    weights, and every packed window's global shuffle key/reader rank
    mixture_curriculum(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "curriculum_schedule")
    )
    shuffle_windows(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "window_order")
    )
    # 8. release audits: the dedup-aware token yield of the RAW input
    #    (what dedup bought, in epoch currency), the cross-source overlap
    #    matrix (which sources mirror each other, the licensing/provenance
    #    read), the filter-ablation grid (the what-if table behind the
    #    curate thresholds), and the k-anonymity gate over the RELEASED
    #    corpus's metadata. The expensive relation here is the verified
    #    MinHash pair list (shingle→signature→band→verify): it is computed
    #    ONCE, pinned, and shared by the cluster-derived yield report and
    #    the overlap matrix — not re-run per artifact (r15 advisory). The
    #    ablation's remaining passes (text_stats, dedup_exact) are
    #    row-local work + one digest shuffle — cheap next to the pair
    #    lane, and parameterizable the same way if an artifact set grows.
    from spark_signals.datapipe.curate import filter_ablation
    from spark_signals.datapipe.dedup import (
        dedup_clusters,
        dedup_minhash_lsh,
        source_overlap_matrix,
        token_yield_report,
    )
    from spark_signals.datapipe.scrub import kanonymity_report

    pairs = dedup_minhash_lsh(docs).transform(pin)
    clusters = dedup_clusters(docs, pairs=pairs)
    token_yield_report(docs, clusters=clusters).write.mode("overwrite").parquet(
        os.path.join(out_dir, "token_yield")
    )
    source_overlap_matrix(docs, pairs=pairs).write.mode("overwrite").parquet(
        os.path.join(out_dir, "source_overlap")
    )
    filter_ablation(docs, exact=exact).write.mode("overwrite").parquet(
        os.path.join(out_dir, "filter_ablation")
    )
    kanonymity_report(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "kanon_report")
    )

    return {
        "input_docs": docs.count(),
        "kept_docs": kept.count(),
        "sampled_docs": sampled.count(),
        "packed_docs": spark.read.parquet(os.path.join(out_dir, "pack_manifest")).count(),
        "tokenized_docs": spark.read.parquet(
            os.path.join(out_dir, "tokens_report")
        ).count(),
    }


def run_streaming_ingest(spark, corpus_path: str, out_dir: str) -> dict[str, int]:
    """The CONTINUOUS-ingestion lane of the same production story: the
    corpus arrives as ordered ingest drops (crawler output / submission
    queue), each drop streams through ``ingest_dedup_stream`` — exact dedup
    against the persisted digest index, exactly-once by batch-id partition
    — and the batch ``curate()`` composition then runs over the ACCUMULATED
    survivors. Simulated here as two availableNow runs over one source dir
    + one checkpoint (the nightly-batch shape); point the readStream at a
    Kafka document topic (io.docs.read_kafka_documents) for the live form.
    """
    from pyspark.sql import functions as F

    from spark_signals.datapipe.curate import curate
    from spark_signals.datapipe.streaming import ingest_dedup_stream

    docs = _load_corpus(spark, corpus_path)
    mid = docs.selectExpr("percentile(doc_id, 0.5) p").first()["p"]
    src = os.path.join(out_dir, "ingest_drops")
    dirs = dict(
        index_dir=os.path.join(out_dir, "digest_index"),
        survivors_dir=os.path.join(out_dir, "ingest_survivors"),
        checkpoint_dir=os.path.join(out_dir, "ingest_ckpt"),
        # NEAR-dup lane on: each drop's digest survivors also probe the
        # persisted MinHash band index (signature-level incremental
        # near-dup), and admitted documents append their band rows —
        # near-dup memory stays O(batch) per ingest like the digest index
        band_index_dir=os.path.join(out_dir, "band_index"),
        # PACKING lane on: each drop's admitted documents extend the
        # per-shard concatenation streams from the persisted tail, so the
        # training manifest is ready the moment ingest admits a drop —
        # O(drop) per batch, never a corpus re-pack
        pack_tail_dir=os.path.join(out_dir, "pack_tail"),
        pack_manifest_dir=os.path.join(out_dir, "stream_pack_manifest"),
    )
    for batch in (
        docs.filter(F.col("doc_id") <= mid),
        docs.filter(F.col("doc_id") > mid),
    ):
        batch.write.mode("append").parquet(src)
        q = ingest_dedup_stream(
            spark.readStream.schema(docs.schema).parquet(src), **dirs
        )
        q.awaitTermination()

    # same page-hygiene stage as the batch lane (stateless — it could also
    # run inside the stream, but ingest dedup keys on the RAW text digest,
    # so hygiene runs after ingest identity is settled). PINNED like the
    # batch lane's hygiene boundary (r17): curate() references its input
    # from ~8 component branches, and an unpinned hygiene tree was being
    # replanned and re-executed per branch — the exact replanning tax the
    # r12 batch-lane measurement (432 s → 51 s) already charged.
    from spark_signals.checkpoint import pin

    survivors = _hygiene(
        spark.read.parquet(dirs["survivors_dir"]).select(*docs.columns)
    ).transform(pin)
    verdicts = curate(survivors)
    verdicts.write.mode("overwrite").parquet(
        os.path.join(out_dir, "stream_curation")
    )
    # count the kept docs from the artifact just written instead of
    # re-running the curate chain a second time for one scalar
    stream_kept = (
        spark.read.parquet(os.path.join(out_dir, "stream_curation"))
        .filter(F.col("keep"))
        .count()
    )
    # drift monitor between ingest states: OLD = the corpus as of drop 0
    # (its batch_id partition), NEW = the accumulated corpus after the
    # latest drop — the PSI read a retrain decision checks. Fixed
    # PSI_BINS-row output; one map-side-combined aggregate per version.
    from spark_signals.datapipe.versioning import quality_drift_psi

    pre_drop = spark.read.parquet(
        os.path.join(dirs["survivors_dir"], "batch_id=0")
    ).select("text")
    post_drop = spark.read.parquet(dirs["survivors_dir"]).select("text")
    quality_drift_psi(pre_drop, post_drop).write.mode("overwrite").parquet(
        os.path.join(out_dir, "quality_drift")
    )
    return {
        "input_docs": docs.count(),
        "ingested_survivors": survivors.count(),
        "stream_kept_docs": stream_kept,
        "neardup_index_docs": spark.read.parquet(dirs["band_index_dir"])
        .select("doc_id")
        .distinct()
        .count(),
        "stream_packed_docs": spark.read.parquet(dirs["pack_manifest_dir"])
        .count(),
    }


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    leak_check = "--leak-check" in argv
    argv = [a for a in argv if a != "--leak-check"]
    corpus = argv[0] if argv else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/spark_signals_curated"

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from spark_signals.session import get_spark

    spark = get_spark("curate-corpus")
    counts = run_pipeline(spark, corpus, out_dir, leak_check=leak_check)
    counts.update(run_streaming_ingest(spark, corpus, os.path.join(out_dir, "stream")))
    for k, v in counts.items():
        print(f"{k}: {v}")
    print(
        f"artifacts under {out_dir}: shards/ pack_manifest/ curation_report/ "
        f"mixture_manifest/ tokens_report/ cluster_composition/ "
        f"curriculum_schedule/ window_order/ token_yield/ source_overlap/ "
        f"filter_ablation/ kanon_report/ stream/stream_curation/ "
        f"stream/stream_pack_manifest/ stream/quality_drift/"
        + (" splits/ leakage_report/" if leak_check else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
