"""Scale-evidence run: datapipe headliners at sf1-equivalent size.

The driver testdata stops at sf0.1 (5k docs / 2k vectors). This tool
materializes a 10x corpus ("sf1": 50k docs / 20k vectors) by replicating
sf0.1 with per-replica re-keyed ids and content perturbation, then times
the datapipe headliners on it so SCALE.md's 100 TB arguments ride on a
measured scaling trend, not just plan shapes.

Perturbation design (what makes the scaled corpus FAIR, not degenerate):

* documents: every word in replica r>0 gets an ``_r`` suffix, so replicas
  share no shingles/digests — cross-replica similarity is zero, and the
  within-replica near-dup structure (what the dedup operators actually
  chew on) is reproduced 10x, like an organically larger crawl. A naive
  verbatim copy would instead hand every doc 9 exact duplicates and blow
  candidate generation up quadratically in the replica count.
* embeddings: per-(vec_id, dim) deterministic +-1e-3 jitter — same
  geometry per replica, no artificial exact-duplicate vectors.

Usage::

    python tools/scale_run.py [--repl 10] [--out /tmp/spark_signals_sf1]

Prints one JSON line {"op": sec, ...} and a build line. Timings are one
cold pass per operator (these are minutes-long jobs; the bench.py
interleaved-pass protocol is for the second-scale suite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_BASE = "/root/testdata/sf0.1"


def build_corpus(spark, out_dir: str, repl: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_BASE}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vecs = emb.agg(F.max("vec_id")).first()[0] + 1

    doc_parts = []
    for r in range(repl):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n_docs))
        if r > 0:
            part = part.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", rf"$1_{r}")
            ).withColumn("n_chars", F.length("text"))
        doc_parts.append(part)
    big_docs = doc_parts[0]
    for p in doc_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb_parts = []
    for r in range(repl):
        part = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * n_vecs))
        if r > 0:
            jitter = F.expr(
                f"transform(embedding, (x, i) -> cast(x + ((vec_id * 31 + i + {r}) % 7 - 3) * 0.001 as float))"
            )
            part = part.withColumn("embedding", jitter)
        emb_parts.append(part)
    big_emb = emb_parts[0]
    for p in emb_parts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    build_events(spark, out_dir, repl)


def build_events(spark, out_dir: str, repl: int) -> None:
    """Replicate the tick source (events.parquet) for the pipeline-chain
    decade rows (r16 verdict #3): replica r re-keys user_id (→ product_id)
    and event_id (→ sequence), keeping the time range — the horizontal
    growth a window-partitioned chain actually sees at 100 TB is MORE
    instruments, not longer per-instrument histories, so per-key window
    state stays bounded while total rows scale 10x/100x."""
    from pyspark.sql import functions as F

    from spark_signals.io.sources import read_table

    ev = read_table(spark, SF_BASE, "events")
    bounds = ev.agg(
        F.max("user_id").alias("u"), F.max("event_id").alias("e")
    ).first()
    n_users, n_events = bounds["u"] + 1, bounds["e"] + 1
    parts = []
    for r in range(repl):
        parts.append(
            ev.withColumn("user_id", F.col("user_id") + F.lit(r * n_users))
            .withColumn("event_id", F.col("event_id") + F.lit(r * n_events))
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_signals_sf1")
    ap.add_argument("ops", nargs="*", help="subset of operator names")
    args = ap.parse_args()

    from spark_signals.session import get_spark

    spark = get_spark("scale-run")
    marker = os.path.join(args.out, "_built")
    if not os.path.exists(marker):
        t0 = time.time()
        build_corpus(spark, args.out, args.repl)
        open(marker, "w").write(str(args.repl))
        print(f"built {args.out} (repl={args.repl}) in {time.time() - t0:.1f}s")
    elif not os.path.exists(os.path.join(args.out, "events.parquet")):
        # corpus built by a pre-r17 run: backfill the tick replica only
        t0 = time.time()
        build_events(spark, args.out, args.repl)
        print(f"backfilled events (repl={args.repl}) in {time.time() - t0:.1f}s")

    docs = spark.read.parquet(os.path.join(args.out, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(args.out, "embeddings.parquet"))
    n_docs, n_vecs = docs.count(), emb.count()

    from spark_signals.datapipe import dedup as D
    from spark_signals.datapipe.classifier import quality_logreg
    from spark_signals.datapipe.clean import clean_text
    from spark_signals.datapipe.curate import curate
    from spark_signals.datapipe.embed import embed_chunks
    from spark_signals.datapipe.pack import pack_sequences
    from spark_signals.datapipe.bpe import bpe_token_counts, bpe_train
    from spark_signals.datapipe.retrieval import (
        bm25_topk,
        bm25_topk_queries,
        dense_ivf_topk,
        hybrid_rrf_ivf_topk,
        hybrid_rrf_topk,
    )
    from spark_signals.datapipe import sampling as SMP
    from spark_signals.datapipe.text import ccnet_lm_buckets, vocab_coverage

    OPS = {
        "dedup_minhash_lsh": lambda: D.dedup_minhash_lsh(docs),
        "dedup_passages": lambda: D.dedup_passages(docs),
        "pack_sequences": lambda: pack_sequences(docs),
        "embed_chunks": lambda: embed_chunks(docs),
        "quality_logreg": lambda: quality_logreg(docs),
        "semdedup": lambda: D.semdedup(emb),  # derived k (semdedup_k)
        "curate": lambda: curate(docs),
        # r07 additions
        "clean_text": lambda: clean_text(docs),
        "vocab_coverage": lambda: vocab_coverage(docs),
        "bm25_topk": lambda: bm25_topk(docs),
        "hybrid_rrf_topk": lambda: hybrid_rrf_topk(docs),
        "ccnet_lm_buckets": lambda: ccnet_lm_buckets(docs),
        "dedup_intra_doc": lambda: D.dedup_intra_doc(docs),
        # r08 additions
        "dense_ivf_topk": lambda: dense_ivf_topk(docs),
        "hybrid_rrf_ivf_topk": lambda: hybrid_rrf_ivf_topk(docs),
        "bm25_topk_queries": lambda: bm25_topk_queries(docs),
        "bpe_train": lambda: bpe_train(docs),
        "bpe_token_counts": lambda: bpe_token_counts(docs),
        "dedup_incr_neardup": lambda: D.dedup_incr_neardup_snapshot(docs),
        "strip_boilerplate": lambda: D.strip_boilerplate_passages(docs),
        "decontam_fuzzy": lambda: _decontam_fuzzy(docs),
        "dsir_logratio": lambda: SMP.dsir_snapshot(docs, "src0"),
        "cluster_composition": lambda: _cluster_composition(docs),
        "knn_join_ivf": lambda: _knn_join_ivf(emb),
        "bpe_fertility": lambda: _bpe_fertility(docs),
        "mixture_curriculum": lambda: _mixture_curriculum(docs),
        "shuffle_windows": lambda: _shuffle_windows(docs),
        "decontam_report": lambda: _decontam_report(docs),
        "winnow_pairs": lambda: D.winnow_fingerprint_pairs(docs),
        "zipf_lang_stats": lambda: _zipf_lang_stats(docs),
        "media_phash_neardup": lambda: _media_phash(docs),
        # r10 additions
        "bpe_train_prod": lambda: bpe_train(docs, n_merges=2000, batch=64, min_freq=2),
        "bm25_topk_1kq": lambda: _bm25_1kq(docs),
        "media_phash_decoded": lambda: _media_phash_decoded(docs),
        # r11 additions: the incremental band-index lanes' snapshot faces
        "media_phash_incr": lambda: _media_phash_incr(docs),
        "embedding_incr_neardup": lambda: _embedding_incr(emb),
        "knn_join_ivf_sampled": lambda: _knn_join_sampled(emb),
        # r12 additions: the exact duplicated-span family
        "dedup_exact_spans": lambda: D.dedup_exact_spans(docs),
        "dedup_exact_spans_strip": lambda: D.dedup_exact_spans_strip(docs),
        "dedup_spans_incr": lambda: D.dedup_spans_incr_snapshot(docs),
        "decontam_spans": lambda: _decontam_spans(docs),
        "decontam_scrub": lambda: _decontam_scrub(docs),
        # r13 additions: the D3 layout face (zone maps of both layouts)
        # and the span-provenance face (capped partner attribution)
        "zorder_zonemap": lambda: _zorder_zonemap(docs),
        "dedup_exact_spans_attrib": lambda: D.dedup_exact_spans_attrib(docs),
        "split_leakage_report": lambda: SMP.split_leakage_report(docs),
        "split_clustered_leakproof": lambda: SMP.split_leakage_clustered(docs),
        # r14 addition: the token-budget keep-list (budget scaled with the
        # corpus so the fill stays a strict subset at any replica count)
        "mixture_budget_manifest": lambda: SMP.mixture_budget_manifest(
            docs, budget_tokens=10_000 * max(1, args.repl)
        ),
        "pack_efficiency": lambda: _pack_efficiency(docs),
        "pack_incremental": lambda: _pack_incremental(docs),
        "ann_recall_report": lambda: _ann_recall(emb),
        # r15 additions: the release-audit quartet
        "filter_ablation": lambda: _filter_ablation(docs),
        "token_yield_report": lambda: D.token_yield_report(docs),
        "kanon_suppression": lambda: _kanon(docs),
        "minhash_calibration": lambda: D.minhash_calibration_report(docs),
        # the sampled production posture keeps its own decade evidence as
        # the code evolves (r15 verdict #8): same audit, first band only
        "minhash_calibration_sampled": lambda: D.minhash_calibration_report(
            docs, sample_bands=1
        ),
        "source_overlap_matrix": lambda: D.source_overlap_matrix(docs),
        "quality_drift_psi": lambda: _quality_drift(docs),
        # r16 additions: the continuous-provenance pair
        "source_overlap_incr": lambda: D.source_overlap_incr_snapshot(docs),
        "decontam_source_matrix": lambda: _decontam_source_matrix(docs),
        # r17 additions (r16 verdict #3): decade rows for the two r16
        # structural rewrites — the digest-window exact dedup and the
        # fused single-scan pipeline chain (reads the replicated
        # events.parquet via the registry function, so the timed plan IS
        # the declared query's)
        "dedup_exact": lambda: D.dedup_exact(docs),
        "tfidf_top_terms": lambda: _tfidf(docs),
        "ann_ivf_topk": lambda: _ann_ivf(emb),
        "strategy_metrics": lambda: _strategy_metrics(),
        "positions_costs": lambda: _positions_costs(),
    }

    def _ann_ivf(e):
        from spark_signals.datapipe.similarity import ann_ivf_topk

        return ann_ivf_topk(e)

    def _tfidf(d):
        from spark_signals.datapipe.text import tfidf_top_terms

        return tfidf_top_terms(d)

    def _strategy_metrics():
        from spark_signals.parity import q_metrics

        return q_metrics(spark, args.out)

    def _positions_costs():
        from spark_signals.parity import q_positions_costs

        return q_positions_costs(spark, args.out)

    def _decontam_source_matrix(d):
        from spark_signals.datapipe.decontam import decontam_source_matrix_snapshot

        return decontam_source_matrix_snapshot(d)

    def _quality_drift(d):
        from spark_signals.datapipe.versioning import quality_drift_snapshot

        return quality_drift_snapshot(d)

    def _filter_ablation(d):
        from spark_signals.datapipe.curate import filter_ablation

        return filter_ablation(d)

    def _kanon(d):
        from spark_signals.datapipe.scrub import kanonymity_report

        return kanonymity_report(d)



    def _ann_recall(e):
        from spark_signals.datapipe.similarity import ann_recall_report

        return ann_recall_report(e)

    def _pack_efficiency(d):
        from spark_signals.datapipe.pack import pack_efficiency_report

        return pack_efficiency_report(d)

    def _pack_incremental(d):
        from spark_signals.datapipe.pack import pack_incremental_snapshot

        return pack_incremental_snapshot(d)

    def _zorder_zonemap(d):
        from spark_signals.io.layout import zorder_zonemap

        return zorder_zonemap(d)

    def _bpe_fertility(d):
        from spark_signals.datapipe.bpe import bpe_fertility_by_lang

        return bpe_fertility_by_lang(d)

    def _mixture_curriculum(d):
        from spark_signals.datapipe.sampling import mixture_curriculum

        return mixture_curriculum(d)

    def _shuffle_windows(d):
        from spark_signals.datapipe.pack import shuffle_windows

        return shuffle_windows(d)

    def _decontam_report(d):
        from spark_signals.datapipe.decontam import decontam_report_snapshot

        return decontam_report_snapshot(d)

    def _knn_join_ivf(e):
        from spark_signals.datapipe.similarity import knn_join_ivf

        return knn_join_ivf(e)

    def _knn_join_sampled(e):
        # the production default: sampled trainer engaged (cap << corpus)
        from spark_signals.datapipe.similarity import knn_join_ivf

        return knn_join_ivf(e, train_cap=10_000)

    def _media_phash_incr(d):
        from spark_signals.datapipe.multimodal import media_phash_incr_snapshot

        return media_phash_incr_snapshot(d)

    def _decontam_spans(d):
        from spark_signals.datapipe.decontam import decontam_spans

        return decontam_spans(d)

    def _decontam_scrub(d):
        from spark_signals.datapipe.decontam import decontam_scrub

        return decontam_scrub(d)

    def _embedding_incr(e):
        from spark_signals.datapipe.dedup import embedding_incr_neardup_snapshot

        return embedding_incr_neardup_snapshot(e)

    def _decontam_fuzzy(d):
        from spark_signals.datapipe.decontam import decontaminate_fuzzy

        return decontaminate_fuzzy(d, eval_source="src0")

    def _cluster_composition(d):
        from spark_signals.datapipe.balance import cluster_composition

        return cluster_composition(d)

    def _zipf_lang_stats(d):
        from spark_signals.datapipe.text import zipf_lang_stats

        return zipf_lang_stats(d)

    def _media_phash(d):
        from spark_signals.datapipe.multimodal import media_phash_neardup, synthesize_media

        return media_phash_neardup(synthesize_media(d))

    def _media_phash_decoded(d):
        from spark_signals.datapipe.multimodal import (
            media_phash_neardup_decoded,
            synthesize_media,
        )

        return media_phash_neardup_decoded(synthesize_media(d), force_stub=True)

    def _bm25_1kq(d):
        # 1,000 synthetic 3-term queries drawn deterministically from the
        # corpus vocabulary (md5 order): the many-query decontamination /
        # exemplar-sourcing shape — the corpus tf relation must amortize
        # across all 1k queries in one lineage.
        from pyspark.sql import Window

        from spark_signals.datapipe.retrieval import bm25_topk_queries
        from spark_signals.datapipe.text import words_col
        from spark_signals.datapipe.util import explode_strings

        from pyspark.sql import functions as F

        words = (
            explode_strings(
                d.select(words_col(F.col("text")).alias("ws")), F.col("ws"), "term"
            )
            .filter(F.col("term") != "")
            .distinct()
            .orderBy(F.md5("term"))
            .limit(3000)
        )
        w = Window.orderBy(F.md5("term"))
        qrel = words.select(
            F.concat(
                F.lit("q"), ((F.row_number().over(w) - 1) / 3).cast("int")
            ).alias("query_id"),
            "term",
        )
        return bm25_topk_queries(d, qrel)
    names = args.ops or list(OPS)
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        # noop sink materializes every column/operator without output IO —
        # count() would let Catalyst prune the work being measured
        OPS[name]().write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        print(f"[{name}] {timings[name]}s", flush=True)
    print(
        json.dumps(
            {
                "corpus": {"docs": n_docs, "vectors": n_vecs, "repl": args.repl},
                "timings_sec": timings,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
