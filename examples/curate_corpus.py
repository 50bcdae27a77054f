"""End-to-end training-data pipeline over a document corpus.

One runnable path through the datapipe surface — the pipeline a user of
this engine actually assembles:

    raw JSONL (or parquet)                      io.docs.read_documents_jsonl
      → curate: dedup-first gate set            datapipe.curate.curate
        (exact dup, passage dup, repetition,
         LM band, decontamination, length
         band; PII redacted in-place)
      → temperature-rebalanced sampling         datapipe.sampling
      → packing manifest (ctx windows)          datapipe.pack
      → size-bounded training shards            io.docs.write_training_shards
      + audit artifacts: per-source curation report + mixing manifest

Usage::

    python examples/curate_corpus.py [corpus_path_or_sf_dir] [out_dir]

Defaults to the sf0.001 testdata. Every stage is a lazy DataFrame — the
only actions are the final writes, so Catalyst sees the whole pipeline and
AQE reuses the shared subplans (the curate components' digest aggregates).
"""

from __future__ import annotations

import os
import sys


def run_pipeline(spark, corpus_path: str, out_dir: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    from spark_signals.datapipe.curate import curate, curate_stats
    from spark_signals.datapipe.pack import pack_sequences
    from spark_signals.datapipe.sampling import mixture_manifest, sample_temperature
    from spark_signals.io.docs import read_documents_jsonl, write_training_shards

    if os.path.isdir(corpus_path) and os.path.exists(
        os.path.join(corpus_path, "documents.parquet")
    ):
        docs = spark.read.parquet(os.path.join(corpus_path, "documents.parquet"))
    else:
        docs = read_documents_jsonl(spark, corpus_path)

    # 1. curation verdicts (audited: drop_reasons says WHY)
    verdicts = curate(docs)
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
    sampled = kept.join(
        sample_temperature(kept.select("doc_id", "source", "n_chars", "lang", "text"))
        .select("doc_id"),
        "doc_id",
    )

    # 3. packing manifest for the trainer's shard writers
    manifest = pack_sequences(sampled)

    # 4. writes: curated shards + manifest + audit artifacts
    write_training_shards(
        sampled.select("doc_id", "text", "lang", "source", "n_chars"),
        os.path.join(out_dir, "shards"),
        rows_per_shard=10_000,
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "pack_manifest"))
    curate_stats(docs).write.mode("overwrite").parquet(
        os.path.join(out_dir, "curation_report")
    )
    mixture_manifest(sampled).write.mode("overwrite").parquet(
        os.path.join(out_dir, "mixture_manifest")
    )

    return {
        "input_docs": docs.count(),
        "kept_docs": kept.count(),
        "sampled_docs": sampled.count(),
        "packed_docs": spark.read.parquet(os.path.join(out_dir, "pack_manifest")).count(),
    }


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    corpus = argv[0] if argv else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/spark_signals_curated"

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from spark_signals.session import get_spark

    counts = run_pipeline(get_spark("curate-corpus"), corpus, out_dir)
    for k, v in counts.items():
        print(f"{k}: {v}")
    print(f"artifacts under {out_dir}: shards/ pack_manifest/ curation_report/ mixture_manifest/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
