"""End-to-end retrieval stack over a document corpus — the second
north-star surface next to examples/curate_corpus.py (curation builds the
training set; this serves queries against it).

One runnable path through the retrieval surface:

    corpus (parquet or JSONL)                   io.docs / parquet scan
      → overlapping word-window chunks          datapipe.chunk.chunk_documents
      → feature-hashed chunk embeddings         datapipe.embed.embed_chunks
      → trained IVF index over the chunks       datapipe.similarity
        (Lloyd k-means; the offline build)        .kmeans_train / kmeans_assign
      → serving:
          chunk-level ANN neighbors             similarity.ann_ivf_trained_topk
          multi-query lexical BM25              retrieval.bm25_topk_queries
          hybrid dense+lexical RRF, dense arm   retrieval.hybrid_rrf_ivf_topk
            through the IVF cell probe
      + artifacts: the centroid relation (the persistable index), per-query
        result tables, and a one-line corpus/index summary.

Usage::

    python examples/retrieval_stack.py [corpus_path_or_sf_dir] [out_dir]

Defaults to the sf0.001 testdata. The index build (chunk/embed/train) is
the amortized offline cost; each serving query touches one k-row centroid
aggregate and only the probed cells — the shapes the plan tests pin
(tests/test_plans.py: dense IVF probe, BM25 shuffle contract).
"""

from __future__ import annotations

import os
import sys

QUERIES = {
    "q_hash": ("hash", "join", "spark"),
    "q_scan": ("scan", "filter", "sort"),
}


def _load_corpus(spark, corpus_path: str):
    from spark_signals.io.docs import read_documents_jsonl

    if os.path.isdir(corpus_path) and os.path.exists(
        os.path.join(corpus_path, "documents.parquet")
    ):
        return spark.read.parquet(os.path.join(corpus_path, "documents.parquet"))
    return read_documents_jsonl(spark, corpus_path)


def run_pipeline(spark, corpus_path: str, out_dir: str, queries=None) -> dict:
    """Build the index, serve every query through all three paths, write
    the artifacts. Returns the result DataFrames keyed by artifact name."""
    from pyspark.sql import functions as F

    from spark_signals.datapipe.embed import embed_chunks
    from spark_signals.datapipe.retrieval import (
        bm25_topk_queries,
        build_dense_ivf_index,
        hybrid_rrf_ivf_topk,
    )
    from spark_signals.datapipe.similarity import (
        ann_ivf_trained_topk,
        kmeans_train,
    )

    queries = QUERIES if queries is None else queries
    docs = _load_corpus(spark, corpus_path)

    # ---- offline index build: chunks → embeddings → trained centroids
    from spark_signals.checkpoint import pin

    chunk_emb = embed_chunks(docs).transform(pin)
    centroids = kmeans_train(
        chunk_emb.select("vec_id", "embedding")
    )  # (cluster_id, dim, c_val) — the persistable index artifact
    # ---- chunk-level ANN: each benchmark chunk's neighbors via the
    # trained cell probe (vec_id < N_QUERIES act as the probe set)
    ann = ann_ivf_trained_topk(chunk_emb.select("vec_id", "embedding"))

    # ---- lexical: every query scored in ONE corpus pass
    lex = bm25_topk_queries(docs, queries)

    # ---- hybrid: per query, BM25 ∪ IVF-probed dense arm fused by RRF.
    # The doc-level dense index trains ONCE and serves every query (the
    # index economics the per-query convenience path would throw away)
    doc_index = build_dense_ivf_index(docs)
    hybrids = []
    for qid in sorted(queries):
        h = hybrid_rrf_ivf_topk(docs, queries[qid], index=doc_index).withColumn(
            "query_id", F.lit(qid)
        )
        hybrids.append(h)
    hybrid = hybrids[0]
    for h in hybrids[1:]:
        hybrid = hybrid.unionByName(h)

    results = {
        "ivf_centroids": centroids,
        "ann_chunk_neighbors": ann,
        "bm25_results": lex,
        "hybrid_results": hybrid,
    }
    for name, df in results.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
    summary = {
        "n_docs": docs.count(),
        "n_chunks": chunk_emb.count(),
        "n_queries": len(queries),
        "bm25_rows": lex.count(),
        "hybrid_rows": hybrid.count(),
    }
    print(summary)
    return results


def main() -> int:
    from spark_signals.session import get_spark

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/retrieval_stack_out"
    spark = get_spark("retrieval-stack-example")
    run_pipeline(spark, corpus, out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
