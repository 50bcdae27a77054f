"""Recall report for the ANN family: every approximate variant measured
against the brute-force exact top-k on the same corpus.

Usage: python tools/ann_recall.py [sf_dir]

Prints one line per variant: recall@TOP_K, rows, and the variant's scan
economics (what fraction of the corpus the method touches per query at
scale — the quantity recall is being traded against).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from spark_signals.datapipe import similarity as SIM
    from spark_signals.io.sources import read_table
    from spark_signals.session import get_spark

    spark = get_spark("ann-recall")
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_cells = emb.select("label").distinct().count()

    ref = {
        (r["query_id"], r["match_id"])
        for r in SIM.ann_bruteforce_topk(emb).collect()
    }

    variants = [
        ("ivf_label", SIM.ann_ivf_topk, f"~{SIM.NPROBE}/{n_cells} cells ≈ {SIM.NPROBE / n_cells:.0%} of corpus"),
        ("ivf_trained", SIM.ann_ivf_trained_topk, f"~{SIM.NPROBE}/{SIM.KMEANS_K} trained cells ≈ {SIM.NPROBE / SIM.KMEANS_K:.0%} of corpus"),
        ("ivfpq_adc", SIM.ann_ivfpq_topk, f"codes scan (32× compressed) + {SIM.PQ_RERANK}/{n} ≈ {SIM.PQ_RERANK / n:.1%} full vectors"),
    ]
    print(f"corpus={n} queries={SIM.N_QUERIES} k={SIM.TOP_K} (brute force = recall 1.0, 100% scan)")
    for name, op, economics in variants:
        got = {(r["query_id"], r["match_id"]) for r in op(emb).collect()}
        recall = len(got & ref) / len(ref)
        print(f"{name:12s} recall@{SIM.TOP_K}={recall:.3f}  scan: {economics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
