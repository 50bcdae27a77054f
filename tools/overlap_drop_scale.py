"""Steady-state evidence for the continuous overlap lane: per-drop wall
against growing corpora.

The driver-checked face (``source_overlap_incr_snapshot``) times a
snapshot rebuild — bootstrap over 4/5 of the corpus, top fifth landed as
the batch — so its decade row scales WITH the corpus and says nothing
about the production claim: an ingest drop updates the provenance matrix
reading only the batch, the persisted band index (probe equi-join), and
the candidate-bounded slice of history text. This tool measures that
claim directly, the pack_drop_scale protocol:

1. build corpora at 1x / 10x / 100x sf0.1;
2. per corpus: build and PERSIST ``band_index(corpus)`` once (the
   bootstrap — O(corpus), priced separately, amortized over every
   future drop);
3. per corpus: land the SAME fixed 5k-doc drop (sf0.1 documents,
   re-keyed above the corpus max) through ``_overlap_step`` against the
   persisted index + the corpus docs relation — materializing the cell
   delta and the band delta, exactly the per-batch work of
   ``process_overlap_batch``. Two passes, second timing reported.

The honest contract: the probe is an equi-join against the FULL index
relation, so in this unbucketed local layout the scan cost grows with
the corpus — at warehouse scale the index is bucketed on (k1, k2)
(io.sinks.write_bucketed) and the probe shuffles only the batch side.
The drop wall here prices the local scan + candidate-bounded verify;
sub-linear growth vs the 100x corpus is the claim. Usage::

    python tools/overlap_drop_scale.py [--out-root ...] [--repls 1 10 100]

Prints one JSON line:
  {"bootstrap": {...}, "drop_wall": {...}, "delta_cells": N,
   "corpus_docs": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_BASE = "/root/testdata/sf0.1"
REPLS = (1, 10, 100)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default="/tmp/spark_signals_overlapdrop")
    ap.add_argument("--repls", type=int, nargs="*", default=list(REPLS))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_signals.datapipe.dedup import _overlap_step, band_index
    from spark_signals.session import get_spark
    from tools.scale_run import build_corpus

    spark = get_spark("overlap-drop-scale")
    drop_src = spark.read.parquet(f"{SF_BASE}/documents.parquet")

    bootstrap: dict[str, float] = {}
    drop_wall: dict[str, float] = {}
    corpus_docs: dict[str, int] = {}
    delta_cells = 0

    for repl in args.repls:
        out = os.path.join(args.out_root, f"x{repl}")
        marker = os.path.join(out, "_built")
        if not os.path.exists(marker):
            build_corpus(spark, out, repl)
            open(marker, "w").write(str(repl))
        docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
        corpus_docs[str(repl)] = docs.count()

        idx_path = os.path.join(out, "band_index.parquet")
        t0 = time.time()
        band_index(docs).write.mode("overwrite").parquet(idx_path)
        bootstrap[str(repl)] = round(time.time() - t0, 3)

        base = docs.agg(F.max("doc_id")).first()[0] + 1
        drop = drop_src.withColumn("doc_id", F.col("doc_id") + F.lit(base))

        walls = []
        for i in range(2):  # second slot = warm timing
            index = spark.read.parquet(idx_path)
            t0 = time.time()
            cells, delta = _overlap_step(drop, index, docs)
            cells.write.mode("overwrite").parquet(
                os.path.join(out, "cells_delta.parquet")
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(out, "band_delta.parquet")
            )
            walls.append(time.time() - t0)
            if i == 1:
                delta_cells = cells.count()
        drop_wall[str(repl)] = round(walls[-1], 3)

    print(
        json.dumps(
            {
                "bootstrap": bootstrap,
                "drop_wall": drop_wall,
                "delta_cells": delta_cells,
                "corpus_docs": corpus_docs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
