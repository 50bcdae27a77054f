"""Steady-state evidence for the incremental packing lane: per-drop wall
must be INDEPENDENT of corpus size.

The driver-checked face (``pack_incremental_snapshot``) times a snapshot
rebuild — tail built from 4/5 of the corpus, top fifth packed — so its
decade row scales WITH the corpus and says nothing about the production
claim: a nightly drop extends the persisted per-shard tail in O(drop),
reading only the batch plus the S-row tail relation, never the packed
corpus (r14 verdict Next #4). This tool measures that claim directly,
with the same protocol as the streaming-span steady-state runs:

1. build corpora at 1x / 10x / 100x sf0.1 (tools/scale_run.py's
   replicator — re-keyed ids, perturbed text);
2. per corpus: build and PERSIST ``pack_tail(corpus)`` once (the
   bootstrap — O(corpus), priced separately, amortized over every
   future drop);
3. per corpus: pack the SAME fixed 5k-doc drop (sf0.1 documents,
   re-keyed above the corpus max to honor the append-only id
   discipline) against the persisted tail — write the drop manifest +
   the updated tail, exactly the nightly job's work. Two passes, second
   timing reported (first pays page-cache cold IO; memory: interleave
   and discard the cold slot).

Flat drop-wall across the three corpus sizes = the O(drop) claim,
measured. Usage::

    python tools/pack_drop_scale.py [--out-root /tmp/spark_signals_packdrop]

Prints one JSON line:
  {"bootstrap": {"1": s, "10": s, "100": s},
   "drop_wall": {"1": s, "10": s, "100": s},
   "drop_rows": N, "corpus_docs": {...}}
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
    ap.add_argument("--out-root", default="/tmp/spark_signals_packdrop")
    ap.add_argument("--repls", type=int, nargs="*", default=list(REPLS))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_signals.datapipe.pack import pack_incremental, pack_tail
    from spark_signals.session import get_spark
    from tools.scale_run import build_corpus

    spark = get_spark("pack-drop-scale")
    drop_src = spark.read.parquet(f"{SF_BASE}/documents.parquet")

    bootstrap: dict[str, float] = {}
    drop_wall: dict[str, float] = {}
    corpus_docs: dict[str, int] = {}
    drop_rows = 0

    for repl in args.repls:
        out = os.path.join(args.out_root, f"x{repl}")
        marker = os.path.join(out, "_built")
        if not os.path.exists(marker):
            build_corpus(spark, out, repl)
            open(marker, "w").write(str(repl))
        docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
        corpus_docs[str(repl)] = docs.count()

        # bootstrap: the one-time O(corpus) tail build, persisted — the
        # state every later drop extends
        tail_path = os.path.join(out, "pack_tail.parquet")
        t0 = time.time()
        pack_tail(docs).write.mode("overwrite").parquet(tail_path)
        bootstrap[str(repl)] = round(time.time() - t0, 3)

        # the FIXED drop: same 5k docs at every corpus size, ids re-keyed
        # above the corpus max (append-only discipline)
        base = docs.agg(F.max("doc_id")).first()[0] + 1
        drop = drop_src.withColumn("doc_id", F.col("doc_id") + F.lit(base))

        walls = []
        for _ in range(2):  # second slot = warm timing
            tail = spark.read.parquet(tail_path)
            t0 = time.time()
            manifest, new_tail = pack_incremental(drop, tail)
            n = manifest.count()
            new_tail.write.mode("overwrite").parquet(
                os.path.join(out, "pack_tail_next.parquet")
            )
            walls.append(time.time() - t0)
            drop_rows = n
        drop_wall[str(repl)] = round(walls[-1], 3)

    print(
        json.dumps(
            {
                "bootstrap": bootstrap,
                "drop_wall": drop_wall,
                "drop_rows": drop_rows,
                "corpus_docs": corpus_docs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
