"""Zone-registry serving path at realistic file counts (r13 verdict #4).

The r13 decade row measured the AUDIT face (64 files). This tool measures
the SERVING path — ``read_pruned_registered`` — over a multi-thousand-file
z-ordered table, separating the costs the 100 TB story actually turns on:

* driver planning: registry read + table listing + zone prune (the part
  that is O(files) on the driver);
* Spark's own baseline: plan + execute the same filter over ALL files
  (what serving pays without the registry);
* the pruned execute (what it pays with it);
* ``zone_registry_delta`` after an appended batch (O(new files) claim).

Usage::

    python tools/layout_scale.py [--files 4096] [--repl 10] [--out DIR]

Prints one JSON line. One cold pass per leg (minutes-scale legs; the
interleaved best-of protocol is for the second-scale bench suite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_BASE = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4096)
    ap.add_argument("--repl", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_signals_layout_scale")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_signals.io import layout as L

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .appName("layout-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n_docs))
        for r in range(args.repl)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.withColumn(
        "lang_code",
        (F.ascii(F.substring("lang", 1, 1)) * 256 + F.ascii(F.substring("lang", 2, 1))).cast(
            "bigint"
        ),
    ).select("doc_id", "n_chars", "lang_code", "lang")

    table = os.path.join(args.out, f"t{args.files}")
    reg = os.path.join(args.out, f"reg{args.files}")
    cols = ["n_chars", "lang_code"]

    t0 = time.perf_counter()
    # doc_id tiebreak: the target file count exceeds the populated Morton
    # cell count at these row counts (see write_zordered docstring)
    L.write_zordered(big, table, cols, n_files=args.files, tiebreak=["doc_id"])
    t_write = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_reg = L.write_zone_registry(spark, table, reg, cols)
    t_registry_build = time.perf_counter() - t0

    code = ord("d") * 256 + ord("e")
    ranges = {"n_chars": (150, 250), "lang_code": (code, code)}

    # --- driver planning cost, isolated (the O(files) part) ---
    t0 = time.perf_counter()
    reg_rows = [r.asDict() for r in spark.read.parquet(reg).collect()]
    t_reg_read = time.perf_counter() - t0
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    actual = list(pq.ParquetDataset(table).files)
    t_listing = time.perf_counter() - t0
    t0 = time.perf_counter()
    keep = L._prune_zone_dicts(reg_rows, ranges)
    t_prune = time.perf_counter() - t0

    # --- end-to-end legs (count() as the action) ---
    t0 = time.perf_counter()
    n_pruned = L.read_pruned_registered(spark, table, reg, ranges).count()
    t_registered = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_footers = L.read_pruned(spark, table, ranges).count()
    t_footer_walk = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_full = (
        spark.read.parquet(table)
        .filter(F.col("n_chars").between(150, 250) & (F.col("lang_code") == code))
        .count()
    )
    t_spark_all_files = time.perf_counter() - t0
    assert n_pruned == n_footers == n_full, (n_pruned, n_footers, n_full)

    # --- delta append cost after a small batch ---
    big.limit(5000).withColumn("doc_id", F.col("doc_id") + F.lit(10**9)).repartition(
        8
    ).write.mode("append").parquet(table)
    t0 = time.perf_counter()
    n_delta = L.zone_registry_delta(spark, table, reg, cols)
    t_delta = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "files": args.files,
                "rows": args.repl * 5000,
                "registered": n_reg,
                "matching_rows": n_full,
                "kept_files": len(keep),
                "write_zordered_s": round(t_write, 2),
                "registry_build_s": round(t_registry_build, 2),
                "plan_registry_read_s": round(t_reg_read, 3),
                "plan_table_listing_s": round(t_listing, 3),
                "plan_zone_prune_s": round(t_prune, 3),
                "read_registered_s": round(t_registered, 2),
                "read_footer_walk_s": round(t_footer_walk, 2),
                "read_spark_all_files_s": round(t_spark_all_files, 2),
                "delta_files": n_delta,
                "delta_s": round(t_delta, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
