"""Partitioning utilities for compute-heavy per-row stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Fan a narrow input out to all cores before CPU-heavy per-row work.

    Parquet split planning gives a small file one partition, serializing
    md5/shingle/simhash compute on a single core. A round-robin repartition
    of the (small) input unlocks full parallelism. At warehouse scale input
    splits already exceed cores, so this is a no-op there — the condition
    guards against ever *adding* a shuffle to a big scan.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 32):
        return df.repartition(min(target, 32))
    return df
