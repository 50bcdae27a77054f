"""Partition-count invariance — the 1000-executor determinism claim.

The oracle suite pins Spark vs DuckDB; this pins Spark vs ITSELF under
different parallelism: with exact-integer aggregation and gridded decision
boundaries, changing `spark.sql.shuffle.partitions` (the local stand-in
for cluster size) must not move any result by even 1 ulp. Raw
double SUM/AVG would fail this — partial-aggregate trees change shape with
partition count.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

CASES = [
    "metrics_hourly_rollup",
    "performance_windows_5m",
    "strategy_metrics",
    "segment_revenue_3way_join",
    "latency_metrics_rollup",
    "sma_crossover_signals",
    # r13: the capped partner attribution (row_number over the dup-window
    # subset must pick the same cap-smallest keys at any parallelism) and
    # the layout zone map (exact ntile file population + integer
    # quantization must be partition-count-blind)
    "dedup_exact_spans_attrib",
    "zorder_zonemap_skipping",
    # r15: the token-budget keep-list — integer window sums over the one
    # hash exchange must keep the kept set identical at any parallelism
    # (weight-dict-order invariance is pinned separately in
    # test_training_data_ops; this pins the partitioning axis)
    "mixture_budget_manifest",
    # r15 release-audit wave: the CUBE grid and yield/k-anon/calibration
    # reports are pure integer-sum aggregates (token masses, group
    # counts, 1e-6-unit gridded means) — all four must be bit-identical
    # at any parallelism
    "filter_ablation",
    "token_yield_report",
    "kanon_suppression",
    "minhash_calibration",
    # r15 wave 2: both fixed-cardinality audits ride integer/gridded sums
    "source_overlap_matrix",
    "quality_drift_psi",
    # r16: the continuous-provenance pair — the incremental lane's
    # additive (n_pairs, Σjac_u) cell merge and the digest-hit cell
    # aggregate must be partition-count-blind like their batch twins
    "source_overlap_incr",
    "decontam_source_matrix",
]


@pytest.mark.parametrize("name", CASES)
def test_results_identical_across_shuffle_partition_counts(spark, name):
    import __spark_entry__ as entrymod

    fn = {
        **entrymod.queries(),
        **entrymod.extended_queries(),
        **entrymod.incoming_queries(),
    }[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = fn(spark, SF)
            results[parts] = sorted(
                tuple(r) for r in df.collect()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results["3"] == results["32"]  # bit-identical, not approximately
