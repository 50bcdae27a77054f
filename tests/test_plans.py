"""Physical-plan regression tests — enforce the SCALE.md audits.

Every claim SCALE.md makes about the plans (pushdown reaches the scan,
dims broadcast, top-k avoids global sorts, the whole rolling-feature chain
shares ONE exchange+sort, no Python in batch paths) is asserted here so a
refactor that silently regresses the plan fails CI, not the 100 TB run.
"""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from spark_signals.datapipe.dedup import dedup_exact, dedup_minhash_lsh
from spark_signals.datapipe.similarity import ann_bruteforce_topk
from spark_signals.datapipe.text import text_stats
from spark_signals.io.sources import load_ticks, read_table
from spark_signals.pipeline.builder import build_pipeline
from spark_signals.relational import (
    q_pricing_summary,
    q_runs_listing,
    q_topk_events,
)

SF = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def count_op(plan: str, op: str) -> int:
    # formatted explain lists each node as "(N) OpName" in the details section
    return len(re.findall(rf"^\s*\(\d+\) {op}\b", plan, re.M))


def test_replay_bounds_reach_parquet_scan(spark):
    """S10: time bounds must land in PushedFilters on the RAW int64 ns
    column — a bound above the ns→µs projection would scan all rowgroups."""
    p = plan_str(load_ticks(spark, SF, start_ts="2024-01-08", end_ts="2024-01-09"))
    assert "GreaterThanOrEqual(ts," in p and "LessThanOrEqual(ts," in p


def test_tick_adapter_prunes_unused_columns(spark):
    """Column pruning: the tick adapter never materializes `props`."""
    p = plan_str(load_ticks(spark, SF))
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "props" not in schema_line


def test_q1_filter_pushdown_and_pruning(spark):
    """Q1-style scan: shipdate predicate pushed, comment column pruned."""
    p = plan_str(q_pricing_summary(spark, SF))
    assert "LessThanOrEqual(l_shipdate," in p
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema_line


def test_dim_join_broadcasts(spark):
    """J3: the customer dim is pinned broadcast — the fact side must not
    shuffle (no SortMergeJoin / ShuffledHashJoin anywhere in the plan)."""
    p = plan_str(q_runs_listing(spark, SF))
    assert count_op(p, "BroadcastHashJoin") >= 1
    assert count_op(p, "SortMergeJoin") == 0
    assert count_op(p, "ShuffledHashJoin") == 0


def test_topk_plans_as_take_ordered(spark):
    """§2.7: ORDER BY ... LIMIT n = per-partition heaps, never a global
    sort feeding a Limit."""
    p = plan_str(q_topk_events(spark, SF))
    assert count_op(p, "TakeOrderedAndProject") == 1
    assert count_op(p, "Sort") == 0


def test_rolling_features_share_one_window_stage(spark):
    """W1-W7 (lag, rolling stddev, both SMAs, confirmation lag,
    forward-fill, position lag) all stack on ONE partition+sort: exactly
    one Exchange and one Sort in the whole positions_costs plan."""
    out = build_pipeline(load_ticks(spark, SF))
    p = plan_str(out.positions_costs)
    assert count_op(p, "Exchange") == 1
    assert count_op(p, "Sort") == 1
    assert count_op(p, "Window") >= 3  # frames stacked, not re-sorted


def test_metrics_dag_bounded_shuffles(spark):
    """Full DAG ticks→features→2 tumbling aggs→J2 join→ratios: the static
    plan re-uses the windowed exchange for both agg branches; shuffle count
    must stay bounded (8 static nodes; AQE ReuseExchange dedups at runtime)
    and both tumbling aggs must partial-aggregate before their shuffle."""
    out = build_pipeline(load_ticks(spark, SF))
    p = plan_str(out.metrics)
    assert count_op(p, "Exchange") <= 8
    assert count_op(p, "Sort") <= 2
    # partial->final HashAggregate pairs = map-side combine before shuffle
    assert "partial_avg(realized_pnl" in p and "partial_count(1)" in p


def test_fused_rollup_single_scan_no_join(spark):
    """The fused metrics chain (A2's signal count folded into A1's tumbling
    aggregate via the sparse signal marker) must stay a single-scan,
    join-free plan: one base FileScan, one per-key sort feeding the shared
    window stage, and exactly 3 exchanges (product_id for windows, tumbling
    window key, rollup bucket key). The unfused J2 join form is pinned by
    test_metrics_dag_bounded_shuffles above."""
    from spark_signals.parity import q_hourly_rollup

    p = plan_str(q_hourly_rollup(spark, SF))
    assert count_op(p, "Scan parquet") == 1
    assert "Join" not in p
    assert count_op(p, "Exchange") <= 3
    assert count_op(p, "Sort") <= 1


@pytest.mark.parametrize(
    "build",
    [
        lambda spark: build_pipeline(load_ticks(spark, SF)).metrics,
        lambda spark: dedup_exact(read_table(spark, SF, "documents")),
        lambda spark: dedup_minhash_lsh(read_table(spark, SF, "documents")),
        lambda spark: text_stats(read_table(spark, SF, "documents")),
        lambda spark: ann_bruteforce_topk(read_table(spark, SF, "embeddings")),
    ],
    ids=["metrics", "dedup_exact", "dedup_minhash", "text_stats", "ann_brute"],
)
def test_batch_paths_have_no_python_stages(spark, build):
    """JVM-side discipline: zero row-at-a-time or Arrow Python evaluation
    in any batch plan — everything stays inside whole-stage codegen."""
    p = plan_str(build(spark))
    assert "EvalPython" not in p  # BatchEvalPython / ArrowEvalPython
    assert "FlatMapGroupsInPandas" not in p


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-location via bucketing: same key + same bucket count on both
    sides ⇒ the equi-join plans with ZERO Exchange nodes (the write-once,
    join-many layout SCALE.md claims for fact⋈fact joins)."""
    from spark_signals.io.sinks import write_bucketed

    ticks = load_ticks(spark, SF)
    agg_a = ticks.groupBy("product_id").count()
    agg_b = ticks.groupBy("product_id").agg(F.avg("price").alias("avg_price"))
    write_bucketed(agg_a, "bkt_counts", str(tmp_path / "bkt_counts"), buckets=8)
    write_bucketed(agg_b, "bkt_prices", str(tmp_path / "bkt_prices"), buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_counts").join(spark.table("bkt_prices"), "product_id")
            p = plan_str(joined)
            assert count_op(p, "Exchange") == 0
            assert count_op(p, "SortMergeJoin") == 1
            assert joined.count() == agg_a.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_counts")
        spark.sql("DROP TABLE IF EXISTS bkt_prices")


def test_breakout_strategy_preserves_single_window_stage(spark):
    """Strategy composition must not add shuffles: breakout's bands/state/
    lag stack onto the same (product_id, time) window spec — still exactly
    one Exchange + one Sort through positions_costs."""
    from spark_signals.config import EngineConfig
    from spark_signals.strategies import get_strategy_module

    out = get_strategy_module("breakout").build_pipeline(load_ticks(spark, SF), EngineConfig())
    p = plan_str(out.positions_costs)
    assert count_op(p, "Exchange") == 1
    assert count_op(p, "Sort") == 1


def test_segment_revenue_bucketed_fact_join_no_exchange(spark):
    """The bucketed fact-fact join must not shuffle either side: the only
    Exchange in the plan is the group-by aggregation. At test scale Spark
    would happily broadcast the orders fact (hiding the bucket path), so
    auto-broadcast is disabled to surface the plan the join takes when both
    facts are 100 TB-big; the customer dim stays an explicit broadcast()."""
    from spark_signals.relational import q_segment_revenue_bucketed

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_segment_revenue_bucketed(spark, SF)
        p = plan_str(df)
        assert count_op(p, "SortMergeJoin") == 1  # the fact-fact zipper
        assert count_op(p, "Exchange") == 1  # final agg only
        assert count_op(p, "BroadcastExchange") == 1  # customer dim
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_latency_rollup_single_exchange_partial_agg(spark):
    """Telemetry rollup: one hash aggregation keyed (component, hour) —
    exactly one Exchange, partial aggregation map-side (the integer
    micro-unit sums combine before the shuffle), zero Python stages."""
    from spark_signals.control.latency import q_latency_rollup

    p = plan_str(q_latency_rollup(spark, SF))
    assert count_op(p, "Exchange") == 1
    assert "partial_sum(FLOOR(" in p and "partial_count(value_ms" in p
    assert "EvalPython" not in p


def test_pii_scrub_has_no_exchange(spark):
    """PII scrub is pure per-row regex work — any Exchange in its plan means
    someone added a shuffle to a scan-speed operator."""
    from spark_signals.datapipe.scrub import pii_scrub

    p = plan_str(pii_scrub(read_table(spark, SF, "documents")))
    assert count_op(p, "Exchange") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_dedup_passages_bounded_exchanges(spark):
    """Passage dedup: digest agg + digest join-back + per-doc agg. With AQE
    exchange reuse that is at most 4 exchanges (spread repartition + digest
    ×2 + doc) and zero Python stages; text must not survive past the digest
    projection into any exchange."""
    from spark_signals.datapipe.dedup import dedup_passages

    p = plan_str(dedup_passages(read_table(spark, SF, "documents")))
    assert count_op(p, "Exchange") <= 4
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_unigram_lm_bounded_exchanges(spark):
    """LM quality: vocab agg, token⋈model join, per-doc agg — ≤5 exchanges
    (spread + vocab + join sides + doc) and no Python stages."""
    from spark_signals.datapipe.text import unigram_lm_quality

    p = plan_str(unigram_lm_quality(read_table(spark, SF, "documents")))
    assert count_op(p, "Exchange") <= 5
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_ivfpq_codebook_and_lut_broadcast(spark):
    """IVF-PQ: the codebook/LUT sides must broadcast — a sort-merge join
    against the codes relation would shuffle the whole index."""
    from spark_signals.datapipe.similarity import ann_ivfpq_topk

    p = plan_str(ann_ivfpq_topk(read_table(spark, SF, "embeddings")))
    assert count_op(p, "BroadcastHashJoin") >= 3
    assert count_op(p, "SortMergeJoin") == 0
    assert count_op(p, "CartesianProduct") == 0


def test_curate_composition_no_python_no_cartesian(spark):
    """The composed curation pipeline stays JVM-side end to end and joins
    only on keys — no Python stages, no nested-loop/cartesian joins."""
    from spark_signals.datapipe.curate import curate

    p = plan_str(curate(read_table(spark, SF, "documents")))
    assert "pythonUDF" not in p and "BatchEvalPython" not in p
    assert count_op(p, "CartesianProduct") == 0
    # exactly ONE BroadcastNestedLoopJoin is expected: the unigram LM's
    # 1-row corpus-total scalar broadcast (crossJoin(broadcast(total))) —
    # a second one means a real join degenerated
    assert count_op(p, "BroadcastNestedLoopJoin") <= 1


def test_temperature_sampling_broadcast_gate(spark):
    """Temperature resampling: the per-source rates must reach the corpus as
    a broadcast (one tiny agg out, no corpus re-shuffle), and the gate is a
    JVM-side integer predicate — no Python, no cartesian, no sort."""
    from spark_signals.datapipe.sampling import sample_temperature

    p = plan_str(sample_temperature(read_table(spark, SF, "documents")))
    assert count_op(p, "BroadcastHashJoin") >= 1
    assert count_op(p, "SortMergeJoin") == 0
    assert count_op(p, "CartesianProduct") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p
    assert count_op(p, "Sort") == 0


def test_pack_sequences_single_shard_shuffle(spark):
    """Sequence packing: ONE exchange (the shard-key shuffle feeding the
    per-shard window cumsum) and one sort inside it — shards must stay
    independent, so no global sort and no joins at all."""
    from spark_signals.datapipe.pack import pack_sequences

    p = plan_str(pack_sequences(read_table(spark, SF, "documents")))
    assert count_op(p, "Exchange") == 1
    assert "Join" not in p
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_semdedup_pairwise_stays_cell_blocked(spark):
    """SemDeDup: the within-cell close-count stage is ONE cogrouped Arrow
    matmul per cell (r11 — pairs never materialize as rows; the output is
    per-vector counts), never a cartesian/nested-loop over the corpus and
    never row-at-a-time Python; Lloyd-loop internals are checkpoint-pinned
    so the plan reads materialized relations."""
    from spark_signals.datapipe.dedup import semdedup

    p = plan_str(semdedup(read_table(spark, SF, "embeddings")))
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "BroadcastNestedLoopJoin") == 0
    # r12: the count stage is a COGROUP (mega-cell guard chunks both sides)
    assert count_op(p, "FlatMapCoGroupsInPandas") == 1
    assert count_op(p, "FlatMapGroupsInPandas") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_intra_doc_dedup_zero_shuffle(spark):
    """Intra-doc passage strip is a pure per-row rewrite: no exchange, no
    join, no Python — scan-speed at any corpus size (the spread_small_input
    fan-out repartition is the one allowed Exchange on tiny local inputs)."""
    from spark_signals.datapipe.dedup import dedup_intra_doc

    p = plan_str(dedup_intra_doc(read_table(spark, SF, "documents")))
    assert "Join" not in p
    assert count_op(p, "Exchange") <= 1  # only the small-input fan-out
    assert count_op(p, "Sort") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_bm25_never_shuffles_unmatched_documents(spark):
    """BM25 scoring: document length rides the matched (doc_id, term)
    pairs, so the ONLY joins are against the broadcast q-row df relation
    and the broadcast 1-row stats — a SortMergeJoin anywhere means a
    full-corpus relation (the old lens join) crossed a shuffle again, a
    planner-dependent regression at web scale (r7 verdict #2)."""
    from spark_signals.datapipe.retrieval import bm25_topk

    p = plan_str(bm25_topk(read_table(spark, SF, "documents")))
    assert count_op(p, "SortMergeJoin") == 0
    assert count_op(p, "ShuffledHashJoin") == 0
    assert count_op(p, "CartesianProduct") == 0
    # exactly two corpus scans: the 1-row stats agg + the matched explode
    assert count_op(p, "Scan parquet") <= 2
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_hybrid_rrf_fuses_without_outer_sort_merge(spark):
    """RRF fusion: the two ≤k-row rank lists merge via union + groupBy —
    a full-outer SortMergeJoin over rank lists (or worse, a cartesian)
    means the fusion shape regressed."""
    from spark_signals.datapipe.retrieval import hybrid_rrf_topk

    p = plan_str(hybrid_rrf_topk(read_table(spark, SF, "documents")))
    assert count_op(p, "CartesianProduct") == 0
    assert "FullOuter" not in p
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_dense_ivf_probe_broadcasts_and_stays_jvm_side(spark):
    """The IVF-probed dense retrieval arm: probed-cell membership reaches
    the corpus as a broadcast semi-structure (no SortMergeJoin against the
    nprobe-row probe list), no cartesian, no Python stage — per-query work
    is the probed cells only (r7 verdict #3)."""
    from spark_signals.datapipe.retrieval import dense_ivf_topk

    p = plan_str(dense_ivf_topk(read_table(spark, SF, "documents")))
    assert count_op(p, "CartesianProduct") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p
    assert count_op(p, "BroadcastHashJoin") >= 2  # probe list + cell semi


def test_bpe_token_counts_stays_jvm_side(spark):
    """The BPE tokenize path (post-training segmentation join) must stay
    whole-stage-codegen JVM work: no Python stage, no cartesian — the
    merge loop itself runs at plan-build time through checkpointed
    relations, so the final plan is just the segmentation join + agg."""
    from spark_signals.datapipe.bpe import bpe_token_counts

    p = plan_str(bpe_token_counts(read_table(spark, SF, "documents"), n_merges=2))
    assert "pythonUDF" not in p and "BatchEvalPython" not in p
    assert count_op(p, "CartesianProduct") == 0


def test_dsir_model_broadcasts_onto_corpus(spark):
    """DSIR pricing: the D-row log-ratio model must reach the exploded raw
    corpus as a broadcast (a shuffled join would move every (doc, word)
    row by bucket), and no Python stage anywhere."""
    from spark_signals.datapipe.sampling import dsir_snapshot

    p = plan_str(dsir_snapshot(read_table(spark, SF, "documents"), "src0"))
    assert count_op(p, "BroadcastHashJoin") >= 1
    assert count_op(p, "CartesianProduct") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_ann_index_delta_is_one_shuffle_free_arrow_pass(spark):
    """Incremental IVF delta: assignment against trained centroids is ONE
    Arrow matmul stage chained onto the batch scan (kmeans_assign_arrow,
    the r10-verdict #3 constant-factor fix) — no join, no exchange, no
    row-at-a-time Python. The k×D centroid relation reaches the stage as
    closure state (index-metadata-sized by construction), so the batch
    corpus never shuffles at all."""
    from pyspark.sql import functions as F

    from spark_signals.datapipe.similarity import ann_index_delta, kmeans_train

    emb = read_table(spark, SF, "embeddings")
    cents = kmeans_train(emb.filter(F.col("vec_id") % 5 != 0))
    p = plan_str(ann_index_delta(emb.filter(F.col("vec_id") % 5 == 0), cents))
    assert count_op(p, "MapInPandas") == 1
    assert "Join" not in p
    assert count_op(p, "Exchange") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_knn_join_stays_cell_blocked_one_arrow_probe(spark):
    """The IVF KNN self-join: the all-pairs relation must never appear —
    candidates reach the scorer through cell-keyed equi-joins, with zero
    cartesian/nested-loop nodes. The ONE Python stage allowed is the
    Arrow matmul cell probe (probe_cells_arrow; the cell assignment's
    twin stage is behind the relabel checkpoint) — no row-at-a-time
    evaluation anywhere."""
    from spark_signals.datapipe.similarity import knn_join_ivf

    p = plan_str(knn_join_ivf(read_table(spark, SF, "embeddings")))
    assert count_op(p, "CartesianProduct") == 0
    assert "NestedLoop" not in p
    assert count_op(p, "MapInPandas") <= 1
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_winnow_pairs_semi_join_guard_no_cartesian(spark):
    """Winnowing near-dup: fingerprint selection is per-row HOFs, pair
    expansion is a per-key array transform. The ONLY join allowed is the
    hot-key guard's LeftSemi (count-filtered fingerprint keys joined back
    before collect_list — the buffer-bounding discipline), and the
    exchange budget covers the two fingerprint aggregations, the pair
    groupBy, and the small-input fan-out repartition."""
    from pyspark.sql import functions as SF_
    from spark_signals.datapipe.dedup import (
        _winnow_pairs_from_sized,
        winnow_fingerprints,
    )

    sized = winnow_fingerprints(read_table(spark, SF, "documents")).select(
        "doc_id",
        SF_.size("fingerprints").cast("long").alias("n_fps"),
        "fingerprints",
    )
    p = plan_str(_winnow_pairs_from_sized(sized))
    n_joins = sum(
        count_op(p, j)
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1 and "LeftSemi" in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "Exchange") <= 6
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_zipf_shard_is_window_free_take_ordered(spark):
    """Each Zipf language shard: top-V must plan as TakeOrderedAndProject
    (distributed heap), never a global Sort over the vocabulary, and no
    window function anywhere on the Spark side."""
    from spark_signals.datapipe.text import zipf_stats

    p = plan_str(zipf_stats(read_table(spark, SF, "documents"), "en"))
    assert count_op(p, "TakeOrderedAndProject") == 1
    assert "Window" not in p
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_media_phash_semi_join_guard_no_cartesian(spark):
    """Media dHash near-dup: signature + banding chain onto the scan. The
    ONLY join allowed is the hot-key guard's LeftSemi (count-filtered band
    keys joined back before collect_list); exchanges cover the two band
    aggregations and the pair-dedupe groupBy — no Python."""
    from spark_signals.datapipe.multimodal import media_phash_neardup, synthesize_media

    p = plan_str(
        media_phash_neardup(synthesize_media(read_table(spark, SF, "documents")))
    )
    n_joins = sum(
        count_op(p, j)
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1 and "LeftSemi" in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "Exchange") <= 4
    assert "pythonUDF" not in p and "BatchEvalPython" not in p


def test_chained_queries_stay_jvm_side_no_cartesian(spark):
    """The three r10 chained consolidation queries (each carrying a whole
    incoming family's driver evidence) must keep the families' plan
    discipline through the extra composition: no cartesian products, no
    nested-loop joins except against broadcast 1-row digests, and zero
    Python stages."""
    from spark_signals.datapipe.bpe import bpe_pipeline_report
    from spark_signals.datapipe.decontam import decontam_suite_report

    docs = read_table(spark, SF, "documents")
    for name, df in (
        ("bpe_pipeline_chained", bpe_pipeline_report(docs)),
        ("decontam_suite_chained", decontam_suite_report(docs)),
    ):
        p = plan_str(df)
        assert count_op(p, "CartesianProduct") == 0, name
        # the only nested-loop joins allowed are the broadcast 1-row
        # cross joins (merge-table digest / totals) — never a pair blowup;
        # check EVERY occurrence: in formatted explain the TREE line
        # carries the type inline ("BroadcastNestedLoopJoin Cross ...")
        # while the details headline "(N) BroadcastNestedLoopJoin" pairs
        # with a following "Join type: <T>" line — count both spellings so
        # a later inner/left BNLJ cannot hide behind a legitimate Cross
        n_tree = len(
            re.findall(r"\+- BroadcastNestedLoopJoin \S+|^BroadcastNestedLoopJoin \S+", p, re.M)
        )
        n_tree_cross = len(re.findall(r"BroadcastNestedLoopJoin Cross\b", p))
        assert n_tree == n_tree_cross, (name, n_tree, n_tree_cross)
        n_nodes = count_op(p, "BroadcastNestedLoopJoin")
        n_cross_types = len(re.findall(r"^Join type: Cross$", p, re.M))
        assert n_nodes <= n_cross_types, (name, n_nodes, n_cross_types)
        assert "pythonUDF" not in p and "BatchEvalPython" not in p, name


def test_winnow_zipf_chained_stays_jvm_side(spark):
    """winnow_zipf_report materializes the (small) pair relation eagerly
    (the winnow lifecycle) — the REMAINING plan over it must still be
    join-bounded and Python-free, with the zipf shards' TakeOrdered heaps
    intact."""
    from spark_signals.datapipe.dedup import winnow_zipf_report

    p = plan_str(winnow_zipf_report(read_table(spark, SF, "documents")))
    assert count_op(p, "CartesianProduct") == 0
    assert "pythonUDF" not in p and "BatchEvalPython" not in p
    assert count_op(p, "TakeOrderedAndProject") >= 1


def test_budget_manifest_one_corpus_exchange_no_python(spark):
    """mixture_budget_manifest: the corpus pays exactly ONE hash exchange
    (the per-source fill window); the targets side is S-row aggregates +
    one broadcast; no Python stage, no cartesian product."""
    from spark_signals.datapipe.sampling import mixture_budget_manifest

    p = plan_str(mixture_budget_manifest(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "BroadcastExchange") == 1
    # corpus-side shuffle bounded: hashpartitioning exchanges only (the
    # S-row targets side adds tiny agg/window exchanges; total stays small)
    assert count_op(p, "Exchange") <= 4


def test_pack_efficiency_single_exchange_no_python(spark):
    """pack_efficiency_report collapses the manifest's one shard shuffle
    into S rows: exactly one exchange, zero Python stages, no joins."""
    from spark_signals.datapipe.pack import pack_efficiency_report

    p = plan_str(pack_efficiency_report(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert count_op(p, "Exchange") == 1
    assert "Join" not in p


def test_pack_incremental_stays_jvm_side(spark):
    """The incremental-pack face: the batch pays one window exchange and
    the tail/threshold sides are broadcast scalars — never a cartesian
    over data (the only nested-loop joins are 1-row scalar broadcasts),
    never a Python stage."""
    from spark_signals.datapipe.pack import pack_incremental_snapshot

    p = plan_str(pack_incremental_snapshot(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert count_op(p, "CartesianProduct") == 0


def test_filter_ablation_single_expand_no_python(spark):
    """The ablation grid runs CUBE as ONE Expand + hash aggregate (not
    2^k re-scans): one digest exchange, broadcast doc_id joins at this
    size, zero Python stages, no cartesian product."""
    from spark_signals.datapipe.curate import filter_ablation

    p = plan_str(filter_ablation(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "Expand") == 1
    assert count_op(p, "Exchange") <= 3


def test_kanon_report_is_two_exchanges_no_joins(spark):
    """k-anonymity: one map-side-combined aggregate to the QI grain, one
    window over the (already tiny) group relation — no joins, no second
    corpus pass, no Python."""
    from spark_signals.datapipe.scrub import kanonymity_report

    p = plan_str(kanonymity_report(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p
    assert "Join" not in p
    assert count_op(p, "Exchange") <= 2
    assert count_op(p, "Window") == 1


def test_token_yield_downstream_of_cc_is_bounded(spark):
    """Token-yield accounting downstream of the pinned CC output: doc_id
    equi-joins + one S-row aggregate — no cartesian, no Python, bounded
    exchanges."""
    from spark_signals.datapipe.dedup import token_yield_report

    p = plan_str(token_yield_report(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "Exchange") <= 4


def test_minhash_calibration_stays_banded_no_python(spark, monkeypatch):
    """The calibration report keeps the dedup lane's blocking: band-bucket
    equi-joins only (pin() is bypassed here so the WHOLE pre-checkpoint
    plan is audited) — no cartesian product, no Python stage, and the
    per-bin means are plain hash aggregates over integer units."""
    import spark_signals.datapipe.dedup as DD

    monkeypatch.setattr(DD, "pin", lambda df: df)
    p = plan_str(DD.minhash_calibration_report(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p and "pythonUDF" not in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "BroadcastNestedLoopJoin") == 0


def test_source_overlap_incr_stays_banded_no_python(spark, monkeypatch):
    """The incremental overlap step keeps the dedup lane's blocking on
    BOTH arms (batch-internal pairs and the history probe): band-bucket
    equi-joins only, candidate-bounded verification, no cartesian
    product, no Python stage (pin() bypassed so the whole pre-checkpoint
    plan is audited)."""
    import spark_signals.datapipe.dedup as DD

    monkeypatch.setattr(DD, "pin", lambda df: df)
    p = plan_str(
        DD.source_overlap_incr_snapshot(read_table(spark, SF, "documents"))
    )
    assert "EvalPython" not in p and "pythonUDF" not in p
    assert count_op(p, "CartesianProduct") == 0
    assert count_op(p, "BroadcastNestedLoopJoin") == 0


def test_decontam_source_matrix_single_corpus_pass(spark):
    """The benchmark x source drill-down keeps decontam_report's shape:
    one training digest explode against the BROADCAST eval digests, then
    overlap-bounded aggregates/joins — the corpus is never digested a
    second time for the source recovery, and nothing runs in Python."""
    from spark_signals.datapipe.decontam import decontam_source_matrix_snapshot

    p = plan_str(decontam_source_matrix_snapshot(read_table(spark, SF, "documents")))
    assert "EvalPython" not in p
    assert count_op(p, "CartesianProduct") == 0
