"""Contract checks for __spark_entry__ (driver interface)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


EXPECTED_QUERIES = frozenset({
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_ivfpq_topk",
    "ann_lsh_hyperplane_pairs", "ann_ivf_trained_topk",
    "anti_join_parts_never_shipped", "asof_join_trade_quote",
    "asof_join_tolerance",
    "dedup_clusters_canonical", "dedup_exact_hash",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_incremental",
    "curate_keep_decision",
    "decontam_ngram_overlap", "dedup_passages",
    "ewma_zscore_strategy", "executions",
    "j1_signal_rejoin", "lang_id_heuristic", "latency_metrics_rollup",
    "length_band_approx",
    "lm_unigram_quality", "metrics_hourly_rollup", "multimodal_features",
    "normalized_prices", "performance_windows_5m",
    "positions_costs",
    "pii_scrub_redact", "pricing_summary_q1", "range_join_tick_stats",
    "recent_ticks_per_instrument", "replay_backtest_window",
    "repetition_gopher_quality", "runs_listing_join_topn",
    "sample_quota_per_source", "sample_stratified_hash",
    "segment_revenue_bucketed",
    "session_window_per_user", "signal_counts_5m",
    "signals_decisions",
    "strategy_metrics", "strategy_summary_filter_agg",
    "streaming_hourly_rollup_chained",
    "streaming_metrics_5m", "streaming_positions_costs", "text_stats_quality",
    "tfidf_top_terms", "union_live_replay",
})

# Retired from the driver contract (redundant with checked siblings) but
# still implemented and verified locally via extended_queries().
EXPECTED_RETIRED = frozenset({
    "ticks_source", "nation_region_rollup",
    "segment_revenue_3way_join", "sliding_window_counts", "length_band_filter",
    # r05 rotation: slots yielded to the three new data-pipeline operators
    "doc_fingerprint_minhash1", "position_returns",
    # r05 rotation wave 2 + IVF-PQ slot (each keeps a checked family sibling)
    "topk_events", "position_transitions",
    "semi_join_has_lineitems",
    # r06 rotation: slots yielded to ann_ivf_trained_topk / dedup_incremental
    # / length_band_approx and the four queries rotating back in
    "sma_crossover_signals", "positions_forward_fill",
    "latest_price_per_instrument", "breakout_band_signals",
    "value_percentiles_exact", "embedding_cosine_neardup",
    "streaming_interval_join",
})


def test_registry_is_complete_and_cannot_silently_shrink():
    """CORRECTNESS_r02 lost 4 queries to a swallowed ImportError; the registry
    must now contain every known query or fail loudly (superset allows growth)."""
    qs = entrymod.queries()
    missing = EXPECTED_QUERIES - set(qs)
    assert not missing, f"registry silently lost queries: {sorted(missing)}"
    assert len(qs) >= len(EXPECTED_QUERIES)


def test_registry_fits_driver_cap_with_no_ordering_games():
    """The driver checks only the first 50 registry entries (observed
    r01-r04). The registry must therefore hold at most DRIVER_CAP active
    queries — every registered query gets driver evidence — and retirement
    must be the explicit RETIRED map, never insertion-order curation."""
    names = list(entrymod.queries())
    assert len(names) <= entrymod.DRIVER_CAP
    assert not set(names) & set(entrymod.RETIRED)


def test_retired_queries_stay_implemented_and_oracle_backed():
    ex = entrymod.extended_queries()
    assert set(ex) == set(EXPECTED_RETIRED) == set(entrymod.RETIRED)
    for name, fn in ex.items():
        assert callable(fn), name
    # every retired query keeps its oracle so the local --extended sweep
    # gives it the same value-level check the driver would have
    assert set(entrymod.extended_oracle_sql()) == set(ex)


def test_every_query_has_callable_and_oracle_alignment():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key must have a query
    assert set(oq) <= set(qs)


def test_queries_run_at_smallest_sf(spark):
    qs = {**entrymod.queries(), **entrymod.extended_queries()}
    sf = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        df = fn(spark, sf)
        assert df.columns, name
