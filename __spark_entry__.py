"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implemented queries live in spark_signals.parity (pipeline operators) and
spark_signals.datapipe.parity (LLM-data-pipeline operators); this module just
exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver's harness checks only the first 50 registry entries (observed
# across r01-r04; cap surfaced in README.md "Driver contract" so the harness
# owner can lift it). Rather than ordering the registry so hand-picked
# queries fall past the cutoff (round-4 _DRIVER_TAIL — flagged by the
# advisor as verification gaming and removed), the registry is now capped at
# DRIVER_CAP entries: every registered query gets independent driver
# evidence every round. Six redundant queries were RETIRED from the driver
# contract explicitly — each duplicates a checked sibling's operator family
# and result semantics, each has ≥3 prior driver-green rounds (r01-r04
# artifacts), and each remains implemented, locally oracle-checked
# (tools/oracle_check.py --extended) and exercised by tests/.
DRIVER_CAP = 50

RETIRED = {
    # S1 source adapter: the same ticks adapter feeds ~20 checked queries;
    # a standalone passthrough scan adds no independent signal.
    "ticks_source": "source adapter exercised transitively by ~20 checked queries",
    # U1 trivial unionByName; the replay path is covered by replay_backtest_window.
    "union_live_replay": "trivial union; replay semantics checked via replay_backtest_window",
    # dim-dim rollup; join+agg family covered by runs_listing/semi/anti/pricing_summary.
    "nation_region_rollup": "join+agg family covered by 4 checked siblings",
    # identical result relation to segment_revenue_bucketed (which stays checked);
    # still benchmarked in bench.py as the non-bucketed plan variant.
    "segment_revenue_3way_join": "same result relation as checked segment_revenue_bucketed",
    # T6 beyond-reference extra; partner query session_window_per_user stays
    # checked and the sliding-window frame is tested in tests/.
    "sliding_window_counts": "beyond-reference T6 twin of checked session_window_per_user",
    # trivial WHERE-band over text_stats columns; superset query
    # text_stats_quality stays checked.
    "length_band_filter": "trivial band filter over checked text_stats_quality columns",
    # r05 rotation: three 4-round-green queries yield their driver slots to
    # the three NEW data-pipeline operators (repetition_gopher_quality,
    # decontam_ngram_overlap, sample_quota_per_source) so new surface gets
    # independent driver evidence; each rotated-out query keeps a checked
    # same-family sibling and the local --extended sweep.
    "doc_fingerprint_minhash1": "r05 rotation; minhash-signature family checked via dedup_minhash_lsh + dedup_ngram_jaccard (green r01-r04)",
    "position_returns": "r05 rotation; chain projection checked via positions_costs/executions/strategy_metrics (green r01-r04)",
    "sample_stratified_hash": "r05 rotation; hash-sampling family rotates to new sibling sample_quota_per_source (green r01-r04)",
    # r05 rotation, wave 2: three more 4-round-green queries yield slots to
    # the new curation operators (lm_unigram_quality, dedup_passages,
    # pii_scrub_redact); each keeps a checked same-family sibling.
    "lang_id_heuristic": "r05 rotation; per-row text scoring family checked via text_stats_quality + repetition_gopher_quality (green r01-r04)",
    "semi_join_has_lineitems": "r05 rotation; existence-join twin anti_join_parts_never_shipped stays checked, slot goes to new ann_ivfpq_topk (green r01-r04)",
    "j1_signal_rejoin": "r05 rotation; the J1 join runs inline inside every checked positions-chain query (positions_costs/executions/strategy_metrics), slot goes to new curate_keep_decision (green r01-r04)",
    "topk_events": "r05 rotation; top-k family checked via recent_ticks_per_instrument + latest_price_per_instrument + runs_listing_join_topn (green r01-r04)",
    "position_transitions": "r05 rotation; lag+filter family checked via signals_decisions + positions_forward_fill (green r01-r04)",
}


def _registry():
    # Import failures must propagate: a registry that silently shrinks turns
    # implemented-and-tested operators into unverifiable ones (4 queries
    # vanished from CORRECTNESS_r02 this way with zero signal).
    from spark_signals.control.latency import LATENCY_QUERIES
    from spark_signals.datapipe.parity import DATAPIPE_QUERIES
    from spark_signals.parity import PIPELINE_QUERIES
    from spark_signals.relational import RELATIONAL_QUERIES
    from spark_signals.serving import SERVING_QUERIES
    from spark_signals.streaming.parity import STREAMING_QUERIES
    from spark_signals.temporal import TEMPORAL_QUERIES

    merged: dict = {}
    for part in (
        PIPELINE_QUERIES,
        DATAPIPE_QUERIES,
        RELATIONAL_QUERIES,
        STREAMING_QUERIES,
        SERVING_QUERIES,
        TEMPORAL_QUERIES,
        LATENCY_QUERIES,
    ):
        overlap = merged.keys() & part.keys()
        if overlap:
            raise RuntimeError(f"duplicate query names across registries: {sorted(overlap)}")
        merged.update(part)
    lost = set(RETIRED) - merged.keys()
    if lost:
        raise RuntimeError(f"RETIRED names unknown queries: {sorted(lost)}")
    active = {k: v for k, v in merged.items() if k not in RETIRED}
    if len(active) > DRIVER_CAP:
        raise RuntimeError(
            f"registry has {len(active)} active queries but the driver checks "
            f"only {DRIVER_CAP}; retire or consolidate explicitly instead of "
            f"letting insertion order silently decide which lose evidence"
        )
    return active


def _retired_registry():
    from spark_signals.datapipe.parity import DATAPIPE_QUERIES
    from spark_signals.parity import PIPELINE_QUERIES
    from spark_signals.relational import RELATIONAL_QUERIES

    merged = {**PIPELINE_QUERIES, **DATAPIPE_QUERIES, **RELATIONAL_QUERIES}
    missing = set(RETIRED) - merged.keys()
    if missing:
        raise RuntimeError(f"RETIRED queries not found: {sorted(missing)}")
    return {k: merged[k] for k in RETIRED}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full signal pipeline —
    tick normalization → rolling features → SMA crossover detection →
    non-HOLD trading decisions."""
    from spark_signals.parity import q_signals_decisions

    return q_signals_decisions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec[0] for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for non-SQL-expressible
    ops, which get the driver's weaker rows-only check)."""
    return {name: spec[1] for name, spec in _registry().items() if spec[1] is not None}


def extended_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries RETIRED from the driver contract (redundant with checked
    siblings) but still implemented and locally oracle-verified via
    ``tools/oracle_check.py --extended``."""
    return {name: spec[0] for name, spec in _retired_registry().items()}


def extended_oracle_sql() -> dict[str, str]:
    return {
        name: spec[1]
        for name, spec in _retired_registry().items()
        if spec[1] is not None
    }
