"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Each query materializes fully through the `noop` sink (forces every column
and operator, no output IO cost) — `count()` would let Catalyst prune the
very work being measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # full signal-pipeline DAG (windows, forward-fill, cost model, tumbling
    # metrics, window join, rollup)
    "normalized_prices",
    "positions_costs",
    "strategy_metrics",
    "metrics_hourly_rollup",
    # relational
    "pricing_summary_q1",
    "segment_revenue_3way_join",
    "segment_revenue_bucketed",
    "runs_listing_join_topn",
    # data-pipeline
    "text_stats_quality",
    "tfidf_top_terms",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from spark_signals.session import get_spark

    spark = get_spark("spark-signals-bench")
    # extended_queries holds entries retired from the driver's correctness
    # contract (redundant with checked siblings) that stay benchmarked here
    # (segment_revenue_3way_join is the non-bucketed plan variant).
    qs = {**entrymod.queries(), **entrymod.extended_queries()}

    # warm the JVM/session on the smallest table so first-query numbers
    # measure the plan, not executor spin-up
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Host-speed canary: a fixed JVM-side computation (no IO, no shuffle
    # variance) timed before and after the suite. Round-over-round artifact
    # comparison divides by this to separate "the plans got slower" from
    # "this round's host is slower" — the r05 host ran the identical r04
    # test suite 2.4x slower, which would otherwise read as a regression.
    def canary() -> float:
        t0 = time.time()
        # (id*id) % p keeps every element and the 2e8-row sum far below
        # 2^63 (ANSI overflow-safe)
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum((id * id) % 1000003) as s"
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    canary()  # untimed codegen warmup for the canary itself
    canary_pre = canary()

    # One UNTIMED warm pass per query (codegen/JIT/shuffle-file warmup —
    # without it the r03 artifact mis-read a 2.4s steady-state query as a
    # 4.3s regression because best-of-3 caught only warm-up passes), then N
    # timed passes. Passes are INTERLEAVED across queries (pass k runs every
    # query once) rather than back-to-back per query: a multi-second
    # noisy-neighbor spike on this host then lands in at most one sample per
    # query instead of all of them, so best-of-N stays a clean plan-cost
    # estimate. Report best (the throughput claim) AND median + a noise
    # ratio so host noise is visible instead of masquerading as regression.
    # 5 passes because this host's noise storms last minutes: with 3 passes
    # a single storm can cover every sample of the suite (observed r05:
    # noise_ratio 0.46 with clean canaries on both ends).
    passes = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5")))
    colds: dict[str, float] = {}
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        colds[name] = round(time.time() - t0, 3)
    canary_passes: list[float] = []
    for _ in range(passes):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
        # noise timeline: one fixed-work sample per pass, so a consumer can
        # see WHEN the host was slow, not just that it sometimes was
        canary_passes.append(canary())
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, runs in samples.items():
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)

    canary_post = canary()
    total = round(sum(timings.values()), 3)
    total_median = round(sum(medians.values()), 3)
    noise = round((total_median - total) / total, 3) if total else 0.0
    # Normalization statistic: the MEDIAN of the per-pass canaries, i.e. the
    # host's speed while the suite was actually running. r06 normalized by a
    # single post-suite sample (0.115 s) that landed ~3x below the in-suite
    # median (0.25-0.41 s), so suite_canary_normalized claimed a slowdown the
    # per-query numbers contradicted. Best/pre/post stay in the artifact as
    # drift markers only.
    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        return round(xs[len(xs) // 2], 3)

    canary_median = _median(canary_passes)
    canary_best = min([canary_pre, canary_post, *canary_passes])
    # Normalization base: the r05 judge host's in-suite canary speed, read
    # from the measurement that produced it (BENCH_r05.json canary_passes
    # median = 0.307) rather than a hardcoded constant, so the base stays
    # tied to its artifact. Same statistic on both sides of the division.
    canary_base_sec = 0.307
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r05.json")) as fh:
            _tail = json.load(fh)["tail"]
        _jline = [l for l in _tail.split("\n") if l.startswith('{"metric"')][0]
        canary_base_sec = _median(json.loads(_jline)["canary_passes"])
    except (OSError, KeyError, IndexError, ValueError):
        pass  # artifact absent on a fresh checkout: keep the recorded value
    normalized = (
        round(total * canary_base_sec / canary_median, 3) if canary_median else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "suite_median": total_median,
                "noise_ratio": noise,
                "passes": passes,
                # Methodology markers (added r04/r05): timed passes run AFTER
                # one untimed warm pass per query, so `value` excludes
                # cold-run cost — r01-r03 artifacts did NOT warm and are not
                # directly comparable. The cold first-run cost is reported
                # separately so consumers can see both.
                "warm_pass": True,
                "interleaved_passes": True,
                # fixed 2e8-element JVM aggregation, no IO/shuffle — a pure
                # host-speed probe. canary_sec = median of the per-pass
                # samples (the normalization statistic); canary_best kept as
                # a drift marker alongside pre/post.
                "canary_sec": canary_median,
                "canary_best": canary_best,
                "canary_base_sec": canary_base_sec,
                # suite best-of rescaled to the r05 judge host's in-suite
                # canary median: suite * canary_base_sec / median(passes)
                "suite_canary_normalized": normalized,
                "canary_pre": canary_pre,
                "canary_post": canary_post,
                "canary_passes": canary_passes,
                "queries_cold": colds,
                "suite_cold": round(sum(colds.values()), 3),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
