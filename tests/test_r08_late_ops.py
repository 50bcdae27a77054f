"""Semantics of the late-r08 incoming wave: the temperature-annealed
mixture curriculum (knn_join_ivf is gated in test_ann_recall/test_plans,
bpe_fertility_by_lang in test_bpe)."""

from __future__ import annotations

import pytest

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _skewed_docs(spark):
    # src_big supplies 16 words, src_small 2 — an 8:1 supply skew
    rows = [(i, "w " * 4, "en", "src_big", 8) for i in range(4)] + [
        (100, "w w", "en", "src_small", 3)
    ]
    return spark.createDataFrame(
        [(d, t.strip(), lg, s, n) for d, t, lg, s, n in rows], DOC_SCHEMA
    )


def test_curriculum_epoch1_matches_raw_supply_shares(spark):
    """At T=1 (epoch 1 with t_start=1.0) weights are exactly the raw
    supply shares: 16/18 and 2/18 on the skewed corpus."""
    from spark_signals.datapipe.sampling import mixture_curriculum

    out = {
        (r["epoch"], r["source"]): r
        for r in mixture_curriculum(
            _skewed_docs(spark), epochs=3, t_start=1.0, t_end=3.0
        ).collect()
    }
    assert out[(1, "src_big")]["weight"] == pytest.approx(16 / 18, abs=1e-6)
    assert out[(1, "src_small")]["weight"] == pytest.approx(2 / 18, abs=1e-6)
    assert out[(1, "src_big")]["temperature"] == 1.0
    assert out[(3, "src_big")]["temperature"] == 3.0


def test_curriculum_anneals_toward_uniform(spark):
    """Later epochs flatten the mixture: the dominant source's weight
    decreases monotonically across epochs, the rare source's increases,
    and each epoch's weights sum to ~1."""
    from spark_signals.datapipe.sampling import mixture_curriculum

    rows = mixture_curriculum(
        _skewed_docs(spark), epochs=4, t_start=1.0, t_end=4.0
    ).collect()
    big = {r["epoch"]: r["weight"] for r in rows if r["source"] == "src_big"}
    small = {r["epoch"]: r["weight"] for r in rows if r["source"] == "src_small"}
    for e in (2, 3, 4):
        assert big[e] < big[e - 1]
        assert small[e] > small[e - 1]
    for e in (1, 2, 3, 4):
        assert big[e] + small[e] == pytest.approx(1.0, abs=2e-6)


def test_curriculum_single_epoch_is_one_manifest(spark):
    """epochs=1 degenerates cleanly (no 0/0 in the temperature ramp) and
    prices the full per-epoch budget."""
    from spark_signals.datapipe.sampling import mixture_curriculum

    rows = mixture_curriculum(
        _skewed_docs(spark), epochs=1, t_start=2.0, t_end=9.9,
        budget_tokens_per_epoch=1000,
    ).collect()
    assert {r["epoch"] for r in rows} == {1}
    assert all(r["temperature"] == 2.0 for r in rows)
    assert sum(r["target_tokens"] for r in rows) == pytest.approx(1000, abs=2)


# -------------------------------------------------- training-order shuffle
def test_shuffle_windows_covers_each_window_once(spark):
    """One row per packed (shard, window); token mass per window never
    exceeds ctx_len and interior windows are exactly full (tokens +
    document EOS gaps fill the rest)."""
    from spark_signals.datapipe.pack import CTX_LEN, pack_windows, shuffle_windows
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    wins = shuffle_windows(docs).collect()
    keys = {(r["shard"], r["window"]) for r in wins}
    assert len(keys) == len(wins)  # a window appears exactly once
    expected = {
        (r["shard"], r["window"]) for r in pack_windows(docs).collect()
    }
    assert keys == expected
    assert all(r["n_window_tokens"] <= CTX_LEN for r in wins)


def test_shuffle_windows_keys_are_stable_and_balanced(spark):
    """order_key is a pure function of (shard, window) — identical across
    runs — and the reader assignment is near-even."""
    from collections import Counter

    from spark_signals.datapipe.pack import N_READERS, shuffle_windows
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = {(r["shard"], r["window"]): (r["order_key"], r["reader"])
         for r in shuffle_windows(docs).collect()}
    b = {(r["shard"], r["window"]): (r["order_key"], r["reader"])
         for r in shuffle_windows(docs).collect()}
    assert a == b
    readers = Counter(v[1] for v in a.values())
    assert set(readers) == set(range(N_READERS))
    assert max(readers.values()) <= 1.5 * min(readers.values())
    assert len({v[0] for v in a.values()}) == len(a)  # keys are distinct


# ------------------------------------------------ multi-benchmark report
def test_decontam_report_counts_per_benchmark(spark):
    """Leaked docs count once per benchmark they overlap; clean benchmarks
    report zero with the eval-doc count intact."""
    from spark_signals.datapipe.decontam import decontam_report

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "web", 30),
            (2, "one two three four five six", "en", "web", 20),
            (3, "totally unrelated content right here now", "en", "web", 30),
        ],
        DOC_SCHEMA,
    )
    benchmarks = spark.createDataFrame(
        [
            ("suiteA", 10, "alpha beta gamma delta epsilon zeta"),
            ("suiteA", 11, "no overlap with anything in training data"),
            ("suiteB", 20, "completely disjoint benchmark text sample here"),
        ],
        "bench string, doc_id long, text string",
    )
    out = {r["bench"]: r for r in decontam_report(train, benchmarks).collect()}
    a, b = out["suiteA"], out["suiteB"]
    assert a["n_eval_docs"] == 2
    assert a["n_contaminated_train_docs"] == 1  # doc 1 leaks suiteA
    assert a["contamination_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert (b["n_contaminated_train_docs"], b["n_overlap_pairs"]) == (0, 0)
    assert b["contamination_rate"] == 0.0
