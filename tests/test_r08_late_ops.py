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
