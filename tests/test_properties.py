"""Property-based invariants (hypothesis) + out-of-order fixture.

The reference planned property tests over random walks (reference
README.md:273-285); Spark jobs are slow per example, so examples are few
but each asserts the full invariant set over a generated series.
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_signals.config import EngineConfig
from spark_signals.pipeline import build_pipeline
from tests.conftest import make_ticks

CFG = EngineConfig(sma_fast_window=3, sma_slow_window=8, sma_confirmation_window=2)

series = st.lists(
    st.floats(min_value=1.0, max_value=1000.0, allow_nan=False, allow_infinity=False),
    min_size=10,
    max_size=60,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(mids=series)
def test_pipeline_invariants(spark, mids):
    out = build_pipeline(make_ticks(spark, mids), CFG)
    rows = out.positions_costs.orderBy("sequence").collect()
    prev_pos = None
    for r in rows:
        # forward-fill domain
        assert r.position in (-1.0, 0.0, 1.0)
        # position_change arithmetic identity
        assert r.position_change == r.position - (prev_pos if prev_pos is not None else 0.0)
        # clamps (P6)
        assert 0.0 <= r.slippage_rate <= CFG.slippage_max_rate
        assert CFG.fill_latency_ms <= r.fill_latency_ms <= CFG.fill_latency_ms + CFG.fill_latency_jitter_ms
        # ratio guards never go negative
        assert r.volatility_ratio >= 0.0
        prev_pos = r.position
    # first tick per product has NULL returns (P2)
    assert rows[0].returns is None


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(mids=series, seed=st.integers(min_value=0, max_value=2**16))
def test_out_of_order_input_is_reordered_by_event_time(spark, mids, seed):
    """FIXTURES.md `out_of_order`: batch windows sort by (event_time,
    sequence), so any input row order yields identical results."""
    import random

    ticks = make_ticks(spark, mids)
    rows = ticks.collect()
    rng = random.Random(seed)
    shuffled_rows = rows[:]
    rng.shuffle(shuffled_rows)
    shuffled = spark.createDataFrame(shuffled_rows, ticks.schema)

    a = build_pipeline(ticks, CFG).positions_costs.orderBy("sequence").collect()
    b = build_pipeline(shuffled, CFG).positions_costs.orderBy("sequence").collect()
    assert a == b


# ------------------------------------------------ r06 training-data ops
_corpus = st.lists(
    st.text(
        alphabet=st.sampled_from("ab ç€\t\n"),  # tiny alphabet → heavy collisions
        max_size=30,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, ctx=st.integers(min_value=2, max_value=9))
def test_pack_manifest_properties(spark, texts, ctx):
    """For ANY corpus and ctx size: per-shard offsets are the exact prefix
    sums of (n_tokens + EOS), and window indices derive from them."""
    from spark_signals.datapipe.pack import EOS_TOKENS, pack_sequences

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = pack_sequences(docs, ctx_len=ctx, num_shards=3).collect()
    assert len(rows) == len(texts)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["tok_offset"] == off
            assert r["first_window"] == r["tok_offset"] // ctx
            assert r["last_window"] == (r["tok_offset"] + max(r["n_tokens"] - 1, 0)) // ctx
            off += r["n_tokens"] + EOS_TOKENS


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=_corpus,
    chunk=st.integers(min_value=2, max_value=8),
    ov=st.integers(min_value=0, max_value=6),
)
def test_chunking_properties(spark, texts, chunk, ov):
    """For ANY corpus and (chunk, overlap): full word coverage, in-bounds
    slices, exact stride starts."""
    from hypothesis import assume

    from spark_signals.datapipe.chunk import chunk_documents
    from spark_signals.datapipe.text import words_col

    assume(ov < chunk)
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    n_words = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(words_col(F.col("text"))).alias("n")).collect()
    }
    out = chunk_documents(docs, chunk_words=chunk, overlap=ov).collect()
    covered: dict[int, set] = {}
    for r in out:
        assert r["start_word"] == r["chunk_index"] * (chunk - ov)
        assert 1 <= r["n_chunk_words"] <= chunk
        assert r["start_word"] + r["n_chunk_words"] <= n_words[r["doc_id"]]
        covered.setdefault(r["doc_id"], set()).update(
            range(r["start_word"], r["start_word"] + r["n_chunk_words"])
        )
    for doc_id, n in n_words.items():
        assert covered.get(doc_id, set()) == set(range(n))


@settings(max_examples=200, deadline=None)
@given(
    budget=st.integers(min_value=0, max_value=10**12),
    weights=st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=8,
        ),
        st.floats(
            min_value=1e-6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=12,
    ),
)
# r14 verdict's falsifying example: plain float sum() over the weights is
# insertion-order-dependent (2000000.5000009998 vs 2000000.500001 reversed),
# flipping which of the two near-tied quotas wins the largest-remainder
# unit. math.fsum is exactly-rounded, hence permutation-invariant.
@example(
    budget=113,
    weights={"a": 1e-06, "b": 0.5, "c": 1000000.0, "aa": 999999.9999999999},
)
def test_budget_apportionment_properties(budget, weights):
    """Pure largest-remainder invariants, no Spark: targets are
    nonnegative ints summing EXACTLY to the budget; every target is
    within 1 of its real quota (Hamilton's method never deviates more);
    and the result is independent of dict insertion order."""
    from spark_signals.datapipe.sampling import _budget_targets

    t = _budget_targets(budget, weights)
    assert set(t) == set(weights)
    assert all(isinstance(v, int) and v >= 0 for v in t.values())
    assert sum(t.values()) == budget
    total = sum(weights.values())
    for s, w in weights.items():
        quota = budget * (w / total)
        assert quota - 1 < t[s] < quota + 1
    shuffled = dict(sorted(weights.items(), reverse=True))
    assert _budget_targets(budget, shuffled) == t
    # rotate the insertion order too — fsum makes ANY permutation equal
    items = list(weights.items())
    rotated = dict(items[len(items) // 2 :] + items[: len(items) // 2])
    assert _budget_targets(budget, rotated) == t


def test_budget_apportionment_rejects_negative_inputs():
    """A negative weight would make int() truncate toward zero past the
    quota, drive leftover negative, and silently corrupt targets via a
    negative slice (advisor r14); both bad inputs must raise instead."""
    import pytest

    from spark_signals.datapipe.sampling import _budget_targets

    with pytest.raises(ValueError, match="nonnegative"):
        _budget_targets(100, {"a": 1.0, "b": -0.5})
    with pytest.raises(ValueError, match="nonnegative"):
        _budget_targets(-1, {"a": 1.0})
    with pytest.raises(ValueError, match="positive"):
        _budget_targets(100, {"a": 0.0})
