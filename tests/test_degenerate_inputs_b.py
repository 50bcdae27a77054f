"""Degenerate-input sweep, shard B (odd-indexed ops).

Same sweeps as shard A over the other half of the operator registry —
see tests/_degenerate_common.py for the registry and rationale, and
tests/test_degenerate_inputs.py for the shard-split contract. A
completeness guard below pins that the two shards together cover every
registered op exactly once.
"""

from __future__ import annotations

import pytest

from tests._degenerate_common import OPS, _docs, _empty

SHARD_B = sorted(OPS)[1::2]


def test_shards_cover_registry_exactly():
    """Shard A (even) + shard B (odd) = every op, no overlap — the split
    must never silently drop an operator from the sweep."""
    a = sorted(OPS)[::2]
    assert sorted(a + SHARD_B) == sorted(OPS)
    assert not set(a) & set(SHARD_B)


@pytest.mark.parametrize("name", SHARD_B)
def test_empty_corpus_yields_empty_result(spark, name):
    out = OPS[name](_empty(spark))
    assert out.count() == 0  # no phantom rows, no crash


@pytest.mark.parametrize("name", SHARD_B)
def test_whitespace_only_docs_do_not_crash(spark, name):
    """Whitespace-only text has an EMPTY token array — the case where a
    naive explode round-trip would manufacture a '' token/gram."""
    out = OPS[name](_docs(spark, ["   ", "\t\t", "real words here ok"]))
    rows = out.collect()
    # no operator may emit a row derived from an empty token set with
    # nonsense aggregates (NaN ratios, '' grams); presence of the real doc
    # (or pairs among real docs only) is fine
    for r in rows:
        d = r.asDict()
        for v in d.values():
            assert v == v, f"{name} emitted NaN in {d}"  # NaN != NaN
