"""Degenerate-input sweep, shard A (even-indexed ops + the
non-parametrized single-doc / zero-vector / empty-embedding cases).

The operator registry and the sweep rationale live in
tests/_degenerate_common.py; shard B is tests/test_degenerate_inputs_b.py.
The alphabetical interleave keeps the two shards balanced as operators are
added — a new op lands in whichever shard its sorted position dictates,
never all in one file.
"""

from __future__ import annotations

import pytest

from tests._degenerate_common import OPS, _docs, _empty
from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import scrub as S
from spark_signals.datapipe import text as T

SHARD_A = sorted(OPS)[::2]


@pytest.mark.parametrize("name", SHARD_A)
def test_empty_corpus_yields_empty_result(spark, name):
    out = OPS[name](_empty(spark))
    assert out.count() == 0  # no phantom rows, no crash


@pytest.mark.parametrize("name", SHARD_A)
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


def test_single_doc_corpus(spark):
    """One-document corpora: dedup finds no pairs, LM scores the doc against
    itself, sampling keeps or drops it deterministically — nothing throws."""
    docs = _docs(spark, ["only one document with several plain words"])
    assert D.dedup_minhash_lsh(docs).count() == 0
    assert D.dedup_passages(docs).collect()[0]["n_dup_passages"] in (0, 1)
    lm = T.unigram_lm_quality(docs).collect()
    assert len(lm) == 1 and lm[0]["lm_band"] in ("low", "mid", "high")
    assert S.pii_scrub(docs).count() == 1


def test_zero_vector_does_not_crash_ann(spark):
    """A single all-zero embedding (missing/failed upstream encode) must not
    kill an ANN stage under Spark 4's ANSI division — zero-norm rows score
    cosine 0.0 and fall to the bottom of every ranking."""
    from spark_signals.datapipe import similarity as SIM
    from spark_signals.datapipe.dedup import embedding_neardup

    rows = [(i, [float(i + d) for d in range(64)], i % 3) for i in range(12)]
    rows[5] = (5, [0.0] * 64, 2)  # corpus zero vector
    rows[1] = (1, [0.0] * 64, 1)  # QUERY zero vector (vec_id < N_QUERIES)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for op in (
        SIM.ann_bruteforce_topk,
        SIM.ann_ivf_topk,
        SIM.ann_lsh_pairs,
        SIM.ann_ivfpq_topk,
        SIM.knn_join_ivf,
        embedding_neardup,
    ):
        out = op(emb).collect()
        for r in out:
            d = r.asDict()
            for v in d.values():
                assert v == v, f"{op.__name__} emitted NaN: {d}"


def test_empty_embeddings_knn_join(spark):
    """An empty vector relation (fresh index, nothing ingested yet) must
    yield an empty neighbor list — the Lloyd loop, assignment, and probe
    stages all tolerate zero rows."""
    from spark_signals.datapipe import similarity as SIM

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert SIM.knn_join_ivf(emb).count() == 0
