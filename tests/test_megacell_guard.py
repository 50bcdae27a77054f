"""Mega-cell guard (r12): the cogrouped Arrow stages (KNN candidate
scoring, SemDeDup within-cell counts) chunk-split any cell whose side
exceeds ``cell_cap`` — cogroups don't AQE-split, so without the guard one
pathological trained cell would serialize one task holding the whole
cell's embedding matrix (r11 verdict "What's wrong" #1, advisor low #3).

The split must be invisible in results: a (probe, mate) pair meets in
exactly one (pchunk, mchunk) group, SemDeDup counts are additive over
mate chunks, and the KNN per-chunk top-k union is a superset of the
per-cell top-k that the global window reduces identically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_signals.datapipe import similarity as SIM
from spark_signals.datapipe.dedup import _semdedup_counts_arrow, semdedup
from spark_signals.datapipe.similarity import _chunk_splits
from spark_signals.io.sources import read_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings").localCheckpoint(eager=True)


def test_chunk_splits_ceil_and_fresh_key(spark):
    """ceil(count/cap) per key, minimum 1; the key column must carry a
    FRESH attribute id so joining the factor back onto the counted
    relation never trips the ambiguous-self-join analyzer."""
    df = spark.createDataFrame(
        [(1,)] * 10 + [(2,)] * 4 + [(3,)] * 1, "cell int"
    )
    got = {r["cell"]: r["ns"] for r in _chunk_splits(df, "cell", 4, "ns").collect()}
    assert got == {1: 3, 2: 1, 3: 1}
    # the re-alias contract: joining back is legal (would raise otherwise)
    joined = df.join(F.broadcast(_chunk_splits(df, "cell", 4, "ns")), "cell")
    assert joined.count() == 15


def test_semdedup_split_path_equals_default(spark, emb):
    """Forcing every cell to chunk-split (cap=4 on ~62-row cells) must not
    move a single output row vs the unsplit default path."""
    base = _rows(semdedup(emb, k=SIM.KMEANS_K))
    split = _rows(semdedup(emb, k=SIM.KMEANS_K, cell_cap=4))
    assert split == base
    assert any(r[3] for r in base), "fixture corpus must contain semdups"


def test_knn_split_path_equals_default(spark, emb):
    base = _rows(SIM.knn_join_ivf(emb))
    split = _rows(SIM.knn_join_ivf(emb, cell_cap=8))
    assert split == base and len(base) > 0


def test_knn_planted_mega_cell_splits_and_matches(spark, emb):
    """k=1 plants a true mega-cell (the WHOLE corpus in one trained cell);
    a small cap must still produce the exact same top-k join, and the
    chunk factor must actually have engaged."""
    n = emb.count()
    cap = 16
    base = _rows(SIM.knn_join_ivf(emb, k=1))
    split = _rows(SIM.knn_join_ivf(emb, k=1, cell_cap=cap))
    assert split == base and len(base) > 0
    # the guard's arithmetic on the planted cell: one cell of n rows
    one_cell = emb.select(F.lit(0).alias("label"))
    fac = _chunk_splits(one_cell, "label", cap, "ns").collect()[0]["ns"]
    assert fac == -(-n // cap) and fac > 1


def test_semdedup_group_sides_bounded_under_split(spark, emb):
    """Bounded-task assertion: reconstruct the guard's (cell, pchunk,
    mchunk) keys with the SAME expressions and verify no cogroup side
    exceeds the cap by more than hash variance (< 4x here)."""
    from spark_signals.datapipe.similarity import kmeans_assign_arrow, kmeans_train

    cap = 4
    cells = kmeans_assign_arrow(emb, kmeans_train(emb, SIM.KMEANS_K))
    rel = emb.join(cells, "vec_id").select(
        "vec_id", F.col("cluster_id").alias("cell")
    )
    splits = _chunk_splits(rel.select("cell"), "cell", cap, "nsplits")
    probe_sides = (
        rel.join(F.broadcast(splits), "cell")
        .withColumn(
            "pchunk", F.pmod(F.xxhash64("vec_id"), F.col("nsplits")).cast("int")
        )
        .groupBy("cell", "pchunk")
        .count()
    )
    assert probe_sides.agg(F.max("count")).collect()[0][0] < 4 * cap
    assert splits.agg(F.max("nsplits")).collect()[0][0] > 1


def test_counts_stage_direct_split_equivalence(spark, emb):
    """The count stage alone, default vs forced split, on a planted
    single-cell relation (the rawest mega-cell shape)."""
    from spark_signals.datapipe.dedup import SEMDEDUP_THRESHOLD

    rel = emb.select("vec_id", "embedding", F.lit(0).alias("cell"))
    base = _rows(_semdedup_counts_arrow(rel, SEMDEDUP_THRESHOLD))
    split = _rows(_semdedup_counts_arrow(rel, SEMDEDUP_THRESHOLD, cell_cap=8))
    assert split == base and len(base) > 0
