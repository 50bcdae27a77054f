"""Recall quality gate for the ANN family.

Every approximate variant is held to a recall@k floor against the
brute-force exact top-k on the same corpus, at the pinned production
parameters (NPROBE, KMEANS_K/ITERS, PQ_M/PQ_RERANK). The operators are
fully deterministic (hash-seeded, gridded distances), so recall at a fixed
corpus is a constant — any future refactor that silently trades recall for
speed moves these numbers and trips the floor. Measured values at sf0.001
when the gate was pinned (r06): ivf_label 0.450, ivf_trained 0.650,
ivfpq_adc 0.512 (synthetic near-uniform embeddings are the hard case for
cell probing — clustered real-world embeddings score higher); floors sit a
few points below as an honest tripwire, not a target.
"""

from __future__ import annotations

import pytest

from spark_signals.datapipe import similarity as SIM
from spark_signals.io.sources import read_table

SF = "/root/testdata/sf0.001"

RECALL_FLOORS = [
    ("ivf_label", SIM.ann_ivf_topk, 0.40),
    ("ivf_trained", SIM.ann_ivf_trained_topk, 0.55),
    ("ivfpq_adc", SIM.ann_ivfpq_topk, 0.45),
]


@pytest.fixture(scope="module")
def exact_topk(spark):
    emb = read_table(spark, SF, "embeddings")
    ref = {
        (r["query_id"], r["match_id"])
        for r in SIM.ann_bruteforce_topk(emb).collect()
    }
    return emb, ref


@pytest.mark.parametrize(
    "name,op,floor", RECALL_FLOORS, ids=[n for n, _, _ in RECALL_FLOORS]
)
def test_ann_recall_floor(exact_topk, name, op, floor):
    emb, ref = exact_topk
    got = {(r["query_id"], r["match_id"]) for r in op(emb).collect()}
    recall = len(got & ref) / len(ref)
    assert recall >= floor, (
        f"{name} recall@{SIM.TOP_K} = {recall:.3f} fell below the {floor} "
        f"floor — a refactor traded recall away (see tools/ann_recall.py)"
    )


def test_dense_ivf_query_recall_floor(spark):
    """The IVF-probed dense retrieval arm (retrieval.dense_ivf_topk) vs its
    exact-scan twin on the document corpus: the literal-query cell probe
    must keep most of the exact top-k (measured 0.80 at sf0.001 / 0.92 at
    sf0.01 when pinned, r08)."""
    from spark_signals.datapipe.retrieval import dense_hash_topk, dense_ivf_topk
    from spark_signals.io.sources import read_table

    docs = read_table(spark, SF, "documents")
    exact = {r["doc_id"] for r in dense_hash_topk(docs).collect()}
    ivf = {r["doc_id"] for r in dense_ivf_topk(docs).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.70, (
        f"dense_ivf_topk recall = {recall:.3f} fell below the 0.70 floor — "
        "the cell probe traded too much recall away"
    )


def test_knn_join_recall_floor(spark):
    """The IVF KNN self-join vs the exact all-pairs top-k on the same
    corpus: probing NPROBE trained cells per vector must keep most of each
    vector's true neighbor list (measured 0.670 at sf0.001 when pinned,
    r08 — the same near-uniform hard case as the query-time floors)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_signals.parity import sround

    emb = read_table(spark, SF, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("c_emb")
    )
    cos = sround(
        SIM._cos_div(
            SIM._dot("q_emb", "c_emb"), SIM._norm("q_emb") * SIM._norm("c_emb")
        ),
        6,
    )
    pairs = (
        q.crossJoin(c)
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    exact = {
        (r["query_id"], r["match_id"])
        for r in pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM.KNN_K)
        .collect()
    }
    got = {
        (r["query_id"], r["match_id"]) for r in SIM.knn_join_ivf(emb).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.58, (
        f"knn_join_ivf recall@{SIM.KNN_K} = {recall:.3f} fell below the "
        "0.58 floor — the cell probe traded too much recall away"
    )


def test_knn_join_sample_trained_recall_floor(spark):
    """FAISS-style sample training (cap 200 of 500 vectors) costs only a
    few recall points vs full training (measured 0.636 vs 0.670 when
    pinned, r08), and at/under the cap the sampled trainer is bit-identical
    to the full trainer."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_signals.parity import sround

    emb = read_table(spark, SF, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("c_emb")
    )
    cos = sround(
        SIM._cos_div(
            SIM._dot("q_emb", "c_emb"), SIM._norm("q_emb") * SIM._norm("c_emb")
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    exact = {
        (r["query_id"], r["match_id"])
        for r in q.crossJoin(c)
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM.KNN_K)
        .collect()
    }
    sampled = {
        (r["query_id"], r["match_id"])
        for r in SIM.knn_join_ivf(emb, train_cap=200).collect()
    }
    recall = len(sampled & exact) / len(exact)
    assert recall >= 0.55, (
        f"sample-trained knn recall = {recall:.3f} below the 0.55 floor"
    )
    # cap >= corpus: the sampled trainer must reduce to the full trainer
    full = {tuple(r) for r in SIM.knn_join_ivf(emb).collect()}
    capped = {tuple(r) for r in SIM.knn_join_ivf(emb, train_cap=10_000).collect()}
    assert full == capped


def test_knn_builder_runs_no_count_with_hints(spark, monkeypatch):
    """Lazy-composer contract: with k pinned and the corpus-count hint
    supplied, knn_join_ivf must trigger NO DataFrame.count() of its own
    anywhere in the build (train_cap stays at its ON default) — the r8/r9
    review item about surprise actions inside the builder."""
    from pyspark.sql import DataFrame

    from spark_signals.io.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()  # paid once by the caller, passed as the hint

    def _no_count(self):
        raise AssertionError("count() ran at builder time")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    out = SIM.knn_join_ivf(emb, k=SIM.KMEANS_K, n_rows=n)
    monkeypatch.undo()
    assert out.count() > 0  # the plan still builds and runs


def test_arrow_assign_and_probe_match_longform_sql(spark):
    """Differential pin for the r11 Arrow matmul stages: on the real
    embeddings table, kmeans_assign_arrow must produce EXACTLY the
    long-form SQL kmeans_assign's (vec_id, cluster_id) relation, and
    probe_cells_arrow must produce exactly the vc/row_number probe set it
    replaced — same 1e-6 grid, same lower-cluster_id tie-break. This is
    what licenses swapping the stages under every oracle-checked face."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_signals.datapipe.similarity import (
        NPROBE,
        _cos_div,
        _long_dims,
        kmeans_assign,
        kmeans_assign_arrow,
        kmeans_train,
        probe_cells_arrow,
    )
    from spark_signals.parity import sround

    emb = read_table(spark, SF, "embeddings")
    cents = kmeans_train(emb, k=16)

    sql_assign = {tuple(r) for r in kmeans_assign(_long_dims(emb), cents).collect()}
    arrow_assign = {tuple(r) for r in kmeans_assign_arrow(emb, cents).collect()}
    assert arrow_assign == sql_assign

    dims = _long_dims(emb)
    vc = (
        dims.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cluster_id")
        .agg(
            F.sum(F.col("val") * F.col("c_val")).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("vv"),
            F.sum(F.col("c_val") * F.col("c_val")).alias("cc"),
        )
        .select(
            "vec_id",
            "cluster_id",
            sround(_cos_div(F.col("dot"), F.sqrt("vv") * F.sqrt("cc")), 6).alias("c_cos"),
        )
    )
    wp = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cluster_id"))
    sql_probe = {
        tuple(r)
        for r in vc.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= NPROBE)
        .select("vec_id", F.col("cluster_id").cast("int"))
        .collect()
    }
    arrow_probe = {tuple(r) for r in probe_cells_arrow(emb, cents).collect()}
    assert arrow_probe == sql_probe


def test_arrow_assign_cancellation_guard(spark):
    """r12 (advisor low #1): the expanded form ||x||^2-2x.c+||c||^2 loses
    ~ulps of ||x||^2 to cancellation when a vector sits very close to a
    centroid, which can flip a gridded assignment that the twins' direct
    sum((x-c)^2) gets right. The planted frame below is a CONFIRMED flip
    for the unguarded expanded form (asserted inline so value drift can't
    quietly defang the fixture): a large-norm vector equidistant-to-grid
    from two centroids, where the cancellation error pushes cell 0 across
    a floor boundary and the raw expanded argmin picks cell 1 while the
    direct form ties both at 0 and the tie-break picks cell 0. The
    production kmeans_assign_arrow must agree with the long-form SQL
    kmeans_assign (the oracle family's spelling) on this frame."""
    import numpy as np
    from pyspark.sql import functions as F

    from spark_signals.datapipe.similarity import (
        _long_dims,
        kmeans_assign,
        kmeans_assign_arrow,
    )

    D = 8
    delta = 0.0007070583301596343
    scale = 0.999999988
    x = [0.0] * D
    x[0], x[1] = 1000.0, 0.5
    c0 = list(x)
    c0[1] += delta
    c1 = list(x)
    c1[2] += delta * scale

    mat = np.array([c0, c1], dtype=np.float64)
    xv = np.array([x], dtype=np.float64)
    cc = (mat * mat).sum(axis=1)
    exp_g = np.floor(
        ((xv * xv).sum(1)[:, None] - 2.0 * (xv @ mat.T) + cc[None, :]) * 1e6
        + 0.5000001
    )
    dir_g = np.floor(((xv[:, None, :] - mat[None, :, :]) ** 2).sum(-1) * 1e6 + 0.5000001)
    assert exp_g.argmin(1)[0] != dir_g.argmin(1)[0], (
        "fixture lost its sting: expanded and direct forms agree now"
    )

    emb = spark.createDataFrame(
        [(1, [float(v) for v in x]), (2, [float(v) + 3.0 for v in x])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(cid, d, float(vec[d])) for cid, vec in enumerate((c0, c1)) for d in range(D)],
        "cluster_id int, dim int, c_val double",
    )
    sql_assign = {tuple(r) for r in kmeans_assign(_long_dims(emb), cents).collect()}
    arrow_assign = {tuple(r) for r in kmeans_assign_arrow(emb, cents).collect()}
    assert arrow_assign == sql_assign
    assert dict(sql_assign)[1] == 0  # the direct-form tie-break verdict


def test_recall_report_rederives_from_the_two_rankings(spark):
    """The report's hits column equals a direct intersection of the two
    top-k relations, every recall is a valid gridded ratio in (0, 1e6],
    and the report covers every (query, k) cell."""
    import pytest

    from spark_signals.datapipe.similarity import (
        N_QUERIES,
        RECALL_KS,
        TOP_K,
        ann_bruteforce_topk,
        ann_ivf_trained_topk,
        ann_recall_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rep = ann_recall_report(emb).collect()
    assert len(rep) == N_QUERIES * len(RECALL_KS)
    exact = {
        (r["query_id"], r["match_id"], r["rank"]) for r in ann_bruteforce_topk(emb).collect()
    }
    approx = {
        (r["query_id"], r["match_id"], r["rank"])
        for r in ann_ivf_trained_topk(emb).collect()
    }
    for r in rep:
        q, k = r["query_id"], r["k"]
        e = {m for (qq, m, rk) in exact if qq == q and rk <= k}
        a = {m for (qq, m, rk) in approx if qq == q and rk <= k}
        assert r["hits"] == len(e & a) <= k
        assert 0 <= r["recall_u"] <= 1_000_000
        assert r["recall_u"] == int(r["hits"] * 1e6 / k + 0.5000001)
    # non-vacuous both ways on the synthetic corpus: the trained index
    # finds true neighbors, and at least one cell shows it is approximate
    assert sum(r["hits"] for r in rep) > 0
    with pytest.raises(ValueError):
        ann_recall_report(emb, ks=(TOP_K + 1,)).collect()
