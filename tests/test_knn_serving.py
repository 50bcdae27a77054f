"""Continuous KNN serving lane (r12, r11 verdict #4): a persisted
trained-IVF (centroids, index) pair served by a micro-batched query
stream must produce EXACTLY the batch results — per-query determinism is
knn_serve_batch's contract, so any partition of the query set (stream
micro-batches included) unions to the full-set answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_signals.datapipe import similarity as SIM
from spark_signals.io.sources import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF, "embeddings").localCheckpoint(eager=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_serve_batch_over_full_corpus_equals_self_join(spark, emb):
    """knn_join_ivf IS knn_serve_batch with queries = the indexed corpus —
    the refactor invariant that keeps the self-join oracle hashes pinned."""
    centroids, index = SIM.ivf_serving_index(emb)
    served = _rows(
        SIM.knn_serve_batch(emb.select("vec_id", "embedding"), centroids, index)
    )
    assert served == _rows(SIM.knn_join_ivf(emb)) and len(served) > 0


def test_serve_batch_is_query_partition_invariant(spark, emb):
    """Union of per-partition serve calls == one full serve call."""
    centroids, index = SIM.ivf_serving_index(emb)
    full = _rows(SIM.knn_serve_batch(emb, centroids, index))
    parts = []
    for m in range(3):
        parts += _rows(
            SIM.knn_serve_batch(
                emb.filter(F.col("vec_id") % 3 == m), centroids, index
            )
        )
    assert sorted(parts) == full


def test_serve_stream_matches_batch(spark, emb, tmp_path):
    """Two availableNow query drops through serve_knn_stream against a
    persisted index equal one batch knn_serve_batch over both drops."""
    from spark_signals.datapipe.streaming import serve_knn_stream

    centroids, index = SIM.ivf_serving_index(emb)
    cdir, idir = str(tmp_path / "cents"), str(tmp_path / "index")
    centroids.write.parquet(cdir)
    index.write.parquet(idir)

    q1 = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    q2 = emb.filter(F.col("vec_id") % 10 == 1).select("vec_id", "embedding")
    src = str(tmp_path / "queries")
    dirs = dict(
        centroids_dir=cdir,
        index_dir=idir,
        results_dir=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    for q in (q1, q2):
        q.write.mode("append").parquet(src)
        stream = spark.readStream.schema(q1.schema).parquet(src)
        h = serve_knn_stream(stream, **dirs)
        h.awaitTermination()

    got = _rows(
        spark.read.parquet(dirs["results_dir"]).select(
            "query_id", "match_id", "cosine", "rank"
        )
    )
    want = _rows(SIM.knn_serve_batch(q1.unionByName(q2), centroids, index))
    assert got == want and len(got) > 0


def test_serve_stream_replay_is_idempotent(spark, emb, tmp_path):
    """Replaying a served batch id overwrites its own partition with
    identical rows (exactly-once by path, the ingest lanes' discipline)."""
    from spark_signals.datapipe.streaming import process_knn_serve_batch

    centroids, index = SIM.ivf_serving_index(emb)
    cdir, idir = str(tmp_path / "cents"), str(tmp_path / "index")
    centroids.write.parquet(cdir)
    index.write.parquet(idir)
    q = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    rdir = str(tmp_path / "results")
    kw = dict(centroids_dir=cdir, index_dir=idir, results_dir=rdir)
    process_knn_serve_batch(q, 0, **kw)
    first = _rows(spark.read.parquet(rdir))
    process_knn_serve_batch(q, 0, **kw)  # redelivery of the same batch
    assert _rows(spark.read.parquet(rdir)) == first and len(first) > 0


def test_retrain_repoints_current_and_stream_picks_it_up(spark, emb, tmp_path):
    """control.maintenance.retrain_ivf_serving writes immutable versions
    and atomically repoints CURRENT; the serving lane re-resolves it per
    micro-batch, so a retrain between batches changes the NEXT batch's
    results with no restart and no torn pair."""
    from spark_signals.control.maintenance import (
        current_ivf_dirs,
        retrain_ivf_serving,
    )
    from spark_signals.datapipe.streaming import process_knn_serve_batch

    root = str(tmp_path / "serving")
    # v1: index over the half-corpus; v2: full corpus (different answers)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    retrain_ivf_serving(half, root, k=SIM.KMEANS_K)
    c1, i1 = current_ivf_dirs(root)
    assert "/v000001/" in c1 + "/"

    q = emb.filter(F.col("vec_id") % 10 == 1).select("vec_id", "embedding")
    rdir = str(tmp_path / "results")
    process_knn_serve_batch(q, 0, results_dir=rdir, serving_root=root)
    got_v1 = _rows(
        spark.read.parquet(rdir).select("query_id", "match_id", "cosine", "rank")
    )
    want_v1 = _rows(
        SIM.knn_serve_batch(
            q, spark.read.parquet(c1), spark.read.parquet(i1)
        )
    )
    assert got_v1 == want_v1 and len(got_v1) > 0

    retrain_ivf_serving(emb, root, k=SIM.KMEANS_K)
    c2, i2 = current_ivf_dirs(root)
    assert "/v000002/" in c2 + "/" and c2 != c1
    process_knn_serve_batch(q, 1, results_dir=rdir, serving_root=root)
    got_v2 = _rows(
        spark.read.parquet(rdir + "/batch_id=1").select(
            "query_id", "match_id", "cosine", "rank"
        )
    )
    want_v2 = _rows(
        SIM.knn_serve_batch(
            q, spark.read.parquet(c2), spark.read.parquet(i2)
        )
    )
    assert got_v2 == want_v2
    # the retrain actually changed answers (full corpus adds odd matches)
    assert got_v2 != want_v1
    # v1 stays on disk, untouched, for in-flight readers
    assert spark.read.parquet(i1).count() == half.count()
