"""The media streaming lane (r11): incremental decoded-grid dHash
near-dup over a persisted band index — batch-vs-stream equivalence,
cross-batch drops, and replay idempotence, mirroring the text lane's
contract (tests/test_streaming_curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_signals.datapipe import multimodal as M

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

BASE = "".join(chr(97 + (i * 13) % 26) for i in range(1500))


def _media(spark, rows):
    """rows: list of (doc_id, text) — media via the standard synthesizer
    so kinds follow doc_id % 3 exactly as the batch operators expect."""
    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows], DOC_SCHEMA
    )
    return M.synthesize_media(docs)


def _b1(spark):
    # ids 0 (long base, kind image) + two ordinary rows
    return _media(
        spark,
        [(0, BASE), (1, "an ordinary audio-kind payload row"), (2, "a video-kind payload here")],
    )


def _b2(spark):
    # id 3: near-dup of id 0 (2-char mid edit, same kind: 3 % 3 == 0)
    # id 4: genuinely new        id 6: EXACT copy of id 0 (same kind)
    return _media(
        spark,
        [
            (3, BASE[:700] + "qq" + BASE[702:]),
            (4, "completely new audio material nothing shared"),
            (6, BASE),
        ],
    )


def test_media_incremental_drops_cross_batch_neardups(spark, tmp_path):
    """Batch 2's near-dup AND exact dup of a batch-1 survivor both drop
    via the persisted index — without any batch-1 payload being re-read —
    and within-batch the greedy first-wins rule holds."""
    idx = M.media_phash_index(_b1(spark), force_stub=True)
    survivors, delta = M.media_phash_incremental(
        _b2(spark), idx, force_stub=True
    )
    assert sorted(r["media_id"] for r in survivors.collect()) == [4]
    # the delta covers exactly the admitted media rows
    assert {r["media_id"] for r in delta.collect()} == {4}
    assert delta.columns == ["kind", "band", "bkey", "media_id", "sig"]


def test_media_incremental_replay_admitted_batch_is_empty(spark):
    """Idempotence: replaying an admitted batch against the UPDATED index
    yields zero survivors (every row hamming-0-matches its own entry)."""
    b1 = _b1(spark)
    empty_idx = M.media_phash_index(b1, force_stub=True).filter(F.lit(False))
    survivors, delta = M.media_phash_incremental(b1, empty_idx, force_stub=True)
    assert survivors.count() == 3  # empty history: everything admits
    replay, _ = M.media_phash_incremental(b1, delta, force_stub=True)
    assert replay.count() == 0


def test_media_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """process_media_ingest_batch: batch-id-partitioned overwrite makes a
    foreachBatch replay byte-identical, and the cross-batch drop happens
    through the persisted index partitions."""
    from spark_signals.datapipe.streaming import process_media_ingest_batch

    dirs = dict(
        phash_index_dir=str(tmp_path / "phash_idx"),
        survivors_dir=str(tmp_path / "sur"),
    )
    process_media_ingest_batch(_b1(spark), 0, **dirs)
    process_media_ingest_batch(_b2(spark), 1, **dirs)
    survivors = spark.read.parquet(dirs["survivors_dir"])
    assert sorted(r["media_id"] for r in survivors.collect()) == [0, 1, 2, 4]
    idx = spark.read.parquet(dirs["phash_index_dir"])
    assert {r["media_id"] for r in idx.collect()} == {0, 1, 2, 4}

    snap = sorted((r["media_id"], r["batch_id"]) for r in survivors.collect())
    idx_snap = sorted(tuple(r) for r in idx.collect())
    process_media_ingest_batch(_b2(spark), 1, **dirs)  # replay last batch
    assert sorted(
        (r["media_id"], r["batch_id"])
        for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    ) == snap
    assert sorted(
        tuple(r) for r in spark.read.parquet(dirs["phash_index_dir"]).collect()
    ) == idx_snap


def test_media_stream_matches_sequential_batches(spark, tmp_path):
    """Stream-vs-batch equivalence: two availableNow drops through
    ingest_media_stream produce exactly the survivors of running
    media_phash_incremental sequentially in batch — the streaming lane is
    the batch operator under a scheduler, not a reimplementation."""
    from spark_signals.datapipe.streaming import ingest_media_stream

    b1, b2 = _b1(spark), _b2(spark)
    src = str(tmp_path / "drops")
    dirs = dict(
        phash_index_dir=str(tmp_path / "phash_idx"),
        survivors_dir=str(tmp_path / "sur"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    for batch in (b1, b2):
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        q = ingest_media_stream(stream, **dirs)
        q.awaitTermination()
    got = sorted(
        r["media_id"]
        for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    )

    # codec autodetect (no force_stub) on BOTH sides — the lane and its
    # batch replication must take the identical decode branch per row
    empty_idx = M.media_phash_index(b1).filter(F.lit(False))
    s1, d1 = M.media_phash_incremental(b1, empty_idx)
    s2, _ = M.media_phash_incremental(b2, d1)
    want = sorted(
        r["media_id"] for r in s1.unionByName(s2).select("media_id").collect()
    )
    assert got == want == [0, 1, 2, 4]


# ---------------------------------------------- embedding lane (r11)
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"

BASE_VEC = [float((i * 7) % 13 - 6) for i in range(8)]
ORTHO_A = [1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0]
ORTHO_B = [0.0, 1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows], EMB_SCHEMA
    )


def test_embedding_incremental_drops_cross_batch_neardups(spark):
    """A batch-2 vector near-parallel to a batch-1 survivor drops via the
    persisted LSH index (same bucket -> cosine verify), new directions
    admit, and replaying an admitted batch yields zero survivors."""
    from spark_signals.datapipe.dedup import (
        embedding_lsh_index,
        embedding_neardup_incremental,
    )

    b1 = _emb(spark, [(0, BASE_VEC), (1, ORTHO_A)])
    # 10: tiny perturbation of BASE_VEC (cosine ~1, same sign signature)
    # 11: a genuinely new direction
    b2 = _emb(
        spark,
        [(10, [x * 1.01 + 0.001 for x in BASE_VEC]), (11, ORTHO_B)],
    )
    idx = embedding_lsh_index(b1)
    survivors, delta = embedding_neardup_incremental(b2, idx)
    assert sorted(r["vec_id"] for r in survivors.collect()) == [11]
    assert {r["vec_id"] for r in delta.collect()} == {11}
    # idempotence: replay b1 against its own admitted index
    from pyspark.sql import functions as SF

    empty = embedding_lsh_index(b1).filter(SF.lit(False))
    s1, d1 = embedding_neardup_incremental(b1, empty)
    assert s1.count() == 2
    replay, _ = embedding_neardup_incremental(b1, d1)
    assert replay.count() == 0


def test_embedding_stream_matches_sequential_batches(spark, tmp_path):
    """Two availableNow drops through ingest_embedding_stream equal
    sequential embedding_neardup_incremental batch calls."""
    from spark_signals.datapipe.dedup import (
        embedding_lsh_index,
        embedding_neardup_incremental,
    )
    from spark_signals.datapipe.streaming import ingest_embedding_stream

    b1 = _emb(spark, [(0, BASE_VEC), (1, ORTHO_A)])
    b2 = _emb(
        spark,
        [(10, [x * 1.01 + 0.001 for x in BASE_VEC]), (11, ORTHO_B)],
    )
    src = str(tmp_path / "drops")
    dirs = dict(
        lsh_index_dir=str(tmp_path / "lsh_idx"),
        survivors_dir=str(tmp_path / "sur"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    for batch in (b1, b2):
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(b1.schema).parquet(src)
        q = ingest_embedding_stream(stream, **dirs)
        q.awaitTermination()
    got = sorted(
        r["vec_id"] for r in spark.read.parquet(dirs["survivors_dir"]).collect()
    )
    empty = embedding_lsh_index(b1).filter(F.lit(False))
    s1, d1 = embedding_neardup_incremental(b1, empty)
    s2, _ = embedding_neardup_incremental(b2, d1)
    want = sorted(
        r["vec_id"] for r in s1.unionByName(s2).select("vec_id").collect()
    )
    assert got == want == [0, 1, 11]


def test_embedding_hot_bucket_cap_fails_open_and_bounds_join(spark):
    """r12 (advisor low #2): a bucket whose combined (index + batch)
    population exceeds bucket_max carries no LSH evidence — it is
    EXCLUDED from both the history probe and the within-batch self-join,
    and its batch vectors are admitted (fail-open, the media band cap's
    rule). Below the cap the behavior is unchanged."""
    from spark_signals.datapipe.dedup import (
        embedding_lsh_index,
        embedding_neardup_incremental,
    )

    # 6 near-parallel history vectors + 3 near-parallel batch vectors,
    # all in one bucket; one orthogonal batch vector elsewhere
    hist = _emb(spark, [(i, [x * (1 + i * 1e-3) for x in BASE_VEC]) for i in range(6)])
    batch = _emb(
        spark,
        [(10 + j, [x * (1 + (3 + j) * 1e-3) for x in BASE_VEC]) for j in range(3)]
        + [(20, ORTHO_B)],
    )
    idx = embedding_lsh_index(hist)

    # uncapped: the hot bucket verifies; all three near-parallels drop
    s_un, _ = embedding_neardup_incremental(batch, idx)
    assert sorted(r["vec_id"] for r in s_un.collect()) == [20]

    # cap below the combined bucket population (6 + 3 = 9): bucket is
    # dropped from verification; its batch vectors are ADMITTED
    s_cap, d_cap = embedding_neardup_incremental(batch, idx, bucket_max=8)
    assert sorted(r["vec_id"] for r in s_cap.collect()) == [10, 11, 12, 20]
    # admitted rows still land in the delta (storage stays exact)
    assert sorted(r["vec_id"] for r in d_cap.collect()) == [10, 11, 12, 20]

    # cap at exactly the population: unchanged from uncapped
    s_eq, _ = embedding_neardup_incremental(batch, idx, bucket_max=9)
    assert sorted(r["vec_id"] for r in s_eq.collect()) == [20]
