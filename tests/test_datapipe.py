"""Tests for the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import similarity as SIM
from spark_signals.datapipe import text as TX
from spark_signals.datapipe.multimodal import extract_features, synthesize_media

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


def test_dedup_exact_finds_whitespace_variants(spark):
    df = docs_df(
        spark,
        ["the quick brown fox", "THE  quick   Brown fox", "something else entirely"],
    )
    out = {r.doc_id: r for r in D.dedup_exact(df).collect()}
    assert out[0].canonical_doc_id == 0 and not out[0].is_duplicate
    assert out[1].canonical_doc_id == 0 and out[1].is_duplicate
    assert out[2].group_size == 1


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tonight")
    other = "completely different words about spark shuffles and parquet column pruning"
    df = docs_df(spark, [base, near, other])
    pairs = {(r.doc_a, r.doc_b) for r in D.dedup_minhash_lsh(df).collect()}
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} for p in pairs)


def test_ngram_jaccard_symmetric_bounds(spark):
    df = docs_df(spark, ["abcdefghij klmnop", "abcdefghij klmnoX", "zzzzz yyyyy xxxxx"])
    out = D.dedup_ngram_jaccard(df).collect()
    for r in out:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b
    assert any({r.doc_a, r.doc_b} == {0, 1} for r in out)


def test_simhash_identical_docs_zero_hamming(spark):
    df = docs_df(spark, ["alpha beta gamma delta", "alpha beta gamma delta", "unrelated totally different thing"])
    out = D.dedup_simhash(df).collect()
    exact = [r for r in out if (r.doc_a, r.doc_b) == (0, 1)]
    assert exact and exact[0].hamming == 0


def test_lang_id_prefers_matching_stopwords(spark):
    df = docs_df(
        spark,
        [
            "the cat is on the mat and the dog is in the house",
            "der hund ist mit der katze und das haus ist von der stadt",
            "el perro y la casa de los gatos en la ciudad que vive",
        ],
    )
    out = {r.doc_id: r.lang_guess for r in TX.lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "es"


def test_text_stats_ranges(spark):
    df = docs_df(spark, ["the quick brown fox!", "a b", "!!!!"])
    out = {r.doc_id: r for r in TX.text_stats(df).collect()}
    assert out[0].n_words == 4
    assert 0.0 <= out[0].punct_ratio <= 1.0
    assert 0.0 <= out[0].quality_score <= 1.0
    assert out[2].punct_ratio == 1.0 and out[2].quality_score == 0.0


def test_ann_topk_self_similarity(spark):
    import random

    random.seed(7)
    rows = []
    for vid in range(30):
        vec = [random.gauss(0, 1) for _ in range(8)]
        rows.append((vid, [float(x) for x in vec], vid % 3))
    # vec 20 = exact copy of query vec 0 → must be its top match
    rows[20] = (20, rows[0][1], rows[0][2])
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.IntegerType(), False),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    out = SIM.ann_bruteforce_topk(emb)
    top = {r.query_id: r.match_id for r in out.filter(F.col("rank") == 1).collect()}
    assert top[0] == 20
    per_query = out.groupBy("query_id").count().collect()
    assert all(r["count"] == SIM.TOP_K for r in per_query)


def test_ivf_probes_subset_and_finds_copy(spark):
    import random

    random.seed(11)
    rows = []
    for vid in range(40):
        center = [10.0 * (vid % 4 == k) for k in range(4)] * 2
        vec = [c + random.gauss(0, 0.1) for c in center]
        rows.append((vid, [float(x) for x in vec], vid % 4))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.IntegerType(), False),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    out = SIM.ann_ivf_topk(emb).collect()
    # every query's matches come from probed cells only (NPROBE labels)
    for q in {r.query_id for r in out}:
        labels = {r.match_label for r in out if r.query_id == q}
        assert len(labels) <= SIM.NPROBE
        # same-cluster vectors dominate the top ranks
        top = [r for r in out if r.query_id == q and r.rank == 1][0]
        assert top.match_label == q % 4


def test_multimodal_plumbing_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"payload number {i} with some text", "en", "s", 30) for i in range(9)],
        DOC_SCHEMA,
    )
    media = synthesize_media(docs.withColumn("n_chars", F.length("text")))
    assert {r.kind for r in media.select("kind").distinct().collect()} == {
        "image",
        "audio",
        "video",
    }
    feats = extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 9
    # videos sample at most target_frames frames
    for r in rows.values():
        if r.kind == "video":
            assert r.sampled_frames is not None and r.sampled_frames <= 8
        if r.kind == "audio":
            assert r.decoded_width is None
        assert r.n_bytes > 0 and len(r.content_digest) == 32
    # determinism: run twice, same digests
    again = {r.media_id: r.content_digest for r in feats.collect()}
    assert again == {k: v.content_digest for k, v in rows.items()}


@pytest.mark.parametrize("name", ["dedup_exact_hash", "ann_bruteforce_topk"])
def test_datapipe_registry_runs(spark, name):
    from spark_signals.datapipe.parity import DATAPIPE_QUERIES

    fn, _ = DATAPIPE_QUERIES[name]
    assert fn(spark, "/root/testdata/sf0.001").count() > 0


# ------------------------------------------------ cluster canonicalization
def test_connected_components_chain_triangle_singleton(spark):
    """Chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    triangle 10-11-12, singleton 99."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "id long")
    got = {r.id: r.comp for r in D.connected_components(edges, verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_star_matches_propagation(spark):
    """Star variant must produce the identical min-id labeling as plain
    propagation on a mixed graph (chain + triangle + singleton)."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "id long")
    want = {r.id: r.comp for r in D.connected_components(edges, verts).collect()}
    got = {r.id: r.comp for r in D.connected_components_star(edges, verts).collect()}
    assert got == want == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_star_long_chain_few_rounds(spark):
    """A 64-node path has diameter 63 — propagation's worst case. The star
    variant must label it in O(log n) alternating rounds (max_rounds=10
    suffices for 64 nodes; propagation would need >60 iterations)."""
    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r.id: r.comp for r in D.connected_components_star(edges, verts, max_rounds=10).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_falls_back_to_star_on_deep_graphs(spark):
    """With max_iter smaller than the diameter, propagation must not raise
    and must not silently split the cluster — it delegates to the star
    variant and still returns the exact labeling."""
    n = 20
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r.id: r.comp for r in D.connected_components(edges, verts, max_iter=3).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_star_random_equivalence(spark):
    """Deterministic pseudo-random graph: both algorithms must agree."""
    rnd_edges = [((i * 7919) % 50, (i * 104729) % 50) for i in range(60)]
    rnd_edges = [(a, b) for a, b in rnd_edges if a != b]
    edges = spark.createDataFrame(rnd_edges, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(50)], "id long")
    want = {r.id: r.comp for r in D.connected_components(edges, verts, max_iter=50).collect()}
    got = {r.id: r.comp for r in D.connected_components_star(edges, verts).collect()}
    assert got == want


def test_dedup_clusters_collapses_transitive_pairs(spark):
    """A~B and B~C but A!~C pairwise: the cluster must still be {A,B,C}
    with exactly one canonical survivor."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (1, base + "alpha beta gamma delta"),
        (2, base + "alpha beta gamma epsilon"),  # ~1
        (3, base + "alpha beta zeta epsilon"),   # ~2, farther from 1
        (4, "completely unrelated content about spark catalyst physical plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.dedup_clusters(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 4  # every doc labeled
    assert by_id[1].cluster_id == by_id[2].cluster_id == by_id[3].cluster_id == 1
    assert by_id[4].cluster_id == 4 and by_id[4].cluster_size == 1
    assert [r.doc_id for r in out if r.is_canonical and r.cluster_id == 1] == [1]
    assert by_id[1].cluster_size == 3


def test_dedup_releases_shared_caches(spark):
    """The shared shingle/signature relations are pinned only for the
    duration of the call: the leak class (r01 verdict) was persist() entries
    that stayed pinned as long as the caller held the result DataFrame,
    accumulating executor memory across calls in a long-lived session. With
    the eager-materialize-then-unpersist lifecycle, the CacheManager must be
    empty the moment the operator returns — even while results are alive and
    re-consumable. (The checkpoint backing the result is RDD-level storage,
    GC-managed by the ContextCleaner, and never registers here.)"""
    spark.catalog.clearCache()  # isolate from other tests' session caches
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()

    texts = [f"tok{i} " * 30 + ("shared suffix words " * 5) for i in range(40)]
    df = docs_df(spark, texts)
    results = []
    for fn in (D.dedup_minhash_lsh, D.dedup_ngram_jaccard):
        res = fn(df)
        results.append(res)
        assert cache_mgr.isEmpty(), fn.__name__
    # results stay correct and re-consumable after the caches are gone
    for res in results:
        assert res.count() == res.count()


def test_stratified_sample_is_deterministic_and_stratified(spark):
    from spark_signals.datapipe.sampling import sample_stratified

    rows = [(i, f"doc body {i}", "en" if i % 2 == 0 else "xx", "s", 10) for i in range(400)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    a = {r.doc_id for r in sample_stratified(df).collect()}
    b = {r.doc_id for r in sample_stratified(df).collect()}
    assert a == b  # content-hash gate: same sample every run
    en = sum(1 for i in a if i % 2 == 0)
    xx = len(a) - en
    # en keeps ~50%, unknown langs ~12.5% — allow generous binomial slack
    assert 60 <= en <= 140
    assert 5 <= xx <= 55
    assert en > xx


def test_tfidf_surfaces_distinctive_terms(spark):
    from spark_signals.datapipe.text import tfidf_top_terms

    common = "the quick brown fox "
    df = docs_df(
        spark,
        [common + "zebra zebra zebra", common + "yak yak", common * 2],
    )
    top = {
        r.doc_id: r.word
        for r in tfidf_top_terms(df, k=1).collect()
    }
    assert top[0] == "zebra" and top[1] == "yak"


def test_tfidf_single_explode_pass_is_pinned(spark):
    """The r17 single-explode-pass guarantee is STRUCTURAL: tf is persisted
    and the result eagerly pinned — if someone drops the pin lifecycle, the
    corpus tokenization pass silently runs twice again (the r16 COUNT(tf)
    stage-reuse trick does NOT survive Spark 4.1.2's count rewrite; see
    plans/r17/tfidf_top_terms_after_internal.txt). The returned relation
    must therefore be checkpoint-backed (the pin executed at build time,
    while the tf cache was warm)."""
    from spark_signals.datapipe.text import tfidf_top_terms

    df = tfidf_top_terms(docs_df(spark, ["alpha beta", "beta gamma"]), k=2)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in opt or "ExistingRDD" in opt, opt[:400]
    # and the tf cache is released after the build (per-call lifecycle)
    jsc = spark.sparkContext._jsc.sc()
    cached = jsc.getRDDStorageInfo()
    assert all("tfidf" not in (r.name() or "") for r in cached)


def test_length_band_trims_extremes_per_lang(spark):
    from spark_signals.datapipe.text import length_band

    rows = [(i, "x" * (i + 1), "en", "s", i + 1) for i in range(100)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    kept = {r.n_chars for r in length_band(df).collect()}
    assert min(kept) == 6 and max(kept) == 95  # (5%, 95%] of 1..100


def test_multimodal_real_wav_codec_and_stub_fallback(spark):
    """Codec auto-detection: a genuine WAV payload decodes through the real
    stdlib `wave` path (true frame count, not stub arithmetic); undecodable
    audio bytes fall back to the deterministic stub instead of failing."""
    import io
    import struct
    import wave as wavemod

    from spark_signals.datapipe.multimodal import (
        MEDIA_SCHEMA,
        REAL_CODECS,
        decode_media,
        extract_features,
    )

    assert "audio" in REAL_CODECS  # stdlib wave is always present

    buf = io.BytesIO()
    n_frames = 480
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{n_frames}h", *([0] * n_frames)))
    wav_bytes = buf.getvalue()

    real = decode_media(wav_bytes, "audio")
    assert real["frames"] == n_frames and real["status"] == "real"
    # not a WAV → total fallback to the stub (all-None for audio)
    assert decode_media(b"plain text", "audio") == {
        "width": None, "height": None, "frames": None, "status": "stub"
    }

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav_bytes), None),
            (2, "audio", bytearray(b"not a wav"), None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].sampled_frames == 8  # min(480, target_frames)
    assert rows[1].decode_status == "real"
    assert rows[2].sampled_frames is None  # stub path
    assert rows[2].decode_status == "stub"


# -------------------------------------------- repetition (Gopher-style)
def test_repetition_stats_counts_and_flags(spark):
    # doc 0: "a b" x4 -> bigram "a b" dominates; every word duplicated
    # doc 1: all-distinct words -> nothing repeats
    df = docs_df(spark, ["a b a b a b a b", "one two three four five six"])
    rows = {r.doc_id: r for r in TX.repetition_stats(df).collect()}
    rep, uniq = rows[0], rows[1]
    assert rep.n_words == 8 and rep.n_bigrams == 7
    assert rep.top_bigram_count == 4  # "a b" at positions 1,3,5,7
    assert rep.distinct_bigrams == 2  # "a b", "b a"
    assert abs(rep.dup_word_frac - (1 - 2 / 8)) < 1e-12
    assert rep.is_repetitive
    assert uniq.n_bigrams == 5 and uniq.top_bigram_count == 1
    assert uniq.dup_word_frac == 0.0
    assert not uniq.is_repetitive


def test_repetition_short_doc_single_shingle(spark):
    # < 2 words: whole text is the one "bigram"; no crash, no repetition
    rows = TX.repetition_stats(docs_df(spark, ["solo"])).collect()
    assert rows[0].n_bigrams == 1 and rows[0].top_bigram_count == 1


# ------------------------------------------------------- decontamination
def test_decontaminate_flags_shared_ngrams_only(spark):
    from spark_signals.datapipe.decontam import decontaminate

    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram
    rows = [
        (0, f"{shared} zeta eta", "en", "src0", 10),  # eval doc
        (1, f"intro words {shared}", "en", "src1", 10),  # contaminated
        (2, "totally unrelated content here now", "en", "src1", 10),  # clean
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r.doc_id: r for r in decontaminate(df).collect()}
    assert set(out) == {1, 2}  # eval docs never appear in the report
    assert out[1].is_contaminated and out[1].n_overlapping_ngrams >= 1
    assert not out[2].is_contaminated and out[2].n_overlapping_ngrams == 0


def test_decontaminate_against_external_eval_frame(spark):
    """Real eval suites are NOT resident in the training corpus — the API
    must take them as their own DataFrame (text-only schema, no doc_id)."""
    from spark_signals.datapipe.decontam import decontaminate_against

    shared = "alpha beta gamma delta epsilon"
    train = spark.createDataFrame(
        [
            (1, f"intro words {shared}", "en", "src1", 10),
            (2, "totally unrelated content here now", "en", "src1", 10),
        ],
        DOC_SCHEMA,
    )
    # external benchmark: different schema, no doc_id, never in `train`
    eval_docs = spark.createDataFrame(
        [(f"question about {shared} answer",), ("some other benchmark item",)],
        "text string",
    )
    out = {r.doc_id: r for r in decontaminate_against(train, eval_docs).collect()}
    assert set(out) == {1, 2}
    assert out[1].is_contaminated and out[1].n_overlapping_ngrams >= 1
    assert not out[2].is_contaminated and out[2].n_overlapping_ngrams == 0


def test_decontaminate_short_doc_fallback_catches_exact_dup(spark):
    from spark_signals.datapipe.decontam import decontaminate

    rows = [
        (0, "tiny eval doc", "en", "src0", 10),
        (1, "tiny eval doc", "en", "src1", 10),  # exact dup, < 5 words
        (2, "tiny other doc", "en", "src1", 10),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r.doc_id: r for r in decontaminate(df).collect()}
    assert out[1].is_contaminated
    assert not out[2].is_contaminated


# ------------------------------------------------------- quota sampling
def test_sample_quota_exact_sizes_and_determinism(spark):
    from spark_signals.datapipe.sampling import sample_quota

    rows = [
        (i, f"body {i}", "en", f"src{i % 3}", 10) for i in range(90)
    ] + [(1000, "lone doc", "en", "srclone", 8)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = sample_quota(df, k=10).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert {s: len(v) for s, v in by_src.items()} == {
        "src0": 10, "src1": 10, "src2": 10, "srclone": 1,
    }
    for v in by_src.values():  # ranks are 1..n and follow the hash order
        ranks = sorted(r.sample_rank for r in v)
        assert ranks == list(range(1, len(v) + 1))
        keys = [r.sample_key for r in sorted(v, key=lambda r: r.sample_rank)]
        assert keys == sorted(keys)
    # partitioning-invariant: same sample from a different layout
    again = sample_quota(df.repartition(13), k=10).collect()
    assert {(r.doc_id, r.sample_rank) for r in again} == {
        (r.doc_id, r.sample_rank) for r in out
    }


def test_sample_quota_prefilter_preserves_result(spark):
    from spark_signals.datapipe.sampling import sample_quota

    rows = [(i, f"body {i}", "en", f"src{i % 2}", 10) for i in range(200)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    full = {(r.doc_id, r.sample_rank) for r in sample_quota(df, k=5).collect()}
    pre = {
        (r.doc_id, r.sample_rank)
        for r in sample_quota(df, k=5, prefilter_rate=0.5).collect()
    }
    # rate 0.5 keeps ~100 rows/stratum >> k=5, so the k smallest hashes all
    # survive the gate and the two plans agree exactly
    assert pre == full
