"""Semantics of the r06 training-data operators: temperature resampling,
sequence packing, SemDeDup, and the logistic-regression quality classifier. Cross-engine value parity is covered by the
--extended oracle sweep (INCOMING registry); these tests pin the operator
CONTRACTS on hand-built corpora where the right answer is checkable by eye.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ------------------------------------------------------ temperature sampling
def test_temperature_flattens_the_head(spark):
    """tau < 1 must keep a LARGER fraction of small sources than of big
    ones, and expected totals must track the budget."""
    from spark_signals.datapipe.sampling import sample_temperature

    rows = [(i, f"doc {i} text", "en", "big" if i < 900 else "small", 10)
            for i in range(1000)]
    out = sample_temperature(_docs(spark, rows), tau=0.5, budget_frac=0.5)
    rates = {
        r["source"]: r["keep_rate_u"] / 1e6
        for r in out.select("source", "keep_rate_u").distinct().collect()
    }
    assert rates["small"] > rates["big"]
    # closed form: r_i = budget * N * n_i^(tau-1) / sum n_j^tau
    z = 900**0.5 + 100**0.5
    want_big = 0.5 * 1000 * 900**-0.5 / z
    assert math.isclose(rates["big"], want_big, abs_tol=1e-6)
    # the hash gate keeps ~rate of each stratum (tolerance: 1000-doc corpus)
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert abs(kept["big"] / 900 - rates["big"]) < 0.07


def test_temperature_rate_caps_at_one(spark):
    """A tiny source whose closed-form rate exceeds 1 keeps EVERYTHING —
    capped, not renormalized."""
    from spark_signals.datapipe.sampling import sample_temperature

    rows = [(i, f"doc {i}", "en", "big" if i < 995 else "tiny", 5)
            for i in range(1000)]
    out = sample_temperature(_docs(spark, rows), tau=0.1, budget_frac=0.9)
    tiny = out.filter(F.col("source") == "tiny")
    assert tiny.count() == 5
    assert tiny.select("keep_rate_u").first()["keep_rate_u"] == 1_000_000


def test_temperature_is_partition_invariant(spark):
    from spark_signals.datapipe.sampling import sample_temperature

    rows = [(i, f"document number {i}", "en", f"src{i % 3}", 10) for i in range(300)]
    base = _docs(spark, rows)
    a = {r["doc_id"] for r in sample_temperature(base).collect()}
    b = {r["doc_id"] for r in sample_temperature(base.repartition(13)).collect()}
    assert a == b and a


# --------------------------------------------------------- sequence packing
def test_pack_offsets_are_contiguous_per_shard(spark):
    from spark_signals.datapipe.pack import EOS_TOKENS, pack_sequences

    rows = [(i, " ".join(["tok"] * (5 + i % 7)), "en", "s", 10) for i in range(40)]
    out = pack_sequences(_docs(spark, rows), ctx_len=16, num_shards=4)
    by_shard: dict[int, list] = {}
    for r in out.collect():
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in docs:
            assert r["tok_offset"] == expect, f"gap in shard {shard}"
            assert r["first_window"] == r["tok_offset"] // 16
            last_tok = r["tok_offset"] + max(r["n_tokens"] - 1, 0)
            assert r["last_window"] == last_tok // 16
            assert r["spans_boundary"] == (r["first_window"] != r["last_window"])
            expect += r["n_tokens"] + EOS_TOKENS


def test_pack_empty_doc_occupies_only_eos(spark):
    from spark_signals.datapipe.pack import EOS_TOKENS, pack_sequences

    rows = [(0, "one two three", "en", "s", 3), (8, "", "en", "s", 0),
            (16, "four five", "en", "s", 2)]
    out = {r["doc_id"]: r for r in
           pack_sequences(_docs(spark, rows), ctx_len=4, num_shards=8).collect()}
    # all three land in shard 0 (doc_id % 8 == 0) in doc_id order
    assert out[8]["tok_offset"] == 3 + EOS_TOKENS
    assert out[8]["n_tokens"] == 0 and not out[8]["spans_boundary"]
    assert out[16]["tok_offset"] == 3 + EOS_TOKENS + 0 + EOS_TOKENS


# ----------------------------------------------------------------- semdedup
def test_semdedup_keep_first_within_cell(spark):
    """Two identical vectors must land in the same trained cell; the
    lower-id one survives, the higher-id one is flagged."""
    from spark_signals.datapipe.dedup import semdedup

    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(8)]
    far = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    rows = (
        [(0, [float(x) for x in base], 0), (1, [float(x) for x in base], 0)]
        + [(i + 2, [float(x) for x in v], 0) for i, v in enumerate(far)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in semdedup(emb, threshold=0.95).collect()}
    assert len(out) == 32  # every vector reported
    assert not out[0]["is_semdup"]
    assert out[1]["is_semdup"] and out[1]["n_close_lower"] >= 1
    assert out[0]["cell"] == out[1]["cell"]


def test_semdedup_orthogonal_vectors_all_kept(spark):
    from spark_signals.datapipe.dedup import semdedup

    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(8)], 0) for i in range(8)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semdedup(emb, threshold=0.5).collect()
    assert len(out) == 8
    assert not any(r["is_semdup"] for r in out)


def test_semdedup_k_derivation_bounds_cell_size(spark):
    """The default k is DERIVED from a corpus count so neither side of the
    cost goes quadratic: small corpora size by target mean cell (bounding
    the within-cell pairwise stage, verdict r06); large corpora switch to
    the balanced sqrt(n) sizing (bounding the n·k centroid assignment,
    the flaw the r10 100x decade measured in the sibling knn_join_k)."""
    import math

    from spark_signals.datapipe.dedup import semdedup, semdedup_k
    from spark_signals.datapipe.similarity import KMEANS_K

    # floor at KMEANS_K for small corpora, then ∝ n / target
    assert semdedup_k(100) == KMEANS_K
    assert semdedup_k(64 * KMEANS_K) == KMEANS_K
    assert semdedup_k(64 * KMEANS_K + 1) == KMEANS_K + 1
    # past the n ≈ target² crossover the balanced √n sizing takes over
    assert semdedup_k(1_000_000) == 1_000
    assert semdedup_k(1_000_000, target_cell_size=100) == 1_000
    # both cost sides stay Θ(n^1.5): assignment n·k and pairs n·(n/k)
    for n in (10_000, 1_000_000, 10**8):
        k = semdedup_k(n)
        assert n * k <= 2 * n * math.isqrt(n)
        assert n * (n / k) <= 2 * n * math.isqrt(n)

    # derived default in action: 256 vectors with target cell 16 must train
    # k=16 cells, and the MEAN realized cell size stays <= the target
    import random

    rng = random.Random(11)
    rows = [
        (i, [float(rng.uniform(-1, 1)) for _ in range(8)], 0) for i in range(256)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semdedup(emb, threshold=0.99, target_cell_size=16)
    cells = out.groupBy("cell").agg(F.count("*").alias("n")).collect()
    assert sum(r["n"] for r in cells) == 256
    # k = ceil(256/16) = 16 trained cells (a Lloyd cell may end up empty,
    # but more than KMEANS_K populated cells proves the derived k was used)
    assert KMEANS_K < len(cells) <= 16


# ------------------------------------------------------ quality classifier
def _separable_corpus(spark, n=120):
    """Curated (src0) docs: long, stopword-rich prose. Raw (src1): short,
    stopword-free token soup — linearly separable in the feature space."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = " ".join("the and of to a in is for on with word" for _ in range(8))
            src = "src0"
        else:
            text = f"zxq{i} qwv blort k{i}"
            src = "src1"
        rows.append((i, text, "en", src, len(text)))
    return _docs(spark, rows)


def test_logreg_learns_a_separable_corpus(spark):
    from spark_signals.datapipe.classifier import quality_logreg

    out = {r["doc_id"]: r for r in quality_logreg(_separable_corpus(spark)).collect()}
    curated = [r["quality_prob"] for r in out.values() if r["source"] == "src0"]
    raw = [r["quality_prob"] for r in out.values() if r["source"] == "src1"]
    # every curated doc must outscore every raw doc (margin, not just mean)
    assert min(curated) > max(raw)
    acc = sum(
        (r["quality_prob"] > 0.5) == (r["source"] == "src0") for r in out.values()
    ) / len(out)
    assert acc >= 0.9


def test_logreg_training_is_partition_invariant(spark):
    """The int64-gridded gradient units make the gradient an EXACT sum, so
    training must be bit-identical under any repartitioning — the property
    that makes a distributed float trainer oracle-checkable at all."""
    from spark_signals.datapipe.classifier import logreg_train

    docs = _separable_corpus(spark)
    w1 = logreg_train(docs).collect()[0]
    w2 = logreg_train(docs.repartition(17)).collect()[0]
    assert tuple(w1) == tuple(w2)


def test_logreg_against_external_curated_set(spark):
    """The real GPT-3 recipe: train curated-vs-crawl with an EXTERNAL
    curated exemplar set, score the crawl. The crawl's prose-like docs must
    outscore its token-soup docs under the externally-trained weights."""
    from spark_signals.datapipe.classifier import quality_logreg_against

    # curated exemplars: pure prose (ids overlap the crawl's on purpose —
    # the operator re-keys them)
    curated = _docs(
        spark,
        [
            (i, " ".join("the and of to a in is for on with word" for _ in range(8)),
             "en", "books", 100)
            for i in range(40)
        ],
    )
    # crawl: half prose-like, half soup — NO label column of its own
    crawl_rows = []
    for i in range(80):
        if i % 2 == 0:
            text = " ".join("the and of to a in is for on with word" for _ in range(8))
        else:
            text = f"zxq{i} qwv blort k{i}"
        crawl_rows.append((i, text, "en", "crawl", len(text)))
    out = {
        r["doc_id"]: r
        for r in quality_logreg_against(_docs(spark, crawl_rows), curated).collect()
    }
    assert len(out) == 80 and all(r["source"] == "crawl" for r in out.values())
    prose = [r["quality_prob"] for i, r in out.items() if i % 2 == 0]
    soup = [r["quality_prob"] for i, r in out.items() if i % 2 == 1]
    assert min(prose) > max(soup)


def test_logreg_holdout_accuracy(spark):
    """Generalization, not memorization: accuracy on a deterministic
    held-out hash split of the separable corpus must stay high."""
    from spark_signals.datapipe.classifier import logreg_holdout_metrics

    m = logreg_holdout_metrics(_separable_corpus(spark, n=300)).collect()[0]
    assert m["n_train"] + m["n_test"] == 300
    assert 0 < m["n_test"] < 300
    assert m["n_correct"] <= m["n_test"]
    assert m["accuracy"] >= 0.9


def test_pack_windows_reconstruction_invariants(spark):
    """The writer's work order must exactly tile the stream: per (shard,
    window) slices are disjoint and within bounds, each document's slices
    sum to its token count, and every window's doc-token load fits
    ctx_len."""
    from spark_signals.datapipe.pack import pack_sequences, pack_windows

    rows = [(i, " ".join(["tok"] * (3 + (i * 7) % 23)), "en", "s", 10)
            for i in range(60)]
    docs = _docs(spark, rows)
    manifest = {r["doc_id"]: r for r in pack_sequences(docs, 16, 4).collect()}
    slices = pack_windows(docs, 16, 4).collect()

    per_doc: dict[int, int] = {}
    per_window: dict[tuple, list] = {}
    for s in slices:
        assert s["tok_end"] >= s["tok_start"]
        assert s["n_window_tokens"] == s["tok_end"] - s["tok_start"] + 1
        # slice lies inside its window
        assert s["tok_start"] // 16 == s["window"] and s["tok_end"] // 16 == s["window"]
        # and inside its document's stream span
        m = manifest[s["doc_id"]]
        assert m["tok_offset"] <= s["tok_start"]
        assert s["tok_end"] <= m["tok_offset"] + m["n_tokens"] - 1
        per_doc[s["doc_id"]] = per_doc.get(s["doc_id"], 0) + s["n_window_tokens"]
        per_window.setdefault((s["shard"], s["window"]), []).append(s)
    for doc_id, total in per_doc.items():
        assert total == manifest[doc_id]["n_tokens"]
    for (shard, window), ss in per_window.items():
        assert sum(s["n_window_tokens"] for s in ss) <= 16
        spans = sorted((s["tok_start"], s["tok_end"]) for s in ss)
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b < c  # disjoint


# ------------------------------------------------------- mixture + audit
def test_mixture_manifest_explicit_weights(spark):
    from spark_signals.datapipe.sampling import mixture_manifest

    # "doc {i}" = 2 whitespace tokens per document (the shared currency)
    rows = [(i, f"doc {i}", "en", "web" if i < 80 else "books", 100) for i in range(100)]
    out = {r["source"]: r for r in mixture_manifest(
        _docs(spark, rows), weights={"web": 1.0, "books": 3.0}, budget_tokens=8000
    ).collect()}
    assert out["books"]["target_tokens"] == 6000 and out["web"]["target_tokens"] == 2000
    # books has 20 docs x 2 tokens = 40 available -> 150 epochs
    assert out["books"]["n_tokens_available"] == 40
    assert out["books"]["repeat_factor"] == 150.0 and out["books"]["epochs"] == 150
    # web has 160 available for a 2000 target -> 12.5 repeats
    assert out["web"]["n_tokens_available"] == 160
    assert out["web"]["repeat_factor"] == 12.5 and out["web"]["epochs"] == 13


def test_mixture_manifest_rejects_mismatched_weights(spark):
    """A typo'd weight key or an unlisted corpus source must RAISE, not
    silently zero a source's mixing share (advisor r06)."""
    import pytest

    from spark_signals.datapipe.sampling import mixture_manifest

    rows = [(i, f"doc {i}", "en", "web" if i % 2 else "books", 10) for i in range(20)]
    docs = _docs(spark, rows)
    # weight key matching no observed source
    with pytest.raises(Exception, match="matches no observed source: wub"):
        mixture_manifest(docs, weights={"wub": 1.0, "books": 1.0, "web": 1.0}).collect()
    # observed source missing from the weights dict
    with pytest.raises(Exception, match="missing from weights: web"):
        mixture_manifest(docs, weights={"books": 1.0}).collect()


def test_mixture_manifest_explicit_weights_matches_oracle(spark):
    """Non-uniform weights path held to the DuckDB oracle on the real
    corpus (the driver checks only the uniform twin)."""
    import duckdb

    from spark_signals.datapipe.sampling import mixture_manifest, sql_mixture_manifest

    weights = {"web": 4.0, "books": 2.0, "wiki": 1.0, "code": 1.0}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    observed = {r["source"] for r in docs.select("source").distinct().collect()}
    weights = {s: w for s, w in weights.items() if s in observed}
    for s in observed:
        weights.setdefault(s, 1.0)
    got = sorted(
        tuple(r)
        for r in mixture_manifest(docs, weights=weights, budget_tokens=50_000).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_mixture_manifest(budget_tokens=50_000, weights=weights)
        ).fetchall()
    )
    assert got == want


def test_mixture_manifest_nondefault_counter_matches_oracle(spark):
    """r7 advisory: sql_mixture_manifest used to ignore the counter and
    always price in whitespace tokens — a 'bpe'-priced Spark manifest
    silently lost oracle parity. Both sides now thread token_counter."""
    import duckdb

    from spark_signals.datapipe.sampling import mixture_manifest, sql_mixture_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        tuple(r) for r in mixture_manifest(docs, token_counter="bpe").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(sql_mixture_manifest(token_counter="bpe")).fetchall()
    )
    assert got == want
    # the synthetic corpus is unpunctuated (bpe == whitespace there), so
    # prove the counter branch is live on a punctuated doc: both engines
    # must price it identically AND differently from whitespace
    pdocs = spark.createDataFrame(
        [(1, "Hello, world! v2.0 rocks.", "en", "web", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = mixture_manifest(pdocs, token_counter="bpe").collect()[0]
    con.execute("CREATE VIEW pdocs AS SELECT 1 AS doc_id, 'Hello, world! v2.0 rocks.' AS text, 'en' AS lang, 'web' AS source, 25 AS n_chars")
    want_p = con.execute(
        sql_mixture_manifest(token_counter="bpe").replace("FROM documents", "FROM pdocs")
    ).fetchall()[0]
    assert tuple(row) == want_p
    ws_row = mixture_manifest(pdocs).collect()[0]
    assert row["n_tokens_available"] != ws_row["n_tokens_available"]


def test_token_currency_reconciles_mixing_with_packing(spark):
    """The r06 debt: packing counted words while mixing counted chars, so
    the two manifests disagreed about corpus size. Both now price in
    n_tokens_col — Σ mixture n_tokens_available == Σ packing n_tokens."""
    from spark_signals.datapipe.pack import pack_sequences
    from spark_signals.datapipe.sampling import mixture_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mix_total = (
        mixture_manifest(docs)
        .agg(F.sum("n_tokens_available").alias("t"))
        .first()["t"]
    )
    pack_total = pack_sequences(docs).agg(F.sum("n_tokens").alias("t")).first()["t"]
    assert mix_total == pack_total


def test_length_band_token_currency(spark):
    """length_band over a materialized n_tokens column gates in the same
    currency as packing/mixing; per-lang percentile semantics unchanged."""
    from spark_signals.datapipe.text import length_band, n_tokens_col

    rows = [
        (i, " ".join(["w"] * (i + 1)), "en", "src", 2 * (i + 1) - 1)
        for i in range(100)
    ]
    docs = _docs(spark, rows).withColumn("n_tokens", n_tokens_col(F.col("text")))
    out = length_band(docs, lo=0.10, hi=0.90, length_col="n_tokens")
    kept = sorted(r["n_tokens"] for r in out.collect())
    # doc i has i+1 tokens; cume_dist = (i+1)/100 -> keep (0.10, 0.90]
    assert kept == list(range(11, 91))
    assert out.columns == ["doc_id", "lang", "n_tokens", "length_pct"]


def test_curate_stats_reconciles_with_curate(spark):
    from spark_signals.datapipe.curate import DROP_REASONS, curate, curate_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c = curate(docs).collect()
    stats = {r["source"]: r for r in curate_stats(docs).collect()}
    assert sum(r["n_docs"] for r in stats.values()) == len(c)
    assert sum(r["n_kept"] for r in stats.values()) == sum(r["keep"] for r in c)
    for reason in DROP_REASONS:
        want = sum(reason in r["drop_reasons"].split(",") for r in c)
        assert sum(s[f"n_{reason}"] for s in stats.values()) == want


# --------------------------------------------------------------- chunking
def test_chunking_covers_every_word_with_exact_overlap(spark):
    from spark_signals.datapipe.chunk import chunk_documents

    rows = [
        (0, " ".join(f"w{i}" for i in range(25)), "en", "s", 10),  # 3 chunks
        (1, "short doc", "en", "s", 9),                            # 1 chunk
        (2, " ".join(f"v{i}" for i in range(10)), "en", "s", 10),  # exact fit
        (3, "   ", "en", "s", 3),                                  # no chunks
    ]
    out = chunk_documents(_docs(spark, rows), chunk_words=10, overlap=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc  # token-free doc yields nothing
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "short doc"
    assert len(by_doc[2]) == 1  # n == chunk_words -> a single chunk
    chunks = sorted(by_doc[0], key=lambda r: r["chunk_index"])
    # starts 0,7,14,21 (stride 7): word 24 is only reachable by a 4th chunk
    assert len(chunks) == 4
    covered = set()
    for c in chunks:
        assert c["start_word"] == c["chunk_index"] * 7  # stride = 10 - 3
        words = c["chunk_text"].split(" ")
        assert words == [f"w{i}" for i in range(c["start_word"], c["start_word"] + c["n_chunk_words"])]
        covered.update(range(c["start_word"], c["start_word"] + c["n_chunk_words"]))
    assert covered == set(range(25))  # every word in >= 1 chunk
    # consecutive chunks share exactly `overlap` words (full chunks)
    assert chunks[0]["chunk_text"].split(" ")[-3:] == chunks[1]["chunk_text"].split(" ")[:3]


# -------------------------------------------------------- chunk embeddings
def test_embed_chunks_retrieval_end_to_end(spark):
    """chunk → hash-embed → cosine retrieval: a perturbed version of a
    chunk's text must retrieve the original chunk as top-1 — the full
    text-to-searchable-index path, UDF-free."""
    from spark_signals.datapipe.embed import hash_embed, embed_chunks

    rows = [
        (i, " ".join(f"w{i}x{j} common filler token" for j in range(30)), "en", "s", 10)
        for i in range(12)
    ]
    docs = _docs(spark, rows)
    index = embed_chunks(docs).collect()
    assert all(len(r["embedding"]) == 64 for r in index)
    # unit vectors (within the 1e-6 grid)
    for r in index[:5]:
        assert abs(sum(v * v for v in r["embedding"]) - 1.0) < 1e-3

    target = index[3]
    chunk_words = None
    from spark_signals.datapipe.chunk import chunk_documents

    for c in chunk_documents(docs).collect():
        if (c["doc_id"], c["chunk_index"]) == (target["doc_id"], target["chunk_index"]):
            chunk_words = c["chunk_text"].split(" ")
    assert chunk_words
    # perturb: drop the last 20% of words
    query_text = " ".join(chunk_words[: int(len(chunk_words) * 0.8)])
    q = hash_embed(
        spark.createDataFrame([(0, query_text)], "qid long, text string"),
        key_cols=("qid",),
    ).collect()[0]["embedding"]

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))  # both unit vectors

    best = max(index, key=lambda r: cos(q, r["embedding"]))
    assert (best["doc_id"], best["chunk_index"]) == (
        target["doc_id"],
        target["chunk_index"],
    )


def test_embed_chunks_token_free_doc_yields_nothing(spark):
    from spark_signals.datapipe.embed import embed_chunks

    out = embed_chunks(_docs(spark, [(0, "   ", "en", "s", 3), (1, "real text", "en", "s", 9)])).collect()
    assert {r["doc_id"] for r in out} == {1}


# ------------------------------------------------------------- bigram LM
def test_bigram_lm_is_order_sensitive(spark):
    """The whole point over the unigram LM: a word-salad permutation of a
    fluent document must score LOWER, even though its bag of words (and so
    its unigram score) is identical."""
    import random

    from spark_signals.datapipe.text import bigram_lm_quality, unigram_lm_quality

    sent = "the quick brown fox jumps over the lazy dog".split()
    fluent = " ".join(" ".join(sent) for _ in range(20))
    words = fluent.split()
    rng = random.Random(11)
    shuffled = words[:]
    rng.shuffle(shuffled)
    rows = (
        # a fleet of fluent docs so the model learns the real transitions
        [(i, fluent, "en", "s", 10) for i in range(10)]
        + [(99, " ".join(shuffled), "en", "s", 10)]
    )
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r for r in bigram_lm_quality(docs).collect()}
    assert out[99]["avg_logprob"] < out[0]["avg_logprob"]
    # while the unigram LM cannot tell them apart (identical bags)
    uni = {r["doc_id"]: r for r in unigram_lm_quality(docs).collect()}
    assert uni[99]["sum_logprob_u"] == uni[0]["sum_logprob_u"]


def test_bigram_lm_scores_only_docs_with_transitions(spark):
    from spark_signals.datapipe.text import bigram_lm_quality

    rows = [(0, "single", "en", "s", 6), (1, "", "en", "s", 0),
            (2, "two words", "en", "s", 9), (3, "two words", "en", "s", 9)]
    out = {r["doc_id"]: r for r in bigram_lm_quality(_docs(spark, rows)).collect()}
    assert set(out) == {2, 3}
    assert out[2]["n_bigrams"] == 1


def test_cluster_composition_shares_are_proper_marginals(spark):
    """Per cluster, cluster_share sums to ~1 (grid rounding); per source,
    source_share sums to ~1; n_docs totals the corpus (every doc lands in
    exactly one cluster)."""
    from collections import defaultdict

    from spark_signals.datapipe.balance import cluster_composition

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = cluster_composition(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    by_c, by_s = defaultdict(float), defaultdict(float)
    for r in rows:
        by_c[r["cluster_id"]] += r["cluster_share"]
        by_s[r["source"]] += r["source_share"]
    for total in list(by_c.values()) + list(by_s.values()):
        assert abs(total - 1.0) < 1e-4, total
    # more than one cluster and more than one source actually present
    assert len(by_c) > 1 and len(by_s) > 1


def test_dsir_scores_target_like_docs_higher(spark):
    """DSIR contract: a raw doc written in the target's vocabulary must
    out-score a raw doc written in the raw pool's own vocabulary, and the
    int64 grid keeps the scores partitioning-invariant."""
    from spark_signals.datapipe.sampling import dsir_logratio

    target = _docs(
        spark,
        [(100 + i, "physics theorem proof lemma axiom algebra", "en", "tgt", 40)
         for i in range(10)],
    )
    raw_rows = [
        (1, "physics theorem proof algebra", "en", "raw", 30),   # target-like
        (2, "celebrity gossip scandal rumor", "en", "raw", 30),  # raw-like
    ] + [
        (10 + i, "celebrity gossip scandal rumor drama tabloid", "en", "raw", 40)
        for i in range(10)
    ]
    raw = _docs(spark, raw_rows)
    out = {r["doc_id"]: r for r in dsir_logratio(raw, target).collect()}
    assert out[1]["avg_logratio"] > out[2]["avg_logratio"]
    assert out[1]["logratio_u"] > 0 > out[2]["logratio_u"]
    again = {r["doc_id"]: r["logratio_u"]
             for r in dsir_logratio(raw.repartition(7), target).collect()}
    assert again == {d: r["logratio_u"] for d, r in out.items()}


# ----------------------------------------------- token-budget keep-list
def test_budget_manifest_fills_each_source_to_its_target(spark):
    """Greedy-fill contract per source: kept tokens reach the target with
    overshoot < one document, or the source is supply-bounded and keeps
    everything; and uniform targets sum EXACTLY to the budget."""
    from spark_signals.datapipe.sampling import mixture_budget_manifest
    from spark_signals.datapipe.text import n_tokens_col

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 7_001  # deliberately not divisible by n_sources
    out = mixture_budget_manifest(docs, budget_tokens=budget).collect()
    assert out
    targets = {}
    by_src = {}
    for r in out:
        targets[r["source"]] = r["target_tokens"]
        by_src.setdefault(r["source"], []).append(r)
    assert sum(targets.values()) == budget  # exact apportionment
    assert max(targets.values()) - min(targets.values()) <= 1  # uniform
    supply = {
        r["source"]: (r["tok"], r["n"])
        for r in docs.groupBy("source")
        .agg(
            F.sum(n_tokens_col(F.col("text"))).alias("tok"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for src, rows in by_src.items():
        kept = sum(r["n_tokens"] for r in rows)
        tgt = targets[src]
        if kept < tgt:
            # supply-bounded: every document of the source was kept
            assert len(rows) == supply[src][1] and kept == supply[src][0]
        else:
            # budget reached; dropping the last kept doc goes under target
            assert kept - max(r["n_tokens"] for r in rows if r["cum_tokens"] == max(
                x["cum_tokens"] for x in rows
            )) < tgt
        # every kept doc individually satisfies the keep rule
        assert all(r["cum_tokens"] - r["n_tokens"] < tgt for r in rows)


def test_budget_manifest_explicit_weights_match_oracle_and_apportion(spark):
    """Largest-remainder targets sum exactly to the budget, follow the
    weights, and the full keep-list value-matches DuckDB."""
    import duckdb

    from spark_signals.datapipe.sampling import (
        _budget_targets,
        mixture_budget_manifest,
        sql_mixture_budget_manifest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    observed = sorted(r["source"] for r in docs.select("source").distinct().collect())
    weights = {s: float(i + 1) for i, s in enumerate(observed)}
    budget = 9_999
    tmap = _budget_targets(budget, weights)
    assert sum(tmap.values()) == budget
    # monotone in the weight (ties aside, a bigger weight never gets less)
    ordered = sorted(observed, key=lambda s: weights[s])
    assert all(
        tmap[a] <= tmap[b] + 1 for a, b in zip(ordered, ordered[1:])
    )
    got = sorted(
        tuple(r)
        for r in mixture_budget_manifest(
            docs, budget_tokens=budget, weights=weights
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_mixture_budget_manifest(budget_tokens=budget, weights=weights)
        ).fetchall()
    )
    assert got == want


def test_budget_manifest_rejects_mismatched_weights(spark):
    """The r06 strictness precedent: a typo'd weight key or an uncovered
    observed source fails loudly instead of zeroing a slice."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    from spark_signals.datapipe.sampling import mixture_budget_manifest

    docs = spark.createDataFrame(
        [(1, "a b c", "en", "web", 5), (2, "d e f", "en", "books", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, PythonException, Exception)):
        mixture_budget_manifest(
            docs, budget_tokens=10, weights={"wub": 1.0, "books": 1.0, "web": 1.0}
        ).collect()
    with pytest.raises((Py4JJavaError, SparkRuntimeException, PythonException, Exception)):
        mixture_budget_manifest(docs, budget_tokens=10, weights={"books": 1.0}).collect()


def test_budget_manifest_is_partition_invariant(spark):
    """Integer window sums + hash ordering: the keep-list is identical at
    any partitioning (the 1000-executor property)."""
    from spark_signals.datapipe.sampling import mixture_budget_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        tuple(r) for r in mixture_budget_manifest(docs, budget_tokens=5_000).collect()
    )
    b = sorted(
        tuple(r)
        for r in mixture_budget_manifest(
            docs.repartition(17), budget_tokens=5_000
        ).collect()
    )
    assert a == b and a


def test_pack_efficiency_reconciles_with_manifest_and_windows(spark):
    """The efficiency report is an exact marginal of the packing manifest:
    stream lengths, window counts, boundary censuses, and tail waste all
    re-derive from pack_sequences/pack_windows on the same corpus."""
    from spark_signals.datapipe.pack import (
        CTX_LEN,
        EOS_TOKENS,
        pack_efficiency_report,
        pack_sequences,
        pack_windows,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = {r["shard"]: r for r in pack_efficiency_report(docs).collect()}
    man = pack_sequences(docs).collect()
    by_shard = {}
    for r in man:
        by_shard.setdefault(r["shard"], []).append(r)
    win_counts = {
        r["shard"]: r["mw"]
        for r in pack_windows(docs)
        .groupBy("shard")
        .agg(F.max("window").alias("mw"))
        .collect()
    }
    for shard, rows in by_shard.items():
        e = rep[shard]
        assert e["n_docs"] == len(rows)
        assert e["doc_tokens"] == sum(r["n_tokens"] for r in rows)
        assert e["eos_tokens"] == len(rows) * EOS_TOKENS
        assert e["stream_tokens"] == e["doc_tokens"] + e["eos_tokens"]
        assert e["n_boundary_docs"] == sum(1 for r in rows if r["spans_boundary"])
        # the stream's windows: every window the writer emits fits, and the
        # report's count covers at least the last DOCUMENT-touched window
        # (trailing EOS may add one more)
        assert e["n_windows"] * CTX_LEN >= e["stream_tokens"]
        assert 0 <= e["tail_waste"] < CTX_LEN
        assert e["n_windows"] >= win_counts[shard] + 1
        assert 0 < e["fill_rate_u"] <= 1_000_000


def test_pack_incremental_chains_equal_global_pack(spark):
    """The lane's equivalence invariant, chained: packing three sequential
    append-only drops against the threaded tail reproduces the global
    manifest EXACTLY (offsets, windows, boundary flags), and the final
    tail equals the whole corpus's tail."""
    from spark_signals.datapipe.pack import (
        pack_incremental,
        pack_sequences,
        pack_tail,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cuts = [0, 200, 350, 10**9]
    tail = pack_tail(docs.filter(F.lit(False)))  # empty initial state
    got = []
    for lo, hi in zip(cuts, cuts[1:]):
        batch = docs.filter(F.col("doc_id").between(lo, hi - 1))
        manifest, tail = pack_incremental(batch, tail)
        got.extend(tuple(r) for r in manifest.collect())
    want = [tuple(r) for r in pack_sequences(docs).collect()]
    assert sorted(got) == sorted(want)
    final_tail = {r["shard"]: r["stream_tokens"] for r in tail.collect()}
    expect_tail = {
        r["shard"]: r["stream_tokens"] for r in pack_tail(docs).collect()
    }
    assert final_tail == expect_tail


def test_pack_incremental_empty_batch_and_fresh_tail(spark):
    """An empty drop changes nothing; a first drop against an empty tail
    IS the plain pack."""
    from spark_signals.datapipe.pack import (
        pack_incremental,
        pack_sequences,
        pack_tail,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    empty = docs.filter(F.lit(False))
    m, t = pack_incremental(empty, pack_tail(docs))
    assert m.count() == 0
    assert {r["shard"]: r["stream_tokens"] for r in t.collect()} == {
        r["shard"]: r["stream_tokens"] for r in pack_tail(docs).collect()
    }
    m2, _ = pack_incremental(docs, pack_tail(empty))
    assert sorted(tuple(r) for r in m2.collect()) == sorted(
        tuple(r) for r in pack_sequences(docs).collect()
    )


def test_budget_manifest_invariant_to_weight_dict_order(spark):
    """The keep-list must be identical under ANY insertion order of the
    same weights (r14 verdict: float sum() normalization was
    order-dependent and could flip a largest-remainder unit between
    near-tied sources; math.fsum closes it). Near-tied weights on real
    sources, three orders, one answer."""
    from spark_signals.datapipe.sampling import mixture_budget_manifest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    observed = sorted(r["source"] for r in docs.select("source").distinct().collect())
    # adversarial shape from the falsifying example: two near-tied huge
    # weights whose float-sum rounding used to depend on position
    vals = [1e-06, 0.5, 1000000.0, 999999.9999999999]
    weights = {s: vals[i % len(vals)] for i, s in enumerate(observed)}
    orders = [
        dict(sorted(weights.items())),
        dict(sorted(weights.items(), reverse=True)),
        dict(list(weights.items())[::2] + list(weights.items())[1::2]),
    ]
    results = [
        sorted(
            tuple(r)
            for r in mixture_budget_manifest(
                docs, budget_tokens=113, weights=w
            ).collect()
        )
        for w in orders
    ]
    assert results[0] == results[1] == results[2]
