"""Unit tests for the r05 curation operators: unigram-LM quality,
passage-level dedup, and PII scrub.

The driver's sf0.01 parity run exercises these on synthetic word-salad
(which contains no PII and no long repeated passages), so the behavioral
evidence — redaction actually redacts, shared passages actually flag — has
to come from the crafted fixtures here. The crafted PII fixture is also run
through the DuckDB oracle SQL to pin cross-engine regex agreement ON
MATCHING INPUT, which the synthetic corpus never provides.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import scrub as S
from spark_signals.datapipe import text as T

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


# ------------------------------------------------------------------ PII scrub
PII_TEXT = [
    "mail me at Bob.Smith+x@Example.co.uk thanks",
    "ssn 123-45-6789 phone 415-555-1234 alt 415.555.1234",
    "server at 10.0.0.1 and 192.168.100.200 ok",
    "no pii here at all",
    "a@b.io twice a@b.io and ip 1.2.3.4",
]


def test_pii_scrub_redacts_and_counts(spark):
    out = {
        r["doc_id"]: r
        for r in S.pii_scrub(_docs(spark, PII_TEXT)).collect()
    }
    assert out[0]["n_email"] == 1 and out[0]["text_clean"] == "mail me at <EMAIL> thanks"
    assert out[1]["n_ssn"] == 1 and out[1]["n_phone"] == 2
    assert out[1]["text_clean"] == "ssn <SSN> phone <PHONE> alt <PHONE>"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_clean"] == "server at <IPV4> and <IPV4> ok"
    assert out[3]["n_pii_total"] == 0 and not out[3]["has_pii"]
    assert out[3]["text_clean"] == "no pii here at all"
    assert out[4]["n_email"] == 2 and out[4]["n_ipv4"] == 1 and out[4]["has_pii"]


def test_pii_scrub_cross_engine_on_matching_input(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree where patterns MATCH,
    not just on pass-through text — crafted rows force every category."""
    sdf = S.pii_scrub(_docs(spark, PII_TEXT)).toPandas()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(PII_TEXT)),
                "text": PII_TEXT,
                "lang": "en",
                "source": "src",
                "n_chars": [len(t) for t in PII_TEXT],
            }
        ),
    )
    ddf = con.execute(S.sql_pii_scrub()).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    b = ddf[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ----------------------------------------------------------- passage dedup
def test_dedup_passages_flags_shared_passage(spark):
    shared = " ".join(f"w{i}" for i in range(D.PASSAGE_WORDS))  # one full chunk
    uniq_a = " ".join(f"a{i}" for i in range(D.PASSAGE_WORDS))
    uniq_b = " ".join(f"b{i}" for i in range(D.PASSAGE_WORDS))
    docs = _docs(
        spark,
        [
            f"{shared} {uniq_a}",  # doc0: chunk1 shared, chunk2 unique
            f"{shared} {uniq_b}",  # doc1: chunk1 shared, chunk2 unique
            uniq_a.replace("a", "c"),  # doc2: fully unique single chunk
        ],
    )
    out = {r["doc_id"]: r for r in D.dedup_passages(docs).collect()}
    assert out[0]["n_passages"] == 2 and out[0]["n_dup_passages"] == 1
    assert out[1]["n_passages"] == 2 and out[1]["n_dup_passages"] == 1
    assert out[0]["dup_passage_frac"] == 0.5
    assert out[2]["n_dup_passages"] == 0 and not out[2]["is_dup_heavy"]
    # 1/2 > 3/10 → dup-heavy
    assert out[0]["is_dup_heavy"] and out[1]["is_dup_heavy"]


def test_dedup_passages_within_doc_repeat_counts(spark):
    p = " ".join(f"x{i}" for i in range(D.PASSAGE_WORDS))
    docs = _docs(spark, [f"{p} {p}"])  # same passage twice in ONE doc
    row = D.dedup_passages(docs).collect()[0]
    assert row["n_passages"] == 2 and row["n_dup_passages"] == 2
    assert row["is_dup_heavy"]


def test_dedup_passages_partial_last_chunk(spark):
    words = " ".join(f"y{i}" for i in range(D.PASSAGE_WORDS + 3))
    row = D.dedup_passages(_docs(spark, [words])).collect()[0]
    assert row["n_passages"] == 2  # 16-word chunk + 3-word tail


# ------------------------------------------------------------- unigram LM
def test_unigram_lm_hand_computed(spark):
    # corpus: 3 'a', 1 'b' → p(a)=3/4, p(b)=1/4
    docs = _docs(spark, ["a a", "a b"])
    out = {r["doc_id"]: r for r in T.unigram_lm_quality(docs).collect()}
    grid = 10**T.UNIGRAM_DP
    lp_a = math.floor(math.log(3 / 4) * grid + 0.5000001)
    lp_b = math.floor(math.log(1 / 4) * grid + 0.5000001)
    assert out[0]["sum_logprob_u"] == 2 * lp_a
    assert out[1]["sum_logprob_u"] == lp_a + lp_b
    assert out[0]["n_words"] == 2
    assert out[0]["avg_logprob"] == pytest.approx(math.log(3 / 4), abs=1e-3)
    # the all-common-words doc scores strictly higher than the one with the
    # rare word — the ranking the quality filter relies on
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]


def test_unigram_lm_sum_is_int64(spark):
    docs = _docs(spark, ["a a", "a b"])
    schema = dict(T.unigram_lm_quality(docs).dtypes)
    assert schema["sum_logprob_u"] == "bigint"
    assert schema["n_words"] == "bigint"


# ------------------------------------------------------------------ IVF-PQ
def test_ivfpq_recall_beats_ivf_on_testdata(spark):
    """PQ+exact-re-rank must recover at least the IVF probe path's recall on
    the same corpus (both measured against the brute-force top-k)."""
    from spark_signals.datapipe import similarity as SIM
    from spark_signals.io.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    ref = {
        (r["query_id"], r["match_id"])
        for r in SIM.ann_bruteforce_topk(emb).collect()
    }
    ivf = {
        (r["query_id"], r["match_id"]) for r in SIM.ann_ivf_topk(emb).collect()
    }
    pq = {
        (r["query_id"], r["match_id"]) for r in SIM.ann_ivfpq_topk(emb).collect()
    }
    assert len(pq & ref) >= len(ivf & ref)


def test_ivfpq_codes_shape(spark):
    """Every corpus vector encodes to exactly PQ_M codewords, and the exact
    re-rank keeps TOP_K rows per query with exact cosine ranking."""
    from spark_signals.datapipe import similarity as SIM
    from spark_signals.io.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = SIM.ann_ivfpq_topk(emb)
    import pandas as pd

    pdf = out.toPandas()
    assert (pdf.groupby("query_id")["rank"].max() == SIM.TOP_K).all()
    assert (pdf.groupby("query_id")["rank"].count() == SIM.TOP_K).all()
    # exact cosine is monotone non-increasing within each query's ranking
    for _, g in pdf.sort_values(["query_id", "rank"]).groupby("query_id"):
        assert (g["cosine"].diff().dropna() <= 1e-12).all()


# ------------------------------------------------------------------ k-means
def test_kmeans_cross_engine_parity(spark):
    """Trained centroids must match the unrolled-CTE DuckDB mirror value
    for value (6-dp grid) — the same check every oracle query gets."""
    import duckdb

    from spark_signals.datapipe import similarity as SIM
    from spark_signals.io.sources import read_table
    from spark_signals.parity import sround
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.001"
    emb = read_table(spark, SF, "embeddings")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    a = (
        SIM.kmeans_train(emb)
        .withColumn("c_val", sround(F.col("c_val"), 6))
        .toPandas()
        .sort_values(["cluster_id", "dim"])
        .reset_index(drop=True)
    )
    b = (
        con.execute(SIM.sql_kmeans_centroids())
        .fetchdf()
        .sort_values(["cluster_id", "dim"])
        .reset_index(drop=True)
    )
    assert len(a) == SIM.KMEANS_K * 64 == len(b)
    assert a[["cluster_id", "dim", "c_val"]].equals(
        b[["cluster_id", "dim", "c_val"]].astype(a.dtypes.to_dict())
    )


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """With more seeds than distinct points, the surplus clusters lose all
    members after one step — they must keep their previous centroid, so
    k never silently decays."""
    from spark_signals.datapipe import similarity as SIM

    rows = [(i, [1.0] * 64, 0) for i in range(5)]  # 5 identical vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = SIM.kmeans_train(emb, k=3, iters=2).toPandas()
    assert sorted(cents["cluster_id"].unique()) == [0, 1, 2]
    assert len(cents) == 3 * 64


def test_trained_ivf_matches_label_ivf_contract(spark):
    """Label-free trained-IVF must return the same shaped top-k relation
    with full rankings per query (recall tracks cluster quality, contract
    tracks shape + determinism)."""
    from spark_signals.datapipe import similarity as SIM
    from spark_signals.io.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = SIM.ann_ivf_trained_topk(emb).toPandas()
    assert set(out.columns) == {"query_id", "match_id", "match_label", "cosine", "rank"}
    assert (out.groupby("query_id")["rank"].count() == SIM.TOP_K).all()
    # deterministic: second run is identical
    out2 = SIM.ann_ivf_trained_topk(emb).toPandas()
    assert out.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        out2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


# ------------------------------------------------------------ composed curate
def test_curate_reasons_and_dedup_first_ordering(spark):
    """Pins the composition semantics: exact dedup runs FIRST, so the
    canonical copy of a duplicated document is NOT flagged dup_heavy by its
    own duplicates (quality-band thresholds are corpus-calibrated, so the
    test asserts reason membership, not absolute keeps)."""
    from spark_signals.datapipe.curate import curate

    rep = ("spam " * 40).strip()  # duplicate-word repetitive
    base = " ".join(f"w{i} the and of to a in is for on with" for i in range(6))
    docs = _docs(
        spark,
        [
            base,               # 0: canonical copy
            base,               # 1: exact_dup of 0
            rep,                # 2: repetitive
            "totally distinct words here x@y.io plus more unique tokens",
        ],
    )
    out = {r["doc_id"]: r for r in curate(docs).collect()}
    # the dedup-first property: doc0 survives exact dedup AND is not
    # passage-penalized by its duplicate doc1
    assert "exact_dup" not in out[0]["drop_reasons"]
    assert "dup_heavy" not in out[0]["drop_reasons"]
    assert "exact_dup" in out[1]["drop_reasons"] and not out[1]["keep"]
    assert "repetitive" in out[2]["drop_reasons"] and not out[2]["keep"]
    assert out[3]["has_pii"] and "<EMAIL>" in out[3]["text_clean"]
    # has_pii alone never drops
    assert "has_pii" not in out[3]["drop_reasons"]
    for r in out.values():  # keep is exactly "no drop reasons"
        assert r["keep"] == (r["drop_reasons"] == "")


def test_curate_contamination_and_length_reasons(spark):
    """The r6 reasons: a doc sharing a 5-gram with the src0 (eval stand-in)
    subset is contaminated; percentile-band outliers are length_outliers —
    and BOTH are computed on the exact-deduped corpus, so a duplicate copy
    is never double-penalized (it already carries exact_dup)."""
    from spark_signals.datapipe.curate import curate

    shared = "alpha beta gamma delta epsilon"
    mid = " ".join(f"w{i} the and of to in" for i in range(6))
    rows = []
    # eval stand-in docs (source=src0)
    rows.append((0, f"{shared} zeta eta unique eval content", "en", "src0", 40))
    # contaminated train doc
    rows.append((1, f"intro words {shared} trailing body", "en", "src1", 40))
    # a fleet of mid-length clean docs to anchor the percentile band
    for i in range(2, 22):
        rows.append((i, f"{mid} filler{i}", "en", "src1", len(mid) + 8))
    # extreme-length outliers (top/bottom of the per-lang band)
    rows.append((22, "tiny", "en", "src1", 4))
    rows.append((23, " ".join(f"long{j}" for j in range(400)), "en", "src1", 2800))
    # exact duplicate of the tiny outlier: must get exact_dup, NOT
    # length_outlier (canon-only flag)
    rows.append((24, "tiny", "en", "src1", 4))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in curate(docs).collect()}
    assert "contaminated" in out[1]["drop_reasons"] and not out[1]["keep"]
    assert "contaminated" not in out[0]["drop_reasons"]  # the eval doc itself
    assert "contaminated" not in out[5]["drop_reasons"]
    assert "length_outlier" in out[22]["drop_reasons"]
    assert "length_outlier" in out[23]["drop_reasons"]
    assert "length_outlier" not in out[5]["drop_reasons"]
    assert "exact_dup" in out[24]["drop_reasons"]
    assert "length_outlier" not in out[24]["drop_reasons"]


# ------------------------------------------------------- incremental dedup
def test_dedup_incremental_batches(spark, tmp_path):
    """Batch 2 dedups against batch 1's persisted index without re-reading
    batch 1's documents; appending the delta keeps the index current; and
    replaying a batch is a no-op (idempotent)."""
    from spark_signals.datapipe.dedup import dedup_incremental, digest_index

    b1 = _docs(spark, ["alpha beta gamma", "delta epsilon zeta", "eta theta"])
    idx_dir = str(tmp_path / "digest_index")
    digest_index(b1).write.parquet(idx_dir)

    b2 = spark.createDataFrame(
        [
            (10, "alpha  beta   GAMMA", "en", "src", 17),  # dup of b1 (ws+case)
            (11, "brand new content", "en", "src", 17),
            (12, "brand new content", "en", "src", 17),    # within-batch dup
            (13, "another new one", "en", "src", 15),
        ],
        DOC_SCHEMA,
    )
    idx = spark.read.parquet(idx_dir)
    survivors, delta = dedup_incremental(b2, idx)
    assert sorted(r["doc_id"] for r in survivors.collect()) == [11, 13]
    assert delta.count() == 2  # two new digests enter the index

    # append the delta, replay the same batch → nothing new
    delta.write.mode("append").parquet(idx_dir)
    survivors2, delta2 = dedup_incremental(b2, spark.read.parquet(idx_dir))
    assert survivors2.count() == 0 and delta2.count() == 0


def test_dedup_incremental_neardup_batches(spark, tmp_path):
    """Signature-level incremental dedup (r7 verdict #4): a batch NEAR-dup
    (shared shingles, not byte-equal — invisible to the digest index) is
    caught against the persisted band index; verification touches only
    candidate history; appending the delta keeps it current; replay is a
    no-op."""
    from spark_signals.datapipe.dedup import band_index, dedup_incremental_neardup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    b1 = _docs(spark, [base, "completely unrelated first corpus text here"])
    idx_dir = str(tmp_path / "band_index")
    band_index(b1).write.parquet(idx_dir)

    b2 = spark.createDataFrame(
        [
            # near-dup of history: one word changed, shingle overlap high
            (10, base.replace("lazy", "sleepy"), "en", "src", 60),
            (11, "genuinely new material nothing shared at all zero", "en", "src", 49),
            # near-dup of doc 11 within the batch (first-wins: 12 drops)
            (12, "genuinely new material nothing shared at all one", "en", "src", 48),
        ],
        DOC_SCHEMA,
    )
    idx = spark.read.parquet(idx_dir)
    survivors, delta = dedup_incremental_neardup(b2, idx, b1)
    assert sorted(r["doc_id"] for r in survivors.collect()) == [11]
    # the delta carries only the survivor's band rows
    assert {r["doc_id"] for r in delta.collect()} == {11}

    delta.write.mode("append").parquet(idx_dir)
    # replay needs history to include batch-1 docs AND the admitted doc 11
    history = b1.unionByName(b2.filter("doc_id = 11"))
    survivors2, delta2 = dedup_incremental_neardup(
        b2, spark.read.parquet(idx_dir), history
    )
    assert survivors2.count() == 0 and delta2.count() == 0


# ---------------------------------------------------- approx percentiles
def test_percentile_approx_tracks_exact_within_rank_error(spark):
    """The documented 100 TB quantile path must actually exist and track
    the exact percentiles: with accuracy=10k on ~10k rows the sketch's
    selected value must lie within the exact p-1% .. p+1% rank band."""
    from spark_signals.relational import (
        q_value_percentiles,
        q_value_percentiles_approx,
    )

    SF = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r for r in q_value_percentiles(spark, SF).collect()}
    approx = {
        r["event_type"]: r for r in q_value_percentiles_approx(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    from spark_signals.io.sources import read_table
    import numpy as np

    ev = read_table(spark, SF, "events").select("event_type", "value").toPandas()
    for et, a in approx.items():
        vals = np.sort(ev[ev.event_type == et]["value"].values)
        for p, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            lo = vals[max(0, int((p - 0.01) * len(vals)) - 1)]
            hi = vals[min(len(vals) - 1, int((p + 0.01) * len(vals)))]
            assert lo <= a[col] <= hi, (et, col, a[col], lo, hi)


def test_length_band_approx_tracks_exact_gate(spark):
    """The sketch-threshold length gate must select (nearly) the same docs
    as the exact cume_dist gate: symmetric difference bounded by the ±1%
    rank error per language stratum."""
    from spark_signals.datapipe.text import length_band, length_band_approx
    from spark_signals.io.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    exact = {r["doc_id"] for r in length_band(docs).collect()}
    approx = {r["doc_id"] for r in length_band_approx(docs).collect()}
    n = docs.count()
    n_langs = docs.select("lang").distinct().count()
    assert len(exact ^ approx) <= max(2, int(0.02 * n)) + 2 * n_langs


def test_strip_boilerplate_drops_corpus_chrome_keeps_case(spark):
    """A passage repeating >= min_occ times corpus-wide (case-insensitive
    digest) is removed from EVERY page; surviving text keeps its casing;
    a page of unique content is untouched (was_modified False)."""
    from spark_signals.datapipe.dedup import strip_boilerplate_passages

    docs = spark.createDataFrame(
        [
            (1, "COOKIE notice accept all COOKIE notice accept all Unique Page one text", "en", "s", 0),
            (2, "cookie notice accept all page two body content words here now", "en", "s", 0),
            (3, "Cookie Notice Accept All page three other body words here too", "en", "s", 0),
            (4, "totally unique document nothing shared with any other page at all", "en", "s", 0),
        ],
        DOC_SCHEMA,
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_passages(docs, k=4, min_occ=3).collect()
    }
    assert out[1]["text_strip"] == "Unique Page one text"
    assert out[2]["text_strip"] == "page two body content words here now"
    assert out[3]["text_strip"] == "page three other body words here too"
    assert out[3]["was_modified"] and not out[4]["was_modified"]
    assert (out[1]["n_passages"], out[1]["n_kept"]) == (3, 1)


def test_strip_boilerplate_fully_stripped_page_cross_engine(spark):
    """A page that is NOTHING BUT boilerplate keeps zero passages: both
    engines must agree on text_strip = '' (DuckDB array_to_string of an
    empty list is NULL where Spark concat_ws is '' — the oracle COALESCEs;
    surfaced live at sf0.1, r08)."""
    import duckdb

    from spark_signals.datapipe.dedup import (
        sql_strip_boilerplate,
        strip_boilerplate_passages,
    )

    rows = [
        (1, "cookie notice accept all", "en", "s", 0),
        (2, "cookie notice accept all", "en", "s", 0),
        (3, "cookie notice accept all", "en", "s", 0),
        (4, "real content body words", "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r["doc_id"]: (r["text_strip"], r["n_kept"], r["was_modified"])
        for r in strip_boilerplate_passages(docs, k=4, min_occ=3).collect()
    }
    assert got[1] == ("", 0, True)
    assert got[4] == ("real content body words", 1, False)
    con = duckdb.connect()
    vals = ", ".join(f"({d}, '{t}', '{lg}', '{s}', {n})" for d, t, lg, s, n in rows)
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
        "t(doc_id, text, lang, source, n_chars)"
    )
    want = {
        r[0]: (r[1], r[3], r[4])
        for r in con.execute(sql_strip_boilerplate(k=4, min_occ=3)).fetchall()
    }
    assert got == want


def test_decontam_fuzzy_catches_paraphrased_eval_leakage(spark):
    """A training doc that lightly edits an eval doc (one word changed —
    invisible to exact digests at doc granularity) is flagged with a high
    verified Jaccard; unrelated docs report zero matches."""
    from spark_signals.datapipe.decontam import decontaminate_neardup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    eval_docs = _docs(spark, [base])
    train = spark.createDataFrame(
        [
            (10, base.replace("lazy", "sleepy"), "en", "train", 60),
            (11, "entirely different content with no shared shingles at all", "en", "train", 57),
        ],
        DOC_SCHEMA,
    )
    out = {r["doc_id"]: r for r in decontaminate_neardup(train, eval_docs).collect()}
    assert out[10]["is_contaminated_fuzzy"] and out[10]["n_eval_matches"] == 1
    assert out[10]["max_jaccard_u"] > 500_000  # > 0.5 shingle Jaccard
    assert not out[11]["is_contaminated_fuzzy"] and out[11]["max_jaccard_u"] == 0
