"""Behavioral tests for the r08 fingerprint-family operators: winnowing
(MOSS) near-dup, per-language Zipf distribution stats, and media
perceptual-hash (dHash) near-dup.

The sf0.01 parity sweep pins cross-engine value equality on the synthetic
corpus; the fixtures here pin the SEMANTIC claims — the winnowing detection
guarantee, the Zipf slope of a constructed power-law corpus, and the dHash
hamming arithmetic — which word-salad can't witness."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import multimodal as M
from spark_signals.datapipe import text as T

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows, lang="en"):
    return spark.createDataFrame(
        [
            (i, t, lang if isinstance(lang, str) else lang[i], "src", len(t))
            for i, t in enumerate(rows)
        ],
        DOC_SCHEMA,
    )


def _duck(rows, lang="en"):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": rows,
                "lang": lang if isinstance(lang, str) else list(lang),
                "source": "src",
                "n_chars": [len(t) for t in rows],
            }
        ),
    )
    return con


# --------------------------------------------------------------- winnowing
COPIED = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the crowd watches in complete silence until the final whistle"
)


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    """Any shared substring of length >= k + w - 1 must contribute at least
    one shared fingerprint (the winnowing paper's detection guarantee)."""
    shared = "abcdefghijk"  # exactly k + w - 1 = 11 chars
    rows = [f"xxxx {shared} yyyy", f"zzzz {shared} wwww"]
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in D.winnow_fingerprints(_docs(spark, rows)).collect()
    }
    assert fps[0] & fps[1], "guarantee violated: no shared fingerprint"


def test_winnow_pairs_detect_copy_and_skip_unrelated(spark):
    rows = [
        COPIED,
        COPIED + " with a short new tail added",
        "completely different material about winter storms over the arctic "
        "circle and the slow migration of reindeer herds across the tundra",
    ]
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in D.winnow_fingerprint_pairs(_docs(spark, rows)).collect()
    }
    assert (0, 1) in out
    assert out[(0, 1)]["resemblance"] > 0.5
    assert (0, 2) not in out and (1, 2) not in out


def test_winnow_short_docs_are_total(spark):
    """Docs shorter than k and shorter than k+w-1 still fingerprint."""
    rows = ["ab", "ab", "abcdefghi"]
    fps = D.winnow_fingerprints(_docs(spark, rows)).collect()
    assert all(len(r["fingerprints"]) == 1 for r in fps)
    pairs = D.winnow_fingerprint_pairs(
        _docs(spark, rows), min_shared=1
    ).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {(0, 1)}


def test_winnow_frequency_cap_drops_boilerplate(spark):
    """A fingerprint present in more docs than the cap generates no pairs."""
    rows = [COPIED + f" unique tail {i}" for i in range(4)]
    with_cap = D.winnow_fingerprint_pairs(_docs(spark, rows), fp_max_docs=3)
    # every winnow fingerprint of the shared prefix occurs in all 4 docs ->
    # capped at 3, only tail fingerprints (all unique) remain -> no pairs
    assert with_cap.count() == 0
    without = D.winnow_fingerprint_pairs(_docs(spark, rows), fp_max_docs=50)
    assert without.count() == 6  # all C(4,2) pairs share the prefix


def test_winnow_cross_engine_on_copy_fixture(spark):
    rows = [
        COPIED,
        COPIED + " with a short new tail added",
        "unrelated arctic reindeer migration text of comparable length "
        "padded with more unrelated words to pass the gram threshold",
    ]
    sdf = D.winnow_fingerprint_pairs(_docs(spark, rows)).toPandas()
    ddf = _duck(rows).execute(D.sql_winnow_pairs()).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = ddf[cols].sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# -------------------------------------------------------------- Zipf stats
def test_zipf_slope_of_constructed_power_law(spark):
    """freq(rank r) = 60/r for r in 1..6 -> slope exactly -1 in log-log."""
    words = []
    for r in range(1, 7):
        words += [f"w{r}"] * (60 // r)
    rows = [" ".join(words)]
    out = T.zipf_stats(_docs(spark, rows), "en").collect()[0]
    assert out["vocab_size"] == 6
    assert out["n_tokens"] == sum(60 // r for r in range(1, 7))
    assert abs(out["zipf_slope"] + 1.0) < 0.05
    assert out["hapax_count"] == 0


def test_zipf_scalar_stats_exact(spark):
    rows = ["a a a b b c", "d"]
    out = T.zipf_stats(_docs(spark, rows), "en").collect()[0]
    assert out["n_tokens"] == 7
    assert out["vocab_size"] == 4
    assert out["hapax_count"] == 2  # c, d
    assert out["type_token_ratio"] == pytest.approx(4 / 7, abs=1e-6)
    assert out["hapax_frac"] == pytest.approx(0.5, abs=1e-6)


def test_zipf_lang_shards_and_catchall(spark):
    langs = ["en", "en", "de", "xx"]
    rows = ["alpha beta", "alpha gamma", "der die das", "mystery words"]
    out = {
        r["lang"]: r
        for r in T.zipf_lang_stats(_docs(spark, rows, lang=langs)).collect()
    }
    assert set(out) == {"de", "en", "es", "fr", "zh", "other"}
    assert out["en"]["n_tokens"] == 4 and out["en"]["vocab_size"] == 3
    assert out["de"]["n_tokens"] == 3
    assert out["other"]["n_tokens"] == 2  # the xx shard
    assert out["es"]["n_tokens"] == 0 and out["es"]["zipf_slope"] is None


def test_zipf_cross_engine_on_fixture(spark):
    langs = ["en", "en", "de", "xx"]
    rows = ["alpha beta beta", "alpha gamma", "der die das der", "mystery words"]
    sdf = T.zipf_lang_stats(_docs(spark, rows, lang=langs)).toPandas()
    ddf = _duck(rows, lang=langs).execute(T.sql_zipf_lang_stats()).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values("lang").reset_index(drop=True)
    b = ddf[cols].sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------------------- media pHash
def _media(spark, payloads, kind="image"):
    docs = spark.createDataFrame(
        [(i, p, "en", "src", len(p)) for i, p in enumerate(payloads)],
        DOC_SCHEMA,
    )
    from pyspark.sql import functions as F

    kinds = (
        F.lit(kind)
        if isinstance(kind, str)
        else F.element_at(F.array(*[F.lit(k) for k in kind]), F.col("doc_id").cast("int") + 1)
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
    )


def _py_dhash(payload: bytes) -> str:
    bs = [payload[i] if i < len(payload) else 0 for i in range(65)]
    return "".join("1" if bs[i] > bs[i + 1] else "0" for i in range(64))


def test_phash_signature_matches_reference_arithmetic(spark):
    payloads = ["hello world " * 10, "short", ""]
    sigs = {
        r["media_id"]: r["sig"]
        for r in M.media_phash_signatures(_media(spark, payloads)).collect()
    }
    for i, p in enumerate(payloads):
        assert sigs[i] == _py_dhash(p.encode()), f"sig mismatch for doc {i}"


def test_phash_neardup_detects_small_edit_and_skips_cross_kind(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    edited = base[:30] + "X" + base[31:]  # one byte changed
    different = "zzzz completely different payload with other byte structure"
    # identical + small edit, same kind -> pair; different kind -> never
    out = M.media_phash_neardup(
        _media(spark, [base, edited, different])
    ).collect()
    pairs = {(r["media_a"], r["media_b"]): r["hamming"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] <= M.PHASH_MAX_HAMMING
    cross = M.media_phash_neardup(
        _media(spark, [base, base], kind=["image", "audio"])
    ).collect()
    assert cross == []


def test_phash_pigeonhole_guarantee(spark):
    """Any pair within PHASH_MAX_HAMMING must be found (band pigeonhole)."""
    base = bytes(range(40, 105)).decode("latin-1")
    # flipping one byte changes at most 2 hamming bits; 3 edits <= 6 < 8
    edited = list(base)
    for pos in (5, 20, 40):
        edited[pos] = chr(ord(edited[pos]) + 40)
    rows = [base, "".join(edited)]
    ham = sum(
        1
        for a, b in zip(_py_dhash(rows[0].encode()), _py_dhash(rows[1].encode()))
        if a != b
    )
    assert ham <= M.PHASH_MAX_HAMMING
    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )
    from pyspark.sql import functions as F

    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
    )
    out = M.media_phash_neardup(media).collect()
    assert [(r["media_a"], r["media_b"], r["hamming"]) for r in out] == [(0, 1, ham)]


def test_phash_cross_engine_on_fixture(spark):
    # doc_id % 3 drives kind in both engines, so ids 0 and 3 are 'image',
    # 1 and 4 'audio' — craft near-dups inside the same residue class
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        base,  # 0: image
        "audio payload one two three four five six seven eight nine ten",  # 1
        "unrelated video material " * 3,  # 2
        base[:30] + "Y" + base[31:],  # 3: image near-dup of 0
        "audio payload one two three four five six seven eight nine xen",  # 4
    ]
    sdf = M.media_phash_neardup(
        M.synthesize_media(_docs(spark, rows))
    ).toPandas()
    assert len(sdf) >= 2  # the image pair and the audio pair
    ddf = _duck(rows).execute(M.sql_media_phash_neardup()).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(["media_a", "media_b"]).reset_index(drop=True)
    b = ddf[cols].sort_values(["media_a", "media_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_zipf_empty_corpus_reports_zero_rows_per_shard(spark):
    """zipf_lang_stats is a report: an empty corpus yields one zero-row per
    configured shard (never a crash, never phantom tokens)."""
    empty = spark.createDataFrame([], DOC_SCHEMA)
    out = T.zipf_lang_stats(empty).collect()
    assert len(out) == len(T.ZIPF_LANGS) + 1
    assert all(r["n_tokens"] == 0 and r["vocab_size"] == 0 for r in out)
    assert all(r["zipf_slope"] is None for r in out)


def test_winnow_whitespace_only_docs_share_empty_fingerprint_safely(spark):
    """All-whitespace docs normalize to '' and share md5('') — below
    min_shared, so they never pair; nothing throws."""
    rows = ["   ", "\t\n  ", "real content that is long enough to fingerprint"]
    assert D.winnow_fingerprint_pairs(_docs(spark, rows)).count() == 0


# ------------------------------------------------------- hot-key guard
# A template fingerprint (or constant dHash band) present in more docs
# than the frequency cap must be dropped by the COUNT pre-filter, before
# any collect_list buffer exists — the planted hot key below exceeds the
# cap, so the aggregation that builds per-key doc lists never sees it,
# and the planted near-dup pair (whose keys are under the cap) is still
# found. This pins the buffer-bounding discipline the docstrings claim.


def test_winnow_hot_template_key_is_count_filtered_not_collected(spark):
    template = "this exact boilerplate navigation header appears everywhere "
    hot = [template + f"unique tail {i} zq{i}x" for i in range(12)]
    near_a = "completely different planted passage about xylophones and quartz crystals"
    near_b = near_a + " tail"
    docs = _docs(spark, hot + [near_a, near_b])
    out = D.winnow_fingerprint_pairs(docs, fp_max_docs=10).collect()
    # the 12 template docs share only over-cap fingerprints -> no pairs;
    # the planted pair's fingerprints sit in exactly 2 docs -> found
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(12, 13)}


def test_winnow_cap_filter_semantics_match_duckdb_having(spark):
    """The Spark count+semi-join guard and the oracle's HAVING BETWEEN
    produce identical pairs on a corpus with an over-cap template."""
    template = "shared boilerplate sentence repeated across the whole corpus "
    rows = [template + f"doc {i} marker m{i}m" for i in range(12)]
    rows += ["planted duplicate passage with unique words", 
             "planted duplicate passage with unique words and tail"]
    sdf = (
        D.winnow_fingerprint_pairs(_docs(spark, rows), fp_max_docs=10)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    ddf = (
        _duck(rows)
        .execute(D.sql_winnow_pairs(fp_max_docs=10))
        .fetchdf()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sdf[["doc_a", "doc_b", "shared_fps"]],
        ddf[["doc_a", "doc_b", "shared_fps"]],
        check_dtype=False,
    )


def test_phash_hot_band_key_is_count_filtered_not_collected(spark):
    varied = bytes([(i * 37) % 256 for i in range(70)])
    varied_b = bytearray(varied)
    varied_b[40] ^= 0xFF  # flips <= 2 dHash bits
    rows = [(i, "image", b"\xaa" * 70) for i in range(12)]  # constant sig
    rows += [(100, "image", varied), (101, "image", bytes(varied_b))]
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = M.media_phash_neardup(media, band_max_docs=10).collect()
    # 12 identical payloads share only over-cap band keys -> no pairs;
    # the planted 1-byte-edit pair still collides on an under-cap band
    assert {(r["media_a"], r["media_b"]) for r in out} == {(100, 101)}
    assert all(r["hamming"] <= 2 for r in out)


def test_phash_short_payload_floor_blocks_zero_pad_pairs(spark):
    """Two unrelated sub-9-byte payloads hash near-identically (the 64-bit
    signature is almost all zero pad), so they are excluded from near-dup
    entirely rather than reported as a fake pair; payloads at/over the
    floor still pair normally."""
    varied = bytes([(i * 37) % 256 for i in range(70)])
    rows = [
        (0, "image", b"ab"),          # 2 bytes: zero-pad dominated
        (1, "image", b"xy"),          # unrelated 2 bytes, same pad
        (2, "image", varied),
        (3, "image", varied + b"!"),  # true near-dup of 2
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = {(r["media_a"], r["media_b"]) for r in M.media_phash_neardup(media).collect()}
    assert out == {(2, 3)}


def test_sql_media_kind_mapping_pins_synthesize_media(spark):
    """SQL_MEDIA_KIND (the one spelling every DuckDB twin uses) must agree
    with synthesize_media's Spark CASE on every doc_id residue."""
    import duckdb

    docs = _docs(spark, [f"text {i}" for i in range(9)])
    spark_kinds = {
        r["media_id"]: r["kind"] for r in M.synthesize_media(docs).collect()
    }
    duck_kinds = dict(
        duckdb.sql(
            f"SELECT doc_id, {M.SQL_MEDIA_KIND} AS kind"
            " FROM (SELECT unnest(range(0, 9)) AS doc_id)"
        ).fetchall()
    )
    assert spark_kinds == duck_kinds


# ------------------------------------------------- decoded-grid near-dup
# The production dHash path: Arrow decode stage -> fixed bucket-mean grid
# -> the same JVM banded blocking. The synthetic corpus has no GLOBALLY
# byte-similar documents (its near-dups share prefixes only, which the
# raw-byte signature sees but a whole-payload resize rightly does not),
# so detection evidence lives here on planted dupes.


def _grid_docs(spark, texts):
    return _docs(spark, texts)


def test_decoded_grid_detects_global_neardup_not_prefix_dup(spark):
    base = "".join(chr(97 + (i * 7) % 26) for i in range(2000))
    global_dup = base[:1000] + "XX" + base[1002:]   # 2 edited chars mid-doc
    prefix_only = base[:100] + "".join(
        chr(97 + (i * 11 + 3) % 26) for i in range(1900)
    )  # shares a long prefix, diverges wholesale after
    # doc_ids 0 and 3 -> kind 'image' for all three? 0%3=0 image, 3%3=0
    # image, 6%3=0 image: use ids 0,3,6 via padding rows
    texts = [base, "pad one", "pad two", global_dup, "pad three", "pad four", prefix_only]
    docs = _grid_docs(spark, texts)
    media = M.synthesize_media(docs)
    out = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in M.media_phash_neardup_decoded(media, force_stub=True).collect()
    }
    assert (0, 3) in out, out          # globally similar -> found
    assert (0, 6) not in out, out      # prefix-only -> correctly NOT a dup
    # the raw-byte signature sees the opposite: prefix twins collide
    raw = {
        (r["media_a"], r["media_b"])
        for r in M.media_phash_neardup(media).collect()
    }
    assert (0, 6) in raw


def test_decoded_grid_cross_engine_on_planted_dupes(spark):
    base = "".join(chr(97 + (i * 13) % 26) for i in range(1500))
    # the edited twin sits at id 3 so the pair shares a synthetic kind
    # (doc_id % 3 == 0 for both — cross-kind rows never pair by design)
    texts = [base, "padding row", "unrelated short text here", base[:700] + "qq" + base[702:]]
    sdf = (
        M.media_phash_neardup_decoded(
            M.synthesize_media(_grid_docs(spark, texts)), force_stub=True
        )
        .toPandas()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    ddf = (
        _duck(texts)
        .execute(M.sql_media_phash_neardup_decoded())
        .fetchdf()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    assert len(sdf) >= 1  # the planted dup pair is present
    pd.testing.assert_frame_equal(
        sdf[["media_a", "media_b", "kind", "hamming"]],
        ddf[["media_a", "media_b", "kind", "hamming"]],
        check_dtype=False,
    )


def test_decoded_grid_short_payload_floor_blocks_constant_grid_pairs(spark):
    """The decoded path applies the payload floor BEFORE gridding: two
    unrelated sub-9-byte payloads stretch into constant grids with
    identical all-zero signatures and would fake a hamming-0 pair
    (caught by review r10); they are excluded, planted long dupes still
    pair, in both engines."""
    base = "a proper document body " * 40
    # ids 0 and 1 are the tiny payloads; the planted dup pair sits on ids
    # 3 and 6 so both map to the same synthetic kind (doc_id % 3 == 0)
    texts = ["x", "qq", "pad one", base, "pad two", "pad three", base + "!"]
    docs = _docs(spark, texts)
    out = {
        (r["media_a"], r["media_b"])
        for r in M.media_phash_neardup_decoded(
            M.synthesize_media(docs), force_stub=True
        ).collect()
    }
    assert out == {(3, 6)}
    duck = _duck(texts).execute(M.sql_media_phash_neardup_decoded()).fetchall()
    assert {(r[0], r[1]) for r in duck} == {(3, 6)}


def test_planted_twin_fixture_cross_engine(spark):
    """The r11 driver face for the decoded-grid near-dup runs on the
    PLANTED fixture (synthesize_media_planted): every TWIN_MOD-th long
    document gets a 2-char mid-edit twin at media_id + TWIN_ID_OFFSET, so
    the artifact records detected pairs instead of a vacuous 0-row
    agreement. Pins: the twin pairs with its source in BOTH engines, the
    ineligible docs (short, or off-modulus) plant nothing, and the full
    result frames hash-equal."""
    long_doc = "".join(chr(97 + (i * 13) % 26) for i in range(600))
    texts = [long_doc, "short off-modulus row", "another pad", "also short"]
    sdf = (
        M.media_phash_neardup_decoded(
            M.synthesize_media_planted(_docs(spark, texts)), force_stub=True
        )
        .toPandas()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    ddf = (
        _duck(texts)
        .execute(M.sql_media_phash_neardup_decoded(planted=True))
        .fetchdf()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    # doc 0 is the only eligible source (doc_id % 50 == 0, len >= 400):
    # exactly one planted pair, detected
    assert (0, M.TWIN_ID_OFFSET) in set(zip(sdf.media_a, sdf.media_b))
    assert len(sdf) == 1
    pd.testing.assert_frame_equal(
        sdf[["media_a", "media_b", "kind", "hamming"]],
        ddf[["media_a", "media_b", "kind", "hamming"]],
        check_dtype=False,
    )
