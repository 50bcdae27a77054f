"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB): every variant is *blocking-based* — no cartesian
products. Exact dedup is a hash shuffle on the content digest. MinHash-LSH
shuffles once on (band, band_hash) buckets, so candidate generation is
O(collisions), not O(n²); the verify join re-shuffles only candidate pairs.
SimHash blocks on signature bytes (pigeonhole: hamming ≤ 3 pairs share at
least one of 4 bytes). Embedding near-dup blocks on the cluster label
(IVF-style partitioning). All hashing is md5-based and codegen'd —
cross-engine deterministic and UDF-free; the MinHash families hash each
set element ONCE and derive the permutations arithmetically (see
_km_row_sigs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.checkpoint import pin

from spark_signals.datapipe.text import SQL_SHINGLES, ascii_lower, shingles_col, words_col
from spark_signals.datapipe.util import spread_small_input

NUM_HASHES = 12
BAND_ROWS = 2  # 6 bands × 2 rows — tuned for recall on small synthetic docs
NUM_BANDS = NUM_HASHES // BAND_ROWS
JACCARD_THRESHOLD = 0.2
CHAR_NGRAM = 5
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 3


# ------------------------------------------------------------------ exact
def content_digest(text) -> F.Column:
    """THE content identity: md5 over the trimmed, whitespace-collapsed,
    ascii-lowercased text.

    Single definition shared by batch exact dedup, the incremental digest
    index, and the streaming redelivery filter
    (``datapipe.streaming.dedup_docs_stream``) — a document must hash the
    same in every lane or a redelivery that differs only by padding
    survives one pass and confuses the next (the r5 streaming digest
    omitted the trim and did exactly that).
    """
    return F.md5(F.trim(F.regexp_replace(ascii_lower(text), "[ \t\n\x0b\f\r]+", " ")))


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup on the whitespace-normalized content digest.

    Whole-partition window aggregates over one digest-keyed shuffle
    (min(doc_id), count(*) OVER (PARTITION BY content_hash)): the text is
    scanned and md5-digested ONCE and only (doc_id, content_hash) pairs
    cross the exchange. The former groupBy + join-back form planned TWO
    full scan+digest passes (one per join arm) and, at scale, either an
    unbounded broadcast of every doc's digest or a second shuffle for the
    sort-merge join — measured 0.47 → 0.32 s best-of-5 at sf0.1 (r16).

    NULL-text docs (digest NULL) are filtered out explicitly: the former
    inner join on content_hash dropped them (NULL never equi-matches, in
    Spark and in the SQL oracle's JOIN USING), but a window PARTITION BY
    groups NULLs together — without the filter the r16 rewrite silently
    marked NULL-text docs as duplicates of each other, breaking
    filter_ablation's exclusion contract (caught by
    tests/test_release_audits.py). The predicate is on the source column,
    so it pushes to the parquet scan.
    """
    hashed = docs.where(F.col("text").isNotNull()).select(
        "doc_id", content_digest(F.col("text")).alias("content_hash")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash")
    return hashed.select(
        "doc_id",
        "content_hash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    ).withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_doc_id"))


# DuckDB mirror of content_digest() — keep the two in lockstep
SQL_CONTENT_DIGEST = (
    "md5(trim(regexp_replace(translate({col}, "
    "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
    "'[ \t\n\x0b\f\r]+', ' ', 'g')))"
)

SQL_DEDUP_EXACT = f"""
WITH h AS (
  SELECT doc_id, {SQL_CONTENT_DIGEST.format(col="text")} AS content_hash
  FROM documents
),
g AS (
  SELECT content_hash, min(doc_id) AS canonical_doc_id, count(*) AS group_size
  FROM h GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.canonical_doc_id, g.group_size,
       h.doc_id <> g.canonical_doc_id AS is_duplicate
FROM h JOIN g USING (content_hash)"""


# ------------------------------------------------------------- minhash-lsh
# Kirsch-Mitzenmacher hash family over one md5 per shingle: the hex digest's
# first two 8-char slices are two independent 32-bit lanes (h1, h2), and
# permutation i is g_i = (h1 + (i+1)·h2) mod P — pairwise-independent enough
# for MinHash (Kirsch & Mitzenmacher, "Less Hashing, Same Performance",
# ESA 2006). vs. the earlier md5('i:'||shingle) scheme this hashes each
# shingle ONCE instead of NUM_HASHES times (12x less md5 work — the r04
# bench's dominant cost in this operator) and both engines parse the same
# hex slices, so signatures stay cross-engine identical.
MINHASH_P = 4_294_967_291  # largest 32-bit prime; (i+1)·h2 + h1 < 2^36 « 2^63


def _km_perm(i: int):
    """KM permutation i as a transform lambda over (h1, h2) structs.

    Factory function on purpose: a ``lambda x, i=i`` would declare TWO
    parameters, and pyspark's higher-order-function binding passes the
    element *index* as the second argument — silently clobbering the
    closure and collapsing all permutations to one (observed: wrong
    signatures, 253 vs 256 verified pairs at sf0.1).
    """
    return lambda x: (x["h1"] + F.lit(i + 1) * x["h2"]) % F.lit(MINHASH_P)


def _km_row_sigs(rel: DataFrame, arr: str, n: int, *keep: str) -> DataFrame:
    """Per-ROW KM-minhash columns m0..m{n-1} — zero-shuffle signature path.

    Two chained Projects: the first materializes one (h1, h2) struct per
    set element (one md5 per element), the second folds each permutation
    with array_min. CollapseProject keeps them separate because the hash
    array is a non-cheap expression referenced n times (verified: 2 md5
    occurrences in the optimized plan, not 2n), so the md5 really runs
    once per element. No explode and no doc_id aggregate — signatures never
    leave their input partition (the r5 long-form explode → 12-min groupBy
    recomputed its whole pipeline per self-join side; see
    dedup_minhash_lsh's docstring).

    Built as SQL text (r17, guide §5): the Column-DSL form cost ~15 py4j
    round trips per permutation lambda per build, on a builder every
    banded-fingerprint operator calls; the strings parse to the identical
    Catalyst trees (canonicalized-optimizedPlan-equality gated at rewrite
    time — _km_perm stays as the Column witness used by that gate).
    """
    hs_expr = (
        f"transform({arr}, s -> struct("
        "cast(conv(substring(md5(s), 1, 8), 16, 10) as long) AS h1, "
        "cast(conv(substring(md5(s), 9, 8), 16, 10) as long) AS h2))"
    )
    ms = [
        f"array_min(transform(_hs, x -> (x.h1 + {i + 1} * x.h2) % {MINHASH_P})) AS m{i}"
        for i in range(n)
    ]
    return rel.selectExpr("*", f"{hs_expr} AS _hs").selectExpr("doc_id", *keep, *ms)


def _band_keys(sigs: DataFrame, n_bands: int = NUM_BANDS) -> DataFrame:
    """doc_id → (band, k1, k2) LSH bucket keys.

    With 2 rows per band the band key is the raw pair of 34-bit signature
    values — two bigints, no digest of the band needed (narrower shuffle
    keys than the former 32-char band_hash md5, and one less hash pass).
    """
    pieces = ", ".join(
        f"struct({b} AS band, m{2 * b} AS k1, m{2 * b + 1} AS k2)"
        for b in range(n_bands)
    )
    return sigs.selectExpr("doc_id", f"explode(array({pieces})) AS bb").selectExpr(
        "doc_id", "bb.band", "bb.k1", "bb.k2"
    )


def _with_shingles(docs: DataFrame) -> DataFrame:
    docs = spread_small_input(docs)
    return docs.withColumn("words", words_col(F.col("text"))).withColumn(
        "shingles", F.array_distinct(shingles_col(3))
    )


def minhash_bands(docs: DataFrame) -> DataFrame:
    """doc_id → (band, k1, k2) LSH bucket keys (public blocking API)."""
    return _band_keys(
        _km_row_sigs(_with_shingles(docs).select("doc_id", "shingles"), "shingles", NUM_HASHES)
    )


def dedup_minhash_lsh(docs: DataFrame) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    Candidates come from equi-joining band buckets; the exact Jaccard
    re-check joins shingle sets back only for candidate pairs.

    ONE persisted relation carries (doc_id, shingles, m0..m11): the
    signatures are computed per-row (``_km_row_sigs`` — no explode, no
    doc_id shuffle), so band keys on both sides of the self-join and the
    shingle sets for verification all read from the same cache. The r5
    long-form signature (explode → 12-min groupBy) recomputed its whole
    explode+aggregate pipeline once per self-join side because only the
    shingle relation was cached — the root of the r5 +94% regression; the
    single-persist per-row shape restored the r4-class time (sf0.1
    best-of ~1.3 s vs 1.9 s) with signatures bit-identical to the SQL
    oracle (same KM family over the same md5 hex lanes).
    """
    # one shingle+signature pass shared by band generation and Jaccard
    # verification (the reference StatementSet-style common-subplan reuse,
    # hand-managed). Lifecycle: the shared relation is pinned only for the
    # duration of this call — the result is materialized eagerly while the
    # cache is warm, then the cache is released in the finally (measured
    # 3.4x slower without the share). The checkpointed result's own storage
    # is freed by the ContextCleaner when the caller drops the DataFrame;
    # durability at cluster scale is the one-key switch (checkpoint.pin).
    sh = _km_row_sigs(
        _with_shingles(docs).select("doc_id", "shingles"), "shingles", NUM_HASHES, "shingles"
    ).persist()
    # the banded candidate relation is ALSO materialized once (r16 verdict):
    # both sides of the band self-join previously re-derived the band-key
    # explode off the signature cache — a cheap projection locally, but one
    # whole extra pass over the signatures at large corpora. The bands
    # relation is narrow (4 smallints/bigints per doc×band), so caching it
    # costs less than re-deriving it.
    bands = _band_keys(sh).persist()
    try:
        return _minhash_pairs(sh, bands).transform(pin)
    finally:
        bands.unpersist()
        sh.unpersist()


def _minhash_pairs(sh: DataFrame, bands: DataFrame | None = None) -> DataFrame:
    """Candidate join + verify over a persisted (doc_id, shingles, m*) rel.

    At sf0.1 all three joins run as broadcast-hash (band sides and the
    distinct candidate set are tiny); at warehouse scale the same plan
    degrades gracefully to shuffled hash joins on the band / doc_id keys —
    still candidate-only verification, never all-pairs.

    ``bands`` optionally supplies a pre-materialized band-key relation so
    the self-join's two sides share ONE band-key pass (dedup_minhash_lsh
    persists it alongside the signatures); derived on the fly otherwise.
    """
    if bands is None:
        bands = _band_keys(sh)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "k1", "k2"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pairs = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a"
        ).join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b"
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _sql_shingle_docs() -> str:
    return f"""
d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct({SQL_SHINGLES(3)}) AS shingles FROM d
)"""


# mirrors _km_row_sigs/_band_keys: one md5 per shingle, two 32-bit hex
# lanes, KM family g_i = (h1 + (i+1)·h2) mod P, per-doc min per i, band key
# = the raw (m_{2b}, m_{2b+1}) pair. '0x'||hex::BIGINT parses the same
# slices Spark's conv(...,16,10) does, so signatures are engine-identical.
SQL_DEDUP_MINHASH = f"""
WITH {_sql_shingle_docs()},
g AS (
  SELECT doc_id,
         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
sig AS (
  SELECT doc_id,
    {", ".join(f"min((h1 + {i + 1} * h2) % {MINHASH_P}) AS m{i}" for i in range(NUM_HASHES))}
  FROM g GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         [{", ".join(f"m{2 * b}" for b in range(NUM_BANDS))}][b + 1] AS k1,
         [{", ".join(f"m{2 * b + 1}" for b in range(NUM_BANDS))}][b + 1] AS k2
  FROM sig, (SELECT unnest(range(0, {NUM_BANDS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))
    AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = doc_a
JOIN sh sb ON sb.doc_id = doc_b
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))
    >= {JACCARD_THRESHOLD}"""


# --------------------------------------------------------- char-ngram jaccard
NGRAM_HASHES = 8
NGRAM_BAND_ROWS = 2
NGRAM_BANDS = NGRAM_HASHES // NGRAM_BAND_ROWS
NGRAM_JACCARD_THRESHOLD = 0.5
# Signature-agreement pre-filter: candidates must match on >= this many of
# the NGRAM_HASHES minhash positions before the exact gram intersection runs.
# E[matches] = NGRAM_HASHES * J, so 4/8 centers on the J=0.5 threshold:
# recall ~0.89 at J=0.5 (given a band collision), ~0.99 at J=0.7, ~1 at
# J>=0.9 — while template-similar corpora (J~0.2, E[matches]=1.6 + the 2
# from the colliding band) drop ~80% of candidates before the O(|grams|)
# verification. Measured on sf0.1: 1.1M raw candidates -> ~240k verified.
NGRAM_SIG_AGREE_MIN = 4


def dedup_ngram_jaccard(docs: DataFrame) -> DataFrame:
    """Character-5-gram Jaccard with banded char-gram-MinHash blocking.

    A single min-hash block key is far too permissive on corpora with a
    shared vocabulary (measured: 976k candidate pairs over 5k synthetic
    docs); banding K=8 char-gram minhashes into 4 bands of 2 requires TWO
    simultaneous hash agreements per bucket — P(collision)=1-(1-J²)^4, so
    J=0.5 pairs are found with ~66% per-band-set recall while J≈0.1
    background pairs almost never collide. One shuffle on (band, k1, k2),
    exact Jaccard verification only on candidates.
    """
    norm = F.trim(F.regexp_replace(ascii_lower(F.col("text")), "[ \t\n\x0b\f\r]+", " "))
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(norm_text) - {CHAR_NGRAM - 1}, 1)), "
        f"j -> substring(norm_text, j, {CHAR_NGRAM})))"
    )
    base = (
        spread_small_input(docs)
        .select("doc_id", norm.alias("norm_text"))
        .withColumn("grams", grams)
    )
    # same pinned-for-the-call lifecycle as dedup_minhash_lsh: ONE persisted
    # relation carries grams + the per-row KM signature (``_km_row_sigs``:
    # one md5 per gram, no explode/groupBy, no rejoin shuffle), so band keys
    # for both self-join sides and the gram sets for verification all read
    # from the same cache.
    sh = base.select("doc_id", "grams")
    keyed = (
        _km_row_sigs(sh, "grams", NGRAM_HASHES, "grams")
        .withColumn("sig", F.array(*[F.col(f"m{i}") for i in range(NGRAM_HASHES)]))
        .persist()
    )
    try:
        return _ngram_pairs(keyed).transform(pin)
    finally:
        keyed.unpersist()


def _ngram_pairs(keyed: DataFrame) -> DataFrame:
    bands = _band_keys(keyed, NGRAM_BANDS)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "k1", "k2"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    g = keyed.select(
        "doc_id",
        "grams",
        "sig",
        F.size("grams").alias("n_grams"),
    )
    pairs = (
        cand.join(
            g.select(
                F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a"),
                F.col("sig").alias("s_a"), F.col("n_grams").alias("n_a"),
            ),
            "doc_a",
        ).join(
            g.select(
                F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b"),
                F.col("sig").alias("s_b"), F.col("n_grams").alias("n_b"),
            ),
            "doc_b",
        )
    )
    # two cheap pre-filters before the O(|grams|) exact intersection:
    # (1) lossless size bound — J <= min/max set sizes, so a size ratio
    #     below the threshold can never verify;
    # (2) minhash signature agreement (see NGRAM_SIG_AGREE_MIN).
    size_ok = (
        F.least("n_a", "n_b").cast("double") / F.greatest("n_a", "n_b")
        >= F.lit(NGRAM_JACCARD_THRESHOLD)
    )
    sig_agree = F.size(
        F.filter(F.zip_with("s_a", "s_b", lambda x, y: x == y), lambda z: z)
    )
    survivors = pairs.filter(size_ok & (sig_agree >= NGRAM_SIG_AGREE_MIN))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    jac = inter.cast("double") / union
    return survivors.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD
    )


SQL_DEDUP_NGRAM = f"""
WITH base AS (
  SELECT doc_id, trim(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm_text
  FROM documents
),
g AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(length(norm_text) - {CHAR_NGRAM - 2}, 2)),
      j -> substring(norm_text, j, {CHAR_NGRAM}))) AS grams
  FROM base
),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(x), 1, 8))::BIGINT AS h1,
         ('0x' || substring(md5(x), 9, 8))::BIGINT AS h2
  FROM (SELECT doc_id, unnest(grams) AS x FROM g)
),
sig_w AS (
  SELECT doc_id,
    {", ".join(f"min((h1 + {i + 1} * h2) % {MINHASH_P}) AS m{i}" for i in range(NGRAM_HASHES))}
  FROM h GROUP BY doc_id
),
sig AS (
  SELECT s.doc_id, g.grams,
         [{", ".join(f"m{i}" for i in range(NGRAM_HASHES))}] AS sig
  FROM sig_w s JOIN g ON g.doc_id = s.doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         [{", ".join(f"m{2 * b}" for b in range(NGRAM_BANDS))}][b + 1] AS k1,
         [{", ".join(f"m{2 * b + 1}" for b in range(NGRAM_BANDS))}][b + 1] AS k2
  FROM sig_w, (SELECT unnest(range(0, {NGRAM_BANDS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
  WHERE a.doc_id < b.doc_id
),
surv AS (
  SELECT doc_a, doc_b, ga.grams AS g_a, gb.grams AS g_b
  FROM cand
  JOIN sig ga ON ga.doc_id = doc_a
  JOIN sig gb ON gb.doc_id = doc_b
  WHERE CAST(least(len(ga.grams), len(gb.grams)) AS DOUBLE)
      / greatest(len(ga.grams), len(gb.grams)) >= {NGRAM_JACCARD_THRESHOLD}
    AND len(list_filter(range(1, {NGRAM_HASHES} + 1),
          i -> ga.sig[i] = gb.sig[i])) >= {NGRAM_SIG_AGREE_MIN}
)
SELECT doc_a, doc_b,
  CAST(len(list_intersect(g_a, g_b)) AS DOUBLE)
    / (len(g_a) + len(g_b) - len(list_intersect(g_a, g_b))) AS jaccard
FROM surv
WHERE CAST(len(list_intersect(g_a, g_b)) AS DOUBLE)
    / (len(g_a) + len(g_b) - len(list_intersect(g_a, g_b)))
    >= {NGRAM_JACCARD_THRESHOLD}"""


# ----------------------------------------------------------------- simhash
def _simhash_ints(docs: DataFrame) -> DataFrame:
    """doc_id → 32-bit SimHash as a BIGINT, long-form.

    One md5 per word (exploded rows, plain-column codegen — no interpreted
    higher-order functions); the digest's first 8 hex chars parse to a
    32-bit value h, bit j of the signature is 1 iff Σ_words (2·bit_j(h)−1)
    is positive, where bit_j(h) = (h >> (31−j)) & 1 — the exact big-endian
    bit order of the former per-nibble string scheme, so signatures are
    unchanged. Per-doc bit sums partial-aggregate before the doc_id
    shuffle; wordless docs re-enter via left join with the all-zero
    signature (matching Σ over an empty set = 0 in the old HOF form).
    """
    base = spread_small_input(docs).withColumn("words", words_col(F.col("text")))
    w = base.select("doc_id", F.explode("words").alias("w")).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    sums = w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), 31 - j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig_int = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.coalesce(F.col(f"s{j}"), F.lit(0)) > 0, F.lit(2 ** (31 - j))).otherwise(
            F.lit(0)
        )
        sig_int = bit if sig_int is None else sig_int + bit
    return base.select("doc_id").join(sums, "doc_id", "left").select(
        "doc_id", sig_int.cast("long").alias("sim_int")
    )


def simhash_docs(docs: DataFrame) -> DataFrame:
    """doc_id → 32-bit SimHash as a big-endian bit string (public API)."""
    return _simhash_ints(docs).select(
        "doc_id", F.lpad(F.bin("sim_int"), SIMHASH_BITS, "0").alias("simhash")
    )


def dedup_simhash(docs: DataFrame) -> DataFrame:
    """SimHash near-dup pairs: block on any equal signature byte (pigeonhole
    covers hamming ≤ 3 over 4 byte-blocks), verify hamming via popcount."""
    sims = _simhash_ints(docs)
    blk_structs = [
        F.struct(
            F.lit(b).alias("blk"),
            F.shiftright(F.col("sim_int"), 8 * b).bitwiseAND(255).alias("blk_byte"),
        )
        for b in range(4)
    ]
    blocks = sims.select(
        "doc_id", "sim_int", F.explode(F.array(*blk_structs)).alias("bb")
    ).select("doc_id", "sim_int", "bb.blk", "bb.blk_byte")
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(b, ["blk", "blk_byte"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim_int").alias("h_a"),
            F.col("b.sim_int").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(h_a ^ h_b)")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


# mirrors _simhash_ints: one md5 per word, 32-bit h from the first 8 hex
# chars, bit j = (h >> (31-j)) & 1, per-doc ±1 sums, popcount hamming.
# (^ is exponent in DuckDB — xor() is the function.)
SQL_DEDUP_SIMHASH = f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
w AS (
  SELECT doc_id, ('0x' || substring(md5(x), 1, 8))::BIGINT AS h
  FROM (SELECT doc_id, unnest(words) AS x FROM d)
),
sums AS (
  SELECT doc_id,
    {", ".join(f"sum(CASE WHEN (h >> {31 - j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(SIMHASH_BITS))}
  FROM w GROUP BY doc_id
),
sims AS (
  SELECT d.doc_id,
    ({" + ".join(f"CASE WHEN coalesce(s{j}, 0) > 0 THEN {2 ** (31 - j)}::BIGINT ELSE 0::BIGINT END" for j in range(SIMHASH_BITS))}) AS sim_int
  FROM d LEFT JOIN sums USING (doc_id)
),
blocks AS (
  SELECT doc_id, sim_int, b AS blk, (sim_int >> (8 * b)) & 255 AS blk_byte
  FROM sims, (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sim_int AS h_a, b.sim_int AS h_b
  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.blk_byte = b.blk_byte
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(h_a, h_b)) <= {SIMHASH_MAX_HAMMING}"""


# ------------------------------------------------------ embedding near-dup
COSINE_THRESHOLD = 0.3  # synthetic embeddings are near-orthogonal; see parity


def embedding_neardup(embeddings: DataFrame) -> DataFrame:
    """Embedding-cosine near-duplicates, blocked by cluster label.

    The label column acts as the IVF cell: pairs are only formed within a
    cell, so the join is an equi-join shuffle on label, not a cross join.
    Cosine is an exact double dot product over the float32 vectors.
    """
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    pairs = a.join(b, F.col("a.label") == F.col("b.label")).filter(
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)"
    )
    na = F.sqrt(F.expr("aggregate(a.embedding, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    nb = F.sqrt(F.expr("aggregate(b.embedding, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    from spark_signals.parity import sround

    from spark_signals.datapipe.similarity import _cos_div

    cos = sround(_cos_div(dot, na * nb), 6)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


SQL_EMBEDDING_NEARDUP = f"""
WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
    floor((
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / greatest(sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 1e-300)
    ) * 1e6 + 0.5000001) / 1e6 AS cosine
  FROM embeddings a JOIN embeddings b ON a.label = b.label
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label, cosine FROM p WHERE cosine >= {COSINE_THRESHOLD}"""


# ----------------------------------------------------------------- SemDeDup
# Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
# semantic deduplication" (arXiv:2303.09540): k-means clusters bound the
# pairwise cosine comparison (never all-pairs), and within a cluster every
# vector whose cosine to an already-kept vector exceeds the threshold is a
# semantic duplicate. The keep rule here is keep-FIRST by vec_id — a local,
# deterministic predicate (dup ⇔ ∃ lower-id cell-mate with cos ≥ τ) that
# needs no connected components and matches SemDeDup's one-survivor-per-
# near-dup-group semantics on pairwise-dup groups.
SEMDEDUP_THRESHOLD = 0.3  # synthetic embeddings are near-orthogonal
# Target MEAN cell size for the derived cluster count: Σ|cell|² ≈ n·target
# when cells are balanced, so the pairwise stage stays linear in n with a
# bounded constant. SemDeDup §3 runs 50k clusters at LAION scale — same
# ratio discipline, n/cell_size.
SEMDEDUP_TARGET_CELL = 64


def semdedup_k(
    n: int, target_cell_size: int = SEMDEDUP_TARGET_CELL, k_min: int | None = None
) -> int:
    """Derived cluster count: k = max(KMEANS_K, min(ceil(n /
    target_cell_size), ceil(sqrt(n)))).

    r06 shipped the toy KMEANS_K as the silent default — at real scale a
    forgotten knob makes Σ|cell|² quadratic. Small corpora size by target
    mean cell (k = n/target); past the crossover (n ≈ target²) the
    BALANCED sizing k* = √n takes over: minimizing assignment cost (n·k)
    plus within-cell pair cost (Σ|cell|² ≈ n·(n/k)) gives k* = √n and
    total Θ(n^1.5) — the pure n/target rule held the pair stage linear
    but let the centroid assignment grow Θ(n²/target), the same flaw the
    100× decade exposed in knn_join_k (see similarity.knn_join_k)."""
    import math

    from spark_signals.datapipe.similarity import KMEANS_K

    k_min = KMEANS_K if k_min is None else k_min
    by_cell = math.ceil(n / max(target_cell_size, 1))
    balanced = math.ceil(math.sqrt(n))
    return max(k_min, min(by_cell, balanced))


def semdedup(
    embeddings: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    k: int | None = None,
    target_cell_size: int = SEMDEDUP_TARGET_CELL,
    cell_cap: int | None = None,
) -> DataFrame:
    """Semantic dedup over TRAINED k-means cells (no label column needed).

    Returns every vector with its trained cell, the count of lower-id
    cell-mates within the cosine threshold, and the is_semdup verdict.

    Shape at 100 TB: the trainer is the checkpointed Lloyd loop
    (similarity.kmeans_train); the pairwise stage is an equi-join on the
    cell id, so the comparison cost is Σ|cell|² — bounded because ``k``
    defaults to :func:`semdedup_k`, DERIVED from a cheap corpus count so
    mean cell size stays ≤ ``target_cell_size`` as n grows (the same
    scalar-probe pattern as the hot-key router, normalize.py). Pass ``k``
    explicitly to pin a fixed cluster count (the oracle twin does, since
    the unrolled-Lloyd SQL is generated for a static k). The relabeled
    relation is eagerly pinned because the self-join reads it twice.
    """
    from spark_signals.datapipe.similarity import (
        kmeans_assign_arrow,
        kmeans_train,
    )

    if k is None:
        # one scalar count — the documented exception to the no-driver-side-
        # results discipline (bounded output, like normalize.py's hot-key probe)
        k = semdedup_k(embeddings.count(), target_cell_size)
    cells = kmeans_assign_arrow(embeddings, kmeans_train(embeddings, k))
    rel = (
        embeddings.join(cells, "vec_id")
        .select("vec_id", "embedding", F.col("cluster_id").alias("cell"))
        .transform(pin)
    )
    # within-cell close-pair COUNTS as cogrouped Arrow matmuls (the r11
    # constant-factor fix, same economics as the KNN candidate scorer):
    # the output is per-vector counts, so the Σ|cell|² pair relation
    # never needs to exist as rows — each cell's cosine matrix is BLAS
    # products, gridded to 1e-6 exactly like the SQL twin, and only the
    # n_close_lower > 0 rows are emitted. The balanced √n sizing keeps
    # mean |cell| at √n, and the r12 mega-cell guard chunk-splits any
    # cell past cell_cap so no task ever holds an unbounded cell (see
    # _semdedup_counts_arrow).
    close = _semdedup_counts_arrow(rel, float(threshold), cell_cap)
    n_close = F.coalesce(F.col("n_close_lower"), F.lit(0).cast("long"))
    return (
        rel.select("vec_id", "cell")
        .join(close, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            n_close.alias("n_close_lower"),
            (n_close > 0).alias("is_semdup"),
        )
    )


def _semdedup_counts_arrow(
    rel: DataFrame, threshold: float, cell_cap: int | None = None
) -> DataFrame:
    """(vec_id, n_close_lower > 0) per cell via a COGROUPED Arrow matmul:
    for each vector, the count of LOWER-vec_id cell-mates whose gridded
    cosine meets ``threshold`` — the semantics of the former within-cell
    pair join, computed blocked without materializing pairs.

    Mega-cell guard (r12, same discipline as similarity's KNN scorer):
    cogroups don't AQE-split, so an unguarded per-cell group would let one
    pathological trained cell serialize one task holding the whole cell's
    embedding matrix. Instead the cell self-join is expressed as a
    cogroup of (probe rows) × (mate rows) keyed on (cell, pchunk, mchunk)
    where each side hashes into ceil(|cell|/``cell_cap``) chunks and fans
    out across the other side's chunks — every task sees ≤ ~cap rows per
    side at any skew, and a mega-cell becomes splits² parallel tasks.
    Counts are ADDITIVE over mate chunks (a (probe, mate) pair meets in
    exactly one group), so the final per-vec sum is exactly the unsplit
    count. Under the default cap no test-scale cell splits (all factors
    1) and the arithmetic is identical to the unguarded stage."""
    from spark_signals.datapipe.similarity import (
        _CELL_HARD_LIMIT_FACTOR,
        CELL_SPLIT_CAP,
        _chunk_splits,
    )

    cap = CELL_SPLIT_CAP if cell_cap is None else int(cell_cap)
    hard_limit = cap * _CELL_HARD_LIMIT_FACTOR

    def count(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"),
             "n_close_lower": pd.Series(dtype="int64")}
        )
        if not len(left) or not len(right):
            return empty
        if len(left) > hard_limit or len(right) > hard_limit:
            raise ValueError(
                f"mega-cell guard breached: cogroup sides "
                f"{len(left)}/{len(right)} exceed {hard_limit} "
                f"(= {_CELL_HARD_LIMIT_FACTOR}x cell_cap={cap}) — the chunk "
                f"split upstream should have bounded this; retrain or "
                f"split the cell / check the split wiring"
            )
        x = np.array(left["embedding"].tolist(), dtype=np.float64)
        m = np.array(right["m_emb"].tolist(), dtype=np.float64)
        ids = left["vec_id"].to_numpy()
        mate_ids = right["mate_id"].to_numpy()
        xn = np.sqrt((x * x).sum(axis=1))
        mn = np.sqrt((m * m).sum(axis=1))
        counts = np.zeros(len(ids), dtype=np.int64)
        for lo in range(0, len(ids), 1024):
            hi = min(lo + 1024, len(ids))
            den = np.maximum(xn[lo:hi, None] * mn[None, :], 1e-300)
            cosg = np.floor(x[lo:hi] @ m.T / den * 1e6 + 0.5000001) / 1e6
            counts[lo:hi] = (
                (cosg >= threshold) & (mate_ids[None, :] < ids[lo:hi, None])
            ).sum(axis=1)
        keep = counts > 0
        return pd.DataFrame({"vec_id": ids[keep], "n_close_lower": counts[keep]})

    # probe/mates built as two INDEPENDENT join expressions (not one shared
    # `sized` node): cogrouping two branches of the same join triggers
    # Spark's ambiguous-self-join analyzer error
    splits = _chunk_splits(rel.select("cell"), "cell", cap, "nsplits")
    probe = (
        rel.join(F.broadcast(splits), "cell")
        .withColumn(
            "pchunk", F.pmod(F.xxhash64("vec_id"), F.col("nsplits")).cast("int")
        )
        .withColumn("mchunk", F.explode(F.expr("sequence(0, nsplits - 1)")))
        .select("cell", "pchunk", "mchunk", "vec_id", "embedding")
    )
    mates = (
        # every column re-aliased: fresh attribute ids, so cogrouping the
        # probe branch (which keeps rel's ids) is not an ambiguous self-join
        rel.select(
            F.col("cell").alias("cell"),
            F.col("vec_id").alias("mate_id"),
            F.col("embedding").alias("m_emb"),
        )
        .join(F.broadcast(splits), "cell")
        .withColumn(
            "mchunk", F.pmod(F.xxhash64("mate_id"), F.col("nsplits")).cast("int")
        )
        .withColumn("pchunk", F.explode(F.expr("sequence(0, nsplits - 1)")))
        .select("cell", "pchunk", "mchunk", "mate_id", "m_emb")
    )
    partials = (
        probe.groupBy("cell", "pchunk", "mchunk")
        .cogroup(mates.groupBy("cell", "pchunk", "mchunk"))
        .applyInPandas(count, "vec_id long, n_close_lower long")
    )
    return partials.groupBy("vec_id").agg(
        F.sum("n_close_lower").alias("n_close_lower")
    )


def sql_semdedup(threshold: float = SEMDEDUP_THRESHOLD) -> str:
    """DuckDB mirror: the shared unrolled-Lloyd CTEs + assignment
    (similarity._sql_kmeans_ctes / sql_kmeans_assign_cte), then the same
    keep-first within-cell cosine rule."""
    from spark_signals.datapipe.similarity import (
        KMEANS_ITERS,
        _sql_kmeans_ctes,
        sql_kmeans_assign_cte,
    )

    ctes = _sql_kmeans_ctes()
    ctes.append(sql_kmeans_assign_cte(KMEANS_ITERS))
    ctes.append(
        """rel AS (
  SELECT e.vec_id, e.embedding, CAST(a.cluster_id AS INT) AS cell
  FROM embeddings e JOIN afin a USING (vec_id)
)"""
    )
    ctes.append(
        f"""close AS (
  SELECT a.vec_id, count(*) AS n_close_lower
  FROM rel a JOIN rel b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE floor((
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / greatest(sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 1e-300)
    ) * 1e6 + 0.5000001) / 1e6 >= CAST({threshold!r} AS DOUBLE)
  GROUP BY a.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT r.vec_id, r.cell,
       CAST(COALESCE(c.n_close_lower, 0) AS BIGINT) AS n_close_lower,
       COALESCE(c.n_close_lower, 0) > 0 AS is_semdup
FROM rel r LEFT JOIN close c USING (vec_id)"""
    )


# ------------------------------------------------- cluster canonicalization
def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14): over the *symmetrized* neighborhoods, connect
    every strictly-larger neighbor of u to m = min(N(u) ∪ {u}).

    One shuffle: symmetrize → groupBy(u) → explode. No joins.
    """
    sym = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.least(F.col("u"), F.array_min("nbrs"))
    return (
        grouped.select(
            F.explode(F.filter("nbrs", lambda v: v > F.col("u"))).alias("bigger"),
            m.alias("head"),
        )
        .filter(F.col("bigger") != F.col("head"))
        .select(F.col("bigger").alias("u"), F.col("head").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient every edge larger→smaller, then connect all
    smaller-or-equal neighbors of u (and u itself) to m = min(N(u) ∪ {u})."""
    ordered = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    grouped = ordered.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.least(F.col("u"), F.array_min("nbrs"))  # == array_min here (all v < u)
    return (
        grouped.select(
            F.explode(F.array_union("nbrs", F.array("u"))).alias("node"),
            m.alias("head"),
        )
        .filter(F.col("node") != F.col("head"))
        .select(F.col("node").alias("u"), F.col("head").alias("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame, vertices: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds.

    Same contract as :func:`connected_components`: returns (id, comp) with
    comp = the minimum vertex id in the component. Converges in O(log n)
    alternating rounds on ANY graph shape — the scale path for adversarial
    (chain/path) near-dup graphs, where plain label propagation needs
    O(diameter) rounds. Isolated vertices (no edges) are re-attached from
    ``vertices`` at the end, each its own component.

    Cost model at 100 TB: each round is one groupBy shuffle over the current
    edge list (large-star additionally symmetrizes, a map-side union); edges
    only re-point at ever-smaller labels, so the set shrinks toward one star
    per component. Lineage is truncated per round (checkpoint.pin — local by
    default, reliable under spark.signals.checkpointDir) so plans don't grow.
    Convergence = the edge set reaches a fixed point, checked with a single
    short-circuiting exceptAll ``limit(1)`` probe per round.
    """
    cur = (
        edges.selectExpr("src AS u", "dst AS v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(pin)
    )
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).transform(pin)
        changed = (
            nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "alternating rounds — at O(log n) convergence this indicates a "
            "bug or a graph far larger than max_rounds=40 supports"
        )
    # Fixed point is a star forest: every non-root points straight at its
    # component min (the root never appears as u).
    labels = cur.groupBy("u").agg(F.min("v").alias("comp")).select(
        F.col("u").alias("id"), "comp"
    )
    return (
        vertices.select("id")
        .join(labels, "id", "left")
        .select(F.col("id"), F.coalesce("comp", "id").alias("comp"))
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``edges`` has columns (src, dst); ``vertices`` a single column ``id``.
    Returns (id, comp) where comp = the minimum vertex id reachable.

    Scale design: the driver loop is O(graph diameter) iterations (same
    propagation scheme as GraphX/Pregel connectedComponents); each iteration
    is one distributed join + min-aggregate keyed by vertex id. Near-dup
    graphs are unions of small dense clusters, so diameter — and the
    iteration count — stays tiny even at billions of docs. Lineage is
    truncated per iteration (checkpoint.pin — reliable under
    spark.signals.checkpointDir at cluster scale), so plans don't grow
    with iterations. The alternating
    large-star/small-star variant (O(log n) rounds on adversarial chains)
    is the documented upgrade path if diameters ever grow.
    """
    sym = edges.selectExpr("src", "dst").unionAll(edges.selectExpr("dst AS src", "src AS dst"))
    labels = vertices.select(F.col("id"), F.col("id").alias("comp"))
    labels = labels.transform(pin)
    sym = sym.transform(pin)
    changed = 0
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.dst == labels.id)
            .select(F.col("src").alias("id"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .transform(pin)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Partially-propagated labels would silently split one true cluster
        # into several "canonical" survivors. The graph diameter exceeds
        # max_iter — delegate to the O(log n) large-star/small-star variant,
        # which produces the identical min-id labeling on any diameter.
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: diameter exceeds max_iter=%d "
            "(%d labels still changing); delegating to "
            "connected_components_star (O(log n) rounds)",
            max_iter,
            changed,
        )
        return connected_components_star(edges, vertices)
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """Near-dup *clusters*: MinHash-LSH pairs → connected components →
    canonical survivor per cluster (min doc_id).

    The operator a training-data pipeline actually runs downstream of
    pairwise dedup: pairs (A,B),(B,C) must collapse to ONE kept document,
    which needs the transitive closure, not the pair list. Output:
    (doc_id, cluster_id, cluster_size, is_canonical) for every document —
    filter ``is_canonical`` to materialize the deduplicated corpus.

    ``pairs`` optionally supplies an already-computed (ideally pinned)
    :func:`dedup_minhash_lsh` relation so a pipeline emitting several
    pair-derived artifacts (clusters, overlap matrix, split verify) pays
    the shingle→signature→band→verify cost ONCE (r15 advisory).
    """
    if pairs is None:
        pairs = dedup_minhash_lsh(docs)
    pairs = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    verts = docs.select(F.col("doc_id").alias("id"))
    comp = connected_components(pairs, verts)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).alias("is_canonical"),
        )
    )


def dedup_cluster_stats(docs: DataFrame) -> DataFrame:
    """Near-dup cluster-size histogram — the dedup audit artifact
    (how much duplication, in what clump sizes): per cluster_size,
    (n_clusters, n_docs, n_duplicates, corpus_frac). ``cluster_size = 1``
    rows are the unduplicated mass; ``n_duplicates`` counts the docs a
    canonical-only materialization would drop. corpus_frac grids to 1e-6.

    Scale: two tiny aggregates over the CC output (cluster-count-sized,
    then histogram-sized) + one broadcast scalar — the O(log n) CC passes
    in dedup_clusters dominate; this adds no corpus-sized shuffle."""
    cl = dedup_clusters(docs)
    by_size = cl.groupBy("cluster_size").agg(
        F.count_distinct(F.col("cluster_id")).alias("n_clusters"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    total = cl.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        by_size.crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            (F.col("n_docs") - F.col("n_clusters")).alias("n_duplicates"),
            (
                F.floor(
                    F.col("n_docs") / F.col("n_total") * F.lit(1e6) + F.lit(0.5000001)
                )
                / F.lit(1e6)
            ).alias("corpus_frac"),
        )
    )


def sql_dedup_cluster_stats() -> str:
    return f"""
WITH c AS ({SQL_DEDUP_CLUSTERS}),
by_size AS (
  SELECT cluster_size, COUNT(DISTINCT cluster_id) AS n_clusters, COUNT(*) AS n_docs
  FROM c GROUP BY 1
),
total AS (SELECT COUNT(*) AS n_total FROM c)
SELECT cluster_size, n_clusters, n_docs,
       CAST(n_docs - n_clusters AS BIGINT) AS n_duplicates,
       floor(CAST(n_docs AS DOUBLE) / n_total * 1e6 + 0.5000001) / 1e6 AS corpus_frac
FROM by_size CROSS JOIN total"""


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_sql_shingle_docs()},
sig AS (
  SELECT doc_id,
    list_transform(range(0, {NUM_HASHES}),
      i -> list_min(list_transform(shingles, s -> md5(i::VARCHAR || ':' || s)))) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, b AS band,
    md5(array_to_string(list_slice(sig, b * {BAND_ROWS} + 1, b * {BAND_ROWS} + {BAND_ROWS}), '|')) AS band_hash
  FROM sig, (SELECT unnest(range(0, {NUM_BANDS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))
      >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.src AS node, r.comp
  FROM reach r JOIN edges e ON e.dst = r.node
),
comp AS (
  SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       c.doc_id = c.cluster_id AS is_canonical
FROM comp c JOIN sizes s USING (cluster_id)"""


def dedup_canonical_quality(docs: DataFrame) -> DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster keep
    the HIGHEST-quality member (ties → min doc_id), not the min-id one —
    the pipeline refinement every curation stack applies once it has a
    quality score (near-dup clusters routinely mix a clean original with
    truncated/boilerplate-wrapped copies; min-id keeps whichever crawled
    first). Output: (doc_id, cluster_id, cluster_size, quality_u,
    is_canonical_quality) — filter the flag to materialize the corpus.

    ``quality_u`` is text_stats' quality_score on the exact 1e-6 int64
    grid, so the argmax (and therefore the kept set) is engine- and
    partitioning-exact.

    Shape at 100 TB: the O(log n) CC passes dominate; this adds one scan
    for the quality score (map-side, joins clusters on doc_id), one
    cluster-keyed agg of a 2-field struct, and one broadcast-or-hash join
    back — no windows, no sort.
    """
    from spark_signals.datapipe.text import text_stats

    clusters = dedup_clusters(docs)
    qu = (
        F.floor(F.col("quality_score") * F.lit(1e6) + F.lit(0.5000001))
        .cast("long")
        .alias("quality_u")
    )
    quality = text_stats(docs).select("doc_id", qu)
    j = clusters.join(quality, "doc_id")
    best = j.groupBy("cluster_id").agg(
        F.min(
            F.struct((-F.col("quality_u")).alias("nq"), F.col("doc_id").alias("id"))
        ).alias("b")
    ).select("cluster_id", F.col("b.id").alias("best_id"))
    return j.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "quality_u",
        (F.col("doc_id") == F.col("best_id")).alias("is_canonical_quality"),
    )


def sql_dedup_canonical_quality() -> str:
    from spark_signals.datapipe.text import SQL_TEXT_STATS

    return f"""
WITH cl AS ({SQL_DEDUP_CLUSTERS}),
q AS (
  SELECT doc_id,
         CAST(floor(quality_score * 1e6 + 0.5000001) AS BIGINT) AS quality_u
  FROM ({SQL_TEXT_STATS()}) ts
),
j AS (
  SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, q.quality_u
  FROM cl JOIN q USING (doc_id)
),
best AS (
  SELECT cluster_id, doc_id AS best_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality_u DESC, doc_id ASC) AS rn
    FROM j
  ) WHERE rn = 1
)
SELECT j.doc_id, j.cluster_id, j.cluster_size, j.quality_u,
       j.doc_id = best.best_id AS is_canonical_quality
FROM j JOIN best USING (cluster_id)"""


# ------------------------------------------------------- passage-level dedup
# Non-overlapping word windows — the CCNet/RefinedWeb granularity for
# scrubbing boilerplate passages that repeat across documents without the
# whole documents being near-duplicates.
PASSAGE_WORDS = 16
# dup-heavy gate: > 30% of a doc's passages seen elsewhere in the corpus,
# compared in exact integer arithmetic (10·dup > 3·total)
PASSAGE_DUP_NUM = 3
PASSAGE_DUP_DEN = 10


def dedup_passages(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """Passage-granular duplication profile per document.

    Chunks each document into non-overlapping ``k``-word passages (last
    partial chunk kept), digests each passage, and counts global occurrences
    of every digest; a passage is *duplicated* when its digest occurs more
    than once corpus-wide (within-doc repeats count — both are boilerplate
    signals for curation).

    Shape at scale: explode to (doc_id, passage) → md5 → one hash agg on
    digest (map-side combined: counts per digest) → equi-join the passage
    stream back on digest → per-doc hash agg. Two digest-keyed shuffles +
    one doc-keyed — the blocking shape, never O(n²); passage text itself is
    dropped before any shuffle (only 32-byte digests move).
    """
    from spark_signals.datapipe.util import explode_strings

    base = (
        spread_small_input(docs)
        .withColumn("words", words_col(F.col("text")))
        .filter(F.size("words") > 0)
    )
    # sequence over the chunk index; slice() truncates the final partial chunk
    chunks = F.expr(
        f"transform(sequence(0, (size(words)-1) div {k}),"
        f" i -> concat_ws(' ', slice(words, i*{k}+1, {k})))"
    )
    passages = explode_strings(
        base.select("doc_id", chunks.alias("chunks")), F.col("chunks"), "passage", "doc_id"
    ).select("doc_id", F.md5(F.col("passage")).alias("digest"))
    occ = passages.groupBy("digest").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        passages.join(occ, "digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count(F.when(F.col("n_occ") > 1, F.lit(1))).alias("n_dup_passages"),
        )
    )
    dup, tot = F.col("n_dup_passages"), F.col("n_passages")
    return per_doc.select(
        "doc_id",
        "n_passages",
        "n_dup_passages",
        # single int/int double division — correctly rounded per IEEE-754,
        # so bit-identical across engines with no grid gate
        (dup.cast("double") / tot).alias("dup_passage_frac"),
        (dup * F.lit(PASSAGE_DUP_DEN) > tot * F.lit(PASSAGE_DUP_NUM)).alias(
            "is_dup_heavy"
        ),
    )


def sql_dedup_passages(source: str = "documents") -> str:
    """Oracle SQL parameterized over the source relation so compositions
    (curate's canon_documents) pass the relation explicitly instead of
    string-replacing 'FROM documents' in a sibling's SQL."""
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
p AS (
  SELECT doc_id,
         md5(array_to_string(words[(i*{PASSAGE_WORDS}+1):((i+1)*{PASSAGE_WORDS})], ' ')) AS digest
  FROM d, unnest(generate_series(0, CAST((len(words)-1) // {PASSAGE_WORDS} AS INT))) AS t(i)
  WHERE len(words) > 0
),
occ AS (SELECT digest, COUNT(*) AS n_occ FROM p GROUP BY 1),
per_doc AS (
  SELECT p.doc_id,
         COUNT(*) AS n_passages,
         COUNT(*) FILTER (WHERE occ.n_occ > 1) AS n_dup_passages
  FROM p JOIN occ USING (digest)
  GROUP BY 1
)
SELECT doc_id, n_passages, n_dup_passages,
       CAST(n_dup_passages AS DOUBLE) / n_passages AS dup_passage_frac,
       n_dup_passages * {PASSAGE_DUP_DEN} > n_passages * {PASSAGE_DUP_NUM} AS is_dup_heavy
FROM per_doc"""


SQL_DEDUP_PASSAGES = sql_dedup_passages()


def dedup_intra_doc(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """Within-document repeated-passage strip — the intra-doc half of the
    C4/RefinedWeb boilerplate treatment (repeated nav bars, footers, spam
    blocks INSIDE one page; :func:`dedup_passages` profiles the
    cross-document half): re-emit each document with every non-overlapping
    ``k``-word passage that already occurred earlier in the SAME document
    removed, first occurrence kept, order preserved.

    Returns (doc_id, text_dedup, n_passages, n_kept, was_modified).

    Passages are COMPARED under the corpus token rule (ASCII-lower) but
    the surviving text is REBUILT from the original case-preserving
    whitespace tokens, so hygiene never destroys casing (r7 advisory:
    C4/CCNet cleaning preserves case; only inter-word whitespace collapses
    to single spaces). Callers substituting text should still coalesce on
    ``was_modified`` (see examples/curate_corpus._hygiene) so untouched
    docs round-trip byte-identically.

    Shape at 100 TB: zero shuffles — one per-row higher-order-function pass
    (transform → filter-with-index → concat_ws), scan-speed anywhere. The
    keep test is O(p²) in the document's OWN passage count (p = words/k;
    a 10k-word doc is ~600 passages → trivial); for megadocs beyond that,
    the explode → min-passage-index agg → rebuild variant trades the per-row
    quadratic for two doc_id-keyed shuffles — not worth it below ~10⁴
    passages per doc.
    """
    raw_words = F.filter(F.split(F.col("text"), "[ \t\n\x0b\f\r]+"), lambda w: w != "")
    base = (
        spread_small_input(docs)
        .withColumn("words", raw_words)
        .filter(F.size("words") > 0)
    )
    chunks = F.expr(
        f"transform(sequence(0, (size(words)-1) div {k}),"
        f" i -> concat_ws(' ', slice(words, i*{k}+1, {k})))"
    )
    with_chunks = base.select("doc_id", chunks.alias("chunks")).withColumn(
        "cmp", F.transform(F.col("chunks"), ascii_lower)
    )
    kept = F.expr(
        "filter(chunks, (p, i) -> NOT array_contains(slice(cmp, 1, i),"
        " element_at(cmp, i + 1)))"
    )
    return with_chunks.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("text_dedup"),
        F.size("chunks").alias("n_passages"),
        F.size(kept).alias("n_kept"),
        (F.size(kept) < F.size("chunks")).alias("was_modified"),
    )


def sql_dedup_intra_doc(source: str = "documents", k: int = PASSAGE_WORDS) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
c AS (
  SELECT doc_id,
         list_transform(range(0, CAST((len(words)-1) // {k} AS INT) + 1),
           i -> array_to_string(words[(i*{k}+1):((i+1)*{k})], ' ')) AS chunks
  FROM d WHERE len(words) > 0
),
cc AS (
  SELECT doc_id, chunks,
         list_transform(chunks, p -> translate(p, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS cmp
  FROM c
),
kc AS (
  SELECT doc_id, chunks,
         list_filter(chunks, (p, i) -> NOT list_contains(cmp[1:i-1], cmp[i])) AS kept
  FROM cc
)
SELECT doc_id,
       array_to_string(kept, ' ') AS text_dedup,
       CAST(len(chunks) AS INT) AS n_passages,
       CAST(len(kept) AS INT) AS n_kept,
       len(kept) < len(chunks) AS was_modified
FROM kc"""


# ------------------------------------------------- exact duplicated spans
# canonical-occurrence key = doc_id * 2^32 + pos: exact int64 as long as
# doc_id < 2^31 and word position < 2^32 (any real corpus; same documented-
# precondition style as the micro-unit aggregates)
SPAN_POS_BASE = 1 << 32


def _span_wins(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, digest) — one row per k-window of corpus-rule tokens.

    The comparison tokens additionally DELETE the GRAM_SEP byte (\\x01)
    token-internally: the concat_ws → split explode round-trip below uses
    \\x01 as its separator, so a literal \\x01 inside a token would
    fragment its gram and shift every subsequent window position — and
    unlike the digest-only operators this family uses positions to CUT
    words in _strip_from_hits. Deletion is within-token (an all-\\x01
    token stays a now-empty token, never filtered), so token count and
    word positions remain aligned with the raw rebuild stream; the DuckDB
    twins delete the same byte in their cmp transform (translate with a
    longer from-set drops the extras in both engines).
    """
    from spark_signals.datapipe.util import GRAM_SEP

    base = (
        spread_small_input(docs)
        .withColumn(
            "words",
            F.transform(
                words_col(F.col("text")),
                lambda w: F.translate(w, GRAM_SEP, ""),
            ),
        )
        .filter(F.size("words") >= k)
    )
    grams = F.expr(
        f"transform(sequence(0, size(words) - {k}),"
        f" i -> concat_ws(' ', slice(words, i+1, {k})))"
    )
    # posexplode through the concat_ws → split round-trip: explode_strings'
    # O(elements²) Generate-over-lambda rationale, plus the window's start
    return base.select(
        "doc_id",
        F.posexplode(F.split(F.concat_ws(GRAM_SEP, grams), GRAM_SEP)).alias(
            "pos", "gram"
        ),
    ).select("doc_id", "pos", F.md5(F.col("gram")).alias("digest"))


def _span_hits(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, is_canon) for every k-window whose digest occurs >= 2
    times corpus-wide; is_canon marks the digest's globally first
    occurrence (min (doc_id, pos))."""
    wins = _span_wins(docs, k)
    # wins is deliberately NOT persisted although both the dup agg and the
    # join back consume it: it is a PER-TOKEN relation (~24 B/token), so at
    # corpus scale materializing it costs more IO than re-running the
    # second pruned two-column scan + explode — the opposite trade from the
    # per-DOC minhash signature relation, which is persisted.
    key = F.col("doc_id") * F.lit(SPAN_POS_BASE) + F.col("pos")
    dup = (
        wins.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min(key).alias("min_key"))
        .filter(F.col("n_occ") >= 2)
        .select("digest", "min_key")
    )
    return wins.join(dup, "digest").select(
        "doc_id", "pos", (key == F.col("min_key")).alias("is_canon")
    )


def _span_islands(hits: DataFrame, k: int) -> DataFrame:
    """Merge duplicated windows into maximal spans (gaps-and-islands):
    (doc_id, _start, _last, _n, _keep) — _last is the MAX window start,
    coverage ends at _last + k - 1; _keep flags islands containing some
    digest's canonical occurrence."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = hits.withColumn(
        "new_span",
        F.when(prev.isNull() | (F.col("pos") > prev + k), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "span_id",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("_start"),
        F.max("pos").alias("_last"),
        F.count(F.lit(1)).alias("_n"),
        F.max(F.col("is_canon").cast("int")).alias("_keep"),
    )


def dedup_exact_spans(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """Maximal corpus-duplicated word spans per document — the exact-
    substring dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", the suffix-array ExactSubstr pass), re-grained
    to words and re-expressed as overlapping k-gram digests merged by a
    gaps-and-islands window.

    A window is the k consecutive corpus-rule tokens (ASCII-lower,
    explicit whitespace class — the same currency as every other dedup
    operator) starting at word position ``pos`` (0-based). A window is
    *duplicated* when its digest occurs >= 2 times corpus-wide
    (within-document repeats count, matching :func:`dedup_passages`'
    global-occurrence rule). Runs of duplicated windows whose coverage
    overlaps or touches (next start <= prev start + k) merge into one
    maximal span, so every reported span is >= k words long and every
    k-window inside it is verbatim repeated somewhere in the corpus.

    Returns (doc_id, span_start, span_end, span_words, n_windows) —
    word positions, 0-based, end inclusive.

    Shape at 100 TB: the explode is ONE row per corpus token of
    (doc_id, pos, 16-byte digest) — strictly linear, the window text
    itself never shuffles; one digest-keyed hash agg (map-side combined)
    keeps digests seen >= 2 times; the join back is ROW-PRESERVING (each
    window row meets at most one digest row), so a boilerplate k-gram
    repeated a million times costs its row count, never its square — the
    structural difference vs the near-dup PAIR families, which is why
    this needs no hot-key cap; the island merge is one doc-keyed
    exchange + sort under two stacked window functions. True suffix
    arrays report spans >= L for every L in one pass; fixing the minimum
    span at k = PASSAGE_WORDS keeps the passage family's grain, which is
    how the curation gates consume it.
    """
    return _span_islands(_span_hits(docs, k), k).select(
        "doc_id",
        F.col("_start").cast("int").alias("span_start"),
        (F.col("_last") + F.lit(k - 1)).cast("int").alias("span_end"),
        (F.col("_last") - F.col("_start") + F.lit(k)).cast("int").alias(
            "span_words"
        ),
        F.col("_n").cast("int").alias("n_windows"),
    )


def _sql_span_win_ctes(source: str, k: int) -> str:
    """The window-relation CTE prefix shared by every span twin: raw
    tokens → lowered (\\x01-stripped) comparison tokens → one (doc_id,
    pos, digest) row per k-window. Ends inside a WITH list."""
    return f"""
d AS (
  SELECT doc_id,
         COALESCE(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> ''), []) AS raw
  FROM {source}
),
dl AS (
  SELECT doc_id, raw,
         list_transform(raw, w -> translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ' || chr(1), 'abcdefghijklmnopqrstuvwxyz')) AS cmp
  FROM d
),
w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(cmp[(i+1):(i+{k})], ' ')) AS digest
  FROM dl, unnest(range(0, len(raw) - {k} + 1)) AS t(i)
  WHERE len(raw) >= {k}
)"""


def _sql_span_ctes(source: str, k: int) -> str:
    """The shared CTE chain: raw tokens → lowered windows → duplicated
    digests with canonical key → island ids. Ends inside a WITH list."""
    return f"""{_sql_span_win_ctes(source, k)},
occ AS (
  SELECT digest, MIN(doc_id * {SPAN_POS_BASE} + pos) AS min_key
  FROM w GROUP BY 1 HAVING COUNT(*) >= 2
),
h AS (
  SELECT w.doc_id, w.pos,
         (w.doc_id * {SPAN_POS_BASE} + w.pos = occ.min_key) AS is_canon
  FROM w JOIN occ USING (digest)
),
f AS (
  SELECT doc_id, pos, is_canon,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
              THEN 1 ELSE 0 END AS new_span
  FROM h
),
g AS (
  SELECT doc_id, pos, is_canon,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_id
  FROM f
),
isl AS (
  SELECT doc_id, span_id,
         MIN(pos) AS _start, MAX(pos) AS _last, COUNT(*) AS _n,
         MAX(CASE WHEN is_canon THEN 1 ELSE 0 END) AS _keep
  FROM g GROUP BY doc_id, span_id
)"""


def sql_dedup_exact_spans(source: str = "documents", k: int = PASSAGE_WORDS) -> str:
    return f"""
WITH {_sql_span_ctes(source, k)}
SELECT doc_id,
       CAST(_start AS INT) AS span_start,
       CAST(_last + {k - 1} AS INT) AS span_end,
       CAST(_last - _start + {k} AS INT) AS span_words,
       CAST(_n AS INT) AS n_windows
FROM isl"""


# partner-doc cap for the attribution face: per duplicated digest, only
# the cap globally-smallest occurrence keys travel (deterministic — the
# corpus's earliest copies, which is what provenance wants), and each
# island's final partner list is re-capped after the distinct/merge.
ATTRIB_PARTNERS_CAP = 8


def dedup_exact_spans_attrib(
    docs: DataFrame, k: int = PASSAGE_WORDS, cap: int = ATTRIB_PARTNERS_CAP
) -> DataFrame:
    """Span provenance: :func:`dedup_exact_spans` geometry, each span
    annotated with WHICH other documents share it — the forensic face
    (where did this boilerplate come from? which pages syndicate this
    paragraph? which training doc leaked this benchmark passage?) that
    the reporter's bare coordinates can't answer.

    Per duplicated digest, the ``cap`` globally-smallest occurrence keys
    (the corpus's earliest copies — deterministic, and the copies
    provenance cares about) are kept; per island, the union of its
    windows' occurrence docs minus the island's own doc, distinct,
    sorted, re-capped at ``cap``. ``partner_docs`` is emitted as a
    comma-joined string ('' when every captured occurrence is
    within-document) so the value-hash oracle sees a scalar;
    ``max_window_occ`` is the hottest window's corpus-wide occurrence
    count — >> n_partners+1 flags boilerplate hotter than the cap.

    Shape at 100 TB: the reporter's two window-relation passes plus a
    per-digest ``row_number`` cap — but the cap's sort runs ONLY over the
    duplicated-window subset: the dup-digest aggregate (the reporter's
    existing agg) filters first, the surviving windows pin as a small
    materialized relation, and the occurrence-cap sort + both remaining
    joins consume that pinned subset. First drafted as row_number over
    the FULL window relation — sorting every unique window too — which
    measured 213-385 s at decade scale vs the reporter's 35 s; this
    dup-subset form removes that corpus-sized sort (SCALE.md r13). The
    cap bounds the hot-key dimension (a boilerplate digest repeated
    millions of times carries exactly ``cap`` keys + a count, never its
    row list — the mega-cell/hot-bucket bounded-state discipline);
    per-island partner state is bounded by n_windows × cap longs before
    the final distinct. Doc ids are recovered from keys by
    ``shiftright(key, 32)`` (exact integer bit-shift in both engines;
    key/2^32 through doubles would corrupt above 2^53).
    """
    from pyspark.sql import Window

    from spark_signals.checkpoint import pin

    wins = _span_wins(docs, k)
    key = F.col("doc_id") * F.lit(SPAN_POS_BASE) + F.col("pos")
    dup = (
        wins.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.min(key).alias("min_key"))
        .filter(F.col("n_occ") >= 2)
    )
    # duplicated windows only — small vs the corpus; pinned because the
    # occurrence-cap aggregate and the hit projection both consume it
    dwins = (
        wins.join(dup, "digest")
        .select("doc_id", "pos", "digest", "n_occ", "min_key", key.alias("key"))
        .transform(pin)
    )
    w = Window.partitionBy("digest").orderBy(F.col("key").asc())
    occk = (
        dwins.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .groupBy("digest")
        .agg(F.sort_array(F.collect_list("key")).alias("occ_keys"))
    )
    hits = dwins.join(occk, "digest").select(
        "doc_id",
        "pos",
        (F.col("key") == F.col("min_key")).alias("is_canon"),
        "n_occ",
        F.array_distinct(
            F.transform(F.col("occ_keys"), lambda x: F.shiftright(x, 32))
        ).alias("occ_docs"),
    )
    dw = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(dw)
    islands = (
        hits.withColumn(
            "new_span",
            F.when(prev.isNull() | (F.col("pos") > prev + k), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(dw.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("_start"),
            F.max("pos").alias("_last"),
            F.count(F.lit(1)).alias("_n"),
            F.max("n_occ").alias("max_occ"),
            F.flatten(F.collect_list("occ_docs")).alias("_praw"),
        )
    )
    partners = F.slice(
        F.sort_array(
            F.array_except(F.array_distinct("_praw"), F.array(F.col("doc_id")))
        ),
        1,
        cap,
    )
    return islands.select(
        "doc_id",
        F.col("_start").cast("int").alias("span_start"),
        (F.col("_last") + F.lit(k - 1)).cast("int").alias("span_end"),
        F.col("_n").cast("int").alias("n_windows"),
        F.col("max_occ").cast("bigint").alias("max_window_occ"),
        F.concat_ws(
            ",", F.transform(partners, lambda x: x.cast("string"))
        ).alias("partner_docs"),
        F.size(partners).cast("int").alias("n_partners"),
    )


def sql_dedup_exact_spans_attrib(
    source: str = "documents", k: int = PASSAGE_WORDS, cap: int = ATTRIB_PARTNERS_CAP
) -> str:
    """Oracle twin: DuckDB aggregates full per-digest key lists (the
    small-scale oracle needs value equality, not plan parity) and slices
    to the same cap-smallest set the Spark row_number keeps."""
    return f"""
WITH {_sql_span_win_ctes(source, k)},
wk AS (
  SELECT doc_id, pos, digest, doc_id * {SPAN_POS_BASE} + pos AS key FROM w
),
occ AS (
  SELECT digest, COUNT(*) AS n_occ, MIN(key) AS min_key,
         list_slice(list_sort(list(key)), 1, {cap}) AS occ_keys
  FROM wk GROUP BY digest HAVING COUNT(*) >= 2
),
h AS (
  SELECT wk.doc_id, wk.pos, occ.n_occ,
         list_distinct(list_transform(occ.occ_keys, x -> x >> 32)) AS occ_docs
  FROM wk JOIN occ USING (digest)
),
f AS (
  SELECT doc_id, pos, n_occ, occ_docs,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
              THEN 1 ELSE 0 END AS new_span
  FROM h
),
g AS (
  SELECT doc_id, pos, n_occ, occ_docs,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_id
  FROM f
),
isl AS (
  SELECT doc_id, span_id,
         MIN(pos) AS _start, MAX(pos) AS _last, COUNT(*) AS _n,
         MAX(n_occ) AS max_occ,
         list_slice(
           list_sort(list_filter(list_distinct(flatten(list(occ_docs))),
                                 x -> x <> doc_id)), 1, {cap}) AS partners
  FROM g GROUP BY doc_id, span_id
)
SELECT doc_id,
       CAST(_start AS INT) AS span_start,
       CAST(_last + {k - 1} AS INT) AS span_end,
       CAST(_n AS INT) AS n_windows,
       CAST(max_occ AS BIGINT) AS max_window_occ,
       COALESCE(array_to_string(partners, ','), '') AS partner_docs,
       CAST(len(partners) AS INT) AS n_partners
FROM isl"""


def dedup_exact_spans_strip(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """The rewrite face of :func:`dedup_exact_spans`: re-emit every
    document with its non-canonical duplicated spans removed.

    Keep policy (deterministic): each duplicated window digest has one
    *canonical* occurrence — its globally first (min (doc_id, pos)).
    A maximal span survives iff it contains at least one canonical window;
    otherwise the whole span is cut. Consequences: (a) every duplicated
    k-gram's content survives in exactly the document where it first
    occurs — nothing is lost from the corpus, the Lee-et-al. keep-one
    contract; (b) a span in the first-occurrence document is kept WHOLE
    (conservative: spans merging canonical and non-canonical windows keep
    both); (c) within one document, a later repeat of an earlier span is
    cut — the cross-document generalization of
    :func:`dedup_intra_doc`'s first-occurrence rule.

    Like :func:`dedup_intra_doc`, windows are COMPARED under the corpus
    token rule (ASCII-lower) but text is REBUILT from the original
    case-preserving whitespace tokens, so only inter-word whitespace
    collapses. Not idempotent in the adversarial limit: cutting an
    interior span makes its neighbors adjacent, and the NEW k-grams
    spanning that seam can in principle match elsewhere (true of
    suffix-array ExactSubstr too); a second pass converges.

    Returns (doc_id, text_dedup, n_words, n_cut_words, n_cut_spans,
    was_modified).

    Shape at 100 TB: everything up to the islands is :func:`dedup_exact_spans`
    (linear rows, row-preserving joins); the cut-interval relation is one
    doc-keyed agg over ISLAND rows (tiny), its join back to the corpus is
    row-preserving on doc_id, and the rebuild is a per-row higher-order
    filter — O(words × cut_spans) per doc with no extra shuffle over text.
    """
    return _strip_from_hits(docs, _span_hits(docs, k), k)


def _strip_from_hits(docs: DataFrame, hits: DataFrame, k: int) -> DataFrame:
    """Shared strip tail: hits → islands → cut intervals → case-preserving
    per-row rebuild (the dedup_exact_spans_strip contract).

    NULL text coalesces to an EMPTY token array before sizing: Spark's
    size(NULL) is -1 where DuckDB's len(NULL) is NULL, so without the
    coalesce the two engines diverge on n_words for NULL-text rows (the
    SQL twins coalesce the same way in their d/raw CTEs)."""
    raw_words = F.coalesce(
        F.filter(
            F.split(F.col("text"), "[ \t\n\x0b\f\r]+"), lambda w: w != ""
        ),
        F.array().cast("array<string>"),
    )
    islands = _span_islands(hits, k)
    cuts = (
        islands.filter(F.col("_keep") == 0)
        .select(
            "doc_id",
            F.struct(
                F.col("_start").alias("s"),
                (F.col("_last") + F.lit(k - 1)).alias("e"),
            ).alias("iv"),
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list("iv").alias("ivs"),
            F.count(F.lit(1)).alias("_spans"),
            F.sum(F.col("iv.e") - F.col("iv.s") + 1).alias("_cut"),
        )
    )
    base = docs.select("doc_id", raw_words.alias("raw")).join(
        cuts, "doc_id", "left"
    )
    kept = F.expr(
        "filter(raw, (w, i) -> size(filter(ivs, x -> i >= x.s AND i <= x.e)) = 0)"
    )
    cut_words = F.coalesce(F.col("_cut"), F.lit(0)).cast("int")
    return base.select(
        "doc_id",
        F.when(F.col("ivs").isNull(), F.concat_ws(" ", F.col("raw")))
        .otherwise(F.concat_ws(" ", kept))
        .alias("text_dedup"),
        F.size("raw").cast("int").alias("n_words"),
        cut_words.alias("n_cut_words"),
        F.coalesce(F.col("_spans"), F.lit(0)).cast("int").alias("n_cut_spans"),
        (cut_words > 0).alias("was_modified"),
    )


def sql_dedup_exact_spans_strip(
    source: str = "documents", k: int = PASSAGE_WORDS
) -> str:
    return f"""
WITH {_sql_span_ctes(source, k)},
cuts AS (
  SELECT doc_id,
         list(struct_pack(s := _start, e := _last + {k - 1})) AS ivs,
         COUNT(*) AS _spans,
         SUM(_last + {k - 1} - _start + 1) AS _cut
  FROM isl WHERE _keep = 0 GROUP BY doc_id
)
SELECT d.doc_id,
       -- COALESCE: DuckDB's array_to_string over an all-cut (empty) list
       -- yields NULL where Spark's concat_ws yields '' (the known
       -- empty-list divergence, SCALE.md determinism notes)
       COALESCE(CASE WHEN c.ivs IS NULL THEN array_to_string(d.raw, ' ')
            ELSE array_to_string(
              list_filter(d.raw, (w, i) -> len(list_filter(c.ivs,
                x -> (i-1) >= x.s AND (i-1) <= x.e)) = 0), ' ')
       END, '') AS text_dedup,
       CAST(len(d.raw) AS INT) AS n_words,
       CAST(COALESCE(c._cut, 0) AS INT) AS n_cut_words,
       CAST(COALESCE(c._spans, 0) AS INT) AS n_cut_spans,
       COALESCE(c._cut, 0) > 0 AS was_modified
FROM d LEFT JOIN cuts c USING (doc_id)"""


def span_index(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """(digest, min_key): the persistable exact-span window index of a
    corpus snapshot — one row per DISTINCT window digest carrying its
    earliest occurrence key (doc_id * 2^32 + pos). At warehouse scale
    store it bucketed on digest (io.sinks.write_bucketed) so batch probes
    shuffle only the batch side. Readers may hold MULTIPLE rows per digest
    (append-only deltas); every consumer min-merges first."""
    key = F.col("doc_id") * F.lit(SPAN_POS_BASE) + F.col("pos")
    return (
        _span_wins(docs, k)
        .groupBy("digest")
        .agg(F.min(key).alias("min_key"))
    )


def dedup_spans_incremental(
    new_docs: DataFrame, index: DataFrame, k: int = PASSAGE_WORDS
) -> tuple[DataFrame, DataFrame]:
    """Strip an incoming batch's duplicated spans against a persisted
    window index without re-processing history. Returns
    ``(stripped, index_delta)``:

    * ``stripped`` — every batch row in the dedup_exact_spans_strip
      schema. EXACT-EQUIVALENCE INVARIANT (the lane's contract, pinned by
      tests): the batch's rows are exactly what the GLOBAL
      :func:`dedup_exact_spans_strip` over (history ∪ batch) emits for
      the batch's doc_ids — regardless of how history and batch doc_ids
      interleave. A batch occurrence is duplicated iff its digest occurs
      >= 2 times in the batch OR at all in history (n_batch + n_hist >= 2
      given n_batch >= 1 — the global count rule); its canonical key is
      least(history min, batch min) — the global min. No probabilistic
      slack anywhere: this is the exact operator, incrementalized. The
      standard already-admitted caveat applies in BOTH directions: a
      later duplicate cannot retro-cut an earlier emission, and — specific
      to the island-merge policy — it also cannot retro-KEEP one (a
      future duplicate can hand an already-cut island a canonical
      neighbor it would have merged with in a full recompute; the planted
      test pins this asymmetry). Re-running the corpus through
      :func:`dedup_exact_spans_strip` is the compaction path, exactly
      like the digest lane's snapshot rebuild.
    * ``index_delta`` — (digest, min_key) rows to APPEND: digests the
      index lacks, plus digests whose batch min UNDERCUTS the stored min
      (out-of-order arrivals); consumers min-merge, so appends commute.

    Replay-idempotent: re-running an admitted batch against the updated
    index emits byte-identical rows (its own canonical keys match the
    stored mins, so nothing new is cut) and an empty delta — with
    batch-partition-overwrite storage the lane is exactly-once end to end.

    PRECONDITION (unique doc_id per corpus): replay idempotence rests on
    the hist_min == bmin carve-out — a batch occurrence whose key EQUALS
    the stored canonical is read as "this occurrence IS the stored one
    replayed", not as a duplicate of it. A pipeline that re-ingests a
    genuinely NEW copy of a document under an already-indexed doc_id
    (same digest at the same position) is indistinguishable from a replay
    and is silently treated as unique; the exact-equivalence invariant
    therefore holds for fresh doc_ids and exact replays only. Same
    identity discipline as the digest lane (doc_id is the corpus key,
    batch_id-partition overwrite dedups redelivery); assign fresh doc_ids
    to genuinely new ingests.

    Shape at 100 TB: batch windows are O(batch tokens); the index probe is
    ONE digest equi-join (batch-side shuffle only against a
    digest-bucketed index); islands/rebuild are the batch-local strip
    tail. History text is never touched — the index alone carries enough
    to reproduce the global answer.
    """
    key = F.col("doc_id") * F.lit(SPAN_POS_BASE) + F.col("pos")
    wins_b = _span_wins(new_docs, k)
    agg_b = wins_b.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_b"), F.min(key).alias("bmin")
    ).persist()
    try:
        idx = index.groupBy("digest").agg(F.min("min_key").alias("hist_min"))
        joined = agg_b.join(idx, "digest", "left")
        info = joined.select(
            "digest",
            "bmin",
            F.least(F.coalesce(F.col("hist_min"), F.col("bmin")), F.col("bmin")).alias(
                "global_min"
            ),
            (
                (F.col("n_b") >= 2)
                | (F.col("hist_min").isNotNull() & (F.col("hist_min") != F.col("bmin")))
            ).alias("dup_digest"),
            (
                F.col("hist_min").isNull() | (F.col("bmin") < F.col("hist_min"))
            ).alias("fresh"),
        )
        # per-occurrence hit rule: within-batch dup, or a history occurrence
        # under a DIFFERENT key (hist_min == bmin with n_b == 1 is the
        # replayed-unique case — its only occurrence IS the stored canonical)
        hits = (
            wins_b.join(info.filter(F.col("dup_digest")), "digest")
            .select("doc_id", "pos", (key == F.col("global_min")).alias("is_canon"))
        )
        stripped = _strip_from_hits(new_docs, hits, k).transform(pin)
        delta = (
            info.filter(F.col("fresh"))
            .select("digest", F.col("bmin").alias("min_key"))
            .transform(pin)
        )
        return stripped, delta
    finally:
        agg_b.unpersist()


def dedup_spans_incr_snapshot(docs: DataFrame, k: int = PASSAGE_WORDS) -> DataFrame:
    """Driver-checkable face: the standard snapshot/batch split (batch =
    doc_id % INCR_SPLIT_MOD == 0), batch stripped against the snapshot's
    span index. By the exact-equivalence invariant the oracle is simply
    the GLOBAL strip restricted to batch doc_ids — the strongest check the
    lane can get (value-identical to the non-incremental operator)."""
    snapshot = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    stripped, _delta = dedup_spans_incremental(batch, span_index(snapshot, k), k)
    return stripped


def sql_dedup_spans_incr_snapshot(
    source: str = "documents", k: int = PASSAGE_WORDS
) -> str:
    """The global strip restricted to the batch split — exact by the
    equivalence invariant (see dedup_spans_incremental)."""
    inner = sql_dedup_exact_spans_strip(source, k)
    return f"""
WITH _global AS ({inner})
SELECT * FROM _global WHERE doc_id % {INCR_SPLIT_MOD} = 0"""


# ------------------------------------------------------ incremental dedup
def digest_index(docs: DataFrame) -> DataFrame:
    """(content_hash, canonical_doc_id) — the persistable exact-dedup index
    for a corpus snapshot: one row per distinct content digest."""
    return (
        docs.select("doc_id", content_digest(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"))
    )


def dedup_incremental(
    new_docs: DataFrame, index: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Dedup an incoming batch against an existing digest index WITHOUT
    touching historical documents — the production shape for a continuously
    growing corpus (a nightly batch never re-dedups the first 100 TB).

    Returns ``(survivors, index_delta)``:

    * ``survivors`` — rows of ``new_docs`` whose digest is new to both the
      index AND this batch (within-batch dedup keeps the min doc_id).
    * ``index_delta`` — the new (content_hash, canonical_doc_id) rows to
      APPEND to the index. Appending the delta (never rewriting the index)
      keeps the maintenance write O(batch), not O(corpus).

    Shape at scale: the batch digests map-side; the anti join against the
    index shuffles on content_hash — store the index bucketed on
    content_hash (``io.sinks.write_bucketed``) and only the (small) batch
    side shuffles, the index side reads bucket-local. Idempotent: re-running
    the same batch against the updated index yields zero survivors and an
    empty delta.
    """
    hashed = new_docs.withColumn("content_hash", content_digest(F.col("text")))
    # within-batch canonical first (min doc_id per digest), then anti-join
    # the historical index
    batch_canon = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_doc_id")
    )
    fresh = batch_canon.join(
        index.select("content_hash"), "content_hash", "left_anti"
    )
    survivors = hashed.join(
        fresh.select(
            "content_hash", F.col("canonical_doc_id").alias("_keep_id")
        ),
        "content_hash",
    ).filter(F.col("doc_id") == F.col("_keep_id")).drop("_keep_id", "content_hash")
    return survivors, fresh


# Driver-checkable face of the incremental path: a deterministic 80/20
# snapshot/batch split of `documents` (batch = doc_id % INCR_SPLIT_MOD == 0)
# stands in for "the first 100 TB" vs "tonight's ingest". The checked result
# is the batch's survivors — new to both the historical digest index and the
# batch itself.
INCR_SPLIT_MOD = 5


def dedup_incremental_snapshot(docs: DataFrame) -> DataFrame:
    index = digest_index(docs.filter(F.col("doc_id") % INCR_SPLIT_MOD != 0))
    batch = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    survivors, _delta = dedup_incremental(batch, index)
    return survivors


SQL_DEDUP_INCREMENTAL = f"""
WITH batch AS (
  SELECT *, {SQL_CONTENT_DIGEST.format(col="text")} AS content_hash
  FROM documents WHERE doc_id % {INCR_SPLIT_MOD} = 0
),
idx AS (
  SELECT {SQL_CONTENT_DIGEST.format(col="text")} AS content_hash
  FROM documents WHERE doc_id % {INCR_SPLIT_MOD} <> 0
  GROUP BY 1
),
canon AS (
  SELECT content_hash, min(doc_id) AS keep_id FROM batch GROUP BY content_hash
),
fresh AS (
  SELECT c.content_hash, c.keep_id FROM canon c
  WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.content_hash = c.content_hash)
)
SELECT b.doc_id, b.text, b.lang, b.source, b.n_chars
FROM batch b JOIN fresh f
  ON b.content_hash = f.content_hash AND b.doc_id = f.keep_id"""


# ------------------------------------------- corpus boilerplate stripping
BOILERPLATE_MIN_OCC = 3  # a passage this common corpus-wide is chrome


def strip_boilerplate_passages(
    docs: DataFrame, k: int = PASSAGE_WORDS, min_occ: int = BOILERPLATE_MIN_OCC
) -> DataFrame:
    """Remove passages that repeat across the CORPUS — the C4/Dolma
    frequent-lines pass (nav chrome, cookie banners, boilerplate footers
    appear on thousands of pages; their k-word passages digest
    identically): (doc_id, text_strip, n_passages, n_kept, was_modified).

    The corpus-wide complement of :func:`dedup_intra_doc` (which strips
    repeats WITHIN a page): a passage is dropped from EVERY document when
    its digest occurs ≥ ``min_occ`` times corpus-wide. Comparison runs
    under the corpus token rule (ASCII-lower digest, the dedup_passages
    digest exactly); the surviving text is rebuilt from case-preserving
    tokens — the same hygiene contract as dedup_intra_doc, so callers
    substitute on ``was_modified``.

    Shape at 100 TB: one digest-count aggregate (map-side combined; only
    32-byte digests + counts move), the ≥min_occ digest set joined back
    onto the exploded passage stream, then ONE doc-keyed aggregate
    rebuilds each text via sort_array over its own ≤p passages. Two
    digest-keyed shuffles + one doc-keyed — dedup_passages' exact shape
    plus the rebuild.
    """
    raw_words = F.filter(F.split(F.col("text"), "[ \t\n\x0b\f\r]+"), lambda w: w != "")
    base = (
        spread_small_input(docs)
        .withColumn("words", raw_words)
        .filter(F.size("words") > 0)
    )
    chunks = F.expr(
        f"transform(sequence(0, (size(words)-1) div {k}),"
        f" i -> concat_ws(' ', slice(words, i*{k}+1, {k})))"
    )
    with_chunks = base.select("doc_id", chunks.alias("chunks"))
    exploded = with_chunks.select(
        "doc_id", F.posexplode("chunks").alias("idx", "chunk")
    ).withColumn("digest", F.md5(ascii_lower(F.col("chunk"))))
    occ = exploded.groupBy("digest").agg(F.count(F.lit(1)).alias("n_occ"))
    flagged = exploded.join(occ, "digest").select(
        "doc_id",
        "idx",
        "chunk",
        (F.col("n_occ") >= F.lit(min_occ)).alias("drop"),
    )
    entry = F.struct(
        F.col("idx").alias("idx"),
        F.when(~F.col("drop"), F.col("chunk")).alias("chunk"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(entry)).alias("ordered"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.filter(F.col("ordered.chunk"), lambda c: c.isNotNull())
            ).alias("text_strip"),
            F.size("ordered").cast("int").alias("n_passages"),
            F.size(
                F.filter(F.col("ordered.chunk"), lambda c: c.isNotNull())
            ).cast("int").alias("n_kept"),
        )
        .withColumn("was_modified", F.col("n_kept") < F.col("n_passages"))
    )


def sql_strip_boilerplate(
    source: str = "documents",
    k: int = PASSAGE_WORDS,
    min_occ: int = BOILERPLATE_MIN_OCC,
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
c AS (
  SELECT doc_id,
         list_transform(range(0, ((len(words)-1) // {k}) + 1),
           i -> array_to_string(words[(i*{k}+1):((i+1)*{k})], ' ')) AS chunks
  FROM d WHERE len(words) > 0
),
e AS (
  SELECT doc_id, i - 1 AS idx, chunks[i] AS chunk,
         md5(translate(chunks[i], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS digest
  FROM (SELECT doc_id, chunks, unnest(range(1, len(chunks) + 1)) AS i FROM c)
),
occ AS (SELECT digest, COUNT(*)::BIGINT AS n_occ FROM e GROUP BY digest),
f AS (
  SELECT e.doc_id, e.idx, e.chunk, occ.n_occ >= {min_occ} AS do_drop
  FROM e JOIN occ USING (digest)
)
SELECT doc_id,
       -- COALESCE: a fully-boilerplate page keeps ZERO passages, and DuckDB
       -- array_to_string([]) is NULL where Spark concat_ws is '' (the
       -- fuzzer-documented divergence; surfaced live at sf0.1)
       COALESCE(array_to_string(
         list_filter(list(CASE WHEN do_drop THEN NULL ELSE chunk END ORDER BY idx),
                     c -> c IS NOT NULL), ' '), '') AS text_strip,
       CAST(COUNT(*) AS INT) AS n_passages,
       CAST(COUNT(*) FILTER (WHERE NOT do_drop) AS INT) AS n_kept,
       COUNT(*) FILTER (WHERE NOT do_drop) < COUNT(*) AS was_modified
FROM f
GROUP BY doc_id"""


# -------------------------------------------- incremental NEAR-dup dedup
# The signature-level twin of dedup_incremental (r7 verdict #4): the
# persisted artifact is the MinHash BAND index — (band, k1, k2, doc_id),
# appendable exactly like the digest index — so a nightly batch finds its
# near-dup candidates against the first 100 TB by EQUI-JOINING band keys,
# never by re-shingling history. Only the candidate historical documents
# (an O(duplicate-density) set, not O(corpus)) are re-read for the exact
# Jaccard verification, preserving LSH's candidate-only contract across
# the incremental boundary.


def band_index(docs: DataFrame) -> DataFrame:
    """(band, k1, k2, doc_id): the persistable MinHash band index of a
    corpus snapshot — NUM_BANDS rows per document. At warehouse scale
    store it bucketed on (k1, k2) (io.sinks.write_bucketed) so the batch
    probe shuffles only the batch side."""
    return minhash_bands(docs).select("band", "k1", "k2", "doc_id")


def dedup_incremental_neardup(
    new_docs: DataFrame,
    index: DataFrame,
    snapshot_docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup an incoming batch against a persisted band index without
    re-processing history. Returns ``(survivors, index_delta)``:

    * ``survivors`` — batch rows that verified against NO historical
      candidate and NO smaller-id batch document (greedy first-wins, the
      same deterministic rule either engine derives from the pair list).
    * ``index_delta`` — the survivors' band rows to APPEND to the index.

    ``snapshot_docs`` is the historical corpus relation; it is touched
    ONLY via a semi-join on the candidate doc_ids the band probe surfaced
    — at 100 TB that read is O(candidates) rowgroups of a doc_id-sorted
    store, not a corpus scan. Shape: batch shingles+signatures persist
    once (the dedup_minhash_lsh contract); the history probe is one band
    equi-join against the index; verification joins shingle sets for
    candidate pairs only. Idempotent like the exact path: replaying an
    admitted batch against the updated index yields zero survivors."""
    sh_b = _km_row_sigs(
        _with_shingles(new_docs).select("doc_id", "shingles"),
        "shingles",
        NUM_HASHES,
        "shingles",
    ).persist()
    try:
        bands_b = _band_keys(sh_b)
        hist_cand = (
            bands_b.join(
                index.select(
                    "band", "k1", "k2", F.col("doc_id").alias("doc_old")
                ),
                ["band", "k1", "k2"],
            )
            .select(F.col("doc_id").alias("doc_new"), "doc_old")
            .distinct()
        )
        # shingle ONLY the candidate historical docs (semi-join pushdown)
        old_sh = _with_shingles(
            snapshot_docs.join(
                hist_cand.select(F.col("doc_old").alias("doc_id")).distinct(),
                "doc_id",
                "left_semi",
            )
        ).select("doc_id", "shingles")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = inter.cast("double") / union
        hist_dups = (
            hist_cand.join(
                sh_b.select(F.col("doc_id").alias("doc_new"), F.col("shingles").alias("sh_a")),
                "doc_new",
            )
            .join(
                old_sh.select(F.col("doc_id").alias("doc_old"), F.col("shingles").alias("sh_b")),
                "doc_old",
            )
            .filter(jac >= F.lit(threshold))
            .select(F.col("doc_new").alias("doc_id"))
            .distinct()
        )
        # within-batch: greedy first-wins — any doc that verifies against a
        # smaller-id batch doc drops (doc_b of every verified pair)
        batch_dups = (
            _minhash_pairs(sh_b)
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        drops = hist_dups.unionByName(batch_dups).distinct()
        survivors = new_docs.join(drops, "doc_id", "left_anti").transform(pin)
        delta = (
            bands_b.join(
                survivors.select("doc_id"), "doc_id", "left_semi"
            )
            .select("band", "k1", "k2", "doc_id")
            .transform(pin)
        )
        return survivors, delta
    finally:
        sh_b.unpersist()


def dedup_incr_neardup_snapshot(docs: DataFrame) -> DataFrame:
    """Driver-checkable face: the same 80/20 snapshot/batch split as the
    exact incremental path, near-dup flavor — the checked result is the
    batch's near-dup survivors."""
    snapshot = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    idx = band_index(snapshot)
    survivors, _delta = dedup_incremental_neardup(batch, idx, snapshot)
    return survivors


def _sql_minhash_ctes(rel: str, prefix: str) -> str:
    """Shingle → signature → band CTEs over relation ``rel`` (mirrors
    _km_row_sigs/_band_keys; same md5 hex lanes and KM family as
    SQL_DEDUP_MINHASH, scoped with a name ``prefix`` so the snapshot and
    batch chains compose in one statement)."""
    p = prefix
    return f"""{p}d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {rel}
),
{p}sh AS (
  SELECT doc_id, list_distinct({SQL_SHINGLES(3)}) AS shingles FROM {p}d
),
{p}g AS (
  SELECT doc_id,
         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
  FROM (SELECT doc_id, unnest(shingles) AS s FROM {p}sh)
),
{p}sig AS (
  SELECT doc_id,
    {", ".join(f"min((h1 + {i + 1} * h2) % {MINHASH_P}) AS m{i}" for i in range(NUM_HASHES))}
  FROM {p}g GROUP BY doc_id
),
{p}bands AS (
  SELECT doc_id, b AS band,
         [{", ".join(f"m{2 * b}" for b in range(NUM_BANDS))}][b + 1] AS k1,
         [{", ".join(f"m{2 * b + 1}" for b in range(NUM_BANDS))}][b + 1] AS k2
  FROM {p}sig, (SELECT unnest(range(0, {NUM_BANDS})) AS b)
)"""


SQL_DEDUP_INCR_NEARDUP = f"""
WITH snapd AS (SELECT * FROM documents WHERE doc_id % {INCR_SPLIT_MOD} <> 0),
batchd AS (SELECT * FROM documents WHERE doc_id % {INCR_SPLIT_MOD} = 0),
{_sql_minhash_ctes("snapd", "s_")},
{_sql_minhash_ctes("batchd", "b_")},
hist_cand AS (
  SELECT DISTINCT b.doc_id AS doc_new, s.doc_id AS doc_old
  FROM b_bands b JOIN s_bands s
    ON b.band = s.band AND b.k1 = s.k1 AND b.k2 = s.k2
),
hist_dups AS (
  SELECT DISTINCT doc_new AS doc_id
  FROM hist_cand c
  JOIN b_sh a ON a.doc_id = c.doc_new
  JOIN s_sh o ON o.doc_id = c.doc_old
  WHERE CAST(len(list_intersect(a.shingles, o.shingles)) AS DOUBLE)
      / (len(a.shingles) + len(o.shingles) - len(list_intersect(a.shingles, o.shingles)))
      >= {JACCARD_THRESHOLD}
),
batch_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM b_bands a JOIN b_bands b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
  WHERE a.doc_id < b.doc_id
),
batch_dups AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM batch_cand c
  JOIN b_sh sa ON sa.doc_id = c.doc_a
  JOIN b_sh sb ON sb.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))
      >= {JACCARD_THRESHOLD}
)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM batchd d
WHERE d.doc_id NOT IN (SELECT doc_id FROM hist_dups)
  AND d.doc_id NOT IN (SELECT doc_id FROM batch_dups)"""


# ----------------------------------------------------------- winnowing
# MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
# "Winnowing: Local Algorithms for Document Fingerprinting"): hash every
# char k-gram of the normalized stream, then keep the MINIMUM hash of every
# window of w consecutive k-gram hashes. Guarantee: any substring shared by
# two documents of length >= WINNOW_K + WINNOW_W - 1 chars contributes at
# least one SHARED fingerprint — a detection floor MinHash/SimHash (global,
# probabilistic) cannot give. This is the rolling-hash fingerprint family
# the reference lacks entirely (its repo has no dedup surface; north-star
# scope like the rest of datapipe/).
WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (guarantee threshold = k + w - 1 = 11 chars)
WINNOW_MIN_SHARED = 3  # pairs must share >= this many fingerprints
# Resemblance floor: shared 11-char runs are common background noise in any
# same-domain corpus (measured sf0.01: 72k pairs share >=3 fingerprints but
# only the 25 planted near-dups exceed resemblance 0.15 — the next
# background pair sits below 0.1). The floor is what makes the report a
# near-dup list rather than a shared-phrase census; it matches the
# JACCARD_THRESHOLD=0.2 the MinHash family verifies at.
WINNOW_MIN_RESEMBLANCE = 0.2
# Boilerplate/skew guard (standard MOSS practice): a fingerprint present in
# more than this many documents is template noise, not copy signal — drop
# it BEFORE pair generation. This also bounds the per-key pair fanout at
# C(cap, 2), so the hottest fingerprint key can never produce more than
# ~1.2k pairs regardless of corpus size: the blocking stays O(collisions).
WINNOW_FP_MAX_DOCS = 50


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """doc_id → distinct winnowing fingerprints over the lowercased,
    whitespace-collapsed char stream.

    Zero-shuffle: the k-gram md5 array and the window-min selection are
    chained higher-order functions in one Project on the scan. Each k-gram
    is hashed ONCE (the window pass slices the precomputed hash array), so
    per-row cost is O(len·w) string compares after O(len) md5s; w is a
    small constant, i.e. O(len) like every other per-row text stage. Docs
    shorter than k chars fingerprint as md5(whole text); shorter than
    k + w - 1 contribute their single global min.
    """
    norm = F.trim(F.regexp_replace(ascii_lower(F.col("text")), "[ \t\n\x0b\f\r]+", " "))
    base = spread_small_input(docs).select("doc_id", norm.alias("norm_text"))
    hashed = base.withColumn(
        "h",
        F.expr(
            f"CASE WHEN length(norm_text) >= {k} THEN "
            f"transform(sequence(1, length(norm_text) - {k - 1}), "
            f"i -> md5(substring(norm_text, i, {k}))) "
            f"ELSE array(md5(norm_text)) END"
        ),
    )
    fps = F.expr(
        f"CASE WHEN size(h) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size(h) - {w - 1}), "
        f"j -> array_min(slice(h, j, {w})))) "
        f"ELSE array(array_min(h)) END"
    )
    return hashed.select("doc_id", fps.alias("fingerprints"))


def winnow_fingerprint_pairs(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    min_resemblance: float = WINNOW_MIN_RESEMBLANCE,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints.

    (doc_a, doc_b, shared_fps, n_fps_a, n_fps_b, resemblance) for every
    pair sharing >= ``min_shared`` fingerprints, where resemblance is the
    Jaccard estimate shared / (n_a + n_b - shared) over fingerprint sets.

    Shape at 100 TB: the fingerprint long-form aggregates TWICE on the
    same key — (1a) a count-only pass whose survivors (2 <= count <=
    ``fp_max_docs``) semi-join back, THEN (1b) the per-key doc list
    collects over surviving keys only, so the ``collect_list`` buffer
    never materializes a hot key: a template fingerprint present in
    millions of documents is dropped by the count FILTER before any list
    exists (the count pass is map-side-combined longs, safe at any skew).
    Pair expansion is then a per-row higher-order function over a <= cap
    array (never a self-join of an unbounded bucket: the hottest
    surviving key emits C(cap,2) pairs, a constant), and (2) a final
    groupBy(doc_a, doc_b) counts shared fingerprints — output is O(true
    near-dup pairs). No all-pairs relation exists at any stage, and no
    aggregation buffer exceeds ``fp_max_docs`` structs.

    Lifecycle: the per-doc fingerprint relation is PERSISTED for the
    call and the (small) pair relation returned materialized — the same
    pinned-for-the-call shape as dedup_minhash_lsh — because both the
    count pass and the collect pass consume it and the winnowing md5
    chain is the expensive stage (recomputing it doubled the query wall
    time when measured at sf0.01). At cluster scale set
    spark.signals.checkpointDir (checkpoint.pin's durability switch).
    """
    sized = winnow_fingerprints(docs, k, w).select(
        "doc_id",
        F.size("fingerprints").cast("long").alias("n_fps"),
        "fingerprints",
    ).persist()
    try:
        return _winnow_pairs_from_sized(
            sized, min_shared, min_resemblance, fp_max_docs
        ).transform(pin)
    finally:
        sized.unpersist()


def _winnow_pairs_from_sized(
    sized: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    min_resemblance: float = WINNOW_MIN_RESEMBLANCE,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
) -> DataFrame:
    """The lazy pair plan over a (doc_id, n_fps, fingerprints) relation —
    split out so tests can pin the plan shape pre-materialization."""
    from spark_signals.datapipe.util import explode_strings

    # explode via the concat_ws→split round-trip: Generate over a
    # higher-order-function-built array re-evaluates the whole winnowing
    # chain per OUTPUT row (O(fps²) md5s — measured minutes vs seconds on
    # 500 docs); see explode_strings.
    long_form = explode_strings(sized, F.col("fingerprints"), "fp", "doc_id", "n_fps")
    # hot-key guard: count first (constant-size aggregation state), keep
    # only collision keys under the cap, and only THEN collect the doc
    # lists — the list aggregation never sees a boilerplate fingerprint.
    kept_fps = (
        long_form.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs_fp"))
        .filter((F.col("n_docs_fp") >= 2) & (F.col("n_docs_fp") <= fp_max_docs))
        .select("fp")
    )
    grouped = (
        long_form.join(kept_fps, "fp", "left_semi")
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n_fps"))).alias("ds"))
    )
    # sort_array orders by doc_id (first struct field), so the nested
    # transform below emits each unordered pair exactly once with
    # doc_a < doc_b.
    pair_arr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x.doc_id AS doc_a, x.n_fps AS n_a, "
        "y.doc_id AS doc_b, y.n_fps AS n_b))))"
    )
    exploded = grouped.select(F.explode(pair_arr).alias("p")).select("p.*")
    agg = exploded.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("shared_fps"),
        F.min("n_a").alias("n_fps_a"),
        F.min("n_b").alias("n_fps_b"),
    )
    resemblance = F.col("shared_fps").cast("double") / (
        F.col("n_fps_a") + F.col("n_fps_b") - F.col("shared_fps")
    )
    return (
        agg.filter(F.col("shared_fps") >= min_shared)
        .withColumn("resemblance", resemblance)
        .filter(F.col("resemblance") >= min_resemblance)
        .select("doc_a", "doc_b", "shared_fps", "n_fps_a", "n_fps_b", "resemblance")
    )


def sql_winnow_pairs(
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    min_resemblance: float = WINNOW_MIN_RESEMBLANCE,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
) -> str:
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    return f"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm_text
  FROM documents
),
h AS (
  SELECT doc_id,
         CASE WHEN length(norm_text) >= {k}
              THEN list_transform(range(1, length(norm_text) - {k - 2}),
                                  i -> md5(substr(norm_text, i, {k})))
              ELSE [md5(norm_text)] END AS h
  FROM d
),
fp AS (
  SELECT doc_id,
         CASE WHEN len(h) >= {w}
              THEN list_distinct(list_transform(range(1, len(h) - {w - 2}),
                                 j -> list_min(list_slice(h, j, j + {w - 1}))))
              ELSE [list_min(h)] END AS fps
  FROM h
),
x AS (SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps, unnest(fps) AS fp FROM fp),
kept AS (SELECT fp FROM x GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND {fp_max_docs}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_fps AS n_a, b.n_fps AS n_b
  FROM x a JOIN x b USING (fp) JOIN kept USING (fp)
  WHERE a.doc_id < b.doc_id
),
agg AS (
  SELECT doc_a, doc_b, COUNT(*) AS shared_fps,
         MIN(n_a) AS n_fps_a, MIN(n_b) AS n_fps_b
  FROM pairs GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared_fps, n_fps_a, n_fps_b,
       CAST(shared_fps AS DOUBLE) / (n_fps_a + n_fps_b - shared_fps) AS resemblance
FROM agg
WHERE shared_fps >= {min_shared}
  AND CAST(shared_fps AS DOUBLE) / (n_fps_a + n_fps_b - shared_fps) >= {min_resemblance}"""


def winnow_zipf_report(
    docs: DataFrame,
    langs: list[str] | None = None,
    v: int | None = None,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    min_resemblance: float = WINNOW_MIN_RESEMBLANCE,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
) -> DataFrame:
    """Per-language corpus-QA report chaining the two fingerprint-family
    closers over the same shard: token-distribution statistics
    (text.zipf_lang_stats' columns) joined with near-dup density from the
    full winnowing pair relation (n_neardup_pairs, n_neardup_docs,
    sum_resemblance_u).

    Consolidation face for the driver contract: one checked slot carries
    the evidence of winnow_neardup_pairs AND zipf_lang_stats — the zipf
    columns pin the whole tokenize → count → OLS chain per language, and
    the pair columns change if ANY winnowing pair (membership or
    resemblance) drifts. A pair is counted under each DISTINCT endpoint
    shard (same-shard pairs once, cross-shard pairs once per side), so
    every pair contributes to the hash. ``sum_resemblance_u`` sums the
    1e-6-gridded int64 resemblance per pair — an exact integer, so the
    aggregate is partitioning/order independent where a double sum would
    not be.
    """
    from spark_signals.datapipe.text import ZIPF_LANGS, ZIPF_TOP_V, zipf_lang_stats

    langs = ZIPF_LANGS if langs is None else langs
    v = ZIPF_TOP_V if v is None else v
    zipf = zipf_lang_stats(docs, langs, v)
    pairs = winnow_fingerprint_pairs(
        docs, k, w, min_shared, min_resemblance, fp_max_docs
    )
    shard = F.when(F.col("lang").isin(list(langs)), F.col("lang")).otherwise(
        F.lit("other")
    )
    dl = docs.select("doc_id", shard.alias("shard"))
    res_u = F.floor(
        F.col("resemblance") * F.lit(1e6) + F.lit(0.5000001)
    ).cast("long")
    pl = (
        pairs.select("doc_a", "doc_b", res_u.alias("res_u"))
        .join(
            dl.select(
                F.col("doc_id").alias("doc_a"), F.col("shard").alias("shard_a")
            ),
            "doc_a",
        )
        .join(
            dl.select(
                F.col("doc_id").alias("doc_b"), F.col("shard").alias("shard_b")
            ),
            "doc_b",
        )
    )
    long_form = pl.select(
        "res_u",
        F.explode(F.array_distinct(F.array("shard_a", "shard_b"))).alias("lang"),
    )
    pagg = long_form.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neardup_pairs"),
        F.sum("res_u").cast("bigint").alias("sum_resemblance_u"),
    )
    endpoints = pl.select(
        F.col("doc_a").alias("doc_id"), F.col("shard_a").alias("lang")
    ).unionByName(
        pl.select(F.col("doc_b").alias("doc_id"), F.col("shard_b").alias("lang"))
    )
    dagg = (
        endpoints.distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neardup_docs"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        zipf.join(pagg, "lang", "left")
        .join(dagg, "lang", "left")
        .select(
            zipf["*"],
            F.coalesce("n_neardup_pairs", zero).alias("n_neardup_pairs"),
            F.coalesce("n_neardup_docs", zero).alias("n_neardup_docs"),
            F.coalesce("sum_resemblance_u", zero).alias("sum_resemblance_u"),
        )
    )


def sql_winnow_zipf_report(
    langs: list[str] | None = None,
    v: int | None = None,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    min_resemblance: float = WINNOW_MIN_RESEMBLANCE,
    fp_max_docs: int = WINNOW_FP_MAX_DOCS,
) -> str:
    """Oracle twin of :func:`winnow_zipf_report`."""
    from spark_signals.datapipe.text import (
        ZIPF_LANGS,
        ZIPF_TOP_V,
        sql_zipf_lang_stats,
    )

    langs = ZIPF_LANGS if langs is None else langs
    v = ZIPF_TOP_V if v is None else v
    in_list = ", ".join(f"'{l}'" for l in langs)
    return f"""
WITH z AS ({sql_zipf_lang_stats(langs, v)}),
wp AS ({sql_winnow_pairs(k, w, min_shared, min_resemblance, fp_max_docs)}),
dl AS (
  SELECT doc_id,
         CASE WHEN lang IN ({in_list}) THEN lang ELSE 'other' END AS shard
  FROM documents
),
pl AS (
  SELECT CAST(floor(wp.resemblance * 1e6 + 0.5000001) AS BIGINT) AS res_u,
         wp.doc_a, wp.doc_b, a.shard AS shard_a, b.shard AS shard_b
  FROM wp JOIN dl a ON wp.doc_a = a.doc_id JOIN dl b ON wp.doc_b = b.doc_id
),
lf AS (
  SELECT res_u, unnest(list_distinct([shard_a, shard_b])) AS lang FROM pl
),
pagg AS (
  SELECT lang, count(*)::BIGINT AS n_neardup_pairs,
         SUM(res_u)::BIGINT AS sum_resemblance_u
  FROM lf GROUP BY lang
),
dagg AS (
  SELECT lang, count(*)::BIGINT AS n_neardup_docs FROM (
    SELECT DISTINCT doc_id, lang FROM (
      SELECT doc_a AS doc_id, shard_a AS lang FROM pl
      UNION ALL
      SELECT doc_b AS doc_id, shard_b AS lang FROM pl
    )
  ) GROUP BY lang
)
SELECT z.*,
       COALESCE(p.n_neardup_pairs, 0)::BIGINT AS n_neardup_pairs,
       COALESCE(d.n_neardup_docs, 0)::BIGINT AS n_neardup_docs,
       COALESCE(p.sum_resemblance_u, 0)::BIGINT AS sum_resemblance_u
FROM z LEFT JOIN pagg p USING (lang) LEFT JOIN dagg d USING (lang)"""


# ------------------------------------------- incremental embedding near-dup
# The EMBEDDING twin of the media lane (multimodal.media_phash_incremental)
# and the third face of the band-index family: continuous vector ingestion
# against a persisted sign-LSH bucket index, so a nightly embedding drop
# near-dups against the admitted history in O(batch) bucket probes — never
# an all-pairs or a history re-scan. The index rows carry the vectors
# themselves (a vector index IS its vectors — 64 floats/row here), so
# verification is one exact-cosine pass over bucket-colliding candidates.
# Recall follows the sign-LSH collision probability (1 - theta/pi)^bits,
# the identical trade the batch ann_lsh_hyperplane_pairs face documents;
# raising recall is adding rotated hyperplane tables, not scanning more.


def embedding_lsh_index(embeddings: DataFrame) -> DataFrame:
    """(bucket, vec_id, embedding): the persistable sign-LSH index of a
    vector snapshot — one row per vector, bucket = the N_HYPERPLANES-bit
    hyperplane signature (similarity._hyperplane_sig_expr, the exact
    blocking key of the checked batch LSH face). At warehouse scale store
    it bucketed on ``bucket`` so the batch probe shuffles only the batch
    side."""
    from spark_signals.datapipe.similarity import _hyperplane_sig_expr

    return embeddings.select(
        F.expr(_hyperplane_sig_expr()).alias("bucket"), "vec_id", "embedding"
    )


# Hot-bucket cap for the incremental embedding lane (r12, advisor low #2):
# buckets whose COMBINED population (index + batch) exceeds this carry no
# LSH evidence — the 2^N_HYPERPLANES-key signature has collapsed there
# (near-parallel vectors, or low-entropy embeddings), and verifying such a
# bucket is quadratic in its size. The same count-first discipline as the
# media lane's band_max_docs: count (constant agg state), keep keys under
# the cap, join candidates over kept keys only. Never engages at test
# scale (max observed bucket: 29 at sf0.1). At warehouse scale the escape
# hatch is MORE HYPERPLANES (buckets shrink geometrically per bit), not a
# bigger cap.
EMB_BUCKET_MAX = 2_000


def embedding_neardup_incremental(
    new_vectors: DataFrame,
    index: DataFrame,
    threshold: float = COSINE_THRESHOLD,
    bucket_max: int = EMB_BUCKET_MAX,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup an incoming vector batch against a persisted sign-LSH
    bucket index. Returns ``(survivors, index_delta)``:

    * ``survivors`` — batch vectors whose cosine stayed below
      ``threshold`` against every bucket-colliding historical vector and
      every smaller-vec_id batch vector (greedy first-wins, the batch
      operator's rule).
    * ``index_delta`` — the survivors' (bucket, vec_id, embedding) rows
      to APPEND.

    Shape at 100 TB: batch signatures chain onto the scan (per-row HOF,
    no shuffle); the history probe is ONE bucket equi-join against the
    index (batch-side shuffle only when the index is bucket-bucketed);
    exact cosine runs on colliding candidates only. Buckets hotter than
    ``bucket_max`` (combined index + batch population) are EXCLUDED from
    both joins — they fail OPEN (their batch vectors are admitted), the
    identical recall trade the media lane's band cap makes for template
    keys; the structural fix for a corpus that hits the cap is raising
    N_HYPERPLANES so the signature regains entropy. Idempotent at the
    storage level via the batch_id partition overwrite; for NON-ZERO
    vectors, replaying an admitted batch against the updated index also
    yields zero survivors (every such vector cosine-1 matches its own
    index row). A zero vector is the one exception: its cosine to
    everything — itself included — is 0 under the eps clamp, so replays
    re-admit it; the overwrite keeps storage exact regardless."""
    from spark_signals.datapipe.similarity import _cos_div
    from spark_signals.parity import sround

    sigs = embedding_lsh_index(new_vectors).persist()
    try:
        # count-first hot-bucket guard: two constant-state count aggs
        # (≤ 2^N_HYPERPLANES rows each), combined population filtered
        # against the cap, key RE-ALIASED so the semi-join back onto sigs
        # is never an ambiguous self-join
        b_cnt = sigs.groupBy("bucket").agg(F.count(F.lit(1)).alias("b_n"))
        i_cnt = index.groupBy("bucket").agg(F.count(F.lit(1)).alias("i_n"))
        kept = (
            b_cnt.join(i_cnt, "bucket", "full")
            .filter(
                F.coalesce("b_n", F.lit(0)) + F.coalesce("i_n", F.lit(0))
                <= F.lit(int(bucket_max))
            )
            .select(F.col("bucket").alias("bucket"))
        )
        kept_sigs = sigs.join(F.broadcast(kept), "bucket", "left_semi")
        dot = F.expr(
            "aggregate(zip_with(n_emb, o_emb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)"
        )
        nn = F.sqrt(F.expr("aggregate(n_emb, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
        no = F.sqrt(F.expr("aggregate(o_emb, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
        cos = sround(_cos_div(dot, nn * no), 6)
        hist_dups = (
            kept_sigs.select("bucket", F.col("vec_id").alias("vec_new"), F.col("embedding").alias("n_emb"))
            .join(
                index.select("bucket", F.col("embedding").alias("o_emb")),
                "bucket",
            )
            .filter(cos >= F.lit(float(threshold)))
            .select(F.col("vec_new").alias("vec_id"))
            .distinct()
        )
        a = kept_sigs.alias("a")
        b = kept_sigs.alias("b")
        pair_dot = F.expr(
            "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)"
        )
        pna = F.sqrt(F.expr("aggregate(a.embedding, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
        pnb = F.sqrt(F.expr("aggregate(b.embedding, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
        pcos = sround(_cos_div(pair_dot, pna * pnb), 6)
        batch_dups = (
            a.join(b, "bucket")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(pcos >= F.lit(float(threshold)))
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
        drops = hist_dups.unionByName(batch_dups).distinct()
        survivors = new_vectors.join(drops, "vec_id", "left_anti").transform(pin)
        delta = (
            sigs.join(survivors.select("vec_id"), "vec_id", "left_semi")
            .select("bucket", "vec_id", "embedding")
            .transform(pin)
        )
        return survivors, delta
    finally:
        sigs.unpersist()


# Driver-checkable face of the incremental embedding lane: the standard
# snapshot/batch split (vec_id % EMB_INCR_SPLIT_MOD == 0 is "tonight's
# drop", same convention as dedup_incremental_snapshot / the ANN index
# delta). Output projects (vec_id, label) — array cells are
# representation-fragile in the hash compare (see embed_chunks_parity).
EMB_INCR_SPLIT_MOD = 5


def embedding_incr_neardup_snapshot(embeddings: DataFrame) -> DataFrame:
    snap = embeddings.filter(F.col("vec_id") % EMB_INCR_SPLIT_MOD != 0)
    batch = embeddings.filter(F.col("vec_id") % EMB_INCR_SPLIT_MOD == 0)
    survivors, _delta = embedding_neardup_incremental(
        batch, embedding_lsh_index(snap)
    )
    return survivors.select("vec_id", "label")


def sql_embedding_incr_neardup(
    mod: int = EMB_INCR_SPLIT_MOD,
    threshold: float = COSINE_THRESHOLD,
    bucket_max: int = EMB_BUCKET_MAX,
) -> str:
    """DuckDB mirror of :func:`embedding_incr_neardup_snapshot`: the
    sign-LSH signature CTE (the exact hyperplane family of SQL_ANN_LSH),
    snapshot/batch split, the hot-bucket cap (combined snapshot + batch
    population ≤ ``bucket_max``, batch side filtered — same rule as the
    Spark lane), history probe by bucket + gridded cosine verify,
    within-batch first-wins, and the batch anti-join."""
    from spark_signals.datapipe.similarity import N_HYPERPLANES

    cos = lambda a, b: (  # noqa: E731
        f"floor(("
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        f" / greatest(sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 1e-300)"
        f") * 1e6 + 0.5000001) / 1e6"
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, label, embedding,
    array_to_string(list_transform(range(0, {N_HYPERPLANES}), i ->
      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), d ->
        CAST(embedding[d] AS DOUBLE) *
        (CAST(strpos('0123456789abcdef', substring(md5(i::VARCHAR || ':' || d::VARCHAR), 1, 1)) AS DOUBLE) - 8.5)
      )) > 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings
),
snapb AS (SELECT * FROM sigs WHERE vec_id % {mod} <> 0),
kept AS (
  SELECT bucket FROM sigs GROUP BY bucket HAVING COUNT(*) <= {int(bucket_max)}
),
batchb AS (
  SELECT * FROM sigs
  WHERE vec_id % {mod} = 0 AND bucket IN (SELECT bucket FROM kept)
),
histdrop AS (
  SELECT DISTINCT b.vec_id
  FROM batchb b JOIN snapb s ON b.bucket = s.bucket
  WHERE {cos("b.embedding", "s.embedding")} >= CAST({threshold!r} AS DOUBLE)
),
batchdrop AS (
  SELECT DISTINCT b.vec_id
  FROM batchb a JOIN batchb b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
    AND {cos("a.embedding", "b.embedding")} >= CAST({threshold!r} AS DOUBLE)
),
drops AS (SELECT vec_id FROM histdrop UNION SELECT vec_id FROM batchdrop)
SELECT vec_id, label FROM embeddings
WHERE vec_id % {mod} = 0 AND vec_id NOT IN (SELECT vec_id FROM drops)"""


# ----------------------------------------------- dedup-aware token accounting
def token_yield_report(
    docs: DataFrame, clusters: DataFrame | None = None
) -> DataFrame:
    """Per-source effective-token yield after near-dup clustering — the
    "how many tokens do I actually have" accounting from the
    data-constrained-scaling literature (Muennighoff et al. 2023,
    arXiv:2305.16264): raw token mass vs the unique mass a canonical-only
    materialization keeps, and the implied epoch multiplier (one pass over
    the raw corpus = ``implied_epochs`` passes over its unique content).

    Cluster grain is the MinHash-LSH connected-component family
    (:func:`dedup_clusters`), so near-dup mass counts as duplicated — the
    number exact-digest dedup underestimates on templated corpora. Unique
    tokens attribute each cluster to its CANONICAL document's source
    (min doc_id), the same attribution the materialized corpus would see;
    a source whose duplicates all canonicalize elsewhere honestly reports
    near-zero unique yield.

    Scale: token counts are per-row JVM regex work riding the existing
    corpus scan; the join to the CC output is a doc_id equi-join and the
    report is one S-row aggregate — the O(log n) CC passes dominate, and
    everything downstream of them is integer sums (associative, exact at
    any partitioning; Σtokens < 2^63 at any corpus size). ``clusters``
    optionally supplies a precomputed :func:`dedup_clusters` relation so
    a pipeline already holding the CC output doesn't re-run it (r15
    advisory).
    """
    from spark_signals.datapipe.text import n_tokens_col

    cl = clusters if clusters is not None else dedup_clusters(docs)
    toks = docs.select(
        "doc_id", "source", n_tokens_col(F.col("text"), "bpe").cast("long").alias("n_tok")
    )
    j = toks.join(cl, "doc_id")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_canonical"),
        F.sum("n_tok").alias("raw_tokens"),
        F.sum(F.when(F.col("is_canonical"), F.col("n_tok")).otherwise(F.lit(0))).alias(
            "unique_tokens"
        ),
    )
    dup_tokens = F.col("raw_tokens") - F.col("unique_tokens")
    dup_frac = dup_tokens.cast("double") / F.greatest(F.col("raw_tokens"), F.lit(1))
    epochs = F.col("raw_tokens").cast("double") / F.greatest(F.col("unique_tokens"), F.lit(1))
    return agg.select(
        "source",
        "n_docs",
        "n_canonical",
        "raw_tokens",
        "unique_tokens",
        dup_tokens.alias("dup_tokens"),
        (F.floor(dup_frac * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)).alias(
            "dup_token_frac"
        ),
        (F.floor(epochs * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)).alias(
            "implied_epochs"
        ),
    )


def sql_token_yield_report() -> str:
    from spark_signals.datapipe.text import sql_n_tokens

    return f"""
WITH c AS ({SQL_DEDUP_CLUSTERS}),
tk AS (
  SELECT doc_id, source, CAST({sql_n_tokens("text", "bpe")} AS BIGINT) AS n_tok
  FROM documents
),
agg AS (
  SELECT t.source,
         count(*) AS n_docs,
         CAST(SUM(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
         CAST(SUM(t.n_tok) AS BIGINT) AS raw_tokens,
         CAST(SUM(CASE WHEN c.is_canonical THEN t.n_tok ELSE 0 END) AS BIGINT) AS unique_tokens
  FROM tk t JOIN c USING (doc_id)
  GROUP BY t.source
)
SELECT source, n_docs, n_canonical, raw_tokens, unique_tokens,
       raw_tokens - unique_tokens AS dup_tokens,
       floor(CAST(raw_tokens - unique_tokens AS DOUBLE) / greatest(raw_tokens, 1) * 1e6 + 0.5000001) / 1e6 AS dup_token_frac,
       floor(CAST(raw_tokens AS DOUBLE) / greatest(unique_tokens, 1) * 1e6 + 0.5000001) / 1e6 AS implied_epochs
FROM agg"""


# ------------------------------------------------- minhash estimator audit
def minhash_calibration_report(
    docs: DataFrame, sample_bands: int = NUM_BANDS
) -> DataFrame:
    """MinHash estimator calibration — the dedup lane's acceptance report,
    twin of the ANN family's recall@k audit (similarity.ann_recall_report):
    over every band-colliding candidate pair, the signature-agreement
    estimate (matches/NUM_HASHES) against the exact shingle Jaccard, binned
    by exact-Jaccard decile. Answers "is 12 hashes enough at my threshold"
    with data instead of the Broder formula, BEFORE a 100 TB dedup run
    commits to the parameters.

    The population is candidates (pairs sharing ≥1 LSH band), matching what
    the production lane actually adjudicates — stated on the report because
    calibration conditioned on collision skews low-Jaccard bins toward
    estimator over-counts (collision requires ≥1 agreeing band).

    Exactness: per-pair doubles (estimate, exact Jaccard, |error|) are
    gridded to integer 1e-6 units BEFORE the per-bin mean, so the sums are
    associative BIGINT adds — bin means are bit-identical at any partition
    count and across engines. Same blocking as the dedup lane: no all-pairs
    relation anywhere.

    ``sample_bands`` is the warehouse-scale knob: the audit's cost tracks
    raw band-collision count (it keeps the sub-threshold candidates the
    lane discards — that is where estimator bias lives), so at 100 TB it
    runs over the candidates of the FIRST ``sample_bands`` of the
    {NUM_BANDS} LSH bands instead of all of them — a deterministic
    1/(bands/sample) thinning of the collision population with the same
    per-pair arithmetic (each surviving pair still scores with the full
    {NUM_HASHES}-hash signature). Decade-measured on 500k docs:
    sample_bands=1 cut the audit 3.6× (247 s → 69 s) while reproducing
    every populated bin with mean_exact within 0.003 and mean_est within
    0.08 (the one loose bin held 6 sampled pairs — small-sample noise,
    visible in the report's own n_pairs column).
    tests/test_release_audits.py pins the identity at
    sample_bands={NUM_BANDS} and the subset property at 1.
    """
    if not 1 <= sample_bands <= NUM_BANDS:
        raise ValueError(f"sample_bands must be in [1, {NUM_BANDS}]: {sample_bands}")
    sh = _km_row_sigs(
        _with_shingles(docs).select("doc_id", "shingles"), "shingles", NUM_HASHES, "shingles"
    ).persist()
    try:
        bands = _band_keys(sh)
        if sample_bands < NUM_BANDS:
            bands = bands.filter(F.col("band") < F.lit(sample_bands))
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (
            a.join(b, ["band", "k1", "k2"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        left = sh.select(
            F.col("doc_id").alias("doc_a"),
            F.col("shingles").alias("sh_a"),
            *[F.col(f"m{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
        )
        right = sh.select(
            F.col("doc_id").alias("doc_b"),
            F.col("shingles").alias("sh_b"),
            *[F.col(f"m{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
        )
        pairs = cand.join(left, "doc_a").join(right, "doc_b")
        matches = None
        for i in range(NUM_HASHES):
            t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
            matches = t if matches is None else matches + t
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = inter.cast("double") / union
        est = matches.cast("double") / F.lit(float(NUM_HASHES))
        graded = pairs.select(
            F.least(F.floor(jac * F.lit(10)).cast("long"), F.lit(9).cast("long")).alias(
                "jaccard_bin"
            ),
            matches.cast("long").alias("matches"),
            F.floor(jac * F.lit(1e6) + F.lit(0.5000001)).cast("long").alias("jac_u"),
            F.floor(F.abs(est - jac) * F.lit(1e6) + F.lit(0.5000001))
            .cast("long")
            .alias("err_u"),
        )
        out = graded.groupBy("jaccard_bin").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("matches").alias("sig_matches"),
            F.sum("jac_u").alias("sum_jac_u"),
            F.sum("err_u").alias("sum_err_u"),
        )
        result = out.select(
            "jaccard_bin",
            "n_pairs",
            "sig_matches",
            (
                F.col("sig_matches").cast("double")
                / (F.col("n_pairs") * F.lit(float(NUM_HASHES)))
            ).alias("mean_est"),
            (F.col("sum_jac_u").cast("double") / (F.col("n_pairs") * F.lit(1e6))).alias(
                "mean_exact"
            ),
            (F.col("sum_err_u").cast("double") / (F.col("n_pairs") * F.lit(1e6))).alias(
                "mean_abs_err"
            ),
        )
        return result.transform(pin)
    finally:
        sh.unpersist()


minhash_calibration_report.__doc__ = minhash_calibration_report.__doc__.format(
    NUM_BANDS=NUM_BANDS, NUM_HASHES=NUM_HASHES
)


def sql_minhash_calibration_report(sample_bands: int = NUM_BANDS) -> str:
    """DuckDB twin, parameterized by the same ``sample_bands`` knob as the
    Spark face (r15 advisory): with ``sample_bands < NUM_BANDS`` the bands
    CTE keeps only the first ``sample_bands`` bands, so the SAMPLED
    warehouse-scale path gets the identical cross-engine value check the
    full-band audit has — not just the subset-property unit test."""
    if not 1 <= sample_bands <= NUM_BANDS:
        raise ValueError(f"sample_bands must be in [1, {NUM_BANDS}]: {sample_bands}")
    band_pred = f"\n  WHERE b < {sample_bands}" if sample_bands < NUM_BANDS else ""
    match_sum = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return f"""
WITH {_sql_shingle_docs()},
g AS (
  SELECT doc_id,
         ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
         ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
sig AS (
  SELECT doc_id,
    {", ".join(f"min((h1 + {i + 1} * h2) % {MINHASH_P}) AS m{i}" for i in range(NUM_HASHES))}
  FROM g GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         [{", ".join(f"m{2 * b}" for b in range(NUM_BANDS))}][b + 1] AS k1,
         [{", ".join(f"m{2 * b + 1}" for b in range(NUM_BANDS))}][b + 1] AS k2
  FROM sig, (SELECT unnest(range(0, {NUM_BANDS})) AS b){band_pred}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
  WHERE a.doc_id < b.doc_id
),
pair AS (
  SELECT doc_a, doc_b,
         ({match_sum}) AS matches,
         CAST(len(list_intersect(ha.shingles, hb.shingles)) AS DOUBLE)
           / (len(ha.shingles) + len(hb.shingles) - len(list_intersect(ha.shingles, hb.shingles))) AS jac
  FROM cand
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
  JOIN sh ha ON ha.doc_id = doc_a
  JOIN sh hb ON hb.doc_id = doc_b
),
u AS (
  SELECT least(CAST(floor(jac * 10) AS BIGINT), 9) AS jaccard_bin,
         matches,
         CAST(floor(jac * 1e6 + 0.5000001) AS BIGINT) AS jac_u,
         CAST(floor(abs(matches / {float(NUM_HASHES)!r} - jac) * 1e6 + 0.5000001) AS BIGINT) AS err_u
  FROM pair
)
SELECT jaccard_bin,
       count(*) AS n_pairs,
       CAST(SUM(matches) AS BIGINT) AS sig_matches,
       CAST(SUM(matches) AS DOUBLE) / (count(*) * {float(NUM_HASHES)!r}) AS mean_est,
       CAST(SUM(jac_u) AS DOUBLE) / (count(*) * 1e6) AS mean_exact,
       CAST(SUM(err_u) AS DOUBLE) / (count(*) * 1e6) AS mean_abs_err
FROM u GROUP BY jaccard_bin"""


# ----------------------------------------------- cross-source overlap audit
def source_overlap_matrix(
    docs: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Near-dup overlap matrix between SOURCES — the licensing/provenance
    audit behind dedup priority decisions: which ingest sources duplicate
    each other, how much, and how hard (mean Jaccard). A crawl that
    mirrors a licensed corpus shows up here as a heavy off-diagonal cell
    before anyone debugs a contamination surprise downstream.

    Rides the verified MinHash-LSH pair relation (the same candidates →
    exact-Jaccard verify as the dedup lane — banding-bounded, no
    all-pairs); each verified pair contributes to the unordered
    (source_lo, source_hi) cell, diagonal cells counting within-source
    duplication. Mean Jaccard grids per-pair to integer 1e-6 units before
    the cell mean, so cells are bit-identical at any partitioning. Output
    is S² cells at most — source-cardinality-bounded, like the QI
    relation of the k-anonymity gate.

    ``pairs`` optionally supplies a precomputed :func:`dedup_minhash_lsh`
    relation (shared with the cluster-derived artifacts — r15 advisory).
    """
    if pairs is None:
        pairs = dedup_minhash_lsh(docs)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")), "doc_b")
    )
    graded = j.select(
        F.least("src_a", "src_b").alias("source_lo"),
        F.greatest("src_a", "src_b").alias("source_hi"),
        F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5000001)).cast("long").alias("jac_u"),
    )
    out = graded.groupBy("source_lo", "source_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("jac_u").alias("sum_jac_u"),
    )
    return out.select(
        "source_lo",
        "source_hi",
        "n_pairs",
        (F.col("source_lo") != F.col("source_hi")).alias("is_cross_source"),
        (F.col("sum_jac_u").cast("double") / (F.col("n_pairs") * F.lit(1e6))).alias(
            "mean_jaccard"
        ),
    )


def sql_source_overlap_matrix() -> str:
    return f"""
WITH p AS ({SQL_DEDUP_MINHASH}),
j AS (
  SELECT least(da.source, db.source) AS source_lo,
         greatest(da.source, db.source) AS source_hi,
         CAST(floor(p.jaccard * 1e6 + 0.5000001) AS BIGINT) AS jac_u
  FROM p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
)
SELECT source_lo, source_hi, count(*) AS n_pairs,
       source_lo <> source_hi AS is_cross_source,
       CAST(SUM(jac_u) AS DOUBLE) / (count(*) * 1e6) AS mean_jaccard
FROM j GROUP BY source_lo, source_hi"""


# ------------------------------------- incremental cross-source overlap lane
def _overlap_cells(pairs: DataFrame, src_a: DataFrame, src_b: DataFrame) -> DataFrame:
    """ADDITIVE overlap state from a verified pair relation: per unordered
    (source_lo, source_hi) cell, pair count and the 1e-6-gridded Jaccard
    sum. Cells of a pair-set union are the summed cells of disjoint parts
    — the invariant the incremental lane rides (the qi_counts shape)."""
    j = (
        pairs.join(
            src_a.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")),
            "doc_a",
        ).join(
            src_b.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")),
            "doc_b",
        )
    )
    graded = j.select(
        F.least("src_a", "src_b").alias("source_lo"),
        F.greatest("src_a", "src_b").alias("source_hi"),
        F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5000001)).cast("long").alias("jac_u"),
    )
    return graded.groupBy("source_lo", "source_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("jac_u").alias("sum_jac_u"),
    )


def source_overlap_from_cells(cells: DataFrame) -> DataFrame:
    """The matrix relation (source_overlap_matrix's exact schema) from a
    (possibly multi-delta) cell state — merge is an integer sum, the mean
    is computed only at read time so it never has to be merged."""
    merged = cells.groupBy("source_lo", "source_hi").agg(
        F.sum("n_pairs").alias("n_pairs"), F.sum("sum_jac_u").alias("sum_jac_u")
    )
    return merged.select(
        "source_lo",
        "source_hi",
        "n_pairs",
        (F.col("source_lo") != F.col("source_hi")).alias("is_cross_source"),
        (F.col("sum_jac_u").cast("double") / (F.col("n_pairs") * F.lit(1e6))).alias(
            "mean_jaccard"
        ),
    )


def source_overlap_bootstrap(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``(cells, index)`` of an initial corpus: the overlap lane's state
    from the batch pair machinery — cells via :func:`_overlap_cells` over
    :func:`dedup_minhash_lsh`'s verified pairs, index via
    :func:`band_index` over ALL docs (the overlap audit counts duplicate
    pairs, so unlike the dedup ADMISSION index this one keeps every
    document's band rows, dropped near-dups included)."""
    src = docs.select("doc_id", "source")
    return _overlap_cells(dedup_minhash_lsh(docs), src, src), band_index(docs)


def source_overlap_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    snapshot_docs: DataFrame,
    cells: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest step of the CONTINUOUS cross-source overlap audit:
    ``(matrix, cells_merged, index_delta)`` — the corpus-wide provenance
    matrix after the drop lands, maintained O(batch) instead of a
    full-corpus MinHash re-run per drop.

    Exactness: the union's verified pair set partitions EXACTLY into
    batch-internal pairs (the same ``_minhash_pairs`` arithmetic as the
    batch lane) plus batch×history pairs (band probe against the
    persisted index → exact-Jaccard verify, each unordered pair counted
    once because one side is always the batch); per-pair ``jac_u`` grids
    identically, so summed cells reproduce
    :func:`source_overlap_matrix` of the whole corpus bit-for-bit —
    pinned by the snapshot face's oracle, which IS the batch SQL over
    the union. History is touched only via a semi-join on probed
    candidate doc_ids (O(candidates) row-groups of a doc_id-sorted
    store at 100 TB, not a corpus scan).

    State: cells are S²-bounded (source-pair cardinality); the index is
    the full-corpus band relation (NUM_BANDS rows/doc — store bucketed
    on (k1, k2) so each drop's probe shuffles only the batch side).
    """
    delta_cells, index_delta = _overlap_step(new_docs, index, snapshot_docs, threshold)
    cells_merged = (
        cells.select("source_lo", "source_hi", "n_pairs", "sum_jac_u")
        .unionByName(delta_cells)
        .groupBy("source_lo", "source_hi")
        .agg(F.sum("n_pairs").alias("n_pairs"), F.sum("sum_jac_u").alias("sum_jac_u"))
        .transform(pin)
    )
    return source_overlap_from_cells(cells_merged), cells_merged, index_delta


def _overlap_step(
    new_docs: DataFrame,
    index: DataFrame,
    snapshot_docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """One drop's ADDITIVE contribution ``(delta_cells, index_delta)`` —
    the delta grain the streaming lane persists per ``batch_id`` partition
    (overwrite-idempotent replay, the qi_counts storage contract). Both
    results are pinned before return so the caller's writes cannot race
    the index/docs partitions a replay would re-read."""
    sh_b = _km_row_sigs(
        _with_shingles(new_docs).select("doc_id", "shingles"),
        "shingles",
        NUM_HASHES,
        "shingles",
    ).persist()
    try:
        src_b = new_docs.select("doc_id", "source")
        batch_pairs = _minhash_pairs(sh_b)
        bands_b = _band_keys(sh_b)
        hist_cand = (
            bands_b.join(
                index.select("band", "k1", "k2", F.col("doc_id").alias("doc_old")),
                ["band", "k1", "k2"],
            )
            .select(F.col("doc_id").alias("doc_new"), "doc_old")
            .distinct()
        )
        old_docs = snapshot_docs.join(
            hist_cand.select(F.col("doc_old").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
        old_sh = _with_shingles(old_docs).select("doc_id", "shingles")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = inter.cast("double") / union
        cross_pairs = (
            hist_cand.join(
                sh_b.select(F.col("doc_id").alias("doc_new"), F.col("shingles").alias("sh_a")),
                "doc_new",
            )
            .join(
                old_sh.select(F.col("doc_id").alias("doc_old"), F.col("shingles").alias("sh_b")),
                "doc_old",
            )
            .select(
                F.col("doc_new").alias("doc_a"),
                F.col("doc_old").alias("doc_b"),
                jac.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= F.lit(threshold))
        )
        delta_cells = (
            _overlap_cells(batch_pairs, src_b, src_b)
            .unionByName(
                _overlap_cells(cross_pairs, src_b, old_docs.select("doc_id", "source"))
            )
            .groupBy("source_lo", "source_hi")
            .agg(F.sum("n_pairs").alias("n_pairs"), F.sum("sum_jac_u").alias("sum_jac_u"))
            .transform(pin)
        )
        index_delta = bands_b.select("band", "k1", "k2", "doc_id").transform(pin)
        return delta_cells, index_delta
    finally:
        sh_b.unpersist()


def source_overlap_incr_snapshot(docs: DataFrame) -> DataFrame:
    """Driver-checkable face: the same 80/20 snapshot/batch split as the
    other incremental lanes — bootstrap state from the snapshot, land the
    batch through :func:`source_overlap_incremental`, and return the
    resulting corpus-wide matrix. The oracle is sql_source_overlap_matrix
    over the FULL table: incremental == batch over the union, value-exact
    (the lane's whole claim, checked cross-engine)."""
    snapshot = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD != 0)
    batch = docs.filter(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    cells, idx = source_overlap_bootstrap(snapshot)
    matrix, _cells, _delta = source_overlap_incremental(batch, idx, snapshot, cells)
    return matrix
