"""Text-analysis operators for large-scale training-data pipelines.

Language ID (stopword heuristic), quality scoring (length/punctuation/
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (min-hash over word shingles). Everything is built from
JVM-side `pyspark.sql.functions` higher-order array functions — no Python
UDFs — so the whole stage stays inside WholeStageCodegen and scales linearly
with input splits (embarrassingly parallel per-row work; zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"],
    "es": ["el", "la", "de", "los", "y", "en", "que", "un", "por", "con"],
    "fr": ["le", "la", "les", "et", "un", "pour", "dans", "est", "que", "des"],
}
LANG_ORDER = ["en", "de", "es", "fr"]


# ASCII-only case folding. Java's lower() applies full Unicode mappings
# (e.g. Turkish 'İ' → "i̇", TWO codepoints) while DuckDB applies simple
# ones ('İ' → 'i') — found by the unicode differential probe; md5-shingle
# parity would silently break on the first non-ASCII corpus. translate()
# is a 1:1 codepoint map with IDENTICAL semantics in both engines, and is
# byte-identical to lower() on ASCII input (all driver test corpora).
ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LO = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column) -> Column:
    return F.translate(text, ASCII_UP, ASCII_LO)


def words_col(text: Column) -> Column:
    """ASCII-lower-cased whitespace tokens, empties dropped."""
    return F.filter(F.split(ascii_lower(text), "[ \t\n\x0b\f\r]+"), lambda w: w != "")


# ----------------------------------------------------------- token currency
# ONE token-count definition for the whole training-data surface. Sequence
# packing, the data-mixing manifest, and token-based length gates must
# price documents in the SAME currency, or the "epochs per source" table
# and the packing manifest silently disagree about corpus size (r06 mixed
# chars with words). Pluggable counters, one name:
#   "whitespace" (default) — words_col size; cheap, the packing unit.
#   "bpe"                  — letter runs + digit runs + single marks
#                            (text_stats' n_tokens_bpe), a closer proxy for
#                            subword tokenizers on punctuated text.
# Both have exact DuckDB twins (sql_n_tokens) so every consumer stays
# oracle-checkable; swap in a real tokenizer by adding a counter here and
# every consumer repriced consistently.
TOKEN_COUNTER_DEFAULT = "whitespace"
# explicit whitespace class (literal control chars, same bytes as the
# DuckDB twin in sql_n_tokens) — never Java \s, whose membership differs
# from RE2's on \x0b (r11 verdict nit #3 discipline, repo-wide)
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"


def n_tokens_col(text: Column, counter: str = TOKEN_COUNTER_DEFAULT) -> Column:
    """The canonical ``n_tokens`` column for a document ``text``."""
    if counter == "whitespace":
        return F.size(words_col(text))
    if counter == "bpe":
        return F.size(
            F.regexp_extract_all(ascii_lower(text), F.lit(_BPE_PATTERN), F.lit(0))
        )
    raise ValueError(f"unknown token counter: {counter!r}")


def sql_n_tokens(expr: str = "text", counter: str = TOKEN_COUNTER_DEFAULT) -> str:
    """DuckDB twin of :func:`n_tokens_col` over a SQL expression."""
    lower = f"translate({expr}, '{ASCII_UP}', '{ASCII_LO}')"
    if counter == "whitespace":
        return (
            f"len(list_filter(string_split_regex({lower}, '[ \t\n\x0b\f\r]+'), w -> w <> ''))"
        )
    if counter == "bpe":
        return f"len(regexp_extract_all({lower}, '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]'))"
    raise ValueError(f"unknown token counter: {counter!r}")


def _sql_array(values: list[str]) -> str:
    return "array(" + ",".join(f"'{v}'" for v in values) + ")"


def _stop_count(lang: str) -> Column:
    arr = _sql_array(STOPWORDS[lang])
    return F.expr(f"size(filter(words, w -> array_contains({arr}, w)))")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality features + deterministic quality score."""
    from spark_signals.datapipe.util import spread_small_input

    df = spread_small_input(docs).withColumn("words", words_col(F.col("text")))
    lower = ascii_lower(F.col("text"))
    n_words = F.size("words")
    n_chars = F.length("text")
    # non [a-z0-9 space] characters = punctuation-ish
    n_punct = n_chars - F.length(F.regexp_replace(lower, "[^a-z0-9 ]", ""))
    n_stop = _stop_count("en")
    # zero-guards: Spark 4 runs ANSI mode by default, where x/0 THROWS — a
    # single empty or whitespace-only document would fail the whole stage at
    # 100 TB. The guard divides by greatest(denom, 1) instead of branching:
    # the numerator is structurally 0 whenever the denominator is (no chars
    # → no punct; no words → no stopword hits), so values are identical —
    # and unlike a CASE WHEN, the unconditional form stays eligible for
    # codegen subexpression reuse (the branch form re-evaluated the
    # higher-order stopword filter per reference and doubled this stage).
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1))
    # BPE-ish token count: letter runs, digit runs, single other marks
    bpe_tokens = n_tokens_col(F.col("text"), "bpe")
    quality = (
        F.least(F.lit(1.0), n_words.cast("double") / F.lit(50.0))
        * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
        * (F.lit(0.5) + F.lit(0.5) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0)))
    )
    return df.select(
        "doc_id",
        "lang",
        "source",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        bpe_tokens.alias("n_tokens_bpe"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords_en"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def SQL_TEXT_STATS() -> str:
    en = "[" + ",".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    return f"""
WITH d AS (
  SELECT *, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
)
SELECT doc_id, lang, source,
  length(text) AS n_chars,
  len(words) AS n_words,
  len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]')) AS n_tokens_bpe,
  length(text) - length(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 ]', '', 'g')) AS n_punct,
  len(list_filter(words, w -> list_contains({en}, w))) AS n_stopwords_en,
  CAST(length(text) - length(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS punct_ratio,
  CAST(len(list_filter(words, w -> list_contains({en}, w))) AS DOUBLE) / greatest(len(words), 1)
      AS stopword_ratio,
  least(CAST(1.0 AS DOUBLE), CAST(len(words) AS DOUBLE) / CAST(50.0 AS DOUBLE))
    * (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1)) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
    * (CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * least((CAST(len(list_filter(words, w -> list_contains({en}, w))) AS DOUBLE) / greatest(len(words), 1)) * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
    AS quality_score
FROM d"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language guess with deterministic tie-break
    (preference order {order})."""
    df = docs.withColumn("words", words_col(F.col("text")))
    for lang in LANG_ORDER:
        df = df.withColumn(f"s_{lang}", _stop_count(lang))
    s = {lang: F.col(f"s_{lang}") for lang in LANG_ORDER}
    guess = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_claimed"),
        *[F.col(f"s_{lang}") for lang in LANG_ORDER],
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("guess_matches_claim"),
    )


def SQL_LANG_ID() -> str:
    lists = {
        lang: "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]" for lang in LANG_ORDER
    }
    counts = ",\n  ".join(
        f"len(list_filter(words, w -> list_contains({lists[lang]}, w))) AS s_{lang}"
        for lang in LANG_ORDER
    )
    return f"""
WITH d AS (
  SELECT *, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
c AS (
  SELECT doc_id, lang,
  {counts}
  FROM d
)
SELECT doc_id, lang AS lang_claimed, s_en, s_de, s_es, s_fr,
  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_guess,
  (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END) = lang AS guess_matches_claim
FROM c"""


def shingles_col(n: int = 3) -> Column:
    """Word n-gram shingles of the pre-computed ``words`` column; documents
    shorter than n words contribute their whole text as one shingle.

    Built as a chain of n-1 ``zip_with(…, concat)`` passes over shifted
    copies instead of ``transform(sequence, j -> concat_ws(slice))``: both
    yield identical strings, but explode over the transform+slice form ran
    10x slower (3.3 s vs 0.37 s for sf0.1 bigrams — the per-element slice
    churns allocations in the interpreted higher-order path). Every
    shingle-based operator (minhash/ngram dedup, fingerprint,
    decontamination, repetition) inherits the fast form.

    zip_with pads the shorter side with NULL, so after the chain the last
    n-1 entries are NULL (concat(x, NULL) = NULL); the final slice keeps
    exactly the size-n+1 complete grams. The slice length is only evaluated
    under the size >= n branch, where it is >= 1.
    """
    expr = "words"
    for k in range(1, n):
        expr = f"zip_with({expr}, slice(words, {k + 1}, size(words) - {k}), (x, y) -> concat(x, ' ', y))"
    if n > 1:
        expr = f"slice({expr}, 1, size(words) - {n - 1})"
    return F.when(F.size("words") >= n, F.expr(expr)).otherwise(
        F.array(F.concat_ws(" ", F.col("words")))
    )


def SQL_SHINGLES(n: int = 3) -> str:
    return f"""CASE WHEN len(words) >= {n}
        THEN list_transform(range(1, len(words) - {n - 2}), j -> array_to_string(list_slice(words, j, j + {n - 1}), ' '))
        ELSE [COALESCE(array_to_string(words, ' '), '')] END"""
    # ^ COALESCE: DuckDB's array_to_string([]) is NULL while Spark's
    # concat_ws is '' — without it a token-free doc's fallback shingle
    # md5-diverges (found by the text-corpus fuzzer, seed 7 #36)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: minimum md5 over word-3-gram shingles (the
    1-hash MinHash — a locality-sensitive rolling signature)."""
    from spark_signals.datapipe.util import spread_small_input

    df = spread_small_input(docs).withColumn("words", words_col(F.col("text")))
    df = df.withColumn("shingles", shingles_col(3))
    return df.select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.expr("array_min(transform(shingles, s -> md5(s)))").alias("fingerprint"),
    )


def SQL_FINGERPRINT() -> str:
    return f"""
WITH d AS (
  SELECT *, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
s AS (
  SELECT doc_id, {SQL_SHINGLES(3)} AS shingles FROM d
)
SELECT doc_id, len(shingles) AS n_shingles,
       list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
FROM s"""


# ------------------------------------------------------------------- tf-idf
TFIDF_TOP_K = 5


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic salient-term signal for
    corpus curation (topic clustering, template detection, near-dup triage).

    Shape at scale: one explode + two hash aggregations (doc×term counts,
    per-term document frequency) + a broadcast of the 1-row corpus count,
    then a per-doc top-k window. All shuffles key on (doc_id, word) or
    (word) — no global sort. The idf log runs on both engines' libm (not
    correctly-rounded by IEEE), so the score is grid-rounded before the
    rank order and the output gate; ranking ties break on the word itself.

    Unlike the md5/shingle dedup paths, the input is NOT pre-spread: the
    per-row work (regex split) is cheap, the heavy relation only exists
    after the explode — where the tf groupBy shuffle already spreads it —
    and a repartition here would shuffle full text bytes for nothing
    (measured 2.5× slower at sf0.1).
    """
    from pyspark.sql import Window

    from spark_signals.datapipe.util import explode_strings

    # string round-trip explode, not a bare Generate over the lambda-built
    # words array — the same quadratic-re-evaluation guard as every other
    # gram explode (util.explode_strings; measured ~15% faster warm and
    # 5.4s → 1.0s cold at sf0.1 when applied here in r06)
    base = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    # words_col drops empty tokens, so a '' row here can only be the
    # round-trip's empty-array artifact (split('') = ['']) — filter it to
    # keep token-free docs contributing zero rows, like a bare explode
    words = explode_strings(base, F.col("words"), "word", "doc_id").filter(
        F.col("word") != ""
    )
    # ONE explode + (doc_id, word) aggregate pass, STRUCTURALLY: tf is
    # materialized once and both consumers (the scored join's left side and
    # the per-word doc_freq aggregate) read the cache. r16 believed AQE's
    # runtime stage reuse already gave this (COUNT(tf) keeping the two
    # subtrees canonically identical) — re-checked r17 on Spark 4.1.2, it
    # does NOT: the optimizer rewrites the non-null COUNT(tf) back to a
    # prunable form, the dfreq branch's exchange loses the count column
    # (458.7 vs 367.0 KiB stage stats), and the final adaptive plan runs
    # TWO full explode subtrees at every SF probed. The pinned relation
    # makes the single pass structural and plan-checkable. Decade evidence
    # (tools/scale_run.py, 100× = 500k docs): 95.5 s two-pass vs 45.1 s
    # pinned — 2.1× at scale; locally (sf0.1) the two forms measure equal
    # within host noise (the cache build costs about what the second pass
    # did). Same per-call persist lifecycle as dedup_minhash_lsh:
    # materialize the (small, top-k) result eagerly while the cache is
    # warm, release in the finally.
    from spark_signals.checkpoint import pin

    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")).persist()
    try:
        dfreq = tf.groupBy("word").agg(F.count("tf").alias("doc_freq"))
        n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
        scored = (
            tf.join(dfreq, "word")
            .crossJoin(F.broadcast(n_docs))
            .withColumn(
                "tfidf",
                F.col("tf")
                * F.log(
                    (F.col("n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0))
                ),
            )
        )
        # deterministic cross-engine rounding before ordering (jsonfmt/sround)
        grid = F.floor(F.col("tfidf") * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_r"), F.asc("word"))
        return (
            scored.withColumn("tfidf_r", grid)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "doc_id", "word", "tf", "doc_freq",
                F.col("tfidf_r").alias("tfidf"), "rank",
            )
            .transform(pin)
        )
    finally:
        tf.unpersist()


def SQL_TFIDF(k: int = TFIDF_TOP_K) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS word
  FROM documents
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
),
dfreq AS (
  SELECT word, COUNT(*) AS doc_freq FROM tf GROUP BY 1
),
nd AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfreq.doc_freq,
         floor((tf.tf * ln((nd.n_docs + CAST(1.0 AS DOUBLE)) / (dfreq.doc_freq + CAST(1.0 AS DOUBLE))))
               * 1e6 + 0.5000001) / 1e6 AS tfidf_r
  FROM tf JOIN dfreq USING (word) CROSS JOIN nd
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, word, tf, doc_freq, tfidf_r AS tfidf, rank
FROM ranked WHERE rank <= {k}"""


# ----------------------------------------------------------- vocab coverage
# Tokenizer-design input: how much of the corpus does a V-word vocabulary
# cover? The coverage curve (cumulative token share of the top-V words)
# tells you the OOV rate any fixed vocabulary buys — the stat every
# tokenizer/vocab-size decision starts from (Zipf curves in the GPT-2/
# SentencePiece papers).
VOCAB_TOP_V = 200


def vocab_coverage(docs: DataFrame, v: int = VOCAB_TOP_V) -> DataFrame:
    """(rank, word, n_occurrences, frac, cum_frac): the top-``v`` corpus
    vocabulary by occurrence count (ties break on the word) with each
    word's token share and the cumulative coverage of the vocabulary up to
    that rank. Fractions grid to 1e-6 (engine-exact).

    Shape at 100 TB: one explode → one map-side-combined (word) count agg
    (vocab-sized output), top-V via a distributed TakeOrdered heap, then
    rank/cumsum over the V-row result through one sort_array aggregate —
    window-free (see kmeans_seeds), so no global-window warning and no
    single-partition shuffle of anything bigger than V structs.
    """
    from spark_signals.datapipe.util import explode_strings

    base = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    words = explode_strings(base, F.col("words"), "word", "doc_id").filter(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = counts.agg(F.sum("n_occurrences").alias("n_total"))
    top = (
        counts.orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(v)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("n_occurrences")).alias("neg_n"),
                        F.col("word").alias("word"),
                        F.col("n_occurrences").alias("n"),
                    )
                )
            ).alias("a")
        )
    )
    grid = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)  # noqa: E731
    exploded = top.select("a", F.posexplode("a").alias("pos", "s"))
    cum = F.expr("aggregate(slice(a, 1, pos + 1), 0L, (acc, x) -> acc + x.n)")
    return (
        exploded.crossJoin(F.broadcast(total))
        .select(
            (F.col("pos") + 1).alias("rank"),
            F.col("s.word").alias("word"),
            F.col("s.n").alias("n_occurrences"),
            grid(F.col("s.n") / F.col("n_total")).alias("frac"),
            grid(cum / F.col("n_total")).alias("cum_frac"),
        )
    )


def SQL_VOCAB_COVERAGE(v: int = VOCAB_TOP_V) -> str:
    return f"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS word
  FROM documents
),
counts AS (
  SELECT word, COUNT(*) AS n_occurrences FROM words GROUP BY 1
),
total AS (SELECT SUM(n_occurrences) AS n_total FROM counts),
ranked AS (
  SELECT word, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, word ASC) AS rank,
         SUM(n_occurrences) OVER (ORDER BY n_occurrences DESC, word ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM counts
)
SELECT CAST(rank AS INTEGER) AS rank, word, n_occurrences,
       floor((CAST(n_occurrences AS DOUBLE) / n_total) * 1e6 + 0.5000001) / 1e6 AS frac,
       floor((CAST(cum_n AS DOUBLE) / n_total) * 1e6 + 0.5000001) / 1e6 AS cum_frac
FROM ranked CROSS JOIN total
WHERE rank <= {v}"""


# ------------------------------------------------------- vocab tokenization
def tokenize_with_vocab(docs: DataFrame, v: int = VOCAB_TOP_V) -> DataFrame:
    """Map every document to token IDS under the top-``v`` corpus
    vocabulary (id = vocab rank, OOV → 0) — the bridge from
    :func:`vocab_coverage` to the packing/export stage: what a fixed-vocab
    tokenizer would emit, with the OOV rate the coverage curve predicted.
    Output per doc with ≥1 word: (doc_id, n_tokens, n_oov, oov_frac,
    ids_digest) — the id sequence is summarized as an md5 over the
    comma-joined ids in position order (the array itself is
    representation-fragile for cell-hash parity; same convention as
    embed_chunks_parity), so any engine producing a different sequence,
    order, or OOV decision changes the digest.

    Shape at 100 TB: one explode (via the concat_ws round-trip — the
    position-carrying twin of explode_strings), one BROADCAST join against
    the V-row vocab, one doc_id-keyed agg whose sort is an in-group
    sort_array over that doc's own tokens. The vocab build reuses
    vocab_coverage's TakeOrdered heap.
    """
    from spark_signals.datapipe.util import GRAM_SEP, spread_small_input

    vocab = vocab_coverage(docs, v).select(
        "word", F.col("rank").alias("token_id")
    )
    base = (
        spread_small_input(docs)
        .select("doc_id", words_col(F.col("text")).alias("words"))
        .filter(F.size("words") > 0)
    )
    flat = base.select(
        "doc_id",
        F.posexplode(F.split(F.concat_ws(GRAM_SEP, "words"), GRAM_SEP)).alias(
            "pos", "word"
        ),
    )
    mapped = flat.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("token_id", F.lit(0)).alias("id")
    )
    agg = mapped.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("id") == 0, F.lit(1))).alias("n_oov"),
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, id))),"
                    " s -> cast(s.id as string))"
                ),
            )
        ).alias("ids_digest"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_frac"),
        "ids_digest",
    )


def SQL_TOKENIZE_WITH_VOCAB(v: int = VOCAB_TOP_V) -> str:
    return f"""
WITH vc AS ({SQL_VOCAB_COVERAGE(v)}),
vocab AS (SELECT word, rank AS token_id FROM vc),
w AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+'), x -> x <> '') AS words
  FROM documents
),
tok AS (
  SELECT doc_id, i, words[i] AS word
  FROM w, unnest(generate_series(1, CAST(len(words) AS INT))) AS t(i)
  WHERE len(words) > 0
),
m AS (
  SELECT tok.doc_id, tok.i, COALESCE(vocab.token_id, 0) AS id
  FROM tok LEFT JOIN vocab USING (word)
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       COUNT(*) FILTER (WHERE id = 0) AS n_oov,
       CAST(COUNT(*) FILTER (WHERE id = 0) AS DOUBLE) / COUNT(*) AS oov_frac,
       md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY i)) AS ids_digest
FROM m GROUP BY doc_id"""


# --------------------------------------------------- length-percentile gate
LENGTH_BAND_LO = 0.05
LENGTH_BAND_HI = 0.95


def length_band(
    docs: DataFrame,
    lo: float = LENGTH_BAND_LO,
    hi: float = LENGTH_BAND_HI,
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-language document-length quality gate: keep docs whose length
    percentile (cume_dist within their language) lies in (lo, hi] — the
    standard trim of truncated fragments and boilerplate megadocs before
    training.

    ``length_col`` picks the currency: the default chars, or a
    pre-materialized token count (``n_tokens_col``) so the gate prices
    documents in the same unit as packing/mixing.

    cume_dist = rank/count over integers is exactly representable and
    ANSI-identical across engines, so the filter is deterministic with no
    rounding gate. One shuffle on lang (the stratum key); at 100 TB swap
    the exact window for percentile_approx thresholds per lang — same
    call site, sketch-based, no per-stratum sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(length_col)
    cd = F.cume_dist().over(w)
    return (
        docs.withColumn("length_pct", cd)
        .filter((F.col("length_pct") > lo) & (F.col("length_pct") <= hi))
        .select("doc_id", "lang", length_col, "length_pct")
    )


def SQL_LENGTH_BAND(lo: float = LENGTH_BAND_LO, hi: float = LENGTH_BAND_HI) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, lang, n_chars,
         cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS length_pct
  FROM documents
)
SELECT doc_id, lang, n_chars, length_pct
FROM g WHERE length_pct > CAST({lo!r} AS DOUBLE) AND length_pct <= CAST({hi!r} AS DOUBLE)"""


def length_band_approx(
    docs: DataFrame,
    lo: float = LENGTH_BAND_LO,
    hi: float = LENGTH_BAND_HI,
    length_col: str = "n_chars",
) -> DataFrame:
    """The 100 TB form of :func:`length_band`: per-language thresholds from
    ``percentile_approx`` sketches (one map-side-combinable aggregate over
    the lang key, k rows out) broadcast back onto the corpus — no
    per-stratum sort of any document. Emits the gate only (no exact
    length_pct column: computing it would re-introduce the very sort this
    path removes); tests hold its selection within the exact gate's ±1%
    rank neighborhood. ``length_col`` as in :func:`length_band`."""
    thresholds = docs.groupBy("lang").agg(
        F.percentile_approx(length_col, lo, F.lit(LENGTH_BAND_ACCURACY)).alias("lo_chars"),
        F.percentile_approx(length_col, hi, F.lit(LENGTH_BAND_ACCURACY)).alias("hi_chars"),
    )
    return (
        docs.join(F.broadcast(thresholds), "lang")
        .filter(
            (F.col(length_col) > F.col("lo_chars"))
            & (F.col(length_col) <= F.col("hi_chars"))
        )
        .select("doc_id", "lang", length_col)
    )


# Greenwald-Khanna accuracy for the sketch thresholds. While every stratum
# holds fewer than this many rows the sketch retains ALL samples and
# percentile_approx degenerates to the EXACT discrete quantile "smallest
# value with row_number >= ceil(p*n)" — which is what makes the operator
# oracle-checkable at test scale (verified identical to the rank formula at
# sf0.001/0.01/0.1). At 100 TB strata exceed the accuracy and the result
# becomes rank-within-εn approximate, by design.
LENGTH_BAND_ACCURACY = 10_000


def SQL_LENGTH_BAND_APPROX(
    lo: float = LENGTH_BAND_LO, hi: float = LENGTH_BAND_HI, source: str = "documents"
) -> str:
    """DuckDB mirror of :func:`length_band_approx` in the exact regime: the
    per-lang thresholds are spelled as the explicit GK exact-case rank
    formula rather than DuckDB's own (differently-seeded) approx sketch.
    Parameterized over the source relation (curate composes it over
    canon_documents)."""
    return f"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM {source}
),
thresholds AS (
  SELECT lang,
         min(CASE WHEN rn >= ceil(CAST({lo!r} AS DOUBLE) * n) THEN n_chars END) AS lo_chars,
         min(CASE WHEN rn >= ceil(CAST({hi!r} AS DOUBLE) * n) THEN n_chars END) AS hi_chars
  FROM r GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars
FROM {source} d JOIN thresholds t USING (lang)
WHERE d.n_chars > t.lo_chars AND d.n_chars <= t.hi_chars"""


# ---------------------------------------------- bigram-LM quality (ordered)
# The unigram LM is word-order-blind: a bag-of-words permutation of fluent
# text scores identically. The bigram LM scores TRANSITIONS —
# P(w2|w1) = LAMBDA·c(w1w2)/c(w1·) + (1−LAMBDA)·c(w2)/T (Jelinek-Mercer
# interpolation with the unigram), so shuffled word salad drops below its
# fluent original. Same determinism contract as the unigram LM: log-probs
# grid to int64 1e-4 units, per-doc sums are exact.
BIGRAM_LAMBDA = 0.7
# model-size lever for 100 TB: hapax bigrams are noise AND the bulk of the
# model's rows — pruning them bounds the broadcast/join side; pruned
# transitions fall back to the interpolation's unigram term (a per-word
# relation, always small). Default 2 so the backoff path is exercised.
BIGRAM_MIN_COUNT = 2
LM2_BAND_LOW_U = -34175   # avg transition logprob p10 of the synthetic corpus
LM2_BAND_HIGH_U = -33566  # p90 — re-measure when the corpus changes


def bigram_lm_quality(docs: DataFrame) -> DataFrame:
    """Interpolated bigram-LM fluency per document, over documents with at
    least one word transition (single-word / token-free docs are out of
    scope for an order-sensitive score).

    Shape at scale: one bigram hash agg (map-side combined) builds the
    transition counts; context totals and the unigram vocabulary are two
    more small aggs; scoring left-joins the (pruned) model on the bigram
    key with the per-word backoff join for pruned transitions — every join
    is key-blocked, the corpus moves only as (doc_id, gram) pairs, and AQE
    broadcasts the model while it fits.
    """
    from spark_signals.datapipe.util import explode_strings, spread_small_input

    grid = float(10**UNIGRAM_DP)
    base = (
        spread_small_input(docs)
        .withColumn("words", words_col(F.col("text")))
        .filter(F.size("words") >= 2)
    )
    toks = explode_strings(
        base.select("doc_id", "words"), F.col("words"), "word", "doc_id"
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    total = vocab.agg(F.sum("wc").alias("tc"))
    uni = vocab.crossJoin(F.broadcast(total)).select(
        "word", (F.col("wc").cast("double") / F.col("tc")).alias("pu")
    )

    bi = explode_strings(
        base.select("doc_id", shingles_col(2).alias("bigrams")),
        F.col("bigrams"),
        "g",
        "doc_id",
    )
    cb = bi.groupBy("g").agg(F.count(F.lit(1)).alias("cb"))
    w1 = F.substring_index(F.col("g"), " ", 1)
    w2 = F.substring_index(F.col("g"), " ", -1)
    ctx = cb.groupBy(w1.alias("w1")).agg(F.sum("cb").alias("cw1"))
    lam = F.lit(float(BIGRAM_LAMBDA))
    model = (
        cb.filter(F.col("cb") >= BIGRAM_MIN_COUNT)
        .join(ctx, w1 == ctx.w1)
        .join(uni.select(F.col("word").alias("_w2"), "pu"), w2 == F.col("_w2"))
        .select(
            "g",
            F.floor(
                F.log(
                    lam * F.col("cb").cast("double") / F.col("cw1")
                    + (F.lit(1.0) - lam) * F.col("pu")
                )
                * F.lit(grid)
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("lp_u"),
        )
    )
    backoff = uni.select(
        F.col("word").alias("bw"),
        F.floor(
            F.log((F.lit(1.0) - lam) * F.col("pu")) * F.lit(grid) + F.lit(0.5000001)
        )
        .cast("long")
        .alias("bo_u"),
    )
    scored = (
        bi.join(model, "g", "left")
        .join(backoff, w2 == F.col("bw"), "left")
        .select("doc_id", F.coalesce("lp_u", "bo_u").alias("lp"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("lp").alias("sum_logprob_u"), F.count(F.lit(1)).alias("n_bigrams")
    )
    s, n = F.col("sum_logprob_u"), F.col("n_bigrams")
    band = (
        F.when(s > F.lit(LM2_BAND_HIGH_U) * n, "high")
        .when(s >= F.lit(LM2_BAND_LOW_U) * n, "mid")
        .otherwise("low")
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "sum_logprob_u",
        (s.cast("double") / n / F.lit(grid)).alias("avg_logprob"),
        band.alias("lm2_band"),
    )


def SQL_BIGRAM_LM(source: str = "documents") -> str:
    grid = f"1e{UNIGRAM_DP}"
    lam = f"CAST({BIGRAM_LAMBDA!r} AS DOUBLE)"
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
d2 AS (SELECT * FROM d WHERE len(words) >= 2),
toks AS (SELECT doc_id, unnest(words) AS word FROM d2),
vocab AS (SELECT word, COUNT(*) AS wc FROM toks GROUP BY 1),
total AS (SELECT CAST(SUM(wc) AS BIGINT) AS tc FROM vocab),
uni AS (SELECT word, CAST(wc AS DOUBLE) / tc AS pu FROM vocab CROSS JOIN total),
bi AS (
  SELECT doc_id, unnest({SQL_SHINGLES(2)}) AS g FROM d2
),
cb AS (SELECT g, COUNT(*) AS cb FROM bi GROUP BY 1),
ctx AS (
  SELECT string_split(g, ' ')[1] AS w1, CAST(SUM(cb) AS BIGINT) AS cw1
  FROM cb GROUP BY 1
),
model AS (
  SELECT cb.g,
         CAST(floor(ln({lam} * CAST(cb.cb AS DOUBLE) / ctx.cw1
                       + (1.0 - {lam}) * uni.pu) * {grid} + 0.5000001) AS BIGINT) AS lp_u
  FROM cb
  JOIN ctx ON ctx.w1 = string_split(cb.g, ' ')[1]
  JOIN uni ON uni.word = string_split(cb.g, ' ')[-1]
  WHERE cb.cb >= {BIGRAM_MIN_COUNT}
),
backoff AS (
  SELECT word AS bw,
         CAST(floor(ln((1.0 - {lam}) * pu) * {grid} + 0.5000001) AS BIGINT) AS bo_u
  FROM uni
),
scored AS (
  SELECT bi.doc_id, COALESCE(m.lp_u, b.bo_u) AS lp
  FROM bi
  LEFT JOIN model m ON m.g = bi.g
  LEFT JOIN backoff b ON b.bw = string_split(bi.g, ' ')[-1]
),
per_doc AS (
  SELECT doc_id, CAST(SUM(lp) AS BIGINT) AS sum_logprob_u, COUNT(*) AS n_bigrams
  FROM scored GROUP BY 1
)
SELECT doc_id, n_bigrams, sum_logprob_u,
       CAST(sum_logprob_u AS DOUBLE) / n_bigrams / {grid} AS avg_logprob,
       CASE WHEN sum_logprob_u > {LM2_BAND_HIGH_U} * n_bigrams THEN 'high'
            WHEN sum_logprob_u >= {LM2_BAND_LOW_U} * n_bigrams THEN 'mid'
            ELSE 'low' END AS lm2_band
FROM per_doc"""


# --------------------------------------- CCNet perplexity-tertile partition
# CCNet (Wenzek et al. 2020) buckets each language's documents into
# head/middle/tail THIRDS by LM perplexity rank — corpus-relative, unlike
# lm2_band's absolute thresholds — and trains on the head/middle. The
# bucket rule is exact integer arithmetic (3·rank vs n), so the partition
# is engine-identical with no percentile interpolation semantics in play.


# tertile boundaries as the same Python doubles the oracle SQL interpolates
CCNET_P_TAIL = 1.0 / 3.0
CCNET_P_HEAD = 2.0 / 3.0


def ccnet_lm_buckets(docs: DataFrame, exact_rank: bool = False) -> DataFrame:
    """Per-language perplexity-tertile partition over the bigram-LM score:
    (doc_id, lang, avg_logprob, n_lang, ppl_bucket) for every doc with at
    least one word transition (the bigram LM's scope); head = most fluent
    third. ``exact_rank=True`` adds ``lm_rank`` (1 = most fluent) and
    assigns buckets by the exact integer rank rule 3·rank vs n.

    Shape at 100 TB (default): the LM scoring is bigram_lm_quality's
    key-blocked joins; the partition adds ONE map-side-combinable aggregate
    on lang (a ``percentile_approx`` sketch yielding both tertile
    boundaries + the lang count, k rows out) broadcast back onto the scored
    relation — no per-language sort of any document, so English being ~half
    of CommonCrawl costs nothing beyond its share of the scoring joins.
    While a language holds fewer rows than CCNET_ACCURACY the sketch
    retains all samples and the boundaries are the exact discrete
    quantiles (the length_band_approx regime, which is what makes the
    default oracle-checkable at test scale); past that they are
    rank-within-εn approximate, by design.

    ``exact_rank=True`` is the small-corpus / per-language-shard path: its
    ``Window.partitionBy(lang)`` sort single-partitions each language, the
    very shape CCNet avoids by sharding per language (Wenzek et al. 2020
    run one process per language; pair this flag with a per-lang shard
    runner, never a whole web corpus).
    """
    scored = bigram_lm_quality(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    if exact_rank:
        from pyspark.sql import Window

        w_rank = Window.partitionBy("lang").orderBy(
            F.desc("avg_logprob"), F.asc("doc_id")
        )
        w_lang = Window.partitionBy("lang")
        ranked = scored.select(
            "doc_id",
            "lang",
            "avg_logprob",
            F.row_number().over(w_rank).alias("lm_rank"),
            F.count(F.lit(1)).over(w_lang).alias("n_lang"),
        )
        r, n = F.col("lm_rank"), F.col("n_lang")
        bucket = (
            F.when(r * 3 <= n, "head")
            .when(r * 3 <= n * 2, "middle")
            .otherwise("tail")
        )
        return ranked.withColumn("ppl_bucket", bucket)
    thresholds = scored.groupBy("lang").agg(
        F.percentile_approx(
            "avg_logprob",
            F.array(F.lit(CCNET_P_TAIL), F.lit(CCNET_P_HEAD)),
            F.lit(CCNET_ACCURACY),
        ).alias("ts"),
        F.count(F.lit(1)).alias("n_lang"),
    )
    t_tail = F.element_at("ts", 1)
    t_head = F.element_at("ts", 2)
    bucket = (
        F.when(F.col("avg_logprob") > t_head, "head")
        .when(F.col("avg_logprob") > t_tail, "middle")
        .otherwise("tail")
    )
    return scored.join(F.broadcast(thresholds), "lang").select(
        "doc_id", "lang", "avg_logprob", "n_lang", bucket.alias("ppl_bucket")
    )


# GK accuracy for the tertile-boundary sketches; exact below this many rows
# per language (same contract as LENGTH_BAND_ACCURACY)
CCNET_ACCURACY = 10_000


def SQL_CCNET_LM_BUCKETS(source: str = "documents") -> str:
    """DuckDB mirror of the default (sketch-threshold) path in the exact
    regime: boundaries spelled as the GK exact-case rank formula "smallest
    value with row_number >= ceil(p*n)" per language (the
    SQL_LENGTH_BAND_APPROX pattern), buckets value-based."""
    return f"""
WITH lm AS ({SQL_BIGRAM_LM(source)}),
j AS (
  SELECT lm.doc_id, d.lang, lm.avg_logprob
  FROM lm JOIN {source} d USING (doc_id)
),
r AS (
  SELECT doc_id, lang, avg_logprob,
         row_number() OVER (PARTITION BY lang ORDER BY avg_logprob ASC) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM j
),
thresholds AS (
  SELECT lang,
         min(CASE WHEN rn >= ceil(CAST({CCNET_P_TAIL!r} AS DOUBLE) * n) THEN avg_logprob END) AS t_tail,
         min(CASE WHEN rn >= ceil(CAST({CCNET_P_HEAD!r} AS DOUBLE) * n) THEN avg_logprob END) AS t_head,
         CAST(max(n) AS BIGINT) AS n_lang
  FROM r GROUP BY lang
)
SELECT j.doc_id, j.lang, j.avg_logprob, t.n_lang,
       CASE WHEN j.avg_logprob > t.t_head THEN 'head'
            WHEN j.avg_logprob > t.t_tail THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM j JOIN thresholds t USING (lang)"""


def SQL_CCNET_LM_BUCKETS_EXACT(source: str = "documents") -> str:
    """Oracle for the opt-in ``exact_rank=True`` path (integer rank rule)."""
    return f"""
WITH lm AS ({SQL_BIGRAM_LM(source)}),
j AS (
  SELECT lm.doc_id, d.lang, lm.avg_logprob
  FROM lm JOIN {source} d USING (doc_id)
),
r AS (
  SELECT doc_id, lang, avg_logprob,
         row_number() OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id ASC) AS lm_rank,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM j
)
SELECT doc_id, lang, avg_logprob, CAST(lm_rank AS INTEGER) AS lm_rank,
       CAST(n_lang AS BIGINT) AS n_lang,
       CASE WHEN lm_rank * 3 <= n_lang THEN 'head'
            WHEN lm_rank * 3 <= n_lang * 2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM r"""


# ------------------------------------------------- repetition (Gopher-style)
# Thresholds sit at ≈ the top decile of the synthetic corpus (measured:
# top-bigram fraction median 0.033 / p90 0.069; dup-word fraction median
# 0.54 / p90 0.68) so the flag actually separates documents.
REPETITION_TOP_BIGRAM_FRAC = 0.06
REPETITION_DUP_WORD_FRAC = 0.65
# the top-bigram statistic is meaningless on tiny documents (a 5-bigram doc
# has top_frac >= 0.2 by construction) — the rule only applies above this
REPETITION_MIN_WORDS = 20


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals for training-data quality filtering
    (the Gopher/MassiveText rules: Rae et al. 2021, arXiv:2112.11446 §A1.1):
    most-frequent-bigram mass fraction and duplicate-word fraction, plus the
    combined `is_repetitive` gate.

    Shape: the dup-word fraction is pure per-row array math (codegen'd, no
    shuffle); the bigram mode needs per-(doc, gram) counts, so bigrams
    explode into rows and aggregate twice — the same explode → two hash
    aggs shape as tf-idf, partial-aggregated map-side before each shuffle.
    No UDFs, no joins: doc-level constants ride through the first aggregate
    as MIN() of a per-doc-constant column instead of joining back.

    Flags compare raw IEEE divisions (bit-identical across engines);
    fractions are rounded only at the parity boundary by the caller.
    """
    from spark_signals.datapipe.util import spread_small_input

    df = spread_small_input(docs).withColumn("words", words_col(F.col("text")))
    # zero-guard (ANSI division; see text_stats): (n - distinct)/max(n, 1)
    # — equals 1 - distinct/n exactly (one correctly-rounded division of
    # exact ints on both engines), and 0.0 for token-free docs with no
    # CASE branch to defeat codegen subexpression reuse
    dup_frac = (
        F.size("words") - F.size(F.array_distinct("words"))
    ).cast("double") / F.greatest(F.size("words"), F.lit(1))
    from spark_signals.datapipe.util import explode_strings

    pre = df.select(
        "doc_id",
        F.size("words").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        shingles_col(2).alias("bigrams"),
    )
    # string round-trip explode: one lambda evaluation per document (see
    # util.explode_strings — the naive Generate re-evaluates per output row)
    rows = explode_strings(
        pre, F.col("bigrams"), "g", "doc_id", "n_words", "dup_word_frac"
    )
    per_gram = rows.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("n_words").alias("n_words"),
        F.min("dup_word_frac").alias("dup_word_frac"),
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("distinct_bigrams"),
        F.min("n_words").alias("n_words"),
        F.min("dup_word_frac").alias("dup_word_frac"),
    )
    top_frac = F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_bigrams",
        "distinct_bigrams",
        "top_bigram_count",
        top_frac.alias("top_bigram_frac"),
        "dup_word_frac",
        (
            (
                (F.col("n_words") >= F.lit(REPETITION_MIN_WORDS))
                & (top_frac > F.lit(REPETITION_TOP_BIGRAM_FRAC))
            )
            | (F.col("dup_word_frac") > F.lit(REPETITION_DUP_WORD_FRAC))
        ).alias("is_repetitive"),
    )


def SQL_REPETITION() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
s AS (
  SELECT doc_id, len(words) AS n_words,
         CAST(len(words) - len(list_distinct(words)) AS DOUBLE)
              / greatest(len(words), 1) AS dup_word_frac,
         {SQL_SHINGLES(2)} AS bigrams
  FROM d
),
g AS (SELECT doc_id, n_words, dup_word_frac, unnest(bigrams) AS g FROM s),
c AS (
  SELECT doc_id, g, count(*) AS c, min(n_words) AS n_words,
         min(dup_word_frac) AS dup_word_frac
  FROM g GROUP BY doc_id, g
),
p AS (
  SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS n_bigrams,
         count(*) AS distinct_bigrams, min(n_words) AS n_words,
         min(dup_word_frac) AS dup_word_frac
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_words, CAST(n_bigrams AS BIGINT) AS n_bigrams, distinct_bigrams,
       top_bigram_count, top_bigram_count::DOUBLE / n_bigrams AS top_bigram_frac,
       dup_word_frac,
       ((n_words >= {REPETITION_MIN_WORDS}
         AND top_bigram_count::DOUBLE / n_bigrams > CAST({REPETITION_TOP_BIGRAM_FRAC!r} AS DOUBLE))
        OR dup_word_frac > CAST({REPETITION_DUP_WORD_FRAC!r} AS DOUBLE)) AS is_repetitive
FROM p"""


# --------------------------------------------- unigram-LM quality (ppl proxy)
# Per-word log-probs are gridded to integer 1e-4 units so the per-doc SUM is
# an associative BIGINT sum — exact under any partitioning and identical
# across engines (ln itself is libm on both sides, so the grid is the only
# place a 1-ulp divergence could surface; at DP=4 a flip needs ln to land
# within 1e-11 of a grid boundary).
UNIGRAM_DP = 4
# band cuts at the measured p10/p90 of the synthetic corpus, expressed in
# grid units so the comparison is pure int64 arithmetic (no float threshold)
LM_BAND_LOW_U = -34100   # avg logprob -3.4100 (p10) — below = 'low'
LM_BAND_HIGH_U = -33956  # avg logprob -3.3956 (p90) — above = 'high'


def unigram_lm_quality(docs: DataFrame) -> DataFrame:
    """Corpus-unigram-LM fluency score per document — the cheap perplexity
    proxy used to quality-filter web text before training (CCNet-style,
    with the full LM swapped for the corpus's own unigram distribution).

    Shape at scale: explode to (doc_id, word) → one map-side-combined hash
    agg builds the vocabulary (word, count) → 1-row total broadcast → the
    token stream equi-joins the vocab relation on word (vocab rows ≪ token
    rows; AQE broadcasts it while it fits, and the shuffle-join fallback is
    skew-safe because the build side is one row per word) → per-doc hash
    agg. Two shuffles total keyed on word / doc_id; the corpus never moves
    except as (doc_id, word) pairs.
    """
    toks = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    total = vocab.agg(F.sum("wc").alias("tc"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "word",
        F.floor(
            F.log(F.col("wc").cast("double") / F.col("tc").cast("double"))
            * F.lit(float(10**UNIGRAM_DP))
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("lp_u"),
    )
    per_doc = (
        toks.join(model, "word")
        .groupBy("doc_id")
        .agg(F.sum("lp_u").alias("sum_logprob_u"), F.count(F.lit(1)).alias("n_words"))
    )
    s, n = F.col("sum_logprob_u"), F.col("n_words")
    band = (
        F.when(s > F.lit(LM_BAND_HIGH_U) * n, "high")
        .when(s >= F.lit(LM_BAND_LOW_U) * n, "mid")
        .otherwise("low")
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "sum_logprob_u",
        (s.cast("double") / n / F.lit(float(10**UNIGRAM_DP))).alias("avg_logprob"),
        band.alias("lm_band"),
    )


def SQL_UNIGRAM_LM(source: str = "documents") -> str:
    """Oracle SQL parameterized over the source relation (see
    dedup.sql_dedup_passages — curate composes these over canon_documents
    without string surgery)."""
    grid = f"1e{UNIGRAM_DP}"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS word
  FROM {source}
),
vocab AS (SELECT word, COUNT(*) AS wc FROM toks GROUP BY 1),
total AS (SELECT CAST(SUM(wc) AS BIGINT) AS tc FROM vocab),
model AS (
  SELECT word,
         CAST(floor(ln(CAST(wc AS DOUBLE) / CAST(tc AS DOUBLE)) * {grid} + 0.5000001) AS BIGINT) AS lp_u
  FROM vocab CROSS JOIN total
),
per_doc AS (
  SELECT toks.doc_id,
         CAST(SUM(model.lp_u) AS BIGINT) AS sum_logprob_u,
         COUNT(*) AS n_words
  FROM toks JOIN model USING (word)
  GROUP BY 1
)
SELECT doc_id, n_words, sum_logprob_u,
       CAST(sum_logprob_u AS DOUBLE) / n_words / {grid} AS avg_logprob,
       CASE WHEN sum_logprob_u > {LM_BAND_HIGH_U} * n_words THEN 'high'
            WHEN sum_logprob_u >= {LM_BAND_LOW_U} * n_words THEN 'mid'
            ELSE 'low' END AS lm_band
FROM per_doc"""


# ---------------------------------------------- per-language sharded runner
def per_language(
    docs: DataFrame,
    op,
    langs: list[str],
    lang_col: str = "lang",
    include_other: bool = True,
):
    """Run a language-keyed operator one language at a time and union the
    results — how CCNet actually executes: language skew (English ≈ half a
    web corpus) becomes embarrassing parallelism across independent jobs
    instead of one skewed key inside a shared shuffle, and each language's
    run can be scheduled/retried/sized on its own.

    ``langs`` is the explicit language list (a pipeline config, not a
    discovery pass — no driver-side collect); rows outside it run as one
    catch-all shard when ``include_other`` (so the union is exhaustive:
    every input row lands in exactly one shard — pinned by test).

    Semantics: for per-row operators the union is row-identical to the
    single-job run. For corpus-statistic operators the shard IS the
    corpus — which for ccnet_lm_buckets is precisely CCNet's own recipe
    (Wenzek et al. 2020 train one LM per language), so
    ``per_language(docs, ccnet_lm_buckets, langs)`` upgrades the
    corpus-global bigram LM to per-language LMs while keeping tertiles
    per-language; it is the faithful production composition, not an
    equivalent rewrite of the single-job call."""
    from functools import reduce

    parts = [op(docs.filter(F.col(lang_col) == lang)) for lang in langs]
    if include_other:
        parts.append(op(docs.filter(~F.col(lang_col).isin(list(langs)))))
    return reduce(lambda a, b: a.unionByName(b), parts)


# ------------------------------------------------------- Zipf corpus stats
# Corpus-distribution QA: a healthy natural-language corpus follows Zipf's
# law (log freq ≈ intercept + slope·log rank with slope ≈ -1); template-
# generated, boilerplate-heavy, or OCR-noise corpora bend the curve. One
# row per language: token/vocab totals, type-token ratio, hapax fraction,
# and the OLS fit of log(count) on log(rank) over the top-V vocabulary.
ZIPF_TOP_V = 100
ZIPF_LANGS = ["de", "en", "es", "fr", "zh"]


def zipf_stats(docs: DataFrame, label: str, v: int = ZIPF_TOP_V) -> DataFrame:
    """One-row corpus distribution summary for one document shard.

    Shape at 100 TB: one explode → one map-side-combined (word) count agg
    (vocab-sized), one 3-scalar agg over the counts, top-V via a
    distributed TakeOrdered heap, then the OLS fit folds over the V-row
    sorted array in a single Project — window-free, nothing bigger than V
    structs ever leaves an executor. The fold order is the array order, so
    the IEEE sums are deterministic; outputs grid to 1e-6.
    """
    from spark_signals.datapipe.util import explode_strings

    base = docs.select(words_col(F.col("text")).alias("words"))
    words = explode_strings(base, F.col("words"), "word").filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    scalars = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("hapax_count"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("word"))
        .limit(v)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("cnt")).alias("neg"),
                        F.col("word").alias("w"),
                        F.col("cnt").alias("n"),
                    )
                )
            ).alias("a")
        )
    )
    grid = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)  # noqa: E731
    n = F.size("a")
    sx = F.expr("aggregate(sequence(1, size(a)), 0D, (acc, r) -> acc + ln(r))")
    sy = F.expr("aggregate(a, 0D, (acc, s) -> acc + ln(s.n))")
    sxy = F.expr(
        "aggregate(sequence(1, size(a)), 0D, (acc, r) -> acc + ln(r) * ln(element_at(a, r).n))"
    )
    sxx = F.expr("aggregate(sequence(1, size(a)), 0D, (acc, r) -> acc + ln(r) * ln(r))")
    denom = sxx - sx * sx / n
    slope = F.when((n >= 2) & (denom != 0), (sxy - sx * sy / n) / denom)
    intercept = F.when((n >= 2) & (denom != 0), (sy - ((sxy - sx * sy / n) / denom) * sx) / n)
    return (
        scalars.crossJoin(F.broadcast(top))
        .select(
            F.lit(label).alias("lang"),
            "n_tokens",
            "vocab_size",
            "hapax_count",
            grid(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("vocab_size").cast("double") / F.col("n_tokens"),
                )
            ).alias("type_token_ratio"),
            grid(
                F.when(
                    F.col("vocab_size") > 0,
                    F.col("hapax_count").cast("double") / F.col("vocab_size"),
                )
            ).alias("hapax_frac"),
            grid(slope).alias("zipf_slope"),
            grid(intercept).alias("zipf_intercept"),
        )
    )


def zipf_lang_stats(
    docs: DataFrame,
    langs: list[str] | None = None,
    v: int = ZIPF_TOP_V,
) -> DataFrame:
    """Per-language Zipf/distribution report: one shard per configured
    language plus a catch-all, ``per_language``-style — language skew
    (English ≈ half a web corpus) runs as independent jobs, and each
    shard's vocabulary statistics are per-language by construction (mixing
    languages fabricates a bilingual vocabulary no model trains on)."""
    from functools import reduce

    langs = ZIPF_LANGS if langs is None else langs
    parts = [
        zipf_stats(docs.filter(F.col("lang") == lang), lang, v) for lang in langs
    ]
    parts.append(
        zipf_stats(docs.filter(~F.col("lang").isin(list(langs))), "other", v)
    )
    return reduce(lambda a, b: a.unionByName(b), parts)


def sql_zipf_lang_stats(
    langs: list[str] | None = None, v: int = ZIPF_TOP_V
) -> str:
    langs = ZIPF_LANGS if langs is None else langs
    shards = [(lang, f"lang = '{lang}'") for lang in langs]
    shards.append(("other", "lang NOT IN (" + ", ".join(f"'{l}'" for l in langs) + ")"))
    selects = []
    for label, pred in shards:
        selects.append(f"""
SELECT '{label}' AS lang, n_tokens, vocab_size, hapax_count,
  floor((CASE WHEN n_tokens > 0 THEN CAST(vocab_size AS DOUBLE) / n_tokens END) * 1e6 + 0.5000001) / 1e6 AS type_token_ratio,
  floor((CASE WHEN vocab_size > 0 THEN CAST(hapax_count AS DOUBLE) / vocab_size END) * 1e6 + 0.5000001) / 1e6 AS hapax_frac,
  floor(slope * 1e6 + 0.5000001) / 1e6 AS zipf_slope,
  floor(icept * 1e6 + 0.5000001) / 1e6 AS zipf_intercept
FROM (
  WITH w AS (
    SELECT unnest(list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS word
    FROM documents WHERE {pred}
  ),
  counts AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
  scalars AS (
    SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_tokens, COUNT(*) AS vocab_size,
           CAST(COALESCE(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS hapax_count
    FROM counts
  ),
  ranked AS (
    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word ASC) AS r
    FROM counts ORDER BY cnt DESC, word ASC LIMIT {v}
  ),
  fit AS (
    SELECT COUNT(*) AS n, SUM(ln(r)) AS sx, SUM(ln(cnt)) AS sy,
           SUM(ln(r) * ln(cnt)) AS sxy, SUM(ln(r) * ln(r)) AS sxx
    FROM ranked
  )
  SELECT s.n_tokens, s.vocab_size, s.hapax_count,
    CASE WHEN f.n >= 2 AND (f.sxx - f.sx * f.sx / f.n) <> 0
         THEN (f.sxy - f.sx * f.sy / f.n) / (f.sxx - f.sx * f.sx / f.n) END AS slope,
    CASE WHEN f.n >= 2 AND (f.sxx - f.sx * f.sx / f.n) <> 0
         THEN (f.sy - ((f.sxy - f.sx * f.sy / f.n) / (f.sxx - f.sx * f.sx / f.n)) * f.sx) / f.n END AS icept
  FROM scalars s CROSS JOIN fit f
)""")
    return "\nUNION ALL\n".join(selects)
