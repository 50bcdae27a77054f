"""Distributed BPE (byte-pair-encoding) vocabulary training + tokenization.

A training-data pipeline ultimately prices corpora in SUBWORD tokens:
mixture shares, packing budgets and per-source epoch counts all change
when "token" means BPE pieces instead of whitespace words. The repo's
pluggable counter (text.n_tokens_col) has carried a regex proxy for that
currency; this module adds the real thing — the iterative most-frequent-
pair merge loop of Sennrich et al. 2016 (the algorithm behind every
GPT-2/LLaMA-family tokenizer), trained distributively and applied
distributively, with the merge table itself the deterministic artifact.

Algorithm (word-level BPE, the standard formulation): corpora tokenize
into words once, BPE trains on the (word, freq) dictionary — NOT the raw
corpus — because merge counts only depend on word shapes × frequencies.
Each iteration finds the globally most frequent adjacent symbol pair
(ties: lexicographically smallest pair) and merges all its occurrences.

Representation: a word's current segmentation is one string of wrapped
symbols, ``\\x02sym\\x03`` each (STX/ETX control chars, disjoint from any
real token text; words containing them are dropped from training — they
do not occur in text that survived clean_text/scrub). Merging pair (a, b)
is then ONE engine-native ``replace`` of ``\\x02a\\x03\\x02b\\x03`` with
``\\x02ab\\x03`` — the wrappers make matches boundary-exact, so leftmost
non-overlapping replace in Spark (Java String.replace) and DuckDB
(replace) both implement exactly the simultaneous left-to-right merge BPE
specifies, bit-identically.

Shape at 100 TB: the ONLY corpus-scale work is the initial word count
(one digest-style shuffle with map-side combine) and the final per-doc
join; the merge loop runs on the W-row vocab relation (W ≪ corpus tokens,
Heaps' law: ~millions of distinct words for a web corpus — a few GB).
Each iteration is one pair-count aggregate over W rows (map-side
combinable), one 1-row TakeOrdered argmax broadcast back, one Project;
lineage is truncated per iteration with eager localCheckpoints, the same
iterate-materialize contract as classifier.quality_logreg and
similarity.kmeans_train (swap for reliable checkpoints on a cluster).
No driver-side .collect() anywhere — the argmax re-enters the plan as a
broadcast crossJoin, and the no-pairs-left edge is handled by a plan-side
sentinel row (count −1, empty symbols — its search string cannot occur)
rather than a driver check.

Reference scope: the reference engine has no tokenizer surface at all
(its SQL dialect stops at string functions); this is north-star scope for
the LLM-pipeline target, same as the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.text import words_col
from spark_signals.datapipe.util import explode_strings

BPE_MERGES = 16  # checked-query size; real vocabs run this loop ~30k times

_S = "\x02"  # symbol open (STX)
_E = "\x03"  # symbol close (ETX)
_SEP = _E + _S  # between adjacent wrapped symbols / inside a pair key


def _word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale shuffle."""
    words = explode_strings(
        docs.select(words_col(F.col(text_col)).alias("words")), F.col("words"), "word"
    )
    return (
        words.filter((F.col("word") != "") & ~F.col("word").rlike("[\\x02\\x03]"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _wrap_chars(word: F.Column) -> F.Column:
    """'cat' → '\\x02c\\x03\\x02a\\x03\\x02t\\x03' (one wrapped symbol per
    codepoint — the character-level start state)."""
    return F.regexp_replace(word, "(.)", _S + "$1" + _E)


def _syms(repr_col: F.Column) -> F.Column:
    """Wrapped string → array of raw symbols."""
    return F.split(
        F.substring(repr_col, 2, F.length(repr_col) - 2).cast("string"), _SEP
    )


def _pair_counts(reprs: DataFrame) -> DataFrame:
    """(pair_str, cnt): adjacent-pair totals weighted by word freq.
    pair_str = left ++ _SEP ++ right (symbols never contain _SEP chars)."""
    with_syms = reprs.select(F.col("freq"), _syms(F.col("repr")).alias("syms")).filter(
        F.size("syms") >= 2  # guard BEFORE sequence(): sequence(1, 0) descends
    )
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        f" j -> concat(element_at(syms, j), '{_SEP}', element_at(syms, j + 1)))"
    )
    exploded = explode_strings(
        with_syms.select("freq", pairs.alias("pairs")), F.col("pairs"), "pair_str", "freq"
    )
    return exploded.groupBy("pair_str").agg(F.sum("freq").alias("cnt"))


def _sentinel(spark) -> DataFrame:
    """A plan-side floor for the argmax: count −1, empty left/right. Its
    search string '\\x02\\x03\\x02\\x03' cannot occur (symbols are
    non-empty), so a no-pairs-left iteration is a structural no-op."""
    return spark.range(1).select(
        F.lit(_SEP).alias("pair_str"), F.lit(-1).cast("bigint").alias("cnt")
    )


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """The trained merge table: (merge_rank, left, right, merged,
    pair_count), merge_rank 1-based in training order. Fewer than
    ``n_merges`` rows when the vocabulary runs out of pairs first."""
    reprs, merges = _train_loop(docs, n_merges, text_col)
    return merges


def _train_loop(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Returns (final word reprs, merge table). The final reprs ARE the
    trained segmentation of every training word — tokenizing the training
    corpus reuses them with no re-application pass."""
    spark = docs.sparkSession
    wf = _word_freq(docs, text_col)
    reprs = wf.select(
        "word", "freq", _wrap_chars(F.col("word")).alias("repr")
    ).localCheckpoint(eager=True)
    sentinel = _sentinel(spark)
    bests: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(reprs)
            .unionByName(sentinel)
            .orderBy(F.desc("cnt"), F.asc("pair_str"))
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                F.split("pair_str", _SEP, 2).getItem(0).alias("left"),
                F.split("pair_str", _SEP, 2).getItem(1).alias("right"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
        bests.append(best)
        search = F.concat(F.lit(_S), F.col("left"), F.lit(_E), F.lit(_S), F.col("right"), F.lit(_E))
        repl = F.concat(F.lit(_S), F.col("left"), F.col("right"), F.lit(_E))
        reprs = (
            reprs.crossJoin(F.broadcast(best))
            .select(
                "word", "freq", F.replace(F.col("repr"), search, repl).alias("repr")
            )
            .localCheckpoint(eager=True)
        )
    if not bests:  # n_merges=0: a pure char-level tokenizer, empty table
        merges = _sentinel(spark).select(
            F.lit(0).alias("merge_rank"),
            F.col("pair_str").alias("left"),
            F.col("pair_str").alias("right"),
            "cnt",
        )
    else:
        merges = bests[0]
        for b in bests[1:]:
            merges = merges.unionByName(b)
    merges = merges.filter(F.col("cnt") > 0).select(
        "merge_rank",
        "left",
        "right",
        F.concat("left", "right").alias("merged"),
        F.col("cnt").alias("pair_count"),
    )
    return reprs, merges


def bpe_token_counts(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """Per-document subword price under the self-trained vocab:
    (doc_id, n_words, n_tokens_bpe). Trains on ``docs`` and reuses the
    final word segmentation (no re-application pass), then joins each
    document's words against the W-row (word → n_syms) relation — the
    join broadcasts when the vocab fits, else shuffles on word. Words
    dropped from training (control chars) price at their char count."""
    reprs, _ = _train_loop(docs, n_merges, text_col)
    seg = reprs.select("word", F.size(_syms(F.col("repr"))).alias("n_syms"))
    doc_words = explode_strings(
        docs.select("doc_id", words_col(F.col(text_col)).alias("words")),
        F.col("words"),
        "word",
        "doc_id",
    ).filter(F.col("word") != "")
    priced = doc_words.join(seg, "word", "left").select(
        "doc_id", F.coalesce("n_syms", F.length("word")).alias("n_syms")
    )
    return priced.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_syms").cast("bigint").alias("n_tokens_bpe"),
    )


def bpe_segment_text(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_bpe): the document rewritten as space-joined BPE
    pieces — the currency swap: feeding this through ANY whitespace-priced
    consumer (pack_sequences, mixture_manifest) reprices it in subword
    tokens, which the reconciliation test pins against bpe_token_counts."""
    reprs, _ = _train_loop(docs, n_merges, text_col)
    seg = reprs.select(
        "word", F.array_join(_syms(F.col("repr")), " ").alias("pieces")
    )
    doc_words = explode_strings(
        docs.select("doc_id", words_col(F.col(text_col)).alias("words")),
        F.col("words"),
        "word",
        "doc_id",
    ).filter(F.col("word") != "")
    joined = doc_words.join(seg, "word", "left").select(
        "doc_id", F.coalesce("pieces", F.col("word")).alias("pieces")
    )
    return joined.groupBy("doc_id").agg(
        F.concat_ws(" ", F.collect_list("pieces")).alias("text_bpe")
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Apply a PRE-TRAINED merge table to a new corpus (the serving path:
    train once, tokenize forever): (doc_id, n_words, n_tokens_bpe).
    Replays each merge in rank order over the input's distinct words —
    ``n_merges`` chained 1-row broadcast crossJoins, never a driver
    collect; unseen words segment exactly as BPE specifies (greedy by
    merge rank from characters)."""
    wf = _word_freq(docs, text_col)
    reprs = wf.select("word", _wrap_chars(F.col("word")).alias("repr"))
    for rank in range(1, n_merges + 1):
        m = merges.filter(F.col("merge_rank") == rank).select("left", "right")
        search = F.concat(F.lit(_S), F.col("left"), F.lit(_E), F.lit(_S), F.col("right"), F.lit(_E))
        repl = F.concat(F.lit(_S), F.col("left"), F.col("right"), F.lit(_E))
        reprs = reprs.join(F.broadcast(m), F.lit(True), "left").select(
            "word",
            F.when(F.col("left").isNotNull(), F.replace(F.col("repr"), search, repl))
            .otherwise(F.col("repr"))
            .alias("repr"),
        )
    reprs = reprs.localCheckpoint(eager=True)
    seg = reprs.select("word", F.size(_syms(F.col("repr"))).alias("n_syms"))
    doc_words = explode_strings(
        docs.select("doc_id", words_col(F.col(text_col)).alias("words")),
        F.col("words"),
        "word",
        "doc_id",
    ).filter(F.col("word") != "")
    priced = doc_words.join(seg, "word", "left").select(
        "doc_id", F.coalesce("n_syms", F.length("word")).alias("n_syms")
    )
    return priced.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_syms").cast("bigint").alias("n_tokens_bpe"),
    )


# ----------------------------------------------------------- DuckDB twins
# The merge loop unrolls into p/b/r CTE triples per iteration (fixed
# iteration count → SQL-expressible), the same discipline as
# similarity._sql_kmeans_ctes — but every CTE is AS MATERIALIZED: r{i} is
# referenced twice (p{i+1} and r{i+1}) and default CTE inlining would
# expand the chain 2^N times (the SQL mirror of the lazy-plan blowup the
# kmeans_train docstring describes; at N=16 it exhausted the fd limit
# re-opening the parquet 65k ways).


def _sql_wf(source: str, text_expr: str = "text") -> str:
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    lower = f"translate({text_expr}, '{ASCII_UP}', '{ASCII_LO}')"
    return f"""wf AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex({lower}, '\\s+'), w -> w <> '')) AS word
    FROM {source}
  )
  WHERE NOT regexp_matches(word, '[\\x02\\x03]')
  GROUP BY word
)"""


def _sql_train_ctes(n_merges: int, source: str) -> list[str]:
    s, e = "chr(2)", "chr(3)"
    sep = f"({e} || {s})"
    ctes = [
        _sql_wf(source),
        f"""r0 AS MATERIALIZED (
  SELECT word, freq, regexp_replace(word, '(.)', {s} || '\\1' || {e}, 'g') AS repr
  FROM wf
)""",
    ]
    for i in range(1, n_merges + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT pair_str, SUM(freq)::BIGINT AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                  j -> syms[j] || {sep} || syms[j + 1])) AS pair_str
    FROM (
      SELECT freq,
             string_split(substring(repr, 2, length(repr) - 2), {sep}) AS syms
      FROM {prev}
    )
  ) GROUP BY pair_str
)""")
        ctes.append(
            f"""b{i} AS MATERIALIZED (
  SELECT {i} AS merge_rank,
         string_split(pair_str, {sep})[1] AS left_s,
         string_split(pair_str, {sep})[2] AS right_s,
         cnt
  FROM (
    SELECT pair_str, cnt FROM p{i}
    UNION ALL SELECT {sep}, -1::BIGINT
    ORDER BY cnt DESC, pair_str ASC LIMIT 1
  )
)""")
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT word, freq,
         replace(repr, {s} || b.left_s || {e} || {s} || b.right_s || {e},
                       {s} || b.left_s || b.right_s || {e}) AS repr
  FROM {prev} CROSS JOIN b{i} b
)""")
    return ctes


def sql_bpe_train(n_merges: int = BPE_MERGES, source: str = "documents") -> str:
    """Oracle twin of :func:`bpe_train` — the merge loop unrolled."""
    ctes = ",\n".join(_sql_train_ctes(n_merges, source))
    union = "\nUNION ALL ".join(
        f"SELECT merge_rank, left_s, right_s, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
WITH {ctes}
SELECT merge_rank, left_s AS "left", right_s AS "right",
       left_s || right_s AS merged, cnt AS pair_count
FROM ({union})
WHERE cnt > 0
ORDER BY merge_rank"""


def sql_bpe_token_counts(
    n_merges: int = BPE_MERGES, source: str = "documents"
) -> str:
    """Oracle twin of :func:`bpe_token_counts`."""
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    ctes = ",\n".join(_sql_train_ctes(n_merges, source))
    sep = "(chr(3) || chr(2))"
    lower = f"translate(text, '{ASCII_UP}', '{ASCII_LO}')"
    return f"""
WITH {ctes},
seg AS (
  SELECT word,
         len(string_split(substring(repr, 2, length(repr) - 2), {sep})) AS n_syms
  FROM r{n_merges}
),
dwords AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({lower}, '\\s+'), w -> w <> '')) AS word
  FROM {source}
)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       SUM(COALESCE(seg.n_syms, length(dwords.word)))::BIGINT AS n_tokens_bpe
FROM dwords LEFT JOIN seg USING (word)
GROUP BY doc_id"""


def bpe_fertility_by_lang(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> DataFrame:
    """Tokenizer-quality report per language: (lang, n_docs, n_words,
    n_tokens_bpe, n_chars, fertility, chars_per_token).

    Fertility (subword tokens per word) and compression (chars per token)
    are THE standard tokenizer-eval numbers — a vocab trained on an
    English-heavy mix shows fertility creep on under-represented
    languages, which this surfaces before a single GPU-hour is spent.
    Shape: bpe_token_counts' shapes plus one lang-keyed aggregate over
    doc-level rows; ratios divide exact int64 sums, gridded to 1e-6, so
    the report is partitioning/engine-stable. Zero-token languages
    (corpora of control chars) report NULL ratios rather than a division
    error under ANSI mode."""
    from spark_signals.parity import sround

    counts = bpe_token_counts(docs, n_merges, text_col)
    joined = counts.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    agg = joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_tokens_bpe").cast("bigint").alias("n_tokens_bpe"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens_bpe",
        "n_chars",
        sround(
            F.col("n_tokens_bpe") / F.nullif(F.col("n_words"), F.lit(0)), 6
        ).alias("fertility"),
        sround(
            F.col("n_chars") / F.nullif(F.col("n_tokens_bpe"), F.lit(0)), 6
        ).alias("chars_per_token"),
    )


def sql_bpe_fertility_by_lang(
    n_merges: int = BPE_MERGES, source: str = "documents"
) -> str:
    """Oracle twin of :func:`bpe_fertility_by_lang` — the token-counts
    CTE chain plus one lang-keyed aggregate."""
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    ctes = ",\n".join(_sql_train_ctes(n_merges, source))
    sep = "(chr(3) || chr(2))"
    lower = f"translate(text, '{ASCII_UP}', '{ASCII_LO}')"
    return f"""
WITH {ctes},
seg AS (
  SELECT word,
         len(string_split(substring(repr, 2, length(repr) - 2), {sep})) AS n_syms
  FROM r{n_merges}
),
dwords AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({lower}, '\\s+'), w -> w <> '')) AS word
  FROM {source}
),
counts AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_words,
         SUM(COALESCE(seg.n_syms, length(dwords.word)))::BIGINT AS n_tokens_bpe
  FROM dwords LEFT JOIN seg USING (word)
  GROUP BY doc_id
)
SELECT d.lang,
       count(*)::BIGINT AS n_docs,
       SUM(c.n_words)::BIGINT AS n_words,
       SUM(c.n_tokens_bpe)::BIGINT AS n_tokens_bpe,
       SUM(d.n_chars)::BIGINT AS n_chars,
       floor(SUM(c.n_tokens_bpe) / NULLIF(SUM(c.n_words), 0) * 1e6 + 0.5000001) / 1e6 AS fertility,
       floor(SUM(d.n_chars) / NULLIF(SUM(c.n_tokens_bpe), 0) * 1e6 + 0.5000001) / 1e6 AS chars_per_token
FROM counts c JOIN {source} d USING (doc_id)
GROUP BY d.lang"""
