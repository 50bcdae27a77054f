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
The exact textbook loop (``batch=1``) finds the globally most frequent
adjacent symbol pair each iteration (ties: lexicographically smallest
pair) and merges all its occurrences.

Production shape — BATCHED rounds (the default, ``batch=8``): one
sequential Spark job per merge cannot train a real ~30k-merge vocab, so
each round selects UP TO ``batch`` pairwise-SYMBOL-DISJOINT pairs from
one count and applies them together. Disjoint merges commute: merging
(a,b) cannot change the count of (c,d) when {a,b} ∩ {c,d} = ∅ (the new
symbol ``ab`` replaces an a,b adjacency; every other adjacency is
untouched), so within a round every selected pair's recorded count is its
true count at the round start. Selection is GREEDY maximal-independent-
set over the top ``oversample × cap`` candidates ranked by (count desc,
pair lex asc): walk the ranked list, keep a pair iff it shares no symbol
with an already-KEPT pair, stop adding at ``cap``. The walk is a fold
over the candidate ARRAY of a 1-row relation — ``aggregate`` with a
list accumulator in Spark, ``list_reduce`` in the DuckDB twin — so both
engines run the identical sequential rule without any join, window, or
driver collect. Early rounds on natural text still under-fill ``cap``
(common letters collide); ``n_merges`` is a BUDGET upper bound — the
table holds however many merges the ``ceil(n_merges / batch)`` rounds
yield, in global rank order. Versus exact BPE the deviation is merge
ORDER near count ties (a batch commits to round-start counts where the
textbook loop would recount); pair counts themselves are exact per
round.

Vocabulary pruning (``min_freq``): words below the frequency floor are
excluded from training — per Heaps' law the hapax tail is ~half the
distinct-word table while contributing negligible pair mass — and are
segmented AFTER training by one replay of the final merge table, so
token pricing still covers them exactly.

Merge application is ONE fold, not one pass per merge: the round's kept
set (or the whole trained table, for serving) is collected plan-side into
a rank-sorted array on a 1-row broadcast relation, and ``F.aggregate``
folds ``replace(repr, \\x02a\\x03\\x02b\\x03 → \\x02ab\\x03)`` over it —
each word-row string is rewritten once per round. The STX/ETX wrappers
(``\\x02sym\\x03``; words containing \\x01-\\x03 are dropped from
training — they do not occur in text that survived clean_text/scrub)
keep matches boundary-exact, so leftmost non-overlapping replace in Spark
(Java String.replace) and DuckDB both implement exactly the simultaneous
left-to-right merge BPE specifies, bit-identically.

Shape at 100 TB: the ONLY corpus-scale work is the initial word count
(one digest-style shuffle with map-side combine) and the final per-doc
join; the merge loop runs on the pruned W-row vocab relation (W ≪ corpus
tokens; a few GB). The only per-round eager materialization is the 1-ROW
kept array (whose plan carries the round's pair-count shuffle); the reprs
fold chain references each parent exactly once — the merge side is
already materialized — so it stays a linear Project chain and truncates
lineage with a checkpoint every 4th round. Jobs per merge come out well
under 1 (asserted in tests/test_bpe.py), against the 2 jobs per merge of
the exact serial loop; the checkpoints follow the same
iterate-materialize contract as classifier.quality_logreg and
similarity.kmeans_train (reliable under spark.signals.checkpointDir).
No driver-side .collect() anywhere — kept merges re-enter the plan as a
1-row broadcast array, and an empty round is a structural no-op (empty
array folds to the unchanged repr).

Reference scope: the reference engine has no tokenizer surface at all
(its SQL dialect stops at string functions); this is north-star scope for
the LLM-pipeline target, same as the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_signals.checkpoint import pin

from spark_signals.datapipe.text import words_col
from spark_signals.datapipe.util import explode_strings

BPE_MERGES = 16  # checked-query budget; real vocabs run ~30k merges
BPE_BATCH = 8  # merges selected together per round (1 = exact textbook loop)
BPE_OVERSAMPLE = 4  # candidate pool = oversample × cap, refilled by blocking
BPE_MIN_FREQ = 1  # training-vocab frequency floor (1 = no pruning)

_S = "\x02"  # symbol open (STX)
_E = "\x03"  # symbol close (ETX)
_SEP = _E + _S  # between adjacent wrapped symbols / inside a pair key


def _word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale shuffle.
    Words containing \\x01-\\x03 are dropped: \\x02/\\x03 are the symbol
    wrappers, \\x01 the oracle twin's fold-element separator."""
    words = explode_strings(
        docs.select(words_col(F.col(text_col)).alias("words")), F.col("words"), "word"
    )
    return (
        words.filter((F.col("word") != "") & ~F.col("word").rlike("[\\x01-\\x03]"))
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


def round_caps(n_merges: int, batch: int) -> list[int]:
    """Per-round merge caps: ``batch`` per round, last round trimmed so the
    caps sum to exactly ``n_merges`` — the static round schedule both the
    Spark loop and the unrolled SQL twin follow."""
    caps = []
    left = n_merges
    while left > 0:
        caps.append(min(batch, left))
        left -= caps[-1]
    return caps


def _select_batch(pc: DataFrame, cap: int) -> DataFrame:
    """One round's kept merges as a 1-ROW relation (sel:
    array<struct<left, right, cnt>> in rank order). Top
    ``BPE_OVERSAMPLE × cap`` candidates by (cnt desc, pair asc), then the
    greedy symbol-disjoint walk as a fold with a list accumulator — keep
    a pair iff it shares no symbol with an already-kept pair, stop at
    ``cap``. Everything after the TakeOrdered is array expressions on one
    row — no join, no window, no extra shuffle — so a round's only heavy
    stage is the pair-count aggregate itself."""
    cand = pc.orderBy(F.desc("cnt"), F.asc("pair_str")).limit(BPE_OVERSAMPLE * cap)
    # array_sort on struct(-cnt, pair_str) reproduces the candidate rank
    # order plan-side (collect_list order is not deterministic).
    packed = cand.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("cnt")).alias("neg"), "pair_str"))
        ).alias("cs")
    )
    cands = F.transform(
        F.col("cs"),
        lambda x: F.struct(
            F.split(x["pair_str"], _SEP, 2).getItem(0).alias("left"),
            F.split(x["pair_str"], _SEP, 2).getItem(1).alias("right"),
            (-x["neg"]).alias("cnt"),
        ),
    )
    shares = lambda x, y: (  # noqa: E731
        (x["left"] == y["left"])
        | (x["left"] == y["right"])
        | (x["right"] == y["left"])
        | (x["right"] == y["right"])
    )
    init = F.expr("cast(array() as array<struct<left:string,right:string,cnt:bigint>>)")
    sel = F.aggregate(
        cands,
        init,
        lambda acc, x: F.when(
            (F.size(acc) >= F.lit(cap)) | F.exists(acc, lambda y: shares(x, y)), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return packed.select(sel.alias("sel"))


def _explode_sel(sel_rel: DataFrame) -> DataFrame:
    """1-row (round, sel array) → (round, rk, left, right, cnt) rows,
    rk the 1-based kept position within the round."""
    return sel_rel.select(
        "round", F.posexplode("sel").alias("pos", "m")
    ).select(
        "round",
        (F.col("pos") + 1).alias("rk"),
        F.col("m")["left"].alias("left"),
        F.col("m")["right"].alias("right"),
        F.col("m")["cnt"].alias("cnt"),
    )


def _fold_sel(reprs: DataFrame, sel_rel: DataFrame) -> DataFrame:
    """Apply a round's kept merges to every repr in ONE Project: the 1-row
    kept array broadcasts, and ``aggregate`` folds boundary-exact replaces
    over it in rank order — each repr string is rewritten once per round.
    An empty round folds to the unchanged repr (no sentinel needed)."""
    return reprs.crossJoin(F.broadcast(sel_rel.select("sel"))).select(
        "word",
        "freq",
        F.aggregate(
            F.col("sel"),
            F.col("repr"),
            lambda acc, m: F.replace(
                acc,
                F.concat(F.lit(_S), m["left"], F.lit(_E), F.lit(_S), m["right"], F.lit(_E)),
                F.concat(F.lit(_S), m["left"], m["right"], F.lit(_E)),
            ),
        ).alias("repr"),
    )


def _fold_rows(reprs: DataFrame, merge_rows: DataFrame, order_cols: list[str]) -> DataFrame:
    """Like :func:`_fold_sel` but over a row-per-merge table (the serving
    path / pruned-word replay): merges fold into one rank-sorted array on
    a 1-row broadcast relation first."""
    search = F.concat(
        F.lit(_S), F.col("left"), F.lit(_E), F.lit(_S), F.col("right"), F.lit(_E)
    )
    repl = F.concat(F.lit(_S), F.col("left"), F.col("right"), F.lit(_E))
    packed = merge_rows.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                    search.alias("s"),
                    repl.alias("r"),
                )
            )
        ).alias("ms")
    )
    return reprs.crossJoin(F.broadcast(packed)).select(
        "word",
        "freq",
        F.aggregate(
            F.col("ms"), F.col("repr"), lambda acc, m: F.replace(acc, m["s"], m["r"])
        ).alias("repr"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> DataFrame:
    """The trained merge table: (merge_rank, left, right, merged,
    pair_count), merge_rank 1-based in training order. ``n_merges`` is a
    budget: fewer rows come back when the vocabulary runs out of pairs or
    rounds under-fill their cap (candidates sharing symbols)."""
    reprs, merges = _train_loop(docs, n_merges, text_col, batch, min_freq)
    return merges


def _empty_merges(spark) -> DataFrame:
    return spark.range(0).select(
        F.lit(0).alias("merge_rank"),
        F.lit("").alias("left"),
        F.lit("").alias("right"),
        F.lit("").alias("merged"),
        F.lit(0).cast("bigint").alias("pair_count"),
    )


def _train_loop(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> tuple[DataFrame, DataFrame]:
    """Returns (final word reprs, merge table). The final reprs ARE the
    trained segmentation of every word — trainable words come out of the
    loop directly; pruned (< min_freq) words get one replay of the final
    merge table — so tokenizing the training corpus needs no
    re-application pass."""
    spark = docs.sparkSession
    wf = _word_freq(docs, text_col)
    if min_freq > 1:
        wf = wf.transform(pin)  # reused by the pruned branch
        trainable = wf.filter(F.col("freq") >= min_freq)
    else:
        trainable = wf
    reprs = trainable.select(
        "word", "freq", _wrap_chars(F.col("word")).alias("repr")
    ).transform(pin)
    # Per round, the ONLY eager materialization is the 1-row kept array
    # (its plan carries the round's pair-count shuffle). The reprs fold
    # chain references each parent exactly once (the kept side is already
    # materialized), so it stays a linear Project chain and only needs a
    # lineage-truncating checkpoint every CKPT_EVERY rounds — jobs per
    # round ≈ 1 + 1/CKPT_EVERY, against kept-set sizes of ~4-8 merges.
    CKPT_EVERY = 4
    sel_rounds: list[DataFrame] = []
    for rnd, cap in enumerate(round_caps(n_merges, batch), start=1):
        sel = (
            _select_batch(_pair_counts(reprs), cap)
            .withColumn("round", F.lit(rnd))
            .transform(pin)
        )
        sel_rounds.append(sel)
        reprs = _fold_sel(reprs, sel)
        if rnd % CKPT_EVERY == 0:
            reprs = reprs.transform(pin)
    if not sel_rounds:  # n_merges=0: a pure char-level tokenizer
        return reprs, _empty_merges(spark)
    sel_all = sel_rounds[0]
    for s in sel_rounds[1:]:
        sel_all = sel_all.unionByName(s)
    kept_all = _explode_sel(sel_all)
    merges = kept_all.select(
        F.row_number().over(Window.orderBy("round", "rk")).alias("merge_rank"),
        "left",
        "right",
        F.concat("left", "right").alias("merged"),
        F.col("cnt").alias("pair_count"),
    )
    if min_freq > 1:
        pruned = wf.filter(F.col("freq") < min_freq).select(
            "word", "freq", _wrap_chars(F.col("word")).alias("repr")
        )
        reprs = reprs.unionByName(_fold_rows(pruned, kept_all, ["round", "rk"]))
    return reprs, merges


def _price_docs(docs: DataFrame, seg: DataFrame, text_col: str) -> DataFrame:
    """Join each document's words against the W-row (word → n_syms)
    relation — broadcasts when the vocab fits, else shuffles on word.
    Words absent from seg (control chars) price at their char count."""
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


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> DataFrame:
    """Per-document subword price under the self-trained vocab:
    (doc_id, n_words, n_tokens_bpe). Trains on ``docs`` and reuses the
    final word segmentation (no re-application pass)."""
    reprs, _ = _train_loop(docs, n_merges, text_col, batch, min_freq)
    seg = reprs.select("word", F.size(_syms(F.col("repr"))).alias("n_syms"))
    return _price_docs(docs, seg, text_col)


def bpe_segment_text(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> DataFrame:
    """(doc_id, text_bpe): the document rewritten as space-joined BPE
    pieces — the currency swap: feeding this through ANY whitespace-priced
    consumer (pack_sequences, mixture_manifest) reprices it in subword
    tokens, which the reconciliation test pins against bpe_token_counts."""
    reprs, _ = _train_loop(docs, n_merges, text_col, batch, min_freq)
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


def bpe_apply(docs: DataFrame, merges: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply a PRE-TRAINED merge table to a new corpus (the serving path:
    train once, tokenize forever): (doc_id, n_words, n_tokens_bpe).
    ONE fold replays every merge in rank order over the input's distinct
    words — a single Project against the 1-row broadcast merge array,
    never a per-merge pass or a driver collect; unseen words segment
    exactly as BPE specifies (greedy by merge rank from characters)."""
    wf = _word_freq(docs, text_col)
    reprs = wf.select("word", "freq", _wrap_chars(F.col("word")).alias("repr"))
    reprs = _fold_rows(reprs, merges, ["merge_rank"]).transform(pin)
    seg = reprs.select("word", F.size(_syms(F.col("repr"))).alias("n_syms"))
    return _price_docs(docs, seg, text_col)


# ----------------------------------------------------------- DuckDB twins
# The round loop unrolls into p/c/k/r CTE quads per round (static round
# schedule → SQL-expressible), the same discipline as
# similarity._sql_kmeans_ctes — every CTE AS MATERIALIZED: r{i} is
# referenced by both p{i+1} and r{i+1} and default CTE inlining would
# expand the chain 2^N times (the SQL mirror of the lazy-plan blowup the
# kmeans_train docstring describes). The fold uses list_reduce over
# chr(1)-packed (search, replace) strings — chr(1) cannot occur in a
# symbol (wf drops words matching [\x01-\x03]).


def _sql_wf(source: str, text_expr: str = "text") -> str:
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    lower = f"translate({text_expr}, '{ASCII_UP}', '{ASCII_LO}')"
    return f"""wf AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex({lower}, '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS word
    FROM {source}
  )
  WHERE NOT regexp_matches(word, '[\\x01-\\x03]')
  GROUP BY word
)"""


def _sql_train_ctes(
    n_merges: int,
    source: str,
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> tuple[list[str], int]:
    """Returns (CTE list, R): wf, r0, then p/c/k/r per round; kR/rR are the
    last round's kept set / final trainable reprs."""
    s, e = "chr(2)", "chr(3)"
    sep = f"({e} || {s})"
    ctes = [
        _sql_wf(source),
        f"""r0 AS MATERIALIZED (
  SELECT word, freq, regexp_replace(word, '(.)', {s} || '\\1' || {e}, 'g') AS repr
  FROM wf WHERE freq >= {min_freq}
)""",
    ]
    caps = round_caps(n_merges, batch)
    for i, cap in enumerate(caps, start=1):
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
            f"""c{i} AS MATERIALIZED (
  SELECT coalesce(list(struct_pack(
           left_s := string_split(pair_str, {sep})[1],
           right_s := string_split(pair_str, {sep})[2],
           cnt := cnt) ORDER BY cnt DESC, pair_str ASC), []) AS cands
  FROM (SELECT * FROM p{i} ORDER BY cnt DESC, pair_str ASC LIMIT {BPE_OVERSAMPLE * cap})
)""")
        ctes.append(
            f"""k{i} AS MATERIALIZED (
  SELECT {i} AS round, j AS rk, sel[j].left_s AS left_s,
         sel[j].right_s AS right_s, sel[j].cnt AS cnt
  FROM (
    SELECT sel, unnest(generate_series(1, len(sel))) AS j
    FROM (
      -- 'THEN acc || []' (not bare acc): DuckDB 1.0's list_reduce
      -- corrupts an accumulator returned by reference unchanged on a
      -- blocked step; concatenating the empty list forces a copy.
      SELECT CASE WHEN len(cands) = 0 THEN [] ELSE
        list_reduce(list_transform(cands, x -> [x]), (acc, x) ->
          CASE WHEN len(acc) >= {cap} OR len(list_filter(acc, y ->
                 x[1].left_s IN (y.left_s, y.right_s)
                 OR x[1].right_s IN (y.left_s, y.right_s))) > 0
          THEN acc || [] ELSE list_append(acc, x[1]) END)
      END AS sel
      FROM c{i}
    )
  )
)""")
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT word, freq,
         list_reduce(
           list_prepend(repr, coalesce(
             (SELECT list({s} || left_s || {e} || {s} || right_s || {e} || chr(1)
                          || {s} || left_s || right_s || {e} ORDER BY rk)
              FROM k{i}), [])),
           (acc, x) -> replace(acc, split_part(x, chr(1), 1), split_part(x, chr(1), 2))
         ) AS repr
  FROM {prev}
)""")
    return ctes, len(caps)


def _sql_merges_cte(n_rounds: int) -> str:
    """merges AS (merge_rank, left_s, right_s, cnt) over the kept rounds."""
    if n_rounds == 0:
        return """merges AS (
  SELECT 0 AS merge_rank, '' AS left_s, '' AS right_s, 0::BIGINT AS cnt, 0 AS round, 0::BIGINT AS rk
  WHERE false
)"""
    union = "\n  UNION ALL ".join(
        f"SELECT round, rk, left_s, right_s, cnt FROM k{i}"
        for i in range(1, n_rounds + 1)
    )
    return f"""merges AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY round, rk) AS merge_rank,
         left_s, right_s, cnt, round, rk
  FROM ({union})
)"""


def _sql_seg_cte(n_rounds: int, min_freq: int) -> str:
    """seg AS (word, n_syms): trained reprs, plus pruned words replayed
    through the full merge table when a frequency floor is set."""
    s, e, sep = "chr(2)", "chr(3)", "(chr(3) || chr(2))"
    trained = f"""SELECT word,
         len(string_split(substring(repr, 2, length(repr) - 2), {sep})) AS n_syms
  FROM r{n_rounds}"""
    if min_freq <= 1:
        return f"seg AS MATERIALIZED (\n  {trained}\n)"
    return f"""seg AS MATERIALIZED (
  {trained}
  UNION ALL
  SELECT word, len(string_split(substring(repr, 2, length(repr) - 2), {sep})) AS n_syms
  FROM (
    SELECT word, list_reduce(
      list_prepend(regexp_replace(word, '(.)', {s} || '\\1' || {e}, 'g'), coalesce(
        (SELECT list({s} || left_s || {e} || {s} || right_s || {e} || chr(1)
                     || {s} || left_s || right_s || {e} ORDER BY merge_rank)
         FROM merges), [])),
      (acc, x) -> replace(acc, split_part(x, chr(1), 1), split_part(x, chr(1), 2))
    ) AS repr
    FROM wf WHERE freq < {min_freq}
  )
)"""


def sql_bpe_train(
    n_merges: int = BPE_MERGES,
    source: str = "documents",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> str:
    """Oracle twin of :func:`bpe_train` — the round loop unrolled."""
    ctes, n_rounds = _sql_train_ctes(n_merges, source, batch, min_freq)
    ctes.append(_sql_merges_cte(n_rounds))
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT merge_rank, left_s AS "left", right_s AS "right",
       left_s || right_s AS merged, cnt AS pair_count
FROM merges
ORDER BY merge_rank"""


def _sql_dwords(source: str) -> str:
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    lower = f"translate(text, '{ASCII_UP}', '{ASCII_LO}')"
    return f"""dwords AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({lower}, '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS word
  FROM {source}
)"""


def sql_bpe_token_counts(
    n_merges: int = BPE_MERGES,
    source: str = "documents",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> str:
    """Oracle twin of :func:`bpe_token_counts`."""
    ctes, n_rounds = _sql_train_ctes(n_merges, source, batch, min_freq)
    ctes.append(_sql_merges_cte(n_rounds))
    ctes.append(_sql_seg_cte(n_rounds, min_freq))
    ctes.append(_sql_dwords(source))
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       SUM(COALESCE(seg.n_syms, length(dwords.word)))::BIGINT AS n_tokens_bpe
FROM dwords LEFT JOIN seg USING (word)
GROUP BY doc_id"""


def bpe_fertility_by_lang(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> DataFrame:
    """Tokenizer-quality report per language: (lang, n_docs, n_words,
    n_tokens_bpe, n_chars, fertility, chars_per_token).

    Fertility (subword tokens per word) and compression (chars per token)
    are THE standard tokenizer-eval numbers — a vocab trained on an
    English-heavy mix shows fertility creep on under-represented
    languages, which this surfaces before a single GPU-hour is spent.
    Chains the full train → tokenize path (bpe_train's rounds, then
    bpe_token_counts' segmentation join) plus one lang-keyed aggregate
    over doc-level rows; ratios divide exact int64 sums, gridded to 1e-6,
    so the report is partitioning/engine-stable. Zero-token languages
    (corpora of control chars) report NULL ratios rather than a division
    error under ANSI mode."""
    from spark_signals.parity import sround

    counts = bpe_token_counts(docs, n_merges, text_col, batch, min_freq)
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
    n_merges: int = BPE_MERGES,
    source: str = "documents",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> str:
    """Oracle twin of :func:`bpe_fertility_by_lang` — the token-counts
    CTE chain plus one lang-keyed aggregate."""
    ctes, n_rounds = _sql_train_ctes(n_merges, source, batch, min_freq)
    ctes.append(_sql_merges_cte(n_rounds))
    ctes.append(_sql_seg_cte(n_rounds, min_freq))
    ctes.append(_sql_dwords(source))
    ctes.append(
        """counts AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_words,
         SUM(COALESCE(seg.n_syms, length(dwords.word)))::BIGINT AS n_tokens_bpe
  FROM dwords LEFT JOIN seg USING (word)
  GROUP BY doc_id
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT d.lang,
       count(*)::BIGINT AS n_docs,
       SUM(c.n_words)::BIGINT AS n_words,
       SUM(c.n_tokens_bpe)::BIGINT AS n_tokens_bpe,
       SUM(d.n_chars)::BIGINT AS n_chars,
       floor(SUM(c.n_tokens_bpe) / NULLIF(SUM(c.n_words), 0) * 1e6 + 0.5000001) / 1e6 AS fertility,
       floor(SUM(d.n_chars) / NULLIF(SUM(c.n_tokens_bpe), 0) * 1e6 + 0.5000001) / 1e6 AS chars_per_token
FROM counts c JOIN {source} d USING (doc_id)
GROUP BY d.lang"""


def bpe_pipeline_report(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> DataFrame:
    """The chained BPE evidence query: ONE training run feeding BOTH the
    per-language fertility report (bpe_fertility_by_lang's columns) AND a
    merge-table digest (n_merges_trained, merge_pair_total, first_merge,
    last_merge) broadcast onto every row.

    Consolidation face for the driver contract: a value-hash match here
    pins the whole train → segment → price → report chain at once — the
    digest columns change if ANY merge (rank, pair, count) drifts, and the
    fertility columns change if any word's trained segmentation or any
    document's pricing drifts — so one checked slot carries the evidence
    of the bpe_train_merges / bpe_token_counts / bpe_fertility_by_lang
    trio. Unlike calling those three separately, the train loop runs ONCE
    (the siblings each retrain on their own lineage).
    """
    from spark_signals.parity import sround

    reprs, merges = _train_loop(docs, n_merges, text_col, batch, min_freq)
    seg = reprs.select("word", F.size(_syms(F.col("repr"))).alias("n_syms"))
    counts = _price_docs(docs, seg, text_col)
    joined = counts.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    agg = joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_tokens_bpe").cast("bigint").alias("n_tokens_bpe"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    report = agg.select(
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
    digest = merges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_merges_trained"),
        F.coalesce(F.sum("pair_count"), F.lit(0)).cast("bigint").alias(
            "merge_pair_total"
        ),
        F.min_by("merged", "merge_rank").alias("first_merge"),
        F.max_by("merged", "merge_rank").alias("last_merge"),
    )
    return report.crossJoin(F.broadcast(digest))


def sql_bpe_pipeline_report(
    n_merges: int = BPE_MERGES,
    source: str = "documents",
    batch: int = BPE_BATCH,
    min_freq: int = BPE_MIN_FREQ,
) -> str:
    """Oracle twin of :func:`bpe_pipeline_report` — the token-counts CTE
    chain, the fertility aggregate, and the merge-table digest cross
    join."""
    ctes, n_rounds = _sql_train_ctes(n_merges, source, batch, min_freq)
    ctes.append(_sql_merges_cte(n_rounds))
    ctes.append(_sql_seg_cte(n_rounds, min_freq))
    ctes.append(_sql_dwords(source))
    ctes.append(
        """counts AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_words,
         SUM(COALESCE(seg.n_syms, length(dwords.word)))::BIGINT AS n_tokens_bpe
  FROM dwords LEFT JOIN seg USING (word)
  GROUP BY doc_id
)"""
    )
    ctes.append(
        """mdigest AS (
  SELECT count(*)::BIGINT AS n_merges_trained,
         COALESCE(SUM(cnt), 0)::BIGINT AS merge_pair_total,
         arg_min(left_s || right_s, merge_rank) AS first_merge,
         arg_max(left_s || right_s, merge_rank) AS last_merge
  FROM merges
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT d.lang,
       count(*)::BIGINT AS n_docs,
       SUM(c.n_words)::BIGINT AS n_words,
       SUM(c.n_tokens_bpe)::BIGINT AS n_tokens_bpe,
       SUM(d.n_chars)::BIGINT AS n_chars,
       floor(SUM(c.n_tokens_bpe) / NULLIF(SUM(c.n_words), 0) * 1e6 + 0.5000001) / 1e6 AS fertility,
       floor(SUM(d.n_chars) / NULLIF(SUM(c.n_tokens_bpe), 0) * 1e6 + 0.5000001) / 1e6 AS chars_per_token,
       m.n_merges_trained, m.merge_pair_total, m.first_merge, m.last_merge
FROM counts c JOIN {source} d USING (doc_id) CROSS JOIN mdigest m
GROUP BY d.lang, m.n_merges_trained, m.merge_pair_total, m.first_merge, m.last_merge"""
