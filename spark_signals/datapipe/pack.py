"""Context-window sequence packing: the manifest that turns a curated
corpus into fixed-length training windows.

GPT-style pretraining concatenates documents (in a fixed order, with an
EOS/boundary token between them) and slices the stream into CTX_LEN-token
windows. The operator below computes, for every document, WHERE it lands
in that stream — shard, token offset, first/last window index, and whether
it straddles a window boundary — without materializing the stream itself:
the manifest is what a downstream tokenizer/writer needs to emit shards in
parallel.

Shape at 100 TB: a global concatenation order would serialize the world,
so packing is SHARDED (the universal practice — each worker packs its own
shard): shard = doc_id mod NUM_SHARDS, and within a shard the order is
(doc_id) — deterministic, engine-independent. The cumulative token offset
is one window cumsum per shard (a single hash shuffle on the shard key;
each shard's window is independent, so 1000 executors pack 1000+ shards
with zero coordination). All arithmetic is exact int64 — the manifest is
bit-reproducible and DuckDB-oracle-checkable.

Reference basis: the reference engine has no training-data surface at all
(flink-signals stops at market analytics); this operator exists for the
100 TB training-pipeline mandate, mirroring the packed-sequence layout of
GPT-3 (arXiv:2005.14165 §2.3: "documents are packed into sequences").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, n_tokens_col, sql_n_tokens

CTX_LEN = 64  # tokens per training window (tiny for the synthetic corpus)
NUM_SHARDS = 8
# +1: every document is followed by one boundary (EOS) token in the stream
EOS_TOKENS = 1


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """Per-document packing manifest over the sharded concatenation stream.

    Returns (doc_id, shard, n_tokens, tok_offset, first_window, last_window,
    spans_boundary): ``tok_offset`` is the document's starting token position
    inside its shard's stream (documents concatenated in doc_id order,
    EOS_TOKENS appended to each), ``first_window``/``last_window`` the
    ctx_len-window indices its tokens touch, and ``spans_boundary`` whether
    a window boundary cuts through it (the attention-masking decision a
    trainer makes per document).

    ``token_counter`` is the shared currency from
    :func:`spark_signals.datapipe.text.n_tokens_col` — the SAME counter
    prices the mixing manifest, so Σ manifest tokens reconciles with Σ
    packing tokens (pinned by a test).
    """
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % num_shards).alias("shard"),
        n_tokens_col(F.col("text"), token_counter).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stride = F.col("n_tokens") + F.lit(EOS_TOKENS)
    out = toks.withColumn(
        "tok_offset", F.coalesce(F.sum(stride).over(w), F.lit(0)).cast("bigint")
    )
    # last token of the document itself (EOS excluded: a trailing EOS in the
    # next window does not make the DOCUMENT span windows)
    last_tok = F.col("tok_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return out.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / ctx_len).cast("bigint").alias("first_window"),
        F.floor(last_tok / ctx_len).cast("bigint").alias("last_window"),
        (
            F.floor(F.col("tok_offset") / ctx_len) != F.floor(last_tok / ctx_len)
        ).alias("spans_boundary"),
    )


def pack_windows(
    docs: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """The writer's work order: one row per (window, document) slice.

    Explodes each manifest row over the ctx_len windows its tokens touch
    and reports the document-token span that lands in each window —
    (shard, window, doc_id, tok_start, tok_end, n_window_tokens), with
    tok_start/tok_end as positions in the shard stream. A shard writer can
    then emit window w by concatenating its slices in tok_start order with
    no further coordination. Documents with zero tokens occupy no window.

    Shape: the manifest's single shard shuffle + one Generate whose output
    is Σ windows-touched rows (≈ corpus_tokens / ctx_len + n_docs) — no
    joins, exact int64 arithmetic throughout.
    """
    m = pack_sequences(docs, ctx_len, num_shards, token_counter).filter(
        F.col("n_tokens") > 0
    )
    w = F.explode(F.sequence("first_window", "last_window")).alias("window")
    last_tok = F.col("tok_offset") + F.col("n_tokens") - 1
    out = m.select("doc_id", "shard", "tok_offset", "n_tokens", w)
    tok_start = F.greatest(F.col("tok_offset"), F.col("window") * ctx_len)
    tok_end = F.least(last_tok, (F.col("window") + 1) * F.lit(ctx_len) - 1)
    return out.select(
        "shard",
        "window",
        "doc_id",
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        (tok_end - tok_start + 1).alias("n_window_tokens"),
    )


def _sql_pack_ctes(
    ctx_len: int, num_shards: int, token_counter: str = TOKEN_COUNTER_DEFAULT
) -> list[str]:
    """The manifest as composable CTEs (toks, o, manifest) — shared by the
    manifest oracle and the per-window composition oracle."""
    return [
        f"""toks AS (
  SELECT doc_id, doc_id % {num_shards} AS shard,
         {sql_n_tokens("text", token_counter)} AS n_tokens
  FROM documents
)""",
        f"""o AS (
  SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens + {EOS_TOKENS}) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM toks
)""",
        f"""manifest AS (
  SELECT doc_id, shard, n_tokens, tok_offset,
         CAST(floor(CAST(tok_offset AS DOUBLE) / {ctx_len}) AS BIGINT) AS first_window,
         CAST(floor(CAST(tok_offset + greatest(n_tokens - 1, 0) AS DOUBLE) / {ctx_len}) AS BIGINT) AS last_window,
         floor(CAST(tok_offset AS DOUBLE) / {ctx_len})
           <> floor(CAST(tok_offset + greatest(n_tokens - 1, 0) AS DOUBLE) / {ctx_len}) AS spans_boundary
  FROM o
)""",
    ]


def sql_pack_sequences(ctx_len: int = CTX_LEN, num_shards: int = NUM_SHARDS) -> str:
    return (
        "WITH "
        + ",\n".join(_sql_pack_ctes(ctx_len, num_shards))
        + "\nSELECT doc_id, shard, n_tokens, tok_offset, first_window, last_window, spans_boundary FROM manifest"
    )


def sql_pack_windows(ctx_len: int = CTX_LEN, num_shards: int = NUM_SHARDS) -> str:
    ctes = _sql_pack_ctes(ctx_len, num_shards)
    ctes.append(
        """e AS (
  SELECT shard, doc_id, tok_offset, n_tokens,
         unnest(range(first_window, last_window + 1)) AS "window"
  FROM manifest WHERE n_tokens > 0
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT shard, "window", doc_id,
       greatest(tok_offset, "window" * {ctx_len}) AS tok_start,
       least(tok_offset + n_tokens - 1, ("window" + 1) * {ctx_len} - 1) AS tok_end,
       least(tok_offset + n_tokens - 1, ("window" + 1) * {ctx_len} - 1)
         - greatest(tok_offset, "window" * {ctx_len}) + 1 AS n_window_tokens
FROM e"""
    )


# ------------------------------------------------- training-order shuffle
# Trainers must read windows in a GLOBAL pseudo-random order (sequential
# shard order correlates adjacent batches with crawl locality), and every
# data-loader rank needs a stable, disjoint slice of that order. Hashing
# gives both without a coordination step: order_key = md5(shard:window) is
# a reproducible permutation of the window stream (readers ORDER BY
# order_key — a distributed sort at read time, the one total order worth
# paying for), and reader = hash mod n_readers is an even, deterministic
# rank assignment. Resharding the corpus never reorders surviving windows
# relative to each other, so a resumed run replays the same stream.
N_READERS = 4


def shuffle_windows(
    docs: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    n_readers: int = N_READERS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """(shard, window, n_docs, n_window_tokens, order_key, reader): one row
    per training window with its global shuffle key and data-loader rank.

    Shape: pack_windows' single shard-keyed shuffle, one (shard, window)
    aggregate to collapse per-document slices, then pure per-row hash
    projections — no extra corpus-scale shuffle, no window functions, and
    the reader assignment is exact int64 (engine-independent)."""
    slices = pack_windows(docs, ctx_len, num_shards, token_counter)
    wins = slices.groupBy("shard", "window").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_window_tokens").cast("bigint").alias("n_window_tokens"),
    )
    okey = F.md5(
        F.concat(
            F.col("shard").cast("string"),
            F.lit(":"),
            F.col("window").cast("string"),
        )
    )
    bucket = F.conv(F.substring(okey, 1, 8), 16, 10).cast("bigint")
    return wins.select(
        "shard",
        "window",
        "n_docs",
        "n_window_tokens",
        okey.alias("order_key"),
        F.pmod(bucket, F.lit(n_readers)).cast("int").alias("reader"),
    )


def sql_shuffle_windows(
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    n_readers: int = N_READERS,
) -> str:
    ctes = _sql_pack_ctes(ctx_len, num_shards)
    ctes.append(
        """e AS (
  SELECT shard, doc_id, tok_offset, n_tokens,
         unnest(range(first_window, last_window + 1)) AS "window"
  FROM manifest WHERE n_tokens > 0
)"""
    )
    ctes.append(
        f"""wins AS (
  SELECT shard, "window",
         count(*)::BIGINT AS n_docs,
         CAST(SUM(least(tok_offset + n_tokens - 1, ("window" + 1) * {ctx_len} - 1)
              - greatest(tok_offset, "window" * {ctx_len}) + 1) AS BIGINT) AS n_window_tokens
  FROM e GROUP BY shard, "window"
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT shard, "window", n_docs, n_window_tokens,
       md5(CAST(shard AS VARCHAR) || ':' || CAST("window" AS VARCHAR)) AS order_key,
       CAST(('0x' || substr(md5(CAST(shard AS VARCHAR) || ':' || CAST("window" AS VARCHAR)), 1, 8))::BIGINT % {n_readers} AS INT) AS reader
FROM wins"""
    )


# --------------------------------------------------- packing efficiency
def pack_efficiency_report(
    docs: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """The tuning report for the packing stage: one row per shard pricing
    what a ctx_len choice costs — the numbers a trainer compares when
    picking window length and shard count.

    Columns: ``n_docs`` / ``doc_tokens`` (real content), ``eos_tokens``
    (separator overhead, EOS_TOKENS per document), ``stream_tokens``
    (what the windows must carry), ``n_windows`` (ceil(stream/ctx)),
    ``tail_waste`` (padding in the shard's final partial window — the
    ONLY padding dense concatenation pays), ``n_boundary_docs`` /
    ``boundary_doc_tokens`` (documents a window boundary cuts — the
    attention-masking cost: larger ctx buys fewer cut documents at more
    cross-document attention to mask), and ``fill_rate_u`` = content
    tokens per window-capacity token on the exact 1e-6 grid.

    Shape: the manifest's single shard shuffle collapsed by one
    aggregate — S = num_shards rows out; every column is exact int64
    except the one gridded ratio (the repo's float-parity currency).
    """
    m = pack_sequences(docs, ctx_len, num_shards, token_counter)
    agg = m.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("doc_tokens"),
        (F.count(F.lit(1)) * F.lit(EOS_TOKENS)).cast("bigint").alias("eos_tokens"),
        F.sum(F.col("spans_boundary").cast("bigint")).alias("n_boundary_docs"),
        F.sum(
            F.when(F.col("spans_boundary"), F.col("n_tokens")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("boundary_doc_tokens"),
    )
    stream = F.col("doc_tokens") + F.col("eos_tokens")
    # exact ceil(stream/ctx) for stream >= 1 via the repo's exact-int
    # floor-division rule; a shard only appears if it has >= 1 document,
    # and every document contributes at least its EOS, so stream >= 1
    prev = stream - F.lit(1)
    n_windows = ((prev - prev % F.lit(ctx_len)) / F.lit(ctx_len)).cast("bigint") + F.lit(1)
    capacity = n_windows * F.lit(ctx_len)
    fill_u = F.floor(
        F.col("doc_tokens").cast("double") / capacity.cast("double") * 1e6
        + F.lit(0.5000001)
    ).cast("bigint")
    return agg.select(
        "shard",
        "n_docs",
        "doc_tokens",
        "eos_tokens",
        stream.cast("bigint").alias("stream_tokens"),
        n_windows.alias("n_windows"),
        (capacity - stream).cast("bigint").alias("tail_waste"),
        "n_boundary_docs",
        "boundary_doc_tokens",
        fill_u.alias("fill_rate_u"),
    )


def sql_pack_efficiency_report(
    ctx_len: int = CTX_LEN, num_shards: int = NUM_SHARDS
) -> str:
    ctes = _sql_pack_ctes(ctx_len, num_shards)
    ctes.append(
        f"""agg AS (
  SELECT shard,
         count(*)::BIGINT AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS doc_tokens,
         CAST(count(*) * {EOS_TOKENS} AS BIGINT) AS eos_tokens,
         CAST(SUM(CASE WHEN spans_boundary THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
         CAST(SUM(CASE WHEN spans_boundary THEN n_tokens ELSE 0 END) AS BIGINT) AS boundary_doc_tokens
  FROM manifest GROUP BY shard
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT shard, n_docs, doc_tokens, eos_tokens,
       CAST(doc_tokens + eos_tokens AS BIGINT) AS stream_tokens,
       CAST((doc_tokens + eos_tokens - 1) // {ctx_len} + 1 AS BIGINT) AS n_windows,
       CAST(((doc_tokens + eos_tokens - 1) // {ctx_len} + 1) * {ctx_len}
            - (doc_tokens + eos_tokens) AS BIGINT) AS tail_waste,
       n_boundary_docs, boundary_doc_tokens,
       CAST(floor(CAST(doc_tokens AS DOUBLE)
            / CAST(((doc_tokens + eos_tokens - 1) // {ctx_len} + 1) * {ctx_len} AS DOUBLE)
            * 1e6 + 0.5000001) AS BIGINT) AS fill_rate_u
FROM agg"""
    )


# --------------------------------------------------- incremental packing
def pack_tail(
    docs: DataFrame,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """The persistable resume state of the packing stage: one row per
    shard with the concatenation stream's current length —
    (shard, stream_tokens). A nightly corpus drop extends each shard's
    stream from here without re-pricing the first 100 TB (the
    digest-index discipline applied to packing)."""
    return (
        docs.select(
            (F.col("doc_id") % num_shards).alias("shard"),
            (n_tokens_col(F.col("text"), token_counter) + F.lit(EOS_TOKENS)).alias(
                "stride"
            ),
        )
        .groupBy("shard")
        .agg(F.sum("stride").cast("bigint").alias("stream_tokens"))
    )


def pack_incremental(
    batch_docs: DataFrame,
    tail: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """Pack an incoming batch as an EXTENSION of the existing shard
    streams — O(batch) work against the persisted :func:`pack_tail`
    state, never a corpus re-pack.

    Returns ``(manifest, new_tail)``: ``manifest`` has exactly
    :func:`pack_sequences`'s schema for the batch documents, with
    ``tok_offset`` continuing from the tail; ``new_tail`` is the full
    updated per-shard state (tail rows for untouched shards pass
    through).

    EXACT-EQUIVALENCE INVARIANT (the lane's oracle): under the
    append-only id discipline — every batch doc_id sorts after every
    already-packed doc_id — this equals the GLOBAL
    ``pack_sequences(old ∪ batch)`` restricted to batch documents,
    value-identical, because per-shard concatenation order is doc_id and
    the tail is precisely the prior stream length. Out-of-order ids
    violate the precondition the same way they would violate any
    append-only log; the caller owns id monotonicity (the ingest lanes'
    batch_id discipline provides it).
    """
    toks = batch_docs.select(
        "doc_id",
        (F.col("doc_id") % num_shards).alias("shard"),
        n_tokens_col(F.col("text"), token_counter).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stride = F.col("n_tokens") + F.lit(EOS_TOKENS)
    based = (
        toks.withColumn(
            "off_in_batch",
            F.coalesce(F.sum(stride).over(w), F.lit(0)).cast("bigint"),
        )
        .join(F.broadcast(tail.withColumnRenamed("stream_tokens", "base")), "shard", "left")
        .withColumn("base", F.coalesce(F.col("base"), F.lit(0)).cast("bigint"))
        .withColumn("tok_offset", (F.col("base") + F.col("off_in_batch")).cast("bigint"))
    )
    last_tok = F.col("tok_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    manifest = based.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / ctx_len).cast("bigint").alias("first_window"),
        F.floor(last_tok / ctx_len).cast("bigint").alias("last_window"),
        (
            F.floor(F.col("tok_offset") / ctx_len) != F.floor(last_tok / ctx_len)
        ).alias("spans_boundary"),
    )
    batch_sums = (
        toks.select("shard", stride.alias("stride"))
        .groupBy("shard")
        .agg(F.sum("stride").cast("bigint").alias("batch_tokens"))
    )
    new_tail = (
        tail.join(batch_sums, "shard", "full_outer")
        .select(
            "shard",
            (
                F.coalesce(F.col("stream_tokens"), F.lit(0))
                + F.coalesce(F.col("batch_tokens"), F.lit(0))
            )
            .cast("bigint")
            .alias("stream_tokens"),
        )
    )
    return manifest, new_tail


def pack_incremental_snapshot(
    docs: DataFrame,
    ctx_len: int = CTX_LEN,
    num_shards: int = NUM_SHARDS,
    token_counter: str = TOKEN_COUNTER_DEFAULT,
) -> DataFrame:
    """Driver-checkable face of the incremental packing lane: the corpus
    splits at the 4/5 doc_id threshold (append-only ids — the batch is
    the ids ABOVE the cut, unlike the mod-split faces, because offsets
    are order-dependent), the snapshot's tail is built, and the batch is
    packed against it. By the exact-equivalence invariant the oracle is
    the GLOBAL manifest restricted to batch ids."""
    mx = docs.agg(F.max("doc_id").alias("mx"))
    # threshold = floor(4*(max+1)/5), exact-integer floor division
    num = (F.col("mx") + F.lit(1)) * F.lit(4)
    thresh = ((num - num % F.lit(5)) / F.lit(5)).cast("bigint")
    witht = docs.crossJoin(F.broadcast(mx.select(thresh.alias("t"))))
    snapshot = witht.filter(F.col("doc_id") < F.col("t")).drop("t")
    batch = witht.filter(F.col("doc_id") >= F.col("t")).drop("t")
    manifest, _tail = pack_incremental(
        batch, pack_tail(snapshot, num_shards, token_counter), ctx_len, num_shards, token_counter
    )
    return manifest


def sql_pack_incremental_snapshot(
    ctx_len: int = CTX_LEN, num_shards: int = NUM_SHARDS
) -> str:
    """The global manifest restricted to the batch split — exact by the
    equivalence invariant (see pack_incremental)."""
    inner = sql_pack_sequences(ctx_len, num_shards)
    return f"""
WITH _global AS ({inner}),
_t AS (SELECT (4 * (MAX(doc_id) + 1)) // 5 AS t FROM documents)
SELECT g.* FROM _global g, _t WHERE g.doc_id >= _t.t"""
