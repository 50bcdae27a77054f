"""BM25 lexical retrieval over the document corpus — the sparse half of a
retrieval stack (the dense half is datapipe.embed + datapipe.similarity).

Training-data pipelines use lexical top-k constantly: sourcing domain
exemplars for the quality classifier, pulling decontamination candidates
for an eval question, building retrieval corpora for RAG evals. BM25
(Robertson-Sparck Jones; the Okapi form every search engine implements)
needs only two aggregates the tf-idf stage already computes.

Determinism contract: idf/length-normalization run through ln() (libm),
so scores grid to 1e-6 BEFORE the rank order, ties break on doc_id — the
same cross-engine discipline as tfidf_top_terms.

Shape at 100 TB: query terms are a constant ≤q-element set, so scoring is
ONE explode → semi-filter on the broadcast term set → (doc_id, word) count
agg → join with the q-row df relation → per-doc weighted sum; the final
top-k is a TakeOrdered heap, no global sort. The corpus shuffles only as
matched (doc_id, term) pairs — documents containing no query term never
leave their scan partition: document length ``dl`` rides ON the matched
pairs (it is computed in the same Project as the explode and carried
through the tf aggregate), so there is no full-corpus lens relation for
the planner to shuffle (r7 verdict: the old ``tf.join(lens)`` was only
broadcast-free by planner luck). The corpus-wide (N, Σdl) stats are one
map-side-combinable aggregate to a single broadcast row.

Query terms are normalized with the corpus token rule (ASCII-lower) on
entry — a query containing uppercase letters matches exactly what its
lowercased form matches, on both the lexical and dense paths (r7
advisory: verbatim terms silently matched nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.checkpoint import pin

from spark_signals.datapipe.text import ASCII_LO, ASCII_UP, words_col

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25
# default probe: mid-frequency terms of the synthetic corpus (callers pass
# their own query)
BM25_DEFAULT_QUERY = ("hash", "join", "spark")


def _grid6(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)


_ASCII_LOWER = str.maketrans(ASCII_UP, ASCII_LO)


def _norm_terms(query_terms: tuple[str, ...]) -> list[str]:
    """Deduplicated query terms under the corpus token rule: ASCII-lower
    (exactly what words_col applies to document text — NOT str.lower(),
    which also folds non-ASCII and would diverge from the corpus side)."""
    return sorted({t.translate(_ASCII_LOWER) for t in query_terms})


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query:
    (doc_id, score, n_matched_terms, rank).

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative Okapi
    variant. |d| counts whitespace tokens (the shared token currency);
    avgdl is exact (int64 total / N as one IEEE division).
    """
    from spark_signals.datapipe.util import explode_strings

    terms = _norm_terms(query_terms)
    term_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        "doc_id", words_col(F.col("text")).alias("words")
    ).withColumn("dl", F.size("words"))
    # N, Σdl AND every per-term document frequency come out of ONE
    # map-side-combinable scan: terms are a constant ≤q set, so df_t is
    # just Σ array_contains(words, t) — no (doc_id, word) relation ever
    # needs a second pass to count distinct docs per term
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum(F.array_contains("words", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    # dl rides the matched pairs: unmatched documents contribute only to
    # the stats row and never cross a shuffle
    words = explode_strings(base, F.col("words"), "word", "doc_id", "dl").filter(
        F.array_contains(term_arr, F.col("word"))
    )
    tf = words.groupBy("doc_id", "word", "dl").agg(F.count(F.lit(1)).alias("tf"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    dfv = F.element_at(
        F.map_from_arrays(
            term_arr, F.array(*[F.col(f"df_{i}") for i in range(len(terms))])
        ),
        F.col("word"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - dfv + F.lit(0.5)) / (dfv + F.lit(0.5))
    )
    per_term = tf.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "word",
        (
            idf
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
            )
        ).alias("w_score"),
    )
    scored = per_term.groupBy("doc_id").agg(
        _grid6(F.sum("w_score")).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    topped = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return _rank_listagg(topped, ["score", "doc_id", "n_matched_terms"]).select(
        "doc_id", "score", "n_matched_terms", "rank"
    )


def _rank_listagg(topped: DataFrame, cols: list[str]) -> DataFrame:
    """Rank the ≤k survivors of a TakeOrdered heap (orderBy+limit upstream)
    via one sort_array aggregate — window-free (see kmeans_seeds). The
    first column of ``cols`` must be the score (descending), ties break on
    the second column ascending."""
    score, tiebreak = cols[0], cols[1]
    agg = topped.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(score)).alias("neg_s"),
                    F.col(tiebreak).alias("tb"),
                    *[F.col(c).alias(c) for c in cols],
                )
            )
        ).alias("a")
    )
    return agg.select(F.posexplode("a").alias("pos", "s")).select(
        *[F.col(f"s.{c}").alias(c) for c in cols],
        (F.col("pos") + 1).alias("rank"),
    )


BM25_MULTI_DEFAULT: dict[str, tuple[str, ...]] = {
    # two probe queries over the synthetic corpus; callers pass their own
    "q_hash": ("hash", "join", "spark"),
    "q_scan": ("scan", "filter", "sort"),
}
TOPK_SALTS = 8  # partial-top-k fanout per query (skew control)


def bm25_topk_queries(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]] | DataFrame = None,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    n_salts: int = TOPK_SALTS,
) -> DataFrame:
    """BM25 for MANY queries in ONE corpus pass — the decontamination /
    exemplar-sourcing shape, where thousands of eval questions each need
    their lexical top-k: (query_id, doc_id, score, n_matched_terms, rank).

    ``queries`` is a (query_id, term) relation (or a {query_id: terms}
    dict, normalized with the corpus token rule). The corpus is exploded
    ONCE; the matched (doc_id, term, dl) tf relation is persisted and
    reused for document frequencies and all per-query scores — per-query
    cost after the shared pass is one broadcast join on term.

    Per-query top-k is a salted two-stage heap, window-free and skew-safe:
    partial top-k per (query_id, salt-of-doc_id) via one sort_array
    aggregate bounded at k rows out per group, then a final ≤(salts·k)-row
    merge per query — a common query term never funnels its whole
    candidate set through one task the way Window.partitionBy(query_id)
    would (the ccnet_lm_buckets lesson, applied before it ships)."""
    from spark_signals.datapipe.util import explode_strings

    if queries is None:
        queries = BM25_MULTI_DEFAULT
    if isinstance(queries, dict):
        rows = sorted(
            {(qid, t) for qid, terms in queries.items() for t in _norm_terms(terms)}
        )
        qrel = docs.sparkSession.createDataFrame(
            rows, "query_id string, term string"
        )
    else:
        qrel = queries.select(
            "query_id", F.translate("term", ASCII_UP, ASCII_LO).alias("term")
        ).distinct()
    base = docs.select(
        "doc_id", words_col(F.col("text")).alias("words")
    ).withColumn("dl", F.size("words"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    terms_only = qrel.select(F.col("term").alias("word")).distinct()
    matched = explode_strings(base, F.col("words"), "word", "doc_id", "dl").join(
        F.broadcast(terms_only), "word", "left_semi"
    )
    tf = (
        matched.groupBy("doc_id", "word", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    try:
        dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
        avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        per_term = (
            tf.join(F.broadcast(dfreq), "word")
            .join(F.broadcast(qrel.withColumnRenamed("term", "word")), "word")
            .crossJoin(F.broadcast(stats))
            .select(
                "query_id",
                "doc_id",
                (
                    idf
                    * (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
                    )
                ).alias("w_score"),
            )
        )
        scored = per_term.groupBy("query_id", "doc_id").agg(
            _grid6(F.sum("w_score")).alias("score"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        entry = F.struct(
            (-F.col("score")).alias("neg_s"),
            F.col("doc_id").alias("tb"),
            F.col("doc_id").alias("doc_id"),
            F.col("score").alias("score"),
            F.col("n_matched_terms").alias("n_matched_terms"),
        )
        partial = (
            scored.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(n_salts)))
            .groupBy("query_id", "salt")
            .agg(
                F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("top")
            )
        )
        merged = (
            partial.select("query_id", F.explode("top").alias("s"))
            .groupBy("query_id")
            .agg(F.slice(F.sort_array(F.collect_list("s")), 1, k).alias("top"))
        )
        out = merged.select(
            "query_id", F.posexplode("top").alias("pos", "s")
        ).select(
            "query_id",
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.score").alias("score"),
            F.col("s.n_matched_terms").alias("n_matched_terms"),
            (F.col("pos") + 1).alias("rank"),
        )
        return out.transform(pin)
    finally:
        tf.unpersist()


def sql_bm25_topk_queries(
    queries: dict[str, tuple[str, ...]] | None = None,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    source: str = "documents",
) -> str:
    """Oracle twin of :func:`bm25_topk_queries` (dict form)."""
    from spark_signals.datapipe.text import ASCII_LO as _LO
    from spark_signals.datapipe.text import ASCII_UP as _UP

    if queries is None:
        queries = BM25_MULTI_DEFAULT
    rows = sorted(
        {(qid, t) for qid, terms in queries.items() for t in _norm_terms(terms)}
    )
    vals = ", ".join(f"('{q}', '{t}')" for q, t in rows)
    return f"""
WITH qrel AS (SELECT * FROM (VALUES {vals}) q(query_id, term)),
base AS (
  SELECT doc_id,
         list_filter(string_split_regex(translate(text, '{_UP}', '{_LO}'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
lens AS (SELECT doc_id, len(words) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM lens),
dwords AS (SELECT doc_id, unnest(words) AS word FROM base),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM dwords
  WHERE word IN (SELECT DISTINCT term FROM qrel) GROUP BY 1, 2
),
dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT q.query_id, tf.doc_id,
         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * CAST({k1 + 1.0!r} AS DOUBLE))
           / (tf.tf + CAST({k1!r} AS DOUBLE)
              * (CAST({1.0 - b!r} AS DOUBLE)
                 + CAST({b!r} AS DOUBLE) * lens.dl
                   / (CAST(stats.total_dl AS DOUBLE) / stats.n_docs))) AS w_score
  FROM tf
  JOIN qrel q ON q.term = tf.word
  JOIN dfreq USING (word) JOIN lens USING (doc_id) CROSS JOIN stats
),
mscored AS (
  SELECT query_id, doc_id,
         floor(SUM(w_score) * 1e6 + 0.5000001) / 1e6 AS score,
         COUNT(*) AS n_matched_terms
  FROM per_term GROUP BY 1, 2
),
mranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM mscored
)
SELECT query_id, doc_id, score, n_matched_terms, CAST(rank AS INTEGER) AS rank
FROM mranked WHERE rank <= {k}"""


# ------------------------------------------------- hybrid dense+lexical RRF
RRF_K0 = 60  # the canonical reciprocal-rank-fusion constant (Cormack 2009)
RRF_TOP_K = 25


def _query_vector(terms: tuple[str, ...], dim: int) -> list[float]:
    """The feature-hashed unit vector of the bag-of-terms query, computed
    plan-build-side with the EXACT recipe of ``embed.hash_embed`` (first 8
    md5 hex chars mod dim → bucket, 9th nibble parity → sign, L2-normalize,
    1e-6 grid). hashlib/Spark/DuckDB md5 agree on ASCII input, so the
    literal array injected into both plans is the vector hash_embed would
    produce for the query text."""
    import hashlib
    import math

    raw = [0.0] * dim
    for t in terms:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        sign = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        raw[int(h[:8], 16) % dim] += sign
    nrm = math.sqrt(sum(v * v for v in raw))
    if nrm == 0.0:
        return raw
    return [math.floor(v / nrm * 1e6 + 0.5000001) / 1e6 for v in raw]


def dense_hash_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
) -> DataFrame:
    """Dense top-k for the query under the feature-hashed embedder:
    (doc_id, cosine, rank). The pluggable-embedder contract of
    datapipe.embed applies — swap hash_embed for a neural encoder and this
    ranking (and the fusion below) is unchanged.

    Shape at 100 TB: document embeddings come from two int-carrying hash
    shuffles (hash_embed); the query vector is a CONSTANT literal array, so
    scoring is a zero-join per-row fold and the top-k is a TakeOrdered
    heap. Production would swap the scan for the IVF cell-probe
    (similarity.ann_ivf_trained_topk) — this is the exact baseline.
    """
    from spark_signals.datapipe.embed import EMBED_DIM, hash_embed
    from spark_signals.datapipe.util import spread_small_input

    terms = _norm_terms(query_terms)
    qv = _query_vector(tuple(terms), EMBED_DIM)
    qarr = F.array(*[F.lit(v) for v in qv])
    emb = hash_embed(spread_small_input(docs))
    # embedding and the query literal are both unit vectors → dot = cosine
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = emb.select("doc_id", _grid6(dot).alias("cosine"))
    topped = scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)
    return _rank_listagg(topped, ["cosine", "doc_id"]).select(
        "doc_id", "cosine", "rank"
    )


def build_dense_ivf_index(
    docs: DataFrame,
    n_cells: int | None = None,
    iters: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The offline IVF index build for dense_ivf_topk, returned as
    ``(emb, centroids, cells)`` so a serving loop trains ONCE and probes
    per query — the real index economics (the Lloyd loop is minutes of
    barrier-synchronized work at corpus scale; a per-query rebuild would
    dwarf every probe). Persist all three relations (or write them out,
    as examples/retrieval_stack.py does with the centroids) and hand the
    tuple to ``dense_ivf_topk(..., index=...)`` for each query."""
    from spark_signals.datapipe.embed import hash_embed
    from spark_signals.datapipe.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        kmeans_assign_arrow,
        kmeans_train,
    )
    from spark_signals.datapipe.util import spread_small_input

    n_cells = KMEANS_K if n_cells is None else n_cells
    iters = KMEANS_ITERS if iters is None else iters
    emb = hash_embed(spread_small_input(docs)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).transform(pin)
    cents = kmeans_train(emb, n_cells, iters)  # (cluster_id, dim, c_val)
    cells = kmeans_assign_arrow(emb, cents).transform(pin)
    return emb, cents, cells


def dense_ivf_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    n_cells: int | None = None,
    iters: int | None = None,
    nprobe: int | None = None,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Dense top-k through the PRODUCTION serving shape: the trained IVF
    cell probe (similarity.kmeans_train) instead of dense_hash_topk's
    full-corpus scan. Same output contract (doc_id, cosine, rank), so the
    RRF fusion below is drop-in; recall < 1 vs the exact arm is the
    standard IVF trade (floor asserted in tests/test_ann_recall.py).

    Shape at 100 TB: the index build (Lloyd loop + assignment) is the
    amortized offline cost — pass a :func:`build_dense_ivf_index` result
    as ``index`` to train once and serve many queries (self-building is a
    convenience for one-shot calls and the checked query). Serving a
    query touches ONE k-row centroid aggregate (query→cell cosines
    against the broadcast k×D centroid relation), then scans only the
    ≤nprobe probed cells (a semi-join of the cell assignment against an
    nprobe-row broadcast); scoring is the same zero-join literal-vector
    fold as the exact arm. Per-query work is O(corpus/n_cells · nprobe),
    not O(corpus) (r7 verdict #3: the exact arm re-embedded the whole
    corpus per query).
    """
    from spark_signals.datapipe.embed import EMBED_DIM
    from spark_signals.datapipe.similarity import NPROBE, _cos_div

    nprobe = NPROBE if nprobe is None else nprobe
    terms = _norm_terms(query_terms)
    qv = _query_vector(tuple(terms), EMBED_DIM)
    qarr = F.array(*[F.lit(v) for v in qv])
    if index is None:
        index = build_dense_ivf_index(docs, n_cells, iters)
    emb, cents, cells = index
    # query → cell cosines: one aggregate over the k×D centroid relation,
    # query values looked up from the literal array by dim
    q_val = F.element_at(qarr, (F.col("dim") + 1).cast("int"))
    qc = cents.groupBy("cluster_id").agg(
        F.sum(q_val * F.col("c_val")).alias("dot"),
        F.sum(q_val * q_val).alias("qq"),
        F.sum(F.col("c_val") * F.col("c_val")).alias("cc"),
    ).select(
        "cluster_id",
        _grid6(_cos_div(F.col("dot"), F.sqrt("qq") * F.sqrt("cc"))).alias("c_cos"),
    )
    probes = qc.orderBy(F.desc("c_cos"), F.asc("cluster_id")).limit(nprobe)
    cand = emb.join(
        cells.join(F.broadcast(probes.select("cluster_id")), "cluster_id").select(
            "vec_id"
        ),
        "vec_id",
    )
    # both unit vectors → dot = cosine (same scoring as the exact arm)
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = cand.select(F.col("vec_id").alias("doc_id"), _grid6(dot).alias("cosine"))
    topped = scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)
    return _rank_listagg(topped, ["cosine", "doc_id"]).select(
        "doc_id", "cosine", "rank"
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    k0: int = RRF_K0,
    dense_arm=None,
) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 lexical top-k and the dense
    embedding top-k — the stock hybrid-retrieval recipe (Cormack et al.
    2009; what every lexical+vector search stack ships):
    (doc_id, rrf_score, lex_rank, dense_rank, rank).

    rrf = Σ_lists 1/(k0 + rank), summed lexical-then-dense in a fixed
    order (two IEEE divisions — engine-identical), gridded to 1e-9 before
    the final rank; ties break on doc_id.

    Shape at 100 TB: both inputs are ≤k-row rank lists, fused via
    union + one k-row groupBy (no outer join — a full-outer on two tiny
    relations would force a sort-merge plan); everything downstream of the
    two TakeOrdered heaps moves O(k) rows. ``dense_arm`` picks the dense
    ranker: the exact scan baseline by default, dense_ivf_topk for the
    production cell-probe shape (hybrid_rrf_ivf_topk below).
    """
    dense_fn = dense_hash_topk if dense_arm is None else dense_arm
    lex = bm25_topk(docs, query_terms, k).select(
        "doc_id",
        F.col("rank").alias("lex_rank"),
        F.lit(None).cast("int").alias("dense_rank"),
    )
    dense = dense_fn(docs, query_terms, k).select(
        "doc_id",
        F.lit(None).cast("int").alias("lex_rank"),
        F.col("rank").alias("dense_rank"),
    )
    cand = (
        lex.unionByName(dense)
        .groupBy("doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("dense_rank").alias("dense_rank"),
        )
    )
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(k0)) + F.col(c)), F.lit(0.0)
    )
    rrf = F.floor(
        (contrib("lex_rank") + contrib("dense_rank")) * F.lit(1e9)
        + F.lit(0.5000001)
    ) / F.lit(1e9)
    scored = cand.select("doc_id", rrf.alias("rrf_score"), "lex_rank", "dense_rank")
    topped = scored.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)
    return _rank_listagg(
        topped, ["rrf_score", "doc_id", "lex_rank", "dense_rank"]
    ).select("doc_id", "rrf_score", "lex_rank", "dense_rank", "rank")


def hybrid_rrf_ivf_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    k0: int = RRF_K0,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """hybrid_rrf_topk with the PRODUCTION dense arm: the trained IVF cell
    probe (dense_ivf_topk) instead of the exact full-corpus scan — the
    shape a serving stack actually runs (r7 verdict #3). Pass a
    :func:`build_dense_ivf_index` result as ``index`` when fusing many
    queries against one corpus (train once, probe per query)."""
    if index is None:
        arm = dense_ivf_topk
    else:
        arm = lambda d, t, kk: dense_ivf_topk(d, t, kk, index=index)  # noqa: E731
    return hybrid_rrf_topk(docs, query_terms, k, k0, dense_arm=arm)


def _sql_demb_ctes(source: str) -> str:
    """The hash_embed recipe inlined over ``source`` as a CTE chain ending
    in demb(doc_id, embedding) — shared by the exact-scan and IVF-probed
    dense oracles (mirrors embed.sql_embed_chunks, but tokenizing raw text
    with the shared words_col regex)."""
    from spark_signals.datapipe.embed import EMBED_DIM

    dim = EMBED_DIM
    return f"""dbase AS (
  SELECT doc_id,
         list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
dw AS (SELECT doc_id, unnest(words) AS word FROM dbase),
dh AS (
  SELECT doc_id,
         ('0x' || substring(md5(word), 1, 8))::BIGINT % {dim} AS bucket,
         CASE WHEN ('0x' || substring(md5(word), 9, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM dw
),
ds AS (SELECT doc_id, bucket, SUM(sign) AS v FROM dh GROUP BY doc_id, bucket),
da AS (SELECT doc_id, map_from_entries(list(row(bucket, v))) AS m FROM ds GROUP BY doc_id),
dr AS (
  SELECT doc_id,
         list_transform(range(0, {dim}), d -> CAST(COALESCE(m[d][1], 0) AS DOUBLE)) AS raw
  FROM da
),
dn AS (
  SELECT doc_id, raw, sqrt(list_sum(list_transform(raw, v -> v * v))) AS nrm FROM dr
),
demb AS (
  SELECT doc_id,
         list_transform(raw, v -> CAST(floor(v / greatest(nrm, 1e-300) * 1e6 + 0.5000001) / 1e6 AS FLOAT)) AS embedding
  FROM dn
)"""


def _sql_qlit(query_terms: tuple[str, ...]) -> str:
    from spark_signals.datapipe.embed import EMBED_DIM

    terms = _norm_terms(query_terms)
    qv = _query_vector(tuple(terms), EMBED_DIM)
    return "[" + ", ".join(repr(v) for v in qv) + "]"


def sql_dense_hash_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    source: str = "documents",
) -> str:
    """Oracle twin of dense_hash_topk: the shared demb chain scored
    against the same literal query vector."""
    from spark_signals.datapipe.embed import EMBED_DIM

    qlit = _sql_qlit(query_terms)
    dim = EMBED_DIM
    return f"""
WITH {_sql_demb_ctes(source)},
dscored AS (
  SELECT doc_id,
         floor(list_sum(list_transform(range(1, {dim} + 1),
             i -> CAST(embedding[i] AS DOUBLE) * ({qlit})[i])) * 1e6 + 0.5000001) / 1e6 AS cosine
  FROM demb
),
dranked AS (
  SELECT doc_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM dscored
)
SELECT doc_id, cosine, CAST(rank AS INTEGER) AS rank FROM dranked WHERE rank <= {k}"""


def sql_dense_ivf_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    n_cells: int | None = None,
    iters: int | None = None,
    nprobe: int | None = None,
    source: str = "documents",
) -> str:
    """Oracle twin of dense_ivf_topk: the shared demb chain feeds the
    UNROLLED k-means CTEs (similarity._sql_kmeans_ctes, trained on the
    corpus embeddings), the literal query probes the nprobe nearest cells
    by gridded cosine, and only documents assigned to probed cells are
    scored — the exact cross-engine mirror of the Spark cell-probe plan."""
    from spark_signals.datapipe.embed import EMBED_DIM
    from spark_signals.datapipe.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        NPROBE,
        _sql_kmeans_ctes,
        sql_kmeans_assign_cte,
    )

    n_cells = KMEANS_K if n_cells is None else n_cells
    iters = KMEANS_ITERS if iters is None else iters
    nprobe = NPROBE if nprobe is None else nprobe
    qlit = _sql_qlit(query_terms)
    dim = EMBED_DIM
    kmeans = ",\n".join(_sql_kmeans_ctes(n_cells, iters, source="corpus"))
    return f"""
WITH {_sql_demb_ctes(source)},
corpus AS (SELECT doc_id AS vec_id, embedding FROM demb),
{kmeans},
{sql_kmeans_assign_cte(iters)},
qc AS (
  SELECT cluster_id,
         floor((SUM(qv * c_val) / greatest(sqrt(SUM(qv * qv)) * sqrt(SUM(c_val * c_val)), 1e-300))
               * 1e6 + 0.5000001) / 1e6 AS c_cos
  FROM (SELECT cluster_id, dim, c_val, ({qlit})[dim + 1] AS qv FROM c{iters})
  GROUP BY cluster_id
),
probes AS (
  SELECT cluster_id
  FROM (SELECT *, row_number() OVER (ORDER BY c_cos DESC, cluster_id ASC) AS rn FROM qc)
  WHERE rn <= {nprobe}
),
ivfscored AS (
  SELECT c.vec_id AS doc_id,
         floor(list_sum(list_transform(range(1, {dim} + 1),
             i -> CAST(c.embedding[i] AS DOUBLE) * ({qlit})[i])) * 1e6 + 0.5000001) / 1e6 AS cosine
  FROM corpus c
  JOIN afin a ON a.vec_id = c.vec_id
  JOIN probes p ON p.cluster_id = a.cluster_id
),
ivfranked AS (
  SELECT doc_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM ivfscored
)
SELECT doc_id, cosine, CAST(rank AS INTEGER) AS rank FROM ivfranked WHERE rank <= {k}"""


def sql_hybrid_rrf_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    k0: int = RRF_K0,
    source: str = "documents",
    dense_sql=None,
) -> str:
    dense_sql_fn = sql_dense_hash_topk if dense_sql is None else dense_sql
    return f"""
WITH lex AS (
  SELECT doc_id, rank AS lex_rank FROM ({sql_bm25_topk(query_terms, k, source=source)}) lt
),
dense AS (
  SELECT doc_id, rank AS dense_rank FROM ({dense_sql_fn(query_terms, k, source=source)}) dt
),
cand AS (
  SELECT doc_id,
         max(lex_rank) AS lex_rank,
         max(dense_rank) AS dense_rank
  FROM (
    SELECT doc_id, lex_rank, CAST(NULL AS INTEGER) AS dense_rank FROM lex
    UNION ALL
    SELECT doc_id, CAST(NULL AS INTEGER) AS lex_rank, dense_rank FROM dense
  ) u GROUP BY doc_id
),
fscored AS (
  SELECT doc_id,
         floor((COALESCE(1.0 / ({k0}.0 + lex_rank), 0.0)
              + COALESCE(1.0 / ({k0}.0 + dense_rank), 0.0)) * 1e9 + 0.5000001) / 1e9 AS rrf_score,
         lex_rank, dense_rank
  FROM cand
),
franked AS (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fscored
)
SELECT doc_id, rrf_score, lex_rank, dense_rank, CAST(rank AS INTEGER) AS rank
FROM franked WHERE rank <= {k}"""


def sql_bm25_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    source: str = "documents",
) -> str:
    terms = ", ".join(f"'{t}'" for t in _norm_terms(query_terms))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
lens AS (SELECT doc_id, len(words) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM lens),
words AS (
  SELECT doc_id, unnest(words) AS word FROM base
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words
  WHERE word IN ({terms}) GROUP BY 1, 2
),
dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * CAST({k1 + 1.0!r} AS DOUBLE))
           / (tf.tf + CAST({k1!r} AS DOUBLE)
              * (CAST({1.0 - b!r} AS DOUBLE)
                 + CAST({b!r} AS DOUBLE) * lens.dl
                   / (CAST(stats.total_dl AS DOUBLE) / stats.n_docs))) AS w_score
  FROM tf JOIN dfreq USING (word) JOIN lens USING (doc_id) CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         floor(SUM(w_score) * 1e6 + 0.5000001) / 1e6 AS score,
         COUNT(*) AS n_matched_terms
  FROM per_term GROUP BY 1
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, score, n_matched_terms, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}"""


def sql_hybrid_rrf_ivf_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = RRF_TOP_K,
    k0: int = RRF_K0,
    source: str = "documents",
) -> str:
    """Oracle twin of hybrid_rrf_ivf_topk: same fusion, IVF-probed dense
    arm."""
    return sql_hybrid_rrf_topk(
        query_terms, k, k0, source=source, dense_sql=sql_dense_ivf_topk
    )
