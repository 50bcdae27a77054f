"""Approximate-nearest-neighbor search over the embedding column.

Two strategies over `embeddings(vec_id, embedding array<float>, label)`:

* **Brute-force top-k** — the exactness baseline: a small query set is
  broadcast against the full corpus; cosine is an exact double dot product
  via `zip_with`/`aggregate` (JVM codegen, no UDF); top-k per query is a
  rank-partitioned window. At 100 TB the corpus side stays partitioned and
  only the query set is broadcast — no shuffle of the big side at all.

* **IVF (inverted-file) top-k** — the scale path: the `label` column is the
  coarse quantizer cell. Centroids are computed in *long form*
  (explode → groupBy(label, dim) → avg) so the reduction is a standard
  partial-aggregated shuffle; each query probes its NPROBE nearest
  centroids and scans only those cells — at 1000× corpus scale the scan is
  cut by ~n_cells/NPROBE while recall follows cluster quality.

Ranking uses cosine rounded to 6 dp with vec_id tie-break so the selected
top-k set is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_signals.parity import sround

N_QUERIES = 8  # vec_id < 8 are the benchmark query vectors
TOP_K = 10
NPROBE = 3


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))


def ann_bruteforce_topk(embeddings: DataFrame) -> DataFrame:
    """Exact cosine top-k for each query vector (the recall=1 baseline)."""
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    from spark_signals.datapipe.util import spread_small_input

    corpus = spread_small_input(embeddings).select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("c_emb"),
        F.col("label").alias("match_label"),
    )
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("match_id") != F.col("query_id")
    )
    cos = sround(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6)
    scored = pairs.select("query_id", "match_id", "match_label", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "match_id", "match_label", "cosine", "rank")
    )


_SQL_COS = """floor((
      list_sum(list_transform(range(1, len(q.embedding) + 1),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(q.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    ) * 1e6 + 0.5000001) / 1e6"""

SQL_ANN_BRUTEFORCE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id, c.label AS match_label,
         {_SQL_COS} AS cosine
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
  FROM scored
)
SELECT query_id, match_id, match_label, cosine, rank FROM ranked WHERE rank <= {TOP_K}"""


def ann_ivf_topk(embeddings: DataFrame) -> DataFrame:
    """IVF top-k: probe the NPROBE nearest label-centroids, scan only those
    cells. Centroid build + query→centroid scoring run in long form (one
    row per dimension) — pure shuffle-based linear algebra, no arrays of
    arrays, no UDFs."""
    # centroids in long form: (label, dim, c_val)
    dims = embeddings.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    )
    centroids = dims.groupBy("label", "dim").agg(
        F.avg(F.col("val").cast("double")).alias("c_val")
    )
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    q_dims = queries.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(F.col("embedding")).alias("dim", "q_val"),
    )
    # query ⋈ centroid on dim → cosine per (query, label)
    qc = (
        q_dims.join(centroids, "dim")
        .groupBy("query_id", "label")
        .agg(
            F.sum(F.col("q_val").cast("double") * F.col("c_val")).alias("dot"),
            F.sum(F.col("q_val").cast("double") * F.col("q_val").cast("double")).alias("qq"),
            F.sum(F.col("c_val") * F.col("c_val")).alias("cc"),
        )
        .select(
            "query_id",
            "label",
            sround(F.col("dot") / (F.sqrt("qq") * F.sqrt("cc")), 6).alias("c_cos"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("label"))
    probes = qc.withColumn("c_rank", F.row_number().over(wq)).filter(
        F.col("c_rank") <= NPROBE
    )
    # scan only the probed cells
    corpus = embeddings.select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("c_emb"),
        F.col("label").alias("label"),
    )
    cand = corpus.join(
        F.broadcast(probes.select("query_id", "label")), "label"
    ).join(
        F.broadcast(
            queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        ),
        "query_id",
    ).filter(F.col("match_id") != F.col("query_id"))
    cos = sround(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6)
    scored = cand.select("query_id", "match_id", F.col("label").alias("match_label"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "match_id", "match_label", "cosine", "rank")
    )


N_HYPERPLANES = 8
LSH_COS_THRESHOLD = 0.2


def _hyperplane_sig_expr(dim: int = 64) -> str:
    """Random-hyperplane (sign-LSH) signature as a bit string.

    Hyperplane components are md5-derived pseudo-randoms (nibble of
    md5('i:d') − 8.5 ∈ [−8.5, 6.5]) — deterministic and identical in both
    engines, like every other hash in this module. sign(v·r_i) gives bit i;
    vectors with small angles share buckets with probability
    (1 − θ/π)^bits.
    """
    return (
        f"concat_ws('', transform(sequence(0, {N_HYPERPLANES - 1}), i -> "
        f"case when aggregate(sequence(1, {dim}), 0D, (acc, d) -> "
        "acc + cast(element_at(embedding, d) as double) * "
        "(cast(instr('0123456789abcdef', substring(md5(concat(cast(i as string), ':', cast(d as string))), 1, 1)) as double) - 8.5)"
        ") > 0 then '1' else '0' end))"
    )


def ann_lsh_pairs(embeddings: DataFrame) -> DataFrame:
    """Sign-LSH bucketed near-neighbor pairs — the hash-blocking scale path
    alongside IVF: one shuffle on the 2^bits bucket key, exact cosine only
    within buckets."""
    from spark_signals.datapipe.util import spread_small_input

    sigs = spread_small_input(embeddings).select(
        "vec_id", "embedding", F.expr(_hyperplane_sig_expr()).alias("bucket")
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = a.join(b, "bucket").filter(F.col("a.vec_id") < F.col("b.vec_id"))
    cos = sround(
        _dot("a.embedding", "b.embedding") / (_norm("a.embedding") * _norm("b.embedding")), 6
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("bucket"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= LSH_COS_THRESHOLD)
    )


SQL_ANN_LSH = f"""
WITH sigs AS (
  SELECT vec_id, embedding,
    array_to_string(list_transform(range(0, {N_HYPERPLANES}), i ->
      CASE WHEN list_sum(list_transform(range(1, 65), d ->
        CAST(embedding[d] AS DOUBLE) *
        (CAST(strpos('0123456789abcdef', substring(md5(i::VARCHAR || ':' || d::VARCHAR), 1, 1)) AS DOUBLE) - 8.5)
      )) > 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
    floor((
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    ) * 1e6 + 0.5000001) / 1e6 AS cosine
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, bucket, cosine FROM pairs WHERE cosine >= {LSH_COS_THRESHOLD}"""


SQL_ANN_IVF = f"""
WITH dims AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
),
centroids AS (
  SELECT label, dim, AVG(val) AS c_val FROM dims GROUP BY label, dim
),
q_dims AS (
  SELECT vec_id AS query_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS q_val
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
  WHERE vec_id < {N_QUERIES}
),
qc AS (
  SELECT query_id, label,
    floor((SUM(q_val * c_val) / (sqrt(SUM(q_val * q_val)) * sqrt(SUM(c_val * c_val))))
          * 1e6 + 0.5000001) / 1e6 AS c_cos
  FROM q_dims JOIN centroids USING (dim)
  GROUP BY query_id, label
),
probes AS (
  SELECT query_id, label
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, label ASC) AS c_rank FROM qc)
  WHERE c_rank <= {NPROBE}
),
scored AS (
  SELECT p.query_id, c.vec_id AS match_id, c.label AS match_label,
         {_SQL_COS} AS cosine
  FROM probes p
  JOIN embeddings c ON c.label = p.label
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
  FROM scored
)
SELECT query_id, match_id, match_label, cosine, rank FROM ranked WHERE rank <= {TOP_K}"""
