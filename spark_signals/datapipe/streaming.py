"""Streaming document curation — the continuous-ingestion face of the batch
curation operators.

The stateless operators (``pii_scrub``, ``text_stats``, ``dedup_passages``'s
digest step, language/quality scoring) are pure column transforms, so they
run UNCHANGED on a ``readStream`` DataFrame — the batch/stream unification
Spark's API promises, which ``tests/test_streaming_curation.py`` pins by
draining a stream and diffing against the batch result row-for-row.

The one genuinely stateful step in an ingestion pipeline is redelivery
dedup: at-least-once upstreams (Kafka, retried file loaders) deliver the
same document twice, and content-digest dedup needs bounded keyed state.
``dedup_docs_stream`` mirrors the tick-side ``dedup_tick_stream`` (T5
hygiene): ``dropDuplicatesWithinWatermark`` on the content digest keeps
state only for the watermark horizon — bounded memory at any corpus rate,
the same contract TimescaleDB-era reference jobs got from Kafka offsets +
primary keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.checkpoint import pin

# THE batch exact-dedup digest, re-exported so streaming callers share one
# definition with dedup.dedup_exact / digest_index (a padding-only
# redelivery must hash identically in both lanes — see content_digest's
# docstring)
from spark_signals.datapipe.dedup import content_digest  # noqa: E402


def dedup_docs_stream(
    stream: DataFrame,
    *,
    time_col: str = "ingest_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered documents (same content digest) within the watermark
    horizon. ``time_col`` must be the stream's event/ingest timestamp — the
    watermark bounds the dedup state, so a duplicate arriving later than
    ``delay`` after the original is NOT caught (that's the batch exact-dedup
    pass's job downstream; this stage only de-noises the live feed)."""
    return (
        stream.withColumn("digest", content_digest(F.col("text")))
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["digest"])
        # internal helper column — keep the output schema equal to the input
        .drop("digest")
    )


def quality_monitor_stream(
    stream: DataFrame,
    *,
    time_col: str = "ingest_time",
    delay: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Per-window ingestion quality report: how much of the live feed is
    failing the STATELESS curation gates right now (repetition, PII,
    text-stats quality score). A crawler gone wrong shows up here minutes
    after it breaks, not at the nightly batch; the corpus-level gates
    (exact dup, LM bands, length percentiles) need corpus state and stay
    batch/index-side by design (see ingest_dedup_stream for the dedup
    half).

    Shape: the flags are inline per-row column expressions over ONE pass of
    the stream (stream-stream self-joins are not how you compose stateless
    gates — they would each need their own watermark state), then a single
    watermarked tumbling aggregate; state is one row per open window. The
    repetition signal is the per-row half of the Gopher gate (duplicate-
    word fraction); the bigram-mode half needs a per-doc aggregate and
    stays batch-side.
    """
    from spark_signals.datapipe.scrub import PII_PATTERNS
    from spark_signals.datapipe.text import (
        REPETITION_DUP_WORD_FRAC,
        words_col,
    )

    words = words_col(F.col("text"))
    n_words = F.size(words)
    dup_frac = (n_words - F.size(F.array_distinct(words))).cast(
        "double"
    ) / F.greatest(n_words, F.lit(1))
    pii_total = None
    for pat, _token in PII_PATTERNS.values():
        c = F.regexp_count(F.col("text"), F.lit(pat))
        pii_total = c if pii_total is None else pii_total + c
    flagged = stream.select(
        F.col(time_col),
        n_words.alias("n_words"),
        (dup_frac > F.lit(REPETITION_DUP_WORD_FRAC)).alias("is_repetitive"),
        (pii_total > 0).alias("has_pii"),
    )
    return (
        flagged.withWatermark(time_col, delay)
        .groupBy(F.window(time_col, window))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_repetitive").cast("long")).alias("n_repetitive"),
            F.sum(F.col("has_pii").cast("long")).alias("n_pii"),
            F.avg(F.col("n_words").cast("double")).alias("avg_words"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_docs",
            "n_repetitive",
            "n_pii",
            "avg_words",
        )
    )


def trending_terms_stream(
    stream: DataFrame,
    *,
    time_col: str = "ingest_time",
    delay: str = "10 minutes",
    window: str = "5 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """Sliding-window term counts over a live document feed — the
    ingestion-monitoring face of tf-idf: spikes in a window's term counts
    surface crawler loops, spam floods, and template bursts while they are
    happening, not at the nightly batch.

    Stateless tokenization (the same words_col every batch operator uses)
    feeds a watermarked sliding-window count — state is bounded by
    (windows in the watermark horizon) × (distinct terms), and late rows
    drop at the aggregate exactly like the tick-side T1-T3 semantics.
    Top-k per window is NOT computed here: rank-per-window is not
    streamable in append mode, and the counts stream is tiny (terms ×
    windows), so serving ranks at read time — see :func:`top_terms_of`.
    """
    from spark_signals.datapipe.text import words_col
    from spark_signals.datapipe.util import explode_strings

    words = explode_strings(
        stream.withColumn("words", words_col(F.col("text"))),
        F.col("words"),
        "word",
        time_col,
    ).filter(F.col("word") != "")
    return (
        words.withWatermark(time_col, delay)
        .groupBy(F.window(time_col, window, slide), "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "word",
            "n",
        )
    )


def top_terms_of(counts: DataFrame, k: int = 10) -> DataFrame:
    """Serving-side rank over a materialized trending-terms table: top-k
    terms per window (deterministic ties on the word)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start", "window_end").orderBy(
        F.desc("n"), F.asc("word")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ingest_dedup_stream(
    stream: DataFrame,
    *,
    index_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
    band_index_dir: str | None = None,
    pack_tail_dir: str | None = None,
    pack_manifest_dir: str | None = None,
):
    """Continuous-ingestion exact dedup: each micro-batch runs
    :func:`~spark_signals.datapipe.dedup.dedup_incremental` against the
    PERSISTED digest index, appends the survivors, and appends the index
    delta — batch N+1 is deduped against everything batch N admitted, and
    the index write stays O(batch), never O(corpus).

    This is the stateful complement to :func:`dedup_docs_stream`: the
    watermark filter de-noises redeliveries inside its horizon with bounded
    keyed state, while this index carries the FULL corpus memory in storage
    (at warehouse scale: bucketed on content_hash, see
    ``dedup_incremental``'s docstring). Returns the query handle; callers
    pick the trigger cadence (tests use ``availableNow`` per ingest drop).

    Exactly-once output: ``foreachBatch`` delivers micro-batches
    at-least-once (a crash between the write and the checkpoint commit
    replays the batch), so both sinks write by OVERWRITING a deterministic
    ``batch_id=<id>`` subdirectory — the standard idempotent-by-path
    pattern; a replay rewrites the same files instead of appending
    duplicates (pinned by a direct replay test). Readers of either
    directory see ``batch_id`` as a partition column — useful ingest
    lineage for free.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_ingest_batch(
            batch_df,
            batch_id,
            index_dir=index_dir,
            survivors_dir=survivors_dir,
            band_index_dir=band_index_dir,
            pack_tail_dir=pack_tail_dir,
            pack_manifest_dir=pack_manifest_dir,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _earlier_batch_partitions(spark, dir_path: str, batch_id: int) -> list[str]:
    """Paths of COMMITTED ``batch_id=<n>`` partitions earlier than (or other
    than) this batch, via the Hadoop FileSystem API.

    CLASSIC-DRIVER ONLY: this reaches through ``spark._jvm`` /
    ``spark._jsc`` (unavailable under Spark Connect) because the ingest
    lane needs a scheme-agnostic, error-propagating listing — reading the
    whole directory and catching errors is exactly the silent-dup bug the
    r06 advisory closed. If Connect support is ever needed, swap this one
    helper for a listing the Connect client can do (e.g. a metadata-only
    read of the partition column); every caller goes through here."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    earlier: list[str] = []
    if fs.exists(jpath):
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith("batch_id=") and name != f"batch_id={batch_id}":
                earlier.append(st.getPath().toString())
    return earlier


def process_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    survivors_dir: str,
    band_index_dir: str | None = None,
    pack_tail_dir: str | None = None,
    pack_manifest_dir: str | None = None,
) -> None:
    """One idempotent ingest step (module-level so replay semantics are
    directly testable): dedup the batch against every EARLIER batch's index
    partitions, then overwrite this batch's own partitions.

    With ``band_index_dir`` set, the exact pass is followed by the
    signature-level pass (``dedup.dedup_incremental_neardup``): survivors
    of the digest check probe the persisted MinHash band index, verify
    only against the candidate historical survivors (read back from
    earlier ``survivors_dir`` partitions, candidates-only via semi-join),
    and the admitted documents' band rows land in this batch's
    ``band_index_dir`` partition — near-dup memory stays O(batch) per
    ingest exactly like the digest index.

    Earlier-partition enumeration goes through
    :func:`_earlier_batch_partitions` (classic-driver Hadoop FS listing):
    only a genuinely absent index yields the empty frame; a read error on
    a committed partition FAILS the micro-batch so foreachBatch retries
    (r06 advisory), and a replayed batch never trips over its own
    partially-written partition (excluded by path)."""
    import os

    from pyspark.sql import types as T

    from spark_signals.datapipe.dedup import dedup_incremental

    spark = batch_df.sparkSession
    index_schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType(), False),
            T.StructField("canonical_doc_id", T.LongType(), True),
        ]
    )
    earlier = _earlier_batch_partitions(spark, index_dir, batch_id)
    if earlier:
        index = (
            spark.read.option("basePath", index_dir)
            .parquet(*earlier)
            .select("content_hash", "canonical_doc_id")
        )
    else:  # first batch (or batch-0 replay): no earlier index partitions
        index = spark.createDataFrame([], index_schema)
    survivors, delta = dedup_incremental(batch_df, index)
    band_delta = None
    if band_index_dir is not None:
        from spark_signals.datapipe.dedup import dedup_incremental_neardup

        band_schema = T.StructType(
            [
                T.StructField("band", T.IntegerType(), False),
                T.StructField("k1", T.LongType(), True),
                T.StructField("k2", T.LongType(), True),
                T.StructField("doc_id", T.LongType(), True),
            ]
        )
        earlier_bands = _earlier_batch_partitions(spark, band_index_dir, batch_id)
        earlier_docs = _earlier_batch_partitions(spark, survivors_dir, batch_id)
        if earlier_bands:
            band_idx = (
                spark.read.option("basePath", band_index_dir)
                .parquet(*earlier_bands)
                .select("band", "k1", "k2", "doc_id")
            )
            history = (
                spark.read.option("basePath", survivors_dir)
                .parquet(*earlier_docs)
                .drop("batch_id")
            )
        else:
            band_idx = spark.createDataFrame([], band_schema)
            history = spark.createDataFrame([], batch_df.schema)
        survivors, band_delta = dedup_incremental_neardup(
            survivors, band_idx, history
        )
        # the digest delta must only admit digests of documents that
        # actually survived BOTH passes — a near-dup's digest entering the
        # index would canonicalize to a dropped doc_id
        delta = delta.join(
            survivors.select(F.col("doc_id").alias("canonical_doc_id")),
            "canonical_doc_id",
            "left_semi",
        )
    # pin results before any write: the delta's plan reads index_dir,
    # which the delta write itself replaces — materialize first so the read
    # and the write never overlap
    survivors = survivors.transform(pin)
    delta = delta.transform(pin)
    survivors.write.mode("overwrite").parquet(
        os.path.join(survivors_dir, f"batch_id={batch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"batch_id={batch_id}")
    )
    if band_delta is not None:
        band_delta.transform(pin).write.mode("overwrite").parquet(
            os.path.join(band_index_dir, f"batch_id={batch_id}")
        )
    if pack_manifest_dir is not None and pack_tail_dir is not None:
        # PACKING lane: the ADMITTED documents extend the per-shard
        # concatenation streams from the persisted tail (pack.pack_tail's
        # resume state) — O(batch) window work, never a corpus re-pack.
        # The tail read takes the per-shard MAX over earlier partitions
        # (streams only grow, so max = latest; a replayed batch excludes
        # its own partition and recomputes the identical manifest).
        # Precondition: ingest drops carry monotonically increasing
        # doc_ids (pack_incremental's append-only id discipline — the
        # same ordering the ingest source contract already provides).
        from spark_signals.datapipe.pack import pack_incremental

        earlier_tails = _earlier_batch_partitions(spark, pack_tail_dir, batch_id)
        if earlier_tails:
            tail = (
                spark.read.option("basePath", pack_tail_dir)
                .parquet(*earlier_tails)
                .groupBy("shard")
                .agg(F.max("stream_tokens").alias("stream_tokens"))
            )
        else:
            tail = spark.createDataFrame([], "shard long, stream_tokens long")
        manifest, new_tail = pack_incremental(survivors, tail)
        # pin before writing: new_tail's plan reads pack_tail_dir, which
        # the tail write below replaces (same overlap rule as the delta)
        manifest = manifest.transform(pin)
        new_tail = new_tail.transform(pin)
        manifest.write.mode("overwrite").parquet(
            os.path.join(pack_manifest_dir, f"batch_id={batch_id}")
        )
        new_tail.write.mode("overwrite").parquet(
            os.path.join(pack_tail_dir, f"batch_id={batch_id}")
        )


def process_media_ingest_batch(
    batch_media: DataFrame,
    batch_id: int,
    *,
    phash_index_dir: str,
    survivors_dir: str,
) -> None:
    """One idempotent MEDIA ingest step — the media twin of
    :func:`process_ingest_batch` (module-level so replay semantics are
    directly testable): near-dup the batch's decoded grids against every
    EARLIER batch's persisted dHash band index
    (multimodal.media_phash_incremental), then OVERWRITE this batch's own
    ``batch_id=<id>`` partitions of both the survivors and the index.

    Because the dHash index rows carry the full 64-bit signature,
    verification never reads historical payloads at all — the one storage
    relation the lane maintains IS the evidence (contrast the text lane,
    which must re-shingle candidate docs from the survivors directory).
    Earlier-partition enumeration shares :func:`_earlier_batch_partitions`
    (absent index ⇒ empty frame; a read error on a committed partition
    fails the micro-batch so foreachBatch retries; a replayed batch never
    sees its own partial partition)."""
    import os

    from spark_signals.datapipe.multimodal import (
        PHASH_INDEX_SCHEMA,
        media_phash_incremental,
    )

    spark = batch_media.sparkSession
    earlier = _earlier_batch_partitions(spark, phash_index_dir, batch_id)
    if earlier:
        index = (
            spark.read.option("basePath", phash_index_dir)
            .parquet(*earlier)
            .select("kind", "band", "bkey", "media_id", "sig")
        )
    else:  # first batch (or batch-0 replay): no earlier index partitions
        index = spark.createDataFrame([], PHASH_INDEX_SCHEMA)
    survivors, delta = media_phash_incremental(batch_media, index)
    survivors.write.mode("overwrite").parquet(
        os.path.join(survivors_dir, f"batch_id={batch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(phash_index_dir, f"batch_id={batch_id}")
    )


def ingest_media_stream(
    stream: DataFrame,
    *,
    phash_index_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
):
    """Continuous media ingestion with incremental decoded-grid near-dup:
    each micro-batch runs :func:`process_media_ingest_batch`, so batch
    N+1 dedups against every grid batch N admitted while index writes
    stay O(batch). Exactly-once by the same idempotent-by-path
    ``batch_id=<id>`` overwrite discipline as :func:`ingest_dedup_stream`.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_media_ingest_batch(
            batch_df,
            batch_id,
            phash_index_dir=phash_index_dir,
            survivors_dir=survivors_dir,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_embedding_ingest_batch(
    batch_vectors: DataFrame,
    batch_id: int,
    *,
    lsh_index_dir: str,
    survivors_dir: str,
) -> None:
    """One idempotent EMBEDDING ingest step — the vector twin of
    :func:`process_media_ingest_batch`: cosine-near-dup the batch against
    every EARLIER batch's persisted sign-LSH bucket index
    (dedup.embedding_neardup_incremental), then OVERWRITE this batch's
    own ``batch_id=<id>`` partitions. The index rows carry the vectors,
    so history is touched only through the index relation."""
    import os

    from pyspark.sql import types as T

    from spark_signals.datapipe.dedup import embedding_neardup_incremental

    spark = batch_vectors.sparkSession
    earlier = _earlier_batch_partitions(spark, lsh_index_dir, batch_id)
    if earlier:
        index = (
            spark.read.option("basePath", lsh_index_dir)
            .parquet(*earlier)
            .select("bucket", "vec_id", "embedding")
        )
    else:  # first batch (or batch-0 replay): no earlier index partitions
        index = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("bucket", T.StringType(), False),
                    T.StructField("vec_id", T.LongType(), False),
                    T.StructField(
                        "embedding", T.ArrayType(T.FloatType()), False
                    ),
                ]
            ),
        )
    survivors, delta = embedding_neardup_incremental(batch_vectors, index)
    survivors.write.mode("overwrite").parquet(
        os.path.join(survivors_dir, f"batch_id={batch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(lsh_index_dir, f"batch_id={batch_id}")
    )


def ingest_embedding_stream(
    stream: DataFrame,
    *,
    lsh_index_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
):
    """Continuous embedding ingestion with incremental cosine near-dup —
    same exactly-once idempotent-by-path discipline as the doc and media
    lanes; each micro-batch runs :func:`process_embedding_ingest_batch`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_embedding_ingest_batch(
            batch_df,
            batch_id,
            lsh_index_dir=lsh_index_dir,
            survivors_dir=survivors_dir,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------- continuous KNN serving
# The retrieval analog of the ingest lanes (r11 verdict #4): the persisted
# trained-IVF pair (similarity.ivf_serving_index -> centroids_dir +
# index_dir parquet) is the serving state; a query stream probes it in
# micro-batches. Unlike the ingest lanes this one is STATELESS across
# batches — per-query results depend only on the query row and the index
# relations (knn_serve_batch's contract), so exactly-once is just the
# idempotent batch_id=<id> overwrite and replays rewrite identical rows.


def process_knn_serve_batch(
    batch_queries: DataFrame,
    batch_id: int,
    *,
    centroids_dir: str | None = None,
    index_dir: str | None = None,
    results_dir: str,
    k_neighbors: int | None = None,
    serving_root: str | None = None,
) -> None:
    """One idempotent serving step: read the persisted (centroids, index)
    pair, top-k the batch's queries against it (similarity.knn_serve_batch
    — same grid/tie-breaks as the batch self-join), OVERWRITE this batch's
    own results partition. Pass EITHER explicit dirs or ``serving_root``
    (a control.maintenance.retrain_ivf_serving root, whose CURRENT pointer
    is re-resolved here, PER BATCH — a retrain between micro-batches takes
    effect on the next batch with no torn pair and no restart)."""
    import os

    from spark_signals.datapipe.similarity import KNN_K, knn_serve_batch

    if serving_root is not None:
        from spark_signals.control.maintenance import current_ivf_dirs

        centroids_dir, index_dir = current_ivf_dirs(serving_root)
    if centroids_dir is None or index_dir is None:
        raise ValueError("pass centroids_dir+index_dir or serving_root")
    spark = batch_queries.sparkSession
    centroids = spark.read.parquet(centroids_dir)
    index = spark.read.parquet(index_dir).select("vec_id", "embedding", "label")
    out = knn_serve_batch(
        batch_queries.select("vec_id", "embedding"),
        centroids,
        index,
        KNN_K if k_neighbors is None else k_neighbors,
    )
    out.write.mode("overwrite").parquet(
        os.path.join(results_dir, f"batch_id={batch_id}")
    )


def serve_knn_stream(
    query_stream: DataFrame,
    *,
    centroids_dir: str | None = None,
    index_dir: str | None = None,
    results_dir: str,
    checkpoint_dir: str,
    k_neighbors: int | None = None,
    serving_root: str | None = None,
):
    """Continuous top-k serving against the persisted IVF index — each
    micro-batch runs :func:`process_knn_serve_batch`. With
    ``serving_root`` (the control.maintenance.retrain_ivf_serving
    layout), the CURRENT version is re-resolved per batch, so a scheduled
    retrain lands on the next micro-batch with no restart and no torn
    (centroids, index) pair; with explicit dirs, refreshes are plain
    parquet overwrites picked up the same way."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_knn_serve_batch(
            batch_df,
            batch_id,
            centroids_dir=centroids_dir,
            index_dir=index_dir,
            results_dir=results_dir,
            k_neighbors=k_neighbors,
            serving_root=serving_root,
        )

    return (
        query_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------- span-dedup ingest lane
def process_span_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    span_index_dir: str,
    stripped_dir: str,
) -> None:
    """One idempotent span-dedup ingest step: strip the batch's duplicated
    spans against every EARLIER batch's window-index partitions
    (:func:`~spark_signals.datapipe.dedup.dedup_spans_incremental`), then
    overwrite this batch's own ``batch_id=<id>`` partitions — the exact
    lane's storage contract (process_ingest_batch) at window grain. A
    replay excludes its own partition from the index read, so it sees the
    IDENTICAL pre-batch state and rewrites identical files. Readers
    min-merge the index partitions per digest (span_index's documented
    consumer rule); the stripped directory is the corpus-with-hygiene
    relation, partition-per-ingest-drop."""
    import os

    from pyspark.sql import types as T

    from spark_signals.datapipe.dedup import dedup_spans_incremental

    spark = batch_df.sparkSession
    index_schema = T.StructType(
        [
            T.StructField("digest", T.StringType(), False),
            T.StructField("min_key", T.LongType(), True),
        ]
    )
    earlier = _earlier_batch_partitions(spark, span_index_dir, batch_id)
    if earlier:
        index = (
            spark.read.option("basePath", span_index_dir)
            .parquet(*earlier)
            .select("digest", "min_key")
        )
    else:  # first batch (or batch-0 replay): no earlier index partitions
        index = spark.createDataFrame([], index_schema)
    stripped, delta = dedup_spans_incremental(batch_df, index)
    # both are already eagerly pinned inside dedup_spans_incremental, so
    # the delta's read of span_index_dir never overlaps its own write
    stripped.write.mode("overwrite").parquet(
        os.path.join(stripped_dir, f"batch_id={batch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(span_index_dir, f"batch_id={batch_id}")
    )


def ingest_spans_stream(
    stream: DataFrame,
    *,
    span_index_dir: str,
    stripped_dir: str,
    checkpoint_dir: str,
):
    """Continuous duplicated-span hygiene: each micro-batch runs
    :func:`process_span_ingest_batch` against the persisted window index —
    batch N+1's spans are cut against everything batch N admitted, index
    growth stays O(batch), and exactly-once output rides the
    batch_id-partition overwrite like every ingest lane here. The batch
    twin of :func:`~spark_signals.datapipe.dedup.dedup_exact_spans_strip`
    under a scheduler, not a reimplementation (equivalence pinned in
    tests/test_span_dedup.py)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_span_ingest_batch(
            batch_df,
            batch_id,
            span_index_dir=span_index_dir,
            stripped_dir=stripped_dir,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_kanon_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    counts_dir: str,
    report_dir: str,
    spec=None,
) -> None:
    """One idempotent step of the continuous k-anonymity gate
    (module-level so replay semantics are directly testable): merge the
    batch's QI counts with every EARLIER batch's count partitions,
    overwrite this batch's own delta partition, then write the
    corpus-wide verdict report for this point in the stream.

    Same exactly-once shape as the other ingest lanes: both writes target
    a deterministic ``batch_id=<id>`` subdirectory, so an at-least-once
    replay rewrites the same files. The count state is additive integers,
    so a chain of batches reproduces the batch report exactly
    (scrub.kanon_incremental's invariant); the state relation is bounded
    by QI cardinality, never corpus size.

    Write ORDER matters (r15 advisory): the state delta lands BEFORE the
    report, so a crash between the two writes leaves at worst an
    unpublished verdict backed by complete state — never a published
    verdict whose backing QI counts are missing. A direct (non-streaming)
    caller that crashes mid-step and never replays therefore cannot leave
    future reports permanently undercounting the batch.
    """
    import os

    from pyspark.sql import types as T

    from spark_signals.datapipe.scrub import DEFAULT_QI, kanon_incremental

    if spec is None:
        spec = DEFAULT_QI
    spark = batch_df.sparkSession
    # the state schema DERIVES from the QI spec: key columns keep their
    # input types (a rotated QI set — license tag, URL domain — needs no
    # code change here), band + count are always long
    counts_schema = T.StructType(
        [
            T.StructField(c, batch_df.schema[c].dataType, True)
            for c in spec.key_cols
        ]
        + [
            T.StructField("band_fine", T.LongType(), True),
            T.StructField("n_docs", T.LongType(), True),
        ]
    )
    state_cols = [*spec.key_cols, "band_fine", "n_docs"]
    earlier = _earlier_batch_partitions(spark, counts_dir, batch_id)
    if earlier:
        index = (
            spark.read.option("basePath", counts_dir)
            .parquet(*earlier)
            .select(*state_cols)
        )
    else:
        index = spark.createDataFrame([], counts_schema)
    report, delta = kanon_incremental(batch_df, index, spec)
    # pin before writing: the report's plan reads counts_dir partitions
    # the delta write is about to extend
    report = report.transform(pin)
    delta = delta.transform(pin)
    # REPORT commits first (r15 advisory): both writes are idempotent
    # per-batch overwrites re-run on foreachBatch retry, so the order only
    # matters to a reader between a crash and the retry — and for a release
    # gate the failure modes are not symmetric. Delta-first + crash leaves
    # the count state ADVANCED while the newest committed report is stale:
    # consumers keep releasing under an outdated suppression verdict.
    # Report-first + crash leaves a current verdict whose state write
    # re-runs on retry — the gate never serves a verdict older than the
    # persisted state.
    report.write.mode("overwrite").parquet(
        os.path.join(report_dir, f"batch_id={batch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(counts_dir, f"batch_id={batch_id}")
    )


def kanon_gate_stream(
    stream: DataFrame,
    *,
    counts_dir: str,
    report_dir: str,
    checkpoint_dir: str,
    spec=None,
):
    """Continuous k-anonymity release gate: after every ingest drop, the
    corpus-wide suppression report is re-issued from the persisted QI
    count state + the batch delta — O(batch) state maintenance, report
    cost bounded by QI cardinality (see scrub.kanon_incremental). The
    ``report_dir``'s LATEST ``batch_id`` partition is always the current
    release verdict; earlier partitions are the gate's audit history.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_kanon_batch(
            batch_df,
            batch_id,
            counts_dir=counts_dir,
            report_dir=report_dir,
            spec=spec,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_latest_kanon_report(spark, report_dir: str) -> DataFrame:
    """The CURRENT release verdict: the newest COMMITTED ``batch_id``
    partition of the continuous gate's report directory (each partition
    is a complete corpus-wide report as of that drop; earlier partitions
    are audit history). Same classic-driver FS listing as the ingest
    lanes — a missing directory is an error (there is no verdict to
    serve), a committed-partition read error propagates.

    Committed = the partition directory contains a ``_SUCCESS`` marker.
    A ``batch_id=`` directory exists (and lists) from the writer's first
    task file, before the job commit lands — so a latest-wins read
    concurrent with an in-flight drop, or after a crash mid-write, must
    NOT serve that partition: for a privacy gate a silently-partial
    verdict is the worst failure mode (r15 verdict). Candidates are
    therefore walked newest-first and the first one carrying ``_SUCCESS``
    is served; uncommitted newer partitions fall back to the last
    complete verdict (the streaming checkpoint will replay and commit
    them). Only latest-wins SERVING reads race the writer this way — the
    ingest-side readers enumerate strictly earlier, already-committed
    partitions (:func:`_earlier_batch_partitions`)."""
    import os

    Path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = Path(report_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise FileNotFoundError(f"no kanon reports at {report_dir}")
    ids = [
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(jpath)
        if st.getPath().getName().startswith("batch_id=")
    ]
    if not ids:
        raise FileNotFoundError(f"no batch_id partitions at {report_dir}")
    for bid in sorted(ids, reverse=True):
        part = os.path.join(report_dir, f"batch_id={bid}")
        if fs.exists(Path(os.path.join(part, "_SUCCESS"))):
            return spark.read.parquet(part)
    raise FileNotFoundError(
        f"no COMMITTED batch_id partition at {report_dir} "
        f"(found {sorted(ids)}, none carrying _SUCCESS — writer in "
        f"flight or crashed mid-write; replay will commit)"
    )


# --------------------------------------- continuous cross-source overlap
def process_overlap_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    docs_dir: str,
    band_dir: str,
    cells_dir: str,
    matrix_dir: str,
) -> None:
    """One idempotent step of the continuous cross-source overlap audit
    (module-level so replay semantics are directly testable): probe the
    batch against every EARLIER batch's band-index partitions, persist
    the batch's docs / band rows / ADDITIVE cell delta, then write the
    corpus-wide provenance matrix for this point in the stream.

    Storage contract (the qi_counts shape): every write targets a
    deterministic ``batch_id=<id>`` subdirectory, so an at-least-once
    replay rewrites the same files — and a replay reads only EARLIER
    partitions, so it sees the identical pre-batch state and produces
    identical deltas. Write ORDER follows the kanon lesson: all three
    state relations (docs, bands, cells) land BEFORE the served matrix,
    so a crash can never publish a matrix whose backing state is
    missing.

    Unlike the dedup ADMISSION lane, the band index here keeps EVERY
    batch document's rows (dropped near-dups included) — the audit
    counts duplicate pairs, which is exactly what admission discards.
    State: bands grow with the corpus (NUM_BANDS rows/doc — bucket on
    (k1, k2) at warehouse scale); cells are S²-bounded; per-drop cost is
    O(batch probes + candidates), never a corpus re-run.
    """
    import os

    from spark_signals.datapipe.dedup import _overlap_step, source_overlap_from_cells

    spark = batch_df.sparkSession
    empty_docs = spark.createDataFrame([], batch_df.schema)

    earlier_bands = _earlier_batch_partitions(spark, band_dir, batch_id)
    earlier_docs = _earlier_batch_partitions(spark, docs_dir, batch_id)
    if earlier_bands:
        index = (
            spark.read.option("basePath", band_dir)
            .parquet(*earlier_bands)
            .select("band", "k1", "k2", "doc_id")
        )
    else:
        from spark_signals.datapipe.dedup import band_index

        index = band_index(empty_docs)
    if earlier_docs:
        snapshot_docs = (
            spark.read.option("basePath", docs_dir)
            .parquet(*earlier_docs)
            .select(*batch_df.columns)
        )
    else:
        snapshot_docs = empty_docs

    delta_cells, index_delta = _overlap_step(batch_df, index, snapshot_docs)

    batch_df.write.mode("overwrite").parquet(
        os.path.join(docs_dir, f"batch_id={batch_id}")
    )
    index_delta.write.mode("overwrite").parquet(
        os.path.join(band_dir, f"batch_id={batch_id}")
    )
    delta_cells.write.mode("overwrite").parquet(
        os.path.join(cells_dir, f"batch_id={batch_id}")
    )
    all_cells = spark.read.option("basePath", cells_dir).parquet(cells_dir).select(
        "source_lo", "source_hi", "n_pairs", "sum_jac_u"
    )
    source_overlap_from_cells(all_cells).transform(pin).write.mode(
        "overwrite"
    ).parquet(os.path.join(matrix_dir, f"batch_id={batch_id}"))


def overlap_audit_stream(
    stream: DataFrame,
    *,
    docs_dir: str,
    band_dir: str,
    cells_dir: str,
    matrix_dir: str,
    checkpoint_dir: str,
):
    """Continuous provenance audit: after every ingest drop, the
    corpus-wide source-overlap matrix is re-issued from the persisted
    cell state + the drop's O(batch) delta. The ``matrix_dir``'s newest
    COMMITTED ``batch_id`` partition is the current provenance verdict
    (serve via :func:`read_latest_overlap_matrix`); earlier partitions
    are the audit history."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_overlap_batch(
            batch_df,
            batch_id,
            docs_dir=docs_dir,
            band_dir=band_dir,
            cells_dir=cells_dir,
            matrix_dir=matrix_dir,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_latest_overlap_matrix(spark, matrix_dir: str) -> DataFrame:
    """The CURRENT provenance matrix: the newest COMMITTED ``batch_id``
    partition — the same ``_SUCCESS``-gated, newest-first fallback walk
    as :func:`read_latest_kanon_report` (a latest-wins serving read must
    never return a partial matrix while the writer is in flight)."""
    import os

    Path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = Path(matrix_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise FileNotFoundError(f"no overlap matrices at {matrix_dir}")
    ids = [
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(jpath)
        if st.getPath().getName().startswith("batch_id=")
    ]
    if not ids:
        raise FileNotFoundError(f"no batch_id partitions at {matrix_dir}")
    for bid in sorted(ids, reverse=True):
        part = os.path.join(matrix_dir, f"batch_id={bid}")
        if fs.exists(Path(os.path.join(part, "_SUCCESS"))):
            return spark.read.parquet(part)
    raise FileNotFoundError(
        f"no COMMITTED batch_id partition at {matrix_dir} "
        f"(found {sorted(ids)}, none carrying _SUCCESS — writer in "
        f"flight or crashed mid-write; replay will commit)"
    )
