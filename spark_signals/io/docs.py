"""Document-corpus ingest and export — the IO bookends of the curation
pipeline (raw JSONL in → curate → packed training shards out).

Mirrors the tick-side contract (io.sources: schema enforced, malformed
rows dropped — reference flink_jobs sources drop parse errors) for the
document tables the datapipe operators consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced JSONL corpus reader: malformed lines and rows
    missing the required fields (doc_id, text) are DROPPED, not nulled —
    a curation pipeline must never train on half-parsed records.

    PERMISSIVE mode + an explicit `_corrupt_record` column keeps the scan
    single-pass (no FAILFAST second read); n_chars is recomputed when
    absent so downstream length gates never see nulls. At 100 TB this is
    a plain distributed text scan — JSON parsing is per-row JVM work and
    the filter is codegen'd.
    """
    schema = T.StructType(
        DOC_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    raw = spark.read.schema(schema).option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
    return (
        raw.filter(
            F.col("_corrupt_record").isNull()
            & F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
        )
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.length("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def decode_document_payloads(payloads: DataFrame) -> DataFrame:
    """The exact decode a Kafka document source applies to ``value`` bytes:
    schema-enforced ``from_json`` (malformed payloads null out), rows
    missing the required fields (doc_id, text) dropped, n_chars backfilled
    — byte-for-byte the same contract as :func:`read_documents_jsonl`, so a
    corpus is identical whether it arrived as files or over the wire (the
    tick-side ``decode_tick_payloads`` twin)."""
    parsed = payloads.select(
        F.from_json(F.col("value").cast("string"), DOC_SCHEMA).alias("r")
    ).select("r.*")
    return (
        parsed.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.length("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def read_kafka_documents(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "documents.raw",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka document source: the ingestion face of the curation pipeline
    when the corpus arrives as a stream (crawler output, submission queue)
    instead of files. Decode contract shared with the JSONL reader; chain
    into ``datapipe.streaming`` (ingest_dedup_stream / quality monitor)
    after adding an ingest timestamp."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_document_payloads(raw)


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    partition_by: tuple[str, ...] = ("source",),
) -> str:
    """Export a curated corpus as size-bounded parquet shards.

    Trainers want shards of roughly equal row counts, laid out by the
    mixture key (source/lang) so data-mixing readers can sample per
    directory. `maxRecordsPerFile` bounds every file WITHOUT a global
    sort; `repartition(partition_by)` co-locates each partition value's
    rows so the writer emits ceil(n/rows_per_shard) full shards per value
    instead of num_tasks × num_values fragments (the small-file problem
    that kills 100 TB scans). Compression follows the session codec
    (zstd/snappy) — orthogonal to the layout.
    """
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    return path
