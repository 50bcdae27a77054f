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
    """The exact decode a Kafka document source applies to ``value`` bytes —
    byte-for-byte the same contract as :func:`read_documents_jsonl`, so a
    corpus is identical whether it arrived as files or over the wire (the
    tick-side ``decode_tick_payloads`` twin).

    ``from_json`` parses with the SAME ``_corrupt_record`` channel as the
    file scan: a row whose only defect is a type-mismatched OPTIONAL field
    (e.g. ``n_chars`` as a string) marks ``_corrupt_record`` and is DROPPED
    on both transports — plain null-out from_json kept such rows while the
    file reader dropped them (advisor r06), which would have made corpus
    content depend on transport."""
    schema = T.StructType(
        DOC_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    parsed = payloads.select(
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r")
    ).select("r.*")
    return (
        parsed.filter(
            F.col("_corrupt_record").isNull()
            & F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
        )
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


def encode_document_payloads(df: DataFrame) -> DataFrame:
    """The (key, value) projection the document JSON sink writes: value is
    the row as a JSON object (field order = column order, nulls omitted —
    the same ``to_json`` contract as the tick sinks), key = doc_id bytes so
    a topic partitions by document. ``decode_document_payloads`` of this
    output round-trips exactly (golden-byte pinned in tests)."""
    from spark_signals.io.kafka import encode_json_value

    return encode_json_value(df.select(*[f.name for f in DOC_SCHEMA.fields]),
                             key_column="doc_id")


def write_kafka_documents(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str = "documents.raw",
    checkpoint: str | None = None,
):
    """Document JSON Kafka sink builder (streaming when df is a stream,
    batch ``.write`` otherwise) — the encode bookend of
    :func:`read_kafka_documents`; same deploy checklist as io.kafka."""
    enc = encode_document_payloads(df)
    if df.isStreaming:
        w = (
            enc.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
        )
        return w.option("checkpointLocation", checkpoint) if checkpoint else w
    return (
        enc.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


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
