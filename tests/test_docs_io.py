"""Document-corpus IO bookends: JSONL ingest (malformed dropped, schema
enforced) and the size-bounded training-shard writer."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from spark_signals.io.docs import read_documents_jsonl, write_training_shards


def test_jsonl_ingest_drops_malformed_and_backfills_n_chars(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}',
                '{"doc_id": 2, "text": "no n_chars field", "lang": "en", "source": "s1"}',
                "this is not json at all {{{",
                '{"doc_id": 3, "lang": "en", "source": "s1"}',  # missing text
                '{"text": "missing id", "lang": "en", "source": "s1"}',
                '{"doc_id": 4, "text": "ok", "lang": null, "source": null}',
            ]
        )
    )
    out = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 4}  # malformed + missing-required dropped
    assert rows[2]["n_chars"] == len("no n_chars field")  # backfilled
    assert rows[1]["n_chars"] == 11  # provided value respected
    assert out.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    # ingested corpus feeds the curation operators directly
    from spark_signals.datapipe.dedup import dedup_exact

    assert dedup_exact(out).count() == 3


def test_training_shards_bounded_and_partitioned(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 2}", 10) for i in range(1000)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, rows_per_shard=100)
    for src in ("src0", "src1"):
        files = glob.glob(os.path.join(out, f"source={src}", "*.parquet"))
        # 500 rows / 100 per shard => exactly 5 full shards, no fragments
        assert len(files) == 5, files
        for f in files:
            assert spark.read.parquet(f).count() <= 100
    # round-trips with the partition column restored
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select(F.countDistinct("source")).first()[0] == 2


def test_kafka_document_decode_matches_jsonl_contract(spark, tmp_path):
    """The wire decode and the file reader must admit/drop the SAME rows
    and produce identical relations — a corpus's content cannot depend on
    its transport. (No broker in the sandbox: the decode runs on a frame
    shaped like Kafka's (key, value) output, the same strategy as the tick
    wire-contract tests.)"""
    from spark_signals.io.docs import decode_document_payloads, read_documents_jsonl

    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}',
        '{"doc_id": 2, "text": "no n_chars field", "lang": "en", "source": "s1"}',
        "this is not json at all {{{",
        '{"doc_id": 3, "lang": "en", "source": "s1"}',
        '{"text": "missing id", "lang": "en", "source": "s1"}',
        '{"doc_id": 4, "text": "ok", "lang": null, "source": null}',
        # type-mismatched OPTIONAL field: must be dropped on BOTH transports
        # (the r06 wire decode nulled just the field and kept the row while
        # the file reader dropped it — advisor divergence)
        '{"doc_id": 5, "text": "bad optional", "lang": "en", "source": "s1", "n_chars": "eleven"}',
        # type-mismatched REQUIRED field
        '{"doc_id": "six", "text": "bad id", "lang": "en", "source": "s1"}',
    ]
    payloads = spark.createDataFrame(
        [(None, line.encode()) for line in lines], "key binary, value binary"
    )
    via_wire = sorted(tuple(r) for r in decode_document_payloads(payloads).collect())

    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines))
    via_file = sorted(tuple(r) for r in read_documents_jsonl(spark, str(p)).collect())
    assert via_wire == via_file
    assert [r[0] for r in via_wire] == [1, 2, 4]


def test_document_sink_golden_bytes_and_round_trip(spark):
    """The document topic's wire contract, pinned like the tick sinks: the
    encoder's exact bytes (field order = column order, nulls omitted,
    doc_id as the partition key) and decode(encode(x)) == x."""
    from spark_signals.io.docs import (
        decode_document_payloads,
        encode_document_payloads,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world", "en", "s1", 11),
            (4, "ok", None, None, 2),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["key"]: r["value"] for r in encode_document_payloads(docs).collect()}
    assert got["1"] == (
        '{"doc_id":1,"text":"hello world","lang":"en","source":"s1","n_chars":11}'
    )
    # nulls omitted, field order preserved
    assert got["4"] == '{"doc_id":4,"text":"ok","n_chars":2}'

    payloads = encode_document_payloads(docs).select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    )
    back = sorted(tuple(r) for r in decode_document_payloads(payloads).collect())
    want = sorted(tuple(r) for r in docs.collect())
    assert back == want
