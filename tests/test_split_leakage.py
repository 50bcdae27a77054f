"""Cross-split near-dup leakage report (sampling.split_leakage_report):
deterministic-hash splits do not prevent near-duplicate pairs from
straddling train/val/test — the report quantifies exactly that."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from spark_signals.datapipe import sampling as SM

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _split_of(doc_id: int, val=SM.SPLIT_VAL_FRAC, test=SM.SPLIT_TEST_FRAC) -> str:
    bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    if bucket < test * 4294967296.0:
        return "test"
    if bucket < (test + val) * 4294967296.0:
        return "val"
    return "train"


def _pick(split: str, start: int = 0) -> int:
    i = start
    while _split_of(i) != split:
        i += 1
    return i


def test_planted_cross_split_twin_is_flagged(spark):
    """A near-identical pair planted across train/val must surface as an
    is_cross_split class; an unrelated singleton must not."""
    a_id, b_id = _pick("train"), _pick("val")
    assert _split_of(a_id) == "train" and _split_of(b_id) == "val"
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (a_id, base, "en", "s", len(base)),
        (b_id, base + " tail", "en", "s", len(base) + 5),
        (_pick("train", max(a_id, b_id) + 1), " ".join(f"z{i}" for i in range(40)), "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    rep = {
        (r["split_lo"], r["split_hi"]): r
        for r in SM.split_leakage_report(docs).collect()
    }
    leak = rep[("train", "val")]
    assert leak["is_cross_split"] and leak["n_pairs"] == 1 and leak["n_docs"] == 2
    assert leak["max_jaccard_u"] > 900_000  # near-identical pair
    assert ("train", "train") not in rep  # the singleton pairs with nobody


def test_leakage_report_cross_engine_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = (
        SM.split_leakage_report(docs)
        .toPandas()
        .sort_values(["split_lo", "split_hi"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    b = (
        con.execute(SM.sql_split_leakage_report())
        .fetchdf()
        .sort_values(["split_lo", "split_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)
    # the corpus's near-dups DO straddle splits — the report is the point
    assert a[a.is_cross_split].n_pairs.sum() > 0


def test_clustered_split_co_travels_planted_twins(spark):
    """The remediation: under split_train_val_test_clustered the planted
    near-identical pair — which the doc-hash split separates — lands in
    ONE split, and the clustered leakage report has NO cross-split rows."""
    a_id, b_id = _pick("train"), _pick("val")
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (a_id, base, "en", "s", len(base)),
        (b_id, base + " tail", "en", "s", len(base) + 5),
        (_pick("train", max(a_id, b_id) + 1), " ".join(f"z{i}" for i in range(40)), "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    spl = {r["doc_id"]: r for r in SM.split_train_val_test_clustered(docs).collect()}
    assert spl[a_id]["split"] == spl[b_id]["split"]  # twins co-travel
    assert spl[a_id]["cluster_id"] == spl[b_id]["cluster_id"] == min(a_id, b_id)
    rep = SM.split_leakage_clustered(docs).collect()
    assert rep and all(not r["is_cross_split"] for r in rep)
    # singletons keep their own id as the cluster: on a dup-free corpus
    # the clustered split IS the plain split
    solo_rows = [(i, f"unique words only here {i} " + " ".join(f"q{i}_{j}" for j in range(30)), "en", "s", 0) for i in (a_id, b_id)]
    solo = spark.createDataFrame(solo_rows, DOC_SCHEMA)
    plain = {r["doc_id"]: r["split"] for r in SM.split_train_val_test(solo).collect()}
    clustered = {r["doc_id"]: r["split"] for r in SM.split_train_val_test_clustered(solo).collect()}
    assert plain == clustered


def test_clustered_faces_cross_engine_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    a = (
        SM.split_train_val_test_clustered(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        con.execute(SM.sql_split_train_val_test_clustered())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)
    c = (
        SM.split_leakage_clustered(docs)
        .toPandas()
        .sort_values(["split_lo", "split_hi"])
        .reset_index(drop=True)
    )
    d = (
        con.execute(SM.sql_split_leakage_clustered())
        .fetchdf()
        .sort_values(["split_lo", "split_hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(c[d.columns], d, check_dtype=False)
    # the corpus that leaked under the doc-hash split is clean here
    assert len(c) > 0 and not c.is_cross_split.any()
