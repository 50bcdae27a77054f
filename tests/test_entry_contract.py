"""Contract checks for __spark_entry__ (driver interface)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable_and_oracle_alignment():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key must have a query
    assert set(oq) <= set(qs)


def test_queries_run_at_smallest_sf(spark):
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        df = fn(spark, sf)
        assert df.columns, name
