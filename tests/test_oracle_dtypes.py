"""Guard against the oracle-SQL integer-SUM dtype trap (VERDICT r04 #1/#3).

DuckDB's ``SUM``/``PRODUCT`` over an integer column returns HUGEINT
(INT128).  pandas has no int128, so ``fetchdf()`` materializes the column
as float64 — while Spark's sum over the same column stays int64.  The
driver's value hash then sees ``5.0`` vs ``5`` and flags the query red
even when every value matches (this exact mismatch kept
``metrics_hourly_rollup`` red for rounds 1-4).

The fix is ``CAST(SUM(x) AS BIGINT)`` in the oracle SQL; this test makes
the fix permanent for *every* registered oracle (driver-checked AND
retired/extended) by binding each SQL in DuckDB — planning only, no
execution — and asserting no output column has a 128-bit integer type.
"""

from __future__ import annotations

import importlib
import sys

import duckdb
import pytest

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# pandas cannot represent these; fetchdf() silently degrades them to
# float64, which the driver's hash distinguishes from Spark's int64.
FORBIDDEN_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


def _all_oracles() -> dict[str, str]:
    entrymod = importlib.import_module("__spark_entry__")
    merged = dict(entrymod.oracle_sql())
    merged.update(entrymod.extended_oracle_sql())
    return merged


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(_all_oracles()))
def test_oracle_output_has_no_int128_columns(con, name):
    sql = _all_oracles()[name]
    rel = con.sql(sql)  # binds + plans; does not execute
    offenders = [
        f"{col}:{dtype}"
        for col, dtype in zip(rel.columns, [str(t) for t in rel.types])
        if str(dtype).upper() in FORBIDDEN_TYPES
    ]
    assert not offenders, (
        f"oracle '{name}' outputs 128-bit integer column(s) {offenders}; "
        "pandas will degrade them to float64 and the driver hash will "
        "mismatch Spark's int64 — wrap in CAST(... AS BIGINT)"
    )
