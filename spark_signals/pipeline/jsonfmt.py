"""Canonical serialization for JSON-metadata numeric fields (P11).

The reference emits JSON_OBJECT metadata on four sinks (reference:
sma_cross.py:166-172,337-341,369-375; metrics/performance.py:144-152).
Raw double→string casts are engine-specific (shortest-repr rules differ
between JVM, Python, and C), so the metadata contract here pins every
numeric field to FIXED decimal precision with deterministic grid rounding:

    fmt_fixed(x, dp) = printf("%.{dp}f", floor(x·10^dp + 0.5000001)/10^dp)

Both halves are cross-engine exact: the grid rounding uses only IEEE-exact
primitives (see parity.sround for the nudge rationale), and fixed-format
printf of a grid value is correctly rounded in every implementation in play
(Java Formatter, glibc, fmt). That makes the metadata string byte-identical
between Spark and the DuckDB oracle — so the driver hash-gates it like any
other column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fmt_fixed(col: Column, dp: int) -> Column:
    """Render a double at fixed ``dp`` decimals, deterministically."""
    scale = F.lit(float(10**dp))
    grid = F.floor(col * scale + F.lit(0.5000001)) / scale
    return F.format_string(f"%.{dp}f", grid)


def sql_fmt_fixed(expr: str, dp: int) -> str:
    """The DuckDB mirror of :func:`fmt_fixed` (same grid, same printf)."""
    return f"printf('%.{dp}f', floor(({expr}) * 1e{dp} + 0.5000001) / 1e{dp})"


def fmt_fixed_sqltext(expr: str, dp: int) -> str:
    """:func:`fmt_fixed` as Spark-SQL text (for selectExpr call sites) —
    parses to the identical Catalyst expression as the Column form; the
    ``D`` suffix keeps the nudge literal a double (see rounding.sround_sql).
    """
    from spark_signals.rounding import sround_sql

    return f"format_string('%.{dp}f', {sround_sql(expr, dp)})"
