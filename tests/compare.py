"""Differential comparison utilities: Spark result vs DuckDB oracle.

Mirrors the driver's check (row count + column names + order-insensitive
value hash), but compares actual values so failures are debuggable.
Floats are compared EXACTLY — the engine's queries are designed to be
bit-stable (decimal-backed reductions, total orders on every top-k), and
a laxer comparison here would hide failures the driver's hash would
catch.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any


def normalize_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return int(v) if v.is_integer() else v
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _key(row: tuple) -> str:
    return repr(row)


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (as the driver does), normalize values,
    return a sorted list of row tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(normalize_value(r[i]) for i in order) for r in rows]
    out.sort(key=_key)
    return out


def assert_results_match(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
    name: str = "",
) -> None:
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_multiset(spark_cols, spark_rows)
    d = rows_to_multiset(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, duck): {diffs}"
        )
