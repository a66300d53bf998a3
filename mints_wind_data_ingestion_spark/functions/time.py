"""Temporal expression library (SURVEY.md §2.8 C1-C9).

The reference hand-rolls every piece of calendar arithmetic — 6 h run
bucketing (converter.py:126), 3 h observation bucketing (converter.py:129),
a 34-line previous-day rollback with its own leap-year table
(converter.py:188-222, century-leap-year bug at :204), and a timezone
day-shift special case (converter.py:63-69). Here each is ONE catalyst
expression on real UTC timestamps; the bug classes vanish.

All functions return Column expressions — JVM-side, codegen'd, no UDFs.
Bucketing is done in epoch space (`unix_timestamp` → floor →
`timestamp_seconds`), which is timezone-free and therefore identical in
any engine (the DuckDB oracle mirrors it with `epoch()`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "bucket",
    "bucket_3h",
    "bucket_6h",
    "hour_delta",
    "fmt_recorded_time",
    "retention_cutoff",
]


def bucket(ts: Column | str, seconds: int) -> Column:
    """Floor a timestamp to a fixed-width bucket (tumbling window start).

    Equivalent to ``window(ts, f"{seconds} seconds").start`` but cheaper:
    no struct construction, stays a scalar expression. Reference: the
    `floor(hour/N)*N` idiom (converter.py:126,129).
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(F.floor(F.unix_timestamp(col) / seconds) * seconds)


def bucket_3h(ts: Column | str) -> Column:
    """3 h observation bucket (C2, converter.py:129)."""
    return bucket(ts, 3 * 3600)


def bucket_6h(ts: Column | str) -> Column:
    """6 h GFS run-cycle bucket (C1, converter.py:126)."""
    return bucket(ts, 6 * 3600)


def hour_delta(a: Column | str, b: Column | str) -> Column:
    """Whole-hour delta between two timestamps (C3, converter.py:132).

    Done on epochs, not `hour()` fields — the reference's hour-field
    subtraction breaks across midnight; this doesn't.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.abs(F.unix_timestamp(ca) - F.unix_timestamp(cb)) / F.lit(3600)


def fmt_recorded_time(ts: Column | str) -> Column:
    """Render the reference's recordedTime text form
    'YYYY-MM-DD HH:00:00+00' (C4, converter.py:67)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.concat(F.date_format(col, "yyyy-MM-dd HH:00:00"), F.lit("+00"))


def retention_cutoff(anchor: Column, days: int = 7) -> Column:
    """`anchor - INTERVAL N DAYS` (F5/C7, deleteOld.py:9).

    The reference anchors on now(); for deterministic tests callers pass
    an explicit anchor (e.g. max(ts) of the table).
    """
    return anchor - F.expr(f"INTERVAL {int(days)} DAYS")
