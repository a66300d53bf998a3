"""Retention (SURVEY.md §2.1 S7 / §2.2 F5, deleteOld.py:9).

`DELETE WHERE recorded_time < now() - interval '7 days'` becomes either
a filter (logical retention) or a partition drop (physical). On a
date-partitioned table the filter IS partition pruning — Spark never
opens files outside the window, so retention enforcement costs O(kept
data), and dropping aged partitions is a metadata operation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["retain_recent", "expired_partitions"]


def retain_recent(
    df: DataFrame,
    ts_col: str = "recorded_time",
    days: int = 7,
    anchor: Column | None = None,
) -> DataFrame:
    """Rows within the retention window. `anchor` defaults to
    current_timestamp() (reference parity); tests pass max(ts) for
    determinism."""
    a = anchor if anchor is not None else F.current_timestamp()
    return df.filter(F.col(ts_col) >= a - F.expr(f"INTERVAL {int(days)} DAYS"))


def expired_partitions(
    df: DataFrame,
    ts_col: str = "recorded_time",
    days: int = 7,
    anchor: Column | None = None,
) -> DataFrame:
    """Distinct dates strictly older than the window — the partition
    list a maintenance job would drop (one row per partition; tiny)."""
    a = anchor if anchor is not None else F.current_timestamp()
    return (
        df.filter(F.col(ts_col) < a - F.expr(f"INTERVAL {int(days)} DAYS"))
        .select(F.to_date(ts_col).alias("partition_date"))
        .distinct()
    )
