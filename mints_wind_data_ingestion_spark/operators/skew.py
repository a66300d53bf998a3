"""Skew mitigation (SURVEY.md §4 join-strategy notes; 100 TB posture).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew for sort-merge joins. Salting is the explicit fallback for the
cases AQE cannot fix — skewed AGGREGATION keys, and skewed join keys
where the planner lacks runtime stats (e.g. freshly shuffled
intermediates) — and the pattern the engine documents for 1000-executor
deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_agg_count"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: the (large, skewed) left side
    gets a random salt in [0, salt); the (smaller) right side is
    replicated `salt` times; the join key becomes (key, salt), so a hot
    key's rows spread over `salt` reducers instead of one straggler.

    Cost model: right side × salt replication vs left side's hottest
    key ÷ salt. Worth it iff the hot key dominates a partition —
    measure first; for dimension-sized right sides prefer a plain
    broadcast join (no shuffle at all).

    Only left-preserving join types are legal: the right side is
    replicated `salt` times, so right/full outer would emit each
    unmatched right row `salt` times and right_anti/semi would match
    against replicas — silently wrong. Restricted to
    {inner, left, left_outer, left_semi, left_anti}.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only "
            f"({sorted(allowed)}); got {how!r} — the replicated right "
            f"side would duplicate unmatched right rows"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count for skewed group keys: partial count on
    (key, salt) — hot keys spread over `salt` reducers — then final
    sum on key. Same result as groupBy(key).count(), bounded reducer
    size. (Spark's partial aggregation already does this when the
    UPSTREAM partitioning is random; explicit salting matters when the
    input arrives pre-partitioned BY the hot key.)"""
    return (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
