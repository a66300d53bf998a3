"""Single-pass dataset profiling — the "look before you train" audit
every corpus ingestion runs first: per-column null counts, exact
cardinalities, and value ranges, computed in ONE scan of the table.

Shape: all per-column aggregates are computed in a single `agg()` (one
job, one scan — Catalyst plans the N exact distincts as one Expand of
factor N over the narrow projection), producing a 1-row wide result
that a map-side `stack` unpivots into the (column × statistic) long
form. No per-column jobs, no driver loop over columns.

Scale notes (100 TB): exact count(DISTINCT) on N columns expands the
scan N-fold before the shuffle — affordable for a profile run, but the
sketch path (`approx_count_distinct`, same single-agg shape, no
Expand) is the default at full corpus scale; `x_approx_distinct`
demonstrates it. min/max/count are algebraic and free either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (col_name, n_null, n_distinct,
    min_val, max_val), min/max rendered as strings so heterogeneous
    column types share one schema (the cross-engine-stable rendering
    an audit table needs)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.select(*cols).agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)"
    )
