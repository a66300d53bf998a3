"""Custom aggregates (SURVEY.md §2.10 UDAF row).

The reference has no custom aggregation (its only aggregate is the
existence count, converter.py:161); this module closes the one Spark
UDAF surface the engine had not exercised: a pandas Series-to-scalar
(GROUPED_AGG) UDF, usable in `groupBy().agg()` and over windows.

Why a UDAF at all: the lower weighted median has no built-in — it
needs the whole group sorted with a running weight, which neither
`percentile_approx` (unweighted) nor any algebraic aggregate
expresses. Arrow moves each group's two columns in one batch; numpy
does the sort + cumsum. GROUPED_AGG pulls one group per invocation
into memory, so use it on HIGH-CARDINALITY keys (many small groups —
here l_partkey) — the same contract as any holistic aggregate at
100 TB. For low-cardinality keys prefer a sketch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

__all__ = ["weighted_median"]


@pandas_udf("double")
def weighted_median(x: pd.Series, w: pd.Series) -> float:
    """Lower weighted median: the smallest x whose cumulative weight
    reaches half the total. No interpolation — the result is always an
    observed value, so it is exactly reproducible in any engine (the
    DuckDB oracle states it with two window sums), and ties in x
    cannot make it nondeterministic (every permutation of a tie block
    yields the same minimal x).
    """
    order = x.to_numpy().argsort(kind="stable")
    xs = x.to_numpy()[order]
    cw = w.to_numpy()[order].cumsum()
    return float(xs[cw >= cw[-1] / 2.0][0])
