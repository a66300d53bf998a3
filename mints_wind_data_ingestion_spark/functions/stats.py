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

__all__ = ["weighted_median", "fit_group_trend", "ewma_group"]


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


def fit_group_trend(df, key: str, x_col: str, y_col: str, id_col: str):
    """Per-group OLS trend fit + per-row residuals via applyInPandas
    (GROUPED_MAP) — the Spark surface for "run a model per key and
    emit row-level output". GROUPED_AGG (weighted_median above)
    reduces a group to a scalar; this keeps the group's rows, so
    detrending/normalization/anomaly scores come back at full
    granularity.

    Determinism contract (the DuckDB oracle mirrors it exactly): rows
    are ordered by `id_col` inside the group, all sums are sequential
    left-to-right float64 cumulative sums (np.cumsum — never np.sum's
    pairwise tree), slope/intercept use the textbook closed form with
    a zero-variance guard, and emitted values are e6/e9-quantized with
    floor(v·10^k + 0.5).

    Scale: one shuffle on `key`; each group must fit a pandas frame —
    the same holistic contract as any per-entity model fit. 100 TB
    posture: high-cardinality keys (millions of small groups), Arrow
    batches, no driver involvement.
    """
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    schema = f"{key} long, {id_col} long, slope_e9 long, resid_e6 long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable")
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = float(len(x))
        sx = np.cumsum(x)[-1]
        sy = np.cumsum(y)[-1]
        sxy = np.cumsum(x * y)[-1]
        sxx = np.cumsum(x * x)[-1]
        denom = n * sxx - sx * sx
        if denom == 0.0:
            slope, intercept = 0.0, sy / n
        else:
            slope = (n * sxy - sx * sy) / denom
            intercept = (sy - slope * sx) / n
        resid = y - (intercept + slope * x)
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "slope_e9": np.floor(slope * 1e9 + 0.5).astype("int64"),
                "resid_e6": np.floor(resid * 1e6 + 0.5).astype("int64"),
            }
        )

    return df.select(key, id_col, x_col, y_col).groupBy(key).applyInPandas(fit, schema)


def ewma_group(df, key: str, order_col: str, val_col: str, alpha: float):
    """Per-group exponentially-weighted moving average:
    ewma_0 = x_0;  ewma_t = α·x_t + (1−α)·ewma_{t−1}

    A linear RECURRENCE — the one window shape SQL window frames
    cannot express (each row depends on the previous OUTPUT, not the
    previous inputs). The closed form α·Σ(1−α)^(t−i)x_i exists but
    computing it with window sums needs (1−α)^(−t) scaling that
    overflows double for long series and pow() whose last-ulp differs
    across engines; the sequential fold is numerically stable AND
    engine-exact (the DuckDB oracle states it as the identical
    list_reduce fold).

    Shape: grouped-map applyInPandas, one shuffle on `key`, sequential
    per group — inherent to the recurrence; groups stream through
    Arrow. Output quantized e6 (floor(v·1e6 + 0.5)) for the hash gate.
    """
    import numpy as np

    schema = f"{key} long, {order_col} long, ewma_e6 long"
    a = float(alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        x = pdf[val_col].to_numpy(dtype="float64")
        out = np.empty_like(x)
        acc = x[0]
        out[0] = acc
        for i in range(1, len(x)):
            acc = a * x[i] + (1.0 - a) * acc
            out[i] = acc
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy(),
                order_col: pdf[order_col].to_numpy(),
                "ewma_e6": np.floor(out * 1e6 + 0.5).astype("int64"),
            }
        )

    return df.select(key, order_col, val_col).groupBy(key).applyInPandas(fold, schema)
