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

__all__ = [
    "weighted_median",
    "weighted_median_by",
    "fit_group_trend",
    "ewma_group",
    "ewma_trend_group",
]


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


def _bucketed(df, key: str, n_buckets: int | None):
    """Attach a hash-bucket column over `key` for batched grouped-map.

    applyInPandas pays a fixed cost PER GROUP (one Arrow batch, one
    pandas frame, one Python call); with high-cardinality keys and
    small groups that overhead dominates — measured at sf0.1
    (100k events, 1 500 users): a NO-OP applyInPandas on user_id costs
    ~5.5 s while the actual recurrence arithmetic is ~50 ms. Grouping
    by pmod(xxhash64(key), B) instead packs ~|keys|/B users into each
    pandas call; the per-key math inside is unchanged bit-for-bit, so
    oracles stay exact. B defaults to 2× parallelism — enough buckets
    to spread the shuffle, few enough that Arrow overhead amortizes.

    MEMORY CONTRACT: bucketing changes the per-task frame from
    one-key's-rows to ~N/B rows — per-task memory now scales with
    input size at fixed B. At 100 TB, size B so a bucket fits an
    executor (B ≈ input_rows / rows_per_task_budget, e.g. a few
    million rows/task), via the `n_buckets` parameter every caller
    exposes; the 2×-parallelism default is a LOCAL-MODE convenience,
    not a scale setting.
    """
    from pyspark.sql import functions as F

    if n_buckets is None:
        n_buckets = 2 * df.sparkSession.sparkContext.defaultParallelism
    return df.withColumn(
        "__bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
    )


def ewma_trend_group(df, key: str, order_col: str, x_col: str,
                     val_col: str, alpha: float,
                     n_buckets: int | None = None):
    """EWMA recurrence AND OLS trend fit in ONE bucketed grouped-map
    pass: (key, order, ewma_e6, slope_e9, resid_e6) per row.

    Bit-identical to running `ewma_group` and `fit_group_trend`
    separately and joining (same stable (key, order) sort, same
    sequential folds/cumulative sums, same quantization) — but one
    shuffle, one Arrow round-trip, and one frame walk instead of two
    of each plus a join. The composite x_grouped_models uses this;
    the standalone components keep the single-model kernels.
    """
    import numpy as np

    schema = (
        f"{key} long, {order_col} long, "
        "ewma_e6 long, slope_e9 long, resid_e6 long"
    )
    a = float(alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key, order_col], kind="stable")
        ks = pdf[key].to_numpy()
        xa = pdf[x_col].to_numpy(dtype="float64")
        ya = pdf[val_col].to_numpy(dtype="float64")
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        ew = np.empty_like(ya)
        slope_q = np.empty(len(ks), dtype="int64")
        resid_q = np.empty(len(ks), dtype="int64")
        for s, e in zip(starts, ends):
            # EWMA — identical fold to ewma_group
            acc = ya[s]
            ew[s] = acc
            for i in range(s + 1, e):
                acc = a * ya[i] + (1.0 - a) * acc
                ew[i] = acc
            # OLS — identical cumulative sums to fit_group_trend
            x, y = xa[s:e], ya[s:e]
            n = float(e - s)
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
            slope_q[s:e] = np.floor(slope * 1e9 + 0.5).astype("int64")
            resid_q[s:e] = np.floor(resid * 1e6 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                key: ks,
                order_col: pdf[order_col].to_numpy(),
                "ewma_e6": np.floor(ew * 1e6 + 0.5).astype("int64"),
                "slope_e9": slope_q,
                "resid_e6": resid_q,
            }
        )

    return (
        _bucketed(df.select(key, order_col, x_col, val_col), key, n_buckets)
        .groupBy("__bkt")
        .applyInPandas(fold, schema)
    )


def weighted_median_by(df, key: str, x_col: str, w_col: str,
                       out: str = "wmedian",
                       n_buckets: int | None = None):
    """Per-key lower weighted median as a BUCKETED grouped-map — the
    high-cardinality-key fast path next to the `weighted_median`
    GROUPED_AGG UDAF (same statistic, bit-identical: stable sort by
    (key, x), per-key float64 cumsum, first x whose cumulative weight
    reaches half the total — always an observed value, so any engine
    reproduces it exactly).

    Why a second surface: GROUPED_AGG pays one Arrow batch + one
    Python call PER GROUP; on l_partkey (~20k groups at sf0.1) that
    fixed cost dominated 10:1. Bucketing packs ~|keys|/B groups per
    pandas call (see _bucketed for the measured rationale and the
    bucket-memory contract); inside, the per-key numpy work is a
    segment loop over a single sorted frame. Returns (key, out).
    """
    import numpy as np

    key_t = df.schema[key].dataType.simpleString()
    schema = f"{key} {key_t}, {out} double"

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key, x_col], kind="stable")
        k = pdf[key].to_numpy()
        x = pdf[x_col].to_numpy(dtype="float64")
        w = pdf[w_col].to_numpy(dtype="float64")
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        med = np.empty(len(starts), dtype="float64")
        for j, (s, e) in enumerate(zip(starts, ends)):
            cw = np.cumsum(w[s:e])
            # first index with cumulative weight >= half the total —
            # identical to the UDAF's boolean-mask pick
            med[j] = x[s + int(np.searchsorted(cw, cw[-1] / 2.0, side="left"))]
        return pd.DataFrame({key: k[starts], out: med})

    return (
        _bucketed(df.select(key, x_col, w_col), key, n_buckets)
        .groupBy("__bkt")
        .applyInPandas(agg, schema)
    )


def fit_group_trend(df, key: str, x_col: str, y_col: str, id_col: str,
                    n_buckets: int | None = None):
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

    Scale: one shuffle on the hash bucket (many keys per pandas call —
    see _bucketed for the measured rationale); each KEY's rows still
    land in one frame, the holistic contract of any per-entity fit.
    100 TB posture: Arrow batches, no driver involvement.
    """
    import numpy as np

    schema = f"{key} long, {id_col} long, slope_e9 long, resid_e6 long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key, id_col], kind="stable")
        xa = pdf[x_col].to_numpy(dtype="float64")
        ya = pdf[y_col].to_numpy(dtype="float64")
        ks = pdf[key].to_numpy()
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        slope_q = np.empty(len(ks), dtype="int64")
        resid_q = np.empty(len(ks), dtype="int64")
        for s, e in zip(starts, ends):
            x, y = xa[s:e], ya[s:e]
            n = float(e - s)
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
            slope_q[s:e] = np.floor(slope * 1e9 + 0.5).astype("int64")
            resid_q[s:e] = np.floor(resid * 1e6 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                key: ks,
                id_col: pdf[id_col].to_numpy(),
                "slope_e9": slope_q,
                "resid_e6": resid_q,
            }
        )

    return (
        _bucketed(df.select(key, id_col, x_col, y_col), key, n_buckets)
        .groupBy("__bkt")
        .applyInPandas(fit, schema)
    )


def ewma_group(df, key: str, order_col: str, val_col: str, alpha: float,
               n_buckets: int | None = None):
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

    Shape: grouped-map applyInPandas, one shuffle on a hash BUCKET of
    `key` (many keys per pandas call — the Arrow-per-group fixed cost
    dominated the recurrence arithmetic ~100:1 when every user was its
    own group; see _bucketed). Inside a bucket the fold walks the
    frame once with per-key resets — the per-key operation sequence
    (and therefore every rounding) is identical to the one-group-
    per-key formulation, so the e6-quantized DuckDB oracle is
    unaffected. Sequential per key is inherent to the recurrence; a
    scipy.signal.lfilter path (bit-identical first-order DF2T steps)
    would vectorize the inner loop, but scipy is not in this
    environment and the loop is ~50 ms of the ~3 s total.
    """
    import numpy as np

    schema = f"{key} long, {order_col} long, ewma_e6 long"
    a = float(alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key, order_col], kind="stable")
        x = pdf[val_col].to_numpy(dtype="float64")
        ks = pdf[key].to_numpy()
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        out = np.empty_like(x)
        for s, e in zip(starts, ends):
            acc = x[s]
            out[s] = acc
            for i in range(s + 1, e):
                acc = a * x[i] + (1.0 - a) * acc
                out[i] = acc
        return pd.DataFrame(
            {
                key: ks,
                order_col: pdf[order_col].to_numpy(),
                "ewma_e6": np.floor(out * 1e6 + 0.5).astype("int64"),
            }
        )

    return (
        _bucketed(df.select(key, order_col, val_col), key, n_buckets)
        .groupBy("__bkt")
        .applyInPandas(fold, schema)
    )
