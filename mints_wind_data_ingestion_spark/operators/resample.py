"""Time-series resampling: per-key linear interpolation onto a
regular tick grid — the gap-fill/regularization step every
sensor/observation pipeline (the reference's wind domain included)
runs before windowed analytics, re-expressed Spark-first.

No range join and no per-tick as-of probe: observations and ticks
UNION into one per-key ordered stream, and two running windows
(forward and reverse, each `unboundedPreceding → currentRow`, which
Spark evaluates incrementally — O(1) state per row) attach the
bracketing observations to every tick. One shuffle on the key, two
window passes, pure codegen'd interpolation arithmetic.

Determinism contract (registry rules):
- duplicate observation timestamps collapse FIRST by latest-wins on
  the id column (the engine's upsert semantics), so window order is a
  total order;
- the tick grid derives from the DATA's min/max epoch (integer
  arithmetic, `ceil(min/step)·step`), never from now();
- interpolation runs on exact integer microseconds and quantizes to
  e6 — `prev + (next − prev) · (tick − prev_ts)/(next_ts − prev_ts)`
  is the identical double expression in the DuckDB oracle;
- ticks outside a key's observed range are DROPPED (no extrapolation
  — a gap-fill that invents data outside support is a correctness
  bug, not a feature). A tick landing exactly on an observation
  returns that observation (the prev/next brackets coincide).

No counterpart in the reference (its cron ETL stores raw grids);
the operator class is standard (pandas.DataFrame.resample/interpolate,
TimescaleDB time_bucket_gapfill + locf/interpolate) re-expressed as
distributed window algebra.

100 TB posture: everything is one hash partition per key + ordered
scan; tick explosion is bounded by (range/step) per key and never
materializes key × global-grid for keys with narrow support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_interpolate"]


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    step_us: int,
    kind: str = "linear",
) -> DataFrame:
    """→ (key, tick_us, v_e6): `val_col` resampled at every
    `step_us`-aligned tick inside each key's observed time range.
    `kind`: "linear" interpolates between the bracketing observations;
    "locf" carries the last observation forward (TimescaleDB's locf —
    still bounded by the key's own range, so the last observed value
    fills only up to the final tick at/before max(ts), never beyond
    the data)."""
    step_us = int(step_us)
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    if kind not in ("linear", "locf"):
        raise ValueError(f"kind must be 'linear' or 'locf', got {kind!r}")
    obs = df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(val_col).alias("v"),
        F.col(id_col).alias("rid"),
    ).filter(F.col("v").isNotNull() & F.col("ts_us").isNotNull())
    # NULL-valued rows are NOT observations: kept, they would
    # desynchronize the bracketing windows (prev_v's last non-NULL v
    # belongs to a LATER obs than prev_ts's last obs timestamp) and
    # interpolate against the wrong anchor — and max_by could pick a
    # NULL v at a duplicate timestamp where the oracle's arg_max
    # skips NULL arguments.
    # duplicate timestamps collapse latest-wins on the id — without
    # this the window order (and thus the bracketing obs) would be
    # partition-order-dependent
    obs = obs.groupBy("k", "ts_us").agg(F.max_by("v", "rid").alias("v"))

    # PER-KEY tick grid, aligned to the absolute epoch (ceil of the
    # key's own minimum — exact integer arithmetic): a key with narrow
    # support generates only its own ticks, never key × global-range
    # rows; alignment stays globally consistent because ticks are
    # multiples of step regardless of which key generates them
    ticks = (
        obs.groupBy("k")
        .agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
        .select(
            "k",
            F.col("hi"),
            # ceil(lo/step)·step in exact bigint arithmetic:
            # lo + ((−lo) mod step)
            (F.col("lo") + F.pmod(-F.col("lo"), F.lit(step_us)))
            .alias("start"),
        )
        # a key whose whole range sits between two ticks has no
        # aligned tick: sequence(start > stop, +step) THROWS in Spark,
        # so guard to empty
        .select(
            "k",
            F.explode(
                F.when(
                    F.col("start") > F.col("hi"),
                    F.array().cast("array<bigint>"),
                ).otherwise(
                    F.sequence(
                        F.col("start"), F.col("hi"), F.lit(step_us)
                    )
                )
            ).alias("ts_us"),
        )
    )

    merged = obs.select(
        "k", "ts_us", "v", F.lit(1).alias("is_obs")
    ).unionByName(
        ticks.select(
            "k", "ts_us", F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("is_obs"),
        )
    )
    # obs sorts BEFORE the tick at an equal timestamp (is_obs DESC),
    # so an exactly-hit tick brackets to that observation on both
    # sides; (k, ts_us) is unique per is_obs value after the collapse,
    # so this is a total order
    fwd = (
        Window.partitionBy("k")
        .orderBy(F.col("ts_us").asc(), F.col("is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = (
        Window.partitionBy("k")
        .orderBy(F.col("ts_us").desc(), F.col("is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ts = F.when(F.col("is_obs") == 1, F.col("ts_us"))
    bracketed = (
        merged.withColumn("prev_v", F.last("v", ignorenulls=True).over(fwd))
        .withColumn("prev_ts", F.last(obs_ts, ignorenulls=True).over(fwd))
        .withColumn("next_v", F.last("v", ignorenulls=True).over(rev))
        .withColumn("next_ts", F.last(obs_ts, ignorenulls=True).over(rev))
    )
    frac = (F.col("ts_us") - F.col("prev_ts")).cast("double") / (
        F.col("next_ts") - F.col("prev_ts")
    ).cast("double")
    if kind == "locf":
        interp = F.col("prev_v")
        have = F.col("prev_ts").isNotNull()
    else:
        interp = F.when(
            F.col("next_ts") == F.col("prev_ts"), F.col("prev_v")
        ).otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
        have = F.col("prev_ts").isNotNull() & F.col("next_ts").isNotNull()
    return (
        bracketed.filter((F.col("is_obs") == 0) & have)
        .select(
            F.col("k").alias(key_col),
            "ts_us",
            F.round(interp * F.lit(1_000_000.0)).cast("bigint")
            .alias("v_e6"),
        )
    )
