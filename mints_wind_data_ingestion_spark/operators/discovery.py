"""GFS file discovery (SURVEY.md §2.4 A3 / §2.6 O1, converter.py:119-227).

The reference's 40-attempt imperative backtracking loop — try the
newest 6 h run, on 404 roll back one cycle with hand-written calendar
arithmetic — becomes a declarative plan: generate the candidate run
timestamps with `sequence`, rank them newest-first, semi-join against
availability, take rank-1. The ≤40 bound is the sequence length; the
early-exit (F8) is `limit(1)`.

Deliberate divergences from the reference (SURVEY.md §7 'bugs we fix'):
- century leap years are correct (Spark's proleptic-Gregorian calendar
  vs the `year % 4` test at converter.py:204);
- the forecast offset ADVANCES as runs recede (converter.py:132 keeps
  `hourWithinRef` frozen from the newest run, so older candidates point
  at the wrong forecast file and would be stamped into the wrong
  bucket). `candidates()` recomputes offset = obs_ts - run_ts per
  candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["candidates", "freshest_available"]

RUN_CYCLE_HOURS = 6
OBS_BUCKET_HOURS = 3
MAX_ATTEMPTS = 40  # converter.py:33-35 (~10 days of GFS runs)


def candidates(
    spark: SparkSession,
    now_ts: str,
    attempts: int = MAX_ATTEMPTS,
) -> DataFrame:
    """Candidate GFS runs for an observation time, newest first.

    Returns (rank, run_ts, obs_ts, forecast_hours, url_path) — the URL
    pattern of converter.py:136-137:
    gfs.{yyyyMMdd}/{HH}/atmos/gfs.t{HH}z.pgrb2.1p00.f{FFF}.
    """
    base = spark.range(1).select(
        F.lit(now_ts).cast("timestamp").alias("now_ts")
    )
    run0 = F.timestamp_seconds(
        F.floor(F.unix_timestamp("now_ts") / (RUN_CYCLE_HOURS * 3600))
        * (RUN_CYCLE_HOURS * 3600)
    )
    obs = F.timestamp_seconds(
        F.floor(F.unix_timestamp("now_ts") / (OBS_BUCKET_HOURS * 3600))
        * (OBS_BUCKET_HOURS * 3600)
    )
    cands = base.select(
        obs.alias("obs_ts"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(attempts - 1)),
                lambda i: run0 - F.make_interval(hours=i * F.lit(RUN_CYCLE_HOURS)),
            )
        ).alias("rank", "run_ts"),
    )
    fhours = (
        (F.unix_timestamp("obs_ts") - F.unix_timestamp("run_ts")) / 3600
    ).cast("int")
    url = F.concat(
        F.lit("gfs."),
        F.date_format("run_ts", "yyyyMMdd"),
        F.lit("/"),
        F.date_format("run_ts", "HH"),
        F.lit("/atmos/gfs.t"),
        F.date_format("run_ts", "HH"),
        F.lit("z.pgrb2.1p00.f"),
        F.format_string("%03d", fhours),
    )
    return cands.select(
        "rank",
        "run_ts",
        "obs_ts",
        fhours.alias("forecast_hours"),
        url.alias("url_path"),
    )


def freshest_available(cands: DataFrame, available: DataFrame, on: str = "run_ts") -> DataFrame:
    """Newest candidate that exists in `available` — the loop's first
    successful urlopen (converter.py:142,181). Candidate set is ≤40 rows
    → broadcast; limit(1) short-circuits."""
    return (
        F.broadcast(cands)
        .join(available.select(on).distinct(), on, "left_semi")
        .orderBy("rank")
        .limit(1)
    )
