"""Structured Streaming wrapper — cron-as-stream (SURVEY.md §2.9).

The reference is a hand-cranked micro-batch stream: cron tick = trigger
(README.md:11), NOAA directory = source, Postgres = sink, existence
check + delete/insert = update-mode upsert, deleteOld.py = state TTL.
Here the same semantics are declared:

- file source over the landing dir (T5: backlog/catch-up is native);
- `trigger(availableNow=True)` ≙ one cron tick (T1);
- `foreachBatch` → operators.upsert.merge_latest_wins (T3: newer
  forecast run replaces, equal-or-older skipped) — idempotent per
  epoch, which with checkpointing gives exactly-once (T6) where the
  reference's separate DELETE/INSERT commits could interleave;
- `withWatermark` bounds state for windowed aggs (T4 ≙ 7-day
  retention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import WIND_RECORD
from ..sources.wind_json import to_wind_table
from ..operators.upsert import merge_latest_wins

__all__ = ["run_ingest_stream", "stream_windowed_counts"]


def run_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Ingest decoded wind-record JSON files from `landing_dir` into the
    wind table at `table_path` with latest-wins merge per
    (recorded_time, param), versioned by ref_time.

    One micro-batch ≙ one reference cron run. foreachBatch is the only
    place imperative code exists — and it is a pure batch merge, so a
    replayed epoch produces identical state (idempotent upsert, §5
    test 4).
    """
    raw = (
        spark.readStream.schema(WIND_RECORD)
        .option("multiLine", "true")
        .json(landing_dir)
    )
    records = to_wind_table(raw)

    def merge_epoch(batch: DataFrame, epoch_id: int) -> None:
        s = batch.sparkSession
        try:
            stored = s.read.parquet(table_path)
        except Exception:  # first epoch: table does not exist yet
            stored = None
        incoming = merge_latest_wins(  # dedup within the batch itself first
            batch.limit(0), batch, keys=["recorded_time", "param"], version="ref_time"
        )
        if stored is not None:
            merged = merge_latest_wins(
                stored, incoming, keys=["recorded_time", "param"], version="ref_time"
            )
        else:
            merged = incoming
        # rewrite via temp path is unnecessary under dynamic partition
        # overwrite keyed on date; small fixture tables just overwrite.
        merged.persist()
        merged.count()
        merged.write.mode("overwrite").parquet(table_path)
        merged.unpersist()

    writer = (
        records.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_epoch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    events: DataFrame,
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str = "7 days",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation over a streaming
    events DataFrame (T2/T4): the streaming twin of
    plans.relational.j_range_windows."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "event_cnt",
            "value_sum",
        )
    )
