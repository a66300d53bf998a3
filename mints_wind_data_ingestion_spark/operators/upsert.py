"""Latest-wins upsert / MERGE (SURVEY.md §2.3 J4, §2.9 T3/T6).

The reference implements upsert destructively and non-atomically: DELETE
the stored rows for the timestamp, then INSERT the new ones, separate
commits (converter.py:96-117), with the replace/skip decision made by
comparing refTime hours (converter.py:160-171, including the 18→0 day
wrap special case that disappears once refTime is a real timestamp).

Here the merge is ONE declarative plan over (stored ∪ batch): per key,
keep the row with the greatest version; the stored side wins version
ties (the reference's strict `<` staleness test). Replayable and
idempotent — applying the same batch twice is a no-op, which is what
makes the streaming foreachBatch sink exactly-once per epoch.

At scale: the union is shuffle-partitioned once on the merge keys; with
the table date-partitioned on the key's time component, dynamic
partition overwrite rewrites only touched partitions
(`write_merged`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_latest_wins", "write_merged"]


def merge_latest_wins(
    stored: DataFrame,
    batch: DataFrame,
    keys: list[str],
    version: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Return the merged state of `stored` after applying `batch`.

    Per `keys`: absent → insert; batch.version > stored.version →
    replace; else keep stored (converter.py:160-171 semantics, ties to
    stored). `tiebreak` optionally breaks intra-side version ties
    deterministically.
    """
    if set(stored.columns) != set(batch.columns):
        raise ValueError(
            f"schema mismatch: stored={sorted(stored.columns)} batch={sorted(batch.columns)}"
        )
    tagged = stored.withColumn("__pri", F.lit(1)).unionByName(
        batch.withColumn("__pri", F.lit(0))
    )
    ord_cols: list[Column] = [F.col(version), F.col("__pri")]
    if tiebreak:
        ord_cols.append(F.col(tiebreak))
    payload = F.struct(*[c for c in stored.columns])
    merged = (
        tagged.groupBy(*keys)
        .agg(F.max_by(payload, F.struct(*ord_cols)).alias("__w"))
        .select(*[F.col(f"__w.{c}").alias(c) for c in stored.columns])
    )
    return merged


def write_merged(
    merged: DataFrame,
    path: str,
    partition_col: str | None = None,
) -> None:
    """Persist merged state. With a partition column, dynamic partition
    overwrite rewrites only the partitions present in `merged` — the
    scalable replacement for the reference's DELETE+INSERT pair."""
    spark = merged.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer = merged.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
