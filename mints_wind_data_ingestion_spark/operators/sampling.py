"""Deterministic sampling operators — the dataset-curation step of a
training pipeline (subsample a corpus, rebalance domains/languages,
draw fixed-size per-stratum audit samples) with REPRODUCIBLE output:
membership is a pure function of the row's id, never of partitioning,
task scheduling, or a seed stream.

The sampling hash is md5 of the id rendered as a string — chosen over
xxhash64 deliberately: md5 is engine-portable (DuckDB, Trino, Spark
all agree byte-for-byte), so every sample here is differentially
verifiable by the oracle. Membership compares a fixed-width hex
prefix against a threshold string — lexicographic order on fixed-width
hex IS numeric order, so `prefix < threshold` keeps exactly
floor(rate·16^width)/16^width of the hash space.

Scale notes (100 TB):

- `hash_sample` / `mixture_sample` are pure narrow filters — no
  shuffle, no state, trivially parallel, composable with column
  pruning. This is the shape to prefer at scale.
- `stratified_sample_exact` guarantees EXACTLY k rows per stratum,
  which costs a per-stratum ordering (one shuffle on the stratum
  key). Use it for audit/eval splits (small k, bounded strata). For
  rate-accurate-but-not-exact-k at corpus scale, use
  `mixture_sample` with per-stratum rates instead; for skewed
  strata, pre-aggregate counts and derive per-stratum thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["hash_bucket", "hash_sample", "mixture_sample", "stratified_sample_exact"]

#: hex digits of the md5 prefix used for membership (6 → 16M buckets,
#: rate granularity 6e-8 — far below any meaningful sampling rate)
_WIDTH = 6


def hash_bucket(id_col: Column, width: int = _WIDTH) -> Column:
    """Engine-portable sampling key: first `width` hex chars of
    md5(string(id)). Uniform over the corpus for any id distribution."""
    return F.substring(F.md5(id_col.cast("string")), 1, width)


def _threshold(rate: float, width: int = _WIDTH) -> str:
    """Hex threshold string t such that P[bucket < t] == rate (up to
    16^-width granularity)."""
    if rate >= 1.0:
        # above any width-char hex string => keep everything
        return "g" * width
    return format(int(rate * (16 ** width)), f"0{width}x")


def split_col(key: Column, train: float = 0.8, val: float = 0.1) -> Column:
    """Deterministic train/val/test assignment from a hashed key:
    'train' below `train`, 'val' in the next `val`-wide band, 'test'
    above. Pass the ENTITY whose leakage you need to prevent as the
    key — the doc id for plain splits (x_split_assign), the dedup
    CLUSTER id for near-dup-leakage-safe splits (x_dedup_cluster) —
    both split surfaces share this one rule, so a rate change cannot
    desynchronize them. Default 80/10/10 boundaries are the hex
    thresholds 'cccccc'/'e66666' (0.8/0.9 at width 6).

    Rates are validated eagerly: train+val > 1.0 would silently yield
    an empty 'test' split (the 1.0 threshold 'gggggg' absorbs it into
    'val'), and negative or oversized rates would produce malformed
    hex thresholds with broken lexicographic semantics."""
    if not (0.0 < train and 0.0 <= val and train + val <= 1.0):
        raise ValueError(
            "split_col: need 0 < train, 0 <= val, train + val <= 1.0 "
            f"(got train={train}, val={val})"
        )
    h = hash_bucket(key)
    return (
        F.when(h < F.lit(_threshold(train)), "train")
        .when(h < F.lit(_threshold(train + val)), "val")
        .otherwise("test")
    )


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: keep rows whose hash
    bucket falls below the rate threshold. Pure filter — no shuffle,
    no seed, stable across runs/partitionings/engines."""
    return df.filter(hash_bucket(F.col(id_col)) < F.lit(_threshold(rate)))


def mixture_sample(df: DataFrame, key_col: str, id_col: str, rates: dict[str, float]) -> DataFrame:
    """Domain/language mixture resampling: keep each row with the rate
    assigned to its `key_col` value (unlisted keys drop). THE
    curriculum op of corpus curation — upweight wiki, downsample web —
    as one shuffle-free filter; at 100 TB this composes with partition
    pruning when the corpus is partitioned by the mixing key."""
    thr = F.create_map(
        *[x for k, r in sorted(rates.items()) for x in (F.lit(k), F.lit(_threshold(r)))]
    )
    return df.filter(hash_bucket(F.col(id_col)) < thr[F.col(key_col)])


def stratified_sample_exact(
    df: DataFrame, strata_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Exactly-k-per-stratum sample: rank rows within each stratum by
    (hash, id) — a deterministic total order — and keep the first k.
    One shuffle on the strata key; the full sort per stratum is the
    price of exact k (see module docstring for the rate-based
    alternative at scale)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
