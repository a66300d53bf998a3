"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping (SURVEY.md §4, 100 TB posture).

A table sorted on one column skips scans only for predicates on that
column. Interleaving the bits of several columns into one Z-value and
range-partitioning + sorting on it gives every interleaved column
locality at once: parquet min/max row-group stats (and partition file
bounds) become tight for EACH dimension, so selective predicates on
any of them prune most files. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, implemented here as plain expressions +
a range-partitioned write — no table format required.

The Z-value is a pure Catalyst expression (per-column linear
quantization to `bits` against broadcast min/max bounds, then bit
interleave via a fold), so it composes with any write and costs one
narrow projection plus the range exchange the clustered write needs
anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_write"]


def _quantize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """floor((x-min)/(max-min) · (2^bits − 1)), clamped; constant
    columns map to 0."""
    span = mx - mn
    q = F.floor(
        (col.cast("double") - mn) / F.when(span > 0, span).otherwise(F.lit(1.0))
        * F.lit((1 << bits) - 1)
    ).cast("bigint")
    return F.greatest(F.lit(0).cast("bigint"),
                      F.least(q, F.lit((1 << bits) - 1).cast("bigint")))


def zvalue(quantized: list[Column], bits: int) -> Column:
    """Morton interleave of pre-quantized `bits`-wide bigint columns:
    output bit (j·k + i) = bit j of column i (k = len(columns)).

    Requires len(columns)·bits ≤ 63: bit 63 is the bigint sign bit and
    shiftleft wraps mod 64, so exceeding it would silently produce
    negative/aliased Z-values and destroy the clustering guarantee.
    """
    k = len(quantized)
    if k * bits > 63:
        raise ValueError(
            f"zvalue: {k} columns x {bits} bits = {k * bits} interleaved "
            "bits exceeds the 63 usable bits of a bigint; lower `bits` "
            f"(max {63 // k} for {k} columns) or drop a column"
        )
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(q, j).bitwiseAND(F.lit(1).cast("bigint")),
                    j * k + i,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` Z-order-clustered on `cols` into `n_files` parquet
    files: per-column bounds from one scalar aggregate (broadcast),
    Z-value projection, range repartition + in-partition sort on it.
    Every listed column gets tight per-file min/max bounds, so
    predicates on ANY of them prune files/row groups at read time.

    `bits` is auto-shrunk so len(cols)·bits fits the 63 usable bigint
    bits (e.g. 4 columns at the default 16 → 15 bits each); resolution
    beyond ~2^12 per dimension adds nothing to file-level skipping.
    """
    if cols and len(cols) * bits > 63:
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError("zorder_write: more than 63 columns")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    with_z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__z",
        zvalue(
            [
                _quantize(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
                for c in cols
            ],
            bits,
        ),
    )
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
