"""Z-order layout operator: interleave correctness vs a Python model,
and the actual data-skipping property — per-file bounds on EVERY
z-ordered dimension are tight, where a single-column sort leaves the
other dimension's per-file span at ~the global span."""

from __future__ import annotations

from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.layout import zorder_write, zvalue


def _morton(xs: list[int], bits: int) -> int:
    z = 0
    for j in range(bits):
        for i, x in enumerate(xs):
            z |= ((x >> j) & 1) << (j * len(xs) + i)
    return z


def test_zvalue_matches_python_model(spark):
    rows = [(3, 5), (0, 0), (255, 1), (128, 200)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zvalue([F.col("a"), F.col("b")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton([r.a, r.b], 8), (r.a, r.b)


def test_zvalue_rejects_bit_overflow(spark):
    """len(cols)·bits > 63 would put the sign bit in play / wrap
    shiftleft mod 64 and silently alias Z-values — must raise."""
    import pytest

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    cols = [F.col(c) for c in "abcd"]
    with pytest.raises(ValueError, match="63 usable bits"):
        zvalue(cols, bits=16)  # 4×16 = 64 > 63
    # 4×15 = 60 is fine
    df.select(zvalue(cols, bits=15).alias("z")).collect()


def test_zorder_write_autoshrinks_bits(spark, tmp_path):
    """zorder_write at the default bits=16 with 4 columns must not
    raise (auto-shrinks to 63//4=15) and must produce valid rows."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") % 7).alias("c"), (F.col("id") % 11).alias("d"),
    )
    path = str(tmp_path / "z4")
    zorder_write(df, ["a", "b", "c", "d"], path, n_files=2)
    assert spark.read.parquet(path).count() == 100


def _per_file_spans(spark, path, cols):
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    spans = {}
    for c in cols:
        per_file = df.groupBy("__f").agg(
            (F.max(c) - F.min(c)).alias("span")
        ).collect()
        glob = df.agg((F.max(c) - F.min(c)).alias("g")).collect()[0].g
        spans[c] = sum(r.span for r in per_file) / len(per_file) / glob
    return spans


def test_zorder_gives_both_dims_locality(spark, tmp_path):
    """16 files over 40k rows of two independent uniform dims: after
    z-ordering, the mean per-file span of EACH dim must be well below
    the global span (bounded pruning for predicates on either dim);
    a plain sort on dim a leaves dim b's per-file span ~global."""
    df = (
        spark.range(40_000)
        .select(
            (F.xxhash64("id") % 10_000).alias("a"),
            (F.xxhash64("id", F.lit(1)) % 10_000).alias("b"),
        )
        .select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(df, ["a", "b"], zpath, n_files=16)
    spans = _per_file_spans(spark, zpath, ["a", "b"])
    assert spans["a"] < 0.5 and spans["b"] < 0.5, spans

    spath = str(tmp_path / "sorted_a")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(spath)
    sspans = _per_file_spans(spark, spath, ["a", "b"])
    assert sspans["a"] < 0.2          # sorted dim is tight
    assert sspans["b"] > 0.8, sspans  # unsorted dim spans ~everything
