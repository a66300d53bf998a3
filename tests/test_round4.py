"""Round-4 kernel equivalences: every fast path added this round must
be BIT-IDENTICAL to the reference formulation it replaces — these
tests pin each pair directly (the driver differential covers them
end-to-end; this isolates the contract per kernel)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_weighted_median_by_equals_udaf(spark, sf_dir):
    """Bucketed grouped-map weighted median == the GROUPED_AGG UDAF,
    key for key, bit for bit."""
    from mints_wind_data_ingestion_spark.functions.stats import (
        weighted_median,
        weighted_median_by,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    li = tables(spark, sf_dir)["lineitem"]
    udaf = {
        r["l_partkey"]: r["m"]
        for r in li.groupBy("l_partkey")
        .agg(weighted_median("l_extendedprice", "l_quantity").alias("m"))
        .collect()
    }
    fast = {
        r["l_partkey"]: r["wmedian"]
        for r in weighted_median_by(
            li, "l_partkey", "l_extendedprice", "l_quantity"
        ).collect()
    }
    assert fast == udaf


def test_ewma_trend_group_equals_components(spark, sf_dir):
    """The fused EWMA+OLS kernel == running ewma_group and
    fit_group_trend separately and joining."""
    from mints_wind_data_ingestion_spark.functions.stats import (
        ewma_group,
        ewma_trend_group,
        fit_group_trend,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "event_id",
        (F.unix_micros("ts") / F.lit(1e6)).alias("x"),
        F.col("value").alias("y"),
    )
    fused = {
        (r["user_id"], r["event_id"]): (r["ewma_e6"], r["slope_e9"], r["resid_e6"])
        for r in ewma_trend_group(
            ev, "user_id", "event_id", "x", "y", alpha=0.2
        ).collect()
    }
    ew = {
        (r["user_id"], r["event_id"]): r["ewma_e6"]
        for r in ewma_group(
            ev.select("user_id", "event_id", "y"),
            "user_id", "event_id", "y", alpha=0.2,
        ).collect()
    }
    tr = {
        (r["user_id"], r["event_id"]): (r["slope_e9"], r["resid_e6"])
        for r in fit_group_trend(ev, "user_id", "x", "y", "event_id").collect()
    }
    assert set(fused) == set(ew) == set(tr)
    for k, (e6, s9, r6) in fused.items():
        assert ew[k] == e6 and tr[k] == (s9, r6)


def test_cosine_explicit_bitwise_equals_fold(spark, sf_dir):
    """cosine_explicit (SQL-text codegen'd rerank kernel) == the
    interpreted zip_with/aggregate cosine, bit for bit, on real
    embedding pairs."""
    from mints_wind_data_ingestion_spark.operators.similarity import (
        cosine,
        cosine_explicit,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    emb = tables(spark, sf_dir)["embeddings"]
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(5000)
    diff = pairs.select(
        (cosine(F.col("va"), F.col("vb"))
         == cosine_explicit("va", "vb", 64)).alias("same")
    )
    assert diff.filter(~F.col("same")).isEmpty()


def test_ivf_index_reuse_and_invalidation(spark, sf_dir, tmp_path):
    """build_ivf_index skips a completed identical build (marker +
    corpus fingerprint), rebuilds when parameters change, and the
    reused index answers identically."""
    import json
    import os

    from mints_wind_data_ingestion_spark.operators.similarity import (
        build_ivf_index,
        topk_ivf_indexed,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    emb = tables(spark, sf_dir)["embeddings"]
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=8, iters=3)
    marker = os.path.join(idx, "_INDEX_META.json")
    first_mtime = os.path.getmtime(marker)
    probes = emb.filter(F.col("vec_id") < 4)
    r1 = sorted(
        map(tuple, topk_ivf_indexed(spark, idx, probes, k=5, nprobe=2).collect())
    )

    # identical build: marker untouched, same answers
    build_ivf_index(emb, idx, n_cells=8, iters=3)
    assert os.path.getmtime(marker) == first_mtime
    r2 = sorted(
        map(tuple, topk_ivf_indexed(spark, idx, probes, k=5, nprobe=2).collect())
    )
    assert r1 == r2

    # parameter change: rebuild happens (marker rewritten)
    build_ivf_index(emb, idx, n_cells=4, iters=3)
    assert json.load(open(marker))["n_cells"] == 4


def test_quantize_struct_equals_naive_formulation(spark, sf_dir):
    """quantize_int8 (finish-lambda binding — scale's amax fold
    evaluated once per row) == the naive formulation that re-embeds
    the fold in every transform element, bit for bit."""
    from mints_wind_data_ingestion_spark.operators.similarity import (
        quantize_int8,
    )
    from mints_wind_data_ingestion_spark.plans.registry import tables

    emb = tables(spark, sf_dir)["embeddings"]
    vec = F.col("embedding")
    amax = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    n_scale = F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)
    n_q = F.transform(
        vec, lambda x: F.floor(x.cast("double") / n_scale + F.lit(0.5)).cast("long")
    )
    scale, q = quantize_int8(vec)
    bad = emb.select(
        ((scale == n_scale) & (q == n_q)).alias("same")
    ).filter(~F.col("same"))
    assert bad.isEmpty()
