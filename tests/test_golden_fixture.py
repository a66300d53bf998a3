"""Golden-fixture replay (SURVEY.md §5 strategy #2): run the
reference's OWN committed output — data/wind_data.json, the real
2020-08-12 12:00 UTC GFS batch with two 65,160-point global grids —
through the engine's ingest → normalize → pair → grid pipeline and
assert the decoded semantics match the reference's documented shape
(SURVEY.md §1.2, data/u_comp.json:1).

Skipped when the reference checkout is absent so the repo tests stand
alone."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.functions.wind import (
    cell_lat,
    cell_lon,
    speed,
)
from mints_wind_data_ingestion_spark.operators.upsert import merge_latest_wins
from mints_wind_data_ingestion_spark.sources.wind_json import (
    read_wind_json,
    to_wind_table,
)

FIXTURE = "/root/reference/data/wind_data.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def wind(spark):
    return to_wind_table(read_wind_json(spark, FIXTURE)).cache()


def test_fixture_shape(wind):
    """Two records (U=2, V=3), same 3 h bucket, 360×181 grids, the
    documented refTime/forecast offset."""
    rows = {r.param: r for r in wind.collect()}
    assert set(rows) == {2, 3}
    for r in rows.values():
        assert str(r.recorded_time) == "2020-08-12 12:00:00"
        assert str(r.ref_time) == "2020-08-12 06:00:00"
        assert r.forecast_hours == 6
        assert r.header.nx == 360 and r.header.ny == 181
        assert r.header.numberPoints == 65160 == len(r.data)
        assert r.header.surface1Type == 103 and r.header.surface1Value == 10.0
        assert r.header.scanMode == 0 and r.header.la1 == 90.0


def test_fixture_grid_semantics(spark, wind):
    """§1.2 index mapping on the REAL grid: row-major scanMode 0 —
    cell 0 is (90°N, 0°E), cell 65159 is (90°S, 359°E); wind speeds
    are physical (global 10 m wind < 60 m/s)."""
    u = wind.filter(F.col("param") == 2)
    cells = u.select(F.posexplode("data").alias("idx", "value")).select(
        "idx", "value", cell_lat(F.col("idx")).alias("lat"), cell_lon(F.col("idx")).alias("lon")
    )
    first, last = (
        cells.filter(F.col("idx").isin(0, 65159)).orderBy("idx").collect()
    )
    assert (first.lat, first.lon) == (90.0, 0.0)
    assert (last.lat, last.lon) == (-90.0, 359.0)

    uv = (
        wind.select("param", "data")
        .groupBy()
        .pivot("param", [2, 3])
        .agg(F.first("data"))
        .select(
            F.posexplode(F.arrays_zip(F.col("2"), F.col("3"))).alias("idx", "uv")
        )
        .select(speed(F.col("uv.2"), F.col("uv.3")).alias("spd"))
    )
    stats = uv.agg(
        F.count(F.lit(1)).alias("n"), F.min("spd").alias("lo"), F.max("spd").alias("hi")
    ).collect()[0]
    assert stats.n == 65160
    assert 0.0 <= stats.lo and stats.hi < 60.0


def test_fixture_upsert_roundtrip(spark, wind):
    """§5 test 4 on real data: re-applying the same batch is a no-op;
    a synthetic newer run replaces exactly the matching component."""
    merged = merge_latest_wins(
        wind, wind, keys=["recorded_time", "param"], version="ref_time"
    )
    assert merged.count() == 2

    newer_u = wind.filter(F.col("param") == 2).withColumn(
        "ref_time", F.col("ref_time") + F.expr("INTERVAL 6 HOURS")
    )
    replaced = merge_latest_wins(
        wind, newer_u, keys=["recorded_time", "param"], version="ref_time"
    )
    out = {r.param: str(r.ref_time) for r in replaced.collect()}
    assert out == {2: "2020-08-12 12:00:00", 3: "2020-08-12 06:00:00"}
