"""Polar stereographic grid (template 3.20) — projection math first;
the codec round-trip lives in test_round6-style e2e tests once the
3.20 decode lands."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

#: NOAA Alaska-like: true at 60N, oriented 210E (w3fb06 conventions)
AK_POLAR = dict(laD=60.0, loV=210.0, dx=11250.0, dy=11250.0)


def _np_polar_forward(lat_deg, lon_deg, *, laD, loV, south=False,
                      radius=6371229.0):
    """Independent numpy FORWARD polar stereographic (Snyder 21-1/21-4)
    used to verify the engine's columnar INVERSE inverts it."""
    p = -1.0 if south else 1.0
    c = radius * (1.0 + np.sin(np.radians(p * laD)))
    rho = c * np.tan(np.pi / 4 - np.radians(p * np.asarray(lat_deg)) / 2)
    th = np.radians(np.asarray(lon_deg)) - np.radians(loV)
    return rho * np.sin(th), -p * rho * np.cos(th)


@pytest.mark.parametrize("south,la1,lo1,lamb", [
    (False, 44.0, 195.0, AK_POLAR),                       # north aspect
    (True, -48.0, 310.0, dict(laD=-60.0, loV=280.0,       # south aspect
                              dx=12700.0, dy=12700.0)),
])
def test_polar_inverse_inverts_forward(spark, south, la1, lo1, lamb):
    """Project every inverse-mapped (lat, lon) back through an
    independently-coded numpy forward and recover the exact metre cell
    offsets — both pole aspects."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        polar_cell_latlon,
    )

    nx, ny = 8, 6
    lat, lon = polar_cell_latlon(
        F.col("idx"), nx=nx, la1=la1, lo1=lo1, south=south,
        **{k: lamb[k] for k in ("laD", "loV", "dx", "dy")},
    )
    pdf = spark.range(nx * ny).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()

    assert pdf.loc[0, "lat"] == pytest.approx(la1, abs=1e-9)
    assert pdf.loc[0, "lon"] == pytest.approx(lo1, abs=1e-9)

    x, y = _np_polar_forward(
        pdf["lat"].to_numpy(), pdf["lon"].to_numpy(),
        laD=lamb["laD"], loV=lamb["loV"], south=south,
    )
    x1, y1 = _np_polar_forward([la1], [lo1], laD=lamb["laD"],
                               loV=lamb["loV"], south=south)
    i = np.arange(nx * ny) % nx
    j = np.arange(nx * ny) // nx
    assert np.abs(x - (x1[0] + i * lamb["dx"])).max() < 1e-3
    assert np.abs(y - (y1[0] + j * lamb["dy"])).max() < 1e-3


def test_polar_true_scale_spacing(spark):
    """At the true-scale latitude adjacent cells sit ~dx metres apart
    on the sphere — anchor the grid's first row near 60N and check
    haversine spacing within 0.3%."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        polar_cell_latlon,
    )

    nx = 9
    lat, lon = polar_cell_latlon(
        F.col("idx"), nx=nx, la1=59.96, lo1=205.0, **AK_POLAR
    )
    pdf = spark.range(nx).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()
    R = 6371229.0
    p = np.radians(pdf[["lat", "lon"]].to_numpy())
    a, b = p[:-1], p[1:]
    d = 2 * R * np.arcsin(np.sqrt(
        np.sin((b[:, 0] - a[:, 0]) / 2) ** 2
        + np.cos(a[:, 0]) * np.cos(b[:, 0])
        * np.sin((b[:, 1] - a[:, 1]) / 2) ** 2
    ))
    assert np.abs(d - AK_POLAR["dx"]).max() < 0.003 * AK_POLAR["dx"]


def test_polar_pole_cell_is_defined(spark):
    """A cell landing exactly on the pole (rho = 0) must produce
    lat = ±90 and the orientation longitude, not NaN."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        polar_cell_latlon,
    )

    # anchor the first cell AT the pole: la1 = 90 → rho_a = 0
    lat, lon = polar_cell_latlon(
        F.col("idx"), nx=3, la1=90.0, lo1=0.0, **AK_POLAR
    )
    r = spark.range(1).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).first()
    assert r.lat == pytest.approx(90.0, abs=1e-12)
    assert not np.isnan(r.lon)


def test_polar_grid_header_roundtrip_and_e2e(spark):
    """Template 3.20 through the codec AND the Spark scan surface:
    projection keys populate (latin1/latin2 stay NULL — stereographic
    has no standard parallels), the south-aspect flag rides the
    projection-centre byte, values round-trip, and the decoded header
    constants drive the columnar inverse to the exact first grid
    point."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        polar_cell_latlon,
    )
    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )
    import datetime as dt

    rt = dt.datetime(2020, 8, 12, 6, tzinfo=dt.timezone.utc)
    nx, ny = 5, 4
    field = np.linspace(-30.0, 12.5, nx * ny)
    msg = encode_grib2_message(
        field, parameter_number=2, ref_time=rt, nx=nx, ny=ny,
        la1=44.0, lo1=195.0, scan_mode=64, packing="complex_diff",
        polar=AK_POLAR,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["gridDefinitionTemplate"] == 20
    assert h["gridDefinitionTemplateName"] == "Polar_Stereographic"
    assert (h["laD"], h["loV"]) == (60.0, 210.0)
    assert h["latin1"] is None and h["latin2"] is None
    assert (h["dx"], h["dy"]) == (11250.0, 11250.0)
    assert h["projectionCentre"] == 0
    assert np.abs(np.asarray(rec["data"]) - field).max() <= 0.5e-2 + 1e-9

    # south aspect sets the projection-centre bit
    smsg = encode_grib2_message(
        field, parameter_number=2, ref_time=rt, nx=nx, ny=ny,
        la1=-48.0, lo1=310.0, scan_mode=64,
        polar=dict(laD=-60.0, loV=280.0, dx=12700.0, dy=12700.0,
                   south=True),
    )
    sh = decode_grib2_bytes(smsg)[0]["header"]
    assert sh["projectionCentre"] == 0x80

    # e2e: scan surface → header struct → inverse projection anchor
    binary = spark.createDataFrame(
        [("mem://ak.grb2", bytearray(msg))], "path string, content binary"
    )
    hh = (
        scan_binary_df(binary, selector=make_selector(fv=None, fs=None))
        .select("header.*").collect()[0]
    )
    lat, lon = polar_cell_latlon(
        F.col("idx"), nx=hh.nx, la1=hh.la1, lo1=hh.lo1, laD=hh.laD,
        loV=hh.loV, dx=hh.dx, dy=hh.dy,
        south=bool(hh.projectionCentre & 0x80),
    )
    r = spark.range(1).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).first()
    assert r.lat == pytest.approx(44.0, abs=1e-9)
    assert r.lon == pytest.approx(195.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Mercator (template 3.10) — the last NCEP operational grid family
# ---------------------------------------------------------------------------

TROPICAL_MERC = dict(laD=20.0, dx=8000.0, dy=8000.0)


def test_mercator_inverse_inverts_forward(spark):
    """The columnar inverse must invert the independently-coded
    spherical Mercator forward (x = k·λ, y = k·ln tan(π/4+φ/2))."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        mercator_cell_latlon,
    )

    nx, ny = 8, 6
    la1, lo1 = 5.0, 140.0
    lat, lon = mercator_cell_latlon(
        F.col("idx"), nx=nx, la1=la1, lo1=lo1, **TROPICAL_MERC
    )
    pdf = spark.range(nx * ny).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()
    assert pdf.loc[0, "lat"] == pytest.approx(la1, abs=1e-9)
    assert pdf.loc[0, "lon"] == pytest.approx(lo1, abs=1e-9)

    k = 6371229.0 * np.cos(np.radians(TROPICAL_MERC["laD"]))
    x = k * np.radians(pdf["lon"].to_numpy())
    y = k * np.log(np.tan(np.pi / 4 + np.radians(pdf["lat"].to_numpy()) / 2))
    i = np.arange(nx * ny) % nx
    j = np.arange(nx * ny) // nx
    x1, y1 = k * np.radians(lo1), k * np.log(np.tan(np.pi / 4 + np.radians(la1) / 2))
    assert np.abs(x - (x1 + i * TROPICAL_MERC["dx"])).max() < 1e-3
    assert np.abs(y - (y1 + j * TROPICAL_MERC["dy"])).max() < 1e-3


def test_mercator_true_scale_spacing(spark):
    """Adjacent cells anchored at the true-scale latitude sit ~dx
    metres apart on the sphere."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        mercator_cell_latlon,
    )

    nx = 9
    lat, lon = mercator_cell_latlon(
        F.col("idx"), nx=nx, la1=20.0, lo1=150.0, **TROPICAL_MERC
    )
    pdf = spark.range(nx).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()
    R = 6371229.0
    p = np.radians(pdf[["lat", "lon"]].to_numpy())
    a, b = p[:-1], p[1:]
    d = 2 * R * np.arcsin(np.sqrt(
        np.sin((b[:, 0] - a[:, 0]) / 2) ** 2
        + np.cos(a[:, 0]) * np.cos(b[:, 0])
        * np.sin((b[:, 1] - a[:, 1]) / 2) ** 2
    ))
    assert np.abs(d - 8000.0).max() < 0.003 * 8000.0


def test_mercator_grid_header_roundtrip(spark):
    """Template 3.10 header decode: corner points AND metre dx/dy both
    populate (Mercator is the one projected grid with la2/lo2), the
    derived far corner agrees with the inverse projection's last cell,
    rotated grids quarantine, and values round-trip through Spark."""
    import datetime as dt

    from mints_wind_data_ingestion_spark.functions.wind import (
        mercator_cell_latlon,
    )
    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
        scan_grib2_bytes,
    )

    rt = dt.datetime(2020, 8, 12, 6, tzinfo=dt.timezone.utc)
    nx, ny = 6, 4
    field = np.linspace(-5.0, 18.0, nx * ny)
    msg = encode_grib2_message(
        field, parameter_number=2, ref_time=rt, nx=nx, ny=ny,
        la1=5.0, lo1=140.0, scan_mode=64, packing="complex_diff",
        mercator=TROPICAL_MERC,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["gridDefinitionTemplate"] == 10
    assert h["gridDefinitionTemplateName"] == "Mercator"
    assert (h["la1"], h["lo1"]) == (5.0, 140.0)
    assert h["laD"] == 20.0 and h["loV"] is None
    assert (h["dx"], h["dy"]) == (8000.0, 8000.0)
    assert h["latin1"] is None and h["projectionCentre"] is None
    assert np.abs(np.asarray(rec["data"]) - field).max() <= 0.5e-2 + 1e-9

    # the encoded far corner == the inverse projection at the last cell
    lat, lon = mercator_cell_latlon(
        F.col("idx"), nx=h["nx"], la1=h["la1"], lo1=h["lo1"],
        laD=h["laD"], dx=h["dx"], dy=h["dy"],
    )
    last = spark.range(nx * ny - 1, nx * ny).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).first()
    assert last.lat == pytest.approx(h["la2"], abs=5e-7)  # microdeg enc
    assert last.lon == pytest.approx(h["lo2"], abs=5e-7)

    # rotated Mercator (nonzero orientation) quarantines, never wrong
    bad = bytearray(msg)
    o = 16
    while True:
        slen, snum = int.from_bytes(bad[o:o + 4], "big"), bad[o + 4]
        if snum == 3:
            bad[o + 60:o + 64] = (45_000_000).to_bytes(4, "big")
            break
        o += slen
    assert "orientation" in scan_grib2_bytes(bytes(bad))[0]["error"]

    # e2e through the Spark scan surface
    binary = spark.createDataFrame(
        [("mem://trop.grb2", bytearray(msg))], "path string, content binary"
    )
    row = scan_binary_df(
        binary, selector=make_selector(fv=None, fs=None)
    ).select("error", "header.gridDefinitionTemplate").collect()[0]
    assert row.error is None and row.gridDefinitionTemplate == 10
