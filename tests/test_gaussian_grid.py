"""Round-7 GRIB breadth: regular Gaussian grids (template 3.40),
the import-gated JPEG2000 packing (5.40), and the pinned Mercator
rotated-orientation quarantine class (VERDICT r6 #2/#7/#8).

The quadrature test is INDEPENDENT of the codec's implementation: it
re-derives the Gaussian latitudes with a hand-coded Newton iteration
on the Legendre recurrence, the method the codec deliberately does
not use (it uses numpy's Golub-Welsch eigensolve via leggauss)."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.sources.grib2codec import (
    decode_grib2_bytes,
    encode_grib2_message,
    gaussian_latitudes,
    scan_grib2_bytes,
)

RT = datetime(2020, 8, 12, 6, tzinfo=timezone.utc)


def _newton_gauss_lats(n: int) -> np.ndarray:
    """Independent Gaussian latitudes: Newton on P_{2N}(x) = 0 with the
    three-term Legendre recurrence and derivative identity — no numpy
    polynomial helpers, seeded with the classic Chebyshev estimate."""
    m = 2 * n
    k = np.arange(1, m + 1)
    x = np.cos(np.pi * (k - 0.25) / (m + 0.5))  # root estimates
    for _ in range(100):
        p0, p1 = np.ones_like(x), x.copy()
        for j in range(2, m + 1):  # P_j via recurrence
            p0, p1 = p1, ((2 * j - 1) * x * p1 - (j - 1) * p0) / j
        dp = m * (x * p1 - p0) / (x * x - 1.0)  # P'_m
        dx = p1 / dp
        x -= dx
        if np.abs(dx).max() < 1e-15:
            break
    return np.degrees(np.arcsin(np.sort(x)))[::-1]


@pytest.mark.parametrize("n", [1, 3, 16, 47])
def test_gaussian_latitudes_match_independent_newton(n):
    got = gaussian_latitudes(n)
    want = _newton_gauss_lats(n)
    assert got.shape == (2 * n,)
    assert np.abs(got - want).max() < 1e-10
    # structural invariants: strictly descending, antisymmetric about
    # the equator, strictly inside the poles
    assert np.all(np.diff(got) < 0)
    assert np.abs(got + got[::-1]).max() < 1e-10
    assert got[0] < 90.0 and got[-1] > -90.0


def test_gaussian_latitudes_validate_n():
    with pytest.raises(ValueError, match="N >= 1"):
        gaussian_latitudes(0)


def _field(nx, ny):
    return [((i * 5 + 4 * 23) % 2600) / 100.0 for i in range(nx * ny)]


def test_gaussian_header_roundtrip():
    """Encode→decode a template-3.40 field: the grid keys carry the
    Gaussian contract (gaussianN set, dy None, la1/la2 the quadrature
    ends at microdegree precision) and the values survive exactly at
    2dp quantization."""
    n, nx = 3, 8
    ny = 2 * n
    vals = _field(nx, ny)
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
        lo1=0.0, dx=45.0, packing="complex_diff1",
        gaussian_n=n,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    lats = gaussian_latitudes(n)
    assert h["gridDefinitionTemplate"] == 40
    assert h["gridDefinitionTemplateName"] == "Gaussian_Latitude_Longitude"
    assert h["gaussianN"] == n
    assert h["dy"] is None
    assert h["dx"] == pytest.approx(45.0, abs=1e-9)
    assert h["nx"] == nx and h["ny"] == ny
    assert h["la1"] == pytest.approx(float(lats[0]), abs=1e-5)
    assert h["la2"] == pytest.approx(float(lats[-1]), abs=1e-5)
    assert h["gridUnits"] == "degrees"
    assert np.allclose(rec["data"], vals)
    # the non-Gaussian templates carry the key as None (stable header
    # key set — WIND_HEADER schema)
    plain = decode_grib2_bytes(encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
    ))[0]["header"]
    assert plain["gaussianN"] is None


def test_gaussian_encode_validates_ny():
    with pytest.raises(ValueError, match="2N"):
        encode_grib2_message(
            _field(8, 5), parameter_number=2, ref_time=RT, nx=8, ny=5,
            gaussian_n=3,
        )


def _sec_offset(msg: bytes, want: int) -> int:
    o = 16
    while o < len(msg) - 4:
        slen, snum = int.from_bytes(msg[o : o + 4], "big"), msg[o + 4]
        if snum == want:
            return o
        o += slen
    raise AssertionError(f"section {want} not found")


def test_gaussian_nj_mismatch_quarantines():
    """A 3.40 message whose Nj != 2N fail-louds in decode and
    QUARANTINES (error row, file survives) in the scan path — reduced
    grids vary points per ROW, never the 2N row count, so a mismatch
    is corrupt octets in any Gaussian family member."""
    n, nx = 3, 8
    msg = bytearray(encode_grib2_message(
        _field(nx, 2 * n), parameter_number=2, ref_time=RT, nx=nx,
        ny=2 * n, dx=45.0, gaussian_n=n,
    ))
    o3 = _sec_offset(bytes(msg), 3)
    msg[o3 + 67 : o3 + 71] = (5).to_bytes(4, "big")  # N=5 but Nj=6
    with pytest.raises(ValueError, match="Gaussian grid Nj"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert len(out) == 1 and out[0]["record"] is None
    assert "Gaussian grid Nj" in out[0]["error"]


def test_gaussian_la1_mismatch_quarantines():
    """A 3.40 message whose La1 is not the first quadrature latitude
    (wrong-N or non-regular layout) fail-louds rather than mapping
    cells to wrong latitudes."""
    n, nx = 3, 8
    msg = bytearray(encode_grib2_message(
        _field(nx, 2 * n), parameter_number=2, ref_time=RT, nx=nx,
        ny=2 * n, dx=45.0, gaussian_n=n,
    ))
    o3 = _sec_offset(bytes(msg), 3)
    msg[o3 + 46 : o3 + 50] = (60_000_000).to_bytes(4, "big")  # la1=60°
    with pytest.raises(ValueError, match="quadrature latitude"):
        decode_grib2_bytes(bytes(msg))


def test_gaussian_scan_direction_contract():
    """Scan-mode-aware la1 validation (r7 review): bit 0x40 (+j, rows
    S→N) means la1 is the SOUTHERNMOST quadrature latitude. A
    south-first grid with the matching la1 decodes; a grid whose la1
    end contradicts its scan bit quarantines; the encoder refuses to
    emit a +j Gaussian (it lays rows north-first)."""
    n, nx = 3, 8
    lats = gaussian_latitudes(n)
    msg = bytearray(encode_grib2_message(
        _field(nx, 2 * n), parameter_number=2, ref_time=RT, nx=nx,
        ny=2 * n, dx=45.0, gaussian_n=n,
    ))
    o3 = _sec_offset(bytes(msg), 3)
    # flip to +j WITHOUT moving la1 → contradiction → quarantine
    b = bytearray(msg)
    b[o3 + 71] |= 0x40
    with pytest.raises(ValueError, match="southernmost"):
        decode_grib2_bytes(bytes(b))
    # flip to +j AND encode la1/la2 as the southern/northern ends →
    # a legitimate south-first grid decodes
    def put_deg(v):
        micro = round(v * 1e6)
        return ((1 << 31) | -micro if micro < 0 else micro).to_bytes(4, "big")
    b[o3 + 46 : o3 + 50] = put_deg(float(lats[-1]))   # la1 = south
    b[o3 + 55 : o3 + 59] = put_deg(float(lats[0]))    # la2 = north
    h = decode_grib2_bytes(bytes(b))[0]["header"]
    assert h["la1"] == pytest.approx(float(lats[-1]), abs=1e-5)
    assert h["scanMode"] & 0x40
    # encoder refuses to mislabel its north-first layout as +j
    with pytest.raises(ValueError, match="north-first"):
        encode_grib2_message(
            _field(nx, 2 * n), parameter_number=2, ref_time=RT, nx=nx,
            ny=2 * n, dx=45.0, gaussian_n=n, scan_mode=64,
        )


def test_gaussian_cell_latlon_south_first(spark):
    """north_first=False mirrors the latitude lookup for +j grids."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        gaussian_cell_latlon,
    )

    n, nx = 3, 4
    lat, _lon = gaussian_cell_latlon(
        F.col("idx"), nx=nx, n=n, lo1=0.0, dx=90.0, north_first=False
    )
    pdf = spark.range(nx * 2 * n).select(
        F.col("id").alias("idx"), lat.alias("lat")
    ).toPandas()
    lats = gaussian_latitudes(n)[::-1]  # south → north
    i = np.arange(nx * 2 * n)
    assert np.abs(pdf["lat"].to_numpy() - lats[i // nx]).max() == 0.0


def test_gaussian_cell_latlon_matches_numpy(spark):
    """The columnar plan-literal lookup reproduces the numpy mapping
    cell-for-cell, and row 0 sits at the northernmost quadrature
    latitude (scan mode 0/64 contract)."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        gaussian_cell_latlon,
    )

    n, nx, lo1, dx = 5, 12, 30.0, 30.0
    ny = 2 * n
    lat, lon = gaussian_cell_latlon(
        F.col("idx"), nx=nx, n=n, lo1=lo1, dx=dx
    )
    pdf = spark.range(nx * ny).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()
    lats = gaussian_latitudes(n)
    i = np.arange(nx * ny)
    assert np.abs(pdf["lat"].to_numpy() - lats[i // nx]).max() == 0.0
    want_lon = (lo1 + (i % nx) * dx) % 360.0
    assert np.abs(pdf["lon"].to_numpy() - want_lon).max() < 1e-12
    assert pdf.loc[0, "lat"] == lats[0]


# --- template 5.40 (JPEG2000) import gate -----------------------------------


def _patch_drt(msg: bytes, drt: int) -> bytes:
    out = bytearray(msg)
    o5 = _sec_offset(msg, 5)
    out[o5 + 9 : o5 + 11] = drt.to_bytes(2, "big")
    return bytes(out)


def test_jpeg2000_constant_field_decodes_without_codec():
    """5.40's R/E/D head parse is codec-independent: a constant field
    packs zero bits per point (no codestream), so it must decode even
    without an OpenJPEG binding."""
    vals = [7.25] * 24
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
    )
    rec = decode_grib2_bytes(_patch_drt(msg, 40))[0]
    assert np.allclose(rec["data"], vals)


def test_jpeg2000_gate():
    """The 5.40 gate, both branches (same pattern as multimodal's
    JPEG/MP3 gates): without glymur the message QUARANTINES with a
    typed error naming the missing binding; with glymur installed the
    codestream decodes (exercised only where the binding exists —
    this container ships none)."""
    vals = _field(6, 4)
    msg = _patch_drt(encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
    ), 40)
    try:
        import glymur  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="glymur"):
            decode_grib2_bytes(msg)
        out = scan_grib2_bytes(msg)
        assert len(out) == 1 and out[0]["record"] is None
        assert "JPEG2000" in out[0]["error"]
        assert "glymur" in out[0]["error"]
        # quarantine-not-corrupt: a supported sibling in the same file
        # still decodes
        good = encode_grib2_message(
            vals, parameter_number=3, ref_time=RT, nx=6, ny=4,
        )
        both = scan_grib2_bytes(msg + good)
        assert [m["record"] is None for m in both] == [True, False]
    else:  # pragma: no cover — binding not in this container
        import tempfile

        import glymur as gl

        scaled = np.rint(np.asarray(vals) * 100 - min(vals) * 100)
        with tempfile.NamedTemporaryFile(suffix=".j2k") as fh:
            gl.Jp2k(fh.name, data=scaled.astype(np.uint16).reshape(4, 6))
            stream = open(fh.name, "rb").read()
        # splice the lossless codestream into section 7 and decode
        out = bytearray(msg)
        o5 = _sec_offset(msg, 5)
        o7 = _sec_offset(msg, 7)
        rest = out[o7 + int.from_bytes(msg[o7 : o7 + 4], "big") :]
        s7 = (len(stream) + 5).to_bytes(4, "big") + b"\x07" + stream
        out = out[:o7] + s7 + rest
        total = len(out)
        out[8:16] = total.to_bytes(8, "big")
        out[o5 + 19] = 16  # nbits nonzero → codestream path
        rec = decode_grib2_bytes(bytes(out))[0]
        assert np.allclose(rec["data"], vals, atol=0.005)


# --- Mercator rotated orientation: pinned quarantine class ------------------


def test_mercator_rotated_orientation_quarantines():
    """Template 3.10 with a nonzero grid orientation (rotated Mercator)
    is out of the supported family: decode fail-louds naming the
    orientation, scan quarantines the message (VERDICT r6 #8 — the
    quarantine class is pinned, not silent)."""
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        la1=5.0, lo1=140.0, scan_mode=64,
        mercator=dict(laD=20.0, dx=8000.0, dy=8000.0),
    ))
    o3 = _sec_offset(bytes(msg), 3)
    msg[o3 + 60 : o3 + 64] = (45_000_000).to_bytes(4, "big")  # 45° rot
    with pytest.raises(ValueError, match="orientation"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert len(out) == 1 and out[0]["record"] is None
    assert "orientation" in out[0]["error"]
