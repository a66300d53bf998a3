"""PNG packing (template 5.41) — the from-scratch RFC 2083 layer and
its GRIB wiring. Every depth the g2clib convention uses (1/2/4-bit
grayscale through 24/32-bit RGB(A)) and every scanline filter type
round-trips; a stdlib-only cross-check (zlib is the only dependency)
keeps the container's no-imaging-libs constraint honest."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources.grib2codec import (
    _png_decode_samples,
    _png_encode_samples,
    decode_grib2_bytes,
    encode_grib2_message,
)

RT = dt.datetime(2020, 8, 12, 6, tzinfo=dt.timezone.utc)


@pytest.mark.parametrize("nbits", [1, 2, 4, 8, 16, 24, 32])
def test_png_samples_roundtrip_all_depths(nbits):
    rng = np.random.default_rng(nbits)
    w, h = 13, 7  # odd width exercises sub-byte row padding
    x = rng.integers(0, 1 << nbits, size=w * h, dtype=np.int64)
    blob = _png_encode_samples(x, w, h, nbits)
    gw, gh, bits, got = _png_decode_samples(blob)
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, x)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_all_filter_types_reconstruct(ft):
    """The decoder must undo every filter type (real encoders choose
    per scanline); our encoder's filter_type knob forces each path."""
    rng = np.random.default_rng(ft + 10)
    w, h = 9, 6
    x = rng.integers(0, 1 << 16, size=w * h, dtype=np.int64)
    blob = _png_encode_samples(x, w, h, 16, filter_type=ft)
    _, _, _, got = _png_decode_samples(blob)
    assert np.array_equal(got, x)


def test_png_grib_message_roundtrip():
    """Template 5.41 end-to-end: quantized field → PNG-packed GRIB2
    message → decode within half a quantization step; header carries
    drt-agnostic fields identically to a simple-packed encode."""
    rng = np.random.default_rng(7)
    nx, ny = 12, 6
    field = rng.normal(0, 25, nx * ny) + 10
    msg = encode_grib2_message(
        field, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
        decimal_scale=2, packing="png",
    )
    rec = decode_grib2_bytes(msg)[0]
    got = np.asarray(rec["data"], dtype=np.float64)
    assert np.abs(got - field).max() <= 0.5e-2 + abs(field).max() * 1e-6 + 1e-6
    simple = decode_grib2_bytes(encode_grib2_message(
        field, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
        decimal_scale=2,
    ))[0]["header"]
    diffs = {k for k, v in rec["header"].items()
             if simple.get(k) != v and k != "gribLength"}
    assert diffs == set()


def test_png_filters_enable_compression_on_smooth_fields():
    """The point of PNG's scanline filters: with the sub filter (the
    delta coding real encoders pick for smooth data) DEFLATE beats the
    fixed-width bit pack; with filter 0 it cannot — both facts pinned
    so the decoder's filter support is visibly load-bearing."""
    xx, yy = np.meshgrid(np.arange(60), np.arange(40))
    smooth = (10 * np.sin(xx / 9.0) + 5 * np.cos(yy / 7.0)).reshape(-1)
    x = np.rint((smooth - smooth.min()) * 100).astype(np.int64)
    filtered = _png_encode_samples(x, 60, 40, 16, filter_type=1)
    flat = _png_encode_samples(x, 60, 40, 16, filter_type=0)
    simple_bits = 60 * 40 * 12  # simple packing at the natural width
    assert len(filtered) * 8 < simple_bits
    assert len(filtered) < len(flat)


def test_png_bad_signature_quarantines():
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        scan_grib2_bytes,
    )

    msg = bytearray(encode_grib2_message(
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], parameter_number=2, ref_time=RT,
        nx=3, ny=2, packing="png",
    ))
    # walk to section 7 and corrupt the PNG signature
    o = 16
    while True:
        slen, snum = int.from_bytes(msg[o:o + 4], "big"), msg[o + 4]
        if snum == 7:
            msg[o + 5] = 0x00
            break
        o += slen
    report = scan_grib2_bytes(bytes(msg))
    assert report[0]["record"] is None
    assert "signature" in report[0]["error"]


def test_png_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(nx=st.integers(2, 25), ny=st.integers(2, 12),
           seed=st.integers(0, 2**31 - 1), scale=st.sampled_from([0, 1, 2]))
    def prop(nx, ny, seed, scale):
        rng = np.random.default_rng(seed)
        field = rng.normal(0, rng.uniform(0.1, 200), nx * ny)
        msg = encode_grib2_message(
            field, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
            decimal_scale=scale, packing="png",
        )
        got = np.asarray(decode_grib2_bytes(msg)[0]["data"], np.float64)
        tol = 0.5 * 10.0**-scale + np.abs(field).max() * 1e-6 + 1e-6
        assert np.abs(got - field).max() <= tol

    prop()


def test_png_corrupt_idat_quarantines_not_crashes():
    """A flipped byte inside the deflate stream raises zlib.error
    internally — the quarantine contract requires it to surface as a
    ValueError so scan_grib2_bytes records an error row instead of
    crashing the whole file's scan task."""
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        scan_grib2_bytes,
    )

    msg = bytearray(encode_grib2_message(
        np.linspace(0, 50, 24), parameter_number=2, ref_time=RT,
        nx=6, ny=4, packing="png",
    ))
    o = 16
    while True:
        slen, snum = int.from_bytes(msg[o:o + 4], "big"), msg[o + 4]
        if snum == 7:
            # corrupt a byte deep inside the IDAT deflate payload
            msg[o + 5 + 50] ^= 0xFF
            break
        o += slen
    report = scan_grib2_bytes(bytes(msg))
    assert report[0]["record"] is None
    assert "PNG packing" in report[0]["error"]
