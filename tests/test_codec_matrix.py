"""Hypothesis round-trip over the codec's full supported template
MATRIX (round 7; widened r8): random 2dp fields × every packing ×
{3.0, regular 3.40, reduced 3.40} grids × the full product family
{4.0, 4.1, 4.2, 4.5, 4.6, 4.8, 4.9, 4.10, 4.11, 4.12} decode
back exactly.

The per-template tests pin each family's semantics individually; this
matrix pins their INDEPENDENCE — a section-3 change must never
perturb section-5/7 decode and vice versa (the classic GRIB decoder
bug class: offsets computed from the wrong section's length)."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mints_wind_data_ingestion_spark.sources.grib2codec import (
    decode_grib2_bytes,
    encode_grib2_message,
    gaussian_latitudes,
)

RT = datetime(2020, 8, 12, 6, tzinfo=timezone.utc)
PACKINGS = ["simple", "complex", "complex_diff", "complex_diff1",
            "ieee", "png"]
PRODUCTS = ["point", "ensemble", "interval", "ensemble_interval",
            "derived", "derived_interval", "probability",
            "probability_interval", "percentile",
            "percentile_interval", "cluster_rect", "cluster_circle",
            "cluster_rect_interval", "cluster_circle_interval"]
GRIDS = ["latlon", "gaussian", "reduced"]
_PDT = {"point": 0, "ensemble": 1, "interval": 8, "ensemble_interval": 11,
        "derived": 2, "derived_interval": 12, "probability": 5,
        "probability_interval": 9, "percentile": 6,
        "percentile_interval": 10, "cluster_rect": 3, "cluster_circle": 4,
        "cluster_rect_interval": 13, "cluster_circle_interval": 14}


@settings(max_examples=120, deadline=None)
@given(
    nx=st.integers(2, 20),
    n_gauss=st.integers(1, 8),
    packing=st.sampled_from(PACKINGS),
    product=st.sampled_from(PRODUCTS),
    grid=st.sampled_from(GRIDS),
    data=st.data(),
)
def test_template_matrix_roundtrip(nx, n_gauss, packing, product,
                                   grid, data):
    gaussian = grid != "latlon"
    if grid == "reduced" and packing == "png":
        packing = "simple"  # no rectangular scanline layout
    ny = 2 * n_gauss if gaussian else data.draw(st.integers(2, 12))
    counts = None
    if grid == "reduced":
        counts = data.draw(
            st.lists(st.integers(1, 24), min_size=ny, max_size=ny)
        )
        n_vals = sum(counts)
    else:
        n_vals = nx * ny
    vals = data.draw(
        st.lists(
            st.integers(-2000, 53_00).map(lambda c: c / 100.0),
            min_size=n_vals, max_size=n_vals,
        )
    )
    kw = {}
    if gaussian:
        kw["gaussian_n"] = n_gauss
        kw["dx"] = 360.0 / nx
    if grid == "reduced":
        kw["gaussian_reduced"] = counts
        kw["scan_mode"] = 0
    if product in ("ensemble", "ensemble_interval"):
        kw["ensemble"] = dict(
            type=data.draw(st.sampled_from([0, 1, 2, 3])),
            number=data.draw(st.integers(0, 250)),
            size=data.draw(st.integers(1, 250)),
        )
    elif product in ("derived", "derived_interval"):
        kw["derived"] = dict(
            type=data.draw(st.sampled_from([0, 1, 2, 3, 4, 5, 6])),
            size=data.draw(st.integers(1, 250)),
        )
    elif product in ("percentile", "percentile_interval"):
        kw["percentile"] = data.draw(st.integers(0, 100))
    elif product.startswith("cluster"):
        # centidegree/centivalue draws are exactly representable
        # through the e6/e2 sign-magnitude encodings (same rational →
        # same correctly-rounded double on both sides)
        cents = st.integers(-50_00, 50_00).map(lambda c: c / 100.0)
        kw["cluster"] = dict(
            type=data.draw(st.sampled_from([0, 1, 2, 3, 4, 5, 6])),
            size=data.draw(st.integers(1, 250)),
            identifier=data.draw(st.integers(0, 250)),
            method=data.draw(st.sampled_from([0, 1])),
            members=data.draw(
                st.lists(st.integers(0, 250), max_size=12)),
            std_dev=data.draw(
                st.integers(0, 40_00).map(lambda c: c / 100.0)),
            distance=data.draw(
                st.integers(0, 40_00).map(lambda c: c / 100.0)),
        )
        if "circle" in product:
            kw["cluster"].update(
                lat=data.draw(cents), lon=data.draw(cents),
                radius=float(data.draw(st.integers(1, 2_000_000))),
            )
        else:
            kw["cluster"].update(
                north=data.draw(cents), south=data.draw(cents),
                east=data.draw(cents), west=data.draw(cents),
            )
    elif product in ("probability", "probability_interval"):
        kw["probability"] = dict(
            number=data.draw(st.integers(0, 250)),
            total=data.draw(st.integers(1, 250)),
            type=data.draw(st.sampled_from([0, 1, 2, 3, 4])),
            lower=data.draw(st.one_of(
                st.none(),
                st.integers(-50_00, 50_00).map(lambda c: c / 100.0))),
            upper=data.draw(st.one_of(
                st.none(),
                st.integers(-50_00, 50_00).map(lambda c: c / 100.0))),
        )
    if product.endswith("interval") or product == "interval":
        kw["interval_hours"] = data.draw(st.integers(1, 240))
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=nx, ny=ny,
        decimal_scale=2, packing=packing, **kw,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]

    got = np.asarray(rec["data"], dtype=np.float64)
    want = np.asarray(vals)
    # decode emits float32, so bitwise equality is not the contract —
    # EXACTNESS AT 2dp is (the engine's round(v*100) e2 encoding):
    # int-scaled packings quantize exactly, and IEEE float32 is exact
    # to ≪ half a centivalue for |v| < 55
    assert np.array_equal(np.rint(got * 100), np.rint(want * 100))

    # section independence: grid keys reflect section 3 only
    assert h["gridDefinitionTemplate"] == (40 if gaussian else 0)
    if grid == "reduced":
        assert h["nx"] is None and h["reducedPoints"] == counts
        assert h["dx"] is None
    else:
        assert h["nx"] == nx and h["reducedPoints"] is None
    assert h["ny"] == ny
    if gaussian:
        assert h["gaussianN"] == n_gauss and h["dy"] is None
        lats = gaussian_latitudes(n_gauss)
        assert abs(h["la1"] - lats[0]) < 1e-5
    else:
        assert h["gaussianN"] is None and h["dy"] is not None

    # ...and product keys reflect section 4 only
    assert h["productDefinitionTemplate"] == _PDT[product]
    if "ensemble" in product:
        assert h["perturbationNumber"] == kw["ensemble"]["number"]
        assert h["ensembleType"] == kw["ensemble"]["type"]
        assert h["ensembleSize"] == kw["ensemble"]["size"]
    else:
        assert h["ensembleType"] is None
    if "derived" in product:
        assert h["derivedForecastType"] == kw["derived"]["type"]
        assert h["ensembleSize"] == kw["derived"]["size"]
    elif "cluster" in product:
        c = kw["cluster"]
        assert h["derivedForecastType"] == c["type"]
        assert h["ensembleSize"] == c["size"]
        assert h["clusterIdentifier"] == c["identifier"]
        assert h["clusteringMethod"] == c["method"]
        assert h["clusterSize"] == len(c["members"])
        assert h["clusterMembers"] == c["members"]
        assert h["clusterStdDev"] == c["std_dev"]
        assert h["clusterMeanDistance"] == c["distance"]
        if "circle" in product:
            assert h["clusterCentralLatitude"] == c["lat"]
            assert h["clusterCentralLongitude"] == c["lon"]
            assert h["clusterRadius"] == c["radius"]
            assert h["clusterNorthLatitude"] is None
        else:
            assert h["clusterNorthLatitude"] == c["north"]
            assert h["clusterSouthLatitude"] == c["south"]
            assert h["clusterEastLongitude"] == c["east"]
            assert h["clusterWestLongitude"] == c["west"]
            assert h["clusterRadius"] is None
    else:
        assert h["derivedForecastType"] is None
        assert h["clusterIdentifier"] is None
    if "percentile" in product:
        assert h["percentileValue"] == kw["percentile"]
    else:
        assert h["percentileValue"] is None
    if "probability" in product:
        assert h["probabilityNumber"] == kw["probability"]["number"]
        assert h["probabilityTotal"] == kw["probability"]["total"]
        assert h["probabilityType"] == kw["probability"]["type"]
        assert h["probabilityLowerLimit"] == kw["probability"]["lower"]
        assert h["probabilityUpperLimit"] == kw["probability"]["upper"]
    else:
        assert h["probabilityType"] is None
    if "interval" in product:
        assert h["intervalHours"] == kw["interval_hours"]
    else:
        assert h["intervalHours"] is None


# --- degenerate grids vs complex packing (VERDICT r8 #1) ---------------------
# The r8 falsifying example: a 2-point reduced-Gaussian field (n_gauss=1,
# one point per row) under complex_diff crashed the encoder — order-2
# spatial differencing needs more points than its order. The encoder now
# clamps the differencing order to n−1 (order 0 = plain 5.2 complex, always
# valid) and the decoder quarantines any 5.3 message claiming n ≤ order.


def _sec_offset(msg: bytes, want: int) -> int:
    o = 16
    while o < len(msg) - 4:
        slen, snum = int.from_bytes(msg[o : o + 4], "big"), msg[o + 4]
        if snum == want:
            return o
        o += slen
    raise AssertionError(f"section {want} not found")


def test_degenerate_reduced_grid_complex_diff_roundtrip():
    """The preserved hypothesis falsifying example: reduced Gaussian,
    n_gauss=1, points-per-row [1, 1] (2 total points), complex_diff.
    Order clamps 2 → 1 (template stays 5.3) and the round trip is
    exact; the 5.2 header key pins the clamp's observable effect."""
    msg = encode_grib2_message(
        [0.0, 0.0], parameter_number=2, ref_time=RT, nx=2, ny=2,
        decimal_scale=2, packing="complex_diff", gaussian_n=1,
        dx=180.0, gaussian_reduced=[1, 1], scan_mode=0,
    )
    rec = decode_grib2_bytes(msg)[0]
    assert np.array_equal(rec["data"], [0.0, 0.0])
    o5 = _sec_offset(msg, 5)
    assert int.from_bytes(msg[o5 + 9 : o5 + 11], "big") == 3  # 5.3
    assert msg[o5 + 47] == 1  # effective order clamped 2 → 1

    # one point tighter: a single-point field clamps all the way to
    # order 0 and must emit plain complex packing (template 5.2)
    msg1 = encode_grib2_message(
        [3.25], parameter_number=2, ref_time=RT, nx=1, ny=1,
        decimal_scale=2, packing="complex_diff",
    )
    rec1 = decode_grib2_bytes(msg1)[0]
    assert np.array_equal(rec1["data"], np.float32([3.25]))
    o5 = _sec_offset(msg1, 5)
    assert int.from_bytes(msg1[o5 + 9 : o5 + 11], "big") == 2  # 5.2


def test_spatial_diff_order_exceeds_points_quarantines():
    """Decoder-side pin: a crafted 5.3 message with n ≤ order is
    corrupt octets — decode fail-louds naming the order/point deficit
    and the scan path QUARANTINES it (error row, no crash), the same
    contract as the rotated-Mercator pin in test_gaussian_grid.py."""
    import pytest

    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        scan_grib2_bytes,
    )

    msg = bytearray(encode_grib2_message(
        [0.0, 0.0], parameter_number=2, ref_time=RT, nx=2, ny=2,
        decimal_scale=2, packing="complex_diff", gaussian_n=1,
        dx=180.0, gaussian_reduced=[1, 1], scan_mode=0,
    ))
    o5 = _sec_offset(bytes(msg), 5)
    msg[o5 + 47] = 2  # claim order 2 over a 2-point field
    with pytest.raises(ValueError, match="more than 2 points"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert len(out) == 1 and out[0]["record"] is None
    assert "more than 2 points" in out[0]["error"]
