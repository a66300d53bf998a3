"""Hypothesis round-trip over the codec's full supported template
MATRIX (round 7): random 2dp fields × every packing × {3.0, 3.40}
grids × {4.0, 4.1, 4.8} products decode back exactly.

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
PRODUCTS = ["point", "ensemble", "interval"]


@settings(max_examples=60, deadline=None)
@given(
    nx=st.integers(2, 20),
    n_gauss=st.integers(1, 8),
    packing=st.sampled_from(PACKINGS),
    product=st.sampled_from(PRODUCTS),
    gaussian=st.booleans(),
    data=st.data(),
)
def test_template_matrix_roundtrip(nx, n_gauss, packing, product,
                                   gaussian, data):
    ny = 2 * n_gauss if gaussian else data.draw(st.integers(2, 12))
    vals = data.draw(
        st.lists(
            st.integers(-2000, 53_00).map(lambda c: c / 100.0),
            min_size=nx * ny, max_size=nx * ny,
        )
    )
    kw = {}
    if gaussian:
        kw["gaussian_n"] = n_gauss
        kw["dx"] = 360.0 / nx
    if product == "ensemble":
        kw["ensemble"] = dict(
            type=data.draw(st.sampled_from([0, 1, 2, 3])),
            number=data.draw(st.integers(0, 250)),
            size=data.draw(st.integers(1, 250)),
        )
    elif product == "interval":
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
    assert h["nx"] == nx and h["ny"] == ny
    if gaussian:
        assert h["gaussianN"] == n_gauss and h["dy"] is None
        lats = gaussian_latitudes(n_gauss)
        assert abs(h["la1"] - lats[0]) < 1e-5
    else:
        assert h["gaussianN"] is None and h["dy"] is not None

    # ...and product keys reflect section 4 only
    assert h["productDefinitionTemplate"] == {
        "point": 0, "ensemble": 1, "interval": 8
    }[product]
    if product == "ensemble":
        assert h["perturbationNumber"] == kw["ensemble"]["number"]
        assert h["ensembleType"] == kw["ensemble"]["type"]
        assert h["ensembleSize"] == kw["ensemble"]["size"]
        assert h["intervalHours"] is None
    elif product == "interval":
        assert h["intervalHours"] == kw["interval_hours"]
        assert h["ensembleType"] is None
    else:
        assert h["intervalHours"] is None
        assert h["ensembleType"] is None
