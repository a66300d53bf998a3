"""Product template 4.1 (individual ensemble forecast — the NOAA GEFS
member files, the ensemble siblings of the GFS wind extracts the
reference downloads). Round 7 breadth beyond VERDICT's list: a user
pointing the engine at a GEFS mirror hits 4.1 immediately after 4.0.

Covers: encode→decode round trip of the member triple, NULLs on
non-ensemble templates (stable WIND_HEADER key set), the 4.11
fail-loud (ensemble × interval), truncated-section quarantine, and an
e2e multi-member scan through the Arrow UDTF path grouped per member.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest

from mints_wind_data_ingestion_spark.sources.grib2codec import (
    decode_grib2_bytes,
    encode_grib2_file,
    encode_grib2_message,
    scan_grib2_bytes,
)

RT = datetime(2020, 8, 12, 6, tzinfo=timezone.utc)


def _field(nx, ny, seed=0):
    return [((i * 5 + seed * 23) % 2600) / 100.0 for i in range(nx * ny)]


def test_ensemble_member_roundtrip():
    vals = _field(6, 4, 3)
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
        ensemble=dict(type=3, number=17, size=31),
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["productDefinitionTemplate"] == 1
    assert "ensemble" in h["productDefinitionTemplateName"].lower()
    assert h["ensembleType"] == 3
    assert h["ensembleTypeName"] == "Positively perturbed forecast"
    assert h["perturbationNumber"] == 17
    assert h["ensembleSize"] == 31
    # 4.0-identical octets still decode identically
    assert h["parameterNumber"] == 2 and h["forecastTime"] == 6
    assert h["surface1Type"] == 103 and h["surface1Value"] == 10.0
    assert np.allclose(rec["data"], vals)


def test_non_ensemble_templates_carry_nulls():
    vals = _field(6, 4)
    for kw in (dict(), dict(interval_hours=6)):
        h = decode_grib2_bytes(encode_grib2_message(
            vals, parameter_number=2, ref_time=RT, nx=6, ny=4, **kw,
        ))[0]["header"]
        assert h["ensembleType"] is None
        assert h["ensembleTypeName"] is None
        assert h["perturbationNumber"] is None
        assert h["ensembleSize"] is None


def test_ensemble_with_interval_fails_loud():
    with pytest.raises(ValueError, match="4.11"):
        encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
            ensemble=dict(type=2, number=1, size=21), interval_hours=6,
        )


def test_truncated_41_section_quarantines():
    """A 4.0-sized section relabeled 4.1 must not read ensemble octets
    out of the next section — same guard class as the 4.8 check."""
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
    ))
    o = 16
    while msg[o + 4] != 4:
        o += int.from_bytes(msg[o : o + 4], "big")
    msg[o + 7 : o + 9] = (1).to_bytes(2, "big")  # relabel 4.0 → 4.1
    with pytest.raises(ValueError, match="4.1 truncated"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert out[0]["record"] is None and "4.1 truncated" in out[0]["error"]


def test_gefs_member_file_scan_e2e(spark):
    """A GEFS-shaped file (control + 4 perturbed members, U wind) scans
    through the Arrow UDTF path into per-member rows — the shape an
    ensemble-mean pipeline consumes."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )

    members = [(0, 0)] + [(2 if m % 2 else 3, m) for m in range(1, 5)]
    blob = encode_grib2_file([
        encode_grib2_message(
            _field(6, 4, seed=m), parameter_number=2, ref_time=RT,
            nx=6, ny=4, ensemble=dict(type=t, number=m, size=5),
        )
        for t, m in members
    ])
    bdf = spark.createDataFrame([("gep.grib2", bytearray(blob))],
                                "path string, content binary")
    out = scan_binary_df(bdf, selector=make_selector()).select(
        F.col("header.perturbationNumber").alias("m"),
        F.col("header.ensembleType").alias("t"),
        F.col("header.ensembleSize").alias("n"),
        F.round(F.aggregate(
            "data", F.lit(0.0), lambda a, x: a + x
        ) / F.size("data"), 4).alias("mean"),
    ).orderBy("m").collect()
    assert [r["m"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["t"] for r in out] == [0, 2, 3, 2, 3]
    assert all(r["n"] == 5 for r in out)
    for m, r in enumerate(out):
        want = float(np.mean(_field(6, 4, seed=m)))
        assert r["mean"] == pytest.approx(want, abs=1e-3)
