"""Product template 4.1 (individual ensemble forecast — the NOAA GEFS
member files, the ensemble siblings of the GFS wind extracts the
reference downloads). Round 7 breadth beyond VERDICT's list: a user
pointing the engine at a GEFS mirror hits 4.1 immediately after 4.0.

Round 8 extends the family to template 4.11 (ensemble member
statistics over a time interval — the 4.1 triple + the 4.8 interval
block shifted +3 octets): the GEFS ACCUMULATION members (ensemble
precipitation, the most downloaded GEFS product class) are 4.11.
Also r8: templates 4.2/4.12 (derived ensemble forecast — the WMO
table 4.7 derivation code + size; the GEFS geavg/gespr mean/spread
files) and 4.5/4.9 (probability forecast — table 4.9 type + scaled
event limits with missing-sentinel open sides; the GEFS
probability-of-event products), each point-in-time and over an
interval.

Covers: encode→decode round trip of the member triple, NULLs on
non-ensemble templates (stable WIND_HEADER key set), the 4.11
round trip (ensemble × interval union), truncated-section quarantine
for both 4.1 and 4.11, and e2e multi-member scans through the Arrow
UDTF path grouped per member.
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


def test_ensemble_with_interval_roundtrips_as_411():
    """ensemble + interval = template 4.11 (was fail-loud through r7):
    BOTH header families must decode — the member triple from the 4.1
    part and the statistical-interval block from the (+3-shifted) 4.8
    part — plus the 4.0-identical octets and the values."""
    vals = _field(6, 4, 5)
    msg = encode_grib2_message(
        vals, parameter_number=8, parameter_category=1, ref_time=RT,
        nx=6, ny=4, ensemble=dict(type=2, number=11, size=21),
        forecast_hours=6, interval_hours=6, statistical_process=1,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["productDefinitionTemplate"] == 11
    assert "ensemble" in h["productDefinitionTemplateName"].lower()
    assert "time interval" in h["productDefinitionTemplateName"].lower()
    assert h["ensembleType"] == 2 and h["perturbationNumber"] == 11
    assert h["ensembleSize"] == 21
    assert h["statisticalProcess"] == 1
    assert h["statisticalProcessName"] == "Accumulation"
    assert h["intervalHours"] == 6
    # ref 06z + start 6h + length 6h = 18z end of overall interval
    assert h["intervalEnd"] == "2020-08-12T18:00:00.000Z"
    assert h["parameterNumber"] == 8 and h["forecastTime"] == 6
    assert np.allclose(rec["data"], vals)


def test_truncated_411_section_quarantines():
    """A 4.1-sized section relabeled 4.11 must not read interval
    octets out of the next section (needs 61, has 37)."""
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        ensemble=dict(type=0, number=0, size=5),
    ))
    o = 16
    while msg[o + 4] != 4:
        o += int.from_bytes(msg[o : o + 4], "big")
    msg[o + 7 : o + 9] = (11).to_bytes(2, "big")  # relabel 4.1 → 4.11
    with pytest.raises(ValueError, match="4.11 truncated"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert out[0]["record"] is None and "4.11 truncated" in out[0]["error"]


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


def test_gefs_accumulation_member_file_scan_e2e(spark):
    """A GEFS ensemble-precipitation-shaped file — every member a
    template-4.11 accumulation over 6 h — scans through the Arrow UDTF
    path with BOTH the member identity and the interval statistics
    populated per row (the shape a probability-of-precip pipeline
    consumes)."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )

    blob = encode_grib2_file([
        encode_grib2_message(
            _field(6, 4, seed=m), parameter_number=8,
            parameter_category=1, ref_time=RT, nx=6, ny=4,
            ensemble=dict(type=0 if m == 0 else 3, number=m, size=3),
            forecast_hours=0, interval_hours=6, statistical_process=1,
        )
        for m in range(3)
    ])
    bdf = spark.createDataFrame([("geprcp.grib2", bytearray(blob))],
                                "path string, content binary")
    # --fp 8 --fc 1: select APCP instead of the default U/V winds
    out = scan_binary_df(bdf, selector=make_selector(fp=(8,), fc=1)).select(
        F.col("header.productDefinitionTemplate").alias("pdt"),
        F.col("header.perturbationNumber").alias("m"),
        F.col("header.ensembleSize").alias("n"),
        F.col("header.statisticalProcessName").alias("stat"),
        F.col("header.intervalHours").alias("ivl"),
        F.col("header.intervalEnd").alias("end"),
    ).orderBy("m").collect()
    assert [r["m"] for r in out] == [0, 1, 2]
    assert all(r["pdt"] == 11 and r["n"] == 3 for r in out)
    assert all(r["stat"] == "Accumulation" and r["ivl"] == 6 for r in out)
    assert all(r["end"] == "2020-08-12T12:00:00.000Z" for r in out)


def test_derived_forecast_roundtrips_as_42():
    """Template 4.2 (derived ensemble forecast — the GEFS geavg/gespr
    mean/spread files): the WMO table 4.7 derivation code + ensemble
    size decode typed; member-triple keys stay NULL (a derived product
    has no single member identity)."""
    vals = _field(6, 4, 2)
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
        derived=dict(type=0, size=31),
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["productDefinitionTemplate"] == 2
    assert "derived" in h["productDefinitionTemplateName"].lower()
    assert h["derivedForecastType"] == 0
    assert h["derivedForecastTypeName"] == "Unweighted mean of all members"
    assert h["ensembleSize"] == 31
    assert h["ensembleType"] is None and h["perturbationNumber"] is None
    assert np.allclose(rec["data"], vals)


def test_derived_with_interval_roundtrips_as_412():
    """derived + interval = template 4.12 (derived statistics over a
    time interval — GEFS mean/spread accumulations): derivation pair
    AND the (+2-shifted) 4.8 interval block both decode."""
    vals = _field(6, 4, 9)
    msg = encode_grib2_message(
        vals, parameter_number=8, parameter_category=1, ref_time=RT,
        nx=6, ny=4, derived=dict(type=4, size=21),
        forecast_hours=0, interval_hours=6, statistical_process=1,
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 12
    assert h["derivedForecastTypeName"] == "Spread of all members"
    assert h["ensembleSize"] == 21
    assert h["statisticalProcessName"] == "Accumulation"
    assert h["intervalHours"] == 6
    assert h["intervalEnd"] == "2020-08-12T12:00:00.000Z"


def test_ensemble_and_derived_mutually_exclusive():
    with pytest.raises(ValueError, match="at most one"):
        encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
            ensemble=dict(type=0, number=0, size=3),
            derived=dict(type=0, size=3),
        )


def test_truncated_42_and_412_quarantine():
    """Relabeled short sections must not read derivation/interval
    octets out of the next section (4.2 needs 36, 4.12 needs 60)."""
    for relabel, needs in ((2, "36"), (12, "60")):
        msg = bytearray(encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        ))
        o = 16
        while msg[o + 4] != 4:
            o += int.from_bytes(msg[o : o + 4], "big")
        msg[o + 7 : o + 9] = relabel.to_bytes(2, "big")
        with pytest.raises(ValueError, match=f"4.{relabel} truncated"):
            decode_grib2_bytes(bytes(msg))
        out = scan_grib2_bytes(bytes(msg))
        assert out[0]["record"] is None
        assert f"4.{relabel} truncated" in out[0]["error"]


def test_gefs_mean_spread_file_scan_e2e(spark):
    """A geavg+gespr-shaped file (ensemble mean and spread of U wind,
    one message each) scans into typed per-derivation rows."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )

    blob = encode_grib2_file([
        encode_grib2_message(
            _field(6, 4, seed=t), parameter_number=2, ref_time=RT,
            nx=6, ny=4, derived=dict(type=t, size=31),
        )
        for t in (0, 4)  # mean, spread
    ])
    bdf = spark.createDataFrame([("geavg.grib2", bytearray(blob))],
                                "path string, content binary")
    out = scan_binary_df(bdf, selector=make_selector()).select(
        F.col("header.productDefinitionTemplate").alias("pdt"),
        F.col("header.derivedForecastType").alias("dt"),
        F.col("header.derivedForecastTypeName").alias("name"),
        F.col("header.ensembleSize").alias("n"),
    ).orderBy("dt").collect()
    assert [(r["pdt"], r["dt"], r["n"]) for r in out] == [
        (2, 0, 31), (2, 4, 31)]
    assert out[0]["name"].startswith("Unweighted mean")
    assert out[1]["name"] == "Spread of all members"


def test_probability_forecast_roundtrips_as_45():
    """Template 4.5 (probability forecast): member number/total, WMO
    table 4.9 type, and the scaled event limits decode typed; an open
    side (None) round-trips through the all-ones missing sentinel,
    and a negative limit survives sign-magnitude encoding."""
    vals = _field(6, 4, 7)
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
        probability=dict(number=3, total=10, type=3, lower=-10.25,
                         upper=None),
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 5
    assert "probability" in h["productDefinitionTemplateName"].lower()
    assert h["probabilityNumber"] == 3 and h["probabilityTotal"] == 10
    assert h["probabilityTypeName"] == "Probability of event above lower limit"
    assert h["probabilityLowerLimit"] == -10.25
    assert h["probabilityUpperLimit"] is None
    assert h["ensembleType"] is None and h["derivedForecastType"] is None


def test_probability_with_interval_roundtrips_as_49():
    """probability + interval = template 4.9 (e.g. probability of 6 h
    precipitation within a range): the probability block AND the
    (+13-shifted) 4.8 interval block both decode."""
    msg = encode_grib2_message(
        _field(6, 4, 8), parameter_number=8, parameter_category=1,
        ref_time=RT, nx=6, ny=4, forecast_hours=0, interval_hours=6,
        statistical_process=1,
        probability=dict(number=0, total=31, type=2, lower=1.0,
                         upper=25.0),
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 9
    assert h["probabilityTypeName"].startswith("Probability of event between")
    assert h["probabilityLowerLimit"] == 1.0
    assert h["probabilityUpperLimit"] == 25.0
    assert h["statisticalProcessName"] == "Accumulation"
    assert h["intervalHours"] == 6
    assert h["intervalEnd"] == "2020-08-12T12:00:00.000Z"


def test_truncated_45_and_49_quarantine():
    for relabel, needs in ((5, "47"), (9, "71")):
        msg = bytearray(encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        ))
        o = 16
        while msg[o + 4] != 4:
            o += int.from_bytes(msg[o : o + 4], "big")
        msg[o + 7 : o + 9] = relabel.to_bytes(2, "big")
        with pytest.raises(ValueError, match=f"4.{relabel} truncated"):
            decode_grib2_bytes(bytes(msg))
        out = scan_grib2_bytes(bytes(msg))
        assert out[0]["record"] is None
        assert f"4.{relabel} truncated" in out[0]["error"]


def test_pop_file_scan_e2e(spark):
    """A probability-of-precipitation-shaped file (three thresholds of
    6 h accumulation, template 4.9) scans into typed threshold rows."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )

    blob = encode_grib2_file([
        encode_grib2_message(
            _field(6, 4, seed=i), parameter_number=8,
            parameter_category=1, ref_time=RT, nx=6, ny=4,
            forecast_hours=0, interval_hours=6, statistical_process=1,
            probability=dict(number=i, total=31, type=3, lower=thr,
                             upper=None),
        )
        for i, thr in enumerate((0.25, 1.0, 5.0))
    ])
    bdf = spark.createDataFrame([("gepop.grib2", bytearray(blob))],
                                "path string, content binary")
    out = scan_binary_df(bdf, selector=make_selector(fp=(8,), fc=1)).select(
        F.col("header.probabilityNumber").alias("i"),
        F.col("header.probabilityLowerLimit").alias("thr"),
        F.col("header.probabilityTotal").alias("n"),
        F.col("header.intervalHours").alias("ivl"),
    ).orderBy("i").collect()
    assert [(r["i"], r["thr"], r["n"], r["ivl"]) for r in out] == [
        (0, 0.25, 31, 6), (1, 1.0, 31, 6), (2, 5.0, 31, 6)]


def test_percentile_forecast_roundtrips_as_46_and_410():
    """Templates 4.6/4.10 (percentile forecast — GEFS percentile
    products): the percentile octet decodes typed; the 4.10 interval
    block sits +1 octet past it."""
    vals = _field(6, 4, 4)
    h6 = decode_grib2_bytes(encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
        percentile=90,
    ))[0]["header"]
    assert h6["productDefinitionTemplate"] == 6
    assert "percentile" in h6["productDefinitionTemplateName"].lower()
    assert h6["percentileValue"] == 90
    assert h6["intervalHours"] is None
    h10 = decode_grib2_bytes(encode_grib2_message(
        vals, parameter_number=8, parameter_category=1, ref_time=RT,
        nx=6, ny=4, percentile=10, forecast_hours=0, interval_hours=6,
        statistical_process=1,
    ))[0]["header"]
    assert h10["productDefinitionTemplate"] == 10
    assert h10["percentileValue"] == 10
    assert h10["statisticalProcessName"] == "Accumulation"
    assert h10["intervalEnd"] == "2020-08-12T12:00:00.000Z"
    # non-percentile templates carry NULL
    h0 = decode_grib2_bytes(encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4))[0]["header"]
    assert h0["percentileValue"] is None


def test_percentile_validations_and_quarantines():
    with pytest.raises(ValueError, match="out of range"):
        encode_grib2_message(_field(6, 4), parameter_number=2,
                             ref_time=RT, nx=6, ny=4, percentile=101)
    with pytest.raises(ValueError, match="at most one"):
        encode_grib2_message(_field(6, 4), parameter_number=2,
                             ref_time=RT, nx=6, ny=4, percentile=50,
                             derived=dict(type=0, size=3))
    # a corrupt percentile octet (>100) quarantines
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        percentile=50,
    ))
    o = 16
    while msg[o + 4] != 4:
        o += int.from_bytes(msg[o : o + 4], "big")
    msg[o + 34] = 250
    with pytest.raises(ValueError, match="out of range"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert out[0]["record"] is None and "out of range" in out[0]["error"]
    # a relabeled 4.6-sized section claiming 4.10 must not read the
    # interval out of the next section (needs 59, has 35)
    msg2 = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        percentile=50,
    ))
    o = 16
    while msg2[o + 4] != 4:
        o += int.from_bytes(msg2[o : o + 4], "big")
    msg2[o + 7 : o + 9] = (10).to_bytes(2, "big")
    with pytest.raises(ValueError, match="4.10 truncated"):
        decode_grib2_bytes(bytes(msg2))


# ---------------------------------------------------------------------------
# templates 4.3/4.4 — derived forecast over a CLUSTER of ensemble
# members (rectangular / circular domain), r10: the last GEFS product
# template family (VERDICT r8 #6 / r9 #2 carried item)
# ---------------------------------------------------------------------------


def test_cluster_rect_roundtrips_as_43():
    """Template 4.3: derivation pair, cluster identity block,
    rectangular corner domain, scaled statistics and the trailing
    member-number list all decode typed."""
    vals = _field(6, 4, 5)
    msg = encode_grib2_message(
        vals, parameter_number=2, ref_time=RT, nx=6, ny=4,
        cluster=dict(type=6, size=30, identifier=2, hi_res=1, lo_res=3,
                     total=4, method=0, north=55.0, south=30.25,
                     east=40.0, west=-10.5, std_dev=1.5, distance=2.25,
                     members=[1, 4, 7, 19]),
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["productDefinitionTemplate"] == 3
    assert "cluster" in h["productDefinitionTemplateName"].lower()
    assert "rectangular" in h["productDefinitionTemplateName"].lower()
    assert h["derivedForecastType"] == 6
    assert h["derivedForecastTypeName"] == (
        "Unweighted mean of the cluster members")
    assert h["ensembleSize"] == 30
    assert h["clusterIdentifier"] == 2
    assert h["clusterControlHiRes"] == 1
    assert h["clusterControlLoRes"] == 3
    assert h["totalClusters"] == 4
    assert h["clusteringMethod"] == 0
    assert h["clusteringMethodName"] == "Anomaly correlation"
    assert h["clusterNorthLatitude"] == 55.0
    assert h["clusterSouthLatitude"] == 30.25
    assert h["clusterEastLongitude"] == 40.0
    assert h["clusterWestLongitude"] == -10.5
    assert h["clusterCentralLatitude"] is None
    assert h["clusterRadius"] is None
    assert h["clusterSize"] == 4
    assert h["clusterStdDev"] == 1.5
    assert h["clusterMeanDistance"] == 2.25
    assert h["clusterMembers"] == [1, 4, 7, 19]
    # the 4.1/4.2 member-identity keys stay NULL on a cluster product
    assert h["ensembleType"] is None and h["perturbationNumber"] is None
    assert np.allclose(rec["data"], vals)


def test_cluster_circle_roundtrips_as_44():
    """Template 4.4: centre + radius (10^-3 m units) instead of the
    corner block; rectangular keys stay NULL."""
    vals = _field(6, 4, 6)
    msg = encode_grib2_message(
        vals, parameter_number=3, ref_time=RT, nx=6, ny=4,
        cluster=dict(type=0, size=21, method=1, lat=42.5, lon=273.0,
                     radius=750_000.0, std_dev=0.75, distance=1.25,
                     members=[0, 2]),
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 4
    assert "circular" in h["productDefinitionTemplateName"].lower()
    assert h["clusteringMethod"] == 1
    assert h["clusteringMethodName"] == "Root mean square"
    assert h["clusterCentralLatitude"] == 42.5
    assert h["clusterCentralLongitude"] == 273.0
    assert h["clusterRadius"] == 750_000.0
    assert h["clusterNorthLatitude"] is None
    assert h["clusterWestLongitude"] is None
    assert h["clusterSize"] == 2
    assert h["clusterStdDev"] == 0.75
    assert h["clusterMeanDistance"] == 1.25
    assert h["clusterMembers"] == [0, 2]


def _section4_offset(msg: bytearray) -> int:
    o = 16
    while msg[o + 4] != 4:
        o += int.from_bytes(msg[o : o + 4], "big")
    return o


def test_truncated_cluster_templates_quarantine():
    """A short section relabeled 4.3/4.4 must raise the typed
    truncation error (and quarantine through scan), never read the
    cluster block out of the next section — the contract pin VERDICT
    r8 #6 / r9 #2 asked for, patterned on the rotated-Mercator pin."""
    for relabel, needs in ((3, "68"), (4, "64")):
        msg = bytearray(encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        ))
        o = _section4_offset(msg)
        msg[o + 7 : o + 9] = relabel.to_bytes(2, "big")
        with pytest.raises(ValueError, match=f"4.{relabel} truncated"):
            decode_grib2_bytes(bytes(msg))
        out = scan_grib2_bytes(bytes(msg))
        assert out[0]["record"] is None
        assert f"4.{relabel} truncated" in out[0]["error"]
        assert needs in out[0]["error"]


def test_cluster_member_list_truncation_quarantines():
    """An NC octet claiming more members than section 4 holds is a
    typed truncation, not an out-of-section read."""
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        cluster=dict(type=0, size=21, north=55.0, south=30.0,
                     east=40.0, west=-10.0, members=[1, 2, 3]),
    ))
    o = _section4_offset(msg)
    msg[o + 57] = 200  # NC: 3 → 200 (octet 58)
    with pytest.raises(ValueError, match="200 cluster members"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert out[0]["record"] is None
    assert "200 cluster members" in out[0]["error"]


def test_cluster_with_interval_roundtrips_as_413_414():
    """cluster + interval = templates 4.13/4.14: the 4.8 interval
    block sits PAST the variable-length member list, so the decoder's
    displacement must be NC-dependent — pinned with a 5-member
    rectangular cluster (4.13) and a 3-member circular one (4.14)."""
    msg = encode_grib2_message(
        _field(6, 4, 7), parameter_number=8, parameter_category=1,
        ref_time=RT, nx=6, ny=4, forecast_hours=0, interval_hours=6,
        statistical_process=1,
        cluster=dict(type=6, size=30, identifier=2, north=55.0,
                     south=30.0, east=40.0, west=-10.0, std_dev=1.5,
                     distance=2.25, members=[1, 4, 7, 19, 23]),
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 13
    assert h["clusterMembers"] == [1, 4, 7, 19, 23]
    assert h["clusterNorthLatitude"] == 55.0
    assert h["statisticalProcessName"] == "Accumulation"
    assert h["intervalHours"] == 6
    assert h["intervalEnd"] == "2020-08-12T12:00:00.000Z"

    msg = encode_grib2_message(
        _field(6, 4, 8), parameter_number=8, parameter_category=1,
        ref_time=RT, nx=6, ny=4, forecast_hours=6, interval_hours=12,
        statistical_process=0,
        cluster=dict(type=0, size=21, lat=42.5, lon=273.0,
                     radius=500_000.0, members=[0, 2, 9]),
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 14
    assert h["clusterMembers"] == [0, 2, 9]
    assert h["clusterRadius"] == 500_000.0
    assert h["statisticalProcessName"] == "Average"
    assert h["intervalHours"] == 12
    assert h["intervalEnd"] == "2020-08-13T00:00:00.000Z"

    # an empty member list still leaves the interval block findable
    h = decode_grib2_bytes(encode_grib2_message(
        _field(6, 4), parameter_number=8, parameter_category=1,
        ref_time=RT, nx=6, ny=4, forecast_hours=0, interval_hours=6,
        cluster=dict(type=0, size=21, north=1.0, south=0.0, east=1.0,
                     west=0.0),
    ))[0]["header"]
    assert h["productDefinitionTemplate"] == 13
    assert h["clusterMembers"] == [] and h["intervalHours"] == 6


def test_truncated_cluster_interval_quarantines():
    """A 4.13 whose section ends exactly at the member list (no
    interval block) must raise the typed truncation error with the
    NC-dependent required length, not read the next section."""
    # encode a valid point-in-time 4.3 with 5 members, relabel as 4.13:
    # section 4 is 68+5 = 73 octets, but 4.13 needs 92+5 = 97
    msg = bytearray(encode_grib2_message(
        _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
        cluster=dict(type=0, size=21, north=55.0, south=30.0,
                     east=40.0, west=-10.0, members=[1, 2, 3, 4, 5]),
    ))
    o = _section4_offset(msg)
    msg[o + 7 : o + 9] = (13).to_bytes(2, "big")
    with pytest.raises(ValueError, match="4.13 truncated"):
        decode_grib2_bytes(bytes(msg))
    out = scan_grib2_bytes(bytes(msg))
    assert out[0]["record"] is None and "needs 97" in out[0]["error"]


def test_cluster_mutually_exclusive_with_ensemble():
    with pytest.raises(ValueError, match="at most one"):
        encode_grib2_message(
            _field(6, 4), parameter_number=2, ref_time=RT, nx=6, ny=4,
            cluster=dict(type=0, size=21, lat=0.0, lon=0.0, radius=1.0),
            ensemble=dict(type=0, number=0, size=3),
        )
