"""Round-6 additions (VERDICT r5 'Next round' #3/#6/#7 + ADVICE):

- S1 http(s) branch executed: a loopback `http.server` fixture drives
  `probe_binary`'s HEAD path and `fetch_binary`'s urllib GET path —
  404 → next-candidate and 503-then-succeed retry — replaying
  converter.py:138-144 semantics without network access, and the full
  `ingest_once` cron tick runs against an http:// base URL.
- The ingest tick's pre-fetch decision is ONE bounded driver action:
  the staleness lookup rides the probe-winner plan (VERDICT r5 nit).
- split_col validates its rates (ADVICE r5): train+val > 1 would
  silently empty the 'test' split; bad rates break hex thresholds.
"""

from __future__ import annotations

import threading
from datetime import datetime
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.discovery import candidates
from mints_wind_data_ingestion_spark.operators.fetch import (
    fetch_binary,
    probe_binary,
)
from tests.test_round5 import _add_run, _noaa_tree


# ---------------------------------------------------------------------------
# loopback HTTP server (the container has no network; converter.py's
# real integration point is HTTP, so the urllib branches get a local
# stand-in — SimpleHTTPRequestHandler serves GET and HEAD natively)
# ---------------------------------------------------------------------------


class _QuietHandler(SimpleHTTPRequestHandler):
    #: path -> remaining 503 responses before succeeding (per-server,
    #: reset by the fixture) — models a transiently-unavailable object
    fail_remaining: dict[str, int] = {}

    def _maybe_fail(self) -> bool:
        left = type(self).fail_remaining.get(self.path, 0)
        if left > 0:
            type(self).fail_remaining[self.path] = left - 1
            self.send_error(503, "transient")
            return True
        return False

    def do_GET(self):  # noqa: N802 — http.server API
        if not self._maybe_fail():
            super().do_GET()

    def do_HEAD(self):  # noqa: N802
        if not self._maybe_fail():
            super().do_HEAD()

    def log_message(self, *args):  # silence per-request stderr spam
        pass


@pytest.fixture()
def http_root(tmp_path):
    """Serve a NOAA-layout fixture tree (06Z + 00Z runs staged, the
    newest 12Z absent) on a loopback port; yields (base_url, fields)."""
    tree, fields = _noaa_tree(tmp_path, present_runs=(6, 0))
    handler = type(
        "_H", (_QuietHandler,), {"fail_remaining": {}}
    )  # fresh per-server failure state
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(handler, directory=str(tree))
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", fields, handler
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _urls(spark, base: str, attempts: int = 6) -> DataFrame:
    cands = candidates(spark, "2020-08-12 13:30:00", attempts=attempts)
    return cands.withColumn(
        "url", F.concat(F.lit(base + "/"), F.col("url_path"))
    )


def test_http_probe_head_no_body(spark, http_root):
    """probe_binary over http: HEAD — present runs probe ok, the
    missing newest run is ok=false with the HTTPError text
    (converter.py:142's urlopen-success test, body never read)."""
    base, _fields, _h = http_root
    got = {r.rank: (r.ok, r.error) for r in
           probe_binary(_urls(spark, base)).collect()}
    assert got[1][0] and got[2][0]          # 06Z, 00Z present
    assert not got[0][0] and "404" in got[0][1]  # 12Z absent
    assert all(not got[k][0] for k in (3, 4, 5))


def test_http_fetch_404_falls_to_next_candidate(spark, http_root):
    """fetch_binary over http: GET — absence is data (ok=false + error),
    so first-available-candidate is filter+orderBy+limit, exactly the
    reference's URLError→next-attempt loop (converter.py:138-144)."""
    base, fields, _h = http_root
    fetched = fetch_binary(_urls(spark, base), "url").cache()
    w = fetched.filter("ok").orderBy("rank").limit(1).first()
    assert w.rank == 1 and w.run_ts == datetime(2020, 8, 12, 6)
    # the body that arrived over http is byte-identical to the staged file
    from mints_wind_data_ingestion_spark.sources.grib import decode_binary_df

    one = fetched.filter("ok").orderBy("rank").limit(1)
    got = {
        r["header"]["parameterNumber"]: [round(float(x), 2) for x in r["data"]]
        for r in decode_binary_df(
            one.select(F.col("url").alias("path"), "content")
        ).collect()
    }
    assert got == {p: fields[(6, p)] for p in (2, 3)}
    fetched.unpersist()


def test_http_fetch_retries_transient_503(spark, http_root):
    """The urllib retry loop (operators/fetch.py): one 503 then success
    within a single fetch call's bounded retries; retries exhausted →
    ok=false with the last error."""
    base, _fields, handler = http_root
    path = "/gfs.20200812/06/atmos/gfs.t06z.pgrb2.1p00.f006"
    handler.fail_remaining[path] = 1
    row = fetch_binary(
        _urls(spark, base).filter("rank = 1"), "url", retries=2
    ).first()
    assert row.ok and row.content is not None
    assert handler.fail_remaining[path] == 0
    handler.fail_remaining[path] = 5  # more failures than retries
    row = fetch_binary(
        _urls(spark, base).filter("rank = 1"), "url", retries=2
    ).first()
    assert not row.ok and "503" in row.error


def test_http_ingest_once_end_to_end(spark, http_root, tmp_path):
    """The full cron tick against an http:// base URL: HEAD probes pick
    the 06Z winner, one GET transfers the body, decode + merge land 2
    records; the repeat tick staleness-gates before any transfer."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    base, _fields, _h = http_root
    table = str(tmp_path / "wind_http")
    now = "2020-08-12 13:30:00"
    r1 = ingest_once(spark, base, table, now, attempts=6)
    assert r1["status"] == "merged" and r1["records"] == 2
    assert r1["run_ts"] == datetime(2020, 8, 12, 6)
    r2 = ingest_once(spark, base, table, now, attempts=6)
    assert r2["status"] == "skip_current"


# ---------------------------------------------------------------------------
# single-action staleness gate (VERDICT r5 "what's wrong" nit)
# ---------------------------------------------------------------------------


def test_ingest_skip_tick_is_one_driver_action(spark, tmp_path, monkeypatch):
    """A staleness-gated tick makes exactly ONE bounded driver pull:
    the stored bucket's max ref_time joins onto the probe-winner row
    inside one plan, so the whole pre-fetch decision is a single ≤1-row
    collect — no separate stored-max first()."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    tree, _fields = _noaa_tree(tmp_path, present_runs=(6,))
    table = str(tmp_path / "wind_one_action")
    now = "2020-08-12 13:30:00"
    assert ingest_once(
        spark, f"file://{tree}", table, now, attempts=6
    )["status"] == "merged"

    # patch the CONCRETE DataFrame class (Spark 4 splits the abstract
    # pyspark.sql.DataFrame from the classic implementation — patching
    # the base would not intercept the subclass overrides)
    cls = type(spark.range(1))
    calls = {"collect": 0, "first": 0, "count": 0}
    orig = {k: getattr(cls, k) for k in calls}

    def _wrap(name):
        def inner(self, *a, **kw):
            calls[name] += 1
            return orig[name](self, *a, **kw)
        return inner

    for k in calls:
        monkeypatch.setattr(cls, k, _wrap(k))
    r = ingest_once(spark, f"file://{tree}", table, now, attempts=6)
    assert r["status"] == "skip_current"
    assert calls == {"collect": 1, "first": 0, "count": 0}


def test_ingest_first_tick_gate_handles_missing_table(spark, tmp_path):
    """No stored table → the gate's stored_ref column is null and the
    tick proceeds to merge (the single-action fold must not change
    first-tick behavior)."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    tree, _fields = _noaa_tree(tmp_path, present_runs=(0,))
    r = ingest_once(
        spark, f"file://{tree}", str(tmp_path / "t"), "2020-08-12 13:30:00",
        attempts=6,
    )
    assert r["status"] == "merged" and r["run_ts"] == datetime(2020, 8, 12, 0)


def test_ingest_gate_supersedes_on_newer_run(spark, tmp_path):
    """The folded gate still lets a strictly newer run through (strict
    `<` staleness, ties keep stored): 00Z stored, 06Z appears →
    merged."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    tree, _fields = _noaa_tree(tmp_path, present_runs=(0,))
    table = str(tmp_path / "wind_super")
    now = "2020-08-12 13:30:00"
    assert ingest_once(spark, f"file://{tree}", table, now, attempts=6)[
        "status"] == "merged"
    _add_run(tree, 6)
    r = ingest_once(spark, f"file://{tree}", table, now, attempts=6)
    assert r["status"] == "merged" and r["run_ts"] == datetime(2020, 8, 12, 6)


# ---------------------------------------------------------------------------
# split_col rate validation (ADVICE r5)
# ---------------------------------------------------------------------------


def test_split_col_validates_rates(spark):
    """Bad split rates raise instead of silently emptying a split:
    train+val > 1 would absorb 'test' into 'val' (threshold 'gggggg'),
    and negative/oversized rates produce malformed hex thresholds."""
    from mints_wind_data_ingestion_spark.operators.sampling import split_col

    for train, val in ((0.95, 0.1), (0.0, 0.1), (-0.2, 0.1),
                       (0.8, -0.05), (1.2, 0.0)):
        with pytest.raises(ValueError, match="split_col"):
            split_col(F.col("id"), train=train, val=val)
    # the boundary cases stay legal: exactly 1.0 total, zero val
    df = spark.range(200).select(
        split_col(F.col("id"), train=0.9, val=0.1).alias("s")
    )
    assert {r.s for r in df.distinct().collect()} <= {"train", "val"}
    df = spark.range(200).select(
        split_col(F.col("id"), train=0.5, val=0.0).alias("s")
    )
    assert {r.s for r in df.distinct().collect()} <= {"train", "test"}


# ---------------------------------------------------------------------------
# GRIB2 breadth (r6): product template 4.8 + IEEE packing 5.4
# ---------------------------------------------------------------------------

def _rt():
    return datetime(2020, 8, 12, 6).replace(tzinfo=__import__("datetime").timezone.utc)


def test_ieee_packing_roundtrip_exact():
    """Template 5.4 carries raw 32-bit floats: decode is bit-exact for
    float32-representable values, no quantization tolerance needed."""
    import numpy as np

    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )

    field = np.array(
        [0.0, -40.5, 99.875, 3.140625, -0.0078125, 1e6, -1e-3, 7.25,
         123.456, -987.654, 0.1, 2.5], dtype=np.float32,
    )
    msg = encode_grib2_message(
        field, parameter_number=2, ref_time=_rt(), nx=4, ny=3,
        packing="ieee",
    )
    rec = decode_grib2_bytes(msg)[0]
    got = np.asarray(rec["data"], dtype=np.float32)
    assert np.array_equal(got, field)  # exact, not within-tolerance
    assert rec["header"]["productDefinitionTemplate"] == 0
    assert rec["header"]["statisticalProcess"] is None


def test_ieee_64bit_precision_quarantines():
    """Only 32-bit IEEE (precision 1) is implemented; a 64-bit message
    must fail loud, not decode garbage."""
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
        scan_grib2_bytes,
    )

    msg = bytearray(encode_grib2_message(
        [1.0] * 6, parameter_number=2, ref_time=_rt(), nx=3, ny=2,
        packing="ieee",
    ))
    # locate section 5 (walk sections like the decoder does) and bump
    # the precision octet to 2 (64-bit)
    o = 16
    while True:
        slen, snum = int.from_bytes(msg[o:o + 4], "big"), msg[o + 4]
        if snum == 5:
            msg[o + 11] = 2
            break
        o += slen
    with pytest.raises(ValueError, match="precision 2"):
        decode_grib2_bytes(bytes(msg))
    report = scan_grib2_bytes(bytes(msg))
    assert report[0]["record"] is None
    assert "precision 2" in report[0]["error"]


def test_interval_statistics_template_roundtrip():
    """Template 4.8 (accumulation over an interval): the four interval
    header keys populate, forecastTime stays the interval START, and
    the data round-trips like any 4.0 message."""
    import numpy as np

    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )

    field = np.linspace(0.0, 25.5, 12)
    msg = encode_grib2_message(
        field, parameter_number=8, parameter_category=1,
        ref_time=_rt(), forecast_hours=3, nx=4, ny=3,
        interval_hours=6, statistical_process=1, packing="complex_diff",
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert h["productDefinitionTemplate"] == 8
    assert "statistically processed" in h["productDefinitionTemplateName"]
    assert h["statisticalProcess"] == 1
    assert h["statisticalProcessName"] == "Accumulation"
    assert h["intervalHours"] == 6
    assert h["forecastTime"] == 3  # start of the interval
    # ref 06:00 + start 3h + length 6h = 15:00 same day
    assert h["intervalEnd"] == "2020-08-12T15:00:00.000Z"
    got = np.asarray(decode_grib2_bytes(msg)[0]["data"])
    assert np.abs(got - field).max() <= 0.5e-2 + 1e-9


@pytest.mark.parametrize("stat,name", [(0, "Average"), (2, "Maximum"),
                                       (3, "Minimum")])
def test_interval_statistical_process_names(stat, name):
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )

    msg = encode_grib2_message(
        [1.5] * 6, parameter_number=0, parameter_category=0,
        ref_time=_rt(), nx=3, ny=2, interval_hours=12,
        statistical_process=stat,
    )
    h = decode_grib2_bytes(msg)[0]["header"]
    assert (h["statisticalProcess"], h["statisticalProcessName"]) == (stat, name)


def test_interval_multi_range_quarantines():
    """>1 time-range specification stays fail-loud (never half-decoded):
    the scan surface reports it, the strict decode raises."""
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
        scan_grib2_bytes,
    )

    msg = bytearray(encode_grib2_message(
        [2.0] * 6, parameter_number=8, parameter_category=1,
        ref_time=_rt(), nx=3, ny=2, interval_hours=6,
    ))
    o = 16
    while True:
        slen, snum = int.from_bytes(msg[o:o + 4], "big"), msg[o + 4]
        if snum == 4:
            msg[o + 41] = 2  # octet 42: number of time ranges
            break
        o += slen
    with pytest.raises(ValueError, match="2 time ranges"):
        decode_grib2_bytes(bytes(msg))
    assert "2 time ranges" in scan_grib2_bytes(bytes(msg))[0]["error"]


def test_mixed_wind_and_accumulation_file_through_spark(spark):
    """A file mixing point-in-time wind (4.0/5.3) and an interval
    accumulation (4.8/5.4) decodes end-to-end through the Spark scan
    surface: both records land, the interval keys ride the typed
    header struct (NULL for the 4.0 record), nothing quarantines."""
    import numpy as np

    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        encode_grib2_file,
        encode_grib2_message,
    )

    wind = np.linspace(-20.0, 20.0, 12)
    precip = np.abs(np.linspace(0.0, 5.5, 12)).astype(np.float32)
    blob = encode_grib2_file([
        encode_grib2_message(wind, parameter_number=2, ref_time=_rt(),
                             nx=4, ny=3, packing="complex_diff"),
        encode_grib2_message(precip, parameter_number=8,
                             parameter_category=1, ref_time=_rt(),
                             forecast_hours=0, nx=4, ny=3,
                             interval_hours=6, statistical_process=1,
                             packing="ieee"),
    ])
    binary = spark.createDataFrame(
        [("mem://mixed.grb2", bytearray(blob))], "path string, content binary"
    )
    rows = (
        scan_binary_df(binary, selector=make_selector(fp=None, fs=None, fv=None))
        .select(
            "error",
            "header.parameterNumber",
            "header.productDefinitionTemplate",
            "header.statisticalProcess",
            "header.intervalHours",
            "header.intervalEnd",
            F.element_at("data", 12).alias("last"),
        )
        .orderBy("parameterNumber")
        .collect()
    )
    assert [r.error for r in rows] == [None, None]
    assert [r.productDefinitionTemplate for r in rows] == [0, 8]
    assert rows[0].statisticalProcess is None
    assert rows[0].intervalHours is None
    assert (rows[1].statisticalProcess, rows[1].intervalHours) == (1, 6)
    assert rows[1].intervalEnd == "2020-08-12T12:00:00.000Z"
    assert rows[1].last == pytest.approx(5.5, abs=1e-6)


def test_truncated_48_section_quarantines():
    """A 4.0-sized section 4 relabeled as template 4.8 (34 octets, no
    interval block) must fail loud on the length guard — never read
    interval octets out of the following section."""
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )
    from tests.test_round5 import _patch_pdt

    msg = _patch_pdt(
        encode_grib2_message([1.0] * 6, parameter_number=2,
                             ref_time=_rt(), nx=3, ny=2),
        8,
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_grib2_bytes(msg)


# ---------------------------------------------------------------------------
# Lambert conformal grid (template 3.30) — the HRRR/NAM projection
# ---------------------------------------------------------------------------

HRRR_LAMBERT = dict(laD=38.5, loV=262.5, latin1=38.5, latin2=38.5,
                    dx=3000.0, dy=3000.0)


def test_lambert_grid_header_roundtrip():
    """Template 3.30 header decode: projection keys populate, lat/lon
    corner keys go NULL, dx/dy come back in metres, and the packed
    values round-trip exactly as on a lat/lon grid."""
    import numpy as np

    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        decode_grib2_bytes,
        encode_grib2_message,
    )

    field = np.linspace(-12.0, 14.5, 20)
    msg = encode_grib2_message(
        field, parameter_number=2, ref_time=_rt(), nx=5, ny=4,
        la1=21.138, lo1=237.28, scan_mode=64, packing="complex_diff",
        lambert=HRRR_LAMBERT,
    )
    rec = decode_grib2_bytes(msg)[0]
    h = rec["header"]
    assert h["gridDefinitionTemplate"] == 30
    assert h["gridDefinitionTemplateName"] == "Lambert_Conformal"
    assert h["gridUnits"] == "m"
    assert (h["la1"], h["lo1"]) == (21.138, 237.28)
    assert h["la2"] is None and h["lo2"] is None and h["basicAngle"] is None
    assert (h["laD"], h["loV"]) == (38.5, 262.5)
    assert (h["latin1"], h["latin2"]) == (38.5, 38.5)
    assert (h["dx"], h["dy"]) == (3000.0, 3000.0)
    assert h["projectionCentre"] == 0
    assert h["scanMode"] == 64
    assert h["winds"] == "grid"  # flag 3.3 bit 5 set: grid-relative u/v
    got = np.asarray(rec["data"])
    assert np.abs(got - field).max() <= 0.5e-2 + 1e-9
    # a lat/lon message keeps the projection keys NULL
    h0 = decode_grib2_bytes(encode_grib2_message(
        field, parameter_number=2, ref_time=_rt(), nx=5, ny=4,
    ))[0]["header"]
    assert all(h0[k] is None
               for k in ("laD", "loV", "latin1", "latin2", "projectionCentre"))


def _np_lambert_forward(lat_deg, lon_deg, *, laD, loV, latin1, latin2,
                        radius=6371229.0):
    """Independent numpy FORWARD projection (Snyder 15-1..15-4) used to
    verify the engine's columnar INVERSE actually inverts it."""
    import numpy as np

    p1, p2 = np.radians(latin1), np.radians(latin2)
    pd_, l0 = np.radians(laD), np.radians(loV)
    t = lambda p: np.tan(np.pi / 4 + p / 2)  # noqa: E731
    n = (np.sin(p1) if abs(latin1 - latin2) < 1e-12
         else np.log(np.cos(p1) / np.cos(p2)) / np.log(t(p2) / t(p1)))
    F_ = np.cos(p1) * t(p1) ** n / n
    rho0 = radius * F_ / t(pd_) ** n
    phi, lam = np.radians(lat_deg), np.radians(lon_deg)
    rho = radius * F_ / t(phi) ** n
    th = n * (lam - l0)
    return rho * np.sin(th), rho0 - rho * np.cos(th), rho0


@pytest.mark.parametrize("lamb,la1,lo1", [
    # tangent cone (latin1 == latin2): n = sin(lat1)
    (HRRR_LAMBERT, 21.138, 237.28),
    # secant cone (NAM-like)
    (dict(laD=25.0, loV=265.0, latin1=25.0, latin2=47.0,
          dx=12191.0, dy=12191.0), 21.138, 237.28),
    # SOUTHERN secant cone (n < 0 — Snyder's sign-reversal branch)
    (dict(laD=-35.0, loV=295.0, latin1=-25.0, latin2=-47.0,
          dx=12191.0, dy=12191.0), -55.0, 280.0),
])
def test_lambert_inverse_inverts_forward(spark, lamb, la1, lo1):
    """The columnar inverse must invert an independently-coded numpy
    forward projection: project every decoded (lat, lon) back to metre
    coordinates and recover the exact cell offsets (x1 + i*dx,
    y1 + j*dy) to sub-millimetre — on both hemispheres' cones."""
    import numpy as np

    from mints_wind_data_ingestion_spark.functions.wind import (
        lambert_cell_latlon,
    )

    nx, ny = 9, 7
    lat, lon = lambert_cell_latlon(
        F.col("idx"), nx=nx, la1=la1, lo1=lo1, **lamb
    )
    pdf = (
        spark.range(nx * ny).select(
            F.col("id").alias("idx"),
            lat.alias("lat"), lon.alias("lon"),
        )
    ).toPandas()

    # anchor: cell 0 IS the first grid point
    assert pdf.loc[0, "lat"] == pytest.approx(la1, abs=1e-9)
    assert pdf.loc[0, "lon"] == pytest.approx(lo1, abs=1e-9)

    x, y, rho0 = _np_lambert_forward(
        pdf["lat"].to_numpy(), pdf["lon"].to_numpy(),
        laD=lamb["laD"], loV=lamb["loV"],
        latin1=lamb["latin1"], latin2=lamb["latin2"],
    )
    x1, y1, _ = _np_lambert_forward(
        np.array([la1]), np.array([lo1]),
        laD=lamb["laD"], loV=lamb["loV"],
        latin1=lamb["latin1"], latin2=lamb["latin2"],
    )
    i = np.arange(nx * ny) % nx
    j = np.arange(nx * ny) // nx
    assert np.abs(x - (x1[0] + i * lamb["dx"])).max() < 1e-3
    assert np.abs(y - (y1[0] + j * lamb["dy"])).max() < 1e-3


def test_lambert_grid_spacing_at_standard_parallel(spark):
    """Sanity on real-world geometry: at the standard parallel the
    projection is true-scale, so adjacent cells sit ~dx metres apart
    on the sphere (haversine), within 0.2% a few rows off it."""
    import numpy as np

    from mints_wind_data_ingestion_spark.functions.wind import (
        lambert_cell_latlon,
    )

    nx = 11
    lat, lon = lambert_cell_latlon(
        F.col("idx"), nx=nx, la1=38.45, lo1=261.9, **HRRR_LAMBERT
    )
    pdf = spark.range(nx * 3).select(
        F.col("id").alias("idx"), lat.alias("lat"), lon.alias("lon")
    ).toPandas()
    R = 6371229.0
    p = np.radians(pdf[["lat", "lon"]].to_numpy())
    a, b = p[:-1], p[1:]
    same_row = (np.arange(len(p) - 1) % nx) != nx - 1
    d = 2 * R * np.arcsin(np.sqrt(
        np.sin((b[:, 0] - a[:, 0]) / 2) ** 2
        + np.cos(a[:, 0]) * np.cos(b[:, 0]) * np.sin((b[:, 1] - a[:, 1]) / 2) ** 2
    ))
    assert np.abs(d[same_row] - 3000.0).max() < 6.0  # 0.2%


def test_lambert_end_to_end_through_spark_scan(spark):
    """Encode a Lambert-grid wind field, scan it through the Spark
    binary surface, pull the projection constants out of the typed
    header struct, and map cell indices to lat/lon with the columnar
    inverse — the full consumer path for an HRRR-class file."""
    import numpy as np

    from mints_wind_data_ingestion_spark.functions.wind import (
        lambert_cell_latlon,
    )
    from mints_wind_data_ingestion_spark.sources.grib import (
        make_selector,
        scan_binary_df,
    )
    from mints_wind_data_ingestion_spark.sources.grib2codec import (
        encode_grib2_message,
    )

    nx, ny = 6, 4
    field = np.linspace(-9.0, 9.0, nx * ny)
    blob = encode_grib2_message(
        field, parameter_number=2, ref_time=_rt(), nx=nx, ny=ny,
        la1=21.138, lo1=237.28, scan_mode=64, lambert=HRRR_LAMBERT,
    )
    binary = spark.createDataFrame(
        [("mem://hrrr.grb2", bytearray(blob))], "path string, content binary"
    )
    decoded = scan_binary_df(binary, selector=make_selector(fv=None, fs=None))
    h = decoded.select("header.*").collect()[0]
    assert h.gridDefinitionTemplate == 30
    lat, lon = lambert_cell_latlon(
        F.col("idx"), nx=h.nx, la1=h.la1, lo1=h.lo1, laD=h.laD, loV=h.loV,
        latin1=h.latin1, latin2=h.latin2, dx=h.dx, dy=h.dy,
    )
    cells = (
        decoded.select(F.posexplode("data").alias("idx", "v"))
        .select("idx", lat.alias("lat"), lon.alias("lon"), "v")
        .orderBy("idx")
        .collect()
    )
    assert cells[0].lat == pytest.approx(21.138, abs=1e-9)
    assert cells[0].lon == pytest.approx(237.28, abs=1e-9)
    # +y is north under scan mode 64: last row sits north of the first
    assert cells[-1].lat > cells[0].lat
    assert cells[0].v == pytest.approx(field[0], abs=0.5e-2 + 1e-9)


# ---------------------------------------------------------------------------
# Gopher-class repetition quality gates
# ---------------------------------------------------------------------------

def test_repetition_features_hand_computed(spark):
    """Every feature against hand-computed values, including the
    overlap semantics ('a a a a a a': five overlapping 'a a' bigrams
    → coverage > 1) and the short-doc guards (no 5-grams, one word)."""
    from mints_wind_data_ingestion_spark.operators.quality import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            # 25 chars, 13 words; 'x y'/'y x' tie at 2 → 'y x' (gram DESC)
            (1, "x y x y x z w q r s t u v"),
            # 11 chars, 6 words; top2 'a a' x5 → 15/11; dup5 2*9/11
            (2, "a a a a a a"),
            (3, "lone"),  # 1 word: no grams at all, zero ratios
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(docs).collect()}

    r1 = rows[1]
    assert r1.n_words == 13
    assert r1.word_rep_e6 == round((13 - 10) * 1e6 / 13)  # x,y dup; z..v uniq
    assert r1.top2_char_e6 == round(2 * 3 * 1e6 / 25)  # 'y x' twice
    assert r1.dup5_char_e6 == 0
    assert not r1.gopher_pass  # top2 24% exceeds the 20% gate
    r2 = rows[2]
    assert r2.top2_char_e6 == round(5 * 3 * 1e6 / 11)  # overlapping > 1e6
    assert r2.top4_char_e6 == round(3 * 7 * 1e6 / 11)  # 'a a a a' x3
    assert r2.dup5_char_e6 == round(2 * 9 * 1e6 / 11)
    assert r2.dup6_char_e6 == 0  # the single 6-gram is not duplicated
    assert not r2.gopher_pass
    r3 = rows[3]
    assert (r3.word_rep_e6, r3.top2_char_e6, r3.top3_char_e6,
            r3.dup5_char_e6) == (0, 0, 0, 0)
    assert r3.gopher_pass


def test_repetition_features_empty_and_whitespace_docs(spark):
    """Empty/whitespace documents survive with zero ratios (no x/0 —
    Spark NULL vs IEEE conventions must never reach the output)."""
    from mints_wind_data_ingestion_spark.operators.quality import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "w w w w w w w w"), (4, None)],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(docs).collect()}
    assert rows[4].n_words == 1  # NULL text behaves as empty, not -1
    for d in (1, 2, 4):
        r = rows[d]
        assert (r.top2_char_e6, r.top3_char_e6, r.dup5_char_e6) == (0, 0, 0)
        assert r.gopher_pass
        assert r.word_rep_e6 == 0
    assert not rows[3].gopher_pass  # pure repetition trips every gate


def test_lambert_degenerate_cone_rejected():
    """latin parallels straddling (or pinned to) the equator have no
    Lambert conformal cone — fail loud, never a wrong map."""
    from mints_wind_data_ingestion_spark.functions.wind import (
        lambert_cell_latlon,
    )

    for lat1, lat2 in ((0.0, 0.0), (-10.0, 30.0), (15.0, -15.0),
                       (0.0, 45.0), (38.5, 0.0)):
        with pytest.raises(ValueError, match="cone constant"):
            lambert_cell_latlon(
                F.col("idx"), nx=4, la1=5.0, lo1=200.0, laD=10.0,
                loV=200.0, latin1=lat1, latin2=lat2, dx=1000.0, dy=1000.0,
            )
