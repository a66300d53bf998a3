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
