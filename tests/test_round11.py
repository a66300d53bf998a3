"""Round-11 hardening of the .idx byte-range partial fetch + ingest:

- wgrib2/NOMADS submessage inventory lines ('587.1:off:...') parse,
  duplicate byte offsets never yield zero-length ranges, and a
  multi-field message is fetched ONCE (labels coalesced with '+');
- `_fetch_range_one` validates the HTTP response: 206 bodies must be
  exactly the requested slice, a 200 (server ignored Range) is sliced
  locally so correctness survives even when the ingress saving is
  lost, and short local reads (stale sidecar past EOF) are errors;
- `ingest_once(use_idx=True)` is ALL-OR-NOTHING: a partially-fetched
  record set falls back to the whole-file fetch instead of merging a
  bucket the strict staleness gate would then freeze incomplete;
- the idx success path no longer leaks one persisted DataFrame per
  cron tick.

Reference parity: converter.py:138-171 (fetch loop + staleness gate);
the .idx convention is NOAA NOMADS' public partial-transfer interface.
"""
from __future__ import annotations

import threading
from datetime import datetime, timezone
from functools import partial
from http.server import BaseHTTPRequestHandler, SimpleHTTPRequestHandler
from http.server import ThreadingHTTPServer

import pytest

from mints_wind_data_ingestion_spark.operators.fetch import (
    _fetch_range_one,
    fetch_grib_ranges,
    parse_grib_idx,
    select_idx_records,
)
from mints_wind_data_ingestion_spark.sources.grib2codec import (
    decode_grib2_bytes,
    encode_grib2_file,
    encode_grib2_message,
)
from tests.test_round5 import _add_run, _noaa_tree


# ---------------------------------------------------------------------------
# inventory parsing: submessages + duplicate offsets
# ---------------------------------------------------------------------------


def test_parse_grib_idx_submessage_lines():
    """wgrib2-style submessage numbers ('3.1', '3.2') parse (integer
    part becomes msg); records sharing one byte offset all stitch to
    the next STRICTLY GREATER offset — no zero-length range exists."""
    text = (
        "1:0:d=2020081206:TMP:2 m above ground:6 hour fcst:\n"
        "2:800:d=2020081206:APCP:surface:0-6 hour acc fcst:\n"
        "3.1:2000:d=2020081206:UGRD:10 m above ground:6 hour fcst:\n"
        "3.2:2000:d=2020081206:VGRD:10 m above ground:6 hour fcst:\n"
        "4:5000:d=2020081206:GUST:surface:6 hour fcst:\n"
    )
    recs = parse_grib_idx(text)
    assert [(r["msg"], r["start"], r["end"]) for r in recs] == [
        (1, 0, 800), (2, 800, 2000),
        (3, 2000, 5000), (3, 2000, 5000),     # both subfields, full msg
        (4, 5000, None),
    ]
    assert all(r["end"] is None or r["end"] > r["start"] for r in recs)
    sel = select_idx_records(recs, ("UGRD", "VGRD"))
    assert [r["var"] for r in sel] == ["UGRD", "VGRD"]


def test_fetch_grib_ranges_coalesces_shared_offsets(spark, tmp_path):
    """Two selected inventory records at ONE byte offset (an NCEP
    multi-field message) fetch that range ONCE — one output row with
    '+'-joined labels whose content is the complete message — never
    two duplicate rows or an ok=True empty body."""
    rt = datetime(2020, 8, 12, 6, tzinfo=timezone.utc)
    vals = lambda s: [((i * 7 + s * 31) % 2600) / 100.0 for i in range(24)]
    msgs = [
        encode_grib2_message(vals(0), parameter_number=0,
                             parameter_category=0, ref_time=rt,
                             nx=6, ny=4),                      # TMP
        encode_grib2_message(vals(1), parameter_number=2, ref_time=rt,
                             nx=6, ny=4),                      # UGRD(+VGRD)
    ]
    blob = encode_grib2_file(msgs)
    path = tmp_path / "gfs.t06z.pgrb2.1p00.f006"
    path.write_bytes(blob)
    # sidecar lists the second message twice (submessage style): same
    # offset, two variable names
    off2 = len(msgs[0])
    (tmp_path / (path.name + ".idx")).write_text(
        f"1:0:d=2020081206:TMP:2 m above ground:6 hour fcst:\n"
        f"2.1:{off2}:d=2020081206:UGRD:10 m above ground:6 hour fcst:\n"
        f"2.2:{off2}:d=2020081206:VGRD:10 m above ground:6 hour fcst:\n"
    )
    df = spark.createDataFrame([(str(path),)], "url string")
    out = fetch_grib_ranges(df, variables=("UGRD", "VGRD")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ok"] and r["variable"] == "UGRD+VGRD"
    assert (r["range_start"], r["range_end"]) == (off2, None)
    assert bytes(r["content"]) == msgs[1]
    assert len(decode_grib2_bytes(bytes(r["content"]))) == 1


# ---------------------------------------------------------------------------
# _fetch_range_one response validation
# ---------------------------------------------------------------------------


class _NoRangeHandler(SimpleHTTPRequestHandler):
    """Serves GET but IGNORES the Range header (returns 200 + full
    body) — the misbehaving-server case ADVICE r10 flagged."""

    def log_message(self, *args):
        pass


class _RangeHandler(BaseHTTPRequestHandler):
    """Honours Range with 206; `short_by` > 0 truncates the 206 body
    (a corrupt partial response that must be rejected)."""

    blob: bytes = b""
    short_by: int = 0

    def do_GET(self):  # noqa: N802 — http.server API
        cls = type(self)
        rng = self.headers.get("Range")
        assert rng and rng.startswith("bytes=")
        lo, _, hi = rng[len("bytes="):].partition("-")
        start = int(lo)
        end = (int(hi) + 1) if hi else len(cls.blob)
        body = cls.blob[start:end]
        if cls.short_by:
            body = body[: max(0, len(body) - cls.short_by)]
        self.send_response(206)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture()
def _serve():
    """Start a loopback server for a handler class; yields base_url."""
    servers = []

    def start(handler, **kw):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        servers.append((srv, t))
        return f"http://127.0.0.1:{srv.server_address[1]}"

    yield start
    for srv, t in servers:
        srv.shutdown()
        t.join(timeout=5)


def test_fetch_range_http_200_sliced_locally(tmp_path, _serve):
    """A server that ignores Range returns the FULL file with 200;
    the fetcher slices [start, end) locally so each selected record
    still decodes exactly once (no duplicate rows downstream)."""
    blob = bytes(range(256)) * 4
    (tmp_path / "f.bin").write_bytes(blob)
    base = _serve(partial(_NoRangeHandler, directory=str(tmp_path)))
    body, err = _fetch_range_one(base + "/f.bin", 100, 300, 10.0, 1)
    assert err is None and body == blob[100:300]
    tail, err2 = _fetch_range_one(base + "/f.bin", 1000, None, 10.0, 1)
    assert err2 is None and tail == blob[1000:]


def test_fetch_range_http_206_validated(_serve):
    """An honoured Range round-trips; a truncated 206 body is an
    error (never an ok row with a non-standalone GRIB fragment)."""
    blob = bytes((i * 13) % 251 for i in range(2048))

    class _H(_RangeHandler):
        pass

    _H.blob = blob
    base = _serve(_H)
    body, err = _fetch_range_one(base + "/x", 64, 192, 10.0, 1)
    assert err is None and body == blob[64:192]

    _H.short_by = 5
    body2, err2 = _fetch_range_one(base + "/x", 64, 192, 10.0, 2)
    assert body2 is None and "length mismatch" in err2


def test_fetch_range_local_short_read_is_error(tmp_path):
    """A stale sidecar pointing past EOF yields an error row, not a
    silently-truncated ok body."""
    p = tmp_path / "short.bin"
    p.write_bytes(b"0123456789")
    body, err = _fetch_range_one(str(p), 4, 8, 10.0, 1)
    assert err is None and body == b"4567"
    body2, err2 = _fetch_range_one(str(p), 4, 99, 10.0, 1)
    assert body2 is None and "length mismatch" in err2


# ---------------------------------------------------------------------------
# ingest_once: all-or-nothing idx path + no cache leak
# ---------------------------------------------------------------------------


def _corrupt_idx_phantom_tail(tree):
    """Append a phantom record past EOF to every staged sidecar: the
    last REAL record's end now exceeds the file, so exactly one of
    the selected ranges fails while the others succeed — the partial
    case the staleness gate must never see merged."""
    for idx in tree.rglob("*.idx"):
        data = (idx.parent / idx.name[: -len(".idx")]).stat().st_size
        idx.write_text(
            idx.read_text()
            + f"9:{data + 4096}:d=2020081206:GUST:surface:6 hour fcst:\n"
        )


def test_ingest_idx_partial_range_falls_back_whole_file(spark, tmp_path):
    """use_idx=True with ONE failing range (UGRD ok, VGRD short) must
    NOT merge a partial bucket — it falls back to the full-file fetch
    and merges the identical 2-record table (ADVICE r10, medium)."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    now = "2020-08-12 13:30:00"
    tree, fields = _noaa_tree(tmp_path, present_runs=())
    fields.update(_add_run(tree, 6, with_idx=True))
    _corrupt_idx_phantom_tail(tree)
    t = str(tmp_path / "t")
    r = ingest_once(spark, f"file://{tree}", t, now, attempts=6,
                    use_idx=True)
    assert r["status"] == "merged" and r["records"] == 2
    rows = spark.read.parquet(t).collect()
    assert sorted(x.param for x in rows) == [2, 3]
    for x in rows:
        assert [round(float(v), 2) for v in x.data] == fields[(6, x.param)]


# ---------------------------------------------------------------------------
# SemDeDup scale-knob self-enforcement (VERDICT r10 #4)
# ---------------------------------------------------------------------------


def test_semdedup_auto_cells_scale_with_corpus(spark, sf_dir):
    """centroids=None sizes the quantizer from a corpus COUNT: a 10×
    corpus at identical default settings gets ~10× the cells, so the
    per-cell pairwise bound holds under growth without retuning."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.operators.similarity import (
        semantic_dedup,
        semdedup_n_cells,
    )
    from mints_wind_data_ingestion_spark.sources.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    target = max(1, n // 4)  # small target so base already multi-cell
    big = emb.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(9)))
    ).select(
        (F.col("vec_id") * 10 + F.col("__r")).alias("vec_id"), "embedding"
    )
    assert semdedup_n_cells(10 * n, target) == 10 * semdedup_n_cells(
        n, target
    )
    cells_base = (
        semantic_dedup(emb, None, target_rows_per_cell=target)
        .select("cell").distinct().count()
    )
    cells_big = (
        semantic_dedup(big, None, target_rows_per_cell=target)
        .select("cell").distinct().count()
    )
    # trained cells can land short of the budget (empty cells drop),
    # but the scale direction must hold decisively
    assert cells_base >= 2
    assert cells_big >= 4 * cells_base


def test_semdedup_oversized_cell_fails_loud(spark, sf_dir):
    """A cell exceeding max_rows_per_cell raises a named error BEFORE
    the O(rows²) pair matrix allocates — a mis-sized n_cells can no
    longer quietly OOM an executor at corpus scale."""
    import numpy as np
    import pytest

    from mints_wind_data_ingestion_spark.operators.similarity import (
        semantic_dedup,
    )
    from mints_wind_data_ingestion_spark.sources.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].limit(64)
    dim = len(emb.first()["embedding"])
    with pytest.raises(Exception, match="max_rows_per_cell"):
        semantic_dedup(  # one centroid → every row in one cell of 64
            emb, np.eye(1, dim), max_rows_per_cell=10
        ).collect()


# ---------------------------------------------------------------------------
# streaming image near-dup ingest gate (VERDICT r10 #2)
# ---------------------------------------------------------------------------


def test_image_neardup_join_two_sided(spark):
    """The two-sided banded Hamming join finds every (new, stored)
    pair within max_hamming and nothing beyond it — same pigeonhole
    recall as the self-join variant, against a separate stored side."""
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        image_neardup_join,
    )

    base = 0x0123456789ABCDEF
    new = spark.createDataFrame(
        [(1, base), (2, base ^ 0xFF), (3, None)],  # d=0, d=8, undecodable
        "doc_id long, dhash long",
    )
    stored = spark.createDataFrame(
        [(100, base), (101, base ^ 0b111)],  # d=0/3 to id1; d=8/5 to id2
        "stored_id long, dhash long",
    )
    got = {
        (r.doc_id, r.stored_id): r.hamming
        for r in image_neardup_join(new, stored, max_hamming=6).collect()
    }
    assert got == {(1, 100): 0, (1, 101): 3, (2, 101): 5}


def test_image_dedup_ingest_gate(spark, tmp_path, sf_dir):
    """The streaming image near-dup gate over the x_image_dedup corpus
    streamed in 3 chunks (planted siblings land in DIFFERENT chunks,
    so cross-epoch dedup is exercised): the stored corpus contains no
    near-dup pair, every clean image survives, exactly one of each
    planted pair survives, quarantine carries the best match + its
    Hamming distance, a corrupt payload quarantines as undecodable,
    and replay leaves the corpus byte-identical."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.plans.extensions import (
        _IMG_SIB_OFFSET,
        _image_corpus,
    )
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        image_neardup_pairs,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_image_dedup_ingest,
    )

    corpus_df = _image_corpus(spark, sf_dir)
    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quarantine")
    for i in range(3):
        chunk = corpus_df.filter(F.pmod("doc_id", F.lit(3)) == i)
        if i == 0:  # plant one undecodable payload in the first chunk
            chunk = chunk.unionByName(
                spark.createDataFrame(
                    [(999_999_999, bytearray(b"not an image"))],
                    "doc_id long, payload binary",
                )
            )
        chunk.coalesce(1).write.mode("append").parquet(landing)

    schema = spark.read.parquet(landing).schema
    q = run_image_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q.awaitTermination(240)

    kept = spark.read.parquet(corpus)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # survivors carry their dhash (the persisted index) and contain
    # no remaining near-dup pair
    assert "dhash" in kept.columns
    assert image_neardup_pairs(
        kept.select("doc_id", "dhash"), max_hamming=6
    ).isEmpty()

    all_ids = {int(r.doc_id) for r in corpus_df.select("doc_id").collect()}
    planted = {i for i in all_ids if i < _IMG_SIB_OFFSET and i % 20 == 0}
    clean = all_ids - planted - {i + _IMG_SIB_OFFSET for i in planted}
    assert planted, "fixture must plant sibling pairs"
    assert clean <= kept_ids
    for i in planted:  # exactly one of each planted pair survives
        assert (i in kept_ids) != (i + _IMG_SIB_OFFSET in kept_ids)
    assert 999_999_999 not in kept_ids

    quarantined = {r.doc_id: r for r in spark.read.parquet(quar).collect()}
    assert quarantined[999_999_999].reason == "undecodable"
    assert quarantined[999_999_999].best_match is None
    for i in planted:  # the dropped twin names its survivor, hamming 0
        dropped = i + _IMG_SIB_OFFSET if i in kept_ids else i
        surv = i if i in kept_ids else i + _IMG_SIB_OFFSET
        row = quarantined[dropped]
        assert row.best_match == surv and row.hamming == 0
        assert row.reason in ("batch_dup", "corpus_dup")
    # siblings land in different chunks → some dedup crossed epochs
    assert any(
        quarantined[i + _IMG_SIB_OFFSET if i in kept_ids else i].reason
        == "corpus_dup"
        for i in planted
    )

    # replay: byte-identical corpus
    before = sorted(kept_ids)
    q2 = run_image_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q2.awaitTermination(240)
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    ) == before


def test_ingest_idx_success_path_unpersists(spark, tmp_path):
    """A cron loop calling ingest_once(use_idx=True) must not leak one
    cached DataFrame per tick (ADVICE r10: only the fallback branch
    unpersisted)."""
    from mints_wind_data_ingestion_spark.operators.ingest import ingest_once

    jsc = spark.sparkContext._jsc

    def _rdd_ids() -> set[int]:
        return {
            int(str(x)) for x in jsc.getPersistentRDDs().keySet().toArray()
        }

    before = _rdd_ids()
    tree, _ = _noaa_tree(tmp_path, present_runs=())
    _add_run(tree, 6, with_idx=True)
    r = ingest_once(spark, f"file://{tree}", str(tmp_path / "t"),
                    "2020-08-12 13:30:00", attempts=6, use_idx=True)
    assert r["status"] == "merged" and r["records"] == 2
    # set-difference, not a count: other tests' async-cleaned caches
    # may disappear concurrently — what matters is WE added nothing
    assert _rdd_ids() - before == set()


def test_video_dedup_ingest_gate(spark, sf_dir, tmp_path):
    """The VIDEO near-dup ingest gate (late r11): planted edited
    siblings streamed in 3 chunks (sibling offset % 3 != 0, so pairs
    straddle epochs and the cross-epoch join is exercised), corrupt
    payload quarantined with NULL evidence, survivors carry the
    persisted signature, replay byte-identical."""
    from pyspark.sql import functions as F

    from mints_wind_data_ingestion_spark.plans.extensions import (
        _VID_SIB_OFFSET,
        _video_corpus,
    )
    from mints_wind_data_ingestion_spark.sources.multimodal import (
        video_neardup_pairs,
    )
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_video_dedup_ingest,
    )

    corpus_df = _video_corpus(spark, sf_dir)
    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    quar = str(tmp_path / "quarantine")
    for i in range(3):
        chunk = corpus_df.filter(F.pmod("doc_id", F.lit(3)) == i)
        if i == 0:  # plant one undecodable payload in the first chunk
            chunk = chunk.unionByName(
                spark.createDataFrame(
                    [(999_999_999, bytearray(b"not a video"))],
                    "doc_id long, payload binary",
                )
            )
        chunk.coalesce(1).write.mode("append").parquet(landing)

    schema = spark.read.parquet(landing).schema
    q = run_video_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q.awaitTermination(240)

    kept = spark.read.parquet(corpus)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # survivors carry their signature (the persisted index) and
    # contain no remaining near-dup pair
    assert "fhashes" in kept.columns
    frames = kept.select(
        "doc_id", F.explode("fhashes").alias("fhash")
    ).withColumn("frame_idx", F.lit(0))
    assert video_neardup_pairs(frames, threshold=0.5).isEmpty()

    all_ids = {int(r.doc_id) for r in corpus_df.select("doc_id").collect()}
    planted = {i for i in all_ids if i < _VID_SIB_OFFSET and i % 40 == 0}
    clean = all_ids - planted - {i + _VID_SIB_OFFSET for i in planted}
    assert planted, "fixture must plant sibling pairs"
    assert clean <= kept_ids
    for i in planted:  # exactly one of each planted pair survives
        assert (i in kept_ids) != (i + _VID_SIB_OFFSET in kept_ids)
    assert 999_999_999 not in kept_ids

    quarantined = {r.doc_id: r for r in spark.read.parquet(quar).collect()}
    assert quarantined[999_999_999].reason == "undecodable"
    assert quarantined[999_999_999].best_match is None
    for i in planted:  # the dropped twin names its survivor, jacc 0.6
        dropped = i + _VID_SIB_OFFSET if i in kept_ids else i
        surv = i if i in kept_ids else i + _VID_SIB_OFFSET
        row = quarantined[dropped]
        assert row.best_match == surv
        assert abs(row.jaccard - 0.6) < 1e-12
        assert row.reason in ("batch_dup", "corpus_dup")
    # siblings land in different chunks → some dedup crossed epochs
    assert any(
        quarantined[i + _VID_SIB_OFFSET if i in kept_ids else i].reason
        == "corpus_dup"
        for i in planted
    )

    # replay: byte-identical corpus
    before = sorted(kept_ids)
    q2 = run_video_dedup_ingest(
        spark, landing, corpus, ckpt, schema, quarantine_path=quar
    )
    q2.awaitTermination(240)
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    ) == before
