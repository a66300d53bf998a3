"""WARC/WET + compressed-JSONL ingestion (round 14, VERDICT r13
"What's missing" #1): record-walk round-trips, every typed quarantine
class, the decompression-bomb guard, the zstd gate, and the e2e
binaryFile → Arrow UDTF scan."""

from __future__ import annotations

import random
import time
import zlib

import pytest

from mints_wind_data_ingestion_spark.sources.warc import (
    encode_wet,
    iter_gzip_members,
    parse_warc_stream,
    scan_jsonl_bytes,
    scan_warc_bytes,
    scan_wet_df,
    wet_conversion_texts,
)


def _records(n=5):
    return [
        {
            "target_uri": f"https://example.org/doc/{i}",
            "text": f"document {i} line one\nline two with ünïcode {i}",
            "record_id": f"<urn:uuid:doc-{i}>",
        }
        for i in range(n)
    ]


def test_wet_roundtrip_gzip_member_per_record():
    blob = encode_wet(_records())
    members = list(iter_gzip_members(blob))
    assert len(members) == 5  # CommonCrawl layout: one member/record
    rows = scan_warc_bytes("f.wet.gz", blob)
    assert [r["error"] for r in rows] == [None] * 5
    assert [r["target_uri"] for r in rows] == [
        f"https://example.org/doc/{i}" for i in range(5)
    ]
    assert rows[3]["text"] == _records()[3]["text"]
    assert rows[0]["warc_type"] == "conversion"
    assert rows[0]["content_length"] == len(
        _records()[0]["text"].encode("utf-8")
    )


def test_wet_roundtrip_plain_stream():
    blob = encode_wet(_records(3), compress=False)
    rows = scan_warc_bytes("f.wet", blob)
    assert [r["error"] for r in rows] == [None] * 3
    assert rows[2]["member_offset"] == 0  # whole file = one "member"


def test_encoder_is_deterministic():
    assert encode_wet(_records()) == encode_wet(_records())


def test_truncated_member_quarantines_not_siblings():
    blob = bytearray(encode_wet(_records(3)))
    # cut the SECOND member in half: member 1 parses, the stream
    # framing is lost from member 2 on → exactly one error row
    members = list(iter_gzip_members(bytes(blob)))
    cut_at = members[1][0] + 10
    mutated = bytes(blob[: members[1][0]]) + bytes(
        blob[cut_at : cut_at + 4]
    )
    rows = scan_warc_bytes("f.wet.gz", mutated)
    oks = [r for r in rows if r["error"] is None]
    errs = [r for r in rows if r["error"] is not None]
    assert len(oks) == 1 and oks[0]["target_uri"].endswith("/0")
    assert len(errs) == 1 and "gzip" in errs[0]["error"]


def test_bad_crc_quarantines():
    blob = bytearray(encode_wet(_records(1)))
    blob[-5] ^= 0xFF  # CRC32 trailer byte
    rows = scan_warc_bytes("f.wet.gz", bytes(blob))
    assert len(rows) == 1 and "gzip" in rows[0]["error"]


def test_bomb_guard_refuses_oversized_member():
    big = b"x" * 1_000_000
    member = zlib.compressobj(9, zlib.DEFLATED, 31)
    blob = member.compress(big) + member.flush()  # ~1 KB compressed
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression-bomb"):
        list(iter_gzip_members(blob, max_member_bytes=65536))
    assert time.perf_counter() - t0 < 1.0
    rows = scan_warc_bytes("f.gz", blob, max_member_bytes=65536)
    assert len(rows) == 1 and "decompression-bomb" in rows[0]["error"]


def test_malformed_framing_classes():
    with pytest.raises(ValueError, match="bad version line"):
        list(parse_warc_stream(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_stream(b"WARC/1.0\r\nWARC-Type: x\r\n\r\nbody"))
    ok = encode_wet(_records(1), compress=False)
    with pytest.raises(ValueError, match="truncated content block"):
        list(parse_warc_stream(ok[:-10]))
    # framing break mid-member: records before the break survive
    two = encode_wet(_records(2), compress=False)
    rows = scan_warc_bytes("f.wet", two[:-10])
    assert rows[0]["error"] is None and rows[1]["error"] is not None


def test_non_text_record_keeps_metadata_null_text():
    rec = {
        "target_uri": "https://example.org/img",
        "text": "fakejpegbytes",
        "content_type": "image/jpeg",
        "warc_type": "resource",
    }
    rows = scan_warc_bytes("f.warc.gz", encode_wet([rec]))
    assert rows[0]["error"] is None
    assert rows[0]["text"] is None  # non-text payload: metadata only
    assert rows[0]["content_type"] == "image/jpeg"


def test_zstd_container_decodes_natively():
    """r14: .zst containers decode through the native RFC 8878 codec
    (sources/zstdcodec) — no external binding, full quarantine
    contract for corrupt frames."""
    from mints_wind_data_ingestion_spark.sources.zstdcodec import (
        compress_zstd,
    )

    plain = encode_wet(_records(4), compress=False)
    rows = scan_warc_bytes("f.wet.zst", compress_zstd(plain))
    assert [r["error"] for r in rows] == [None] * 4
    assert rows[3]["text"] == _records(4)[3]["text"]

    # corrupt frame → typed quarantine row, not an exception
    garbage = b"\x28\xb5\x2f\xfd" + b"\x00" * 20
    rows = scan_warc_bytes("f.wet.zst", garbage)
    assert len(rows) == 1 and "zstd" in rows[0]["error"]

    # JSONL twin
    lines = b'{"a": 1}\n{"a": 2}\n'
    rows = scan_jsonl_bytes("d.jsonl.zst", compress_zstd(lines))
    assert [r["line"] for r in rows] == ['{"a": 1}', '{"a": 2}']

    # dictionary frames stay a typed gate
    dict_frame = bytes([0x28, 0xB5, 0x2F, 0xFD, 0x21, 7, 2, 0, 0, 0])
    rows = scan_warc_bytes("f.wet.zst", dict_frame)
    assert "dictionary" in rows[0]["error"]


def test_corruption_fuzz_stays_in_quarantine_class():
    """Random byte flips over gzip'd WET payloads: every outcome is
    parsed rows or typed error rows — never an uncaught exception,
    never a stall (the codec-fuzz contract)."""
    rng = random.Random(20260816)
    base = bytearray(encode_wet(_records(4)))
    for _ in range(1500):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        t0 = time.perf_counter()
        rows = scan_warc_bytes("f.wet.gz", bytes(b))
        assert time.perf_counter() - t0 < 2.0
        for r in rows:
            assert (r["error"] is None) == (r["warc_type"] is not None)


def test_jsonl_gz_lines_and_quarantine():
    lines = b'{"a": 1}\n{"a": 2}\n\n{"a": 3}\n'
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    rows = scan_jsonl_bytes("d.jsonl.gz", c.compress(lines) + c.flush())
    assert [r["line"] for r in rows] == ['{"a": 1}', '{"a": 2}', '{"a": 3}']
    assert [r["line_no"] for r in rows] == [0, 1, 2]
    rows = scan_jsonl_bytes("d.jsonl", lines)  # plain path
    assert len(rows) == 3 and rows[0]["error"] is None
    bad = scan_jsonl_bytes("d.jsonl.gz", b"\x1f\x8b" + b"\x00" * 6)
    assert len(bad) == 1 and bad[0]["error"] is not None


def test_e2e_binaryfile_scan(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.wet.gz").write_bytes(encode_wet(_records(3)))
    (land / "b.wet.gz").write_bytes(encode_wet(_records(2)))
    corrupt = bytearray(encode_wet(_records(1)))
    corrupt[-5] ^= 0xFF
    (land / "c.wet.gz").write_bytes(bytes(corrupt))
    scanned = scan_wet_df(
        spark.read.format("binaryFile").load(str(land))
    )
    rows = scanned.collect()
    assert len(rows) == 6  # 3 + 2 + 1 error
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].source_path.endswith("c.wet.gz")
    texts = wet_conversion_texts(scanned).collect()
    assert len(texts) == 5 and all(t.text for t in texts)


def test_wet_streaming_gate_stream_equals_batch(spark, tmp_path):
    """The streaming WET gate must publish exactly what the batch scan
    extracts (one shared scan implementation), quarantine corrupt
    members with evidence, and replay idempotently (availableNow
    restart over the same landing dir adds nothing)."""
    from mints_wind_data_ingestion_spark.streaming.pipeline import (
        run_wet_ingest_stream,
    )

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.wet.gz").write_bytes(encode_wet(_records(4)))
    blob = bytearray(encode_wet(_records(2)))
    blob[-5] ^= 0xFF  # corrupt the LAST member's CRC: record 0 survives
    (land / "b.wet.gz").write_bytes(bytes(blob))
    corpus = str(tmp_path / "corpus")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")

    q = run_wet_ingest_stream(spark, str(land), corpus, ckpt, quar)
    q.awaitTermination(180)

    def snap(df):
        return sorted(
            (r.source_path.rsplit("/", 1)[-1], r.target_uri, r.text)
            for r in df.collect()
        )

    got = snap(spark.read.parquet(corpus))
    batch = snap(
        wet_conversion_texts(
            scan_wet_df(spark.read.format("binaryFile").load(str(land)))
        )
    )
    assert got == batch and len(got) == 5
    qrows = spark.read.parquet(quar).collect()
    assert len(qrows) == 1 and "gzip" in qrows[0].error
    assert qrows[0].source_path.endswith("b.wet.gz")

    # replay: same checkpoint, nothing new to process
    q2 = run_wet_ingest_stream(spark, str(land), corpus, ckpt, quar)
    q2.awaitTermination(180)
    assert snap(spark.read.parquet(corpus)) == got


def test_xz_and_bz2_containers():
    """.xz and .bz2 WET/JSONL containers walk through the stdlib
    decompressors with the same member/quarantine contract (r14:
    Wikipedia-dump-class .bz2 and .xz corpora)."""
    import bz2
    import lzma

    plain = encode_wet(_records(3), compress=False)
    # two concatenated xz streams = two members
    xz = lzma.compress(plain, format=lzma.FORMAT_XZ) + lzma.compress(
        encode_wet(_records(2), compress=False), format=lzma.FORMAT_XZ
    )
    rows = scan_warc_bytes("f.wet.xz", xz)
    assert [r["error"] for r in rows] == [None] * 5
    assert len({r["member_offset"] for r in rows}) == 2

    bz = bz2.compress(plain)
    rows = scan_warc_bytes("f.wet.bz2", bz)
    assert [r["error"] for r in rows] == [None] * 3

    # truncation quarantines
    rows = scan_warc_bytes("f.wet.xz", xz[: len(xz) // 3])
    assert any("xz" in (r["error"] or "") for r in rows)
    rows = scan_warc_bytes("f.wet.bz2", bz[:-8])
    assert rows[-1]["error"] is not None

    # bomb guard
    big = lzma.compress(b"x" * 1_000_000, format=lzma.FORMAT_XZ)
    rows = scan_warc_bytes("f.xz", big, max_member_bytes=65536)
    assert "decompression-bomb" in rows[0]["error"]

    # JSONL twin
    lines = b'{"a": 1}\n{"a": 2}\n'
    rows = scan_jsonl_bytes("d.jsonl.bz2", bz2.compress(lines))
    assert [r["line"] for r in rows] == ['{"a": 1}', '{"a": 2}']


def test_wet_documents_and_jsonl_records_adapters(spark, tmp_path):
    """The crawl-dir → documents-shape adapters: dedup/curation
    operators consume a WET scan directly; JSONL parses against an
    explicit schema with a parse-quarantine column."""
    from mints_wind_data_ingestion_spark.sources.warc import (
        jsonl_records,
        scan_jsonl_df,
        wet_documents,
    )

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.wet.gz").write_bytes(encode_wet(_records(4)))
    docs = wet_documents(
        scan_wet_df(spark.read.format("binaryFile").load(str(land)))
    )
    rows = docs.collect()
    assert {r.source for r in rows} == {
        f"https://example.org/doc/{i}" for i in range(4)
    }
    assert len({r.doc_id for r in rows}) == 4  # stable distinct ids
    again = wet_documents(
        scan_wet_df(spark.read.format("binaryFile").load(str(land)))
    ).collect()
    assert sorted(r.doc_id for r in again) == sorted(
        r.doc_id for r in rows
    )

    jl = tmp_path / "jl"
    jl.mkdir()
    (jl / "d.jsonl").write_bytes(
        b'{"id": 1, "text": "alpha"}\nnot json at all\n'
        b'{"id": 2, "text": "beta"}\n'
    )
    recs = jsonl_records(
        scan_jsonl_df(spark.read.format("binaryFile").load(str(jl))),
        "id long, text string",
    ).collect()
    good = sorted((r.id, r.text) for r in recs if r._corrupt is None)
    assert good == [(1, "alpha"), (2, "beta")]
    assert sum(1 for r in recs if r._corrupt is not None) == 1
