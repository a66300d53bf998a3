"""CDXJ (cc-index) scanner + SURT urlkeys — sources/cdxj and
functions/url.surt/surt_col (r14). The crawl SELECTION step: filter
the index, then ranged-fetch only the selected WARC spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.functions.url import surt, surt_col
from mints_wind_data_ingestion_spark.sources.cdxj import (
    encode_cdxj,
    scan_cdxj_bytes,
    scan_cdxj_df,
)


def _cap(key, ts, **kw):
    base = {"urlkey": key, "ts": ts, "url": "https://x.org/",
            "status": "200", "mime": "text/html",
            "filename": "c.warc.gz", "offset": 0, "length": 10}
    base.update(kw)
    return base


def test_roundtrip_sorted_and_plain():
    caps = [_cap("org,b)/", "20260101000001", offset=5),
            _cap("org,a)/", "20260101000000")]
    for compress in (True, False):
        rows = scan_cdxj_bytes("i", encode_cdxj(caps, compress=compress))
        assert [r["urlkey"] for r in rows] == ["org,a)/", "org,b)/"]
        assert rows[1]["warc_offset"] == 5
        assert all(r["error"] is None for r in rows)


def test_quarantine_classes():
    blob = (
        b"org,a)/ 20260101000000 {\"url\":\"u\"}\n"
        b"only-two-fields 20260101000000\n"          # field count
        b"org,b)/ 2026 {\"url\":\"u\"}\n"            # bad timestamp
        b"org,c)/ 20260101000000 not-json\n"         # bad json
        b"org,d)/ 20260101000000 [1,2]\n"            # json non-object
        b"org,e)/ 20260101000001 {\"offset\":\"9\"}\n"
    )
    rows = scan_cdxj_bytes("i.cdxj", blob)
    errs = [r for r in rows if r["error"]]
    good = [r for r in rows if not r["error"]]
    assert len(errs) == 4 and len(good) == 2
    assert good[1]["warc_offset"] == 9
    assert "timestamp" in errs[1]["error"]
    # container corruption: truncated gzip → one file-level error row
    member = encode_cdxj([_cap("org,a)/", "20260101000000")])
    rows = scan_cdxj_bytes("i.gz", member[:-4])
    assert len(rows) == 1 and "gzip" in rows[0]["error"]


def test_surt_twin_matches_column(spark):
    urls = [
        "https://www.example.org:443/doc/5//x/?utm_source=t&b=2&a=1",
        "http://sub.domain.co.uk:80/path/",
        "https://example.org",
        "https://host.net/a?z=1&y=2&utm_id=9",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.k for r in df.select(surt_col("url").alias("k")).collect()]
    assert got == [surt(u) for u in urls]
    assert got[0] == "org,example)/doc/5/x?a=1&b=2"


def test_e2e_binaryfile_scan_and_selection(spark, tmp_path):
    caps = []
    for i in range(6):
        key = f"org,site)/p/{i}"
        caps.append(_cap(key, "20260101000000", offset=i * 10))
        if i % 2 == 0:
            caps.append(_cap(key, "20260101000009", offset=i * 10 + 1))
    d = tmp_path / "idx"
    d.mkdir()
    (d / "00.cdxj.gz").write_bytes(encode_cdxj(caps))
    scanned = scan_cdxj_df(
        spark.read.format("binaryFile").load(str(d))
    )
    latest = (
        scanned.filter("error IS NULL")
        .groupBy("urlkey")
        .agg(F.max_by("warc_offset", "ts").alias("off"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_key = {r.urlkey: (r.off, r.n) for r in latest}
    assert by_key["org,site)/p/2"] == (21, 2)
    assert by_key["org,site)/p/3"] == (30, 1)


def test_index_to_ranged_fetch_to_record(tmp_path):
    """The full CommonCrawl selection workflow, offline: a WET file
    with one gzip member per record + a CDXJ index carrying each
    member's REAL (offset, length) → select one capture from the
    index → ranged-fetch exactly that byte span
    (operators.fetch._fetch_range_one, the .idx path) → the sliced
    member parses STANDALONE into exactly the selected record."""
    from mints_wind_data_ingestion_spark.operators.fetch import (
        _fetch_range_one,
    )
    from mints_wind_data_ingestion_spark.sources.warc import (
        encode_wet,
        iter_gzip_members,
        scan_warc_bytes,
    )

    recs = [
        {"target_uri": f"https://site.example/p/{i}",
         "text": f"record number {i} text", "record_id": f"<urn:uuid:{i}>"}
        for i in range(5)
    ]
    blob = encode_wet(recs)
    warc_path = tmp_path / "crawl-00.warc.gz"
    warc_path.write_bytes(blob)
    # index with real member offsets/lengths
    offsets = [off for off, _ in iter_gzip_members(blob)]
    ends = offsets[1:] + [len(blob)]
    caps = [
        _cap(
            surt(recs[i]["target_uri"]), f"2026010100000{i}",
            url=recs[i]["target_uri"], filename=warc_path.name,
            offset=offsets[i], length=ends[i] - offsets[i],
        )
        for i in range(5)
    ]
    idx = scan_cdxj_bytes("idx", encode_cdxj(caps))
    # select capture 3 by its urlkey
    sel = [r for r in idx if r["urlkey"] == "example,site)/p/3"]
    assert len(sel) == 1
    body, err = _fetch_range_one(
        str(warc_path), sel[0]["warc_offset"],
        sel[0]["warc_offset"] + sel[0]["warc_length"],
        timeout=5, retries=1,
    )
    assert err is None
    rows = scan_warc_bytes("frag", body)
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["text"] == "record number 3 text"
    assert rows[0]["target_uri"] == "https://site.example/p/3"


# ---------------------------------------------------------------------------
# sitemaps (r14m)
# ---------------------------------------------------------------------------


def test_sitemap_roundtrip_and_kinds():
    from mints_wind_data_ingestion_spark.sources.cdxj import (
        encode_sitemap,
        scan_sitemap_bytes,
    )

    sm = encode_sitemap(
        [{"loc": "https://x.org/a", "lastmod": "2026-01-02",
          "changefreq": "daily", "priority": "0.8"},
         {"loc": "https://x.org/b"}],
        compress=True,
    )
    rows = scan_sitemap_bytes("s.xml.gz", sm)
    assert [r["loc"] for r in rows] == ["https://x.org/a", "https://x.org/b"]
    assert rows[0]["changefreq"] == "daily" and rows[0]["priority"] == "0.8"
    assert rows[1]["lastmod"] is None
    idx = encode_sitemap([{"loc": "https://x.org/s1.xml"}], index=True)
    assert scan_sitemap_bytes("i.xml", idx)[0]["kind"] == "sitemap"


def test_sitemap_quarantine_classes():
    from mints_wind_data_ingestion_spark.sources.cdxj import (
        encode_sitemap,
        scan_sitemap_bytes,
    )

    assert "sitemap:" in scan_sitemap_bytes("b.xml", b"<oops")[0]["error"]
    assert "unexpected root" in scan_sitemap_bytes(
        "w.xml", b"<rss version='2.0'></rss>"
    )[0]["error"]
    # entry without <loc>: one error row, siblings survive
    blob = encode_sitemap([{"loc": "https://x.org/a"}]).replace(
        b"</urlset>", b"<url><loc> </loc></url></urlset>"
    )
    rows = scan_sitemap_bytes("p.xml", blob)
    assert rows[0]["error"] is None and "without <loc>" in rows[1]["error"]
    # truncated gzip container
    gz = encode_sitemap([{"loc": "https://x.org/a"}], compress=True)
    assert "gzip" in scan_sitemap_bytes("t.gz", gz[:-4])[0]["error"]
