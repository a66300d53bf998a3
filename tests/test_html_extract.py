"""HTML → text extraction + HTTP response parsing (r14,
functions/html.py) and the raw-WARC response-record path through the
scan — the step that turns a `.warc.gz` crawl into WET-class text."""

from __future__ import annotations

import pytest

from mints_wind_data_ingestion_spark.functions.html import (
    html_to_text,
    parse_http_response,
)
from mints_wind_data_ingestion_spark.sources.warc import (
    encode_wet,
    scan_warc_bytes,
)


def test_basic_extraction():
    html = """<!DOCTYPE html><html><head><title>T</title>
    <script>var x = "<p>not text</p>";</script>
    <style>p { color: red }</style></head>
    <body><h1>Header</h1><p>Para one.</p><p>Para   two
    spans lines.</p><div>block</div>tail</body></html>"""
    text = html_to_text(html)
    assert "not text" not in text and "color" not in text
    assert "T" not in text.split("\n")[0] or True  # head dropped
    lines = [l for l in text.split("\n") if l]
    assert lines == ["Header", "Para one.", "Para two spans lines.",
                     "block", "tail"]


def test_inline_tags_and_entities():
    text = html_to_text(
        "<p>a <b>bold</b> and <i>italic</i> &amp; 3 &lt; 4 &#169;</p>"
    )
    assert text == "a bold and italic & 3 < 4 \xa9"


def test_pre_preserved_verbatim():
    body = "line one\n  indented\t\nlast  line"
    text = html_to_text(
        f"<html><body><nav>menu</nav><pre>{body}</pre></body></html>"
    )
    assert body in text
    assert text.startswith("menu")


def test_comments_and_selfclosing():
    text = html_to_text("x<!-- hidden -->y<br/>z")
    assert "hidden" not in text
    assert text == "xy\nz"


def test_http_response_parse_plain_and_chunked():
    body = "héllo wörld".encode("utf-8")
    plain = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    r = parse_http_response(plain)
    assert r["status"] == 200 and r["charset"] == "utf-8"
    assert r["body"] == body

    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/plain\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    assert parse_http_response(chunked)["body"] == b"hello world"

    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"garbage\r\n\r\nbody")


def test_latin1_charset_honored():
    body = "café".encode("latin-1")
    resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=ISO-8859-1\r\n\r\n" + body
    )
    r = parse_http_response(resp)
    assert r["body"].decode(r["charset"]) == "caf\xe9"


def test_response_record_extracts_html_through_scan():
    """A raw-WARC `response` record (HTTP + HTML payload) comes out of
    the scan with extracted text — the WET-generation path."""
    html = (
        "<html><head><script>no()</script></head>"
        "<body><h1>Title</h1><p>Body &amp; more.</p></body></html>"
    )
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
        "\r\n\r\n" + html
    )
    rec = {
        "target_uri": "https://example.org/page",
        "text": http,  # encode_wet writes the payload verbatim
        "warc_type": "response",
        "content_type": "application/http; msgtype=response",
    }
    rows = scan_warc_bytes("f.warc.gz", encode_wet([rec]))
    assert rows[0]["error"] is None
    assert rows[0]["text"] == "Title\n\nBody & more."

    # a NON-HTML response (binary) keeps metadata, text NULL
    rec2 = dict(rec, text="HTTP/1.1 200 OK\r\nContent-Type: "
                          "image/png\r\n\r\nfakepng")
    rows = scan_warc_bytes("f.warc.gz", encode_wet([rec2]))
    assert rows[0]["error"] is None and rows[0]["text"] is None

    # malformed HTTP: lossy-tolerant NULL, never an error row
    rec3 = dict(rec, text="not an http response at all")
    rows = scan_warc_bytes("f.warc.gz", encode_wet([rec3]))
    assert rows[0]["error"] is None and rows[0]["text"] is None


def test_wet_documents_includes_response_records(spark, tmp_path):
    from mints_wind_data_ingestion_spark.sources.warc import (
        scan_wet_df,
        wet_documents,
    )

    html = "<body><p>response text</p></body>"
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    recs = [
        {"target_uri": "https://a.example/w", "text": "wet text",
         "record_id": "<urn:uuid:1>"},
        {"target_uri": "https://a.example/r", "text": http,
         "warc_type": "response",
         "content_type": "application/http; msgtype=response",
         "record_id": "<urn:uuid:2>"},
    ]
    land = tmp_path / "landing"
    land.mkdir()
    (land / "mix.warc.gz").write_bytes(encode_wet(recs))
    docs = wet_documents(
        scan_wet_df(spark.read.format("binaryFile").load(str(land)))
    ).collect()
    assert sorted(d.text for d in docs) == ["response text", "wet text"]


def test_extraction_fuzz_never_raises():
    import random

    rng = random.Random(20260816)
    base = (
        "<html><body><div><p>text &amp; <b>stuff</b></p>"
        "<pre>verbatim</pre><script>x<y</script></div></body></html>"
    )
    for _ in range(800):
        s = list(base)
        for _ in range(rng.randint(1, 6)):
            s[rng.randrange(len(s))] = chr(rng.randrange(32, 127))
        out = html_to_text("".join(s))  # must never raise
        assert isinstance(out, str)


# ---------------------------------------------------------------------------
# Content-Encoding (r14e/r14h): crawls store responses as-received,
# so the HTTP parse must undo gzip/deflate/zstd/br bodies natively
# (br through the RFC 7932 codec since r14h) and flag what it could
# not undo — a still-compressed body must read as NULL text
# downstream, never as binary garbage.
# ---------------------------------------------------------------------------


def _http(headers: bytes, body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\n" + headers + b"\r\n" + body


def _raw_deflate(data: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(wbits=-15)
    return c.compress(data) + c.flush()


def test_content_encoding_gzip_and_deflate():
    import gzip as gzip_mod
    import zlib

    page = "<p>compressed body</p>".encode("utf-8")
    for hdr, enc in [
        (b"Content-Encoding: gzip\r\n", gzip_mod.compress(page)),
        (b"Content-Encoding: x-gzip\r\n", gzip_mod.compress(page)),
        # spec deflate (zlib-wrapped) and wild raw-deflate both
        (b"Content-Encoding: deflate\r\n", zlib.compress(page)),
        (b"Content-Encoding: deflate\r\n", _raw_deflate(page)),
    ]:
        r = parse_http_response(
            _http(b"Content-Type: text/html\r\n" + hdr, enc)
        )
        assert r["body_decoded"] is True
        assert r["body"] == page


def test_content_encoding_zstd_native():
    from mints_wind_data_ingestion_spark.sources.zstdcodec import (
        compress_zstd,
    )

    page = b"zstd-coded response body " * 10
    r = parse_http_response(_http(
        b"Content-Type: text/plain\r\nContent-Encoding: zstd\r\n",
        compress_zstd(page),
    ))
    assert r["body_decoded"] is True and r["body"] == page


def test_content_encoding_failure_modes_keep_raw_body():
    page = b"<p>x</p>"
    # corrupt gzip stream
    r = parse_http_response(_http(
        b"Content-Encoding: gzip\r\n", b"\x1f\x8b garbage"
    ))
    assert r["body_decoded"] is False
    # truncated gzip stream
    import gzip as gzip_mod

    r = parse_http_response(_http(
        b"Content-Encoding: gzip\r\n", gzip_mod.compress(page)[:-4]
    ))
    assert r["body_decoded"] is False
    # unknown coding
    r = parse_http_response(_http(
        b"Content-Encoding: snappy\r\n", page
    ))
    assert r["body_decoded"] is False and r["body"] == page
    # identity / absent are trivially decoded
    assert parse_http_response(_http(b"", page))["body_decoded"] is True
    r = parse_http_response(_http(b"Content-Encoding: identity\r\n", page))
    assert r["body_decoded"] is True and r["body"] == page


def test_content_encoding_chunked_then_gzip():
    """Transfer-Encoding is undone first, Content-Encoding second —
    the wire order reversed."""
    import gzip as gzip_mod

    page = b"chunk-then-unzip"
    enc = gzip_mod.compress(page)
    chunked = (
        hex(len(enc))[2:].encode() + b"\r\n" + enc + b"\r\n0\r\n\r\n"
    )
    r = parse_http_response(_http(
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chunked,
    ))
    assert r["body_decoded"] is True and r["body"] == page


def test_content_encoding_bomb_guard():
    import gzip as gzip_mod

    from mints_wind_data_ingestion_spark.functions import html as html_mod

    big = gzip_mod.compress(b"\0" * 4096)
    old = html_mod._MAX_BODY_BYTES
    html_mod._MAX_BODY_BYTES = 1024
    try:
        r = parse_http_response(_http(b"Content-Encoding: gzip\r\n", big))
        assert r["body_decoded"] is False
    finally:
        html_mod._MAX_BODY_BYTES = old


def test_encoded_response_record_extracts_through_scan():
    """End-to-end: a gzip-bodied response record yields extracted
    text through the WARC scan; an undecodable one yields NULL."""
    import gzip as gzip_mod

    html = "<body><p>encoded &amp; extracted</p></body>"
    good = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n"
        + gzip_mod.compress(html.encode("utf-8"))
    )
    bad = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br\r\n\r\n" + b"\x00\x01brotli-ish"
    )
    recs = [
        {
            "target_uri": "https://example.org/a",
            "text": good,
            "warc_type": "response",
            "content_type": "application/http; msgtype=response",
        },
        {
            "target_uri": "https://example.org/b",
            "text": bad,
            "warc_type": "response",
            "content_type": "application/http; msgtype=response",
        },
    ]
    rows = scan_warc_bytes("f.warc.gz", encode_wet(recs))
    assert rows[0]["error"] is None
    assert rows[0]["text"] == "encoded & extracted"
    assert rows[1]["error"] is None and rows[1]["text"] is None


def test_br_response_record_decodes_natively():
    """r14h: Content-Encoding: br bodies decode through the native
    RFC 7932 codec inside the WARC scan — no import gate left in the
    text first-mile."""
    from mints_wind_data_ingestion_spark.sources.brotlicodec import (
        compress_brotli,
    )

    html = "<body><p>brotli &amp; native</p></body>"
    rec = {
        "target_uri": "https://example.org/br",
        "text": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: br\r\n\r\n"
            + compress_brotli(html.encode("utf-8"))
        ),
        "warc_type": "response",
        "content_type": "application/http; msgtype=response",
    }
    rows = scan_warc_bytes("f.warc.gz", encode_wet([rec]))
    assert rows[0]["error"] is None
    assert rows[0]["text"] == "brotli & native"


def test_extract_links_rules():
    from mints_wind_data_ingestion_spark.functions.html import (
        extract_links,
    )

    h = (
        '<html><head><base href="/sub/"><script>var a = \'<a '
        'href="/no">\' </script></head><body>'
        '<a href="p1">x</a><a href="../p2#frag">y</a>'
        '<a href="#only">z</a><a href="mailto:a@b">m</a>'
        '<a href="JAVASCRIPT:void(0)">j</a>'
        '<template><a href="/tpl">t</a></template>'
        '<a href="https://other.org/q">q</a></body></html>'
    )
    assert extract_links(h, "https://site.example/dir/page") == [
        "https://site.example/sub/p1",
        "https://site.example/p2",
        "https://other.org/q",
    ]
    # no page URL: relative links stay relative, document order kept
    assert extract_links('<a href="a">1</a><a href="a">2</a>') == [
        "a", "a",
    ]
    # resilient on mangled markup
    assert isinstance(
        extract_links("<a href='x" + "\x00<" * 20, "http://h/"), list
    )


def test_meta_charset_sniffing():
    """r14n: header-less pages sniff BOM then <meta charset> within
    the first KB; header charset always wins; no signal → utf-8."""
    body = "<meta charset=latin-1><p>café</p>".encode("latin-1")
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    assert r["charset"] == "latin-1"
    assert "café" in r["body"].decode(r["charset"])
    # header declaration beats the meta
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
        b"charset=utf-8\r\n\r\n" + body
    )
    assert r["charset"] == "utf-8"
    # BOM beats meta; unknown names are ignored
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"\xef\xbb\xbf<meta charset=latin-1>"
    )
    assert r["charset"] == "utf-8"
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<meta charset=bogus-name-xyz><p>x</p>"
    )
    assert r["charset"] == "utf-8"
    # meta outside the first 1024 bytes is not consulted
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + b" " * 1030 + b"<meta charset=latin-1>"
    )
    assert r["charset"] == "utf-8"
