"""HTML → text extraction for raw-WARC response records (r14).

A WET file ships pre-extracted text, but a raw `.warc.gz` crawl
carries `response` records whose payload is an HTTP response wrapping
HTML — the extraction step IS the difference between the two
CommonCrawl artifact classes. This module is the engine's native
version of that step, stdlib-only (html.parser), with the same
deterministic, testable posture as the codecs:

- `html_to_text`: tag-stripping extraction — script/style/template/
  noscript/iframe subtrees dropped entirely, block-level tags emit
  newlines, inline tags don't, `<pre>` content preserved verbatim,
  character/entity references decoded (html.parser's charref
  handling), whitespace collapsed outside `<pre>`, comments and
  doctype dropped.
- `parse_http_response`: HTTP/1.x response framing — status line,
  headers, chunked transfer-decoding, charset from the Content-Type
  header (defaulting to UTF-8 with replacement — extraction is
  lossy-tolerant; framing is not).

The sophistication ceiling is deliberate: this is the trafilatura /
jusText PROBLEM slot, solved at the readability-heuristic level a
dependency-free engine can verify (boilerplate classifiers are
model-subjective — the lossy-codec doctrine). What IS here is exact
and pinned by tests.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["html_to_text", "parse_http_response"]

#: subtrees dropped wholesale — non-content by construction
_DROP = {"script", "style", "template", "noscript", "iframe", "svg",
         "head"}

#: tags that break text flow: entering/leaving one emits a newline
_BLOCK = {
    "address", "article", "aside", "blockquote", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "summary", "table", "td", "th", "tr", "ul",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.drop_depth = 0
        self.pre_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
        if tag in _BLOCK and not self.drop_depth:
            self.parts.append("\n")
        if tag == "pre":
            self.pre_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK and not self.drop_depth:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP and self.drop_depth:
            self.drop_depth -= 1
        if tag == "pre" and self.pre_depth:
            self.pre_depth -= 1
        if tag in _BLOCK and not self.drop_depth:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.drop_depth:
            return
        if self.pre_depth:
            self.parts.append(("\x00PRE\x00", data))  # verbatim marker
        else:
            self.parts.append(data)


def html_to_text(html: str) -> str:
    """Extract readable text: dropped subtrees, block newlines,
    verbatim `<pre>`, collapsed whitespace elsewhere."""
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    out: list[str] = []
    pending_space = False
    pending_break = 0
    for part in ex.parts:
        if isinstance(part, tuple):  # pre-verbatim chunk
            if pending_break and out:
                out.append("\n" * min(pending_break, 2))
            pending_break = 0
            pending_space = False
            out.append(part[1])
            continue
        if part == "\n":
            pending_break += 1
            continue
        words = part.split()
        if not words:
            pending_space = pending_space or (bool(part) and bool(out))
            continue
        if pending_break and out:
            out.append("\n" * min(pending_break, 2))
            pending_space = False
        elif pending_space and out:
            out.append(" ")
        elif out and not out[-1].endswith(("\n", " ")):
            if part[0].isspace():
                out.append(" ")
        pending_break = 0
        out.append(" ".join(words))
        pending_space = part[-1].isspace()
    return "".join(out).strip("\n ")


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 chunked transfer-decoding; ValueError on bad framing
    (tolerated by the caller as 'body as-is' — crawled HTTP is messy
    and extraction is lossy-tolerant)."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked: missing size line")
        size_tok = body[pos:eol].split(b";")[0].strip()
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            return bytes(out)
        if pos + size > len(body):
            raise ValueError("chunked: truncated chunk")
        out += body[pos : pos + size]
        pos += size + 2  # trailing CRLF


def parse_http_response(payload: bytes) -> dict:
    """HTTP/1.x response → {"status": int, "headers": {lower: value},
    "body": bytes, "charset": str}. ValueError on unparseable framing
    (no status line / header block)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP: missing header terminator")
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    status_parts = lines[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[0].startswith("HTTP/"):
        raise ValueError(f"HTTP: bad status line {lines[0][:40]!r}")
    try:
        status = int(status_parts[1])
    except ValueError:
        raise ValueError(f"HTTP: bad status code {status_parts[1]!r}") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        name, s, value = line.partition(":")
        if s:
            headers[name.strip().lower()] = value.strip()
    body = payload[sep + 4 :]
    if headers.get("transfer-encoding", "").lower() == "chunked":
        try:
            body = _dechunk(body)
        except ValueError:
            pass  # messy crawl data: keep the raw body
    charset = "utf-8"
    ctype = headers.get("content-type", "")
    for token in ctype.split(";")[1:]:
        k, _, v = token.strip().partition("=")
        if k.lower() == "charset" and v:
            charset = v.strip("\"' ").lower() or "utf-8"
    return {
        "status": status,
        "headers": headers,
        "body": bytes(body),
        "charset": charset,
    }
