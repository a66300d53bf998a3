"""URL canonicalization for crawl curation (r14).

URL-level dedup is the cheapest dedup a crawl pipeline runs — the
same page is fetched under scheme/case/tracking-parameter variants —
and canonicalization is what makes `wet_documents`' target URIs
joinable/groupable. Rules follow RFC 3986 §6 (syntax-based
normalization) plus the industry-standard tracking-parameter strip
list; everything is expressed as PURE Spark SQL expressions (codegen,
no UDF) with a Python twin for tests and driver-side use.

Normalizations applied (`canonicalize_url` / `canonical_url_col`):
- scheme and host lowercased; `www.` prefix dropped from the host;
- default ports stripped (`:80` http, `:443` https);
- fragment dropped;
- tracking query parameters dropped (utm_*, gclid, fbclid, msclkid,
  mc_eid, igshid, spm, ref_src);
- remaining query parameters SORTED key-order (stable dedup key);
- trailing `/` dropped from non-root paths; empty path → `/`;
- duplicate slashes in the path collapsed.

Percent-decoding of unreserved characters is deliberately NOT done
column-side (the decode table is long and the dedup win is marginal);
the Python twin documents the same scope so both stay aligned.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url_col", "canonicalize_url", "surt", "surt_col", "TRACKING_PARAMS"]

#: query parameters that never identify content
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid", "mc_eid",
    "igshid", "spm", "ref_src",
)


def canonicalize_url(url: str) -> str:
    """Python twin of `canonical_url_col` — identical rules."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    if host.startswith("www."):
        host = host[4:]
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path
    while "//" in path:
        path = path.replace("//", "/")
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if not path:
        path = "/"
    kept = sorted(
        p
        for p in parts.query.split("&")
        if p and p.split("=")[0].lower() not in TRACKING_PARAMS
        and not p.split("=")[0].lower().startswith("utm_")
    )
    return urlunsplit((scheme, host, path, "&".join(kept), ""))


def canonical_url_col(col: Column | str) -> Column:
    """The same canonicalization as pure Spark SQL expressions —
    whole-stage-codegen'd, no UDF, applies at scan rate."""
    url = F.trim(F.col(col) if isinstance(col, str) else col)
    no_frag = F.split(url, "#").getItem(0)
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.split(rest, "[/?]").getItem(0)
    host = F.lower(authority)
    host = F.regexp_replace(host, r"^www\.", "")
    # strip default ports per scheme
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path_q = F.substring(rest, F.length(authority) + 1, 1 << 20)
    path = F.split(path_q, r"\?").getItem(0)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, "/+$", "")
    ).otherwise(path)
    path = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)

    qraw = F.when(
        F.instr(path_q, "?") > 0,
        F.element_at(F.split(path_q, r"\?", 2), 2),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(qraw, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(F.split(p, "=").getItem(0)).isin(*TRACKING_PARAMS)
        & ~F.lower(F.split(p, "=").getItem(0)).startswith("utm_"),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(
        F.length(qsorted) > 0, F.concat(base, F.lit("?"), qsorted)
    ).otherwise(base)


def surt(url: str) -> str:
    """Python twin of `surt_col` — the Sort-friendly URI Reordering
    Transform key the CommonCrawl index (CDXJ) is sorted by:
    canonicalize, drop the scheme, reverse the host's dot-segments
    joined by commas, then ')' + path[?query].
    `https://www.example.org/doc/5?b=2&a=1&utm_source=x` →
    `org,example)/doc/5?a=1&b=2`."""
    canon = canonicalize_url(url)
    rest = canon.split("://", 1)[1] if "://" in canon else canon
    slash = rest.find("/")
    host, pathq = (rest, "/") if slash < 0 else (rest[:slash], rest[slash:])
    return ",".join(reversed(host.split("."))) + ")" + pathq


def surt_col(col: Column | str) -> Column:
    """`surt` as pure codegen'd Spark expressions over
    `canonical_url_col` — no UDF, applies at scan rate (the shape a
    petabyte cc-index join needs)."""
    canon = canonical_url_col(col)
    rest = F.regexp_replace(canon, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.split(rest, "/").getItem(0)
    pathq = F.substring(rest, F.length(host) + 1, 1 << 20)
    pathq = F.when(F.length(pathq) == 0, F.lit("/")).otherwise(pathq)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        pathq,
    )
