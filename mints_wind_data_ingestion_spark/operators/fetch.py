"""Executable fetch stage (SURVEY.md §2.1 S1, converter.py:136-177).

The reference's download step is an imperative driver-side loop:
`urllib2.urlopen(url)` on the constructed GFS path, URLError → try the
next candidate, then `open(dataPath,"wb").write(body)`
(converter.py:142, 172-177). Here the fetch itself is an OPERATOR over
the candidate-URL DataFrame (`operators.discovery.candidates`): an
Arrow-batched `mapInPandas` pass fetches each row's URL executor-side
and appends (ok, error, content) columns — absence becomes a FALSE row
instead of a control-flow exception, so `freshest_available` semantics
compose as a plain filter + limit(1) instead of a retry loop.

Scale shape: the fetch fans out one task per candidate-partition —
1000 executors pull 1000 files concurrently, which is exactly the
scale-out sketch SURVEY.md §2.1 S1 describes. Politeness/bounding is
the candidate set's job (≤40 rows in the reference's use), not the
operator's.

Schemes: `file://` URLs and bare local paths are always handled
(landing-dir / fixture-tree replay — the test surface in this
container, which has no network); `http(s)://` goes through stdlib
urllib with a timeout and bounded retries. The fetched bytes ride the
DataFrame as a `binary` column feeding `sources.grib.decode_binary_df`
directly — no intermediate landing write needed. `stage_to_dir`
provides the reference's staging behavior (S9) when a watched landing
dir IS the integration point (streaming ingest).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import urlparse
from urllib.request import url2pathname

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["fetch_binary", "probe_binary", "stage_to_dir"]


def _fetch_one(url: str, timeout: float, retries: int) -> tuple[bytes | None, str | None]:
    """(content, error) for one URL. file:// and bare paths read the
    local filesystem; http(s):// uses urllib. Missing → (None, msg)."""
    scheme = urlparse(url).scheme
    if scheme in ("", "file"):
        path = url2pathname(urlparse(url).path) if scheme == "file" else url
        try:
            with open(path, "rb") as fh:
                return fh.read(), None
        except OSError as exc:
            return None, f"{type(exc).__name__}: {exc}"
    if scheme in ("http", "https"):
        from urllib.error import URLError
        from urllib.request import urlopen

        last = "unreachable"
        for _ in range(max(1, retries)):
            try:
                with urlopen(url, timeout=timeout) as resp:  # noqa: S310
                    return resp.read(), None
            except (URLError, OSError) as exc:
                last = f"{type(exc).__name__}: {exc}"
        return None, last
    return None, f"unsupported scheme: {scheme}"


def _probe_one(url: str, timeout: float) -> tuple[bool, str | None]:
    """(exists, error) without transferring the body — the reference's
    urlopen-success-before-body-read distinction (converter.py:142 vs
    :175). file://: stat; http(s): HEAD request."""
    scheme = urlparse(url).scheme
    if scheme in ("", "file"):
        path = url2pathname(urlparse(url).path) if scheme == "file" else url
        ok = os.path.isfile(path)
        return ok, None if ok else "not found"
    if scheme in ("http", "https"):
        from urllib.error import URLError
        from urllib.request import Request, urlopen

        try:
            with urlopen(  # noqa: S310
                Request(url, method="HEAD"), timeout=timeout
            ) as resp:
                return resp.status < 400, None
        except (URLError, OSError) as exc:
            return False, f"{type(exc).__name__}: {exc}"
    return False, f"unsupported scheme: {scheme}"


def probe_binary(
    df: DataFrame, url_col: str = "url", timeout: float = 10.0
) -> DataFrame:
    """Availability probe: input columns + (ok boolean, error string),
    NO body transfer. Use ahead of `fetch_binary` when most candidates
    are expected absent (the reference's ≤40-attempt backtracking walk
    opens each URL but reads only the winner's body) — probing 40
    candidates costs 40 stats/HEADs, then the fetch downloads exactly
    one file."""
    out_schema = StructType(
        [
            *df.schema.fields,
            StructField("ok", BooleanType()),
            StructField("error", StringType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, errs = [], []
            for url in pdf[url_col]:
                ok, err = _probe_one(str(url), timeout)
                oks.append(ok)
                errs.append(err)
            pdf = pdf[in_cols].copy()
            pdf["ok"] = oks
            pdf["error"] = errs
            yield pdf

    return df.mapInPandas(probe_batches, schema=out_schema)


def fetch_binary(
    df: DataFrame,
    url_col: str = "url",
    timeout: float = 30.0,
    retries: int = 2,
) -> DataFrame:
    """Fetch each row's `url_col` executor-side; returns the input
    columns plus (ok boolean, error string, content binary).

    One Arrow batch of candidate rows in, the same rows out with their
    payloads — the reference's urlopen/URLError control flow
    (converter.py:138-144) re-expressed as data: a 404/missing file is
    `ok = false` with the error text, and "first available candidate"
    is `filter(ok).orderBy(rank).limit(1)` downstream.
    """
    out_schema = StructType(
        [
            *df.schema.fields,
            StructField("ok", BooleanType()),
            StructField("error", StringType()),
            StructField("content", BinaryType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, errs, bodies = [], [], []
            for url in pdf[url_col]:
                body, err = _fetch_one(str(url), timeout, retries)
                oks.append(body is not None)
                errs.append(err)
                bodies.append(body)
            pdf = pdf[in_cols].copy()
            pdf["ok"] = oks
            pdf["error"] = errs
            pdf["content"] = bodies
            yield pdf

    return df.mapInPandas(fetch_batches, schema=out_schema)


def stage_to_dir(
    fetched: DataFrame,
    landing_dir: str,
    name_col: str = "url",
) -> int:
    """Write each ok row's `content` into `landing_dir` under the
    basename of `name_col` — the reference's staging write
    (converter.py:172-177, S9) feeding a watched landing dir (the
    streaming ingest integration point). Executor-side plain-file
    writes: the landing dir must be a filesystem every executor can
    reach (local/NFS in this container; on a cluster object store,
    skip staging and feed `content` straight to the decoder instead).
    Returns the number of files staged."""
    os.makedirs(landing_dir, exist_ok=True)
    rows = fetched.filter("ok").select(name_col, "content")

    def write_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, body in zip(pdf[name_col], pdf["content"]):
                base = os.path.basename(urlparse(str(name)).path)
                with open(os.path.join(landing_dir, base), "wb") as fh:
                    fh.write(bytes(body))
            yield pd.DataFrame({"n": [len(pdf)]})

    from pyspark.sql import functions as F

    n = rows.mapInPandas(write_batches, "n long").agg(F.sum("n")).first()[0]
    return int(n or 0)
