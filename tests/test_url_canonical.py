"""URL canonicalization (r14, functions/url.py): rule pins + the
column-expression / Python-twin agreement over variant matrices."""

from __future__ import annotations

from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.functions.url import (
    canonical_url_col,
    canonicalize_url,
)

CASES = [
    # (input, expected canonical)
    ("HTTP://WWW.Example.COM:80/Path/", "http://example.com/Path"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com//a//b/", "http://example.com/a/b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/p#frag", "http://example.com/p"),
    (
        "http://example.com/p?b=2&a=1&utm_source=x&fbclid=zzz",
        "http://example.com/p?a=1&b=2",
    ),
    (
        "http://example.com/p?gclid=1&utm_campaign=c",
        "http://example.com/p",
    ),
    ("http://example.com/p?keep=1&UTM_TERM=t", "http://example.com/p?keep=1"),
    ("  http://example.com/x  ", "http://example.com/x"),
]


def test_python_twin_rules():
    for url, want in CASES:
        assert canonicalize_url(url) == want, url


def test_column_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CASES], "url string"
    ).select("url", canonical_url_col("url").alias("canon"))
    for row in df.collect():
        assert row.canon == canonicalize_url(row.url), row.url


def test_url_dedup_groups_variants(spark):
    variants = [
        "http://www.example.com/article?utm_source=tw",
        "HTTP://example.com:80/article",
        "http://example.com/article/",
        "http://example.com/article#top",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    n = (
        df.select(canonical_url_col("url").alias("c"))
        .distinct()
        .count()
    )
    assert n == 1


def test_codegen_no_udf(spark):
    """The column form must stay pure Catalyst expressions — no
    Python/Arrow boundary in the plan."""
    df = spark.range(1).select(
        F.concat(F.lit("http://example.com/x?b=2&a=1&id="), F.col("id"))
        .alias("url")
    ).select(canonical_url_col("url").alias("c"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
