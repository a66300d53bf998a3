from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mints_wind_data_ingestion_spark.schemas import TESTDATA_TABLES  # noqa: E402
from mints_wind_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _find_jdbc_jar() -> str | None:
    """A DuckDB JDBC driver jar, if one is cached on this machine —
    lets the JDBC sink round-trip against a real database file."""
    import glob as _glob

    hits = _glob.glob(
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"),
        recursive=True,
    )
    return hits[0] if hits else None


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    jar = _find_jdbc_jar()
    if jar:
        os.environ.setdefault("SPARK_GRAFT_EXTRA_JARS", jar)
    spark = get_spark("windflow-tests")
    yield spark


@pytest.fixture(scope="session")
def jdbc_jar() -> str | None:
    return _find_jdbc_jar()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata registered as views — mirrors
    the driver's oracle environment (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def ref_levenshtein(a: str, b: str) -> int:
    """Reference Wagner-Fischer edit distance (unit costs) — the
    independent model the editdist operator tests compare against."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
