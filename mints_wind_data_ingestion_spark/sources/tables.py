"""Testdata table loading (TESTDATA.md) and temp-view registration.

Parquet scans are the engine's native source: explicit columnar format,
predicate pushdown and column pruning reach the footer for free. At
100 TB the same call reads a date-partitioned table and Catalyst prunes
partitions from the WHERE clause — nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES
from ..session import configure

__all__ = ["load_tables", "register_views", "sf_dir"]


def sf_dir(default: str = "/root/testdata/sf0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize the driver testdata's `ts` column to TimestampType.

    The generator has stored it two ways across rounds: TIMESTAMP(NANOS)
    (arrives as bigint under the nanosAsLong conf, session.configure —
    `DIV 1000` is exact 64-bit integer division; a float path would
    corrupt epochs beyond 2^53 ns) and TIMESTAMP_NTZ(µs) (cast to the
    instant type — identity on the stored micros under the UTC session
    timezone, and required because chronon functions like unix_micros
    only accept the instant-typed column)."""
    from pyspark.sql import functions as F

    for name, dtype in df.dtypes:
        if name == "ts" and dtype == "bigint":
            df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` DIV 1000")))
        elif name == "ts" and dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
        elif name == "ts" and dtype not in ("timestamp", "timestamp_ntz"):
            # The generator has silently changed ts's physical type twice
            # across rounds; fail LOUDLY on a third variant rather than
            # let every downstream chronon query mis-hash.
            raise TypeError(
                f"testdata `ts` arrived as unhandled type {dtype!r}; "
                "extend _normalize_nanos for this round's format"
            )
    return df


def load_tables(spark: SparkSession, directory: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame keyed by name."""
    configure(spark)
    return {
        name: _normalize_nanos(
            spark.read.parquet(os.path.join(directory, f"{name}.parquet"))
        )
        for name in TESTDATA_TABLES
    }


def register_views(spark: SparkSession, directory: str) -> dict[str, DataFrame]:
    """Load tables and expose them as temp views for spark.sql queries."""
    tables = load_tables(spark, directory)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
