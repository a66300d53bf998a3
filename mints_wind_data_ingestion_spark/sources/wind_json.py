"""Decoded-wind-record JSON source (SURVEY.md §2.1 S3).

The reference loads grib2json output with `json.load` and trusts the
shape blindly (converter.py:60-61). Here the read is schema-on-write:
`spark.read.json(..., schema=WIND_RECORD)` — malformed records surface
as NULL fields instead of runtime dict errors, and the 65k-float `data`
arrays parse straight into ArrayType(FloatType()) without inference
passes over the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WIND_RECORD

__all__ = ["read_wind_json", "to_wind_table"]


def read_wind_json(spark: SparkSession, path: str) -> DataFrame:
    """Read decoded wind-component records (grib2json output shape).

    The reference fixtures are single-line JSON *arrays* of records
    (data/wind_data.json), so multiLine mode is required; production
    landing files written one-record-per-line read with the same call
    (Spark handles both under multiLine=false only for JSONL — we accept
    the array form for fixture parity).
    """
    return spark.read.json(path, schema=WIND_RECORD, multiLine=True)


def to_wind_table(records: DataFrame) -> DataFrame:
    """Normalize raw records into the engine's typed wind-table layout
    (FIXTURES.md §A2): parse the reference's two timestamp encodings,
    lift the filter/join keys out of the header.

    recordedTime '2020-08-12 12:00:00+00' (converter.py:67) and
    header.refTime '2020-08-12T06:00:00.000Z' both parse with
    to_timestamp under the UTC session.
    """
    return records.select(
        F.to_timestamp(F.col("recordedTime"), "yyyy-MM-dd HH:mm:ssx").alias("recorded_time"),
        F.col("header.parameterNumber").alias("param"),
        F.to_timestamp(F.col("header.refTime"), "yyyy-MM-dd'T'HH:mm:ss.SSSX").alias("ref_time"),
        F.col("header.forecastTime").alias("forecast_hours"),
        F.col("header").alias("header"),
        F.col("data").alias("data"),
    )
