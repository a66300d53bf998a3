"""Wind-grid expression library (SURVEY.md §1.2, §2.8 C13-C14).

The reference stores a row-major raster (65,160 floats, 360×181, scanMode
0) and leaves index→coordinate math to the consumer. Here it's explicit
Catalyst expressions; `posexplode` turns the raster into a relational
(idx, lat, lon, value) view when per-cell queries need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cell_lat", "cell_lon", "speed", "direction_deg", "explode_grid"]


def cell_lat(idx: Column, nx: Column | int = 360, la1: Column | float = 90.0, dy: Column | float = 1.0) -> Column:
    """lat(i) = la1 - floor(i / nx) * dy  (C13; scanMode 0, rows N→S)."""
    return F.lit(la1) - F.floor(idx / F.lit(nx)) * F.lit(dy)


def cell_lon(idx: Column, nx: Column | int = 360, lo1: Column | float = 0.0, dx: Column | float = 1.0) -> Column:
    """lon(i) = lo1 + (i mod nx) * dx  (C13; lon fastest W→E)."""
    return F.lit(lo1) + F.pmod(idx, F.lit(nx)) * F.lit(dx)


def speed(u: Column, v: Column) -> Column:
    """Wind speed |(u,v)| (C14)."""
    return F.sqrt(u * u + v * v)


def direction_deg(u: Column, v: Column) -> Column:
    """Meteorological wind direction (degrees FROM which the wind blows)."""
    return F.pmod(F.degrees(F.atan2(-u, -v)), F.lit(360.0))


def explode_grid(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Raster → relational per-cell view: adds (idx, lat, lon, value).

    At scale this multiplies rows by 65k; downstream filters on lat/lon
    bands should be applied in the same select so Catalyst collapses
    them into the generate.
    """
    exploded = df.select(
        *[c for c in df.columns if c != data_col],
        F.posexplode(data_col).alias("idx", "value"),
    )
    return exploded.withColumn("lat", cell_lat(F.col("idx"))).withColumn(
        "lon", cell_lon(F.col("idx"))
    )
