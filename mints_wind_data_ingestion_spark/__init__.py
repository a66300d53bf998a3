"""windflow — a PySpark-native analytics engine with the query and
data-processing capabilities of mi3nts/mints-wind-data-ingestion.

Package layout (SURVEY.md §7):

- ``session``    — SparkSession factory tuned for the target workload.
- ``schemas``    — explicit StructTypes (wind record, testdata tables).
- ``sources``    — batch/streaming sources and sinks (parquet, json,
                   binary GRIB landing zone, jdbc parity sink).
- ``functions``  — scalar expression library (time bucketing, grid math,
                   wind vector math, text analysis) — all JVM-side
                   ``pyspark.sql.functions`` compositions, no Python UDFs
                   in the hot path.
- ``operators``  — relational/dataflow operators (latest-wins dedup,
                   upsert/merge, retention, discovery, windows, as-of,
                   exact/fuzzy dedup, similarity search).
- ``plans``      — the query registry: every operator exposed as a
                   (PySpark builder, oracle SQL) pair consumed by
                   ``__spark_entry__.py`` and the test suite.
- ``streaming``  — Structured Streaming wrapper (cron-as-stream).
"""

__version__ = "0.1.0"
