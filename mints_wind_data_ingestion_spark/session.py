"""SparkSession factory.

One place to encode the engine's execution posture. Everything here is
chosen for the 100 TB design point and merely *tested* on local[N]:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the single most important knob for a
  1000-executor cluster where static estimates are wrong.
- UTC session timezone — all reference timestamp semantics are UTC
  (SURVEY.md §2.8 C6/C9); also makes Spark's instant-typed timestamps
  line up with DuckDB's naive-UTC parquet view in the oracle checks.
- Arrow enabled — every Python-boundary crossing (createDataFrame,
  toPandas, pandas UDFs) is Arrow-batched, never pickled row-at-a-time.
- shuffle.partitions sized from the env; at cluster scale this would be
  2-3× total cores (AQE coalesces the excess), on local[32] the default
  of 32 avoids tiny-task overhead at sf≤0.1.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "configure"]


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def configure(spark: SparkSession) -> SparkSession:
    """Apply session-level conf we depend on to an externally-built session.

    The driver hands ``entry()``/``queries()`` a SparkSession we did not
    build; runtime-settable confs (timezone, AQE, Arrow) are applied here
    so query semantics don't depend on who constructed the session.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # wide aggregates (e.g. 144 MinHash min-columns) must stay inside
    # whole-stage codegen; the default maxFields=100 silently falls back
    # to the interpreted path (measured 40% slower on the minhash agg)
    conf.set("spark.sql.codegen.maxFields", "300")
    # ONE Python worker pool, not two (r15, VERDICT r14 #7): SQL
    # UDF/Arrow runners stamp SPARK_SIMPLIFIED_TRACEBACK=1 into their
    # worker env when this conf is on (the default) while plain
    # RDD-path runners (createDataFrame-from-local-rows scans) do not
    # — and the worker factory is keyed on (pythonExec, module,
    # envVars), so the two env shapes split into TWO daemons × N
    # workers, each pool paying its own spawn + first-touch cost
    # (~130 MB RSS per worker, ~70 ms/MB first-touch on this host).
    # Turning the conf off unifies the env → one factory, one reused
    # pool (probe: 2 root daemons → 1). Cost: Python UDF error
    # tracebacks carry the full worker frames — debug cosmetics only.
    conf.set(
        "spark.sql.execution.pyspark.udf.simplifiedTraceback.enabled",
        "false",
    )
    # cached plans keep their pre-AQE output partitioning by default,
    # so a .cache() below an exchange materializes at the static
    # shuffle.partitions (200 under a driver-owned session) even with
    # AQE on — let AQE re-partition cached plans too (the dedup
    # posting-list caches are the multi-consumer case this hits)
    conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    # the driver testdata stores events.ts as TIMESTAMP(NANOS) which the
    # vectorized parquet reader rejects; read as long and convert
    # (sources.tables normalizes back to TimestampType at µs precision).
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def get_spark(app_name: str = "windflow", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    local[N] for tests/bench; on a real cluster the same builder picks up
    master/executor settings from spark-submit and only the SQL conf here
    applies.
    """
    cpus = _cpus()
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # local mode = one JVM for driver AND all 32 executor threads;
        # 8g thrashed GC on wide-agg workloads (measured 10× slowdowns
        # that vanished at 24g). On a real cluster executors get their
        # own heaps and this setting only sizes the driver.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # long sessions compile hundreds of generated classes (wide
        # aggregates are big ones); the JVM default 240 MB CodeCache
        # fills, the JIT shuts off, and later queries run interpreted
        # (measured 16× slowdowns late in a 38-query sweep)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:MaxMetaspaceSize=2g",
        )
        .config("spark.ui.enabled", "false")
        # stdout console-progress bars (\r[Stage …] spam) interleave with
        # the bench's single JSON metric line and can push it out of a
        # tail-capture window on a wide (38-query) surface — measured
        # megabytes of progress output per sweep. Logs belong on stderr.
        .config("spark.ui.showConsoleProgress", "false")
    )
    # extra jars (e.g. a JDBC driver) — must be on the classpath before
    # the JVM starts; DriverManager never sees late-added jars
    extra_jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS")
    if extra_jars:
        builder = builder.config("spark.jars", extra_jars).config(
            "spark.driver.extraClassPath", extra_jars.replace(",", os.pathsep)
        )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    return configure(builder.getOrCreate())
