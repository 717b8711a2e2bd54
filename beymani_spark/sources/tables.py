"""Table sources.

The reference reads delimited text via ``sparkContext.textFile``
(/root/reference/spark/src/main/scala/org/beymani/spark/dist/
StatsBasedOutlierPredictor.scala:202); we read typed parquet (or csv) into
DataFrames so Catalyst gets schemas, column pruning, and predicate pushdown.
"""
from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def get_spark(app: str = "beymani-spark", shuffle_partitions: int = 32) -> SparkSession:
    """Local session for tests/bench. The driver may hand us its own session;
    callers that receive one should use it as-is (plus ``utc_session``)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return utc_session(active)
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    spark = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # long sessions running hundreds of DISTINCT queries (the bench's
        # 194 x warm repeats) generate thousands of codegen classes; the
        # JVM's default 240 MB code cache fills, JIT compilation stops, and
        # pure-codegen scan queries degrade ~5-10x (measured: text_normalize
        # 0.17 -> 1.56 s late in a full-registry run). 512 MB keeps the
        # whole registry JIT-compiled; UseCodeCacheFlushing is belt and
        # braces for even longer sessions. Deployments that set their own
        # driver Java options must FOLD the code-cache flag into
        # SPARK_GRAFT_DRIVER_JAVA_OPTS — builder confs replace, not merge.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
            ),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # extraJavaOptions only applies when THIS call launched the JVM; under
    # spark-submit or a pre-existing gateway it is silently ignored and the
    # 240 MB default quietly reinstates the JIT cliff — make that visible
    try:
        jvm_args = list(
            spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
            .getInputArguments()
        )
        if not any("ReservedCodeCacheSize" in a for a in jvm_args):
            import warnings

            warnings.warn(
                "driver JVM started without -XX:ReservedCodeCacheSize; "
                "full-registry sessions may hit the JIT code-cache cliff "
                "(see BASELINE.md §10.3) — pass the flag via spark-submit "
                "--driver-java-options",
                stacklevel=2,
            )
    except Exception:  # py4j access is best-effort diagnostics only
        pass
    return spark


def utc_session(spark: SparkSession) -> SparkSession:
    # Pin the session timezone so hour()/dayofweek() on parquet timestamps
    # agree with DuckDB's naive-UTC interpretation in oracle comparisons.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


#: (applicationId, path) -> raw parquet schema. Caching the whole DataFrame
#: would make repeated loads share attribute IDs and break self-cogroups
#: (Spark's ambiguous-self-join check); caching only the schema keeps every
#: load a fresh plan while skipping the driver-side footer/schema inference
#: every registry query would otherwise pay (~0.1 s x ~100 loads per bench).
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver fixture tables (TESTDATA.md).

    The fixtures store TIMESTAMP(NANOS) which Spark's parquet reader rejects;
    we read nanos as long (legacy conf) and rebuild proper timestamp columns
    (microsecond truncation — the fixtures are microsecond-spaced, lossless).
    """
    utc_session(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark.sparkContext.applicationId, path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for col_name in _nano_ts_columns(path):
        df = df.withColumn(
            col_name,
            F.timestamp_micros((F.col(col_name) / F.lit(1000)).cast("long")),
        )
    return df


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )
