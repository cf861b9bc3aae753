"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]``; the same settings are what we would
ship to a multi-executor cluster: AQE for runtime re-planning (skew
join splitting, partition coalescing), Arrow for the few pandas-UDF
paths, and a shuffle-partition count that callers should override to
~2-3x total cores at real scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "rialto-airflow-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and
    bench share one code path; on a real cluster pass ``master=None``
    via spark-submit and these configs still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # JSON payloads from XML conversions carry mixed dict-or-list
        # nodes; permissive mode keeps malformed rows as nulls instead
        # of failing the job.
        .config("spark.sql.jsonGenerator.ignoreNullFields", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # The codegen compile cache defaults to 100 entries — far
        # below what a session running this engine's full pipeline
        # holds (q47 alone spans dozens of generated classes; the
        # 50-query bench churns hundreds), so executors were observed
        # re-Janino-compiling projections on EVERY task (130 of ~960
        # sampled executor frames inside CodeGenerator.compile,
        # round-12 jstack evidence). Static conf: takes effect at
        # first session creation. Scale note: this is per-JVM CPU
        # waste on a real cluster too — any long-lived app with more
        # than 100 distinct codegen units wins; entries are softly
        # referenced compiled classes, so memory pressure stays
        # bounded.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def _tune_scan_splits(spark: SparkSession, sf_dir: str) -> None:
    """Scale-adaptive scan splitting (guide §2.2/§6): size
    ``spark.sql.files.maxPartitionBytes`` from the DATASET, not a
    constant. With the 128 MB default, a small benchmark dataset scans
    as 1-2 splits, serializing every map-side-heavy stage (percentile
    partials, signature hashing, array algebra) onto 1-2 of the
    session's cores — round-12 job traces showed exactly that on
    q37/q40/q54/q55. Target ~3 tasks per core over the directory's
    total parquet bytes, clamped to [1 MB, 128 MB]: at 100 TB the
    clamp lands on the 128 MB default (unchanged cluster behavior),
    at benchmark scale scans split small enough to use the machine.
    Runtime conf — re-derived per directory, picked up at each scan's
    planning; split size never affects results, only parallelism."""
    total = 0
    try:
        for entry in os.scandir(sf_dir):
            if entry.is_dir():
                for sub in os.scandir(entry.path):
                    if sub.is_file():
                        total += sub.stat().st_size
            elif entry.is_file():
                total += entry.stat().st_size
    except OSError:
        return  # non-local paths keep the session default
    if not total:
        return
    cores = spark.sparkContext.defaultParallelism
    target = max(1 << 20, min(128 << 20, total // (3 * cores)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver-generated parquet tables and register temp views.

    Returns a dict name -> DataFrame. Column pruning / predicate
    pushdown reach the parquet scan because we never materialize here.
    """
    _tune_scan_splits(spark, sf_dir)
    if not names:
        names = (
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
        )
    out = {}
    for name in names:
        if name == "events":
            # events.ts is a parquet TIMESTAMP(NANOS) column, which the
            # Spark vectorized reader rejects; read nanos as long and
            # truncate to microseconds (same truncation DuckDB applies).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.expr("timestamp_micros(ts div 1000)")
                )
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
