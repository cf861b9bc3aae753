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


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver-generated parquet tables and register temp views.

    Returns a dict name -> DataFrame. Column pruning / predicate
    pushdown reach the parquet scan because we never materialize here.
    """
    # (round 12, session 2: a scale-adaptive maxPartitionBytes tuner
    # lived here briefly — removed after inspection showed every test
    # table is ONE file with ONE parquet row group, which a byte-range
    # split cannot divide: the 1 MB splits it picked at bench scale
    # produced ~10 EMPTY tasks per lineitem scan and zero extra
    # parallelism (interleaved A/B: q01 0.87 s without vs 1.33 s
    # with). CPU-heavy per-row stages that need spreading use explicit
    # ensure_parallelism repartitions instead — q37's DSIR scoring,
    # BM25's tf passes, q47's cut re-spreads.)
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
