"""SparkSession factory tuned for the crawl engine.

Local-mode testing (``local[N]``) with settings that also make sense on
a 1000-executor cluster: AQE on (runtime skew-join splitting for hot
hosts), Arrow for every pandas UDF, shuffle partitions sized to the
parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _master_configured() -> bool:
    """True when the deploy environment already provides spark.master
    (spark-submit --master, MASTER env, or an active session)."""
    if "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
        return True
    # spark-submit's PythonRunner hands the driver a pre-built JVM
    # gateway whose conf carries the submitted --master; setting
    # .master() here would silently override it with local[*].
    if os.environ.get("PYSPARK_GATEWAY_PORT"):
        return True
    if os.environ.get("MASTER") or os.environ.get("SPARK_MASTER_URL"):
        return True
    return SparkSession.getActiveSession() is not None


def get_spark(
    app_name: str = "pholcus_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Explicit cores (or the env knob) force local[N]; with neither,
    # leave the master to the deploy environment (spark-submit --master
    # yarn/k8s sets spark.master via PYSPARK_SUBMIT_ARGS) — and when no
    # environment configured one either, fall back to local[*] so plain
    # `python -m pholcus_spark` runs out of the box.
    env_cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and env_cores is not None:
        cores = int(env_cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores or 32, 8)
    builder = SparkSession.builder
    if cores is not None:
        builder = builder.master(f"local[{cores}]")
    elif not _master_configured():
        builder = builder.master("local[*]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
