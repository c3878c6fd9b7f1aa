"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (single JVM, local[N]) but every setting is the one
you'd ship to a 1000-executor cluster: AQE on (runtime coalescing + skew-join
splitting), Arrow enabled for the Python kernel boundary, bounded Arrow batch
size so the extraction kernel's working set stays in executor memory at
100 TB scale (batch width governs peak per-task memory, not data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ai-service-ocr-grading-handler-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    n = DEFAULT_CPUS if cpus is None else int(cpus)
    if n <= 0:
        raise ValueError(f"cpus must be >= 1, got {n}")
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # initial shuffle partitions = task slots: AQE coalescing owns the
        # downsizing anyway, and the old 2x-slots default measured ~40%
        # slower on the shuffle-heaviest query (minhash) at local[32] —
        # two waves of half-sized tasks, pure per-task overhead. On a real
        # cluster this scales with total cores by the same rule.
        .config(
            "spark.sql.shuffle.partitions",
            str(max(n, 32) if shuffle_partitions is None else shuffle_partitions),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session
    (the driver hands us one in `entry`/`queries`)."""
    # shuffle partitions ARE runtime-settable and matter most: an external
    # session's default (200) runs the shuffle-heaviest queries in ~6 waves
    # of undersized tasks — the ~40% regression measured in get_spark's
    # comment — so the driver path must get the same sizing bench.py does
    # (review finding).
    try:
        par = int(spark.sparkContext.defaultParallelism)
    except Exception:  # Spark Connect: no sparkContext; keep session value
        par = 0
    if par:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(max(par, 32)))
        except Exception:
            pass
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "2048"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable at runtime in some deployments — fine
    return spark
