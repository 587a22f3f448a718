"""SparkSession factory tuned for the extraction workload.

Local-mode defaults mirror what we'd submit cluster-side via
``spark-submit --py-files`` (AQE on, Arrow on, sane shuffle partitioning).
Parallelism is parameterized so the N-vs-4N scaling bench (BASELINE.md) can
build two sessions that differ only in core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "facturas-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32. ``shuffle_partitions``
    defaults to ``cores`` — at sf<=0.1 one shuffle partition per core keeps
    every task busy without tiny-partition overhead; on a real cluster this
    is set to ~2-3x total cores (see pipeline.submit notes).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches amortize Python-worker round-trips in the
        # extraction UDF; each doc row is small (~1-4 KB text)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # spill-awareness: 128 MB input splits keep one decompressed split
        # + its Arrow batch well inside an executor-core's memory share at
        # any corpus scale (the default, pinned here so a cluster-side
        # override is a conscious choice; raise only with fatter executors)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Throughput GC: this engine is pure batch — allocation-heavy
        # string/array expressions at 32 concurrent task threads choke
        # Java 17's default G1 (tuned for pause latency, which batch
        # never needs). Measured on the 2.4M-doc quality_frame map at 32
        # cores: 39 s (G1) -> 24 s (ParallelGC). On a real cluster the
        # same flag goes in spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JVM_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
