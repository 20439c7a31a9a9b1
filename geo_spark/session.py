"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "geo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local session mirroring the multi-executor configuration we target.

    AQE on (runtime coalesce + skew-join splitting), Arrow on (vectorized UDF
    transfer).  On a real cluster the same builder runs under spark-submit
    with master/resources supplied externally.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # One BLAS thread per Python worker: the vectorized UDF kernels run
    # one worker per core already — nested OpenBLAS threading (32 workers
    # x 32 threads) inverts scaling through cache thrash.
    blas_vars = ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS")
    for var in blas_vars:
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Fat Arrow batches: the vectorized kernels amortize per-batch
        # dispatch; 10k-row default batches leave numpy underfed.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for var in blas_vars:
        builder = builder.config(f"spark.executorEnv.{var}", "1")
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
