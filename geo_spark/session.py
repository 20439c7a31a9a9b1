"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_PKG_DIR)


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship the geo_spark package to executor Python workers via
    addPyFile — required whenever executors run in separate JVMs
    (local-cluster / a real cluster) or the driver cwd differs from the
    repo.  The zip is rebuilt whenever any source file is newer than it
    (a stale /tmp zip would silently run old code on executors)."""
    sc = spark.sparkContext
    if getattr(sc, "_geo_spark_shipped", False):
        return
    zpath = os.path.join(tempfile.gettempdir(), "geo_spark_pyfiles.zip")
    srcs = sorted(pathlib.Path(_PKG_DIR).rglob("*.py"))
    if not srcs:
        # The package itself is imported from a --py-files zip (spark-
        # submit deployment): there are no loose sources to rebuild
        # from, and the launcher already ships the archive to
        # executors.  Re-add the enclosing zip defensively (harmless if
        # already distributed) and stop — rglob on a zip path is empty,
        # and the rebuild below would crash on max() of nothing.
        archive = _PKG_DIR
        while archive and not os.path.isfile(archive):
            parent = os.path.dirname(archive)
            if parent == archive:
                archive = ""
                break
            archive = parent
        if archive.endswith(".zip"):
            try:
                sc.addPyFile(archive)
            except Exception:
                pass
        sc._geo_spark_shipped = True
        return
    newest = max(p.stat().st_mtime for p in srcs)
    if not os.path.exists(zpath) or os.path.getmtime(zpath) <= newest:
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for p in srcs:
                z.write(p, p.relative_to(_REPO_DIR).as_posix())
        os.replace(tmp, zpath)
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already added in this JVM
    sc._geo_spark_shipped = True


def get_spark(
    app: str = "geo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    confs: dict[str, str] | None = None,
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
        .config(
            "spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "3g")
        )
        .config("spark.ui.enabled", "false")
    )
    for var in blas_vars:
        builder = builder.config(f"spark.executorEnv.{var}", "1")
    for k, v in (confs or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    ensure_pyfiles(spark)
    return spark
