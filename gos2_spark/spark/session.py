"""SparkSession factory with the engine's required configuration.

Arrow-batched pandas UDFs are the engine's execution substrate (SURVEY §2.8);
AQE handles runtime re-planning and skew-join splitting at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gos2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session configured for the engine.

    On a real cluster this is launched via ``spark-submit --py-files
    gos2_spark.zip job.py`` and ``master`` comes from the submit command;
    locally it defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    # Pin per-worker BLAS/OMP to one thread: each executor core runs its own
    # Python worker, so threaded BLAS inside the numpy kernels oversubscribes
    # cores quadratically (32 workers x N BLAS threads) and *inverts* scaling.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow channel for pandas UDFs — mandatory for the kernel hot path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # AQE: runtime coalescing, broadcast selection, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Scan-split sizing: the 128MB default bin-packs small local parquet
        # files into FEWER TASKS THAN CORES (measured: a 1.2GB/128-file
        # table became 13 scan tasks at local[32] — the scan stage capped at
        # 13/32 cores). 32MB keeps ~2-4 waves per core locally; a real
        # cluster run overrides via SPARK_MAX_PARTITION_BYTES.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_MAX_PARTITION_BYTES", "33554432"))
        # Local mode: the driver JVM runs every executor thread — size the
        # heap for (cores x partition working set + broadcasts); an 8g heap
        # GC-thrashes at 32 cores and scaling collapses, while an oversized
        # heap costs real time on this box: pages fault in at ~1.4 GB/s, so
        # every untouched heap GiB is ~0.7s of mid-job stall. 16g is the
        # measured sweet spot for the sf0.1 + 2M-page workloads.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # preallocate + pretouch the heap at startup (excluded from bench
        # timings): growing/faulting it lazily under the first full-size
        # Arrow allocation storm showed 74s-vs-3s run variance at local[32].
        # ParallelGCThreads also parallelizes the pretouch itself.
        .config("spark.driver.extraJavaOptions",
                "-Xms" + os.environ.get("SPARK_DRIVER_MEM", "16g")
                + " -XX:+UseG1GC -XX:+AlwaysPreTouch -XX:ParallelGCThreads="
                + str(os.cpu_count() or 8))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
