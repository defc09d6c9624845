"""SparkSession factory with scale-aware defaults.

Defaults are tuned for correctness-vs-oracle determinism (UTC session
timezone, ANSI off) and for the local[N] test harness, while remaining the
right shape for a large cluster: AQE on (runtime re-plan, skew-join
handling, partition coalescing), broadcast threshold sized for dimension
tables, shuffle partitions explicit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-cube-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster
    the master/resource settings come from spark-submit; everything set here
    is master-agnostic.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Determinism vs the DuckDB oracle: interpret parquet timestamps in UTC.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        # AQE: runtime partition coalescing + skew-join splitting — the
        # 100 TB story relies on this instead of hand-tuned partition counts.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables in a star schema are small; let Catalyst broadcast
        # them aggressively so fact-side scans never shuffle for a dim join.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Pin worker-side BLAS to one thread (r12): the numpy kernels in
        # mapInPandas/applyInPandas run at full TASK parallelism already,
        # and an unpinned OpenBLAS spawns ncpu threads PER WORKER —
        # 32 tasks x 32 BLAS threads oversubscribes the box ~32x and made
        # the GEMM-heavy tiers' timings swing 4x run-to-run (caught by
        # the bench calibration scalars: python_loop flat while gemm
        # flapped). executorEnv reaches the forked Python workers in
        # local mode too, and leaves DRIVER-side numpy (the driver
        # near-pair tier, small) free to use the full pool.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
