"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every config here is chosen for
the 1000-executor / 100 TB case: AQE on (runtime re-plan + skew-join
splitting), broadcast threshold high enough to broadcast dimension
tables and centroid matrices, Arrow enabled for the few pandas UDF
paths (quantizer encode/decode), shuffle partitions sized for the
local core count (a real cluster would set this to 2-3x total cores or
rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Local-mode driver heap default: SPARK_GRAFT_DRIVER_MEM wins;
    otherwise 16g CLAMPED to a quarter of detected system memory
    (ADVICE r15: an unconditional 16g can swap or fail allocation on
    hosts with less RAM than the 128 GiB bench box). Real clusters set
    driver/executor memory explicitly and never hit this default."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            kb = next(
                int(line.split()[1])
                for line in fh
                if line.startswith("MemTotal")
            )
        total_gib = kb // (1024 * 1024)
    except Exception:  # noqa: BLE001 — no /proc (non-Linux): keep 16g
        total_gib = 64
    return f"{max(2, min(16, total_gib // 4))}g"


def get_spark(
    app_name: str = "lintdb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing of small shuffle partitions and skew-join
        # splitting — the 100 TB insurance policy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dim tables (region/nation/supplier/part) and centroid matrices are
        # small; make sure Catalyst broadcasts them instead of shuffling.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for the pandas_udf paths (quantizer encode/decode, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # PySpark 4's DataFrame debugging wraps EVERY Column/DataFrame
        # API call with call-site capture: getActiveSession + a
        # conf.get RPC + PySparkCurrentOrigin.set/clear — ~4 extra
        # py4j round trips per expression node. This engine's plans
        # are wide (16-perm minhash aggregates, banding structs,
        # cascade windows), so plan CONSTRUCTION is a measurable
        # driver cost: an interleaved A/B of the artifact-update
        # frame build measured 1.6-1.8 s/build with debugging on vs
        # 0.5-0.9 s with it off (round 15; pure driver-side Python,
        # identical plans). Off in production: the lost feature is
        # only the Python call-site line in error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Deterministic timestamps across Spark/DuckDB oracles.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Local mode puts driver + executor in ONE JVM, so this heap
        # holds every persisted cache AND all execution memory. At 8g
        # the bench's late sections ran against evicted caches: the
        # quality section measured 23.6/23.7 s on two reps in-bench vs
        # 12-15 s isolated, and re-running with 16g restored 12.1 s
        # in-bench (round 15; guide §5 — cached data competes with
        # execution memory). 16g on a 128 GiB box is still
        # conservative; real clusters size executor/driver memory
        # explicitly and ignore this default. Clamped to 1/4 of
        # system RAM on smaller hosts (env SPARK_GRAFT_DRIVER_MEM
        # overrides unconditionally).
        .config("spark.driver.memory", _default_driver_mem())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
