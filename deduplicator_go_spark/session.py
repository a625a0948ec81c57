"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what the job would set cluster-side via
spark-submit conf: AQE on (runtime skew-join splitting + partition
coalescing), Arrow enabled for the pandas-UDF stages, shuffle
partitions sized to cores (local) — on a real cluster this would be
2-3x total executor cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deduplicator_go_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (→ ``local[n]``) or a full master string.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark")) else f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if isinstance(cores, (int,)) or (isinstance(cores, str) and cores.isdigit()):
            n = int(cores)
        shuffle_partitions = max(8, n)

    # local-mode shuffles go through spark.local.dir on the driver host;
    # tmpfs removes the shared-disk bottleneck (opt out: SPARK_GRAFT_TMPFS=0)
    local_dir = None
    if os.environ.get("SPARK_GRAFT_TMPFS", "1") != "0" and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        try:
            os.makedirs(local_dir, exist_ok=True)
        except OSError:
            local_dir = None

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # Coalescing is byte-targeted; this engine's hot stages are
        # CPU-bound on small-byte intermediates (band/anchor tables,
        # candidate pairs), and measured coalescing cost the candidate
        # window path 39% wall at local[16] by squeezing it to 1-3
        # tasks. On a production cluster with IO-bound scans you'd
        # re-enable it with minPartitionSize sized to the executor
        # count; skew-join splitting stays on either way.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # long webtext values: keep Arrow batches small enough to bound
        # per-batch memory in the pandas-UDF stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
