"""SparkSession factory tuned for the index-build workload.

Local sessions default to ``local[N]`` with shuffle partitions sized to
the core count; on a real cluster the same settings scale with
``spark.sql.shuffle.partitions`` left to AQE coalescing. All knobs here
are scale-motivated:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing);
* Arrow enabled with a large batch size — every heavy operator in this
  engine is an Arrow-vectorized pandas UDF, so batch size is throughput;
* shuffle partitions default to ``2 × cores`` locally (a 1000-executor
  cluster would set this to a few × total cores, or rely on AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "text-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    cores = os.cpu_count() or 8
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner != "*":
            try:
                cores = int(inner)
            except ValueError:
                pass
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # don't pack many small per-shard files into one split — shard
        # files are the parallelism unit for stage C and the query path
        .config("spark.sql.files.openCostInBytes", "8388608")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
