"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster — AQE, skew handling, broadcast
thresholds and partition sizing are the knobs that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ai_fabric_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for analytic workloads.

    Scale notes (100 TB target):
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting
      means we do not hand-tune ``spark.sql.shuffle.partitions`` per
      query; we set a sane ceiling and let AQE shrink it.
    - ``maxPartitionBytes`` 128m keeps scan tasks memory-safe on
      executors; at 100 TB that is ~800K tasks, which the driver handles
      as long as we do not collect() large results.
    - Arrow enabled for every pandas_udf / mapInPandas boundary.
    - Broadcast threshold 64m: dimension tables (region/nation/customer
      at our scale factors, partner registries in the X12 domain) are
      always broadcast, never shuffled.
    """
    # Executor Python workers resolve this package via PYTHONPATH (they
    # inherit the JVM's env, which inherits ours at gateway launch):
    # without this, any session created from a foreign cwd fails worker
    # imports for mapInPandas/data-source code pickled by module
    # reference. Must run BEFORE the gateway starts; harmless after.
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _repo_root not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _repo_root + (os.pathsep + _pp if _pp else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter semi-join pruning: when a selective dim
        # filter survives on the build side of a shuffle join, inject a
        # bloom filter into the probe-side scan — at 100 TB this prunes
        # fact-table row groups before the shuffle (explicit, though
        # recent Spark defaults it on, so a cluster override can't
        # silently lose it)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Python data sources (sources/x12_datasource.py) may prune
        # their file listings from pushed filters; off by default in
        # Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
