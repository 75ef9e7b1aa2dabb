"""Partitioned JDBC source/sink (SURVEY S13).

The reference's local-dev mirror writes bronze/silver/gold rows to
Postgres one INSERT at a time from the driver
(local-development/process_test_data.py:53-153) and reads stats back
with single-connection SELECTs (:187-225). The Spark-native version is
``spark.read/write.format("jdbc")`` with explicit parallelism:

- reads partition on a numeric column (`partitionColumn` +
  `lowerBound`/`upperBound`/`numPartitions`) so N executors each pull
  a range — without it the whole table flows through ONE connection,
  the classic 100-TB foot-gun;
- `fetchsize` (default 10k here vs the JDBC driver's row-at-a-time
  trickle) controls the cursor batch;
- writes use `batchsize` bulk inserts per partition — the distributed
  form of the reference's `execute_values(page_size=1000)`
  (docs/performance-tuning-guide.md:505-516).

No JDBC driver jar ships in this environment, so tests cover option
construction; the read/write calls are thin passthroughs over public
Spark API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Validated option dict for a parallel JDBC read."""
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(Spark splits [lower, upper] into num_partitions ranges)"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs)).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1_000,
    **extra: str,
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**{k: str(v) for k, v in extra.items()})
        .mode(mode)
        .save()
    )
