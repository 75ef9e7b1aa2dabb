"""Bucketed tables for shuffle-free repeated joins.

A fact table joined on the same key by many downstream queries (the
silver table joined by every gold mart; lineitem↔orders here) pays a
shuffle per query unless it is stored bucketed on the join key: then
both sides' bucket layouts satisfy the join's distribution requirement
and SortMergeJoin runs with zero Exchange. At 100 TB this converts the
dominant recurring shuffle into a one-time write cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ai_fabric_etl_spark.plans.inspect import exchange_count


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the join's
    Sort nodes."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def is_shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """True when joining the two (bucketed) tables on ``on`` plans no
    shuffle exchange — the bucketing-worked check."""
    joined = spark.table(left_table).join(spark.table(right_table), on)
    return exchange_count(joined) == 0
