"""Streaming gold: keep the mart layer fresh as silver rows stream in.

Two modes, mirroring how the reference actually behaves vs what an
engine should do:

- ``start_gold_lookback_refresh`` — the compat mode: every micro-batch
  triggers a full recompute of the marts over a lookback window of the
  accumulated silver table, exactly the reference's scheduled gold
  notebook (gold_x12_analytics.py:39,65-68 — recompute over
  ``lookback_days``) but triggered by data arrival instead of a
  15-minute cron. Correct for every mart regardless of algebra;
  cost = full lookback scan per refresh (bounded by partition pruning
  on processing_date).

- ``start_gold_incremental_summary`` — the engine mode for algebraic
  marts: the batch's rows fold into per-key partials (count, decimal
  sums, min/max) merged via ParquetMergeTable, so each refresh costs
  O(batch + |keys|), never a rescan. The summary mart's avg/min/max
  all decompose; countDistinct does not (documented: the incremental
  summary carries exact counts/sums and approximate distincts would
  slot in via HLL sketches at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.pipeline.gold import build_all_marts, write_marts
from ai_fabric_etl_spark.pipeline.silver import silver_with_parsed

_KEYS = ["processing_date", "transaction_type", "sender_id", "receiver_id"]


def start_gold_lookback_refresh(
    silver_stream: DataFrame,
    silver_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Append the stream to silver, then rebuild marts from the
    accumulated table each micro-batch (reference-compatible
    recompute semantics)."""

    def refresh(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        (
            batch_df.write.mode("append")
            .partitionBy("processing_date", "transaction_type")
            .parquet(silver_dir)
        )
        silver = silver_with_parsed(spark.read.parquet(silver_dir))
        write_marts(build_all_marts(silver), gold_dir)

    writer = (
        silver_stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _summary_partials(silver_batch: DataFrame) -> DataFrame:
    return silver_batch.groupBy(*_KEYS).agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.sum(F.col("quality_score").cast("decimal(18,4)")).alias("score_sum"),
        F.min("processing_timestamp").alias("first_processed"),
        F.max("processing_timestamp").alias("last_processed"),
    )


def merge_summary_batch(
    spark: SparkSession, silver_batch: DataFrame, state_path: str
) -> None:
    """Fold one batch into the incremental summary-mart partials."""
    table = ParquetMergeTable(spark, state_path)
    batch = _summary_partials(silver_batch)
    if not table.exists():
        table.overwrite(batch)
        return
    prev = table.read()
    merged = (
        prev.unionByName(batch)
        .groupBy(*_KEYS)
        .agg(
            F.sum("transaction_count").alias("transaction_count"),
            F.sum("score_sum").alias("score_sum"),
            F.min("first_processed").alias("first_processed"),
            F.max("last_processed").alias("last_processed"),
        )
    )
    table.overwrite(merged)


def read_incremental_summary(spark: SparkSession, state_path: str) -> DataFrame:
    """The summary mart view over the partials (exact weighted avg)."""
    t = ParquetMergeTable(spark, state_path).read()
    return t.select(
        *_KEYS,
        "transaction_count",
        (F.col("score_sum").cast("double") / F.col("transaction_count")).alias(
            "average_quality_score"
        ),
        "first_processed",
        "last_processed",
    )


def start_gold_incremental_summary(
    silver_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        merge_summary_batch(batch_df.sparkSession, batch_df, state_path)

    writer = (
        silver_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
