"""Running aggregates via foreachBatch keyed merge.

The reference maintains running totals with a Postgres upsert:
``ON CONFLICT (processing_date, transaction_type) DO UPDATE SET
transaction_count = transaction_count + EXCLUDED.transaction_count,
avg_quality_score = (avg_quality_score + EXCLUDED.avg_quality_score)/2``
(local-development/process_test_data.py:112-148). The ``(a+b)/2`` is
wrong — it weights the last batch at 50% regardless of size. Here the
state carries the *partials* (count, exact score sum), so the mean is
always the exact weighted mean (documented deviation, SURVEY §7.3
risk 2).

State layout: versioned parquet (``state_dir/v=N/`` + a ``_LATEST``
pointer swapped with os.replace) — an ACID-light stand-in for what is
one ``MERGE INTO`` statement on Delta/Iceberg in production. The merge
itself is union + re-aggregate over partial sums: associative, so it
needs no join, and at 100 TB the state table stays
keys-cardinality-sized (dates x types), never events-sized.

Replays are idempotent: foreachBatch epoch ids are recorded in the
pointer and already-applied epochs are skipped — the exactly-once
contract the reference approximates by moving files to archive/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_KEYS = ["processing_date", "transaction_type"]


def _pointer(state_dir: str) -> tuple[int, int]:
    """(version, last_epoch); (-1, -1) if no state yet."""
    try:
        with open(os.path.join(state_dir, "_LATEST"), encoding="utf-8") as fh:
            v, e = fh.read().split(",")
            return int(v), int(e)
    except FileNotFoundError:
        return -1, -1


def _swap_pointer(state_dir: str, version: int, epoch: int) -> None:
    tmp = os.path.join(state_dir, "_LATEST.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"{version},{epoch}")
    os.replace(tmp, os.path.join(state_dir, "_LATEST"))


def _partials(silver_batch: DataFrame) -> DataFrame:
    return silver_batch.groupBy(*_KEYS).agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.sum(F.col("quality_score").cast("decimal(18,4)")).alias("score_sum"),
    )


def merge_running_totals(
    spark: SparkSession, silver_batch: DataFrame, state_dir: str, epoch_id: int
) -> None:
    """One foreachBatch merge. Also callable directly from batch jobs."""
    version, last_epoch = _pointer(state_dir)
    if epoch_id <= last_epoch:
        return  # replayed epoch after restart — already merged
    batch = _partials(silver_batch)
    if version >= 0:
        state = spark.read.parquet(os.path.join(state_dir, f"v={version}"))
        batch = (
            state.unionByName(batch)
            .groupBy(*_KEYS)
            .agg(
                F.sum("transaction_count").alias("transaction_count"),
                F.sum("score_sum").alias("score_sum"),
            )
        )
    os.makedirs(state_dir, exist_ok=True)
    batch.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={version + 1}"))
    _swap_pointer(state_dir, version + 1, epoch_id)


def read_running_totals(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current totals with the exact weighted mean materialized."""
    version, _ = _pointer(state_dir)
    if version < 0:
        raise FileNotFoundError(f"no running-totals state at {state_dir}")
    df = spark.read.parquet(os.path.join(state_dir, f"v={version}"))
    return df.select(
        *_KEYS,
        "transaction_count",
        (F.col("score_sum").cast("double") / F.col("transaction_count")).alias(
            "avg_quality_score"
        ),
    )


def start_running_totals(
    silver_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the merge to a streaming silver DataFrame."""

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_running_totals(batch_df.sparkSession, batch_df, state_dir, epoch_id)

    writer = (
        silver_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
