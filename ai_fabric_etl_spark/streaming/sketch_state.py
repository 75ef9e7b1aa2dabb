"""Streaming sketch state: mergeable quantile summaries maintained
per micro-batch — the streaming face of ``operators/sketches``.

Running percentiles ("p95 quality score so far, per transaction
type") cannot be a Structured Streaming built-in aggregate: exact
percentiles need every value, and the state would grow with the
stream. The mergeable-summary pattern bounds it: each micro-batch
folds into Munro–Paterson partials (``quantile_partials``), the state
table keeps at most k·log₂(n/k) rows per group (``quantile_compress``
after each union), and any read materializes estimates with
``quantile_values`` — state is kilobytes per group forever, the same
discipline as the HLL/MG partials in the gold incremental marts
(streaming/gold_stream.py).

Exactly-once: epoch ids ride the state-table pointer scoped to the
checkpoint identity (Delta txnAppId style, identical to
running_aggs.py) — replayed foreachBatch epochs are skipped, and the
exact regime (k ≥ stream size) makes replay idempotence literally
bit-testable (stream result == batch quantile_disc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.operators.sketches import (
    quantile_compress,
    quantile_partials,
    quantile_values,
)


def merge_quantile_state(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    col: str,
    by: list[str],
    k: int = 256,
    app_id: str | None = None,
) -> None:
    """Fold one micro-batch into the quantile state table. Also
    callable from batch jobs (backfills use the same state)."""
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return  # replayed epoch — already folded
    parts = quantile_partials(batch, col, by, k=k)
    if table.exists():
        parts = quantile_compress(
            table.read().unionByName(parts), by, k=k
        )
    table.overwrite(parts, epoch=epoch_id, app_id=app_id)


def read_quantiles(
    spark: SparkSession,
    state_dir: str,
    by: list[str],
    qs: dict[str, float],
) -> DataFrame:
    """Current quantile estimates from the persisted partials — no
    base-data scan, ever."""
    return quantile_values(
        ParquetMergeTable(spark, state_dir).read(), by, qs
    )


def start_quantile_state(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
    by: list[str],
    k: int = 256,
) -> StreamingQuery:
    """Wire the fold into foreachBatch with availableNow semantics
    (same trigger discipline as streaming/running_aggs)."""
    spark = stream_df.sparkSession
    app_id = f"quantile_state:{checkpoint_dir}"

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_quantile_state(
            spark, batch_df, state_dir, epoch_id, col, by, k=k, app_id=app_id
        )

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "merge_quantile_state",
    "read_quantiles",
    "start_quantile_state",
    "merge_heavy_hitters_state",
    "read_heavy_hitters",
]


def merge_heavy_hitters_state(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    col: str,
    k: int = 64,
    app_id: str | None = None,
) -> None:
    """Fold one micro-batch into a Misra–Gries heavy-hitter state
    table: batch partials merge by summation, then one k-counter
    decrement re-bounds the state (Agarwal et al. mergeable-summaries
    — the undercount bounds ADD across merges, so the streaming
    state keeps the same guarantees as the batch sketch). State is
    ≤ k rows forever; when the stream's distinct values never exceed
    k the counts stay EXACT (stream == batch groupBy, tested)."""
    from ai_fabric_etl_spark.operators.sketches import misra_gries_partials

    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return
    parts = misra_gries_partials(batch, col, k=k)
    if table.exists():
        parts = table.read().unionByName(parts)
    summed = parts.groupBy(col).agg(F.sum("mg_count").alias("mg_count"))
    # k-counter decrement only when over budget (state is tiny: the
    # limit/collect touches at most k + k*partitions rows)
    if summed.count() > k:
        thr = (
            summed.orderBy(F.col("mg_count").desc())
            .limit(k + 1)
            .agg(F.min("mg_count"))
            .collect()[0][0]
        )
        summed = summed.select(
            col, (F.col("mg_count") - F.lit(thr)).alias("mg_count")
        ).filter(F.col("mg_count") > 0)
    table.overwrite(summed, epoch=epoch_id, app_id=app_id)


def read_heavy_hitters(
    spark: SparkSession, state_dir: str, min_count: int = 1
) -> DataFrame:
    """Current heavy-hitter summary (lower-bound counts), heaviest
    first."""
    t = ParquetMergeTable(spark, state_dir).read()
    return t.filter(F.col("mg_count") >= min_count).orderBy(
        F.col("mg_count").desc(), t.columns[0]
    )
