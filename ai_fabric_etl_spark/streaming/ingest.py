"""Streaming X12 ingest: landing directory -> silver, exactly once.

Replaces the reference's scheduled poll (x12_processing_dag.py:28 — a
15-minute Airflow cadence that lists the directory, processes, then
moves files to an archive/ dir to avoid reprocessing,
x12_processing_dag.py:40-50,250-270). The Structured Streaming file
source tracks seen files in the checkpoint, so the archive-move
disappears and a crashed batch replays exactly once (SURVEY §7.3
risk 7).

Scale notes (100 TB): the file source lists the directory per trigger;
at large file counts set ``maxFilesPerTrigger`` (the reference's
``batch_size: 100`` — config/development.json:35) and land files in
date-partitioned subdirs so listing stays bounded. Parsing parallelism
is file-granular via the same mapInPandas operator as batch — one
task per file split, no driver loop.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.config import DEFAULT_CONFIG
from ai_fabric_etl_spark.pipeline.silver import parse_to_silver


def stream_bronze(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*.{x12,edi,txt}",
    max_files_per_trigger: int | None = DEFAULT_CONFIG.batch_size,
) -> DataFrame:
    """Streaming (file_name, content) over a landing directory.

    ``text`` + ``wholetext`` keeps each X12 file intact in one row —
    files are never split across tasks, which the order-dependent
    ST..SE grouping requires (silver_x12_parsing.py:1417-1436).
    """
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(input_dir)
    return raw.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"),
        F.col("value").alias("content"),
    )


def start_silver_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    batch_id: str = "stream",
    now: datetime | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Landing dir -> parsed silver parquet, checkpointed.

    ``availableNow`` drains everything currently in the directory and
    stops — the batch-cadence compat mode. With it False the query
    runs continuously (the reference's "real-time" enterprise scenario,
    docs/cost-estimation-guide.md:155-170).
    """
    files = stream_bronze(spark, input_dir)
    silver = parse_to_silver(files, batch_id=batch_id, now=now)
    writer = (
        silver.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("processing_date", "transaction_type")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
