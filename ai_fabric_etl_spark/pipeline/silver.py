"""Silver layer: distributed X12 parsing via mapInPandas.

The reference parses every file in a driver for-loop and only touches
executors at the final createDataFrame (silver_x12_parsing.py:1388,
:1501). Here the parse itself is the distributed operator: each task
parses its partition of files with Arrow-batched pandas exchange —
the single biggest architectural fix (SURVEY §3.1, §4 parallelism).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_fabric_etl_spark.schemas import PARSED_SCHEMA, SILVER_SCHEMA
from ai_fabric_etl_spark.x12.parsers import parse_x12_file

_SILVER_COLS = [f.name for f in SILVER_SCHEMA.fields]


def parse_to_silver(
    files_df: DataFrame,
    batch_id: str = "batch-0",
    now: datetime | None = None,
) -> DataFrame:
    """(file_name, content) -> one silver row per ST..SE set.

    ``now`` injectable for deterministic golden-output tests.
    Files are never split across tasks, so the order-dependent
    ST..SE/current-claim accumulation is safe (SURVEY §7.3 risk 1).
    """

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for file_name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    rows.extend(
                        parse_x12_file(file_name, content, batch_id=batch_id, now=now)
                    )
                except Exception:  # noqa: BLE001 - a corrupt file must not kill the batch
                    continue
            if rows:
                yield pd.DataFrame(rows, columns=_SILVER_COLS)

    return files_df.select("file_name", "content").mapInPandas(
        parse_batch, schema=SILVER_SCHEMA
    )


def silver_with_parsed(silver_df: DataFrame) -> DataFrame:
    """Attach the typed payload struct: from_json is JVM-side, so the
    JSON decode happens once, inside codegen, not in Python."""
    return silver_df.withColumn("parsed", F.from_json("parsed_data", PARSED_SCHEMA))


def write_silver(silver_df: DataFrame, out_dir: str) -> None:
    """Partitioned append (silver_x12_parsing.py:1506-1510 semantics).

    Partitioning by (processing_date, transaction_type) gives static +
    dynamic partition pruning to every gold mart query.
    """
    (
        silver_df.write.mode("append")
        .partitionBy("processing_date", "transaction_type")
        .parquet(out_dir)
    )
