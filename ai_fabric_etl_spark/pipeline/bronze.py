"""Bronze layer: distributed file ingestion + envelope validation.

Replaces the reference's driver-side file loop
(bronze_x12_ingestion.py:209-266) with a binaryFile scan: listing,
metadata, validation and envelope extraction all become executor-side
column expressions — file-granular parallelism, no driver bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_fabric_etl_spark.config import DEFAULT_CONFIG

MIN_FILE_LENGTH = 106
MAX_FILE_BYTES = DEFAULT_CONFIG.max_file_bytes  # 50MB cap (config/development.json:36)


def read_bronze(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*.{x12,edi,txt}",
    max_bytes: int = MAX_FILE_BYTES,
    min_mod_time: str | None = None,
) -> DataFrame:
    """Scan a landing directory into a validated bronze DataFrame.

    - directory scan + glob filter (S1)
    - size/age eligibility (S11's filter, as metadata predicates)
    - envelope validation as native column predicates (P11/U11):
      startswith ISA, min length, terminator count, required segments
    - ISA metadata extraction via split (no Python UDF)
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
    )
    df = raw.filter(F.col("length") <= max_bytes)
    if min_mod_time is not None:
        df = df.filter(F.col("modificationTime") >= F.lit(min_mod_time))

    content = F.decode(F.col("content"), "UTF-8")
    # elements of the first (ISA) segment; index 1-based via element_at,
    # position +1 because element 1 is the 'ISA' tag itself.
    isa = F.split(F.element_at(F.split(content, "~"), 1), r"\*")

    df = df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("length").alias("file_size"),
        content.alias("content"),
        F.trim(F.try_element_at(isa, F.lit(7))).alias("sender_id"),
        F.trim(F.try_element_at(isa, F.lit(9))).alias("receiver_id"),
        F.trim(F.try_element_at(isa, F.lit(10))).alias("interchange_date"),
        F.trim(F.try_element_at(isa, F.lit(14))).alias("interchange_control_number"),
        F.trim(F.try_element_at(isa, F.lit(16))).alias("usage_indicator"),
    )

    # segment presence = terminator-anchored "~SEG*" patterns, not raw
    # substring containment: bare contains('GS') matches the letters
    # inside any element value (a sender id 'WESTGS'), passing files
    # with no GS segment at all (r4 self-review). Whitespace after the
    # terminator is tolerated — split_segments strips \r/\n between
    # segments, so newline-separated files ("...~\nGS*...") are legal
    # and must pass these gates too (r4 second review pass).
    def _has_seg(seg: str):
        return content.rlike(f"~\\s*{seg}\\*")

    checks = [
        F.ltrim(content).startswith("ISA").alias("starts_with_isa"),
        (F.length(content) >= MIN_FILE_LENGTH).alias("min_length_ok"),
        (F.size(F.split(content, "~")) >= 5).alias("terminator_count_ok"),
        _has_seg("GS").alias("has_gs"),
        _has_seg("ST").alias("has_st"),
        _has_seg("SE").alias("has_se"),
        _has_seg("GE").alias("has_ge"),
        _has_seg("IEA").alias("has_iea"),
    ]
    df = df.select("*", *checks)
    valid = (
        F.col("starts_with_isa")
        & F.col("min_length_ok")
        & F.col("terminator_count_ok")
        & F.col("has_gs")
        & F.col("has_st")
        & F.col("has_se")
        & F.col("has_ge")
        & F.col("has_iea")
    )
    return df.withColumn("is_valid_x12", valid).withColumn(
        "ingest_date", F.to_date(F.col("modification_time"))
    )


def write_bronze(df: DataFrame, out_dir: str) -> None:
    """Date-partitioned bronze landing (replaces the year=/month=/day=
    dbutils.fs.cp layout, bronze_x12_ingestion.py:259-262)."""
    (
        df.write.mode("append")
        .partitionBy("ingest_date")
        .parquet(out_dir)
    )
