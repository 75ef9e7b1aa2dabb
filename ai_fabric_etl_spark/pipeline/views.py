"""Spark SQL views mirroring the reference's Postgres monitoring views
(local-development/sql/init.sql:150-186) over the engine's silver
table — the second query dialect (SURVEY §3.2): everything reachable
through the DataFrame API is also reachable through ``spark.sql``.

Deviations (documented): the reference bands quality >80 / 50-80 / <50
here but >=90 / 70-89 / <70 in the gold mart (gold_x12_analytics.py:
742-744); each view keeps its own source's bands, as the reference
does. ``CURRENT_DATE`` predicates are parameterized (``as_of``) so
results are deterministic for golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(
    spark: SparkSession,
    silver: DataFrame,
    bronze: DataFrame | None = None,
    as_of: str | None = None,
) -> list[str]:
    """Create the v_* temp views; returns the view names.

    ``as_of`` is validated as an ISO date and re-emitted canonically
    before interpolation — it is spliced into SQL text, and an
    arbitrary string (from a job config, say) must not be able to
    inject clauses into the view definitions."""
    if as_of is not None:
        import datetime as _dt

        as_of = _dt.date.fromisoformat(str(as_of)).isoformat()
    silver.createOrReplaceTempView("silver_x12_transactions_v")
    created = ["v_daily_processing_summary", "v_transaction_type_breakdown"]
    day_filter = (
        f"WHERE CAST(processing_timestamp AS DATE) = DATE'{as_of}'" if as_of else ""
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW v_daily_processing_summary AS
        SELECT processing_date,
               COUNT(*) AS total_files,
               AVG(quality_score) AS avg_quality_score,
               COUNT(CASE WHEN quality_score > 80 THEN 1 END) AS high_quality_files,
               COUNT(CASE WHEN quality_score BETWEEN 50 AND 80 THEN 1 END) AS medium_quality_files,
               COUNT(CASE WHEN quality_score < 50 THEN 1 END) AS low_quality_files
        FROM silver_x12_transactions_v
        {day_filter}
        GROUP BY processing_date
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_transaction_type_breakdown AS
        SELECT transaction_type,
               COUNT(*) AS file_count,
               AVG(quality_score) AS avg_quality_score,
               MIN(processing_timestamp) AS first_processed,
               MAX(processing_timestamp) AS last_processed
        FROM silver_x12_transactions_v
        GROUP BY transaction_type
        ORDER BY file_count DESC
        """
    )
    if bronze is not None:
        bronze.createOrReplaceTempView("bronze_x12_v")
        recent_filter = (
            f"WHERE b.modification_time >= DATE'{as_of}' - INTERVAL '7' DAY"
            if as_of
            else "WHERE b.modification_time >= current_date() - INTERVAL '7' DAY"
        )
        spark.sql(
            f"""
            CREATE OR REPLACE TEMPORARY VIEW v_recent_processing_activity AS
            SELECT b.file_name,
                   b.file_size,
                   b.modification_time AS bronze_timestamp,
                   s.transaction_type,
                   s.quality_score,
                   s.processing_timestamp AS silver_timestamp,
                   unix_timestamp(s.processing_timestamp)
                     - unix_timestamp(b.modification_time) AS processing_duration_seconds
            FROM bronze_x12_v b
            LEFT JOIN silver_x12_transactions_v s ON b.file_name = s.file_name
            {recent_filter}
            ORDER BY b.modification_time DESC
            """
        )
        created.append("v_recent_processing_activity")
    return created
