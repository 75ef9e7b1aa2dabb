"""X12 pipeline entries for the driver contract.

These exercise the engine's core domain capability (distributed X12
parse -> silver -> gold marts -> 997 acks) on the deterministic
in-repo corpus. Not SQL-expressible over the driver's parquet views,
so they are registered WITHOUT oracle_sql (rows-only check); full
semantic coverage lives in tests/test_pipeline.py.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from ai_fabric_etl_spark.pipeline import gold
from ai_fabric_etl_spark.pipeline.silver import parse_to_silver, silver_with_parsed
from ai_fabric_etl_spark.queries.catalog import register
from ai_fabric_etl_spark.x12.testgen import generate_corpus

_NOW = datetime(2025, 1, 2, 12, 0, 0)  # fixed clock for determinism


def _silver(spark: SparkSession) -> DataFrame:
    files = spark.createDataFrame(generate_corpus(), ["file_name", "content"])
    # modest corpus: keep it in a few partitions rather than 32 empty ones
    return silver_with_parsed(
        parse_to_silver(files.repartition(4), batch_id="entry", now=_NOW)
    )


@register("x12_silver_transactions")
def x12_silver_transactions(spark, sf_dir):
    """U9: the file->transaction-rows UDTF via mapInPandas."""
    return _silver(spark).drop("parsed")


@register("x12_gold_transaction_summary")
def x12_gold_transaction_summary(spark, sf_dir):
    """A1 on real X12: gold_transaction_summary over parsed silver."""
    return gold.transaction_summary(_silver(spark)).drop("created_at")


@register("x12_gold_claim_analytics")
def x12_gold_claim_analytics(spark, sf_dir):
    """U1 on real X12: explode service_lines -> per-claim variance."""
    return gold.claim_analytics(_silver(spark))


@register("x12_gold_business_kpis")
def x12_gold_business_kpis(spark, sf_dir):
    """A4 on real X12, with the reference's :778 bug fixed."""
    return gold.business_kpis(_silver(spark))


@register("x12_ack_997")
def x12_ack_997(spark, sf_dir):
    """U8/A6: 997 ack generation (collect_list + templating UDF)."""
    from ai_fabric_etl_spark.x12.ack997 import generate_acks

    return generate_acks(_silver(spark)).drop("control_numbers")


@register("x12_view_daily_summary")
def x12_view_daily_summary(spark, sf_dir):
    """A8: SQL view dialect — v_daily_processing_summary
    (init.sql:150-160) over parsed silver via spark.sql."""
    from ai_fabric_etl_spark.pipeline.views import register_views

    register_views(spark, _silver(spark).drop("parsed"))
    return spark.sql("SELECT * FROM v_daily_processing_summary")


@register("x12_view_type_breakdown")
def x12_view_type_breakdown(spark, sf_dir):
    """A8/O1: v_transaction_type_breakdown (init.sql:162-172) with its
    ORDER BY file_count DESC."""
    from ai_fabric_etl_spark.pipeline.views import register_views

    register_views(spark, _silver(spark).drop("parsed"))
    return spark.sql("SELECT * FROM v_transaction_type_breakdown")


def _mart_entry(mart_fn):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return mart_fn(_silver(spark))

    return q


# the rest of the 11-mart gold layer (SURVEY §2.4 A2/A3, §2.10 U2-U7),
# including the two marts the reference promised but never built
# (eligibility, claim_status — README.md:256-257)
for _name, _fn in (
    ("x12_gold_payment_analytics", gold.payment_analytics),  # U2
    ("x12_gold_enrollment_analytics", gold.enrollment_analytics),  # U3
    ("x12_gold_trading_partner_analytics", gold.trading_partner_analytics),  # A2
    ("x12_gold_eligibility_analytics", gold.eligibility_analytics),  # U4
    ("x12_gold_claim_status_analytics", gold.claim_status_analytics),  # U5
    ("x12_gold_preauth_request_analytics", gold.preauth_request_analytics),  # U6
    ("x12_gold_preauth_response_analytics", gold.preauth_response_analytics),  # U7
    ("x12_gold_data_quality_metrics", gold.data_quality_metrics),  # A3
):
    register(_name)(_mart_entry(_fn))
