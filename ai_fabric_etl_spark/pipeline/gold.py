"""Gold layer: analytic data marts as native DataFrame ops.

Every mart from gold_x12_analytics.py:812-822 plus the two
promised-but-missing marts (eligibility + claim-status,
README.md:256-257 / UDFs U4-U5) and the business-KPI mart with the
:778 countDistinct-on-missing-column bug fixed.

The reference computes per-transaction metrics with row-at-a-time
Python UDFs over JSON strings (gold_x12_analytics.py:427-433 — the
slowest possible path); here the same numbers come from the typed
``parsed`` struct with explode+agg, staying inside whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = "parsed"

# Transaction identity: X12 ST02 control numbers are unique only within
# a functional group (GS), so per-transaction detail marts key on all
# three envelope levels (ADVICE r1 — the reference never surfaces
# functional_group_number in its marts, a documented deviation).
_TXN_KEYS = ("file_name", "functional_group_number",
             "transaction_set_control_number")


def _base(silver: DataFrame, start_date=None, end_date=None) -> DataFrame:
    """Lookback window + validity filter (gold_x12_analytics.py:72-74).
    Both predicates prune: processing_date is a partition column."""
    df = silver
    if start_date is not None:
        df = df.filter(F.col("processing_date") >= F.lit(start_date))
    if end_date is not None:
        df = df.filter(F.col("processing_date") <= F.lit(end_date))
    return df.filter(F.col("is_valid"))


def transaction_summary(silver: DataFrame, **w) -> DataFrame:
    """gold_transaction_summary (gold_x12_analytics.py:443-461)."""
    return (
        _base(silver, **w)
        .groupBy("processing_date", "transaction_type", "sender_id", "receiver_id")
        .agg(
            F.count(F.lit(1)).alias("transaction_count"),
            F.avg("quality_score").alias("average_quality_score"),
            F.min("processing_timestamp").alias("first_processed"),
            F.max("processing_timestamp").alias("last_processed"),
            F.countDistinct("interchange_control_number").alias("unique_interchanges"),
            F.countDistinct("file_name").alias("unique_files"),
        )
        .withColumn("created_at", F.current_timestamp())
    )


def claim_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_healthcare_claim_analytics (gold_x12_analytics.py:477-502).

    calculated_total comes from exploding service lines — the
    distributed replacement for U1's Python loop.
    """
    base = _base(silver, **w).filter(F.col("transaction_type") == "837")
    # per-transaction line rollup via explode (claims -> service_lines).
    # Transaction identity includes functional_group_number: ST02
    # control numbers are unique only within a GS group, so keying on
    # (file, set_control_number) alone can merge two transactions
    # (ADVICE r1).
    lines = base.select(
        *_TXN_KEYS,
        F.explode(F.col(f"{P}.claims")).alias("claim"),
    ).select(
        *_TXN_KEYS,
        F.explode_outer(F.col("claim.service_lines")).alias("line"),
    )
    calc = lines.groupBy(*_TXN_KEYS).agg(
        F.sum(F.coalesce(F.col("line.line_amount"), F.lit(0.0))).alias("calculated_total"),
        F.countDistinct("line.procedure").alias("unique_service_count"),
    )
    out = base.select(
        "processing_date",
        *_TXN_KEYS,
        "sender_id",
        "receiver_id",
        "quality_score",
        F.col(f"{P}.service_line_count").cast("int").alias("total_service_lines"),
        F.col(f"{P}.total_claim_amount").cast("double").alias("total_claim_amount"),
        F.col(f"{P}.provider.identifier").alias("provider_npi"),
    ).join(calc, list(_TXN_KEYS), "left")
    var = F.abs(F.col("total_claim_amount") - F.coalesce(F.col("calculated_total"), F.lit(0.0)))
    return (
        out.withColumn("calculated_total", F.coalesce(F.col("calculated_total"), F.lit(0.0)))
        .withColumn("unique_service_count", F.coalesce(F.col("unique_service_count"), F.lit(0)))
        .withColumn("amount_variance", var)
        .withColumn(
            "variance_percentage",
            F.when(
                F.col("calculated_total") > 0,
                var / F.col("calculated_total") * 100.0,
            ).otherwise(F.lit(0.0)),
        )
    )


def payment_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_healthcare_payment_analytics (gold_x12_analytics.py:518-545)."""
    base = _base(silver, **w).filter(F.col("transaction_type") == "835")
    df = base.select(
        "processing_date",
        *_TXN_KEYS,
        "sender_id",
        "receiver_id",
        F.col(f"{P}.claim_count").cast("int").alias("total_claims"),
        F.col(f"{P}.payment_amount").cast("double").alias("total_payment_amount"),
        F.col(f"{P}.total_charge_amount").cast("double").alias("total_charge_amount"),
        F.col(f"{P}.total_paid_amount").cast("double").alias("total_paid_amount"),
        F.col(f"{P}.total_patient_responsibility").cast("double").alias(
            "total_patient_responsibility"
        ),
        F.col(f"{P}.payer.name").alias("payer_name"),
        F.col(f"{P}.payer.id").alias("payer_id"),
    )
    return df.withColumn(
        "payment_variance",
        F.abs(F.col("total_payment_amount") - F.col("total_paid_amount")),
    ).withColumn(
        "payment_ratio",
        F.when(
            F.col("total_charge_amount") > 0,
            F.col("total_paid_amount") / F.col("total_charge_amount") * 100.0,
        ).otherwise(F.lit(0.0)),
    )


def enrollment_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_healthcare_enrollment_analytics (gold_x12_analytics.py:561-588)."""
    base = _base(silver, **w).filter(F.col("transaction_type") == "834")
    cov = (
        base.select(
            *_TXN_KEYS,
            F.explode(F.col(f"{P}.members")).alias("m"),
        )
        .select(
            *_TXN_KEYS,
            F.explode_outer(F.col("m.coverages")).alias("c"),
        )
        .groupBy(*_TXN_KEYS)
        .agg(F.countDistinct("c.coverage_type").alias("unique_coverage_types"))
    )
    df = base.select(
        "processing_date",
        *_TXN_KEYS,
        "sender_id",
        "receiver_id",
        F.col(f"{P}.member_count").cast("int").alias("total_members"),
        F.col(f"{P}.new_enrollments").cast("int").alias("new_enrollments"),
        F.col(f"{P}.terminations").cast("int").alias("terminations"),
        F.col(f"{P}.changes").cast("int").alias("changes"),
        F.col(f"{P}.sponsor.name").alias("sponsor_name"),
        F.col(f"{P}.sponsor.id").alias("sponsor_id"),
    ).join(cov, list(_TXN_KEYS), "left")
    return (
        df.withColumn("unique_coverage_types", F.coalesce(F.col("unique_coverage_types"), F.lit(0)))
        .withColumn(
            "enrollment_ratio",
            F.when(
                F.col("total_members") > 0,
                F.col("new_enrollments") * 100.0 / F.col("total_members"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "termination_ratio",
            F.when(
                F.col("total_members") > 0,
                F.col("terminations") * 100.0 / F.col("total_members"),
            ).otherwise(F.lit(0.0)),
        )
    )


def trading_partner_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_trading_partner_analytics (gold_x12_analytics.py:600-628):
    9 per-type conditional counts per partner pair."""
    base = _base(silver, **w)
    type_counts = [
        F.sum(F.when(F.col("transaction_type") == t, 1).otherwise(0)).alias(f"count_{t}")
        for t in ("837", "835", "834", "270", "271", "276", "277", "278", "279")
    ]
    return (
        base.groupBy("processing_date", "sender_id", "receiver_id")
        .agg(
            F.count(F.lit(1)).alias("total_transactions"),
            F.countDistinct("transaction_type").alias("unique_transaction_types"),
            F.avg("quality_score").alias("average_quality_score"),
            *type_counts,
            F.countDistinct("interchange_control_number").alias("unique_interchanges"),
            F.min("processing_timestamp").alias("first_transaction"),
            F.max("processing_timestamp").alias("last_transaction"),
        )
        .withColumn(
            "trading_partner_id",
            F.concat(F.col("sender_id"), F.lit("-"), F.col("receiver_id")),
        )
    )


def eligibility_analytics(silver: DataFrame, **w) -> DataFrame:
    """Eligibility mart (270/271) — promised by README.md:256 but never
    built in the reference (U4 registered, never applied). Wired here."""
    base = _base(silver, **w).filter(F.col("transaction_type").isin("270", "271"))
    return (
        base.groupBy("processing_date", "sender_id", "receiver_id")
        .agg(
            F.sum(F.when(F.col("transaction_type") == "270", 1).otherwise(0)).alias("inquiries"),
            F.sum(F.when(F.col("transaction_type") == "271", 1).otherwise(0)).alias("responses"),
            F.sum(F.coalesce(F.col(f"{P}.inquiry_count"), F.lit(0))).alias("total_inquiry_items"),
            F.sum(F.coalesce(F.col(f"{P}.benefit_count"), F.lit(0))).alias("total_benefits"),
            F.sum(
                F.when(F.coalesce(F.col(f"{P}.active_coverage"), F.lit(False)), 1).otherwise(0)
            ).alias("active_coverage_count"),
            F.avg("quality_score").alias("average_quality_score"),
        )
    )


def claim_status_analytics(silver: DataFrame, **w) -> DataFrame:
    """Claim-status mart (276/277) — promised by README.md:257, never
    built in the reference (U5 registered, never applied). Wired here.

    Grain is explicit (r4 self-review): requests AND responses are
    counted at TRANSACTION grain (one 276 = one request, one 277 = one
    response — comparable for request/response ratios), while
    ``status_responses`` counts the 277s' individual STC status lines
    and the amount sums aggregate over those lines. The old shape
    counted 276s per exploded row and responses per line, mixing
    grains in one ratio."""
    keys = ["processing_date", "sender_id", "receiver_id"]
    base = _base(silver, **w).filter(F.col("transaction_type").isin("276", "277"))
    tx = base.groupBy(*keys).agg(
        F.sum(F.when(F.col("transaction_type") == "276", 1).otherwise(0)).alias(
            "status_requests"
        ),
        F.sum(F.when(F.col("transaction_type") == "277", 1).otherwise(0)).alias(
            "response_transactions"
        ),
    )
    st = base.filter(F.col("transaction_type") == "277").select(
        *keys, F.explode_outer(F.col(f"{P}.claim_status")).alias("s")
    )
    ln = st.groupBy(*keys).agg(
        F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).alias("status_responses"),
        F.sum(F.coalesce(F.col("s.charge_amount"), F.lit(0.0))).alias("total_charge_amount"),
        F.sum(F.coalesce(F.col("s.paid_amount"), F.lit(0.0))).alias("total_paid_amount"),
    )
    return tx.join(ln, keys, "left").select(
        *keys,
        "status_requests",
        "response_transactions",
        F.coalesce(F.col("status_responses"), F.lit(0)).alias("status_responses"),
        F.coalesce(F.col("total_charge_amount"), F.lit(0.0)).alias("total_charge_amount"),
        F.coalesce(F.col("total_paid_amount"), F.lit(0.0)).alias("total_paid_amount"),
    )


def preauth_request_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_healthcare_preauth_request_analytics (gold_x12_analytics.py:644-671)."""
    base = _base(silver, **w).filter(F.col("transaction_type") == "278")
    return base.select(
        "processing_date",
        *_TXN_KEYS,
        "sender_id",
        "receiver_id",
        F.col(f"{P}.service_count").cast("int").alias("service_count"),
        F.col(f"{P}.total_requested_amount").cast("double").alias("total_requested_amount"),
        F.col(f"{P}.um.request_category").alias("request_category"),
    )


def preauth_response_analytics(silver: DataFrame, **w) -> DataFrame:
    """gold_healthcare_preauth_response_analytics
    (gold_x12_analytics.py:689-723): A1-A4/A6,CT,DJ/PA,PN buckets."""
    base = _base(silver, **w).filter(F.col("transaction_type") == "279")
    df = base.select(
        "processing_date",
        *_TXN_KEYS,
        "sender_id",
        "receiver_id",
        F.col(f"{P}.review_count").cast("int").alias("review_count"),
        F.col(f"{P}.approved_count").cast("int").alias("approved_count"),
        F.col(f"{P}.denied_count").cast("int").alias("denied_count"),
        F.col(f"{P}.pending_count").cast("int").alias("pending_count"),
    )
    return df.withColumn(
        "approval_rate",
        F.when(
            F.col("review_count") > 0,
            F.col("approved_count") * 100.0 / F.col("review_count"),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "denial_rate",
        F.when(
            F.col("review_count") > 0,
            F.col("denied_count") * 100.0 / F.col("review_count"),
        ).otherwise(F.lit(0.0)),
    )


def data_quality_metrics(silver: DataFrame, **w) -> DataFrame:
    """gold_data_quality_metrics (gold_x12_analytics.py:737-761):
    note — no is_valid filter; quality reporting covers invalid rows."""
    df = silver
    if w.get("start_date") is not None:
        df = df.filter(F.col("processing_date") >= F.lit(w["start_date"]))
    if w.get("end_date") is not None:
        df = df.filter(F.col("processing_date") <= F.lit(w["end_date"]))
    high = F.sum(F.when(F.col("quality_score") >= 90, 1).otherwise(0))
    med = F.sum(F.when((F.col("quality_score") >= 70) & (F.col("quality_score") < 90), 1).otherwise(0))
    low = F.sum(F.when(F.col("quality_score") < 70, 1).otherwise(0))
    cnt = F.count(F.lit(1))
    return df.groupBy("processing_date", "transaction_type").agg(
        cnt.alias("transaction_count"),
        F.avg("quality_score").alias("average_quality_score"),
        F.min("quality_score").alias("min_quality_score"),
        F.max("quality_score").alias("max_quality_score"),
        high.alias("high_quality_count"),
        med.alias("medium_quality_count"),
        low.alias("low_quality_count"),
        (high * 100.0 / cnt).alias("high_quality_percentage"),
        (med * 100.0 / cnt).alias("medium_quality_percentage"),
        (low * 100.0 / cnt).alias("low_quality_percentage"),
        F.countDistinct("file_name").alias("unique_files"),
        F.countDistinct("sender_id").alias("unique_senders"),
        F.countDistinct("receiver_id").alias("unique_receivers"),
    )


def business_kpis(silver: DataFrame, **w) -> DataFrame:
    """gold_business_kpis (gold_x12_analytics.py:773-796) with the
    :778 bug fixed: countDistinct over the concat *expression*."""
    base = _base(silver, **w)
    combo = F.concat(F.col("sender_id"), F.lit("-"), F.col("receiver_id"))
    return base.agg(
        F.count(F.lit(1)).alias("total_transactions"),
        F.countDistinct("file_name").alias("unique_files"),
        F.countDistinct("transaction_type").alias("unique_transaction_types"),
        F.countDistinct("sender_id").alias("unique_senders"),
        F.countDistinct("receiver_id").alias("unique_receivers"),
        F.countDistinct(combo).alias("unique_trading_partnerships"),
        F.avg("quality_score").alias("average_quality_score"),
        F.max("processing_timestamp").alias("last_processed"),
    )


ALL_MARTS = {
    "gold_transaction_summary": transaction_summary,
    "gold_healthcare_claim_analytics": claim_analytics,
    "gold_healthcare_payment_analytics": payment_analytics,
    "gold_healthcare_enrollment_analytics": enrollment_analytics,
    "gold_trading_partner_analytics": trading_partner_analytics,
    "gold_eligibility_analytics": eligibility_analytics,
    "gold_claim_status_analytics": claim_status_analytics,
    "gold_healthcare_preauth_request_analytics": preauth_request_analytics,
    "gold_healthcare_preauth_response_analytics": preauth_response_analytics,
    "gold_data_quality_metrics": data_quality_metrics,
    "gold_business_kpis": business_kpis,
}


def build_all_marts(silver_with_parsed_df: DataFrame, **w) -> dict[str, DataFrame]:
    """Build every mart from one cached silver scan.

    The reference re-reads silver 9+ times (eleven .count() actions,
    SURVEY §3.1 step 4); caching once removes the rescans.
    """
    silver_with_parsed_df.cache()
    return {name: fn(silver_with_parsed_df, **w) for name, fn in ALL_MARTS.items()}


def write_marts(marts: dict[str, DataFrame], out_dir: str) -> None:
    """S7: partitioned-overwrite mart sinks
    (gold_x12_analytics.py:458-461 et al. — mode("overwrite") +
    partitionBy("processing_date")). Marts without a processing_date
    column (global KPIs) are written unpartitioned. At scale, set
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` so a lookback
    recompute replaces only the touched date partitions."""
    for name, df in marts.items():
        writer = df.write.mode("overwrite")
        if "processing_date" in df.columns:
            writer = writer.partitionBy("processing_date")
        writer.parquet(f"{out_dir}/{name}")
