"""Engine schemas: the silver transaction table and the typed parsed
payload (replacing the reference's free-form JSON string column with a
Catalyst-prunable nested struct; parsed_data JSON kept for compat).

Silver column set matches silver_x12_parsing.py:1333-1349 exactly.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SILVER_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("file_name", StringType()),
        StructField("processing_timestamp", TimestampType()),
        StructField("interchange_control_number", StringType()),
        StructField("functional_group_number", StringType()),
        StructField("transaction_set_control_number", StringType()),
        StructField("transaction_type", StringType()),
        StructField("sender_id", StringType()),
        StructField("receiver_id", StringType()),
        StructField("transaction_date", StringType()),
        StructField("parsed_data", StringType()),
        StructField("validation_results", StringType()),
        StructField("quality_score", IntegerType()),
        StructField("is_valid", BooleanType()),
        StructField("processing_date", DateType()),
    ]
)


def _entity() -> StructType:
    return StructType(
        [
            StructField("id_qualifier", StringType()),
            StructField("name", StringType()),
            StructField("last_name", StringType()),
            StructField("first_name", StringType()),
            StructField("identifier", StringType()),
            StructField("id", StringType()),
        ]
    )


_SERVICE_LINE = StructType(
    [
        StructField("procedure", StringType()),
        StructField("line_amount", DoubleType()),
        StructField("unit_type", StringType()),
        StructField("units", DoubleType()),
        StructField("service_date", StringType()),
    ]
)

_PAID_SERVICE = StructType(
    [
        StructField("procedure", StringType()),
        StructField("charge_amount", DoubleType()),
        StructField("paid_amount", DoubleType()),
        StructField("quantity", DoubleType()),
    ]
)

_CLAIM = StructType(
    [
        StructField("claim_id", StringType()),
        StructField("total_claim_amount", DoubleType()),
        StructField("facility_code", StringType()),
        StructField("status_code", StringType()),
        StructField("charge_amount", DoubleType()),
        StructField("paid_amount", DoubleType()),
        StructField("patient_responsibility", DoubleType()),
        StructField("service_lines", ArrayType(_SERVICE_LINE)),
        StructField("services", ArrayType(_PAID_SERVICE)),
    ]
)

_MEMBER = StructType(
    [
        StructField("subscriber_indicator", StringType()),
        StructField("relationship_code", StringType()),
        StructField("maintenance_code", StringType()),
        StructField("member_id", StringType()),
        StructField("name", StringType()),
        StructField(
            "coverages",
            ArrayType(
                StructType(
                    [
                        StructField("maintenance_code", StringType()),
                        StructField("coverage_type", StringType()),
                        StructField("plan_description", StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Union payload struct: per-type sub-fields are simply null for other
# types; nested-schema pruning means a mart reading only
# parsed.claims never materializes the rest.
PARSED_SCHEMA = StructType(
    [
        StructField("claims", ArrayType(_CLAIM)),
        StructField("total_claim_amount", DoubleType()),
        StructField("service_line_count", IntegerType()),
        StructField("claim_count", IntegerType()),
        StructField("payment_amount", DoubleType()),
        StructField("payment_method", StringType()),
        StructField("payment_date", StringType()),
        StructField("total_charge_amount", DoubleType()),
        StructField("total_paid_amount", DoubleType()),
        StructField("total_patient_responsibility", DoubleType()),
        StructField("members", ArrayType(_MEMBER)),
        StructField("member_count", IntegerType()),
        StructField("new_enrollments", IntegerType()),
        StructField("terminations", IntegerType()),
        StructField("changes", IntegerType()),
        StructField("sponsor", _entity()),
        StructField("payer", _entity()),
        StructField("payee", _entity()),
        StructField("provider", _entity()),
        StructField("subscriber", _entity()),
        StructField("patient", _entity()),
        StructField(
            "inquiries",
            ArrayType(StructType([StructField("service_type_code", StringType())])),
        ),
        StructField("inquiry_count", IntegerType()),
        StructField(
            "benefits",
            ArrayType(
                StructType(
                    [
                        StructField("eligibility_code", StringType()),
                        StructField("coverage_level", StringType()),
                        StructField("service_type", StringType()),
                        StructField("insurance_type", StringType()),
                        StructField("amount", DoubleType()),
                        StructField("percent", DoubleType()),
                    ]
                )
            ),
        ),
        StructField("benefit_count", IntegerType()),
        StructField("active_coverage", BooleanType()),
        StructField(
            "claim_status",
            ArrayType(
                StructType(
                    [
                        StructField("status_info", StringType()),
                        StructField("status_date", StringType()),
                        StructField("action_code", StringType()),
                        StructField("charge_amount", DoubleType()),
                        StructField("paid_amount", DoubleType()),
                    ]
                )
            ),
        ),
        StructField("status_count", IntegerType()),
        StructField(
            "services",
            ArrayType(
                StructType(
                    [
                        StructField("procedure", StringType()),
                        StructField("amount", DoubleType()),
                        StructField("units", DoubleType()),
                    ]
                )
            ),
        ),
        StructField("service_count", IntegerType()),
        StructField("total_requested_amount", DoubleType()),
        StructField(
            "um",
            StructType(
                [
                    StructField("request_category", StringType()),
                    StructField("certification_type", StringType()),
                    StructField("service_type", StringType()),
                ]
            ),
        ),
        StructField(
            "review_results",
            ArrayType(
                StructType(
                    [
                        StructField("action_code", StringType()),
                        StructField("reference_id", StringType()),
                        StructField("decision", StringType()),
                    ]
                )
            ),
        ),
        StructField("review_count", IntegerType()),
        StructField("approved_count", IntegerType()),
        StructField("denied_count", IntegerType()),
        StructField("pending_count", IntegerType()),
        StructField("trace_number", StringType()),
        StructField("reference_id", StringType()),
    ]
)
