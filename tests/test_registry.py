"""Schema-registry -> StructType generation tests (M0).

Uses an inline registry in the reference's
x12_transaction_schemas.json format (format mirrored, content ours).
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import DateType, DecimalType, IntegerType, StringType

from ai_fabric_etl_spark.x12 import registry as reg

REGISTRY = {
    "837": {
        "name": "Health Care Claim",
        "required_segments": ["ST", "BHT", "CLM", "SE"],
        "segments": {
            "CLM": {
                "name": "Claim Information",
                "elements": [
                    {"position": 1, "name": "Claim Submitter Identifier", "type": "string", "required": True},
                    {"position": 2, "name": "Monetary Amount", "type": "decimal", "required": True},
                    {"position": 5, "name": "Facility Code Value", "type": "string", "required": False},
                ],
            },
            "DTP": {
                "name": "Date or Time Period",
                "elements": [
                    {"position": 1, "name": "Date Time Qualifier", "type": "string", "required": True},
                    {"position": 3, "name": "Service Date", "type": "date", "required": False},
                ],
            },
            "SV1": {
                "name": "Professional Service",
                "elements": [
                    {"position": 4, "name": "Service Unit Count", "type": "integer", "required": False},
                ],
            },
        },
    }
}


def test_struct_generation_types():
    structs = reg.transaction_structs(REGISTRY, "837")
    clm = structs["CLM"]
    assert [f.name for f in clm.fields] == [
        "claim_submitter_identifier",
        "monetary_amount",
        "facility_code_value",
    ]
    assert isinstance(clm["monetary_amount"].dataType, DecimalType)
    assert isinstance(structs["DTP"]["service_date"].dataType, DateType)
    assert isinstance(structs["SV1"]["service_unit_count"].dataType, IntegerType)
    assert isinstance(clm["claim_submitter_identifier"].dataType, StringType)


def test_typed_segment_extraction(spark):
    df = spark.createDataFrame(
        [
            (["CLM001", "1500.50", "x", "y", "11"],),
            (["CLM002", "", "x"],),  # empty decimal -> 0.00 (reference guard)
            (["CLM003", "notanumber"],),  # malformed -> NULL (not a fake zero)
        ],
        "elements array<string>",
    )
    out = df.select(
        reg.typed_segment(F.col("elements"), REGISTRY["837"]["segments"]["CLM"]).alias("s")
    ).select("s.*")
    rows = out.collect()
    assert [str(r.monetary_amount) for r in rows] == ["1500.50", "0.00", "None"]
    assert rows[0].facility_code_value == "11"
    assert rows[1].facility_code_value is None  # out of bounds -> null


def test_typed_segment_date(spark):
    df = spark.createDataFrame([(["472", "x", "20240315"],)], "elements array<string>")
    out = df.select(
        reg.typed_segment(F.col("elements"), REGISTRY["837"]["segments"]["DTP"]).alias("s")
    )
    assert out.collect()[0].s.service_date == datetime.date(2024, 3, 15)


def test_missing_required_segments(spark):
    df = spark.createDataFrame(
        [(["ST", "BHT", "CLM", "SE"],), (["ST", "SE"],)], "segs array<string>"
    )
    req = reg.required_segments(REGISTRY, "837")
    out = df.select(reg.missing_required_segments(F.col("segs"), req).alias("m"))
    got = [r.m for r in out.collect()]
    assert got[0] == []
    assert sorted(got[1]) == ["BHT", "CLM"]
