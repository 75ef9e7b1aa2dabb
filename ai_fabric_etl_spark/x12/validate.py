"""Transaction validation + quality scoring.

Canonical quality formula (silver_x12_parsing.py:1068-1073, chosen
over the two local-dev approximations per SURVEY §2.10):

    score    = max(0, 100 - 20 * issues - 5 * warnings)
    is_valid = score >= 50
"""

from __future__ import annotations

from ai_fabric_etl_spark.x12.segments import Segment

# required body segments per transaction type (behavioral parity with
# the per-type validators, silver_x12_parsing.py:1082-1323)
REQUIRED_SEGMENTS: dict[str, tuple[str, ...]] = {
    "837": ("BHT", "NM1", "CLM"),
    "835": ("BPR", "TRN"),
    "834": ("BGN", "INS"),
    "270": ("BHT", "HL"),
    "271": ("BHT",),
    "276": ("BHT", "TRN"),
    "277": ("BHT",),
    "278": ("BHT", "HL", "UM"),
    "279": ("BHT", "HL", "HCR"),
}


def validate_transaction(
    txn_type: str,
    segments: list[Segment],
    payload: dict,
    env,
) -> dict:
    """Per-type rule checks -> issues/warnings -> canonical score."""
    issues: list[str] = []
    warnings: list[str] = []
    present = {s.segment_id for s in segments}

    for req in REQUIRED_SEGMENTS.get(txn_type, ()):
        if req not in present:
            issues.append(f"missing required segment {req}")

    if not env.sender_id:
        warnings.append("missing sender id")
    if not env.receiver_id:
        warnings.append("missing receiver id")
    if not env.interchange_control_number:
        warnings.append("missing interchange control number")

    # SE01 segment-count integrity: count of segments in ST..SE inclusive
    se = next((s for s in segments if s.segment_id == "SE"), None)
    if se is not None:
        declared = se.el(0)
        if declared.isdigit() and int(declared) != len(segments):
            warnings.append(
                f"SE segment count {declared} != actual {len(segments)}"
            )

    # per-type semantic checks
    if txn_type == "837":
        if payload.get("claims") and payload.get("total_claim_amount", 0.0) <= 0:
            warnings.append("claim with non-positive total amount")
        if not payload.get("provider"):
            warnings.append("missing billing provider")
    elif txn_type == "835":
        if payload.get("payment_amount", 0.0) <= 0:
            warnings.append("non-positive payment amount")
    elif txn_type == "834":
        if payload.get("member_count", 0) == 0:
            warnings.append("enrollment with no members")
    elif txn_type == "270" and payload.get("inquiry_count", 0) == 0:
        warnings.append("inquiry with no EQ segments")
    elif txn_type == "279" and payload.get("review_count", 0) == 0:
        warnings.append("preauth response with no review results")
    elif txn_type not in REQUIRED_SEGMENTS:
        warnings.append(f"unsupported transaction type {txn_type}")

    score = max(0, 100 - 20 * len(issues) - 5 * len(warnings))
    return {
        "is_valid": score >= 50,
        "quality_score": score,
        "issues": issues,
        "warnings": warnings,
    }
