"""Envelope (ISA/GS/ST..SE/GE/IEA) metadata + file-level validation.

Behavioral parity targets (citations into /root/reference/):
- metadata fields: bronze_x12_ingestion.py:63-146
- file validation rules: bronze_x12_ingestion.py:150-198
- envelope element positions: silver_x12_parsing.py:103-152
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ai_fabric_etl_spark.x12.segments import Segment, split_segments

MIN_FILE_LENGTH = 106  # a bare ISA segment is 106 chars


@dataclass
class EnvelopeMetadata:
    sender_qualifier: str = ""
    sender_id: str = ""
    receiver_qualifier: str = ""
    receiver_id: str = ""
    interchange_date: str = ""  # YYMMDD
    interchange_time: str = ""  # HHMM
    interchange_control_number: str = ""
    usage_indicator: str = ""  # T=test, P=production
    functional_groups: list[dict] = field(default_factory=list)
    transaction_types: list[str] = field(default_factory=list)
    transaction_count: int = 0


def extract_envelope_metadata(segments: list[Segment]) -> EnvelopeMetadata:
    """ISA/GS/ST positional extraction (positions per FIXTURES.md §1:
    ISA[4]=sender qual, [5]=sender, [7]=receiver, [8]=date, [9]=time,
    [12]=icn, [14]=usage; GS[0]=functional code, [5]=gcn;
    ST[0]=type, [1]=tscn)."""
    meta = EnvelopeMetadata()
    for seg in segments:
        if seg.segment_id == "ISA":
            meta.sender_qualifier = seg.el(4).strip()
            meta.sender_id = seg.el(5).strip()
            meta.receiver_qualifier = seg.el(6).strip()
            meta.receiver_id = seg.el(7).strip()
            meta.interchange_date = seg.el(8).strip()
            meta.interchange_time = seg.el(9).strip()
            meta.interchange_control_number = seg.el(12).strip()
            meta.usage_indicator = seg.el(14).strip()
        elif seg.segment_id == "GS":
            meta.functional_groups.append(
                {
                    "functional_code": seg.el(0),
                    "application_sender": seg.el(1),
                    "application_receiver": seg.el(2),
                    "date": seg.el(3),
                    "time": seg.el(4),
                    "group_control_number": seg.el(5),
                }
            )
        elif seg.segment_id == "ST":
            meta.transaction_types.append(seg.el(0))
            meta.transaction_count += 1
    return meta


def validate_x12_text(text: str) -> tuple[bool, list[str]]:
    """File-level envelope validation (bronze gate).

    Rules mirror bronze_x12_ingestion.py:167-192: starts with ISA,
    minimum length, required envelope segments present, terminator
    count sanity, ASCII-encodable.
    """
    issues: list[str] = []
    if not text:
        return False, ["empty file"]
    stripped = text.lstrip()
    if not stripped.startswith("ISA"):
        issues.append("file does not start with ISA segment")
    if len(text) < MIN_FILE_LENGTH:
        issues.append(f"file too short ({len(text)} < {MIN_FILE_LENGTH} chars)")
    if text.count("~") < 4:
        issues.append("too few segment terminators")
    try:
        text.encode("ascii")
    except UnicodeEncodeError:
        issues.append("non-ASCII content")
    seg_ids = {s.segment_id for s in split_segments(text)}
    for required in ("ISA", "GS", "ST", "SE", "GE", "IEA"):
        if required not in seg_ids:
            issues.append(f"missing required segment {required}")
    return (len(issues) == 0), issues
