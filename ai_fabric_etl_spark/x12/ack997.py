"""997 Functional Acknowledgment generation.

Distributed shape mirrors generate_x12_acknowledgments.py:155-246:
group silver rows per trading partner, collect control numbers, build
the 997 text. String templating is UDF-appropriate (U8), but the
grouping/collection is native — only the final text assembly crosses
into Python, Arrow-batched (pandas_udf).

Documented fixes of the reference's latent bugs (same pattern as the
:778 KPI fix): the reference derives the AK1 functional code from the
first 2 chars of the GROUP CONTROL NUMBER and the AK2 set type from
the first 3 chars of the SET CONTROL NUMBER
(generate_x12_acknowledgments.py:116,121) — both garbage for numeric
control numbers. Here AK2 carries each set's ACTUAL transaction type
from silver, and AK1 carries the functional identifier code mapped
from the group's type (X12 functional-group codes: HC/HP/BE/HS/HB/
HR/HN/HI). ISA ids/ICN are truncated to their fixed widths (15/9)
so oversized inbound identifiers cannot break the 106-char ISA.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# X12 functional identifier codes (GS01) by transaction set type
FUNC_CODES = {
    "837": "HC",
    "835": "HP",
    "834": "BE",
    "270": "HS",
    "271": "HB",
    "276": "HR",
    "277": "HN",
    "278": "HI",
    "279": "HI",
}


def _build_997_text(
    sender_id: str,
    receiver_id: str,
    interchange_control_number: str,
    sets: list[tuple[str, str]],
    ack_date: str = "250101",
    ack_time: str = "0000",
) -> str:
    """Assemble one 997 interchange acknowledging ``sets`` — ordered
    (control_number, transaction_type) pairs. Fixed-width ISA padding
    per the X12 envelope spec (IDs 15 chars, ICN 9 — oversized values
    truncate rather than overflow the positional segment)."""
    # note the role swap: we acknowledge TO the original sender
    snd = (sender_id or "")[:15]
    rcv = (receiver_id or "")[:15]
    icn = (interchange_control_number or "0")[:9]
    isa = (
        f"ISA*00*{'':10}*00*{'':10}*ZZ*{rcv:<15}*ZZ*{snd:<15}"
        f"*{ack_date}*{ack_time}*^*00501*{icn:>09}*0*T*:~"
    )
    group_type = min((t for _, t in sets), default="")
    group_code = FUNC_CODES.get(group_type, "FA")
    gs = (
        f"GS*FA*{receiver_id}*{sender_id}*20{ack_date}*{ack_time}"
        f"*{interchange_control_number}*X*005010~"
    )
    st_cn = "0001"
    segs = [f"ST*997*{st_cn}~", f"AK1*{group_code}*{interchange_control_number}~"]
    accepted = 0
    for cn, txn_type in sets:
        segs.append(f"AK2*{txn_type}*{cn}~")
        segs.append("AK5*A~")
        accepted += 1
    segs.append(f"AK9*A*{len(sets)}*{len(sets)}*{accepted}~")
    # SE count = segments from ST through SE inclusive
    segs.append(f"SE*{len(segs) + 1}*{st_cn}~")
    body = "".join(segs)
    ge = f"GE*1*{interchange_control_number}~"
    iea = f"IEA*1*{icn:>09}~"
    return isa + gs + body + ge + iea


def generate_acks(silver: DataFrame, processing_date=None) -> DataFrame:
    """One 997 per (sender, receiver, interchange): native groupBy +
    collect_list of (control number, type) pairs, then a pandas-batched
    UDF for text templating."""
    df = silver
    if processing_date is not None:
        df = df.filter(F.col("processing_date") == F.lit(processing_date))
    grouped = df.groupBy(
        "sender_id", "receiver_id", "interchange_control_number"
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("transaction_set_control_number").alias("cn"),
                    F.col("transaction_type").alias("t"),
                )
            )
        ).alias("ack_sets"),
        F.count(F.lit(1)).alias("transaction_count"),
        F.max("processing_timestamp").alias("last_processed"),
    )

    @F.pandas_udf("string")
    def ack_text(
        sender: pd.Series, receiver: pd.Series, icn: pd.Series, sets: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                _build_997_text(
                    s or "",
                    r or "",
                    i or "0",
                    [(p["cn"], p["t"]) for p in (ss if ss is not None else [])],
                )
                for s, r, i, ss in zip(sender, receiver, icn, sets)
            ]
        )

    out = grouped.withColumn(
        "ack_997",
        ack_text("sender_id", "receiver_id", "interchange_control_number", "ack_sets"),
    ).withColumn(
        "control_numbers", F.transform(F.col("ack_sets"), lambda s: s["cn"])
    ).drop("ack_sets")
    return out.withColumn(
        "ack_file_name",
        F.concat(
            F.lit("ack_997_"),
            F.col("sender_id"),
            F.lit("_"),
            F.col("interchange_control_number"),
            F.lit(".x12"),
        ),
    )


def write_ack_files(acks: DataFrame, out_dir: str) -> None:
    """S8: per-partner 997 file output, fully distributed.

    The reference collect()s every ack to the driver and writes one
    file per partner pair with coalesce(1)
    (generate_x12_acknowledgments.py:226-248) — a driver bottleneck at
    scale. Here the text sink partitions by (sender_id, receiver_id):
    each partner directory receives its acks with no driver round-trip,
    and repartitioning on the same keys keeps it to one file per
    partner. Layout: ``out/sender_id=X/receiver_id=Y/part-*.txt`` vs
    the reference's ``outbound/<partner>/997_<ts>.x12`` (documented
    deviation: hive-style dirs, engine-assigned file names)."""
    (
        acks.select("sender_id", "receiver_id", "ack_997")
        .repartition("sender_id", "receiver_id")
        .write.mode("overwrite")
        .partitionBy("sender_id", "receiver_id")
        .text(out_dir)
    )


def validate_997(text: str) -> tuple[bool, list[str]]:
    """Self-validation mirroring generate_x12_acknowledgments.py:298-337:
    required segments present, ISA first, IEA last."""
    issues = []
    for seg in ("ISA", "GS", "ST*997", "AK1", "AK9", "SE", "GE", "IEA"):
        if seg not in text:
            issues.append(f"missing {seg}")
    if not text.startswith("ISA"):
        issues.append("ISA not first")
    if not text.rstrip("~").split("~")[-1].startswith("IEA"):
        issues.append("IEA not last")
    return (len(issues) == 0), issues
