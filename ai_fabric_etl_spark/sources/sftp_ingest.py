"""SFTP trading-partner exchange as an out-of-engine ingestion job
(SURVEY S10-S12, §3.3).

The reference runs timer-triggered Azure Functions that list partner
SFTP directories, filter files by age/size, download, PGP-decrypt and
land them in the bronze container (src/sftp/connector.py:184-415,
src/sftp/manager.py:163-350); egress pushes encrypted 997s back
(manager.py:352-514). None of that is a Spark operator — it feeds the
engine's file source — so the split here is:

- network/crypto ops: a ``SFTPConnector`` protocol whose default
  implementation raises NotImplementedError (paramiko/gnupg are not in
  this environment; swap in a real client in production);
- the *eligibility policy* (age >= min_age so partners finish writing,
  size <= cap — manager.py:217-231) expressed as DataFrame predicates
  over ``binaryFile`` metadata, so the same rule governs a local
  landing dir, ABFS, or S3 — tested against local files;
- the landing layout ``partner/year=/month=/day=/`` matching the
  bronze partitioning (bronze_x12_ingestion.py:259-262).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_fabric_etl_spark.config import DEFAULT_CONFIG

MAX_FILE_BYTES = DEFAULT_CONFIG.sftp_max_file_mb * 1024 * 1024  # per-partner cap


class SFTPConnector:
    """Protocol mirror of src/sftp/connector.py:184-415. Network ops
    are environment-stubbed; subclass with a real SSH client to use."""

    def __init__(self, host: str, port: int = 22, username: str | None = None):
        self.host, self.port, self.username = host, port, username

    def list_files(self, remote_dir: str, glob: str = "*") -> list[str]:
        raise NotImplementedError("SFTP network ops are stubbed in this environment")

    def download_file(self, remote_path: str, local_path: str) -> None:
        raise NotImplementedError("SFTP network ops are stubbed in this environment")

    def upload_file(self, local_path: str, remote_path: str) -> None:
        raise NotImplementedError("SFTP network ops are stubbed in this environment")

    def delete_file(self, remote_path: str) -> None:
        raise NotImplementedError("SFTP network ops are stubbed in this environment")

    def exists(self, remote_path: str) -> bool:
        raise NotImplementedError("SFTP network ops are stubbed in this environment")


def eligible_files(
    spark: SparkSession,
    landing_dir: str,
    glob: str = "*.{x12,edi,txt}",
    min_age: datetime.timedelta = datetime.timedelta(minutes=5),
    max_bytes: int = MAX_FILE_BYTES,
    now: datetime.datetime | None = None,
) -> DataFrame:
    """Files old enough to be fully written and under the size cap
    (manager.py:217-231), as metadata-only predicates — the scan reads
    footers/metadata, not content, so eligibility over millions of
    files costs a listing, not an IO pass."""
    ts_now = F.lit(now) if now is not None else F.current_timestamp()
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(landing_dir)
    )
    return (
        df.filter(F.col("length") <= max_bytes)
        .filter(
            F.col("modificationTime")
            <= ts_now - F.make_interval(secs=F.lit(min_age.total_seconds()))
        )
        .select(
            "path",
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("file_size"),
            F.col("modificationTime").alias("modification_time"),
        )
    )


def landing_path(base: str, partner_id: str, when: datetime.datetime) -> str:
    """partner/year=/month=/day=/ layout (bronze_x12_ingestion.py:259-262)."""
    return (
        f"{base}/{partner_id}/year={when.year:04d}"
        f"/month={when.month:02d}/day={when.day:02d}"
    )
