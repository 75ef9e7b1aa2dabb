"""External sources/sinks beyond the file formats (SURVEY §2.1).

- ``jdbc``: partitioned JDBC read/write (S13 — the reference's
  Postgres local-dev mirror, local-development/process_test_data.py).
- ``sftp_ingest``: the SFTP partner-exchange surface (S10-S12) as an
  out-of-engine ingestion job: network ops are stubbed (no paramiko /
  gnupg in this environment), while everything Spark-side — the
  age/size eligibility filter over binaryFile metadata, landing
  layout, outbound push batching — is real and tested.
"""

from ai_fabric_etl_spark.sources.jdbc import jdbc_read_options, read_jdbc, write_jdbc
from ai_fabric_etl_spark.sources.sftp_ingest import (
    SFTPConnector,
    eligible_files,
    landing_path,
)

__all__ = [
    "read_jdbc",
    "write_jdbc",
    "jdbc_read_options",
    "SFTPConnector",
    "eligible_files",
    "landing_path",
]
