"""Sources surface tests (SURVEY §2.1 S10-S13)."""

from __future__ import annotations

import datetime
import os
import time

import pytest

from ai_fabric_etl_spark.sources import eligible_files, jdbc_read_options, landing_path
from ai_fabric_etl_spark.sources.sftp_ingest import SFTPConnector


def test_jdbc_read_options_partitioned():
    opts = jdbc_read_options(
        url="jdbc:postgresql://db/x12",
        table="silver_x12_transactions",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_jdbc_read_options_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_read_options(url="jdbc:x", table="t", partition_column="id")


def test_sftp_connector_is_stubbed():
    c = SFTPConnector("partner.example.com")
    with pytest.raises(NotImplementedError):
        c.list_files("/outbound")


def test_eligible_files_age_and_size(spark, tmp_path):
    old = tmp_path / "old_enough.x12"
    old.write_text("ISA*00*" + "x" * 200)
    fresh = tmp_path / "too_fresh.x12"
    fresh.write_text("ISA*00*" + "x" * 200)
    big = tmp_path / "too_big.x12"
    big.write_text("ISA*00*" + "x" * 5000)
    skipped = tmp_path / "notes.csv"
    skipped.write_text("not x12")

    now = time.time()
    os.utime(old, (now - 3600, now - 3600))
    os.utime(big, (now - 3600, now - 3600))
    os.utime(fresh, (now, now))

    got = eligible_files(
        spark,
        str(tmp_path),
        min_age=datetime.timedelta(minutes=5),
        max_bytes=1000,
    )
    assert [r.file_name for r in got.collect()] == ["old_enough.x12"]


def test_landing_path_layout():
    p = landing_path("/bronze", "BCBS001", datetime.datetime(2024, 3, 7))
    assert p == "/bronze/BCBS001/year=2024/month=03/day=07"
