"""DST-robustness of the timestamp→micros utilities (ADVICE r3).

The session builder pins spark.sql.session.timeZone=UTC, but the
operators must stay correct if a user session runs in a DST zone:
- ts_micros on TIMESTAMP (LTZ) must be instant-based (unix_micros),
  not session-wall-clock based;
- ntz_to_instant / instant_to_ntz must be linear across a DST
  transition (a plain NTZ→LTZ cast is not: 2024-03-10 02:30 does not
  exist in America/New_York, and fall-back times are ambiguous).
"""

from __future__ import annotations

from contextlib import contextmanager
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.timeutil import (
    instant_to_ntz,
    ntz_to_instant,
    ts_micros,
)


@contextmanager
def _session_zone(spark, zone):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# wall-clock minutes straddling the US spring-forward gap (02:00 local
# jumps to 03:00 on 2024-03-10 in America/New_York)
_WALLS = [
    "2024-03-10 01:30:00",
    "2024-03-10 02:30:00",  # nonexistent local time in New York
    "2024-03-10 03:30:00",
    "2024-11-03 01:30:00",  # ambiguous local time (fall back)
    "2024-11-03 02:30:00",
]


def test_ntz_bridge_linear_across_dst(spark):
    with _session_zone(spark, "America/New_York"):
        df = spark.createDataFrame(
            [(w,) for w in _WALLS], "wall string"
        ).select(F.col("wall").cast("timestamp_ntz").alias("ts"))
        out = df.select(
            "ts",
            ntz_to_instant("ts").alias("inst"),
            instant_to_ntz(ntz_to_instant("ts")).alias("back"),
            F.unix_micros(ntz_to_instant("ts")).alias("us"),
        ).collect()
        # round trip is the identity, even for nonexistent/ambiguous
        # local times
        for r in out:
            assert r["back"] == r["ts"], (r["ts"], r["back"])
        # and the mapping is linear: instant gaps equal the naive
        # wall-clock gaps exactly (the session-zone cast would distort
        # them across the spring-forward gap / fall-back fold)
        gaps = [
            (b["us"] - a["us"]) / 1_000_000.0
            for a, b in zip(out, out[1:])
        ]
        expected = [
            (
                datetime.fromisoformat(b) - datetime.fromisoformat(a)
            ).total_seconds()
            for a, b in zip(_WALLS, _WALLS[1:])
        ]
        assert gaps == expected, gaps


def test_ts_micros_ltz_is_instant_based(spark):
    with _session_zone(spark, "America/New_York"):
        # two instants 1h apart that straddle spring-forward: the
        # instant path must report exactly 3600s; a session-wall-clock
        # path would report 7200s (01:30 → 03:30 local)
        df = spark.createDataFrame(
            [(datetime(2024, 3, 10, 6, 30), datetime(2024, 3, 10, 7, 30))],
            "a timestamp, b timestamp",
        )
        gap = df.select(
            (ts_micros("b", "timestamp") - ts_micros("a", "timestamp")).alias("g")
        ).collect()[0]["g"]
        assert gap == 3_600_000_000, gap


def test_ts_micros_ntz_matches_duckdb_epoch(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.createDataFrame([(w,) for w in _WALLS], "wall string").select(
        F.col("wall").cast("timestamp_ntz").alias("ts")
    )
    got = {
        r["ts"].isoformat(): r["us"]
        for r in df.select("ts", ts_micros("ts").alias("us")).collect()
    }
    for w in _WALLS:
        want = duckdb.sql(
            f"select epoch_us(TIMESTAMP '{w}')"
        ).fetchone()[0]
        assert got[datetime.fromisoformat(w).isoformat()] == want
