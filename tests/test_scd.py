"""SCD2 dimension maintenance (operators/scd.py) and the single-pass
column profiler (operators/profile.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.operators.profile import profile_columns
from ai_fabric_etl_spark.operators.scd import as_of, scd2_apply


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, effective_from timestamp"
    )


def _t0(d):
    return datetime(2024, d, 1)


def test_scd2_close_insert_noop_and_new_key(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "dim"))
    scd2_apply(
        t,
        _upd(spark, [(1, "a", _t0(1)), (2, "b", _t0(1))]),
        ["k"],
        ["attr"],
    )
    # change k=1, re-send identical k=2 (must be suppressed), add k=3
    scd2_apply(
        t,
        _upd(spark, [(1, "a2", _t0(2)), (2, "b", _t0(2)), (3, "c", _t0(2))]),
        ["k"],
        ["attr"],
    )
    rows = {
        (r["k"], r["attr"]): r
        for r in t.read().collect()
    }
    assert len(rows) == 4  # 1:a closed, 1:a2 open, 2:b untouched, 3:c open
    assert rows[(1, "a")]["is_current"] is False
    assert rows[(1, "a")]["effective_to"] == _t0(2)
    assert rows[(1, "a2")]["is_current"] is True
    assert rows[(1, "a2")]["effective_to"] is None
    # suppression: k=2 kept its original open row, no fragment
    assert rows[(2, "b")]["is_current"] is True
    assert rows[(2, "b")]["effective_from"] == _t0(1)
    assert rows[(3, "c")]["is_current"] is True


def test_scd2_two_changes_chain_and_as_of(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "dim"))
    for month, attr in [(1, "v1"), (2, "v2"), (3, "v3")]:
        scd2_apply(t, _upd(spark, [(1, attr, _t0(month))]), ["k"], ["attr"])
    hist = sorted(
        t.read().collect(), key=lambda r: r["effective_from"]
    )
    assert [r["attr"] for r in hist] == ["v1", "v2", "v3"]
    # contiguous, non-overlapping validity chain
    assert [r["effective_to"] for r in hist] == [_t0(2), _t0(3), None]
    assert [r["is_current"] for r in hist] == [False, False, True]
    # point-in-time queries
    assert as_of(t, "2024-01-15").collect()[0]["attr"] == "v1"
    assert as_of(t, "2024-02-15").collect()[0]["attr"] == "v2"
    assert as_of(t, "2024-03-01").collect()[0]["attr"] == "v3"
    # exactly one current row per key at every instant probed
    for ts in ("2024-01-15", "2024-02-15", "2024-12-01"):
        assert as_of(t, ts).count() == 1


def test_profile_columns_nulls_and_all_null(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, None), (3, "x", None)],
        "id long, s string, z string",
    )
    p = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert p["id"]["n_rows"] == 3 and p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    assert (p["id"]["min_value"], p["id"]["max_value"]) == ("1", "3")
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 1
    assert p["z"]["n_nulls"] == 3 and p["z"]["n_distinct"] == 0
    assert p["z"]["min_value"] is None and p["z"]["max_value"] is None


def test_profile_columns_approx_within_bound(spark):
    df = spark.range(5000).select(
        (F.col("id") % 937).cast("string").alias("v")
    )
    exact = profile_columns(df, ["v"]).collect()[0]
    approx = profile_columns(df, ["v"], approx=True).collect()[0]
    assert exact["n_distinct"] == 937
    assert abs(approx["n_distinct"] - 937) / 937 < 0.05
    # everything but the distinct estimator is identical
    assert (approx["n_rows"], approx["n_nulls"]) == (5000, 0)
    assert (approx["min_value"], approx["max_value"]) == (
        exact["min_value"],
        exact["max_value"],
    )
