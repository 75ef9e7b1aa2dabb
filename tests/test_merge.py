"""ParquetMergeTable upsert semantics (SURVEY A7 / MERGE INTO)."""

from __future__ import annotations

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, score long"
    )
    t.merge(base, keys=["id"])  # first merge == create
    assert _rows(t.read()) == [(1, "a", 10), (2, "b", 20)]

    src = spark.createDataFrame(
        [(2, "b2", 25), (3, "c", 30)], "id long, name string, score long"
    )
    t.merge(src, keys=["id"])
    assert _rows(t.read()) == [(1, "a", 10), (2, "b2", 25), (3, "c", 30)]


def test_merge_partial_update_cols(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl2"))
    t.merge(
        spark.createDataFrame([(1, "a", 10)], "id long, name string, score long"),
        keys=["id"],
    )
    t.merge(
        spark.createDataFrame([(1, "zzz", 99), (4, "d", 40)], "id long, name string, score long"),
        keys=["id"],
        update_cols=["score"],  # name NOT updated on match
    )
    assert _rows(t.read()) == [(1, "a", 99), (4, "d", 40)]


def test_merge_versions_advance(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl3"))
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    t.merge(df, keys=["id"])
    v0 = t._version()
    t.merge(spark.createDataFrame([(1, 2)], "id long, v long"), keys=["id"])
    assert t._version() == v0 + 1
    assert _rows(t.read()) == [(1, 2)]
