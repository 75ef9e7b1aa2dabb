"""Native Delta-log reader (sources/delta_reader.py): replay-based
snapshot reads without delta-spark, against (a) this engine's own
write-through mirror and (b) hand-built foreign tables exercising
partitioned layouts, checkpoints, and protocol gating."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.sources.delta_reader import (
    DeltaProtocolError,
    read_delta_snapshot,
)


def _rowset(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_reads_own_mirror_current_and_version_as_of(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    t.merge(spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string"),
            keys=["k"])
    t.delete("k = 1")

    got = read_delta_snapshot(spark, t.path)
    assert _rowset(got) == _rowset(t.read())
    # VERSION AS OF replays only the prefix
    got_v0 = read_delta_snapshot(spark, t.path, version=0)
    assert _rowset(got_v0) == _rowset(t.read(version=0))
    got_v1 = read_delta_snapshot(spark, t.path, version=1)
    assert _rowset(got_v1) == _rowset(t.read(version=1))


def _write_foreign_partitioned(spark, root):
    """A partitioned Delta table as a real writer lays it out: data
    files WITHOUT the partition column, partitionValues in the log."""
    os.makedirs(f"{root}/_delta_log", exist_ok=True)
    adds = []
    for day, rows in (
        ("2024-01-01", [(1, "x"), (2, "y")]),
        ("2024-01-02", [(3, "z")]),
    ):
        d = f"{root}/day={day}"
        spark.createDataFrame(rows, "k int, s string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                p = f"day={day}/{f}"
                adds.append(
                    {"add": {"path": p, "partitionValues": {"day": day},
                             "size": os.stat(f"{root}/{p}").st_size,
                             "modificationTime": 0, "dataChange": True}}
                )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "s", "type": "string", "nullable": True, "metadata": {}},
            {"name": "day", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
    lines = [
        json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}),
        json.dumps({"metaData": {
            "id": "foreign-1", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["day"], "configuration": {},
        }}),
        *[json.dumps(a) for a in adds],
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_reads_foreign_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "foreign")
    _write_foreign_partitioned(spark, root)
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["k", "s", "day"]
    assert dict(df.dtypes)["day"] == "date"
    got = {(r.k, r.s, str(r.day)) for r in df.collect()}
    assert got == {(1, "x", "2024-01-01"), (2, "y", "2024-01-01"),
                   (3, "z", "2024-01-02")}
    # partition pruning works on the re-attached column
    assert df.filter(F.col("day") == "2024-01-02").count() == 1


def test_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint + checkpoint parquet seed the snapshot; JSON
    commits after the checkpoint still apply (the add in commit 2 and
    the remove of a checkpointed file)."""
    t = ParquetMergeTable(spark, str(tmp_path / "ck"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, s string"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    log_dir = f"{t.path}/_delta_log"

    # build a checkpoint at version 1 from the json commits
    actions = []
    for v in (0, 1):
        with open(f"{log_dir}/{v:020d}.json") as fh:
            actions += [json.loads(line) for line in fh if line.strip()]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    live = {}
    for a in actions:
        if "add" in a:
            live[a["add"]["path"]] = a["add"]
        elif "remove" in a:
            live.pop(a["remove"]["path"], None)
    ck_rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None, "remove": None},
        {"protocol": None, "metaData": {
            "id": meta["id"], "schemaString": meta["schemaString"],
            "partitionColumns": [], "configuration": {},
        }, "add": None, "remove": None},
        *[{"protocol": None, "metaData": None,
           "add": {"path": p, "partitionValues": {},
                   "size": a["size"], "modificationTime": 0,
                   "dataChange": False},
           "remove": None} for p, a in live.items()],
    ]
    ck_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:bigint,modificationTime:bigint,dataChange:boolean>, "
        "remove struct<path:string,deletionTimestamp:bigint,"
        "dataChange:boolean>"
    )
    tmp_ck = str(tmp_path / "ckbuild")
    spark.createDataFrame(ck_rows, ck_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp_ck)
    src = next(f for f in os.listdir(tmp_ck) if f.endswith(".parquet"))
    os.replace(f"{tmp_ck}/{src}", f"{log_dir}/{1:020d}.checkpoint.parquet")
    with open(f"{log_dir}/_last_checkpoint", "w") as fh:
        json.dump({"version": 1, "size": len(ck_rows)}, fh)
    # json commits 0/1 removed: only the checkpoint can seed them
    os.remove(f"{log_dir}/{0:020d}.json")
    os.remove(f"{log_dir}/{1:020d}.json")

    # a post-checkpoint commit
    t.overwrite(spark.createDataFrame([(9, "z")], "k int, s string"))

    got = read_delta_snapshot(spark, t.path)
    assert _rowset(got) == _rowset(t.read())
    assert {r.k for r in got.collect()} == {9}


def test_protocol_gate(spark, tmp_path):
    root = str(tmp_path / "dv")
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 3,
                                          "minWriterVersion": 7}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": []}),
            "partitionColumns": [], "configuration": {},
        }}) + "\n")
    with pytest.raises(DeltaProtocolError):
        read_delta_snapshot(spark, root)
