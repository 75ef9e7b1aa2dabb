"""ParquetMergeTable upsert semantics (SURVEY A7 / MERGE INTO)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_merge_epoch_guard_round_trip(spark, tmp_path):
    """The pointer records the last applied epoch atomically with the
    version, and survives overwrite/merge round trips."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_epoch"))
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    assert t.last_epoch() is None
    t.overwrite(df, epoch=0)
    assert t.last_epoch() == 0
    t.merge(spark.createDataFrame([(2, 20)], "id long, v long"), keys=["id"], epoch=1)
    assert t.last_epoch() == 1
    assert _rows(t.read()) == [(1, 10), (2, 20)]
    # epoch-less writes CARRY the marker FORWARD (r4 self-review):
    # maintenance ops and direct batch writes on a streaming state
    # table must not disarm the replay guard — erasing it would let a
    # replayed micro-batch double-fold additive partials
    t.overwrite(df)
    assert t.last_epoch() == 1
    t.compact(target_files=1)
    assert t.last_epoch() == 1
    t.update("id = 1", {"v": F.lit(11)})
    assert t.last_epoch() == 1
    t.delete("id = 999")
    assert t.last_epoch() == 1


def test_merge_epoch_scoped_by_app_identity(spark, tmp_path):
    """Epoch counters are per-stream (Delta txnAppId semantics): a
    query restarted on a FRESH checkpoint restarts epoch ids at 0, and
    its batches must NOT be skipped as replays of the old stream."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_app"))
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    t.overwrite(df, epoch=500, app_id="/ckpt/run-a")
    assert t.last_epoch("/ckpt/run-a") == 500
    # a different stream identity sees no epoch -> applies its batches
    assert t.last_epoch("/ckpt/run-b") is None
    # legacy callers without an app still see the raw epoch
    assert t.last_epoch() == 500
    # adopting the new stream replaces both epoch and app
    t.overwrite(df, epoch=0, app_id="/ckpt/run-b")
    assert t.last_epoch("/ckpt/run-b") == 0
    assert t.last_epoch("/ckpt/run-a") is None


def test_merge_failure_mid_swap_keeps_old_version(spark, tmp_path):
    """VERDICT r1 item 6: a crash AFTER writing the new version
    directory but BEFORE the pointer swap must leave readers on the
    old consistent version."""
    import os

    path = str(tmp_path / "tbl_crash")
    t = ParquetMergeTable(spark, path)
    v0 = spark.createDataFrame([(1, 10)], "id long, v long")
    t.overwrite(v0)

    # simulate the crash: the data write of version 1 completes, the
    # pointer swap never happens
    v1 = spark.createDataFrame([(1, 99), (2, 20)], "id long, v long")
    v1.write.mode("overwrite").parquet(os.path.join(path, "v=1"))

    assert _rows(t.read()) == [(1, 10)]  # still the committed version
    # recovery: the next successful merge writes v=2 and swaps past the orphan
    t.merge(spark.createDataFrame([(2, 20)], "id long, v long"), keys=["id"])
    assert _rows(t.read()) == [(1, 10), (2, 20)]


def test_merge_sequential_batches_serialize(spark, tmp_path):
    """foreachBatch applies batches serially; two folds back-to-back
    see each other's writes (read-modify-write against the freshest
    pointer)."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_serial"))
    for i in range(5):
        t.merge(
            spark.createDataFrame([(i, i * 10)], "id long, v long"),
            keys=["id"],
            epoch=i,
        )
    assert _rows(t.read()) == [(i, i * 10) for i in range(5)]
    assert t.last_epoch() == 4


def test_merge_time_travel_and_history(spark, tmp_path):
    """Delta-style VERSION AS OF over retained version directories."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_tt"))
    t.overwrite(spark.createDataFrame([(1, 10)], "id long, v long"))
    t.merge(spark.createDataFrame([(2, 20)], "id long, v long"), keys=["id"])
    t.merge(spark.createDataFrame([(1, 11)], "id long, v long"), keys=["id"])

    assert t.versions() == [0, 1, 2]
    assert _rows(t.read(version=0)) == [(1, 10)]
    assert _rows(t.read(version=1)) == [(1, 10), (2, 20)]
    assert _rows(t.read()) == [(1, 11), (2, 20)]

    removed = t.vacuum(keep_last=1)
    assert removed == [0, 1]
    assert t.versions() == [2]
    assert _rows(t.read()) == [(1, 11), (2, 20)]  # current unaffected
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="not retained"):
        t.read(version=0)


def test_merge_schema_evolution(spark, tmp_path):
    """mergeSchema semantics: source-only columns are added (null for
    untouched rows); target-only columns survive (null for inserts)."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_evo"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"))
    t.merge(
        spark.createDataFrame([(2, "b2", 99), (3, "c", 42)],
                              "id long, name string, score long"),
        keys=["id"],
    )
    got = {r.id: (r.name, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b2", 99), 3: ("c", 42)}

    # target-only column: later narrow source keeps the evolved column
    t.merge(spark.createDataFrame([(4, "d")], "id long, name string"), keys=["id"])
    got = {r.id: (r.name, r.score) for r in t.read().collect()}
    assert got[4] == ("d", None) and got[2] == ("b2", 99)


def test_merge_matched_null_not_overwritten_outside_update_cols(spark, tmp_path):
    """Non-update columns on MATCHED rows keep their value — including
    a legitimate NULL (a coalesce-based merge would steal the source's
    value for it)."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_nullkeep"))
    t.overwrite(
        spark.createDataFrame([(1, "a", None), (9, "z", 5)],
                              "id long, name string, score long")
    )
    t.merge(
        spark.createDataFrame([(1, "b", 7), (2, "c", 8)],
                              "id long, name string, score long"),
        keys=["id"],
        update_cols=["name"],
    )
    got = {r.id: (r.name, r.score) for r in t.read().collect()}
    assert got == {1: ("b", None), 2: ("c", 8), 9: ("z", 5)}


def test_delete_where(spark, tmp_path):
    """DELETE FROM WHERE: copy-on-write rewrite, old version still
    time-travelable; NULL-evaluating predicates keep the row."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_del"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "id long, score long"
        )
    )
    v_before = t._version()
    n = t.delete("score > 15")
    assert n == 1
    assert _rows(t.read()) == [(1, 10), (2, None)]  # NULL kept
    assert _rows(t.read(version=v_before)) == [(1, 10), (2, None), (3, 30)]


def test_update_where(spark, tmp_path):
    from pyspark.sql import functions as F

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_upd"))
    t.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, score long")
    )
    t.update("id = 2", {"score": F.col("score") + 5})
    assert _rows(t.read()) == [(1, 10), (2, 25)]


def test_merge_matched_delete_clause(spark, tmp_path):
    """WHEN MATCHED AND cond THEN DELETE: matched+condition rows drop,
    matched-without-condition update, unmatched source rows insert
    (even when the delete condition is true — MERGE semantics)."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_mdel"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", False), (2, "b", False)], "id long, name string, tomb boolean"
        )
    )
    t.merge(
        spark.createDataFrame(
            [(1, "x", True), (2, "b2", False), (3, "c", True)],
            "id long, name string, tomb boolean",
        ),
        keys=["id"],
        delete_condition="tomb",
    )
    assert _rows(t.read()) == [(2, "b2", False), (3, "c", True)]


def test_optimistic_concurrency_conflict(spark, tmp_path):
    """A writer that read snapshot v and finds the table advanced at
    commit time fails with ConcurrentWriteError instead of silently
    clobbering the other writer's rows (lost update)."""
    import pytest

    from ai_fabric_etl_spark.operators.merge import ConcurrentWriteError

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_occ"))
    t.overwrite(spark.createDataFrame([(1, 10)], "id long, v long"))
    stale = t._version()
    # writer B commits first
    t.merge(spark.createDataFrame([(2, 20)], "id long, v long"), keys=["id"])
    # writer A (snapshot = stale) now fails its commit
    with pytest.raises(ConcurrentWriteError):
        t.overwrite(
            spark.createDataFrame([(1, 99)], "id long, v long"),
            expected_version=stale,
        )
    # un-checked merge still works (last-writer-wins mode)
    t.merge(spark.createDataFrame([(1, 99)], "id long, v long"), keys=["id"])
    assert _rows(t.read()) == [(1, 99), (2, 20)]


def test_compact_preserves_content_and_skipping_layout(spark, tmp_path):
    """OPTIMIZE: same rows, fewer files; sort_by produces disjoint
    per-file ranges (footer-stat data skipping)."""
    import glob

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_opt"))
    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS grp").repartition(16)
    t.overwrite(df)
    before = _rows(t.read())
    t.compact(target_files=2, sort_by=["id"])
    after_dir = str(tmp_path / "tbl_opt" / f"v={t._version()}")
    files = glob.glob(f"{after_dir}/part-*.parquet")
    assert len(files) == 2
    assert _rows(t.read()) == before
    # per-file id ranges must be disjoint for skipping to work
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ids = [
            (md.row_group(i).column(0).statistics.min,
             md.row_group(i).column(0).statistics.max)
            for i in range(md.num_row_groups)
        ]
        ranges.append((min(a for a, _ in ids), max(b for _, b in ids)))
    ranges.sort()
    assert ranges[0][1] < ranges[1][0]


def test_history_timestamp_travel_and_restore(spark, tmp_path):
    """DESCRIBE HISTORY / TIMESTAMP AS OF / RESTORE parity: the commit
    log records one labeled entry per version; a timestamp between two
    commits resolves to the earlier one; RESTORE re-commits an old
    version as a new one (history only moves forward)."""
    import time

    import pytest as _pytest

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_hist"))
    t.overwrite(spark.createDataFrame([(1, 10)], "id long, v long"))
    between = time.time()
    time.sleep(0.01)
    t.merge(spark.createDataFrame([(2, 20)], "id long, v long"), keys=["id"])
    t.delete("id = 1")

    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["op"] for h in hist] == ["WRITE", "MERGE", "DELETE"]
    assert all(h["timestamp"] > 0 for h in hist)

    # timestamp between v0 and v1 resolves to v0
    assert _rows(t.read(timestamp=between)) == [(1, 10)]
    assert _rows(t.read(timestamp=time.time())) == [(2, 20)]
    with _pytest.raises(FileNotFoundError, match="existed at"):
        t.read(timestamp=hist[0]["timestamp"] - 1000)
    with _pytest.raises(ValueError, match="not both"):
        t.read(version=0, timestamp=between)

    # restore to v1 (pre-delete): new version 3, same rows as v1
    t.restore(1)
    assert t._version() == 3
    assert _rows(t.read()) == [(1, 10), (2, 20)]
    assert t.history()[-1]["op"] == "RESTORE"
    # the restored-FROM version is still readable
    assert _rows(t.read(version=2)) == [(2, 20)]


def test_change_feed_insert_update_delete(spark, tmp_path):
    """CDF diff between versions: tagged net changes, one preimage/
    postimage pair per updated key, nothing for untouched keys."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_cdf"))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"))
    v0 = t._version()
    # update k=2, delete k=3, insert k=4, leave k=1 untouched
    t.merge(spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k int, s string, v int"), keys=["k"])
    t.delete(F.col("k") == 3)
    feed = t.changes(keys=["k"], from_version=v0)
    got = {(r["k"], r["_change_type"]): (r["s"], r["v"]) for r in feed.collect()}
    assert got == {
        (2, "update_preimage"): ("b", 20),
        (2, "update_postimage"): ("B", 99),
        (3, "delete"): ("c", 30),
        (4, "insert"): ("d", 40),
    }
    assert feed.select("_commit_version").distinct().collect()[0][0] == t._version()


def test_change_feed_schema_evolution(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_cdf_evo"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, s string"))
    t.merge(spark.createDataFrame([(1, "a", 7)], "k int, s string, extra int"),
            keys=["k"])
    feed = t.changes(keys=["k"], from_version=0)
    got = {r["_change_type"]: (r["s"], r["extra"]) for r in feed.collect()}
    # old row reads null for the evolved column -> counts as an update
    assert got == {"update_preimage": ("a", None), "update_postimage": ("a", 7)}


def test_read_where_skips_files_and_matches_full_scan(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_skip"))
    df = spark.range(0, 10000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
    )
    t.overwrite(df)
    t.compact(target_files=8, sort_by=["k"])
    files, total = t._skip_files({"k": (100, 200)})
    assert total == 8 and len(files) < total
    got = _rows(t.read_where({"k": (100, 200)}))
    want = _rows(t.read().filter((F.col("k") >= 100) & (F.col("k") <= 200)))
    assert got == want and len(got) == 101


def test_read_where_unsorted_layout_still_exact(spark, tmp_path):
    """Without clustering, stats may prune nothing - results must
    still equal the exact filter (skipping is a pure optimization)."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_skip2"))
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 5000).cast("int").alias("k"))
    t.overwrite(df.repartition(4))
    got = _rows(t.read_where({"k": (10, 50)}))
    want = _rows(t.read().filter((F.col("k") >= 10) & (F.col("k") <= 50)))
    assert got == want


def test_read_where_empty_range_returns_empty_with_schema(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_skip3"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, s string"))
    out = t.read_where({"k": (100, 200)})
    assert out.columns == ["k", "s"] and out.count() == 0


def test_read_where_after_zorder_prunes_on_both_columns(spark, tmp_path):
    """OPTIMIZE ZORDER BY (x, y) + footer-stat skipping: a narrow
    range on EITHER curve column must prune files (single-key sorting
    would only prune on the leading key), and results stay exact."""
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_zskip"))
    df = spark.range(0, 20000).select(
        (F.col("id") % 141).cast("int").alias("x"),
        ((F.col("id") * 7919) % 141).cast("int").alias("y"),
    )
    t.overwrite(df)
    t.compact(target_files=16, zorder_by=["x", "y"])
    fx, total = t._skip_files({"x": (0, 8)})
    fy, _ = t._skip_files({"y": (0, 8)})
    assert total == 16 and len(fx) < total and len(fy) < total
    got = _rows(t.read_where({"y": (0, 8)}))
    want = _rows(t.read().filter((F.col("y") >= 0) & (F.col("y") <= 8)))
    assert got == want


def test_schema_changes_and_small_files_report(spark, tmp_path):
    from ai_fabric_etl_spark.operators.merge import (
        schema_changes,
        small_files_report,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_drift"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, s string"))
    v0 = t._version()
    # evolve: add a column via merge, then rewrite with a type change
    t.merge(spark.createDataFrame([(2, "b", 7)], "k int, s string, extra int"),
            keys=["k"])
    t.overwrite(
        t.read().select("k", F.col("s").cast("binary").alias("s"), "extra")
    )
    got = schema_changes(t, from_version=v0)
    assert got == [
        {"column": "extra", "change": "added", "from_type": None,
         "to_type": "int"},
        {"column": "s", "change": "type_changed", "from_type": "string",
         "to_type": "binary"},
    ]

    frag = ParquetMergeTable(spark, str(tmp_path / "tbl_frag"))
    frag.overwrite(spark.range(0, 1000).repartition(10))
    rep = small_files_report(frag, min_rows=500)
    assert rep["n_files"] == 10 and rep["n_small"] == 10
    assert rep["total_rows"] == 1000
    frag.compact(target_files=1)
    rep2 = small_files_report(frag, min_rows=500)
    assert rep2["n_files"] == 1 and rep2["n_small"] == 0


def test_delta_log_format_conformance(spark, tmp_path):
    """VERDICT r4 item 7: every commit mirrors a minimal Delta
    transaction log entry (protocol 1/2, add/remove actions, no DVs)
    per the public PROTOCOL.md. Contiguous numbered commits, protocol +
    metaData in commit 0, spec-required action fields, and replaying
    add/remove reconstructs exactly the current snapshot's files."""
    import glob as _glob
    import json
    import os

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_delta"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    t.merge(spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string"),
            keys=["k"])
    t.delete("k = 1")
    t.compact(target_files=1)

    log_dir = os.path.join(t.path, "_delta_log")
    logs = sorted(
        f for f in os.listdir(log_dir) if f.endswith(".json")
    )
    # contiguous zero-padded commit files 0..current version
    assert logs == [f"{v:020d}.json" for v in range(t._version() + 1)]

    def actions(v):
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    # commit 0: protocol + metaData with spec-required fields
    a0 = actions(0)
    protos = [a["protocol"] for a in a0 if "protocol" in a]
    metas = [a["metaData"] for a in a0 if "metaData" in a]
    assert len(protos) == 1 and len(metas) == 1
    assert protos[0] == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = metas[0]
    for field in ("id", "format", "schemaString", "partitionColumns",
                  "configuration"):
        assert field in meta, f"metaData missing {field}"
    assert meta["format"]["provider"] == "parquet"
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    assert [f["name"] for f in schema["fields"]] == ["k", "s"]

    # replay: file set after applying every add/remove == live snapshot
    live: set[str] = set()
    for v in range(t._version() + 1):
        for a in actions(v):
            if "add" in a:
                add = a["add"]
                for field in ("path", "partitionValues", "size",
                              "modificationTime", "dataChange"):
                    assert field in add, f"add missing {field}"
                full = os.path.join(t.path, add["path"])
                assert os.path.exists(full), add["path"]
                assert add["size"] == os.stat(full).st_size
                live.add(add["path"])
            elif "remove" in a:
                rm = a["remove"]
                assert "path" in rm and "dataChange" in rm
                live.discard(rm["path"])
    current = {
        f"v={t._version()}/{os.path.basename(p)}"
        for p in _glob.glob(os.path.join(t.path, f"v={t._version()}", "*.parquet"))
    }
    assert live == current

    # the reconstructed snapshot reads back as the live table
    rows_log = sorted(
        tuple(r) for r in spark.read.parquet(
            *[os.path.join(t.path, p) for p in sorted(live)]
        ).collect()
    )
    rows_live = sorted(tuple(r) for r in t.read().collect())
    assert rows_log == rows_live

    # crash-gap catch-up: lose the latest mirror entry, commit again —
    # the gap is re-derived from the retained version directory
    os.remove(os.path.join(log_dir, logs[-1]))
    t.overwrite(t.read())
    logs2 = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    assert logs2 == [f"{v:020d}.json" for v in range(t._version() + 1)]


def test_iceberg_mirror_snapshots_match_table(spark, tmp_path):
    """Every commit (overwrite, MERGE, DELETE, OPTIMIZE, schema
    evolution) mirrors an Iceberg-v2 snapshot; the from-scratch reader
    (version-hint -> metadata.json -> Avro manifest list -> Avro
    manifests -> parquet) must reproduce table.read() for the current
    AND every historical snapshot."""
    from ai_fabric_etl_spark.sources.iceberg_mirror import (
        read_iceberg_snapshot,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_ice"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    t.merge(spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string"),
            keys=["k"])
    t.delete("k = 1")
    t.compact(target_files=1)
    t.overwrite(
        t.read().withColumn("extra", F.lit(7).cast("long"))
    )
    for v in range(t._version() + 1):
        got = sorted(
            tuple(r) for r in
            read_iceberg_snapshot(spark, t.path, snapshot_id=v).collect()
        )
        want = sorted(tuple(r) for r in t.read(version=v).collect())
        assert got == want, f"snapshot {v}"
    cur = sorted(tuple(r)
                 for r in read_iceberg_snapshot(spark, t.path).collect())
    assert cur == sorted(tuple(r) for r in t.read().collect())


def test_iceberg_metadata_conformance(spark, tmp_path):
    """Spec-level checks on the emitted metadata: required
    metadata.json fields, positive unique field-ids, monotonic
    sequence numbers, manifest-list lengths/counts that match the real
    Avro files, and per-file record counts that sum to the snapshot
    row count."""
    import json
    import os

    from ai_fabric_etl_spark.sources.iceberg_mirror import (
        _MANIFEST_ENTRY_STRUCT,
        _MANIFEST_FILE_STRUCT,
        _read_avro_rows,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_ice2"))
    t.overwrite(spark.range(0, 57).selectExpr("id", "id % 5 as g"))
    t.overwrite(spark.range(0, 31).selectExpr("id", "id % 5 as g"))

    md = os.path.join(t.path, "metadata")
    with open(os.path.join(md, "version-hint.text")) as fh:
        hint = int(fh.read())
    assert hint == t._version()
    meta = json.load(open(os.path.join(md, f"v{hint}.metadata.json")))
    for key in ("format-version", "table-uuid", "location",
                "last-sequence-number", "last-updated-ms",
                "last-column-id", "current-schema-id", "schemas",
                "default-spec-id", "partition-specs", "last-partition-id",
                "default-sort-order-id", "sort-orders",
                "current-snapshot-id", "snapshots", "snapshot-log"):
        assert key in meta, f"metadata.json missing {key}"
    assert meta["format-version"] == 2
    ids = [f["id"] for s in meta["schemas"] for f in s["fields"]]
    assert all(i > 0 for i in ids)
    per_schema = [
        [f["id"] for f in s["fields"]] for s in meta["schemas"]
    ]
    for sids in per_schema:
        assert len(sids) == len(set(sids))
    assert meta["last-column-id"] >= max(ids)
    seqs = [s["sequence-number"] for s in meta["snapshots"]]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert meta["last-sequence-number"] == seqs[-1]

    for snap in meta["snapshots"]:
        assert snap["summary"]["operation"] in (
            "append", "overwrite", "replace", "delete"
        )
        mlist = _read_avro_rows(snap["manifest-list"], _MANIFEST_FILE_STRUCT)
        assert mlist, "manifest list empty"
        total_rows = 0
        for m in mlist:
            (m_path, m_len, spec_id, content, seq, min_seq, added_sid,
             n_added, n_exist, n_del, r_added, r_exist, r_del) = m
            assert os.path.getsize(m_path) == m_len
            assert spec_id == 0 and content == 0
            assert seq == snap["sequence-number"]
            entries = _read_avro_rows(m_path, _MANIFEST_ENTRY_STRUCT)
            assert len([e for e in entries if e[0] == 1]) == n_added
            total_rows += sum(e[4][4] for e in entries if e[0] in (0, 1))
            for e in entries:
                df_struct = e[4]
                assert df_struct[0] == 0  # content: data
                assert df_struct[2] == "PARQUET"
                assert os.path.exists(df_struct[1])
                assert os.path.getsize(df_struct[1]) == df_struct[5]
        assert total_rows == t.read(version=snap["snapshot-id"]).count()


def test_iceberg_schema_evolution_field_ids(spark, tmp_path):
    """Schema evolution: unchanged columns keep their field-ids, new
    columns get fresh ids above last-column-id, current-schema-id
    advances, and historical snapshots keep their original schema-id."""
    import json
    import os

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_ice3"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, s string"))
    t.overwrite(
        spark.createDataFrame([(1, "a", 2.5)], "k int, s string, x double")
    )
    md = os.path.join(t.path, "metadata")
    meta = json.load(
        open(os.path.join(md, f"v{t._version()}.metadata.json"))
    )
    assert len(meta["schemas"]) == 2
    s0 = next(s for s in meta["schemas"] if s["schema-id"] == 0)
    s1 = next(s for s in meta["schemas"] if s["schema-id"] == 1)
    ids0 = {f["name"]: f["id"] for f in s0["fields"]}
    ids1 = {f["name"]: f["id"] for f in s1["fields"]}
    assert ids1["k"] == ids0["k"] and ids1["s"] == ids0["s"]
    assert ids1["x"] > max(ids0.values())
    assert meta["current-schema-id"] == 1
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert snaps[0]["schema-id"] == 0 and snaps[1]["schema-id"] == 1


def test_iceberg_crash_gap_catchup(spark, tmp_path):
    """A commit whose mirror emission was lost (crash between pointer
    swap and emit, simulated by deleting the newest metadata files)
    must be re-derived by the next commit's catch-up — afterwards
    every snapshot, including the gap, reads correctly."""
    import os

    from ai_fabric_etl_spark.sources.iceberg_mirror import (
        read_iceberg_snapshot,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_ice4"))
    t.overwrite(spark.range(0, 10).selectExpr("id"))
    t.overwrite(spark.range(0, 20).selectExpr("id"))
    md = os.path.join(t.path, "metadata")
    v = t._version()
    os.remove(os.path.join(md, f"v{v}.metadata.json"))
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write(str(v - 1))
    t.overwrite(spark.range(0, 30).selectExpr("id"))
    for ver in range(t._version() + 1):
        got = read_iceberg_snapshot(spark, t.path, snapshot_id=ver).count()
        assert got == t.read(version=ver).count(), ver


def test_iceberg_decimal_precision_edges(spark, tmp_path):
    """Decimal corners (VERDICT r7 item 5): max precision 38, scale 0
    and scale == precision, negative/zero/boundary values — the mirror
    must declare `decimal(p, s)` exactly and the from-scratch reader
    must reproduce the table byte-for-byte through the metadata chain."""
    from decimal import Decimal

    from ai_fabric_etl_spark.sources.iceberg_mirror import (
        read_iceberg_snapshot,
    )

    df = spark.createDataFrame(
        [
            (1, Decimal("9" * 20 + "." + "9" * 18),
             Decimal("1"), Decimal("0." + "0" * 5 + "1")),
            (2, Decimal("-" + "9" * 20 + "." + "9" * 18),
             Decimal("-9"), Decimal("-0.999999")),
            (3, Decimal("0"), Decimal("0"), Decimal("0")),
            (4, None, None, None),
        ],
        "k int, big decimal(38,18), tiny decimal(1,0), frac decimal(6,6)",
    )
    t = ParquetMergeTable(spark, str(tmp_path / "tbl_dec"))
    t.overwrite(df)
    import json
    import os

    md = os.path.join(t.path, "metadata")
    meta = json.load(open(os.path.join(md, "v0.metadata.json")))
    types = {
        f["name"]: f["type"]
        for f in meta["schemas"][0]["fields"]
    }
    assert types["big"] == "decimal(38, 18)"
    assert types["tiny"] == "decimal(1, 0)"
    assert types["frac"] == "decimal(6, 6)"
    back = read_iceberg_snapshot(spark, t.path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_iceberg_nested_struct_evolution_keeps_ids(spark, tmp_path):
    """Adding a sub-field to a nested struct must keep the parent
    field-id AND the sibling sub-field ids (spec: adding a nested
    field is an in-place evolution, not a drop+re-add); an int->long
    promotion keeps its id; a string->int change is a NEW column id."""
    import json
    import os

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_nested"))
    t.overwrite(
        spark.createDataFrame(
            [(1, (10, "x"), "keep")],
            "k int, s struct<a:int, b:string>, c string",
        )
    )
    t.overwrite(
        spark.createDataFrame(
            [(1, (10, "x", 2.5), 7)],
            "k long, s struct<a:int, b:string, extra:double>, c int",
        )
    )
    md = os.path.join(t.path, "metadata")
    meta = json.load(
        open(os.path.join(md, f"v{t._version()}.metadata.json"))
    )
    s0 = next(s for s in meta["schemas"] if s["schema-id"] == 0)
    s1 = next(s for s in meta["schemas"] if s["schema-id"] == 1)

    def by_name(s):
        return {f["name"]: f for f in s["fields"]}

    f0, f1 = by_name(s0), by_name(s1)
    # int->long promotion keeps the id
    assert f1["k"]["id"] == f0["k"]["id"] and f1["k"]["type"] == "long"
    # nested struct: parent id kept, sibling sub-ids kept, new sub-field fresh
    assert f1["s"]["id"] == f0["s"]["id"]
    sub0 = {f["name"]: f["id"] for f in f0["s"]["type"]["fields"]}
    sub1 = {f["name"]: f["id"] for f in f1["s"]["type"]["fields"]}
    assert sub1["a"] == sub0["a"] and sub1["b"] == sub0["b"]
    all_old = {f0["k"]["id"], f0["s"]["id"], f0["c"]["id"], *sub0.values()}
    assert sub1["extra"] not in all_old
    # string->int is NOT a legal promotion: new column id
    assert f1["c"]["id"] not in all_old
    # field-id uniqueness across the evolved schema
    ids = [f1["k"]["id"], f1["s"]["id"], f1["c"]["id"], *sub1.values()]
    assert len(ids) == len(set(ids))


def test_iceberg_expire_snapshots(spark, tmp_path):
    """expire_iceberg_snapshots: retained snapshots still read with
    full parity, expired ids raise, orphaned manifest lists/manifests
    are deleted, and the NEXT commit after expiry emits normally."""
    import os

    from ai_fabric_etl_spark.sources.iceberg_mirror import (
        expire_iceberg_snapshots,
        read_iceberg_snapshot,
    )

    t = ParquetMergeTable(spark, str(tmp_path / "tbl_exp"))
    for n in (10, 20, 30, 40):
        t.overwrite(spark.range(0, n).selectExpr("id"))
    md = os.path.join(t.path, "metadata")
    n_lists_before = len(
        [n for n in os.listdir(md) if n.startswith("snap-")]
    )
    assert n_lists_before == 4

    stats = expire_iceberg_snapshots(t.path, keep_last=2)
    assert stats["expired"] == 2 and stats["retained"] == 2
    assert stats["deleted_manifest_lists"] == 2
    assert len([n for n in os.listdir(md) if n.startswith("snap-")]) == 2
    # retained snapshots: full parity through the metadata chain
    assert read_iceberg_snapshot(spark, t.path).count() == 40
    assert read_iceberg_snapshot(spark, t.path, snapshot_id=2).count() == 30
    # expired snapshot raises
    import pytest as _pt
    with _pt.raises(ValueError, match="not in metadata"):
        read_iceberg_snapshot(spark, t.path, snapshot_id=0)
    # idempotent when nothing to expire
    assert expire_iceberg_snapshots(t.path, keep_last=2)["expired"] == 0
    # next commit emits normally and reads
    t.overwrite(spark.range(0, 50).selectExpr("id"))
    assert read_iceberg_snapshot(spark, t.path).count() == 50
    assert read_iceberg_snapshot(spark, t.path, snapshot_id=3).count() == 40
