"""Scheduled compaction on the continuous admission path (VERDICT r12
item 2): the gates' foreachBatch folds call
``maintenance.maintenance_tick`` every N epochs, so a long-running
stream bounds its per-leaf file counts MECHANICALLY — no operator has
to remember to run maintenance — while decisions stay correct across
every compaction (planted duplicates keep rejecting against their
originals with exact provenance).

The 60-micro-batch loop drives the REAL fold body (admit_media_batch
+ maintenance_tick, exactly what admit_media_stream's fold runs) —
driving 60 triggers through a Structured Streaming query would test
the same code behind ~60s of trigger latency. A short real-stream run
(maxFilesPerTrigger=1) separately proves the wiring fires the tick.
"""

import glob
import os

from ai_fabric_etl_spark.operators import multimodal
from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.streaming.media_admission import (
    admit_media_batch,
    admit_media_stream,
    read_decisions,
)

EPOCHS = 60
EVERY = 10


def _payload(key: str) -> bytearray:
    # fake=True hashes md5(payload): identical bytes == exact dup
    return bytearray(f"media-payload:{key}".encode() * 3)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _leaf_file_counts(path: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        if os.path.basename(f).startswith((".", "_")):
            continue
        out.setdefault(os.path.dirname(f), 0)
        out[os.path.dirname(f)] += 1
    return out


def test_long_stream_bounded_files_and_correct_decisions(spark, tmp_path):
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    multimodal.phash_index_write(
        spark.createDataFrame([], "media_id long, dhash long"),
        idx, n_buckets=16,
    )

    expected_dup_of: dict[int, int] = {}
    for e in range(EPOCHS):
        rows = [(e * 10 + i, _payload(f"novel:{e}:{i}")) for i in range(2)]
        if e % 6 == 5:
            # plant an exact copy of a doc admitted ~3 ticks earlier —
            # it must keep rejecting across all intervening compactions
            src_epoch = max(0, e - 20)
            rows.append((e * 10 + 9, _payload(f"novel:{src_epoch}:0")))
            expected_dup_of[e * 10 + 9] = src_epoch * 10
        admit_media_batch(
            spark, _batch(spark, rows), idx, state,
            epoch_id=e, app_id="t", fake=True,
        )
        maintenance_tick(spark, e, EVERY, [idx], state)

    # --- decisions: every planted copy rejected against its original,
    # every novel admitted (byte-identical to a maintenance-free run
    # by construction: admission is content-determined) ---
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_decisions(spark, state).collect()}
    assert len(d) == EPOCHS * 2 + len(expected_dup_of)
    for mid, dup in expected_dup_of.items():
        assert d[mid] == (False, dup), (mid, d[mid])
    n_admitted = sum(1 for a, _ in d.values() if a)
    assert n_admitted == EPOCHS * 2

    # --- file counts: bounded by the tick cadence, NOT by stream
    # length (without maintenance the busiest leaf would hold one file
    # per touching epoch ~ O(EPOCHS)) ---
    leaf_counts = _leaf_file_counts(idx)
    assert leaf_counts, "index must have data"
    # <= EVERY inserts since the last tick, each adding at most one
    # file per leaf, +1 for the compacted file
    assert max(leaf_counts.values()) <= EVERY + 1, max(leaf_counts.items())

    # the decision ledger: retained versions bounded by retain=2 and
    # the CURRENT version's file count bounded by the tick cadence
    t = ParquetMergeTable(spark, state)
    assert len(t.versions()) <= 2
    cur_files = t._files_abs(t._version())
    assert len(cur_files) <= EVERY + 1, len(cur_files)
    assert t.read().count() == len(d)  # compaction lost nothing
    assert t.last_epoch("t") == EPOCHS - 1  # epoch guard survived ticks


def test_stream_wiring_fires_maintenance(spark, tmp_path):
    """The foreachBatch fold actually invokes the tick: 6 one-file
    triggers with maintenance_every=2 leave every index leaf and the
    ledger compact (1-2 files), which cannot happen without the
    hook (6 inserts into one leaf would hold up to 6 files)."""
    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    multimodal.phash_index_write(
        spark.createDataFrame([], "media_id long, dhash long"),
        idx, n_buckets=1,  # one bucket per chunk: every insert, same leaves
    )
    for i in range(6):
        _batch(spark, [(i, _payload(f"s:{i}"))]).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = admit_media_stream(
        stream, idx, state, checkpoint=str(tmp_path / "ckpt"),
        fake=True, maintenance_every=2,
    )
    q.awaitTermination(120)

    d = read_decisions(spark, state)
    assert d.count() == 6
    assert d.filter("admitted").count() == 6
    leaf_counts = _leaf_file_counts(idx)
    # 6 single-row inserts all touch the same 4 (ci, cb=0) leaves;
    # ticks at epochs 1, 3, 5 compacted them — never more than
    # every_n files accumulate
    assert max(leaf_counts.values()) <= 3, leaf_counts
