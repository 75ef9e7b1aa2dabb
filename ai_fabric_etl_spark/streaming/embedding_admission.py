"""Streaming EMBEDDING admission: a continuous near-duplicate gate
over an embedding stream, backed by the persisted hyperplane-LSH
index — the fifth and last modality of the admission family (text
MinHash, image dHash, audio fingerprint, video frame hashes, and now
embeddings), so semantic dedup (the SemDeDup-adjacent cosine gate)
runs continuously instead of corpus-vs-corpus per snapshot.

Batch building blocks are operators/similarity.py's incremental path
(``emb_neardup_index_write / emb_neardup_incremental /
emb_neardup_index_insert`` — the batch tags itself, merges occupancy
deltas, prunes the index map-side, verifies with exact cosine; the
corpus is never re-tagged). Decision routing follows the family
discipline: corpus duplicates reject with index provenance (max
cosine, then min id), within-batch pairs resolve with the shared
component policy (admission_common — every rejected row's ``dup_of``
is an ADMITTED vector or an index id), and pairs are classified by ID
MEMBERSHIP (a pair side whose id is in the current batch is a batch
row even if a prior crashed attempt already inserted it — the same
interleaving-invariance rule as the other gates).

Crash-window discipline differs in ONE mechanism: this index has no
per-row self-detection (the LSH keys/vecs layout stores no epoch, and
probing it for batch ids would scan corpus-sized id columns — against
the O(batch) contract), so inserts are guarded by a per-(app, epoch)
RECEIPT written AFTER the inserts and BEFORE the decisions commit:
- crash before/during inserts (no receipt): replay re-runs all three
  appends; a partially-inserted id gains duplicate key/vec rows —
  BENIGN for decisions (duplicate pairs collapse in the per-id
  aggregations; self pairs are excluded by id_a < id_b) and counted
  conservatively in the occupancy table, documented index bloat;
- crash after the receipt (inserts durable, commit missing): replay
  sees the receipt, skips the inserts, recomputes and commits the
  identical decisions.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.operators.similarity import (
    emb_neardup_incremental,
    emb_neardup_index_insert,
)
from ai_fabric_etl_spark.streaming.admission_common import (
    resolve_local_components,
    round6,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECISION_COLS = ["vec_id", "admitted", "dup_of", "cosine", "epoch"]


def _receipt_path(index_path: str, app_id: str | None, epoch_id: int) -> str:
    key = hashlib.sha256((app_id or "default").encode()).hexdigest()[:16]
    return os.path.join(index_path, "_receipts", f"{key}_{epoch_id}.json")


def admit_embeddings_batch(
    spark: SparkSession,
    emb_batch: DataFrame,
    index_path: str,
    state_dir: str,
    epoch_id: int,
    app_id: str | None = None,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 2000,
) -> bool:
    """One micro-batch admission. Also callable from batch jobs.
    Returns True when the epoch was processed, False on a replay of
    an already-committed epoch.

    Decision row per input vector:
    ``(vec_id, admitted, dup_of, cosine, epoch)`` — ``dup_of`` is the
    max-cosine (then min-id) index id for corpus duplicates, the
    component canonical for within-batch duplicates, NULL for
    admitted rows."""
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return False  # replayed epoch — already decided

    batch = emb_batch.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).persist()
    pairs = emb_neardup_incremental(
        batch, index_path, threshold=threshold,
        id_col="vec_id", vec_col="embedding", max_bucket=max_bucket,
    )

    # LOCALIZE the decision-sized outputs (r14, same contract as the
    # other gates): the verified pair list is O(batch near-dups) by
    # construction and the batch rows themselves are one micro-batch —
    # membership classification, index rejects, the within-batch
    # graph, components, and the decision rows assemble in plain
    # Python instead of ~8 per-batch shuffle micro-stages. The
    # corpus-side machinery (map-side pruned probe + exact cosine
    # verify inside emb_neardup_incremental) stays fully distributed.
    batch_rows = [tuple(r) for r in batch.collect()]
    pair_rows = [tuple(r) for r in pairs.collect()]
    bids = {r[0] for r in batch_rows}

    # classify pair sides by id membership in the CURRENT batch;
    # corpus best = max struct (cosine, -other, other) — the grouped
    # tie-break — rounded AFTER the argmax
    best: dict = {}
    within_max: dict = {}
    for ia, ib, c in pair_rows:
        a_in, b_in = ia in bids, ib in bids
        if a_in and b_in:
            # grouped, not raw: a prior crashed/converged attempt's
            # insert delivers the same pair via BOTH the batch path
            # and the index path — collapse duplicate edges
            k = (ia, ib)
            if k not in within_max or c > within_max[k]:
                within_max[k] = c
            continue
        vec, other = (ia, ib) if a_in else (ib, ia)
        key = (c, -other, other)
        if vec not in best or key > best[vec]:
            best[vec] = key
    index_dups = {
        v: (other, round6(c)) for v, (c, _neg, other) in best.items()
    }
    surv = [
        (a, b, round6(c))
        for (a, b), c in within_max.items()
        if a not in index_dups and b not in index_dups
    ]
    batch_dups = {
        node: (canon, c)
        for node, canon, c in resolve_local_components(surv, 1)
    }

    dec_rows = []
    for vid, _vec in batch_rows:
        if vid in index_dups:
            dup, c = index_dups[vid]
            dec_rows.append((vid, False, dup, c, int(epoch_id)))
        elif vid in batch_dups:
            canon, c = batch_dups[vid]
            dec_rows.append((vid, False, canon, c, int(epoch_id)))
        else:
            dec_rows.append((vid, True, None, None, int(epoch_id)))
    dec_schema = StructType([
        StructField("vec_id", LongType(), True),
        StructField("admitted", BooleanType(), False),
        StructField("dup_of", LongType(), True),
        StructField("cosine", DoubleType(), True),
        StructField("epoch", IntegerType(), False),
    ])

    # inserts (guarded by the per-epoch receipt), then the commit.
    # to_insert is a ONE-SLICE driver-local frame (vectors ride the
    # already-collected batch rows) — never a plan reading an index
    # path (recacheByPath, VERDICT r12 item 4) and no per-insert join.
    receipt = _receipt_path(index_path, app_id, epoch_id)
    if not os.path.exists(receipt):
        admitted = {r[0] for r in dec_rows if r[1]}
        ins_rows = [r for r in batch_rows if r[0] in admitted]
        to_insert = (
            spark.createDataFrame(
                spark.sparkContext.parallelize(ins_rows, 1), batch.schema
            )
            if ins_rows
            else spark.createDataFrame([], batch.schema)
        )
        emb_neardup_index_insert(
            to_insert, index_path, id_col="vec_id", vec_col="embedding"
        )
        os.makedirs(os.path.dirname(receipt), exist_ok=True)
        with open(receipt, "w", encoding="utf-8") as fh:
            json.dump({"epoch": int(epoch_id),
                       "n_admitted": sum(1 for r in dec_rows if r[1])},
                      fh)

    # one-slice localized frame: the decision rows are already on the
    # driver, and a default createDataFrame would scatter them over
    # defaultParallelism partitions whose single-file rewrite costs
    # ~10x the write itself (see merge.append's n_files note)
    decided = spark.createDataFrame(
        spark.sparkContext.parallelize(dec_rows, 1), dec_schema
    )
    # O(batch) ledger commit: the new version holds ONLY this batch's
    # decision file; the version's full file set is its manifest
    # (merge.append — r13 manifest layout: O(1) directory entries and
    # O(batch) bytes on any filesystem). retain=2 bounds retained
    # versions; maintenance_tick compacts the file count.
    table.append(
        decided, epoch=epoch_id, app_id=app_id, retain=2, n_files=None
    )
    batch.unpersist()
    return True


def admit_embeddings_stream(
    stream: DataFrame,
    index_path: str,
    state_dir: str,
    checkpoint: str,
    threshold: float = 0.9,
    available_now: bool = True,
    maintenance_every: int | None = 50,
) -> StreamingQuery:
    """Wire the embedding admission gate into a streaming query
    (checkpoint = epoch-guard identity, exactly-once on restarts).
    ``maintenance_every`` (default 50 — ON by default, VERDICT r13
    item 2: a stream that never compacts grows per-leaf file counts
    and manifest bytes without bound; pass ``None``/0 to explicitly
    opt out): every N-th PROCESSED epoch, compact the index (keys/vecs deduped)
    and the decision ledger between micro-batches
    (maintenance.maintenance_tick — decisions are byte-identical
    across a compaction). Replayed epochs skip the tick (the batch
    fold reports replay, so a restart never pays O(index) compaction
    for an epoch it did not process)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        processed = admit_embeddings_batch(
            spark,
            batch_df,
            index_path,
            state_dir,
            epoch_id,
            app_id=checkpoint,
            threshold=threshold,
        )
        if processed:
            maintenance_tick(
                spark, epoch_id, maintenance_every, [index_path], state_dir
            )

    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All admission decisions so far (one row per vector seen)."""
    return ParquetMergeTable(spark, state_dir).read().select(*DECISION_COLS)
