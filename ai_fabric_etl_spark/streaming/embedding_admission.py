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
    component_rejects,
    local_id_frame,
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
    ).persist()

    # classify pair sides by id membership in the CURRENT batch
    bids = batch.select("vec_id")
    flagged = (
        pairs.join(
            F.broadcast(bids.select(F.col("vec_id").alias("id_a"))
                        .withColumn("_a", F.lit(1))),
            "id_a", "left",
        )
        .join(
            F.broadcast(bids.select(F.col("vec_id").alias("id_b"))
                        .withColumn("_b", F.lit(1))),
            "id_b", "left",
        )
    )
    corpus_pairs = flagged.filter(
        F.col("_a").isNull() | F.col("_b").isNull()
    ).select(
        F.when(F.col("_a").isNotNull(), F.col("id_a"))
        .otherwise(F.col("id_b")).alias("vec_id"),
        F.when(F.col("_a").isNotNull(), F.col("id_b"))
        .otherwise(F.col("id_a")).alias("other"),
        "cosine",
    )
    index_dups = (
        corpus_pairs.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("cosine").alias("c"),
                            (-F.col("other")).alias("negid"),
                            F.col("other").alias("id"))).alias("_x"))
        .select("vec_id",
                F.col("_x.id").alias("dup_of"),
                F.round(F.col("_x.c"), 6).alias("cosine"))
    )

    # grouped, not raw: when a prior crashed/converged attempt already
    # inserted a batch vector, the same within-batch pair arrives via
    # BOTH the batch path and the index path — duplicate edges would
    # fan out the decision join
    within = (
        flagged.filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("id_a", "id_b")
        .agg(F.round(F.max("cosine"), 6).alias("cosine"))
    )
    surv = within.join(
        index_dups.select(F.col("vec_id").alias("id_a")), "id_a", "left_anti"
    ).join(
        index_dups.select(F.col("vec_id").alias("id_b")), "id_b", "left_anti"
    )
    batch_dups = component_rejects(
        surv, id_col="vec_id", a_col="id_a", b_col="id_b",
        metric_col="cosine",
    )
    rejected = index_dups.unionByName(batch_dups).persist()

    decisions = (
        batch.select("vec_id")
        .join(rejected, "vec_id", "left")
        .select(
            "vec_id",
            F.col("dup_of").isNull().alias("admitted"),
            "dup_of",
            "cosine",
            F.lit(int(epoch_id)).alias("epoch"),
        )
    )
    dec_schema = decisions.schema
    dec_rows = decisions.collect()  # localized before the inserts

    # inserts (guarded by the per-epoch receipt), then the commit.
    # to_insert is pure-batch (persisted batch x a driver-local id
    # frame riding dec_rows) — NOT `batch anti-join rejected`: the
    # insert writes keys, then vecs, then the counts fold, and
    # rejected's lineage reads those index paths, so after the first
    # append Spark's recacheByPath invalidates it and each later
    # write would re-run the full embedding probe against the grown
    # index (the paired-gate bug, VERDICT r12 item 4 — same fix).
    receipt = _receipt_path(index_path, app_id, epoch_id)
    if not os.path.exists(receipt):
        to_insert = batch.join(
            F.broadcast(local_id_frame(
                spark,
                [r.vec_id for r in dec_rows if r.admitted],
                col="vec_id",
            )),
            "vec_id",
        )
        emb_neardup_index_insert(
            to_insert, index_path, id_col="vec_id", vec_col="embedding"
        )
        os.makedirs(os.path.dirname(receipt), exist_ok=True)
        with open(receipt, "w", encoding="utf-8") as fh:
            json.dump({"epoch": int(epoch_id),
                       "n_admitted": sum(1 for r in dec_rows if r.admitted)},
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
    rejected.unpersist()
    batch.unpersist()
    pairs.unpersist()
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
