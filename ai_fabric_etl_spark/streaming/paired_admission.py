"""Cross-modal PAIRED admission: a (document text, image) pair gate
that admits only when BOTH modalities are novel — the multimodal
training-pair curation shape (LAION-style caption+image corpora dedup
on either side: the same caption re-used for a new image, or the same
image re-captioned, are both duplicates a contrastive pair corpus
must reject).

One decision, one epoch guard, two indexes: the pair's text probes
the MinHash LSH index (streaming/text_admission machinery) and its
image probes the perceptual-hash index (streaming/media_admission
machinery) IN THE SAME TRANSACTION; rejection provenance names which
modality matched (``reject_modality``: 'text' / 'image' / 'both' for
index or direct within-batch matches, 'chain' for transitive
within-batch component members). Within-batch policy is the shared
component rule (admission_common) over the UNION of the two
modalities' pair graphs — a pair is near-duplicate if EITHER side
matches, so the union graph is the right adjacency for the
one-representative-per-component policy, and every rejected pair's
``dup_of`` names an ADMITTED pair or index ids.

Write order (crash-window convergence, one epoch for both indexes):
text sigs -> text bands -> image chunks -> decisions commit. Text
self-detection keys on band rows, image self-detection on same-id
probe matches, and each modality re-inserts independently on replay —
so a crash between ANY two writes converges: whichever half is
already durable is skipped, whichever is missing is re-inserted, and
corpus-dup classification excludes all current-batch ids (the
interleaving-invariance rule both single-modality gates follow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators import multimodal
from ai_fabric_etl_spark.operators.dedup import sig_store_append
from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.streaming.admission_common import (
    component_rejects,
    local_id_frame,
    phase_timer,
)
from ai_fabric_etl_spark.streaming.text_admission import _text_probe

DECISION_COLS = [
    "pair_id", "admitted", "reject_modality",
    "text_dup_of", "text_jaccard", "image_dup_of", "image_hamming",
    "epoch",
]


def admit_pairs_batch(
    spark: SparkSession,
    pairs_batch: DataFrame,
    text_index_path: str,
    image_index_path: str,
    state_dir: str,
    epoch_id: int,
    app_id: str | None = None,
    id_col: str = "pair_id",
    text_col: str = "text",
    payload_col: str = "payload",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    fake: bool = False,
) -> bool:
    """One micro-batch of paired admission. Also callable from batch
    jobs. ``pairs_batch`` carries ``(pair_id, text, payload)``; the
    pair id is the unit of admission for BOTH indexes (the text index
    stores it as doc_id, the image index as media_id — one id space).

    Decision row per input pair: ``(pair_id, admitted,
    reject_modality, text_dup_of, text_jaccard, image_dup_of,
    image_hamming, epoch)`` — for within-batch rejects both dup_of
    columns name the component canonical (an ADMITTED pair), with the
    per-modality metric NULL when that modality has no direct edge to
    the canonical."""
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return False  # replayed epoch — already decided
    mark = phase_timer("paired")

    # --- text side (shared probe with the single-modality gate) ---
    scratch: list = []
    sig, bk, t_self, t_index_dups, t_within, occ = _text_probe(
        spark, text_index_path,
        pairs_batch.select(F.col(id_col).alias("doc_id"), text_col),
        text_col, threshold, num_hashes, bands, n, max_bucket,
        on_oversize="raise", stats_out=None, what="admit_pairs_batch",
        scratch=scratch,
    )
    mark("text probe built (incl. sb-prune collect)")

    # --- image side ---
    # one row per INPUT pair; NULL dhash = undecodable image payload
    # (quarantine — a poison pair must not fail the micro-batch)
    hashes = multimodal.dhash64(
        pairs_batch, fake=fake, id_col=id_col, payload_col=payload_col,
        on_error="null",
    ).withColumnRenamed(id_col, "doc_id").persist()
    hashed = hashes.filter(F.col("dhash").isNotNull())
    probe = multimodal.phash_index_probe(
        spark, image_index_path, hashed, max_hamming=max_hamming,
        id_col="doc_id", scratch=scratch, with_chunk_hits=True,
    ).persist()
    # full-presence self-detection (ADVICE r11): skip the re-insert
    # only when all 4 chunk rows are durable. n_chunk_hits is exact
    # here because the probe runs with on_oversize='raise' (a hot
    # bucket raises before any decision, so the hot filter was empty
    # whenever this evaluates — see the media gate's note; ADVICE
    # r12's under-count is a drop-mode hazard, covered by
    # phash_index_presence for drop-mode callers).
    i_self = probe.filter(
        (F.col("batch_id") == F.col("index_id"))
        & (F.col("n_chunk_hits") >= 4)
    ).select(F.col("batch_id").alias("doc_id")).distinct()
    batch_ids = hashed.select(F.col("doc_id").alias("index_id")).distinct()
    i_index_dups = (
        probe.join(F.broadcast(batch_ids), "index_id", "left_anti")
        .groupBy("batch_id")
        .agg(F.min(F.struct("hamming", "index_id")).alias("_b"))
        .select(
            F.col("batch_id").alias("doc_id"),
            F.col("_b.index_id").alias("dup_of"),
            F.col("_b.hamming").alias("hamming"),
        )
    )

    # --- index rejections: EITHER modality matching rejects ---
    # persisted: decision-sized, but its lineage is BOTH probes — the
    # commit path otherwise re-runs the full probe machinery once per
    # downstream action (measured 5x at bench scale)
    index_rejected = (
        t_index_dups.select(
            "doc_id",
            F.col("dup_of").alias("text_dup_of"),
            F.col("jaccard").alias("text_jaccard"),
        )
        .join(
            i_index_dups.select(
                "doc_id",
                F.col("dup_of").alias("image_dup_of"),
                F.col("hamming").alias("image_hamming"),
            ),
            "doc_id",
            "full_outer",
        )
    ).persist()

    # --- within-batch: component policy over the UNION graph ---
    i_within = multimodal.phash_near_pairs(
        hashed, max_hamming=max_hamming, id_col="doc_id"
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"),
        "hamming",
    )
    edges = (
        t_within.select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("text_jaccard"),
            F.lit(None).cast("int").alias("image_hamming"),
        )
        .unionByName(
            i_within.select(
                "doc_a", "doc_b",
                F.lit(None).cast("double").alias("text_jaccard"),
                F.col("hamming").alias("image_hamming"),
            )
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("text_jaccard").alias("text_jaccard"),
            F.min("image_hamming").alias("image_hamming"),
        )
    )
    # a QUARANTINED pair (undecodable image) must never enter the
    # within-batch graph (ADVICE r12): its text side still produces
    # t_within edges, and as a component minimum it would become the
    # canonical — a decodable pair rejected against it would point at
    # a pair that was never admitted, losing that content everywhere.
    # Mirror the image side's frame: edges restricted to DECODED pairs
    # on both endpoints (the quarantined pair's own 'decode' decision
    # is made independently below; its sides are never inserted).
    surv_edges = (
        edges.join(
            hashed.select(F.col("doc_id").alias("doc_a")), "doc_a",
            "left_semi",
        )
        .join(
            hashed.select(F.col("doc_id").alias("doc_b")), "doc_b",
            "left_semi",
        )
        .join(
            index_rejected.select(F.col("doc_id").alias("doc_a")), "doc_a",
            "left_anti",
        )
        .join(
            index_rejected.select(F.col("doc_id").alias("doc_b")), "doc_b",
            "left_anti",
        )
    )
    batch_rejected = component_rejects(
        surv_edges, id_col="doc_id", a_col="doc_a", b_col="doc_b",
        metric_col="text_jaccard", extra_metric_cols=("image_hamming",),
    ).select(
        "doc_id",
        F.when(F.col("text_jaccard").isNotNull(), F.col("dup_of"))
        .alias("text_dup_of"),
        "text_jaccard",
        F.when(F.col("image_hamming").isNotNull(), F.col("dup_of"))
        .alias("image_dup_of"),
        "image_hamming",
        F.col("dup_of").alias("_canonical"),
    )

    modality = (
        F.when(
            F.col("text_jaccard").isNotNull()
            & F.col("image_hamming").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("text_jaccard").isNotNull(), F.lit("text"))
        .when(F.col("image_hamming").isNotNull(), F.lit("image"))
        .otherwise(F.lit("chain"))
    )
    rejected = (
        index_rejected.select(
            "doc_id", "text_dup_of", "text_jaccard",
            "image_dup_of", "image_hamming",
            F.when(
                F.col("text_dup_of").isNotNull()
                & F.col("image_dup_of").isNotNull(),
                F.lit("both"),
            )
            .when(F.col("text_dup_of").isNotNull(), F.lit("text"))
            .otherwise(F.lit("image"))
            .alias("reject_modality"),
        )
        .unionByName(
            batch_rejected.select(
                "doc_id",
                F.coalesce("text_dup_of", "_canonical").alias("text_dup_of"),
                "text_jaccard",
                F.coalesce("image_dup_of", "_canonical")
                .alias("image_dup_of"),
                "image_hamming",
                modality.alias("reject_modality"),
            )
        )
    ).persist()

    # decisions cover EVERY input pair (ADVICE r11): the text side's
    # sig frame always carries one row per pair, and the image hasher
    # emits a NULL-hash row per undecodable payload (on_error='null')
    # — a pair with an undecodable image quarantines
    # (admitted=false, reject_modality='decode', NULL dup_ofs) and
    # neither of its sides is inserted into an index. Both frames are
    # already persisted: no second pass over the batch source.
    decoded = hashes.filter(F.col("dhash").isNotNull()).select(
        "doc_id"
    ).withColumn("_decoded", F.lit(True))
    decisions = (
        sig.select("doc_id")
        .join(decoded, "doc_id", "left")
        .join(rejected, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            (F.col("_decoded").isNotNull()
             & F.col("reject_modality").isNull()).alias("admitted"),
            F.when(
                F.col("_decoded").isNull()
                & F.col("reject_modality").isNull(),
                F.lit("decode"),
            ).otherwise(F.col("reject_modality")).alias("reject_modality"),
            "text_dup_of", "text_jaccard", "image_dup_of", "image_hamming",
            F.lit(int(epoch_id)).alias("epoch"),
        )
    )
    dec_schema = decisions.schema
    dec_rows = decisions.collect()  # localized before the appends
    mark("decisions collected (probes + jaccard verify + components)")

    # --- inserts (text sigs -> text bands -> image), then commit ---
    # EVERY append's source plan below is pure-batch (sig/bk/hashed) +
    # driver-local id frames — never a plan reading an index path. The
    # admitted ids ride dec_rows; the self sets and the touched-bucket
    # occupancy are collected ONCE, BEFORE the first append, because
    # Spark invalidates cached frames whose lineage reads an appended
    # path (recacheByPath) — leaving these lazy made the bands append
    # and the image insert each re-run the full text probe + Jaccard
    # verify against the GROWN index (measured 5-7s extra per batch
    # at sf0.1 — VERDICT r12 item 4's missing half).
    admitted_ids = [r[0] for r in dec_rows if r[1]]
    t_self_set = {r.doc_id for r in t_self.collect()}
    i_self_set = {r.doc_id for r in i_self.collect()}
    occ_rows = occ.collect()  # touched buckets only — batch-sized
    t_ins = F.broadcast(local_id_frame(
        spark, [i for i in admitted_ids if i not in t_self_set]
    ))
    sig_store_append(
        sig.join(t_ins, "doc_id").select("doc_id", "hs"),
        text_index_path,
    )
    mark("text sigs appended")
    new_bk = bk.join(t_ins, "doc_id")
    occ_loc = (
        spark.createDataFrame(
            spark.sparkContext.parallelize(occ_rows, 1), occ.schema
        )
        if occ_rows
        else spark.createDataFrame([], occ.schema)
    )
    occ_now = occ_loc.select("band", "bucket", F.col("_n").alias("_prior_n"))
    delta = new_bk.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_d")
    )
    sized = new_bk.join(
        F.broadcast(delta.join(occ_now, ["band", "bucket"], "left")),
        ["band", "bucket"],
    ).select(
        "doc_id", "bucket",
        (F.coalesce("_prior_n", F.lit(0)) + F.col("_d")).alias("bucket_size"),
        "band",
    )
    sized.write.partitionBy("band").mode("append").parquet(
        f"{text_index_path}/bands"
    )
    mark("text bands appended")
    i_insert = hashed.join(
        F.broadcast(local_id_frame(
            spark, [i for i in admitted_ids if i not in i_self_set]
        )),
        "doc_id",
    ).select("doc_id", "dhash")
    multimodal.phash_index_insert(
        spark, image_index_path, i_insert, id_col="doc_id"
    )
    mark("image chunks inserted")

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
    mark("decision ledger committed")
    rejected.unpersist()
    index_rejected.unpersist()
    sig.unpersist()
    bk.unpersist()
    hashes.unpersist()
    probe.unpersist()
    occ.unpersist()
    for fr in scratch:
        fr.unpersist()
    return True


def admit_pairs_stream(
    stream: DataFrame,
    text_index_path: str,
    image_index_path: str,
    state_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
    max_hamming: int = 3,
    fake: bool = False,
    available_now: bool = True,
    maintenance_every: int | None = 50,
) -> StreamingQuery:
    """Wire the paired gate into a streaming query (checkpoint =
    epoch-guard identity, exactly-once across restarts).
    ``maintenance_every`` (default 50 — ON by default, VERDICT r13
    item 2: a stream that never compacts grows per-leaf file counts
    and manifest bytes without bound; pass ``None``/0 to explicitly
    opt out): every N-th PROCESSED epoch, compact the indexes (BOTH indexes)
    and the decision ledger between micro-batches
    (maintenance.maintenance_tick — decisions are byte-identical
    across a compaction). Replayed epochs skip the tick (the batch
    fold reports replay, so a restart never pays O(index) compaction
    for an epoch it did not process)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        processed = admit_pairs_batch(
            spark,
            batch_df,
            text_index_path,
            image_index_path,
            state_dir,
            epoch_id,
            app_id=checkpoint,
            threshold=threshold,
            max_hamming=max_hamming,
            fake=fake,
        )
        if processed:
            maintenance_tick(
                spark, epoch_id, maintenance_every,
                [text_index_path, image_index_path], state_dir,
            )

    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All paired admission decisions so far (one row per pair)."""
    return ParquetMergeTable(spark, state_dir).read().select(*DECISION_COLS)
