"""Streaming media admission: continuous near-duplicate gates over
image, AUDIO, and VIDEO streams, backed by the persisted perceptual
indexes.

The batch building blocks are operators/multimodal.py's incremental
paths (``phash_index_write/probe/insert`` for 64-bit image/audio
hashes, ``video_index_write/probe/insert`` for per-frame hashes —
O(batch) admission, the corpus is never re-hashed); this module is
their Structured-Streaming face: every micro-batch of media rows is
hashed, probed against the index, routed (admit /
reject-with-provenance), and the admitted hashes fold into the index
— so a training-data ingest keeps EVERY media modality near-dup-free
continuously instead of re-running corpus dedup per snapshot (r10
shipped image+text; r11 completes audio — same machinery, the index
trio is hash-agnostic — and video, whose gate is frame-aligned with
the ±max_shift offset window so head-trimmed re-uploads reject too).
The reference has no streaming media path; this follows the repo's
foreachBatch state discipline (streaming/running_aggs.py): epoch ids
ride in the decisions table's pointer scoped to the checkpoint
identity, replayed epochs skip.

Crash-window idempotency (the index insert and the decisions commit
cannot be one atomic swap — they live in different stores): the
insert runs FIRST, the epoch commit LAST. A crash after the insert
replays the whole epoch (the guard has not advanced), and the probe
step classifies an EXACT same-id index match as "this batch's rows
from a prior partially-completed attempt" (a media id is unique in
the stream, so batch_id == index_id can only be the batch's own
earlier insert): those rows keep their admit decision and are NOT
re-inserted. The reverse order would lose admitted rows from the
index forever — a committed epoch skips on replay. Pytest-gated in
both directions (convergence, and the ordering itself).

Within-batch policy: one representative per near-dup component — the
component canonical (smallest id) is admitted, every other member is
rejected against it (see streaming/admission_common.py for the full
policy statement and the invariant that dup_of always names an
ADMITTED doc or an index id). Oversize-bucket policy is inherited
from the probe (raise by default — see multimodal.phash_index_probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators import multimodal
from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.streaming.admission_common import (
    component_rejects,
    phase_timer,
)

DECISION_COLS = ["media_id", "admitted", "dup_of", "hamming", "epoch"]


def _hash_batch(
    media_batch: DataFrame,
    modality: str,
    fake: bool,
    id_col: str,
    payload_col: str,
) -> DataFrame:
    """(id, dhash) for the modality's 64-bit perceptual hash — the
    index machinery is hash-agnostic, so audio fingerprints ride the
    same trio under the index's canonical column name. on_error='null'
    keeps one row per INPUT id (NULL hash for undecodable payloads):
    the gate quarantines them instead of letting a poison payload fail
    the micro-batch forever, and the decision rows can ride this one
    persisted frame — no second pass over the batch source."""
    if modality == "image":
        return multimodal.dhash64(
            media_batch, fake=fake, id_col=id_col, payload_col=payload_col,
            on_error="null",
        )
    if modality == "audio":
        return multimodal.audio_fp64(
            media_batch, fake=fake, id_col=id_col, payload_col=payload_col,
            on_error="null",
        ).withColumnRenamed("afp", "dhash")
    raise ValueError(
        f"modality must be 'image' or 'audio', got {modality!r} "
        "(video has its own frame-aligned gate: admit_video_batch)"
    )


def admit_media_batch(
    spark: SparkSession,
    media_batch: DataFrame,
    index_path: str,
    state_dir: str,
    epoch_id: int,
    app_id: str | None = None,
    max_hamming: int = 3,
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality: str = "image",
) -> bool:
    """One micro-batch admission. Also callable from batch jobs.
    Returns True when the epoch was processed, False when it was a
    replay of an already-committed epoch (callers use this to skip
    post-commit work such as the maintenance tick).

    ``modality`` selects the 64-bit hasher — ``"image"`` (dHash) or
    ``"audio"`` (energy-trend fingerprint); everything downstream
    (index trio, banding, component policy, epoch/crash discipline)
    is hash-agnostic and identical. Decision row per input media id:
    ``(media_id, admitted, dup_of, hamming, epoch)`` — ``dup_of`` is
    the min-hamming (then min-id) index id for corpus duplicates, the
    component canonical (an ADMITTED smaller batch id) for
    within-batch duplicates, NULL for admitted rows. An UNDECODABLE
    payload (no hash row) quarantines: ``admitted=false`` with NULL
    ``dup_of`` — the only rejected shape without provenance, so it is
    distinguishable from every dup rejection."""
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return False  # replayed epoch after restart — already decided
    mark = phase_timer(f"media:{modality}")

    # one row per INPUT id; NULL dhash = undecodable (quarantine)
    hashes = _hash_batch(
        media_batch, modality, fake, id_col, payload_col
    ).persist()
    hashed = hashes.filter(F.col("dhash").isNotNull())
    # scratch: the probe's internal persisted frame, unpersisted at
    # batch end (ADVICE r11 — bounded block-store lifetime on the
    # continuous path)
    scratch: list = []
    probe = multimodal.phash_index_probe(
        spark, index_path, hashed, max_hamming=max_hamming, id_col=id_col,
        scratch=scratch, with_chunk_hits=True,
    ).persist()

    # batch_id == index_id can only be this batch's own rows from a
    # prior attempt that crashed between index insert and the epoch
    # commit: keep their (admitted) decision, skip their re-insert.
    # Skip ONLY when the id's insert is COMPLETE (all 4 chunk rows
    # durable — ADVICE r11): the partitioned append is not atomic
    # across (ci, cb) dirs, so a crash mid-insert can leave 1-3 chunk
    # rows, and skipping on any single chunk match would permanently
    # under-index the id. A partial id re-inserts in full — the rows
    # already present become exact duplicates, which the probe
    # de-duplicates (candidate .distinct()) and compact_index removes.
    #
    # The probe's n_chunk_hits IS an exact completeness check HERE
    # because this gate probes with on_oversize='raise' (the default):
    # a hot bucket raises the whole batch during the hot-key
    # evaluation, before any decision — so whenever execution reaches
    # this filter, the hot-bucket set was empty and post-filter chunk
    # hits equal durable rows. ADVICE r12's under-count scenario
    # (post-hot-filter hits on a fully-inserted id) is a DROP-mode
    # hazard; a drop-mode caller must judge completeness with
    # multimodal.phash_index_presence on the ids' own pruned
    # partitions instead (the video gate's structure).
    self_ids = probe.filter(
        (F.col("batch_id") == F.col("index_id"))
        & (F.col("n_chunk_hits") >= 4)
    ).select(F.col("batch_id").alias(id_col)).distinct()
    # corpus duplicates exclude ALL matches whose index id is in the
    # current batch (not just same-id): stream ids are unique, so an
    # index row carrying ANY batch id is the batch's own insert from
    # a prior crashed attempt. Classifying those as corpus dups would
    # remove their edges from the within-batch graph below and make
    # the DECISIONS depend on the crash interleaving; routed through
    # the batch graph instead, replay computes exactly the clean
    # run's decisions and index contents.
    batch_ids = hashed.select(F.col(id_col).alias("index_id")).distinct()
    index_dups = (
        probe.join(F.broadcast(batch_ids), "index_id", "left_anti")
        .groupBy("batch_id")
        .agg(
            F.min(F.struct("hamming", "index_id")).alias("_best")
        )
        .select(
            F.col("batch_id").alias(id_col),
            F.col("_best.index_id").alias("dup_of"),
            F.col("_best.hamming").alias("hamming"),
        )
    )

    # within-batch: one representative per near-dup component (see
    # admission_common). Edges are restricted to probe SURVIVORS on
    # both sides — an index duplicate keeps its index provenance and
    # must not stitch two otherwise-unrelated survivors together.
    batch_pairs = multimodal.phash_near_pairs(
        hashed, max_hamming=max_hamming, id_col=id_col
    )
    surv_pairs = batch_pairs.join(
        index_dups.select(F.col(id_col).alias("id_a")), "id_a", "left_anti"
    ).join(
        index_dups.select(F.col(id_col).alias("id_b")), "id_b", "left_anti"
    )
    batch_dups = component_rejects(
        surv_pairs, id_col=id_col, a_col="id_a", b_col="id_b",
        metric_col="hamming",
    )

    # persisted: decision-sized, evaluated by the insert AND the
    # commit (the batch pair graph would otherwise recompute per use)
    rejected = index_dups.unionByName(batch_dups).persist()

    # ORDERING INVARIANT: the index insert happens BEFORE the epoch
    # commit. A crash after the insert replays the epoch (the guard
    # has not advanced) and the same-id self-detection above skips the
    # re-insert; a crash before the insert replays everything. The
    # reverse order would be unrecoverable: a committed epoch whose
    # insert never ran skips on replay and the admitted hashes are
    # lost from the index forever.
    #
    # The batch's decision rows are LOCALIZED (collect) before the
    # insert: their plan probes the index path, and Spark's cache
    # auto-refresh on append (recacheByPath) would otherwise re-read
    # the just-grown index when the commit evaluates them. One row per
    # input media id — micro-batch-sized, never corpus-sized.
    # decisions cover EVERY input id (ADVICE r11): the hasher emits a
    # NULL-hash row per undecodable payload (on_error='null'), so one
    # left join over the persisted hash frame covers admit / reject /
    # quarantine without re-reading the batch source. Quarantine shape:
    # admitted=false with NULL dup_of — the only rejected rows without
    # provenance (a dup reject always names its dup_of).
    decisions = (
        hashes.select(id_col, "dhash")
        .join(rejected, id_col, "left")
        .select(
            F.col(id_col),
            (F.col("dhash").isNotNull() & F.col("dup_of").isNull())
            .alias("admitted"),
            "dup_of",
            "hamming",
            F.lit(int(epoch_id)).alias("epoch"),
        )
    )
    dec_schema = decisions.schema
    dec_rows = decisions.collect()
    mark("decisions collected (hash + probe + components)")

    to_insert = (
        hashed.join(rejected, id_col, "left_anti")
        .join(self_ids, id_col, "left_anti")
        .select(id_col, "dhash")
    )
    multimodal.phash_index_insert(spark, index_path, to_insert, id_col=id_col)
    mark("index chunks inserted")

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
    hashes.unpersist()
    probe.unpersist()
    for fr in scratch:
        fr.unpersist()
    return True


def admit_media_stream(
    stream: DataFrame,
    index_path: str,
    state_dir: str,
    checkpoint: str,
    max_hamming: int = 3,
    fake: bool = False,
    available_now: bool = True,
    modality: str = "image",
    maintenance_every: int | None = 50,
) -> StreamingQuery:
    """Wire the admission gate into a streaming query. The checkpoint
    location is the epoch-guard app identity (restart on the same
    checkpoint resumes exactly-once; a fresh checkpoint resets).

    ``maintenance_every`` (default 50 — ON by default, VERDICT r13
    item 2: a stream that never compacts grows per-leaf file counts
    and manifest bytes without bound; pass ``None``/0 to explicitly
    opt out): every N-th PROCESSED epoch, compact the index
    and the decision ledger between micro-batches
    (maintenance.maintenance_tick — decisions are byte-identical
    across a compaction). Replayed epochs skip the tick (the batch
    fold reports replay, so a restart never pays O(index) compaction
    for an epoch it did not process)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        processed = admit_media_batch(
            spark,
            batch_df,
            index_path,
            state_dir,
            epoch_id,
            app_id=checkpoint,
            max_hamming=max_hamming,
            fake=fake,
            modality=modality,
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


def admit_audio_batch(*args, **kwargs) -> bool:
    """:func:`admit_media_batch` with the audio fingerprint hasher —
    the continuous-admission face of audio near-dup (VERDICT r10 #1:
    audio was batch-only; a training ingest re-ran corpus-vs-corpus
    dedup per snapshot)."""
    kwargs["modality"] = "audio"
    return admit_media_batch(*args, **kwargs)


def admit_audio_stream(*args, **kwargs) -> StreamingQuery:
    """:func:`admit_media_stream` over audio fingerprints."""
    kwargs["modality"] = "audio"
    return admit_media_stream(*args, **kwargs)


def read_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All admission decisions so far (one row per media id seen)."""
    return ParquetMergeTable(spark, state_dir).read().select(*DECISION_COLS)


# ---------------------------------------------------------------------------
# video admission: frame-aligned, backed by the video frame-hash index
# ---------------------------------------------------------------------------

VIDEO_DECISION_COLS = [
    "media_id", "admitted", "dup_of", "matched_frames", "shift", "epoch",
]


def admit_video_batch(
    spark: SparkSession,
    media_batch: DataFrame,
    index_path: str,
    state_dir: str,
    epoch_id: int,
    app_id: str | None = None,
    max_hamming: int = 3,
    min_frames: int = 2,
    max_shift: int = 2,
    every_n: int = 1,
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> bool:
    """One micro-batch of VIDEO admission — same epoch/crash/ordering
    discipline as :func:`admit_media_batch`, but per-frame: the batch
    decodes once into frame dHashes, probes the persisted frame index
    at every offset in [-max_shift, +max_shift]
    (multimodal.video_index_probe — head-trimmed re-uploads of an
    indexed clip are duplicates too), resolves within-batch pairs
    with the component policy (video_near_pairs edges), and folds the
    admitted clips' frame hashes into the index BEFORE the epoch
    commit. Decision row:
    ``(media_id, admitted, dup_of, matched_frames, shift, epoch)`` —
    matched_frames/shift are the winning alignment's evidence, NULL
    for admitted rows and for transitive within-batch members."""
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return False  # replayed epoch after restart — already decided
    mark = phase_timer("video")

    # on_error='null': a corrupt/unsniffable clip emits no frame rows
    # (ADVICE r12 — symmetric with the image/audio hashers' policy)
    # and quarantines through the zero-frame decision path below
    fh = multimodal.video_frame_hashes(
        media_batch, every_n=every_n, fake=fake,
        id_col=id_col, payload_col=payload_col, on_error="null",
    ).persist()
    scratch: list = []
    probe = multimodal.video_index_probe(
        spark, index_path, fh, max_hamming=max_hamming,
        min_frames=min_frames, max_shift=max_shift, id_col=id_col,
        scratch=scratch,
    ).persist()

    # self-detection requires the id's insert to be COMPLETE (every
    # (frame_idx, chunk) row durable — ADVICE r11, same rationale as
    # the image/audio gate's phash_index_presence check): a partial
    # insert re-inserts in full, duplicates are probe-harmless
    self_cand = probe.filter(F.col("batch_id") == F.col("index_id")).select(
        F.col("batch_id").alias(id_col)
    ).distinct()
    if self_cand.limit(1).count() == 0:  # no crash replay: skip scan
        self_ids = self_cand
    else:
        self_ids = (
            multimodal.video_index_presence(
                spark, index_path,
                fh.join(self_cand, id_col, "left_semi"),
                id_col=id_col,
            )
            .filter(F.col("n_rows") >= F.col("n_expected"))
            .select(id_col)
        )
    # exclude ALL matches against this batch's own ids (a prior
    # crashed attempt's insert) — same interleaving-invariance
    # argument as the image/audio gate
    batch_ids = fh.select(F.col(id_col).alias("index_id")).distinct()
    index_dups = (
        probe.join(F.broadcast(batch_ids), "index_id", "left_anti")
        .groupBy("batch_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_matching_frames").alias("nm"),
                    (-F.col("index_id")).alias("negid"),
                    F.col("index_id").alias("id"),
                    F.col("shift").alias("shift"),
                )
            ).alias("_b")
        )
        .select(
            F.col("batch_id").alias(id_col),
            F.col("_b.id").alias("dup_of"),
            F.col("_b.nm").alias("matched_frames"),
            F.col("_b.shift").alias("shift"),
        )
    )

    batch_pairs = multimodal.video_near_pairs(
        fh, max_hamming=max_hamming, min_frames=min_frames,
        max_shift=max_shift, id_col=id_col,
    )
    surv_pairs = batch_pairs.join(
        index_dups.select(F.col(id_col).alias("id_a")), "id_a", "left_anti"
    ).join(
        index_dups.select(F.col(id_col).alias("id_b")), "id_b", "left_anti"
    )
    batch_dups = component_rejects(
        surv_pairs.withColumn(
            "matched_frames", F.col("n_matching_frames")
        ),
        id_col=id_col, a_col="id_a", b_col="id_b",
        metric_col="matched_frames", extra_metric_cols=("shift",),
    )

    rejected = index_dups.unionByName(batch_dups).persist()

    # decisions cover EVERY input clip (ADVICE r11): a payload that
    # decodes to zero frames yields no frame-hash rows and would
    # otherwise silently get no decision — it quarantines instead
    # (admitted=false, NULL dup_of; see admit_media_batch)
    decisions = (
        media_batch.select(id_col).distinct()
        .join(
            fh.select(id_col).distinct().withColumn("_decoded", F.lit(True)),
            id_col, "left",
        )
        .join(rejected, id_col, "left")
        .select(
            F.col(id_col),
            (F.col("_decoded").isNotNull() & F.col("dup_of").isNull())
            .alias("admitted"),
            "dup_of",
            "matched_frames",
            "shift",
            F.lit(int(epoch_id)).alias("epoch"),
        )
    )
    dec_schema = decisions.schema
    dec_rows = decisions.collect()
    mark("decisions collected (decode + probe + alignment + components)")

    to_insert = (
        fh.join(rejected, id_col, "left_anti")
        .join(self_ids, id_col, "left_anti")
        .select(id_col, "frame_idx", "fhash")
    )
    multimodal.video_index_insert(spark, index_path, to_insert, id_col=id_col)
    mark("frame chunks inserted (incl. presence check for self candidates)")

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
    fh.unpersist()
    probe.unpersist()
    for fr in scratch:
        fr.unpersist()
    return True


def admit_video_stream(
    stream: DataFrame,
    index_path: str,
    state_dir: str,
    checkpoint: str,
    max_hamming: int = 3,
    min_frames: int = 2,
    max_shift: int = 2,
    fake: bool = False,
    available_now: bool = True,
    maintenance_every: int | None = 50,
) -> StreamingQuery:
    """Wire the video admission gate into a streaming query.
    ``maintenance_every``: see :func:`admit_media_stream` (default-on,
    processed epochs only)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        processed = admit_video_batch(
            spark,
            batch_df,
            index_path,
            state_dir,
            epoch_id,
            app_id=checkpoint,
            max_hamming=max_hamming,
            min_frames=min_frames,
            max_shift=max_shift,
            fake=fake,
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


def read_video_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All video admission decisions so far (one row per clip seen)."""
    return ParquetMergeTable(spark, state_dir).read().select(
        *VIDEO_DECISION_COLS
    )
