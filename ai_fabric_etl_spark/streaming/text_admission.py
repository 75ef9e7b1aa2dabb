"""Streaming text admission: a continuous near-duplicate gate over a
document stream, backed by the persisted MinHash LSH index.

The text sibling of :mod:`streaming.media_admission` — together they
make corpus dedup CONTINUOUS for both modalities instead of a
re-run-per-snapshot batch job. Batch building blocks:
``dedup.minhash_index_write`` persists signatures + band keys once;
each micro-batch here shingles and signs ONLY itself (O(batch)),
probes the band-partitioned index map-side, verifies candidates with
EXACT Jaccard against the stored shingle sets, routes every doc
(admit / reject with best-match provenance), and appends the admitted
docs' band keys + signatures so later batches dedup against them.

Skew policy (r10 idiom, shared with multimodal.phash_index_probe):
the probe computes LIVE per-(band, bucket) occupancy on the
broadcast-pruned index scan — never trusting the build-time
``bucket_size`` column, which goes stale as inserts append — and a
bucket over ``max_bucket`` raises by default or drops with counters
(``stats_out``: dropped_buckets/dropped_rows). Appended band rows
stamp ``bucket_size`` with the bucket's occupancy AS OF their insert
(monotone within a bucket), so the batch-path
``minhash_dedup_incremental`` stored-size guard stays meaningful for
them; its guard is still build-time-approximate on grown indexes —
this module's live count is the admission-path guarantee.

Epoch discipline and crash-window convergence follow
media_admission: epoch ids ride the decisions table pointer
(replay-skip); a probe match with ``index id == batch id`` can only
be the batch's own insert from a prior crashed attempt (ids are
unique in the stream), so those rows keep their admit decision and
are not re-inserted — any interleaving converges. Write order is
sigs -> bands -> decisions commit: self-detection keys on band rows,
so a crash between the appends leaves orphan sigs (benign duplicate
on re-insert), never band keys whose signatures are permanently
suppressed; the commit runs last so a skipped replay never implies
an insert that did not happen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ai_fabric_etl_spark.operators.dedup import (
    _check_pmod_id_type,
    _lsh_band_keys,
    _minhash_sig_udf,
    _sig_bucket,
    hashed_shingles,
    sig_store_append,
    sig_store_layout,
    sig_store_read,
)
from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.operators.multimodal import _oversize_guard
from ai_fabric_etl_spark.streaming.admission_common import (
    local_text_within,
    one_slice as _one_slice,
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

DECISION_COLS = ["doc_id", "admitted", "dup_of", "jaccard", "epoch"]


def _sig_bands(
    docs: DataFrame, text_col: str, num_hashes: int, bands: int, n: int
) -> tuple[DataFrame, DataFrame]:
    sig = docs.select(
        "doc_id", hashed_shingles(F.col(text_col), n).alias("hs")
    ).withColumn("sig", _minhash_sig_udf(num_hashes)(F.col("hs")))
    sig = sig.persist()
    return sig, _lsh_band_keys(sig, num_hashes, bands)


def _exact_jaccard(cand: DataFrame, hs_a: DataFrame, hs_b: DataFrame,
                   threshold: float) -> DataFrame:
    """(doc_a, doc_b, jaccard) for candidate pairs, exact over the
    hashed shingle sets (same contract as the batch dedup path).
    The candidate list is BATCH-sized (band-pruned pairs) while
    ``hs_a`` may be the corpus-sized signature store — broadcast the
    candidates so the store is scanned once map-side, never shuffled."""
    j = F.broadcast(cand).join(hs_a, "doc_a").join(hs_b, "doc_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        j.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _text_probe(
    spark: SparkSession,
    index_path: str,
    docs_batch: DataFrame,
    text_col: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    n: int,
    max_bucket: int,
    on_oversize: str,
    stats_out: dict | None,
    what: str,
    scratch: list | None = None,
):
    """The probe half of text admission, shared with the cross-modal
    paired gate: shingle+sign the batch, prune the band index to the
    touched buckets (live occupancy skew policy), verify candidates
    with exact Jaccard, and compute the within-batch pair list.
    Returns ``(sig, bk, self_ids, index_dups, within, occ)`` — sig,
    bk, and occ come back PERSISTED (the caller unpersists after its
    inserts); the batch-sized candidate frame is persisted into
    ``scratch`` when given (continuous callers unpersist at batch
    end) so the sb-prune collect, self-detection, and the verify
    share one candidate materialization."""
    sig, bk = _sig_bands(docs_batch, text_col, num_hashes, bands, n)
    bk = bk.persist()
    touched = bk.select("band", "bucket").distinct()

    idx_bk = spark.read.schema(
        "doc_id long, bucket long, bucket_size long, band int"
    ).parquet(f"{index_path}/bands")
    pruned = idx_bk.join(F.broadcast(touched), ["band", "bucket"]).select(
        "band", "bucket", "doc_id"
    )
    # LIVE occupancy on the pruned scan — the stored bucket_size is a
    # build-time hint that goes stale under appends
    occ = pruned.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if on_oversize == "raise":
        occ = occ.withColumn(
            "_n", _oversize_guard(max_bucket, what)("_n")
        )
    elif stats_out is not None:
        row = (
            occ.filter(F.col("_n") > max_bucket)
            .agg(F.count(F.lit(1)).alias("b"),
                 F.coalesce(F.sum("_n"), F.lit(0)).alias("r"))
            .collect()[0]
        )
        stats_out["dropped_buckets"] = int(row["b"])
        stats_out["dropped_rows"] = int(row["r"])
    # persisted: occ feeds the hot-bucket filter inside the probe AND
    # the live bucket_size recount at insert time — unpersisted, the
    # insert re-scans the pruned band index (caller unpersists)
    occ = occ.persist()
    hot = occ.filter(F.col("_n") > max_bucket).select("band", "bucket")
    bk_ok = bk.join(F.broadcast(hot), ["band", "bucket"], "left_anti")

    # corpus x batch candidates (self matches INCLUDED — they identify
    # a prior crashed attempt's inserts), then exact-Jaccard verify.
    # Persisted (batch-sized): self-detection, the sb-prune collect,
    # and the verify all read it — unpersisted, each re-scans the
    # pruned band index.
    cand_cross = (
        pruned.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
        .join(
            F.broadcast(bk_ok.select(
                "band", "bucket", F.col("doc_id").alias("doc_b"))),
            ["band", "bucket"],
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    ).persist()
    if scratch is not None:
        scratch.append(cand_cross)
    self_ids = cand_cross.filter(F.col("doc_a") == F.col("doc_b")).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    # corpus candidates exclude ALL index rows carrying a CURRENT
    # batch id (not just same-id): stream ids are unique, so those
    # can only be the batch's own insert from a prior crashed
    # attempt. Classifying them as corpus dups would remove their
    # edges from the within-batch graph and make decisions depend on
    # the crash interleaving; the within-batch path (both docs are in
    # ``bk``) covers those pairs identically on every replay.
    #
    # The corpus sig read is statically PRUNED to the candidates' sb
    # partitions (VERDICT r12 item 4: the flat scan re-materialized
    # EVERY stored shingle set per batch — ~6s of the paired gate's
    # 24.6s; the candidates touch a bounded handful of buckets).
    cand_ext = cand_cross.join(
        F.broadcast(sig.select(F.col("doc_id").alias("doc_a"))),
        "doc_a",
        "left_anti",
    )
    n_sb, sb_fn = sig_store_layout(index_path)
    sbs = None
    if n_sb is not None:
        # bucket with the STORE's pinned function (hash for r14+
        # stores, pmod for legacy numeric-id stores — which raise on
        # non-numeric ids instead of pruning to nothing)
        if sb_fn == "pmod":
            _check_pmod_id_type(cand_ext, "doc_a", "admit_text_batch")
        sbs = [
            r["sb"]
            for r in cand_ext.select(
                _sig_bucket("doc_a", n_sb, sb_fn).alias("sb")
            ).distinct().collect()
        ]
    idx_sigs = sig_store_read(spark, index_path, sbs)
    cross = _exact_jaccard(
        cand_ext,
        idx_sigs.select(F.col("doc_id").alias("doc_a"),
                        F.col("hs").alias("hs_a")),
        sig.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")),
        threshold,
    )
    index_dups = (
        cross.groupBy("doc_b")
        .agg(F.max(F.struct(F.col("jaccard").alias("j"),
                            (-F.col("doc_a")).alias("negid"),
                            F.col("doc_a").alias("id"))).alias("_b"))
        .select(F.col("doc_b").alias("doc_id"),
                F.col("_b.id").alias("dup_of"),
                F.round(F.col("_b.j"), 6).alias("jaccard"))
    )

    # within-batch candidates from the batch's own band keys
    a = bk_ok.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = bk_ok.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    cand_batch = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    within = _exact_jaccard(
        cand_batch,
        sig.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")),
        sig.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")),
        threshold,
    )
    return sig, bk, self_ids, index_dups, within, occ


def admit_text_batch(
    spark: SparkSession,
    docs_batch: DataFrame,
    index_path: str,
    state_dir: str,
    epoch_id: int,
    app_id: str | None = None,
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket: int = 1000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
) -> bool:
    """One micro-batch admission. Also callable from batch jobs.
    Returns True when the epoch was processed, False on a replay of
    an already-committed epoch.

    Decision row per input doc:
    ``(doc_id, admitted, dup_of, jaccard, epoch)`` — ``dup_of`` is
    the max-Jaccard (then min-id) index id for corpus duplicates, the
    component canonical (an ADMITTED smaller batch id — see
    admission_common) for within-batch duplicates, NULL for admitted
    rows. ``num_hashes/bands/n/threshold`` must match
    the values the index was built with."""
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    table = ParquetMergeTable(spark, state_dir)
    last = table.last_epoch(app_id)
    if last is not None and epoch_id <= last:
        return False  # replayed epoch — already decided

    scratch: list = []
    sig, bk, self_ids, index_dups, _within, occ = _text_probe(
        spark, index_path, docs_batch, text_col, threshold,
        num_hashes, bands, n, max_bucket, on_oversize, stats_out,
        what="admit_text_batch", scratch=scratch,
    )

    # LOCALIZE the probe's decision-sized outputs (r14, same contract
    # as the other gates — the decision rows were ALWAYS collected
    # before the appends because their plan reads the index's
    # bands/sigs parquet and recacheByPath would re-probe the grown
    # index at the commit, VERDICT r12 item 4): index rejects, the
    # within-batch candidate+Jaccard graph, components, the decision
    # rows, and the insert frames all assemble in plain Python over
    # micro-batch-sized rows instead of ~10 per-batch shuffle
    # micro-stages. The corpus-side machinery (band-pruned index scan,
    # sb-pruned exact-Jaccard verify) stays fully distributed.
    dup_rows = [tuple(r) for r in index_dups.collect()]
    self_set = {r[0] for r in self_ids.collect()}
    sig_rows = [(r[0], r[1]) for r in sig.select("doc_id", "hs").collect()]
    bk_rows = [
        tuple(r) for r in bk.select("doc_id", "band", "bucket").collect()
    ]
    occ_rows = occ.collect()
    idx_rej = {d: (dup, j) for d, dup, j in dup_rows}

    # within-batch: one representative per near-dup component (see
    # admission_common); edges restricted to probe survivors on both
    # sides — an index duplicate keeps its index provenance and must
    # not stitch two otherwise-unrelated survivors together
    hot_bb = {(r["band"], r["bucket"]) for r in occ_rows
              if r["_n"] > max_bucket}
    surv = [
        (a, b, round6(j))
        for a, b, j in local_text_within(sig_rows, bk_rows, hot_bb,
                                         threshold)
        if a not in idx_rej and b not in idx_rej
    ]
    batch_dups = {
        node: (canon, j)
        for node, canon, j in resolve_local_components(surv, 1)
    }

    # ORDERING INVARIANT (crash-window convergence): the three writes
    # run as sigs -> bands -> decisions commit. Self-detection keys on
    # BAND rows (the probe path), so bands must never exist without
    # their signatures: sigs first means a crash between the two
    # appends leaves sig rows whose bands are missing — the replay's
    # self-detection finds nothing and re-inserts BOTH (a duplicate
    # sig row is benign: candidate pairs are grouped/maxed downstream,
    # and the exact-Jaccard value is identical), never band keys whose
    # signatures are permanently suppressed. The decisions commit runs
    # LAST: a committed epoch skips on replay, so everything it
    # implies must already be durable.
    dec_rows = []
    for d, _hs in sig_rows:
        if d in idx_rej:
            dup, j = idx_rej[d]
            dec_rows.append((d, False, dup, j, int(epoch_id)))
        elif d in batch_dups:
            canon, j = batch_dups[d]
            dec_rows.append((d, False, canon, j, int(epoch_id)))
        else:
            dec_rows.append((d, True, None, None, int(epoch_id)))
    dec_schema = StructType([
        StructField("doc_id", LongType(), True),
        StructField("admitted", BooleanType(), False),
        StructField("dup_of", LongType(), True),
        StructField("jaccard", DoubleType(), True),
        StructField("epoch", IntegerType(), False),
    ])

    # EVERY append below writes a ONE-SLICE driver-local frame — never
    # a plan reading an index path, and no per-insert joins: the
    # admitted ids, signatures, band keys, and the live bucket sizes
    # (prior touched-bucket occupancy + this batch's insert delta) are
    # all already on the driver.
    hs_by = dict(sig_rows)
    ins_ids = sorted(
        d for d, admitted, _dup, _j, _e in dec_rows
        if admitted and d not in self_set
    )
    sig_store_append(
        _one_slice(
            spark, [(d, hs_by[d]) for d in ins_ids],
            "doc_id long, hs array<long>",
        ),
        index_path,
    )
    occ_by = {(r["band"], r["bucket"]): r["_n"] for r in occ_rows}
    ins_set = set(ins_ids)
    new_bk = [(d, band, bucket) for d, band, bucket in bk_rows
              if d in ins_set]
    delta: dict = {}
    for _d, band, bucket in new_bk:
        delta[(band, bucket)] = delta.get((band, bucket), 0) + 1
    sized_rows = [
        (d, bucket, occ_by.get((band, bucket), 0) + delta[(band, bucket)],
         band)
        for d, band, bucket in new_bk
    ]
    _one_slice(
        spark, sized_rows,
        "doc_id long, bucket long, bucket_size long, band int",
    ).write.partitionBy("band").mode("append").parquet(
        f"{index_path}/bands"
    )

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
    sig.unpersist()
    bk.unpersist()
    occ.unpersist()
    for fr in scratch:
        fr.unpersist()
    return True


def admit_text_stream(
    stream: DataFrame,
    index_path: str,
    state_dir: str,
    checkpoint: str,
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    available_now: bool = True,
    maintenance_every: int | None = 50,
) -> StreamingQuery:
    """Wire the admission gate into a streaming query (checkpoint =
    epoch-guard identity, exactly-once across restarts).
    ``maintenance_every`` (default 50 — ON by default, VERDICT r13
    item 2: a stream that never compacts grows per-leaf file counts
    and manifest bytes without bound; pass ``None``/0 to explicitly
    opt out): every N-th PROCESSED epoch, compact the index (sigs deduped, bands merged)
    and the decision ledger between micro-batches
    (maintenance.maintenance_tick — decisions are byte-identical
    across a compaction). Replayed epochs skip the tick (the batch
    fold reports replay, so a restart never pays O(index) compaction
    for an epoch it did not process)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        processed = admit_text_batch(
            spark,
            batch_df,
            index_path,
            state_dir,
            epoch_id,
            app_id=checkpoint,
            text_col=text_col,
            threshold=threshold,
            max_bucket=max_bucket,
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
    """All admission decisions so far (one row per doc seen)."""
    return ParquetMergeTable(spark, state_dir).read().select(*DECISION_COLS)
