"""Gate-family throughput trend (VERDICT r11 item 5): run an
N-batch admission sequence per modality against the persisted warm
fixture indexes and report per-batch latency. A FLAT trend is the
measurable form of the round's commit-plan fixes — the O(batch)
decision-ledger append (merge.ParquetMergeTable.append) and the
bounded per-batch index appends: under the old
``unionByName + overwrite`` ledger the per-batch latency grew with
every decision ever made, which single-batch bench rows cannot see.

Each batch admits ``batch_size`` NOVEL items in a per-batch content
namespace (``trend{b}:`` SHA streams / distinct bump coordinates), so
the index grows a little per batch — the realistic continuous-ingest
shape. Batch ids are deterministic and disjoint from every entry's
planted ranges (base 5_000_000); re-running the trend against the
grown fixture converges (self-detection / receipts skip re-inserts,
decisions re-admit) — the same interleaving-invariance the
crash-window pytests prove.

Trend flatness is REPORTED, not asserted: ``trend_ratio`` =
last-batch / first-batch wall time per modality; the bench JSON
carries the full per-batch list so a regression in any fixed
per-batch cost is visible across rounds.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from ai_fabric_etl_spark.operators import multimodal
from ai_fabric_etl_spark.queries.catalog import _t
from ai_fabric_etl_spark.queries.text_queries import (
    _fixture_audio_index,
    _fixture_emb_index,
    _fixture_paired_indexes,
    _fixture_phash_index,
    _fixture_video_index,
    _synth_pair_text,
)

_BASE = 5_000_000  # disjoint from every entry's planted id ranges


def _trend_ids(spark, sf_dir: str, b: int, batch_size: int):
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < batch_size)
        .select(
            (F.col("doc_id") + _BASE + b * 10_000).alias("doc_id")
        )
    )


def run_gate_trends(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 5,
    batch_size: int = 12,
) -> dict:
    """{'image': [sec, ...], 'audio': [...], 'video': [...],
    'embedding': [...], 'paired': [...]} — per-batch admission wall
    time per modality, plus '<m>_trend_ratio' (last/first)."""
    from ai_fabric_etl_spark.streaming.embedding_admission import (
        admit_embeddings_batch,
    )
    from ai_fabric_etl_spark.streaming.media_admission import (
        admit_media_batch,
        admit_video_batch,
    )
    from ai_fabric_etl_spark.streaming.paired_admission import (
        admit_pairs_batch,
    )

    out: dict[str, object] = {}

    def run(modality: str, fixture, make_batch, admit) -> None:
        fx = fixture()
        state = tempfile.mkdtemp(prefix=f"trend_{modality}_") + "/state"
        times = []
        for b in range(n_batches):
            batch = make_batch(b)
            t0 = time.perf_counter()
            admit(fx, batch, state, b)
            times.append(round(time.perf_counter() - t0, 3))
        out[modality] = times
        if times and times[0] > 0:
            out[f"{modality}_trend_ratio"] = round(times[-1] / times[0], 2)
        spark.catalog.clearCache()

    # image ----------------------------------------------------------
    def img_batch(b):
        return multimodal.synthesize_noise_images(
            _trend_ids(spark, sf_dir, b, batch_size),
            key_prefix=f"trend{b}:",
        ).select("media_id", "payload")

    run(
        "image",
        lambda: _fixture_phash_index(spark, sf_dir),
        img_batch,
        lambda idx, batch, state, b: admit_media_batch(
            spark, batch, idx, state, epoch_id=b, app_id="trend"
        ),
    )

    # audio ----------------------------------------------------------
    def audio_batch(b):
        return multimodal.synthesize_noise_audio(
            _trend_ids(spark, sf_dir, b, batch_size),
            n_frames=1024, key_prefix=f"trend{b}:",
        ).select("media_id", "payload")

    run(
        "audio",
        lambda: _fixture_audio_index(spark, sf_dir),
        audio_batch,
        lambda idx, batch, state, b: admit_media_batch(
            spark, batch, idx, state, epoch_id=b, app_id="trend",
            modality="audio",
        ),
    )

    # video ----------------------------------------------------------
    def video_batch(b):
        return multimodal.synthesize_noise_video(
            _trend_ids(spark, sf_dir, b, batch_size),
            key_prefix=f"trend{b}-",
        ).select("media_id", "payload")

    run(
        "video",
        lambda: _fixture_video_index(spark, sf_dir),
        video_batch,
        lambda idx, batch, state, b: admit_video_batch(
            spark, batch, idx, state, epoch_id=b, app_id="trend"
        ),
    )

    # embedding ------------------------------------------------------
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def emb_batch(b):
        # corpus vector i with ONE coordinate bumped +1000: dominated
        # by its bump coordinate, so distinct (batch, i) slots are
        # mutually near-orthogonal and admit (same bound as the
        # embedding_admission_gate entry's novel quadrant); ids 0..
        # n_batches*batch_size-1 keep coordinates unique (< dim=64)
        base = emb.filter(
            (F.col("vec_id") >= b * batch_size)
            & (F.col("vec_id") < (b + 1) * batch_size)
        )
        bump = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + F.when(j == F.col("vec_id").cast("int"), F.lit(1000.0))
                .otherwise(F.lit(0.0))
            ).cast("float"),
        )
        return base.select("vec_id", bump.alias("embedding")).select(
            (F.col("vec_id") + _BASE + b * 10_000).alias("vec_id"),
            "embedding",
        )

    run(
        "embedding",
        lambda: _fixture_emb_index(spark, sf_dir),
        emb_batch,
        lambda idx, batch, state, b: admit_embeddings_batch(
            spark, batch, idx, state, epoch_id=b, app_id="trend",
            threshold=0.95,
        ),
    )

    # paired (text + image in one transaction) ------------------------
    def pair_batch(b):
        ids = _trend_ids(spark, sf_dir, b, batch_size)
        texts = ids.select(
            F.col("doc_id").alias("pair_id"),
            _synth_pair_text(f"trend{b}:").alias("text"),
        )
        images = multimodal.synthesize_noise_images(
            ids, key_prefix=f"trendp{b}:"
        ).select(F.col("media_id").alias("pair_id"), "payload")
        return texts.join(images, "pair_id")

    run(
        "paired",
        lambda: _fixture_paired_indexes(spark, sf_dir),
        pair_batch,
        lambda fx, batch, state, b: admit_pairs_batch(
            spark, batch, fx[0], fx[1], state, epoch_id=b, app_id="trend"
        ),
    )

    return out


def run_compaction_probe(
    spark: SparkSession,
    sf_dir: str,
    n_appends: int = 100,
    n_base: int = 200,
) -> dict:
    """The compaction bench row (VERDICT r11 item 2): probe latency
    against a phash index FRAGMENTED by ``n_appends`` single-image
    inserts vs the same index after ``maintenance.compact_index``,
    plus proof the decisions are identical. The fragmented index is a
    persisted fixture (building it once is the point — a stream
    fragments its index for free); each run copies it, compacts the
    copy, and probes both, so the fixture never mutates."""
    import os
    import shutil
    import tempfile
    import time

    from ai_fabric_etl_spark.operators.maintenance import compact_index
    from ai_fabric_etl_spark.queries.text_queries import _bench_fixture

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < n_base
    )
    with _bench_fixture(
        sf_dir, "frag_phash",
        {"n_base": n_base, "n_appends": n_appends, "n_buckets": 16,
         "v": 1},
    ) as (root, fresh):
        idx = os.path.join(root, "index")
        if not fresh:
            multimodal.phash_index_write(
                multimodal.dhash64(
                    multimodal.synthesize_noise_images(docs), fake=False
                ),
                idx, n_buckets=16,
            )
            for b in range(n_appends):  # one tiny insert per micro-batch
                one = multimodal.synthesize_noise_images(
                    docs.filter(F.col("doc_id") == b % n_base).select(
                        (F.col("doc_id") + _BASE + b).alias("doc_id")
                    ),
                    key_prefix=f"frag{b}:",
                )
                multimodal.phash_index_insert(
                    spark, idx, multimodal.dhash64(one, fake=False)
                )

    def count_files(p):
        import glob
        return len([
            f for f in glob.glob(os.path.join(p, "**", "*.parquet"),
                                 recursive=True)
            if not os.path.basename(f).startswith((".", "_"))
        ])

    probe_batch = multimodal.dhash64(
        multimodal.synthesize_noise_images(
            docs.filter(F.col("doc_id") < 10)
        ).select((F.col("media_id") + 900000).alias("media_id"), "payload")
        .unionByName(
            multimodal.synthesize_noise_images(
                docs.filter(F.col("doc_id") < 10).select(
                    (F.col("doc_id") + 950000).alias("doc_id")
                ),
                key_prefix="novelcp:",
            ).select("media_id", "payload")
        ),
        fake=False,
    ).persist()
    probe_batch.count()

    def timed_probe(path):
        t0 = time.perf_counter()
        rows = sorted(map(tuple, multimodal.phash_index_probe(
            spark, path, probe_batch
        ).collect()))
        return round(time.perf_counter() - t0, 3), rows

    frag_sec, frag_rows = timed_probe(idx)
    copy = tempfile.mkdtemp(prefix="compact_probe_") + "/index"
    shutil.copytree(idx, copy)
    t0 = time.perf_counter()
    stats = compact_index(spark, copy)
    compact_sec = round(time.perf_counter() - t0, 3)
    comp_sec, comp_rows = timed_probe(copy)
    probe_batch.unpersist()
    shutil.rmtree(os.path.dirname(copy), ignore_errors=True)
    return {
        "files_fragmented": count_files(idx),
        "files_compacted": stats["files_after"],
        "probe_fragmented_sec": frag_sec,
        "probe_compacted_sec": comp_sec,
        "compact_sec": compact_sec,
        "identical_decisions": frag_rows == comp_rows,
        "n_matches": len(frag_rows),
    }
