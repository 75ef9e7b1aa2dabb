"""Small-file compaction for the streaming-appended index layouts
(VERDICT r11 item 2).

Every admission micro-batch appends one parquet file per touched
partition into the persisted indexes — the image/audio phash index
and the video frame-hash index (``ci=<i>/cb=<b>/`` dirs,
operators/multimodal.py), the MinHash text index (``sigs/sb=<b>/``
— flat on pre-r13 indexes — + ``bands/band=<b>/`` dirs,
operators/dedup.py / streaming/text_admission.py), and the embedding
LSH index
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
from pyspark.sql.functions import col as F_col


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


def _partition_spec(path: str, leaf: str) -> list[tuple[str, str]] | None:
    """``[(col, value), ...]`` parsed from the ``key=value`` path
    components between ``path`` and ``leaf`` (``[]`` for ``leaf ==
    path``), or None when any component is not ``key=value`` — the
    caller then falls back to the per-leaf rewrite for that leaf."""
    rel = os.path.relpath(leaf, path)
    if rel == ".":
        return []
    spec = []
    for comp in rel.split(os.sep):
        if "=" not in comp:
            return None
        k, _, v = comp.partition("=")
        if not k:
            return None
        spec.append((k, v))
    return spec


def _compact_one_leaf(spark: SparkSession, leaf: str, files: list[str],
                      dedupe: bool) -> int:
    """The original per-leaf rewrite (one Spark job): read ``files``,
    optionally dedupe, land ONE compacted file, then unlink the old
    files. Fallback path for leaves whose dir structure is not
    ``key=value`` partitioning; returns the number of files landed."""
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
    _unlink_files(files)
    shutil.rmtree(tmp, ignore_errors=True)
    return len(moved)


def _unlink_files(files: list[str]) -> None:
    for f in files:
        os.remove(f)
        crc = os.path.join(
            os.path.dirname(f), "." + os.path.basename(f) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    dedupe: bool = False,
    min_files: int = 2,
) -> dict:
    """Rewrite every leaf partition directory under ``path`` whose
    parquet-file count is >= ``min_files`` into ONE file. Data columns
    only are stored (partition values live in the directory names and
    are untouched); ``dedupe=True`` additionally drops exact-duplicate
    rows (safe ONLY for append-only fact rows where an exact duplicate
    can never be legitimate — the chunk-row indexes). Returns
    ``{"leaves_compacted": n, "files_before": n, "files_after": n}``.

    All eligible ``key=value`` leaves compact in ONE Spark job (r14:
    the per-leaf loop scheduled one read+write job per leaf — pure
    scheduler overhead at ~0.3s/leaf, 54s for a 177-leaf tick; one
    partitioned job over the same bytes runs in ~1s): the multi-file
    leaves are read together with ``basePath`` so the partition
    columns stay on the rows (per-leaf dedupe == global distinct WITH
    those columns — data columns alone can coincide across leaves),
    repartitioned BY the partition columns (each leaf's rows land in
    exactly one task => exactly one output file per leaf), and written
    ``partitionBy`` into one staging dir. The driver then moves each
    staged file into its leaf BEFORE unlinking that leaf's old files —
    the same per-leaf add-then-remove crash discipline as before: a
    crash mid-stage leaves an orphan ``_compact_stage-*`` dir (reaped
    next run), a crash mid-move leaves some leaves compacted and the
    rest untouched, duplicates at worst, never loss. Leaves whose
    relative path is not ``key=value`` partitioning fall back to the
    original per-leaf rewrite."""
    leaves = _leaf_dirs(path)
    before = after = compacted = 0
    # orphan staging dirs from a crashed previous run: unreferenced by
    # construction (readers and _leaf_dirs skip underscore dirs; every
    # run mints fresh uuids) — reap before counting (ADVICE r12)
    for pat in ("_compacting-*", "_compact_stage-*"):
        for orphan in glob.glob(os.path.join(path, "**", pat),
                                recursive=True):
            shutil.rmtree(orphan, ignore_errors=True)
    todo: list[tuple[str, list[str], list[tuple[str, str]] | None]] = []
    for leaf in leaves:
        files = sorted(
            f for f in glob.glob(os.path.join(leaf, "*.parquet"))
            if not os.path.basename(f).startswith((".", "_"))
        )
        before += len(files)
        if len(files) < min_files:
            after += len(files)
            continue
        todo.append((leaf, files, _partition_spec(path, leaf)))

    # fallback leaves (non-key=value layout, or the root itself when it
    # also has partitioned siblings): per-leaf rewrite, original path
    grouped = [t for t in todo if t[2]]
    singles = [t for t in todo if not t[2]]
    # leaves with an empty spec (leaf == path: a FLAT dir) cannot ride
    # the partitionBy stage — compact them per-leaf too
    for leaf, files, _ in singles:
        after += _compact_one_leaf(spark, leaf, files, dedupe)
        compacted += 1

    if grouped:
        part_cols = [c for c, _ in grouped[0][2]]
        same = all([c for c, _ in spec] == part_cols
                   for _, _, spec in grouped)
        if not same:
            # heterogeneous partition depths under one root — rare
            # (never our index layouts); keep correctness, lose the
            # batching
            for leaf, files, _ in grouped:
                after += _compact_one_leaf(spark, leaf, files, dedupe)
                compacted += 1
        else:
            stage = os.path.join(
                path, f"_compact_stage-{uuid.uuid4().hex[:12]}"
            )
            df = (
                spark.read.option("basePath", path)
                .parquet(*[leaf for leaf, _, _ in grouped])
            )
            if dedupe:
                df = df.distinct()
            (
                df.repartition(*[F_col(c) for c in part_cols])
                .write.partitionBy(*part_cols)
                .mode("overwrite")
                .parquet(stage)
            )
            for leaf, files, spec in grouped:
                staged_leaf = os.path.join(
                    stage, *[f"{c}={v}" for c, v in spec]
                )
                new_parts = sorted(
                    glob.glob(os.path.join(staged_leaf, "*.parquet"))
                )
                if not new_parts:
                    # defensive: no staged output for this leaf —
                    # leave its files untouched rather than lose rows
                    after += len(files)
                    continue
                moved = []
                for i, p in enumerate(new_parts):
                    dest = os.path.join(
                        leaf, f"compact-{uuid.uuid4().hex[:12]}-{i}.parquet"
                    )
                    os.replace(p, dest)
                    moved.append(dest)
                _unlink_files(files)
                compacted += 1
                after += len(moved)
            shutil.rmtree(stage, ignore_errors=True)
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


def maintenance_tick(
    spark: SparkSession,
    epoch_id: int,
    every_n_epochs: int | None,
    index_paths: list[str] | tuple[str, ...],
    state_dir: str | None = None,
    min_files: int = 2,
) -> dict | None:
    """The gates' SCHEDULED maintenance hook (VERDICT r12 item 2):
    called by every admission gate's foreachBatch fold AFTER the
    epoch's decision commit — the documented quiet point (the fold is
    serial, so no writer is concurrent) — and a no-op except on every
    ``every_n_epochs``-th epoch. On a firing epoch it compacts each
    persisted index (:func:`compact_index`, byte-identical probe
    decisions) and rewrites the decision ledger's current version into
    one file (``ParquetMergeTable.compact``, epoch guard carried
    forward), so a 10^5-batch stream bounds its per-leaf file counts
    mechanically instead of relying on an operator remembering to run
    maintenance.

    Cost shape: the ledger rewrite is O(ledger) and each index leaf
    rewrite is O(leaf), paid once per N batches — amortized O(size/N)
    per batch, the standard compaction trade. Crash mid-tick is safe
    in both halves: compact_parquet_dir is add-then-remove (duplicate
    rows at worst, removed by the next tick), and the ledger compact
    is one atomic pointer swap. Replay discipline (ADVICE r13): the
    gates call this only when their batch fold reports the epoch was
    PROCESSED (admit_*_batch returns False on a replay of an
    already-committed epoch), so a restart replay pays no O(index)
    compaction; even if a caller invokes it on a replayed epoch
    anyway, both halves are idempotent and the carried epoch guard is
    unchanged — correctness never depends on the skip, only cost
    does. Returns the stats dict on a firing epoch, None otherwise."""
    if not every_n_epochs or every_n_epochs < 1:
        return None
    if (int(epoch_id) + 1) % every_n_epochs:
        return None
    out: dict = {"epoch": int(epoch_id), "indexes": {}}
    for p in index_paths:
        out["indexes"][p] = compact_index(spark, p)
    if state_dir is not None:
        from ai_fabric_etl_spark.operators.merge import ParquetMergeTable

        t = ParquetMergeTable(spark, state_dir)
        if t.exists():
            t.compact(target_files=1)
            # same retention the gates' appends use (retain=2): the
            # compact commit added a version, so without this the
            # table briefly holds three until the next append vacuums
            t.vacuum(keep_last=2)
            out["ledger_compacted"] = True
    return out
