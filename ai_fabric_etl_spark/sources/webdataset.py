"""WebDataset-style tar-shard export/import for training corpora.

The standard large-scale training-data layout (webdataset/tarp;
consumed by PyTorch DataPipes, NeMo, LLM data loaders): a corpus is
split into fixed-count tar shards, each sample a group of members
sharing a basename key (``{key}.txt`` payload + ``{key}.json``
metadata), so loaders stream shards sequentially with no random I/O
and shuffle by interleaving shards.

Beyond-reference sink/source (SURVEY §2.1 family; the reference's
sinks stop at parquet/CSV/text), built on the repo's deterministic
md5 idiom so shard ASSIGNMENT is oracle-checkable in SQL while the
tar bytes themselves round-trip through the real files:

- ``shard_of(key, n)`` = ``conv(substr(md5(key||'-wds'),1,8),16,10)
  % n`` — growth-stable (a doc's shard never changes as the corpus
  grows), engine-portable (DuckDB: ``('0x'||h)::BIGINT % n``).
- One groupBy(shard) shuffle; each shard's tar is written by exactly
  one task via applyInPandas. Tar bytes are DETERMINISTIC (members
  sorted by key; zeroed mtime/uid/gid, fixed mode): task retries
  overwrite with identical bytes via an atomic tmp+rename, so the
  sink is idempotent without a commit protocol, and shard files are
  byte-reproducible across runs — rsync/content-hash friendly.
- Memory bound: a whole shard materializes in its task (that is what
  a tar shard IS); size ``n_shards`` so corpus/n_shards fits an
  executor — the knob every WebDataset pipeline already tunes.

``read_webdataset`` streams members back (one partition per shard,
tarfile's streaming reader — O(member) memory), reassembling
``(shard, key, text, meta)`` rows.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_SALT = "wds"


def shard_of(key, n_shards: int):
    """Deterministic shard id for a key column (md5-uniform mod n,
    the repo's hash_split/kfold idiom)."""
    h = F.substring(
        F.md5(
            F.concat(
                F.coalesce(key.cast("string"), F.lit("__NULL__")),
                F.lit(f"-{SHARD_SALT}"),
            ).cast("binary")
        ),
        1,
        8,
    )
    return (F.conv(h, 16, 10).cast("long") % n_shards).cast("int")


def shard_of_sql(key: str, n_shards: int) -> str:
    """DuckDB twin of :func:`shard_of`."""
    return (
        f"CAST(('0x' || substr(md5(COALESCE(CAST({key} AS VARCHAR), "
        f"'__NULL__') || '-{SHARD_SALT}'), 1, 8))::BIGINT "
        f"% {n_shards} AS INT)"
    )


def _tar_member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Export ``df`` as ``shard-{i:05d}.tar`` files under ``path``;
    each sample is ``{key}.txt`` (utf-8 payload) plus ``{key}.json``
    (the ``meta_cols`` as a sorted-key JSON object). Returns the
    manifest DataFrame ``(shard, n_docs, txt_bytes, first_key,
    last_key)`` computed from what was ACTUALLY written (sizes taken
    from the tar members, not the input).

    Deployment: shard files are written by executor tasks directly
    under ``path`` — driver and executors need a shared filesystem
    (local mode / NFS / FUSE-mounted object store), the same
    constraint as the repo's other file sinks. Keys must not contain
    '.' or '/' (member names split on the extension dot)."""
    meta_cols = meta_cols or []
    work = df.select(
        shard_of(F.col(key_col), n_shards).alias("shard"),
        F.col(key_col).cast("string").alias("_key"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
        *[F.col(c) for c in meta_cols],
    )
    os.makedirs(path, exist_ok=True)

    out_schema = (
        "shard int, n_docs long, txt_bytes long, "
        "first_key string, last_key string"
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_key", kind="mergesort")
        bad = pdf["_key"].str.contains(".", regex=False) | pdf[
            "_key"
        ].str.contains("/", regex=False)
        if bad.any():
            raise ValueError(
                "webdataset: sample keys must not contain '.' or '/' "
                f"(member names split on the extension dot): "
                f"{pdf['_key'][bad].iloc[0]!r}"
            )
        shard = int(pdf["shard"].iloc[0])
        final = os.path.join(path, f"shard-{shard:05d}.tar")
        tmp = final + f".tmp{os.getpid()}"
        txt_bytes = 0
        with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tar:
            for _, row in pdf.iterrows():
                payload = str(row["_txt"]).encode("utf-8")
                txt_bytes += len(payload)
                _tar_member(tar, f"{row['_key']}.txt", payload)
                if meta_cols:
                    meta = json.dumps(
                        {c: row[c] for c in meta_cols},
                        sort_keys=True,
                        default=str,
                    ).encode("utf-8")
                    _tar_member(tar, f"{row['_key']}.json", meta)
        os.replace(tmp, final)  # idempotent: retries write same bytes
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(pdf)],
                "txt_bytes": [txt_bytes],
                "first_key": [pdf["_key"].iloc[0]],
                "last_key": [pdf["_key"].iloc[-1]],
            }
        )

    return work.groupBy("shard").applyInPandas(write_shard, out_schema)


def read_webdataset(
    spark: SparkSession, path: str, with_meta: bool = True
) -> DataFrame:
    """Stream tar shards back as ``(shard, key, text, meta)`` rows —
    one read partition per shard file, members decoded pairwise by
    basename key (``.txt`` payload, optional ``.json`` metadata)."""
    shards = sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".tar") and not n.startswith((".", "_"))
    )
    if not shards:
        raise ValueError(f"webdataset: no .tar shards under {path}")
    files = spark.createDataFrame(
        [(p,) for p in shards], "tar_path string"
    ).repartition(len(shards), "tar_path")

    def read_tar(batches):
        for pdf in batches:
            for tar_path in pdf["tar_path"]:
                shard = int(
                    os.path.basename(tar_path)
                    .removeprefix("shard-")
                    .removesuffix(".tar")
                )
                rows = {}
                with tarfile.open(tar_path, "r") as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        key, ext = os.path.splitext(m.name)
                        buf = tar.extractfile(m).read()
                        rows.setdefault(key, {})[ext] = buf
                out = [
                    (
                        shard,
                        key,
                        parts.get(".txt", b"").decode("utf-8"),
                        parts[".json"].decode("utf-8")
                        if ".json" in parts
                        else None,
                    )
                    for key, parts in rows.items()
                ]
                yield pd.DataFrame(
                    out, columns=["shard", "key", "text", "meta"]
                )

    schema = "shard int, key string, text string, meta string"
    return files.mapInPandas(read_tar, schema)
