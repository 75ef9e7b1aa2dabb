"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

Round 2: the decode/resize/feature bodies are REAL for the formats a
pure-numpy codec can handle — BMP, PPM/PGM, RIFF-PCM WAV
(operators/codecs.py; no imaging libraries exist in this container,
but these formats need none). Payloads whose magic bytes match decode
for real; anything unrecognized falls back to the deterministic fake
(``fake=True``, the default) so plumbing tests on arbitrary bytes
still run, or raises (``fake=False``) when the caller requires real
media. ``synthesize_media`` builds a deterministic mixed-format
corpus so the decode path is driver-verifiable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ai_fabric_etl_spark.operators import codecs

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("content_digest", StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media table from the documents fixture: utf-8 payload
    bytes + typed metadata. At scale this is the schema a binary-file
    ingest (S1/S2) would produce."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic mixed-format media corpus from the documents
    table: doc_id % 3 == 0 -> BMP, 1 -> PPM(P6), 2 -> WAV. Dimensions
    are pure functions of doc_id, so an oracle can recompute them
    without decoding — which makes the REAL encode->decode round trip
    checkable by the driver (entry multimodal_decode_real)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime_type": [],
                    "n_bytes": [], "source": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                kind = i % 3
                if kind == 0:
                    w, h = 16 + i % 16, 8 + i % 8
                    grad = (np.arange(h * w * 3, dtype=np.int64) + i) % 256
                    payload = codecs.encode_bmp(
                        grad.astype(np.uint8).reshape(h, w, 3)
                    )
                    mime = "image/bmp"
                elif kind == 1:
                    w, h = 12 + i % 10, 6 + i % 6
                    body = ((np.arange(h * w * 3, dtype=np.int64) * 7 + i) % 256)
                    payload = (
                        f"P6\n{w} {h}\n255\n".encode()
                        + body.astype(np.uint8).tobytes()
                    )
                    mime = "image/x-portable-pixmap"
                else:
                    n = 256 + i % 100
                    t = np.arange(n, dtype=np.float64)
                    wave = (3000 * np.sin(t * (0.01 + (i % 7) * 0.005))).astype(
                        np.int16
                    )
                    payload = codecs.encode_wav(wave, sample_rate=16_000)
                    mime = "audio/wav"
                rows["media_id"].append(i)
                rows["payload"].append(payload)
                rows["mime_type"].append(mime)
                rows["n_bytes"].append(len(payload))
                rows["source"].append("synth")
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(build, schema=MEDIA_SCHEMA)


def _decode_one(payload: bytes, fake: bool) -> tuple[str, int, int, int]:
    """(fmt, width, height, channels) — real codec when the magic
    bytes match AND the payload actually parses, deterministic fake
    (or raise) otherwise. Magic bytes can occur by chance in arbitrary
    binaries (a text payload starting 'P6 '), so with ``fake=True`` a
    decode failure falls back to the fake rather than killing the
    task. WAV maps to (n_frames, 1, n_channels)."""
    fmt = codecs.sniff_format(payload)
    try:
        if fmt == "bmp":
            w, h, c, _ = codecs.decode_bmp(payload)
            return fmt, w, h, c
        if fmt in ("ppm", "pgm"):
            w, h, c, _ = codecs.decode_pnm(payload)
            return fmt, w, h, c
        if fmt == "wav":
            n_channels, _, n_frames, _ = codecs.decode_wav(payload)
            return fmt, n_frames, 1, n_channels
        if fmt == "y4m":
            w, h, _, _ = codecs.decode_y4m(payload)
            return fmt, w, h, 1
    except Exception as exc:  # noqa: BLE001 - sniffed-but-corrupt payload
        if not fake:
            raise ValueError(f"corrupt {fmt} payload: {exc}") from exc
    else:
        if not fake:
            raise NotImplementedError(
                "unrecognized media format (only BMP/PPM/PGM/WAV/Y4M decode "
                "without an imaging library); call with fake=True for "
                "plumbing tests"
            )
    d = hashlib.md5(payload).digest()
    return "fake", 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 3


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode pass: Arrow-batched, one python worker per
    partition, constant memory per batch regardless of table size.
    Real decode for BMP/PPM/PGM/WAV payloads; ``fake`` governs the
    fallback for unrecognized bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "mime_type": pdf["mime_type"],
                "n_bytes": pdf["n_bytes"],
                "fmt": [],
                "width": [],
                "height": [],
                "channels": [],
                "content_digest": [],
            }
            for payload in pdf["payload"]:
                fmt, w, h, c = _decode_one(bytes(payload), fake=fake)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["content_digest"].append(hashlib.md5(bytes(payload)).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Feature-extraction pass: payload bytes -> float vector
    (``array<float>``), Arrow-batched. Real features for decodable
    media (normalized intensity/amplitude histograms — deterministic,
    encoder-free); the digest-expansion fake for unrecognized bytes.
    Output feeds the similarity operators (brute-force/LSH/IVF top-k)
    unchanged."""

    def one(payload: bytes) -> list[float]:
        fmt = codecs.sniff_format(payload)
        try:
            if fmt == "bmp":
                return codecs.pixel_features(codecs.decode_bmp(payload)[3], dim).tolist()
            if fmt in ("ppm", "pgm"):
                return codecs.pixel_features(codecs.decode_pnm(payload)[3], dim).tolist()
            if fmt == "wav":
                return codecs.audio_features(codecs.decode_wav(payload)[3], dim).tolist()
            if fmt == "y4m":
                frames = codecs.decode_y4m(payload)[3]
                return codecs.pixel_features(np.concatenate(frames), dim).tolist()
        except Exception as exc:  # noqa: BLE001 - sniffed-but-corrupt payload
            if not fake:
                raise ValueError(f"corrupt {fmt} payload: {exc}") from exc
        else:
            if not fake:
                raise NotImplementedError(
                    "unrecognized media format; call with fake=True"
                )
        raw = hashlib.sha256(payload).digest()
        need = (dim + len(raw) - 1) // len(raw)
        return [b / 127.5 - 1.0 for b in (raw * need)[:dim]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Resize pass: payload -> payload' at (width, height), keeping the
    MEDIA_SCHEMA shape so passes compose. Decodable images really
    decode -> nearest-neighbor resize -> re-encode as 24-bit BMP;
    unrecognized payloads keep the deterministic fake body."""

    def one(payload: bytes, mime: str) -> tuple[bytes, str]:
        fmt = codecs.sniff_format(payload)
        try:
            if fmt in ("bmp", "ppm", "pgm"):
                decode = codecs.decode_bmp if fmt == "bmp" else codecs.decode_pnm
                _, _, c, px = decode(payload)
                if c == 1:
                    px = np.repeat(px, 3, axis=2)
                elif c == 4:
                    px = px[:, :, :3]
                return (
                    codecs.encode_bmp(codecs.resize_nearest(px, width, height)),
                    "image/bmp",
                )
            if fmt in ("wav", "y4m"):
                # recognized NON-image media: spatial resize does not
                # apply — pass through unchanged (never corrupt real
                # audio/video into digest noise)
                return payload, mime
        except Exception as exc:  # noqa: BLE001 - sniffed-but-corrupt payload
            if not fake:
                raise ValueError(f"corrupt {fmt} payload: {exc}") from exc
        else:
            if not fake:
                raise NotImplementedError(
                    "unrecognized media format; call with fake=True"
                )
        seed = hashlib.sha256(payload).digest()
        need = width * height
        reps = (need + len(seed) - 1) // len(seed)
        return (seed * reps)[:need], mime

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime_type"]):
                p, m = one(bytes(payload), mime)
                payloads.append(p)
                mimes.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime_type": mimes,
                    "n_bytes": [len(p) for p in payloads],
                    "source": pdf["source"],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
    ]
)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_index) rows for a
    downstream decode. Y4M payloads get their REAL frame count (the
    container is a text header + fixed-size frame blocks, so counting
    is exact); other payloads keep the n_bytes/1024 estimate so the
    plumbing still composes over arbitrary binaries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if codecs.sniff_format(raw) == "y4m":
                    _, _, n, _ = codecs.decode_y4m(raw)
                else:
                    n = max(len(raw) // 1024, 1)
                for i in range(0, n, every_n):
                    ids.append(media_id)
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_index": np.asarray(idxs, dtype=np.int32),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def synthesize_video(docs: DataFrame, max_docs: int = 60) -> DataFrame:
    """Deterministic Y4M corpus: doc_id < max_docs, 16x8 luma,
    n_frames = 3 + doc_id % 5 (a pure function of doc_id, so frame
    sampling is oracle-checkable without decoding)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime_type": [],
                    "n_bytes": [], "source": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n_frames = 3 + i % 5
                frames = [
                    ((np.arange(8 * 16, dtype=np.int64) + i + f) % 256)
                    .astype(np.uint8)
                    .reshape(8, 16)
                    for f in range(n_frames)
                ]
                payload = codecs.encode_y4m(frames)
                rows["media_id"].append(i)
                rows["payload"].append(payload)
                rows["mime_type"].append("video/x-yuv4mpeg")
                rows["n_bytes"].append(len(payload))
                rows["source"].append("synth")
            yield pd.DataFrame(rows)

    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < max_docs)
        .mapInPandas(build, schema=MEDIA_SCHEMA)
    )


# ---------------------------------------------------------------------------
# perceptual hashing (image near-dup)
# ---------------------------------------------------------------------------


def _dhash_bits(px: np.ndarray) -> int:
    """64-bit difference hash (dHash — the gradient-based perceptual
    hash; Krawetz's classic recipe): integer luma, area-mean
    downsample to a 9x8 grid, one bit per horizontal neighbor
    comparison. ALL arithmetic is integer (luma = (299R+587G+114B)
    div 1000, cell = sum div count), so the hash is bit-deterministic
    across platforms — no float resize in sight.

    Images narrower/shorter than the grid sample overlapping bands
    (each band is at least one row/col, clipped in range) — total and
    deterministic for any size >= 1x1."""
    if px.ndim == 3 and px.shape[2] >= 3:
        g = (
            299 * px[:, :, 0].astype(np.int64)
            + 587 * px[:, :, 1].astype(np.int64)
            + 114 * px[:, :, 2].astype(np.int64)
        ) // 1000
    else:
        g = px.reshape(px.shape[0], px.shape[1], -1)[:, :, 0].astype(np.int64)
    h, w = g.shape
    cells = np.empty((8, 9), dtype=np.int64)
    for r in range(8):
        r0 = min(r * h // 8, h - 1)
        r1 = max((r + 1) * h // 8, r0 + 1)
        for c in range(9):
            c0 = min(c * w // 9, w - 1)
            c1 = max((c + 1) * w // 9, c0 + 1)
            block = g[r0:r1, c0:c1]
            cells[r, c] = int(block.sum()) // block.size
    val = 0
    for r in range(8):
        for c in range(8):
            val = (val << 1) | (1 if cells[r, c + 1] > cells[r, c] else 0)
    if val >= 1 << 63:  # store as signed long
        val -= 1 << 64
    return val


def dhash64(
    media: DataFrame,
    fake: bool = True,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(id, dhash) per image payload — the image sibling of SimHash
    for text: near-duplicate images (same picture re-encoded, minor
    crops/brightness shifts) land within a few Hamming bits.

    REAL decode for BMP/PPM/PGM payloads (pure-numpy codecs);
    ``fake`` governs unrecognized/corrupt payloads exactly like
    :func:`decode_media` (deterministic md5-derived fake hash, or the
    ``on_error`` policy). ``on_error`` (fake=False only): ``"raise"``
    fails the task on an undecodable payload; ``"null"`` emits the row
    with a NULL hash instead — the continuous-gate mode, where one
    poison payload must quarantine, not block the stream forever
    (ADVICE r11: one decision row per input id). mapInPandas,
    Arrow-batched, constant memory per batch — the 100 TB shape is one
    linear decode pass; no shuffle."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = codecs.sniff_format(payload)
                px = None
                bad = False
                try:
                    if fmt == "bmp":
                        _, _, _, px = codecs.decode_bmp(payload)
                    elif fmt in ("ppm", "pgm"):
                        _, _, _, px = codecs.decode_pnm(payload)
                except Exception as exc:  # noqa: BLE001 - sniffed-but-corrupt
                    if not fake and on_error == "raise":
                        raise ValueError(
                            f"corrupt {fmt} payload: {exc}"
                        ) from exc
                    bad = True
                if px is None:
                    if fake:
                        d = hashlib.md5(payload).digest()
                        val = int.from_bytes(d[:8], "big", signed=True)
                    elif bad or on_error == "null":
                        val = None
                    else:
                        raise NotImplementedError(
                            "dhash64 decodes BMP/PPM/PGM without an imaging "
                            "library; call with fake=True for plumbing tests"
                        )
                else:
                    val = _dhash_bits(px)
                ids.append(int(mid))
                hashes.append(val)
            yield pd.DataFrame(
                {id_col: ids, "dhash": pd.array(hashes, dtype="Int64")}
            )

    return media.mapInPandas(run, schema=f"{id_col} long, dhash long")


def _chunk_explode(hash_col: str) -> F.Column:
    """The four 16-bit chunk (ci, cv) structs of a 64-bit hash —
    shared by every banding operator so engine/index/probe always
    derive bit-identical keys."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftright(F.col(hash_col), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("cv"),
                )
                for i in range(4)
            ]
        )
    )


def _rem48(h: F.Column, ci: int) -> F.Column:
    """The 48 bits of a 64-bit hash OUTSIDE chunk ``ci`` (a Python
    literal — Java shifts mod-64, so ci=0/3 need dedicated forms)."""
    if ci == 0:
        return F.shiftrightunsigned(h, 16)
    if ci == 3:
        return h.bitwiseAND(F.lit((1 << 48) - 1))
    low = h.bitwiseAND(F.lit((1 << (16 * ci)) - 1))
    high = F.shiftleft(F.shiftrightunsigned(h, 16 * (ci + 1)), 16 * ci)
    return low.bitwiseOR(high)


def _sub_chunk_case(h: F.Column, ci: F.Column) -> F.Column:
    """array<struct<si,scv>> of the four 12-bit sub-chunks of the
    48-bit remainder outside chunk ``ci`` (a column). Pigeonhole at
    the next level down: a pair agreeing on chunk ci with <= 3
    differing bits has all of them in the remainder, and 3 bits touch
    at most 3 of the 4 sub-chunks — so the pair shares at least one
    (si, scv). Used to RE-SPLIT hot (ci, cv) buckets instead of
    letting their candidate pairs go quadratic."""
    expr = None
    for i in range(4):
        rem = _rem48(h, i)
        arr = F.array(
            *[
                F.struct(
                    F.lit(s).alias("si"),
                    F.shiftrightunsigned(rem, 12 * s)
                    .bitwiseAND(F.lit(0xFFF))
                    .cast("int")
                    .alias("scv"),
                )
                for s in range(4)
            ]
        )
        expr = F.when(ci == i, arr) if expr is None else expr.when(ci == i, arr)
    return expr


def _oversize_guard(max_bucket: int, what: str):
    """Opaque execution-time guard over a bucket-count frame: raises
    when any count exceeds ``max_bucket``. Same rationale as
    similarity.lsh_cosine_neardup_pairs — a raise_error inside a CASE
    gets elided (Catalyst infers isnotnull from downstream equi-joins
    and pushes it below the raising expression); a pandas UDF is the
    only guard the optimizer cannot route around."""
    msg = (
        f"{what}: banding bucket exceeds max_bucket={max_bucket} "
        "(hot chunk value — solid frames / letterboxing / logo images "
        "make perceptual-hash chunks collide at corpus scale). "
        "Exact-dedup the media first, raise max_bucket, or pass "
        "on_oversize='drop' to skip hot buckets with reported counters."
    )

    @F.pandas_udf(LongType())
    def _guard(n: pd.Series) -> pd.Series:
        if (n > max_bucket).any():
            bad = int(n[n > max_bucket].iloc[0])
            raise ValueError(f"{msg} (observed bucket size {bad})")
        return n.astype("int64")

    return _guard


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_bucket: int = 2000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over 64-bit
    perceptual hashes, via 16-bit-chunk pigeonhole banding (the
    SimHash banding idiom, operators/dedup.simhash_near_pairs): any
    pair within ``max_hamming`` <= 3 bits agrees on at least one of
    the four 16-bit chunks, so candidates come from four equality
    joins on (chunk_idx, chunk_value) — never an all-pairs scan —
    and verify with one xor+popcount. Returns (id_a, id_b, hamming),
    id_a < id_b.

    Oversize-bucket policy (real image/audio corpora hot-bucket
    exactly here — solid frames, letterboxing, near-constant audio,
    logo images — and a (ci, cv) bucket's candidate pairs grow as
    occupancy²): a bucket over ``max_bucket`` RE-SPLITS on the four
    12-bit sub-chunks of the 48 remaining bits (pigeonhole still
    exact — <= 3 differing bits touch at most 3 of 4 sub-chunks), the
    same hierarchy idea as similarity.lsh_cosine_neardup_pairs. A
    sub-bucket STILL over ``max_bucket`` (only possible for near-
    identical hashes no bit position separates) follows
    ``on_oversize``: ``"raise"`` (default — the LSH/SemDeDup policy)
    or ``"drop"`` with counters reported via ``stats_out``
    (``hot_buckets``, ``dropped_subbuckets``, ``dropped_rows``).

    The (id, hash, chunk) frame is persisted for the duration of the
    plan: it is 4 rows x ~32 bytes per image — negligible next to the
    decoded payloads its lineage would otherwise re-decode once per
    branch (count pass + both self-join sides)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    chunks = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        _chunk_explode(hash_col).alias("_c"),
    ).select("_id", "_h", F.col("_c.ci").alias("ci"), F.col("_c.cv").alias("cv"))
    chunks = chunks.persist()

    cnt = chunks.groupBy("ci", "cv").agg(F.count(F.lit(1)).alias("_n"))
    hot_keys = cnt.filter(F.col("_n") > max_bucket).select("ci", "cv")
    # cold rows pair on (ci, cv) exactly as before; hot-bucket rows
    # leave via a broadcast anti join (map-side, empty for healthy
    # corpora) and re-enter through the sub-chunk split below
    cold = chunks.join(F.broadcast(hot_keys), ["ci", "cv"], "left_anti")
    hot = chunks.join(F.broadcast(hot_keys), ["ci", "cv"])
    sub = hot.select(
        "ci", "cv", "_id", "_h",
        F.explode(_sub_chunk_case(F.col("_h"), F.col("ci"))).alias("_s"),
    ).select(
        "ci", "cv", "_id", "_h",
        F.col("_s.si").alias("si"), F.col("_s.scv").alias("scv"),
    )
    scnt = sub.groupBy("ci", "cv", "si", "scv").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if on_oversize == "raise":
        scnt = scnt.withColumn(
            "_n", _oversize_guard(max_bucket, "phash_near_pairs")("_n")
        )
    elif stats_out is not None:
        row = (
            scnt.filter(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        stats_out["hot_buckets"] = hot_keys.count()
        stats_out["dropped_subbuckets"] = int(row["b"])
        stats_out["dropped_rows"] = int(row["r"])
    sub_hot_keys = scnt.filter(F.col("_n") > max_bucket).select(
        "ci", "cv", "si", "scv"
    )
    sub_ok = sub.join(F.broadcast(sub_hot_keys), ["ci", "cv", "si", "scv"],
                      "left_anti")

    def _pairs(df: DataFrame, keys: list[str]) -> DataFrame:
        a = df.select(
            *keys, F.col("_id").alias("id_a"), F.col("_h").alias("h_a")
        )
        b = df.select(
            *keys, F.col("_id").alias("id_b"), F.col("_h").alias("h_b")
        )
        return (
            a.join(b, keys)
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "h_a", "h_b")
        )

    cand = (
        _pairs(cold, ["ci", "cv"])
        .unionByName(_pairs(sub_ok, ["ci", "cv", "si", "scv"]))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synthesize_noise_images(
    docs: DataFrame, width: int = 18, height: int = 16,
    key_prefix: str = "",
) -> DataFrame:
    """Deterministic pseudorandom BMP corpus from the documents
    table: pixel bytes are a SHA-256 counter stream keyed on doc_id,
    so every image is reproducible, visually distinct, and carries a
    non-degenerate dHash (the smooth gradients of synthesize_media
    all share one dHash — useless for near-dup testing; hash-noise
    images give each doc a unique fingerprint). ``key_prefix`` puts a
    batch in its own stream NAMESPACE (the synthesize_noise_audio
    'wav:' idiom): planted novel batches built from offset numeric
    ids could otherwise alias a real corpus doc's stream at a larger
    scale factor (doc_id = d+300000 exists once the corpus passes
    300k docs)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height * 3
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime_type": [],
                    "n_bytes": [], "source": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                buf = b""
                ctr = 0
                while len(buf) < n:
                    buf += hashlib.sha256(
                        f"{key_prefix}{i}:{ctr}".encode()
                    ).digest()
                    ctr += 1
                px = np.frombuffer(buf[:n], dtype=np.uint8).reshape(
                    height, width, 3
                )
                payload = codecs.encode_bmp(px)
                rows["media_id"].append(i)
                rows["payload"].append(payload)
                rows["mime_type"].append("image/bmp")
                rows["n_bytes"].append(len(payload))
                rows["source"].append("synth-noise")
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(build, schema=MEDIA_SCHEMA)


def synthesize_noise_video(
    docs: DataFrame, key_prefix: str = "", max_docs: int | None = None,
    head_trim: int = 0,
) -> DataFrame:
    """Deterministic pseudorandom Y4M corpus: 16x8 luma, n_frames =
    3 + doc_id % 5 (oracle-computable without decoding), each frame a
    SHA-256 counter stream keyed on (doc_id, frame) — DECORRELATED
    frames, unlike :func:`synthesize_video`'s gradients whose
    adjacent frames share a dHash within a few bits (every offset
    then ties and shift assertions are vacuous). ``key_prefix``
    namespaces planted batches (the synthesize_noise_images idiom)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 8 * 16
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime_type": [],
                    "n_bytes": [], "source": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                frames = []
                for f in range(head_trim, 3 + i % 5):
                    buf = b""
                    ctr = 0
                    while len(buf) < n:
                        buf += hashlib.sha256(
                            f"{key_prefix}y4m:{i}:{f}:{ctr}".encode()
                        ).digest()
                        ctr += 1
                    frames.append(
                        np.frombuffer(buf[:n], dtype=np.uint8).reshape(8, 16)
                    )
                payload = codecs.encode_y4m(frames)
                rows["media_id"].append(i)
                rows["payload"].append(payload)
                rows["mime_type"].append("video/x-yuv4mpeg")
                rows["n_bytes"].append(len(payload))
                rows["source"].append("synth-noise")
            yield pd.DataFrame(rows)

    out = docs.select("doc_id")
    if max_docs is not None:
        out = out.filter(F.col("doc_id") < max_docs)
    return out.mapInPandas(build, schema=MEDIA_SCHEMA)


def _audiofp_bits(frames: np.ndarray) -> int:
    """64-bit audio energy-trend fingerprint (the Chromaprint/
    Philips-robust-hash SHAPE at SQL-checkable complexity: compare
    energies of adjacent windows, one bit each): integer mono mix,
    65 equal windows, window energy = sum |x|, bit i = e[i+1] > e[i].
    All-integer arithmetic — bit-deterministic on any platform. Short
    clips sample overlapping windows (>= 1 frame each), total for any
    n_frames >= 1."""
    if frames.ndim == 2:
        mono = frames.astype(np.int64).sum(axis=1) // frames.shape[1]
    else:
        mono = frames.astype(np.int64)
    n = mono.shape[0]
    e = np.empty(65, dtype=np.int64)
    a = np.abs(mono)
    for w in range(65):
        s0 = min(w * n // 65, n - 1)
        s1 = max((w + 1) * n // 65, s0 + 1)
        e[w] = int(a[s0:s1].sum())
    val = 0
    for i in range(64):
        val = (val << 1) | (1 if e[i + 1] > e[i] else 0)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def audio_fp64(
    media: DataFrame,
    fake: bool = True,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(id, afp) per WAV payload — the audio sibling of
    :func:`dhash64`: re-encoded/slightly-edited copies of the same
    recording land within a few Hamming bits, and
    :func:`phash_near_pairs` (hash_col='afp') pairs them without an
    all-pairs scan. Real decode for RIFF-PCM WAV; ``fake`` governs
    unrecognized payloads exactly like decode_media; ``on_error``
    (fake=False): ``"raise"`` or ``"null"`` — NULL-hash row per
    undecodable payload, the continuous-gate quarantine mode (see
    :func:`dhash64`). One linear mapInPandas pass, no shuffle."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                frames = None
                bad = False
                if codecs.sniff_format(payload) == "wav":
                    try:
                        _, _, _, frames = codecs.decode_wav(payload)
                    except Exception as exc:  # noqa: BLE001 - corrupt payload
                        if not fake and on_error == "raise":
                            raise ValueError(
                                f"corrupt WAV payload: {exc}"
                            ) from exc
                        bad = True
                if frames is None:
                    if fake:
                        d = hashlib.md5(payload).digest()
                        val = int.from_bytes(d[:8], "big", signed=True)
                    elif bad or on_error == "null":
                        val = None
                    else:
                        raise NotImplementedError(
                            "audio_fp64 decodes RIFF-PCM WAV only; call "
                            "with fake=True for plumbing tests"
                        )
                else:
                    val = _audiofp_bits(frames)
                ids.append(int(mid))
                fps.append(val)
            yield pd.DataFrame(
                {id_col: ids, "afp": pd.array(fps, dtype="Int64")}
            )

    return media.mapInPandas(run, schema=f"{id_col} long, afp long")


def synthesize_noise_audio(
    docs: DataFrame, n_frames: int = 4096, key_prefix: str = ""
) -> DataFrame:
    """Deterministic pseudorandom WAV corpus (SHA-256 counter stream
    -> int16 PCM), one distinct clip per doc — noise gives each clip
    a unique, non-degenerate energy-trend fingerprint (the synth sine
    sweeps of synthesize_media have near-flat window energies).
    ``key_prefix`` namespaces planted batches (the
    synthesize_noise_images idiom: offset numeric ids could alias a
    real corpus stream at a larger scale factor)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nbytes = n_frames * 2
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime_type": [],
                    "n_bytes": [], "source": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                buf = b""
                ctr = 0
                while len(buf) < nbytes:
                    buf += hashlib.sha256(
                        f"{key_prefix}wav:{i}:{ctr}".encode()
                    ).digest()
                    ctr += 1
                frames = np.frombuffer(buf[:nbytes], dtype="<i2").astype(
                    np.int16
                )
                payload = codecs.encode_wav(frames, sample_rate=16_000)
                rows["media_id"].append(i)
                rows["payload"].append(payload)
                rows["mime_type"].append("audio/wav")
                rows["n_bytes"].append(len(payload))
                rows["source"].append("synth-noise")
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(build, schema=MEDIA_SCHEMA)


def video_frame_hashes(
    media: DataFrame,
    every_n: int = 1,
    fake: bool = True,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(id, frame_idx, fhash) — per-sampled-frame 64-bit dHash over
    Y4M luma planes (the video face of :func:`dhash64`): near-
    duplicate videos (re-encodes, trims, watermark-free mirrors of
    the same clip) share frame fingerprints at aligned indices.
    ``every_n`` samples every n-th frame (the frame_sample_plan
    cadence). ``on_error`` (fake=False only): ``"raise"`` fails the
    task on a corrupt/unsniffable payload; ``"null"`` emits NO frame
    rows for it — the continuous-gate mode (ADVICE r12: one poison
    clip must quarantine through the gate's zero-frame decision path,
    not fail the micro-batch forever). One linear mapInPandas decode
    pass; output rows = sampled frames, never buffered whole-video."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                frames = None
                bad = False
                if codecs.sniff_format(payload) == "y4m":
                    try:
                        _, _, _, frames = codecs.decode_y4m(payload)
                    except Exception as exc:  # noqa: BLE001
                        if not fake and on_error == "raise":
                            raise ValueError(
                                f"corrupt Y4M payload: {exc}"
                            ) from exc
                        bad = True
                if frames is None:
                    if not fake:
                        if bad or on_error == "null":
                            continue  # quarantine: no frame rows
                        raise NotImplementedError(
                            "video_frame_hashes decodes Y4M only; call "
                            "with fake=True for plumbing tests"
                        )
                    d = hashlib.md5(payload).digest()
                    ids.append(int(mid))
                    idxs.append(0)
                    hs.append(int.from_bytes(d[:8], "big", signed=True))
                    continue
                for fi in range(0, len(frames), every_n):
                    ids.append(int(mid))
                    idxs.append(fi)
                    hs.append(_dhash_bits(frames[fi]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "fhash": hs}
            )

    return media.mapInPandas(
        run, schema=f"{id_col} long, frame_idx int, fhash long"
    )


def video_near_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 3,
    min_frames: int = 2,
    id_col: str = "media_id",
    max_shift: int = 2,
    max_bucket: int = 2000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-duplicate video pairs: two videos match when at least
    ``min_frames`` frames agree within ``max_hamming`` bits at ONE
    CONSISTENT frame offset in [-max_shift, +max_shift] — so a clip
    trimmed from the head, or re-cut by a few frames, still matches
    (exact-index-only alignment missed every head trim). Candidates
    come from the 16-bit-chunk pigeonhole join keyed on
    (frame_idx, chunk): side b is replicated once per offset
    (2*max_shift+1 copies of the CHUNK rows — ids and keys, never
    payloads), a pair is never compared unless some frame chunk
    collides, and matches aggregate per (pair, shift) with the best
    shift reported (ties: smallest |shift|, then smallest shift).
    Returns (id_a, id_b, n_matching_frames, shift) where
    shift = fi_b - fi_a.

    Oversize-bucket policy: a hot (frame_idx, chunk) bucket — solid
    black frames, letterboxed intros, station logos — makes the banding
    join quadratic in its occupancy. Buckets over ``max_bucket``
    follow ``on_oversize``: ``"raise"`` (default) or ``"drop"`` with
    counters via ``stats_out`` (``dropped_buckets``,
    ``dropped_rows``). No sub-chunk re-split here: the hot-frame case
    is identical frames (all 64 bits equal), which no remaining bit
    position separates — an explicit policy beats a machinery that
    cannot engage."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    if max_shift < 0:
        raise ValueError(f"max_shift must be >= 0, got {max_shift}")
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    chunks = frame_hashes.select(
        F.col(id_col).alias("_id"),
        F.col("frame_idx").alias("fi"),
        F.col("fhash").alias("_h"),
        _chunk_explode("fhash").alias("_c"),
    ).select(
        "_id", "fi", "_h",
        F.col("_c.ci").alias("ci"), F.col("_c.cv").alias("cv"),
    )
    chunks = chunks.persist()

    cnt = chunks.groupBy("fi", "ci", "cv").agg(F.count(F.lit(1)).alias("_n"))
    if on_oversize == "raise":
        cnt = cnt.withColumn(
            "_n", _oversize_guard(max_bucket, "video_near_pairs")("_n")
        )
    elif stats_out is not None:
        row = (
            cnt.filter(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        stats_out["dropped_buckets"] = int(row["b"])
        stats_out["dropped_rows"] = int(row["r"])
    hot_keys = cnt.filter(F.col("_n") > max_bucket).select("fi", "ci", "cv")
    pruned = chunks.join(F.broadcast(hot_keys), ["fi", "ci", "cv"],
                         "left_anti")

    a = pruned.select(
        F.col("fi").alias("g"), "ci", "cv",
        F.col("_id").alias("id_a"), F.col("_h").alias("h_a"),
    )
    b = pruned.select(
        "fi", "ci", "cv",
        F.col("_id").alias("id_b"), F.col("_h").alias("h_b"),
        F.explode(
            F.array(*[F.lit(s) for s in range(-max_shift, max_shift + 1)])
        ).alias("shift"),
    ).select(
        (F.col("fi") - F.col("shift")).alias("g"), "ci", "cv",
        "id_b", "h_b", "shift",
    )
    frame_matches = (
        a.join(b, ["g", "ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("g", "shift", "id_a", "id_b", "h_a", "h_b")
        .distinct()
        .where(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            <= max_hamming
        )
    )
    per_shift = frame_matches.groupBy("id_a", "id_b", "shift").agg(
        F.count(F.lit(1)).alias("_nm")
    )
    best = per_shift.groupBy("id_a", "id_b").agg(
        F.max(
            F.struct(
                F.col("_nm").alias("nm"),
                (-F.abs(F.col("shift"))).alias("negabs"),
                (-F.col("shift")).alias("negshift"),
                F.col("shift").alias("shift"),
            )
        ).alias("_b")
    )
    return (
        best.select(
            "id_a", "id_b",
            F.col("_b.nm").alias("n_matching_frames"),
            F.col("_b.shift").alias("shift"),
        )
        .where(F.col("n_matching_frames") >= min_frames)
    )


# ---------------------------------------------------------------------------
# persisted perceptual-hash index (incremental image near-dup)
# ---------------------------------------------------------------------------


def _index_chunks(
    hashes: DataFrame, id_col: str, hash_col: str, n_buckets: int
) -> DataFrame:
    """(media_id, dhash, ci, cv, cb) chunk rows for the on-disk index
    layout — one derivation shared by write/probe/insert so the
    partition bucket can never drift between them."""
    return hashes.select(
        F.col(id_col).alias("media_id"),
        F.col(hash_col).alias("dhash"),
        _chunk_explode(hash_col).alias("_c"),
    ).select(
        "media_id", "dhash",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )


def _index_n_buckets(path: str, n_buckets: int | None) -> int:
    """Resolve the index's bucket count from its persisted meta.json;
    an explicitly passed value must MATCH (a drifted n_buckets would
    silently re-bucket probe keys into the wrong partitions and lose
    candidates — fail loudly instead)."""
    import json as _json
    import os as _os

    meta_path = _os.path.join(path, "_phash_index_meta.json")
    if _os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as fh:
            stored = int(_json.load(fh)["n_buckets"])
        if n_buckets is not None and n_buckets != stored:
            raise ValueError(
                f"phash index at {path} was written with n_buckets="
                f"{stored}; caller passed {n_buckets} — a mismatched "
                "bucket count silently loses candidates"
            )
        return stored
    if n_buckets is None:
        raise ValueError(
            f"phash index at {path} has no _phash_index_meta.json "
            "(pre-meta layout); pass n_buckets explicitly"
        )
    return n_buckets


def phash_index_write(
    hashes: DataFrame,
    path: str,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int = 64,
) -> None:
    """Persist a perceptual-hash near-dup index: each 64-bit hash
    explodes into its four 16-bit chunk rows, partitioned on disk by
    (chunk index, chunk-value bucket). A probe lists the batch's
    touched (ci, cb) partitions and filters the scan STATICALLY, so
    only those directories are ever read — the image sibling of the
    MinHash band index (dedup.minhash_index_write) and the embedding
    LSH index (similarity.emb_neardup_index_write): admitting a new
    batch never re-hashes or re-scans the corpus. ``n_buckets`` is
    persisted in ``_phash_index_meta.json`` and re-read by
    probe/insert, so the partitioning knob cannot drift between
    writer and readers."""
    import json as _json
    import os as _os

    # repartition on the partition columns first: otherwise every
    # shuffle partition writes a file into every (ci, cb) dir it
    # touches — up to tasks x 4 x n_buckets tiny files. Co-locating
    # each dir's rows in one task writes exactly one file per dir
    # (raise spark.sql.shuffle.partitions for bigger corpora — the
    # file count stays one per TOUCHED (dir, task) pair).
    _index_chunks(hashes, id_col, hash_col, n_buckets).repartition(
        "ci", "cb"
    ).write.mode("overwrite").partitionBy("ci", "cb").parquet(path)
    with open(
        _os.path.join(path, "_phash_index_meta.json"), "w", encoding="utf-8"
    ) as fh:
        _json.dump({"n_buckets": int(n_buckets), "version": 1}, fh)


def phash_index_probe(
    spark,
    path: str,
    batch_hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int | None = None,
    max_bucket: int = 2000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
    scratch: list | None = None,
    with_chunk_hits: bool = False,
    presence_out: list | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the persisted index, in
    O(batch): the batch's distinct (ci, cb) keys are collected (a
    bounded set — at most 4·n_buckets, usually 4·|batch|) and pushed
    as a STATIC partition filter on the index scan, so untouched
    partitions are never read (pytest-proven: corrupting every
    untouched partition's files leaves the probe green). Candidates
    broadcast-join on the full chunk value and verify with one
    xor+popcount against the stored hash. Returns
    (batch_id, index_id, hamming). Batch-internal pairs are the
    caller's phash_near_pairs problem; this is corpus admission.

    ``n_buckets`` defaults to the value persisted at
    :func:`phash_index_write` time (see ``_index_n_buckets``).

    Oversize policy: per-(ci, cv) occupancy of the index rows the
    batch actually touches is counted on the pruned scan; a bucket
    over ``max_bucket`` (hot chunk value — the candidate fan-out per
    probing image) raises by default, or drops with counters via
    ``stats_out`` (``dropped_buckets``, ``dropped_rows``) under
    ``on_oversize='drop'``.

    ``presence_out``: when a list is passed, a LAZY
    ``(id_col, n_chunks)`` frame — :func:`phash_index_presence`
    semantics for exactly this batch — is appended to it. It shares
    the probe's persisted chunk frame and pruned index scan, so a
    caller that needs the self-insert completeness check (the gates'
    crash-window detection) avoids a second chunk derivation, touched
    collect, and index read; nothing executes unless the caller
    collects it."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    n_buckets = _index_n_buckets(path, n_buckets)
    probe = batch_hashes.select(
        F.col(id_col).alias("batch_id"),
        F.col(hash_col).alias("h_b"),
        _chunk_explode(hash_col).alias("_c"),
    ).select(
        "batch_id", "h_b",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )
    # persisted: the returned plan references this frame from several
    # subtrees (occupancy, hot-key filter, candidate join) — an early
    # unpersist re-decodes the batch once per subtree (measured ~2x
    # the probe wall). ADVICE r11 (per-micro-batch persist leak): a
    # CONTINUOUS caller passes ``scratch`` and unpersists at batch
    # end; one-shot callers let it die with their session/cache clear.
    probe = probe.persist()
    if scratch is not None:
        scratch.append(probe)
    touched = [
        (int(r["ci"]), int(r["cb"]))
        for r in probe.select("ci", "cb").distinct().collect()
    ]
    if not touched:
        if presence_out is not None:
            presence_out.append(
                spark.createDataFrame([], f"{id_col} long, n_chunks long")
            )
        return spark.createDataFrame(
            [],
            "batch_id long, index_id long, hamming int"
            + (", n_chunk_hits long" if with_chunk_hits else ""),
        )
    # grouped per-ci IN-lists, not a flat OR-chain of (ci, cb)
    # terms: IN compiles to an InSet hash probe (the flat chain
    # re-evaluates up to 4*n_buckets boolean terms per ROW after
    # pruning — measured 2.5x the probe wall at n_buckets=64), and
    # partition pruning handles IN natively
    part_filter = _touched_filter(touched)
    # explicit schema: no footer-based inference — at 100 TB schema
    # discovery over thousands of partition dirs is itself a scan,
    # and the layout is pinned by _index_chunks anyway
    idx = (
        spark.read.schema(
            "media_id long, dhash long, cv long, ci int, cb int"
        )
        .parquet(path)
        .where(part_filter)
    )
    if presence_out is not None:
        # phash_index_presence's exact semantics (join on the id's OWN
        # chunk rows, pre-hot-filter, count distinct ci) riding this
        # probe's chunk frame and pruned scan instead of re-deriving
        # both — lazy until the caller collects it
        own = probe.select(
            F.col("batch_id").alias("media_id"), "ci", "cv"
        )
        presence_out.append(
            idx.join(F.broadcast(own), ["media_id", "ci", "cv"])
            .groupBy("media_id")
            .agg(F.count_distinct("ci").alias("n_chunks"))
            .select(F.col("media_id").alias(id_col), "n_chunks")
        )

    keys = probe.select("ci", "cb", "cv").distinct()
    occ = idx.join(F.broadcast(keys), ["ci", "cb", "cv"]).groupBy(
        "ci", "cv"
    ).agg(F.count(F.lit(1)).alias("_n"))
    if on_oversize == "raise":
        occ = occ.withColumn(
            "_n", _oversize_guard(max_bucket, "phash_index_probe")("_n")
        )
    elif stats_out is not None:
        row = (
            occ.filter(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        stats_out["dropped_buckets"] = int(row["b"])
        stats_out["dropped_rows"] = int(row["r"])
    hot_keys = occ.filter(F.col("_n") > max_bucket).select("ci", "cv")
    probe_ok = probe.join(
        F.broadcast(hot_keys), ["ci", "cv"], "left_anti"
    )

    # default path: plain .distinct() over the candidate pairs — the
    # cheapest dedup plan (r12's unconditional groupBy+count_distinct
    # variant regressed this probe ~1.7x; the chunk-hit count is now
    # computed only when a caller asks, and the gates' self-detection
    # uses phash_index_presence instead — ADVICE r12)
    cand_base = idx.join(F.broadcast(probe_ok), ["ci", "cb", "cv"]).select(
        "batch_id",
        F.col("media_id").alias("index_id"),
        "h_b",
        F.col("dhash").alias("h_i"),
        "ci",
    )
    if with_chunk_hits:
        cand = cand_base.groupBy("batch_id", "index_id", "h_b", "h_i").agg(
            F.count_distinct("ci").alias("n_chunk_hits")
        )
    else:
        cand = cand_base.drop("ci").distinct()
    cols = ["batch_id", "index_id", "hamming"]
    if with_chunk_hits:
        cols.append("n_chunk_hits")
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_b").bitwiseXOR(F.col("h_i"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select(*cols)
    )


def phash_index_insert(
    spark,
    path: str,
    new_hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int | None = None,
) -> None:
    """Fold a new batch into the index: append its chunk rows into
    only the (ci, cb) partitions it touches (dynamic partition
    overwrite is unnecessary — chunk rows are append-only facts).
    Existing partitions' files are never rewritten. ``n_buckets``
    comes from the index's own meta (see ``_index_n_buckets``) — an
    insert bucketed differently from the writer would strand rows in
    partitions no probe looks at."""
    n_buckets = _index_n_buckets(path, n_buckets)
    chunks = _index_chunks(new_hashes, id_col, hash_col, n_buckets)
    # the repartition exists to co-locate each (ci, cb) dir's rows in
    # one task (one output file per dir instead of tasks x dirs); a
    # single-partition input — the gates' one-slice micro-batch
    # inserts — already writes exactly one file per touched dir from
    # its one task, so the exchange would add a full shuffle stage per
    # batch without changing the file layout at all
    if new_hashes.rdd.getNumPartitions() > 1:
        chunks = chunks.repartition("ci", "cb")
    chunks.write.mode("append").partitionBy("ci", "cb").parquet(path)


def _touched_filter(touched: list[tuple[int, int]]):
    """Grouped per-ci IN-list partition predicate for a list of
    (ci, cb) keys (shared by probe/presence — see the probe's note on
    InSet vs flat OR-chains)."""
    by_ci: dict[int, list[int]] = {}
    for ci, cb in touched:
        by_ci.setdefault(ci, []).append(cb)
    part_filter = None
    for ci, cbs in by_ci.items():
        term = (F.col("ci") == ci) & F.col("cb").isin(cbs)
        part_filter = term if part_filter is None else (part_filter | term)
    return part_filter


def phash_index_presence(
    spark,
    path: str,
    batch_hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int | None = None,
) -> DataFrame:
    """``(id_col, n_chunks)`` — how many of each given id's FOUR chunk
    rows the index already holds. The crash-window completeness check
    behind self-detection (ADVICE r11): a crash mid
    :func:`phash_index_insert` can leave an id with 1–3 of its 4 chunk
    rows durable (the partitioned append is not atomic across (ci, cb)
    dirs), and skipping the re-insert on any single chunk match would
    permanently under-index it — near-dups whose only equal chunk is a
    missing row would never match. An id's own rows live exactly in
    the partitions its own hash touches, so the scan statically prunes
    to those — O(ids), never the corpus."""
    n_buckets = _index_n_buckets(path, n_buckets)
    chunks = _index_chunks(batch_hashes, id_col, hash_col, n_buckets)
    touched = [
        (int(r["ci"]), int(r["cb"]))
        for r in chunks.select("ci", "cb").distinct().collect()
    ]
    if not touched:
        return spark.createDataFrame([], f"{id_col} long, n_chunks long")
    idx = (
        spark.read.schema("media_id long, dhash long, cv long, ci int, cb int")
        .parquet(path)
        .where(_touched_filter(touched))
    )
    own = chunks.select("media_id", "ci", "cv").distinct()
    return (
        idx.join(F.broadcast(own), ["media_id", "ci", "cv"])
        .groupBy("media_id")
        .agg(F.count_distinct("ci").alias("n_chunks"))
        .select(F.col("media_id").alias(id_col), "n_chunks")
    )


def video_index_presence(
    spark,
    path: str,
    batch_frame_hashes: DataFrame,
    id_col: str = "media_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """``(id_col, n_rows, n_expected)`` — per id, how many of its
    (frame_idx, ci) chunk rows the video index already holds vs the
    4 x n_frames a COMPLETE insert writes. The frame-level twin of
    :func:`phash_index_presence` (same crash-window rationale); the
    scan prunes to the partitions the id's own frame hashes touch."""
    n_buckets = _index_n_buckets(path, n_buckets)
    chunks = _video_index_chunks(batch_frame_hashes, id_col, n_buckets)
    touched = [
        (int(r["ci"]), int(r["cb"]))
        for r in chunks.select("ci", "cb").distinct().collect()
    ]
    if not touched:
        return spark.createDataFrame(
            [], f"{id_col} long, n_rows long, n_expected long"
        )
    idx = (
        spark.read.schema(_VIDEO_IDX_SCHEMA)
        .parquet(path)
        .where(_touched_filter(touched))
    )
    own = chunks.select("media_id", "frame_idx", "ci", "cv").distinct()
    present = (
        idx.join(F.broadcast(own), ["media_id", "frame_idx", "ci", "cv"])
        .groupBy("media_id")
        .agg(
            F.count_distinct("frame_idx", "ci").alias("n_rows")
        )
    )
    expected = own.groupBy("media_id").agg(
        F.count_distinct("frame_idx", "ci").alias("n_expected")
    )
    return (
        expected.join(present, "media_id", "left")
        .select(
            F.col("media_id").alias(id_col),
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            "n_expected",
        )
    )


# ---------------------------------------------------------------------------
# persisted video frame-hash index (incremental video near-dup)
# ---------------------------------------------------------------------------


def _video_index_chunks(
    frame_hashes: DataFrame, id_col: str, n_buckets: int
) -> DataFrame:
    """(media_id, frame_idx, fhash, ci, cv, cb) chunk rows for the
    on-disk video index — the frame-level twin of :func:`_index_chunks`
    (one derivation shared by write/probe/insert so the partition
    bucket can never drift between them)."""
    return frame_hashes.select(
        F.col(id_col).alias("media_id"),
        F.col("frame_idx"),
        F.col("fhash"),
        _chunk_explode("fhash").alias("_c"),
    ).select(
        "media_id", "frame_idx", "fhash",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )


_VIDEO_IDX_SCHEMA = (
    "media_id long, frame_idx int, fhash long, cv long, ci int, cb int"
)


def video_index_write(
    frame_hashes: DataFrame,
    path: str,
    id_col: str = "media_id",
    n_buckets: int = 64,
) -> None:
    """Persist a video frame-hash near-dup index: every sampled
    frame's 64-bit dHash (:func:`video_frame_hashes`) explodes into
    its four 16-bit chunk rows, partitioned on disk by (chunk index,
    chunk-value bucket) — the video face of :func:`phash_index_write`.
    A probe statically prunes to the batch's touched (ci, cb)
    partitions, so admitting a new clip never re-decodes or re-scans
    the corpus; frame alignment (the ±max_shift window) is applied at
    probe time, NOT baked into the layout, so one index serves any
    shift tolerance. ``n_buckets`` persists in
    ``_phash_index_meta.json`` (same meta contract as the image/audio
    index: probe/insert re-read it and a mismatched explicit value
    fails loudly)."""
    import json as _json
    import os as _os

    _video_index_chunks(frame_hashes, id_col, n_buckets).repartition(
        "ci", "cb"
    ).write.mode("overwrite").partitionBy("ci", "cb").parquet(path)
    with open(
        _os.path.join(path, "_phash_index_meta.json"), "w", encoding="utf-8"
    ) as fh:
        _json.dump(
            {"n_buckets": int(n_buckets), "version": 1, "kind": "video"}, fh
        )


def video_index_probe(
    spark,
    path: str,
    batch_frame_hashes: DataFrame,
    max_hamming: int = 3,
    min_frames: int = 2,
    max_shift: int = 2,
    id_col: str = "media_id",
    n_buckets: int | None = None,
    max_bucket: int = 2000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
    scratch: list | None = None,
    presence_out: list | None = None,
) -> DataFrame:
    """Near-dup videos between a NEW batch and the persisted frame
    index, in O(batch): the batch's distinct (ci, cb) keys push a
    STATIC partition filter on the index scan (untouched partitions
    are never read — pytest-proven by corrupting them), candidates
    broadcast-join on the full chunk value at every frame offset in
    [-max_shift, +max_shift], and a pair matches when >= ``min_frames``
    batch frames agree within ``max_hamming`` bits at ONE CONSISTENT
    offset (:func:`video_near_pairs` semantics — head-trimmed and
    re-cut clips match at their true offset). Returns
    (batch_id, index_id, n_matching_frames, shift) with the best
    shift per pair (most frames, ties: smallest |shift|, then
    smallest shift); shift = batch_frame_idx - index_frame_idx, the
    same orientation as video_near_pairs' b-relative-to-a.

    Oversize policy mirrors :func:`phash_index_probe`: per-(ci, cv)
    occupancy of the index rows the batch touches, raise by default
    or drop with ``stats_out`` counters.

    ``presence_out``: when a list is passed, a LAZY
    ``(id_col, n_rows, n_expected)`` frame —
    :func:`video_index_presence` semantics for exactly this batch —
    is appended to it, riding this probe's persisted chunk frame and
    pruned index scan instead of re-deriving both; nothing executes
    unless the caller collects it."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    if max_shift < 0:
        raise ValueError(f"max_shift must be >= 0, got {max_shift}")
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    n_buckets = _index_n_buckets(path, n_buckets)
    probe = batch_frame_hashes.select(
        F.col(id_col).alias("batch_id"),
        F.col("frame_idx").alias("fi_b"),
        F.col("fhash").alias("h_b"),
        _chunk_explode("fhash").alias("_c"),
    ).select(
        "batch_id", "fi_b", "h_b",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )
    # persisted for the returned plan's subtrees; a continuous caller
    # owns the unpersist via ``scratch`` (see phash_index_probe)
    probe = probe.persist()
    if scratch is not None:
        scratch.append(probe)
    touched = [
        (int(r["ci"]), int(r["cb"]))
        for r in probe.select("ci", "cb").distinct().collect()
    ]
    if not touched:
        if presence_out is not None:
            presence_out.append(
                spark.createDataFrame(
                    [], f"{id_col} long, n_rows long, n_expected long"
                )
            )
        return spark.createDataFrame(
            [], "batch_id long, index_id long, n_matching_frames long, "
                "shift int"
        )
    idx = (
        spark.read.schema(_VIDEO_IDX_SCHEMA)
        .parquet(path)
        .where(_touched_filter(touched))
    )
    if presence_out is not None:
        # video_index_presence's exact semantics (per id: distinct
        # (frame_idx, ci) chunk rows the index already holds vs the
        # batch's own count) riding this probe's chunk frame and
        # pruned scan — lazy until the caller collects it
        own = probe.select(
            F.col("batch_id").alias("media_id"),
            F.col("fi_b").alias("frame_idx"),
            "ci", "cv",
        )
        present = (
            idx.join(F.broadcast(own), ["media_id", "frame_idx", "ci", "cv"])
            .groupBy("media_id")
            .agg(F.count_distinct("frame_idx", "ci").alias("n_rows"))
        )
        expected = own.groupBy("media_id").agg(
            F.count_distinct("frame_idx", "ci").alias("n_expected")
        )
        presence_out.append(
            expected.join(present, "media_id", "left").select(
                F.col("media_id").alias(id_col),
                F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                "n_expected",
            )
        )

    keys = probe.select("ci", "cb", "cv").distinct()
    occ = idx.join(F.broadcast(keys), ["ci", "cb", "cv"]).groupBy(
        "ci", "cv"
    ).agg(F.count(F.lit(1)).alias("_n"))
    if on_oversize == "raise":
        occ = occ.withColumn(
            "_n", _oversize_guard(max_bucket, "video_index_probe")("_n")
        )
    elif stats_out is not None:
        row = (
            occ.filter(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
            )
            .collect()[0]
        )
        stats_out["dropped_buckets"] = int(row["b"])
        stats_out["dropped_rows"] = int(row["r"])
    hot_keys = occ.filter(F.col("_n") > max_bucket).select("ci", "cv")
    probe_ok = probe.join(
        F.broadcast(hot_keys), ["ci", "cv"], "left_anti"
    )

    # batch chunk rows replicated once per offset (keys only,
    # never payloads): index frame g matches batch frame fi_b at
    # shift = fi_b - g, so the batch side emits g = fi_b - shift
    brep = probe_ok.select(
        "batch_id", "fi_b", "h_b", "ci", "cv", "cb",
        F.explode(
            F.array(
                *[F.lit(s) for s in range(-max_shift, max_shift + 1)]
            )
        ).alias("shift"),
    ).select(
        (F.col("fi_b") - F.col("shift")).alias("g"),
        "ci", "cv", "cb", "batch_id", "h_b", "shift",
    )
    cand = (
        idx.withColumnRenamed("frame_idx", "g")
        .join(F.broadcast(brep), ["g", "ci", "cb", "cv"])
        .select(
            "batch_id",
            F.col("media_id").alias("index_id"),
            "g", "shift", "h_b",
            F.col("fhash").alias("h_i"),
        )
        .distinct()
        .where(
            F.bit_count(F.col("h_b").bitwiseXOR(F.col("h_i")))
            <= max_hamming
        )
    )
    per_shift = cand.groupBy("batch_id", "index_id", "shift").agg(
        F.count(F.lit(1)).alias("_nm")
    )
    best = per_shift.groupBy("batch_id", "index_id").agg(
        F.max(
            F.struct(
                F.col("_nm").alias("nm"),
                (-F.abs(F.col("shift"))).alias("negabs"),
                (-F.col("shift")).alias("negshift"),
                F.col("shift").alias("shift"),
            )
        ).alias("_b")
    )
    return (
        best.select(
            "batch_id", "index_id",
            F.col("_b.nm").alias("n_matching_frames"),
            F.col("_b.shift").alias("shift"),
        )
        .where(F.col("n_matching_frames") >= min_frames)
    )


def video_index_insert(
    spark,
    path: str,
    new_frame_hashes: DataFrame,
    id_col: str = "media_id",
    n_buckets: int | None = None,
) -> None:
    """Fold a new batch's frame hashes into the video index: append
    chunk rows into only the (ci, cb) partitions they touch (chunk
    rows are append-only facts; existing partitions' files are never
    rewritten). ``n_buckets`` resolves from the index meta — a
    drifted bucketing would strand rows in partitions no probe
    reads."""
    n_buckets = _index_n_buckets(path, n_buckets)
    chunks = _video_index_chunks(new_frame_hashes, id_col, n_buckets)
    # single-partition inputs (the gate's one-slice micro-batch
    # inserts) skip the co-locating exchange — one task already writes
    # one file per touched dir (see phash_index_insert)
    if new_frame_hashes.rdd.getNumPartitions() > 1:
        chunks = chunks.repartition("ci", "cb")
    chunks.write.mode("append").partitionBy("ci", "cb").parquet(path)
