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
) -> DataFrame:
    """(id, dhash) per image payload — the image sibling of SimHash
    for text: near-duplicate images (same picture re-encoded, minor
    crops/brightness shifts) land within a few Hamming bits.

    REAL decode for BMP/PPM/PGM payloads (pure-numpy codecs);
    ``fake`` governs unrecognized/corrupt payloads exactly like
    :func:`decode_media` (deterministic md5-derived fake hash, or
    raise). mapInPandas, Arrow-batched, constant memory per batch —
    the 100 TB shape is one linear decode pass; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = codecs.sniff_format(payload)
                px = None
                try:
                    if fmt == "bmp":
                        _, _, _, px = codecs.decode_bmp(payload)
                    elif fmt in ("ppm", "pgm"):
                        _, _, _, px = codecs.decode_pnm(payload)
                except Exception as exc:  # noqa: BLE001 - sniffed-but-corrupt
                    if not fake:
                        raise ValueError(
                            f"corrupt {fmt} payload: {exc}"
                        ) from exc
                if px is None:
                    if not fake:
                        raise NotImplementedError(
                            "dhash64 decodes BMP/PPM/PGM without an imaging "
                            "library; call with fake=True for plumbing tests"
                        )
                    d = hashlib.md5(payload).digest()
                    val = int.from_bytes(d[:8], "big", signed=True)
                else:
                    val = _dhash_bits(px)
                ids.append(int(mid))
                hashes.append(val)
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return media.mapInPandas(run, schema=f"{id_col} long, dhash long")


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over 64-bit
    perceptual hashes, via 16-bit-chunk pigeonhole banding (the
    SimHash banding idiom, operators/dedup.simhash_near_pairs): any
    pair within ``max_hamming`` <= 3 bits agrees on at least one of
    the four 16-bit chunks, so candidates come from four equality
    joins on (chunk_idx, chunk_value) — never an all-pairs scan —
    and verify with one xor+popcount. Returns (id_a, id_b, hamming),
    id_a < id_b."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    chunks = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
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
        ).alias("_c"),
    ).select("_id", "_h", F.col("_c.ci").alias("ci"), F.col("_c.cv").alias("cv"))
    a = chunks.select(
        F.col("ci"), F.col("cv"),
        F.col("_id").alias("id_a"), F.col("_h").alias("h_a"),
    )
    b = chunks.select(
        F.col("ci"), F.col("cv"),
        F.col("_id").alias("id_b"), F.col("_h").alias("h_b"),
    )
    cand = (
        a.join(b, ["ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
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
    docs: DataFrame, width: int = 18, height: int = 16
) -> DataFrame:
    """Deterministic pseudorandom BMP corpus from the documents
    table: pixel bytes are a SHA-256 counter stream keyed on doc_id,
    so every image is reproducible, visually distinct, and carries a
    non-degenerate dHash (the smooth gradients of synthesize_media
    all share one dHash — useless for near-dup testing; hash-noise
    images give each doc a unique fingerprint)."""

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
                    buf += hashlib.sha256(f"{i}:{ctr}".encode()).digest()
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
) -> DataFrame:
    """(id, afp) per WAV payload — the audio sibling of
    :func:`dhash64`: re-encoded/slightly-edited copies of the same
    recording land within a few Hamming bits, and
    :func:`phash_near_pairs` (hash_col='afp') pairs them without an
    all-pairs scan. Real decode for RIFF-PCM WAV; ``fake`` governs
    unrecognized payloads exactly like decode_media. One linear
    mapInPandas pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                frames = None
                if codecs.sniff_format(payload) == "wav":
                    try:
                        _, _, _, frames = codecs.decode_wav(payload)
                    except Exception as exc:  # noqa: BLE001 - corrupt payload
                        if not fake:
                            raise ValueError(
                                f"corrupt WAV payload: {exc}"
                            ) from exc
                if frames is None:
                    if not fake:
                        raise NotImplementedError(
                            "audio_fp64 decodes RIFF-PCM WAV only; call "
                            "with fake=True for plumbing tests"
                        )
                    d = hashlib.md5(payload).digest()
                    val = int.from_bytes(d[:8], "big", signed=True)
                else:
                    val = _audiofp_bits(frames)
                ids.append(int(mid))
                fps.append(val)
            yield pd.DataFrame({id_col: ids, "afp": fps})

    return media.mapInPandas(run, schema=f"{id_col} long, afp long")


def synthesize_noise_audio(
    docs: DataFrame, n_frames: int = 4096
) -> DataFrame:
    """Deterministic pseudorandom WAV corpus (SHA-256 counter stream
    -> int16 PCM), one distinct clip per doc — noise gives each clip
    a unique, non-degenerate energy-trend fingerprint (the synth sine
    sweeps of synthesize_media have near-flat window energies)."""

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
                    buf += hashlib.sha256(f"wav:{i}:{ctr}".encode()).digest()
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
) -> DataFrame:
    """(id, frame_idx, fhash) — per-sampled-frame 64-bit dHash over
    Y4M luma planes (the video face of :func:`dhash64`): near-
    duplicate videos (re-encodes, trims, watermark-free mirrors of
    the same clip) share frame fingerprints at aligned indices.
    ``every_n`` samples every n-th frame (the frame_sample_plan
    cadence). One linear mapInPandas decode pass; output rows =
    sampled frames, never buffered whole-video."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                frames = None
                if codecs.sniff_format(payload) == "y4m":
                    try:
                        _, _, _, frames = codecs.decode_y4m(payload)
                    except Exception as exc:  # noqa: BLE001
                        if not fake:
                            raise ValueError(
                                f"corrupt Y4M payload: {exc}"
                            ) from exc
                if frames is None:
                    if not fake:
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
) -> DataFrame:
    """Near-duplicate video pairs: two videos match when at least
    ``min_frames`` index-aligned sampled frames agree within
    ``max_hamming`` bits. Candidates come from the 16-bit-chunk
    pigeonhole join keyed on (frame_idx, chunk) — a pair is never
    compared unless some frame chunk collides, so the work is bounded
    by bucket occupancy, not video-pairs. Returns
    (id_a, id_b, n_matching_frames)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    chunks = frame_hashes.select(
        F.col(id_col).alias("_id"),
        F.col("frame_idx").alias("fi"),
        F.col("fhash").alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("fhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("_c"),
    ).select(
        "_id", "fi", "_h",
        F.col("_c.ci").alias("ci"), F.col("_c.cv").alias("cv"),
    )
    a = chunks.select(
        "fi", "ci", "cv",
        F.col("_id").alias("id_a"), F.col("_h").alias("h_a"),
    )
    b = chunks.select(
        "fi", "ci", "cv",
        F.col("_id").alias("id_b"), F.col("_h").alias("h_b"),
    )
    frame_matches = (
        a.join(b, ["fi", "ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("fi", "id_a", "id_b", "h_a", "h_b")
        .distinct()
        .where(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            <= max_hamming
        )
    )
    return (
        frame_matches.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .where(F.col("n_matching_frames") >= min_frames)
    )


# ---------------------------------------------------------------------------
# persisted perceptual-hash index (incremental image near-dup)
# ---------------------------------------------------------------------------


def phash_index_write(
    hashes: DataFrame,
    path: str,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int = 64,
) -> None:
    """Persist a perceptual-hash near-dup index: each 64-bit hash
    explodes into its four 16-bit chunk rows, partitioned on disk by
    (chunk index, chunk-value bucket). A probe joins on the partition
    columns under a broadcast, so Spark's dynamic partition pruning
    reads ONLY the buckets the batch touches — the image sibling of
    the MinHash band index (dedup.minhash_index_write) and the
    embedding LSH index (similarity.emb_neardup_index_write):
    admitting a new batch never re-hashes or re-scans the corpus."""
    chunks = hashes.select(
        F.col(id_col).alias("media_id"),
        F.col(hash_col).alias("dhash"),
        F.explode(
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
        ).alias("_c"),
    ).select(
        "media_id", "dhash",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )
    chunks.write.mode("overwrite").partitionBy("ci", "cb").parquet(path)


def phash_index_probe(
    spark,
    path: str,
    batch_hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int = 64,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the persisted index, in
    O(batch): the batch's chunk keys broadcast against the index scan
    (partition pruning on (ci, cb) + the chunk equality), candidates
    verify with one xor+popcount against the stored hash. Returns
    (batch_id, index_id, hamming). Batch-internal pairs are the
    caller's phash_near_pairs problem; this is corpus admission."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    idx = spark.read.parquet(path)
    probe = batch_hashes.select(
        F.col(id_col).alias("batch_id"),
        F.col(hash_col).alias("h_b"),
        F.explode(
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
        ).alias("_c"),
    ).select(
        "batch_id", "h_b",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )
    cand = (
        idx.join(F.broadcast(probe), ["ci", "cb", "cv"])
        .select(
            "batch_id",
            F.col("media_id").alias("index_id"),
            "h_b",
            F.col("dhash").alias("h_i"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_b").bitwiseXOR(F.col("h_i"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("batch_id", "index_id", "hamming")
    )


def phash_index_insert(
    spark,
    path: str,
    new_hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_buckets: int = 64,
) -> None:
    """Fold a new batch into the index: append its chunk rows into
    only the (ci, cb) partitions it touches (dynamic partition
    overwrite is unnecessary — chunk rows are append-only facts).
    Existing partitions' files are never rewritten."""
    chunks = new_hashes.select(
        F.col(id_col).alias("media_id"),
        F.col(hash_col).alias("dhash"),
        F.explode(
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
        ).alias("_c"),
    ).select(
        "media_id", "dhash",
        F.col("_c.ci").alias("ci"),
        F.col("_c.cv").alias("cv"),
        (F.col("_c.cv") % n_buckets).alias("cb"),
    )
    chunks.write.mode("append").partitionBy("ci", "cb").parquet(path)
