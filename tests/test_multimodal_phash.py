"""Image perceptual hashing: dHash bit math, decode integration,
and Hamming-banding pair recall (operators/multimodal.py)."""

import numpy as np

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import codecs, multimodal


def _cells_image(cells: np.ndarray, cell_w: int = 2, cell_h: int = 2):
    """8x9 cell-value matrix -> (16, 18, 3) uint8 image where every
    pixel of a cell carries the cell value (area mean == value)."""
    assert cells.shape == (8, 9)
    img = np.repeat(np.repeat(cells, cell_h, axis=0), cell_w, axis=1)
    return np.stack([img] * 3, axis=2).astype(np.uint8)


def _expected_bits(cells: np.ndarray) -> int:
    val = 0
    for r in range(8):
        for c in range(8):
            val = (val << 1) | (1 if cells[r, c + 1] > cells[r, c] else 0)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def test_dhash_bits_exact_cell_math():
    rng = np.random.RandomState(7)
    cells = rng.randint(0, 256, size=(8, 9))
    assert multimodal._dhash_bits(_cells_image(cells)) == _expected_bits(
        cells
    )


def test_dhash_stable_under_tiny_perturbation():
    """Cells spaced >= 8 apart: a single +1 pixel cannot flip any
    neighbor comparison -> identical hash (the near-dup property)."""
    cells = (np.arange(72).reshape(8, 9) * 3 % 240).astype(np.int64)
    base = _cells_image(cells)
    pert = base.copy()
    pert[0, 0, 0] = min(255, int(pert[0, 0, 0]) + 1)
    h0 = multimodal._dhash_bits(base)
    h1 = multimodal._dhash_bits(pert)
    assert h0 == h1


def test_dhash_single_designed_flip():
    """Swapping one cell comparison flips exactly that bit."""
    cells = np.full((8, 9), 100, dtype=np.int64)
    cells[:, 1::2] = 120  # alternating pattern
    h0 = multimodal._dhash_bits(_cells_image(cells))
    flipped = cells.copy()
    # raising cell (3,4) from 100 to 130 flips BOTH its comparisons:
    # (3,3): 130>120 now true (was 100>120 false) and
    # (3,4): 120>130 now false (was 120>100 true)
    flipped[3, 4] = 130
    h1 = multimodal._dhash_bits(_cells_image(flipped))
    xor = (h0 ^ h1) & ((1 << 64) - 1)
    assert bin(xor).count("1") == 2


def test_dhash_small_images_total():
    """Images smaller than the 9x8 grid still hash (overlapping
    bands), deterministically."""
    tiny = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    h1 = multimodal._dhash_bits(tiny)
    h2 = multimodal._dhash_bits(tiny.copy())
    assert h1 == h2


def test_dhash64_real_decode_roundtrip(spark):
    """dhash64(fake=False) over encoded BMP bytes equals _dhash_bits
    of the source pixels."""
    rng = np.random.RandomState(3)
    imgs = {i: rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
            for i in range(5)}
    rows = [(i, bytearray(codecs.encode_bmp(px))) for i, px in imgs.items()]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.dhash
           for r in multimodal.dhash64(media, fake=False).collect()}
    want = {i: multimodal._dhash_bits(px) for i, px in imgs.items()}
    assert got == want


def test_phash_near_pairs_banding_matches_bruteforce(spark):
    """Chunk-banding recall == brute force for hamming <= 3, including
    sign-bit hashes (arithmetic shiftright masked per chunk)."""
    rng = np.random.RandomState(11)
    base = [int(rng.randint(-(2**62), 2**62)) for _ in range(30)]
    h0 = base[0] | (1 << 62)
    hashes = list(base)
    hashes[0] = h0
    hashes.append(h0 ^ (1 << 5))                       # ham 1
    hashes.append(h0 ^ (1 << 5) ^ (1 << 20) ^ (1 << 40))  # ham 3
    hashes.append(h0 ^ 0xF)                            # ham 4: excluded
    neg = -(2**63) + 12345                             # sign bit set
    hashes.append(neg)
    hashes.append(neg ^ (1 << 63 - 1) if False else neg ^ 1)  # ham 1
    rows = [(i, h if h < 2**63 else h - 2**64)
            for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in multimodal.phash_near_pairs(df, max_hamming=3).collect()}
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((rows[i][0], rows[j][0], d))
    assert got == want
    assert len(want) >= 3  # the designed pairs are actually present

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.phash_near_pairs(df, max_hamming=5)


def test_audiofp_exact_window_math():
    """Fingerprint equals the hand-computed energy-trend bits."""
    rng = np.random.RandomState(5)
    frames = rng.randint(-30000, 30000, size=650).astype(np.int16)
    a = np.abs(frames.astype(np.int64))
    n = 650
    e = []
    for w in range(65):
        s0 = min(w * n // 65, n - 1)
        s1 = max((w + 1) * n // 65, s0 + 1)
        e.append(int(a[s0:s1].sum()))
    want = 0
    for i in range(64):
        want = (want << 1) | (1 if e[i + 1] > e[i] else 0)
    if want >= 1 << 63:
        want -= 1 << 64
    assert multimodal._audiofp_bits(frames) == want


def test_audiofp_real_codec_roundtrip_and_stability(spark):
    """audio_fp64(fake=False) over encoded WAV bytes equals
    _audiofp_bits of the source frames; a byte-exact copy matches at
    hamming 0 through the banding pairs."""
    rng = np.random.RandomState(9)
    clips = {i: rng.randint(-(2**14), 2**14, size=1024).astype(np.int16)
             for i in range(4)}
    rows = [(i, bytearray(codecs.encode_wav(f))) for i, f in clips.items()]
    rows.append((100, rows[0][1]))  # byte-exact copy of clip 0
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = multimodal.audio_fp64(media, fake=False)
    got = {r.media_id: r.afp for r in fps.collect()}
    for i, f in clips.items():
        assert got[i] == multimodal._audiofp_bits(f)
    assert got[100] == got[0]
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in multimodal.phash_near_pairs(
                 fps, max_hamming=3, hash_col="afp").collect()}
    assert pairs[(0, 100)] == 0


def test_audiofp_short_and_stereo_total():
    mono = np.array([5, -3], dtype=np.int16)
    h1 = multimodal._audiofp_bits(mono)
    h2 = multimodal._audiofp_bits(mono.copy())
    assert h1 == h2
    stereo = np.array([[100, 200], [-50, 60], [7, -7]], dtype=np.int16)
    assert isinstance(multimodal._audiofp_bits(stereo), int)


def test_video_frame_hashes_parity_and_sampling(spark):
    """Frame hashes equal _dhash_bits of the decoded luma planes;
    every_n samples exactly the planned indices."""
    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 256, (8, 16)).astype(np.uint8)
              for _ in range(5)]
    payload = bytearray(codecs.encode_y4m(frames))
    media = spark.createDataFrame(
        [(7, payload)], "media_id long, payload binary"
    )
    got = {(r.media_id, r.frame_idx): r.fhash
           for r in multimodal.video_frame_hashes(
               media, every_n=2, fake=False).collect()}
    assert set(got) == {(7, 0), (7, 2), (7, 4)}
    # y4m round trip is C420: re-decode to compare against the same
    # stored luma the operator hashed
    _, _, _, back = codecs.decode_y4m(bytes(payload))
    for fi in (0, 2, 4):
        assert got[(7, fi)] == multimodal._dhash_bits(back[fi])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.video_frame_hashes(media, every_n=0)


def test_video_near_pairs_trim_and_threshold(spark):
    """A trimmed copy matches on exactly its shared prefix frames;
    min_frames gates weaker overlaps out."""
    rng = np.random.RandomState(17)
    frames = [rng.randint(0, 256, (8, 16)).astype(np.uint8)
              for _ in range(5)]
    full = bytearray(codecs.encode_y4m(frames))
    trimmed = bytearray(codecs.encode_y4m(frames[:3]))
    other = bytearray(codecs.encode_y4m(
        [rng.randint(0, 256, (8, 16)).astype(np.uint8) for _ in range(4)]
    ))
    media = spark.createDataFrame(
        [(1, full), (2, trimmed), (3, other)],
        "media_id long, payload binary",
    )
    fh = multimodal.video_frame_hashes(media, fake=False)
    got = {(r.id_a, r.id_b): r.n_matching_frames
           for r in multimodal.video_near_pairs(
               fh, max_hamming=3, min_frames=2).collect()}
    assert got == {(1, 2): 3}
    # raising the floor above the overlap drops the pair
    got4 = multimodal.video_near_pairs(fh, max_hamming=3, min_frames=4)
    assert got4.count() == 0


def test_phash_index_probe_parity_and_insert(spark, tmp_path):
    """Index probe == brute-force batch-vs-corpus hamming pairs;
    inserted batches become visible to later probes without
    rewriting existing partition files."""
    import glob

    rng = np.random.RandomState(23)
    corpus_px = {i: rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
                 for i in range(12)}
    corpus = spark.createDataFrame(
        [(i, bytearray(codecs.encode_bmp(px)))
         for i, px in corpus_px.items()],
        "media_id long, payload binary",
    )
    hashes = multimodal.dhash64(corpus, fake=False)
    idx = str(tmp_path / "index")
    multimodal.phash_index_write(hashes, idx)
    n_files_before = len(glob.glob(f"{idx}/**/*.parquet", recursive=True))

    # batch: copies of 0 and 5, one novel image
    batch_px = {100: corpus_px[0], 105: corpus_px[5],
                300: rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)}
    batch = spark.createDataFrame(
        [(i, bytearray(codecs.encode_bmp(px)))
         for i, px in batch_px.items()],
        "media_id long, payload binary",
    )
    bh = multimodal.dhash64(batch, fake=False)
    got = {(r.batch_id, r.index_id): r.hamming
           for r in multimodal.phash_index_probe(
               spark, idx, bh, max_hamming=3).collect()}
    # brute force
    ch = {i: multimodal._dhash_bits(px) for i, px in corpus_px.items()}
    bhh = {i: multimodal._dhash_bits(px) for i, px in batch_px.items()}
    want = {}
    for b, hb in bhh.items():
        for c, hc in ch.items():
            d = bin((hb ^ hc) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(b, c)] = d
    assert got == want
    assert (100, 0) in got and got[(100, 0)] == 0
    assert (105, 5) in got and got[(105, 5)] == 0

    # insert the batch; a copy of the NOVEL image must now match it
    multimodal.phash_index_insert(spark, idx, bh)
    n_files_after = len(glob.glob(f"{idx}/**/*.parquet", recursive=True))
    assert n_files_after > n_files_before  # appended, nothing rewritten
    probe2 = spark.createDataFrame(
        [(400, bytearray(codecs.encode_bmp(batch_px[300])))],
        "media_id long, payload binary",
    )
    got2 = {(r.batch_id, r.index_id): r.hamming
            for r in multimodal.phash_index_probe(
                spark, idx, multimodal.dhash64(probe2, fake=False),
                max_hamming=3).collect()}
    assert got2.get((400, 300)) == 0


# ---------------------------------------------------------------------------
# r10: oversize-bucket policy + shift-robust video + index meta/pruning
# ---------------------------------------------------------------------------


def _brute_pairs(rows, max_hamming=3):
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                a, b = sorted((rows[i][0], rows[j][0]))
                want.add((a, b, d))
    return want


def test_phash_hot_bucket_resplit_keeps_recall(spark):
    """A bucket over max_bucket re-splits on 12-bit sub-chunks of the
    remaining 48 bits instead of going quadratic — and recall against
    brute force is preserved (the letterbox case: shared chunk,
    differing elsewhere)."""
    rng = np.random.RandomState(31)
    shared_cv = 0xBEEF
    rows = []
    for i in range(20):  # all share chunk 0 -> one hot (ci=0, cv) bucket
        rest = int(rng.randint(0, 2**48))
        rows.append((i, (rest << 16) | shared_cv))
    # planted near-dups INSIDE the hot bucket (differ by 1 bit in the
    # remainder -> share 3 of 4 sub-chunks) and a cold-bucket pair
    rows.append((100, rows[0][1] ^ (1 << 20)))
    rows.append((200, int(rng.randint(0, 2**62))))
    rows.append((201, rows[-1][1] ^ (1 << 3)))
    signed = [(i, h if h < 2**63 else h - 2**64) for i, h in rows]
    df = spark.createDataFrame(signed, "media_id long, dhash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in multimodal.phash_near_pairs(
               df, max_hamming=3, max_bucket=5).collect()}
    assert got == _brute_pairs(signed)
    assert (0, 100, 1) in got  # the hot-bucket planted pair survived


def test_phash_degenerate_corpus_raises_not_quadratic(spark):
    """>max_bucket IDENTICAL hashes (the gradient-corpus case STATUS
    documents) raise by default; on_oversize='drop' reports counters
    instead of silently emitting occupancy^2 candidates."""
    import pytest

    df = spark.createDataFrame(
        [(i, 12345) for i in range(10)], "media_id long, dhash long"
    )
    with pytest.raises(Exception, match="max_bucket"):
        multimodal.phash_near_pairs(df, max_bucket=5).collect()
    stats = {}
    got = multimodal.phash_near_pairs(
        df, max_bucket=5, on_oversize="drop", stats_out=stats
    ).collect()
    assert got == []
    assert stats["hot_buckets"] == 4  # every chunk of the one hash
    assert stats["dropped_subbuckets"] == 16
    assert stats["dropped_rows"] == 160
    with pytest.raises(ValueError, match="on_oversize"):
        multimodal.phash_near_pairs(df, on_oversize="explode")


def test_video_hot_frame_bucket_policy(spark):
    """>max_bucket videos sharing one frame hash at one index (solid
    black intro frame) raise by default / drop with counters."""
    import pytest

    rows = [(i, 0, 777) for i in range(8)]  # 8 videos, same frame 0
    # frame 1 distinct in EVERY 16-bit chunk (h = i replicated per
    # chunk) so only frame 0's four buckets are hot
    rows += [(i, 1, ((i + 1) << 48) | ((i + 1) << 32) | ((i + 1) << 16)
              | (i + 1)) for i in range(8)]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, fhash long"
    )
    with pytest.raises(Exception, match="max_bucket"):
        multimodal.video_near_pairs(df, max_bucket=5, min_frames=1).collect()
    stats = {}
    got = multimodal.video_near_pairs(
        df, max_bucket=5, min_frames=1, on_oversize="drop", stats_out=stats
    ).collect()
    assert got == []  # the only collisions lived in the dropped bucket
    assert stats["dropped_buckets"] == 4
    assert stats["dropped_rows"] == 32


def test_video_head_trim_matches_via_shift(spark):
    """A clip trimmed from the HEAD (indices shifted) matches at the
    consistent negative offset — the r9 index-aligned-only gap."""
    rng = np.random.RandomState(41)
    frames = [rng.randint(0, 256, (8, 16)).astype(np.uint8)
              for _ in range(5)]
    full = bytearray(codecs.encode_y4m(frames))
    head_trim = bytearray(codecs.encode_y4m(frames[1:]))  # drops frame 0
    media = spark.createDataFrame(
        [(1, full), (2, head_trim)], "media_id long, payload binary"
    )
    fh = multimodal.video_frame_hashes(media, fake=False)
    got = {(r.id_a, r.id_b): (r.n_matching_frames, r.shift)
           for r in multimodal.video_near_pairs(
               fh, max_hamming=3, min_frames=2, max_shift=2).collect()}
    assert got == {(1, 2): (4, -1)}
    # with max_shift=0 (the r9 behavior) the head trim is invisible
    got0 = multimodal.video_near_pairs(
        fh, max_hamming=3, min_frames=2, max_shift=0
    ).collect()
    assert got0 == []


def test_video_exact_copy_reports_shift_zero(spark):
    """A byte-exact copy must win at offset 0 even with the shift
    window open (ties break toward the smallest |shift|)."""
    rng = np.random.RandomState(43)
    frames = [rng.randint(0, 256, (8, 16)).astype(np.uint8)
              for _ in range(4)]
    payload = bytearray(codecs.encode_y4m(frames))
    media = spark.createDataFrame(
        [(1, payload), (2, payload)], "media_id long, payload binary"
    )
    fh = multimodal.video_frame_hashes(media, fake=False)
    [r] = multimodal.video_near_pairs(
        fh, max_hamming=3, min_frames=2, max_shift=2
    ).collect()
    assert (r.id_a, r.id_b, r.n_matching_frames, r.shift) == (1, 2, 4, 0)


def test_phash_index_meta_pins_n_buckets(spark, tmp_path):
    """The index persists n_buckets; probe/insert resolve it from the
    meta and a mismatched explicit value fails LOUDLY instead of
    silently losing candidates (ADVICE r9)."""
    import os

    import pytest

    hashes = spark.createDataFrame(
        [(i, 1000 + i) for i in range(6)], "media_id long, dhash long"
    )
    idx = str(tmp_path / "idx")
    multimodal.phash_index_write(hashes, idx, n_buckets=16)
    batch = spark.createDataFrame([(99, 1000)], "media_id long, dhash long")
    # meta-resolved probe works with no explicit n_buckets
    got = multimodal.phash_index_probe(spark, idx, batch).collect()
    assert {(r.batch_id, r.index_id, r.hamming) for r in got} >= {(99, 0, 0)}
    with pytest.raises(ValueError, match="n_buckets"):
        multimodal.phash_index_probe(spark, idx, batch, n_buckets=32)
    with pytest.raises(ValueError, match="n_buckets"):
        multimodal.phash_index_insert(spark, idx, batch, n_buckets=32)
    # matching explicit value is accepted
    multimodal.phash_index_insert(spark, idx, batch, n_buckets=16)
    # legacy pre-meta layout: explicit value required
    os.remove(os.path.join(idx, "_phash_index_meta.json"))
    with pytest.raises(ValueError, match="explicitly"):
        multimodal.phash_index_probe(spark, idx, batch)
    got2 = multimodal.phash_index_probe(
        spark, idx, batch, n_buckets=16
    ).collect()
    assert len(got2) >= 1


def test_phash_index_probe_static_pruning_64(spark, tmp_path):
    """The 100 TB pruning claim, proven mechanically at n_buckets=64:
    every partition the 1-image batch does NOT touch is corrupted on
    disk; the probe must stay green (it never opens those files),
    while a full scan of the corrupted index fails."""
    import glob
    import os

    import pytest

    rng = np.random.RandomState(47)
    rows = [(i, int(rng.randint(-(2**62), 2**62))) for i in range(300)]
    hashes = spark.createDataFrame(rows, "media_id long, dhash long")
    idx = str(tmp_path / "idx64")
    multimodal.phash_index_write(hashes, idx, n_buckets=64)

    h0 = rows[0][1]
    touched = {(i, ((h0 >> (16 * i)) & 0xFFFF) % 64) for i in range(4)}
    n_corrupt = 0
    for f in glob.glob(f"{idx}/ci=*/cb=*/*.parquet"):
        parts = f.split(os.sep)
        ci = int(parts[-3].split("=")[1])
        cb = int(parts[-2].split("=")[1])
        if (ci, cb) not in touched:
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")
            n_corrupt += 1
    assert n_corrupt > 200  # the corruption is widespread and real
    batch = spark.createDataFrame([(999, h0)], "media_id long, dhash long")
    got = {(r.batch_id, r.index_id, r.hamming)
           for r in multimodal.phash_index_probe(spark, idx, batch).collect()}
    assert (999, 0, 0) in got
    # sanity: an unpruned scan of the same index cannot survive
    with pytest.raises(Exception):
        spark.read.parquet(idx).groupBy("ci").count().collect()


def test_phash_index_probe_hot_bucket_policy(spark, tmp_path):
    """A hot index chunk value (the per-probe fan-out bound) raises
    by default and drops-with-counters on request."""
    import pytest

    hashes = spark.createDataFrame(
        [(i, 555) for i in range(10)], "media_id long, dhash long"
    )
    idx = str(tmp_path / "hot")
    multimodal.phash_index_write(hashes, idx, n_buckets=16)
    batch = spark.createDataFrame([(99, 555)], "media_id long, dhash long")
    with pytest.raises(Exception, match="max_bucket"):
        multimodal.phash_index_probe(
            spark, idx, batch, max_bucket=5
        ).collect()
    stats = {}
    got = multimodal.phash_index_probe(
        spark, idx, batch, max_bucket=5, on_oversize="drop",
        stats_out=stats,
    ).collect()
    assert got == []
    assert stats["dropped_buckets"] == 4
    assert stats["dropped_rows"] == 40


# ---------------------------------------------------------------------------
# r11: audio + video persisted indexes (incremental near-dup per modality)
# ---------------------------------------------------------------------------


def _y4m(i, n_frames=None, head_trim=0):
    """Decorrelated pseudorandom frames (one RandomState per
    (clip, frame)): adjacent frames of the same clip must NOT be
    near-duplicates of each other, or every offset matches and the
    shift assertion is vacuous."""
    n = n_frames if n_frames is not None else 3 + i % 5
    frames = [
        np.random.RandomState(i * 1000 + f)
        .randint(0, 256, (8, 16)).astype(np.uint8)
        for f in range(head_trim, n)
    ]
    return bytearray(codecs.encode_y4m(frames))


def test_audio_index_reuses_phash_trio(spark, tmp_path):
    """The persisted index trio is hash-agnostic: audio_fp64
    fingerprints (hash_col='afp') write/probe/insert through the same
    machinery — a byte-exact copy of an indexed clip probes at
    hamming 0, a novel clip stays silent until inserted."""
    from ai_fabric_etl_spark.operators.multimodal import (
        audio_fp64,
        phash_index_insert,
        phash_index_probe,
        phash_index_write,
        synthesize_noise_audio,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    corpus = synthesize_noise_audio(docs, n_frames=1024)
    idx = str(tmp_path / "audio_idx")
    phash_index_write(
        audio_fp64(corpus, fake=False), idx, hash_col="afp", n_buckets=16
    )

    copies = synthesize_noise_audio(
        docs.filter("doc_id < 2"), n_frames=1024
    ).select((F.col("media_id") + 100).alias("media_id"), "payload",
             "mime_type", "n_bytes", "source")
    novel = synthesize_noise_audio(
        spark.createDataFrame([(200,), (201,)], "doc_id long"),
        n_frames=1024,
    )
    bh = audio_fp64(copies.unionByName(novel), fake=False)
    got = {(r.batch_id, r.index_id): r.hamming
           for r in phash_index_probe(
               spark, idx, bh, max_hamming=3, hash_col="afp").collect()}
    assert got.get((100, 0)) == 0 and got.get((101, 1)) == 0
    assert not any(b >= 200 for b, _ in got)

    phash_index_insert(spark, idx, bh, hash_col="afp")
    reprobe = audio_fp64(
        synthesize_noise_audio(
            spark.createDataFrame([(200,)], "doc_id long"), n_frames=1024
        ).select((F.col("media_id") + 300).alias("media_id"), "payload",
                 "mime_type", "n_bytes", "source"),
        fake=False,
    )
    got2 = {(r.batch_id, r.index_id): r.hamming
            for r in phash_index_probe(
                spark, idx, reprobe, max_hamming=3, hash_col="afp"
            ).collect()}
    assert got2.get((500, 200)) == 0


def test_video_index_probe_parity_and_insert(spark, tmp_path):
    """Video index probe == the batch-vs-corpus slice of
    video_near_pairs (same min_frames / consistent-shift semantics):
    byte-exact copies match with full frame count at shift 0, a
    head-trimmed clip matches at its true offset, novel clips stay
    silent until inserted."""
    from ai_fabric_etl_spark.operators.multimodal import (
        video_frame_hashes,
        video_index_insert,
        video_index_probe,
        video_index_write,
    )

    corpus = spark.createDataFrame(
        [(i, _y4m(i, n_frames=6)) for i in range(6)],
        "media_id long, payload binary",
    )
    fh = video_frame_hashes(corpus, every_n=1, fake=False)
    idx = str(tmp_path / "vidx")
    video_index_write(fh, idx, n_buckets=16)

    batch = spark.createDataFrame(
        [
            (100, _y4m(0, n_frames=6)),              # byte-exact copy of 0
            (101, _y4m(3, n_frames=6, head_trim=1)),  # head-trimmed copy of 3
            (300, _y4m(77, n_frames=6)),              # novel
        ],
        "media_id long, payload binary",
    )
    bfh = video_frame_hashes(batch, every_n=1, fake=False)
    got = {(r.batch_id, r.index_id): (r.n_matching_frames, r.shift)
           for r in video_index_probe(
               spark, idx, bfh, max_hamming=3, min_frames=2, max_shift=2
           ).collect()}
    assert got[(100, 0)] == (6, 0)
    # trimmed clip: its frame 0 is the original's frame 1 -> every
    # batch frame fi_b matches index frame fi_b + 1, shift = -1
    assert got[(101, 3)] == (5, -1)
    assert not any(b == 300 for b, _ in got)

    video_index_insert(spark, idx, bfh)
    probe2 = video_frame_hashes(
        spark.createDataFrame(
            [(400, _y4m(77, n_frames=6))], "media_id long, payload binary"
        ),
        every_n=1, fake=False,
    )
    got2 = {(r.batch_id, r.index_id): (r.n_matching_frames, r.shift)
            for r in video_index_probe(
                spark, idx, probe2, max_hamming=3, min_frames=2, max_shift=2
            ).collect()}
    assert got2.get((400, 300)) == (6, 0)


def test_video_index_probe_static_pruning(spark, tmp_path):
    """The video index inherits the mechanical pruning proof: every
    (ci, cb) partition the 1-clip batch does NOT touch is corrupted;
    the probe stays green, a full scan fails."""
    import glob
    import os

    import pytest

    from ai_fabric_etl_spark.operators.multimodal import (
        video_index_probe,
        video_index_write,
    )

    rng = np.random.RandomState(53)
    rows = [
        (i, fi, int(rng.randint(-(2**62), 2**62)))
        for i in range(150) for fi in range(4)
    ]
    fh = spark.createDataFrame(rows, "media_id long, frame_idx int, fhash long")
    idx = str(tmp_path / "vidx64")
    video_index_write(fh, idx, n_buckets=64)

    clip0 = [(999, fi, h) for (i, fi, h) in rows if i == 0]
    touched = {
        (ci, ((h >> (16 * ci)) & 0xFFFF) % 64)
        for (_, _, h) in clip0 for ci in range(4)
    }
    n_corrupt = 0
    for f in glob.glob(f"{idx}/ci=*/cb=*/*.parquet"):
        parts = f.split(os.sep)
        ci = int(parts[-3].split("=")[1])
        cb = int(parts[-2].split("=")[1])
        if (ci, cb) not in touched:
            with open(f, "wb") as fh2:
                fh2.write(b"not a parquet file")
            n_corrupt += 1
    assert n_corrupt > 150
    batch = spark.createDataFrame(
        clip0, "media_id long, frame_idx int, fhash long"
    )
    got = {(r.batch_id, r.index_id): (r.n_matching_frames, r.shift)
           for r in video_index_probe(
               spark, idx, batch, max_hamming=0, min_frames=4, max_shift=0
           ).collect()}
    assert got.get((999, 0)) == (4, 0)
    with pytest.raises(Exception):
        spark.read.parquet(idx).groupBy("ci").count().collect()


def test_video_index_meta_pins_n_buckets(spark, tmp_path):
    """A video index insert/probe with a mismatched explicit
    n_buckets fails loudly (same meta contract as the image index)."""
    import pytest

    from ai_fabric_etl_spark.operators.multimodal import (
        video_index_insert,
        video_index_probe,
        video_index_write,
    )

    fh = spark.createDataFrame(
        [(1, 0, 42), (1, 1, 43)], "media_id long, frame_idx int, fhash long"
    )
    idx = str(tmp_path / "vmeta")
    video_index_write(fh, idx, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        video_index_probe(spark, idx, fh, n_buckets=32)
    with pytest.raises(ValueError, match="n_buckets"):
        video_index_insert(spark, idx, fh, n_buckets=8)
    # matching explicit value and meta-resolved default both work
    assert video_index_probe(spark, idx, fh, n_buckets=16,
                             min_frames=2).count() > 0
