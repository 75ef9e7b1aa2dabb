"""Audio + video streaming admission gates (r11: the continuous-
admission face completed across the modality triple): routing,
exactly-once epochs, crash-window convergence, and stream == batch
parity over real WAV / Y4M bytes."""

import numpy as np

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import codecs, multimodal
from ai_fabric_etl_spark.streaming.media_admission import (
    admit_audio_batch,
    admit_audio_stream,
    admit_video_batch,
    admit_video_stream,
    read_decisions,
    read_video_decisions,
)


def _wav(seed: int, n_frames: int = 1024) -> bytearray:
    rng = np.random.RandomState(seed)
    frames = rng.randint(-(2**14), 2**14, n_frames).astype(np.int16)
    return bytearray(codecs.encode_wav(frames, sample_rate=16_000))


def _y4m(seed: int, n_frames: int = 5, head_trim: int = 0) -> bytearray:
    frames = [
        np.random.RandomState(seed * 1000 + f)
        .randint(0, 256, (8, 16)).astype(np.uint8)
        for f in range(head_trim, n_frames)
    ]
    return bytearray(codecs.encode_y4m(frames))


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_audio_admission_routing_and_growth(spark, tmp_path):
    """Novel clips admit; a byte-exact copy of an indexed clip
    rejects with index provenance; a within-batch copy rejects
    against the canonical; a LATER copy of an earlier ADMITTED clip
    rejects (the insert grows the index)."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    multimodal.phash_index_write(
        multimodal.audio_fp64(_media(spark, [(1, _wav(1))]), fake=False),
        idx, hash_col="afp", n_buckets=16,
    )
    b1 = _media(spark, [(100, _wav(1)), (110, _wav(7)), (120, _wav(7))])
    admit_audio_batch(spark, b1, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of, r.hamming)
         for r in read_decisions(spark, state).collect()}
    assert d[100] == (False, 1, 0)
    assert d[110] == (True, None, None)
    assert d[120] == (False, 110, 0)

    b2 = _media(spark, [(200, _wav(7))])
    admit_audio_batch(spark, b2, idx, state, epoch_id=1, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of, r.hamming)
         for r in read_decisions(spark, state).collect()}
    assert d[200] == (False, 110, 0)


def test_audio_admission_replay_and_crash_window(spark, tmp_path):
    """Replayed epochs skip; replay after a crashed attempt that
    already inserted converges (same decisions, no duplicate index
    rows)."""
    import glob

    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    multimodal.phash_index_write(
        multimodal.audio_fp64(_media(spark, [(1, _wav(1))]), fake=False),
        idx, hash_col="afp", n_buckets=16,
    )
    b = _media(spark, [(100, _wav(9))])
    # crashed attempt: insert done, commit missing
    admit_audio_batch(spark, b, idx, str(tmp_path / "scratch"),
                      epoch_id=0, app_id="x")
    n_rows = spark.read.schema(
        "media_id long, dhash long, cv long, ci int, cb int"
    ).parquet(idx).count()
    admit_audio_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_decisions(spark, state).collect()}
    assert d == {100: (True, None)}
    got = spark.read.schema(
        "media_id long, dhash long, cv long, ci int, cb int"
    ).parquet(idx).count()
    assert got == n_rows  # no duplicate rows from the replay

    n_files = len(glob.glob(f"{idx}/**/*.parquet", recursive=True))
    admit_audio_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    assert read_decisions(spark, state).count() == 1
    assert len(glob.glob(f"{idx}/**/*.parquet", recursive=True)) == n_files


def test_audio_admission_stream_equals_batch(spark, tmp_path):
    """File-stream (availableNow, one batch per file) == direct batch
    calls: same decisions, equivalently-probing index."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, _wav(1)), (2, _wav(2))],
        [(3, _wav(1)), (10, _wav(7)), (20, _wav(7))],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {"media_id": [r[0] for r in rows],
             "payload": [bytes(r[1]) for r in rows]}
        ).to_parquet(src / f"b{i}.parquet")

    def init(idx):
        multimodal.phash_index_write(
            spark.createDataFrame([], "media_id long, afp long"),
            idx, hash_col="afp", n_buckets=16,
        )

    idx_b, st_b = str(tmp_path / "idx_b"), str(tmp_path / "st_b")
    init(idx_b)
    for i, rows in enumerate(batches):
        admit_audio_batch(spark, _media(spark, rows), idx_b, st_b,
                          epoch_id=i, app_id="b")

    idx_s, st_s = str(tmp_path / "idx_s"), str(tmp_path / "st_s")
    init(idx_s)
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = admit_audio_stream(stream, idx_s, st_s,
                           checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    def canon(state):
        return sorted(
            (r.media_id, r.admitted, r.dup_of, r.hamming)
            for r in read_decisions(spark, state).collect()
        )

    assert canon(st_s) == canon(st_b)
    probe = multimodal.audio_fp64(
        _media(spark, [(100, _wav(7)), (101, _wav(2))]), fake=False
    )
    pb = {(r.batch_id, r.index_id)
          for r in multimodal.phash_index_probe(
              spark, idx_b, probe, hash_col="afp").collect()}
    ps = {(r.batch_id, r.index_id)
          for r in multimodal.phash_index_probe(
              spark, idx_s, probe, hash_col="afp").collect()}
    assert pb == ps == {(100, 10), (101, 2)}


def _init_video_index(spark, idx, rows):
    multimodal.video_index_write(
        multimodal.video_frame_hashes(_media(spark, rows), fake=False),
        idx, n_buckets=16,
    )


def test_video_admission_routing_shift_and_growth(spark, tmp_path):
    """A byte-exact copy AND a head-trimmed re-upload of an indexed
    clip both reject (the trim at its true offset); novel clips
    admit; a within-batch copy rejects against the canonical; a later
    copy of an admitted clip rejects (the insert grows the index)."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init_video_index(spark, idx, [(1, _y4m(1)), (2, _y4m(2))])

    b1 = _media(spark, [
        (100, _y4m(1)),                       # byte-exact copy of 1
        (101, _y4m(2, head_trim=1)),          # head-trimmed copy of 2
        (110, _y4m(7)),                       # novel
        (120, _y4m(7)),                       # within-batch copy of 110
        (130, _y4m(9)),                       # novel
    ])
    admit_video_batch(spark, b1, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of, r.matched_frames, r.shift)
         for r in read_video_decisions(spark, state).collect()}
    assert d[100] == (False, 1, 5, 0)
    assert d[101] == (False, 2, 4, -1)        # trimmed: 4 frames at -1
    assert d[110] == (True, None, None, None)
    assert d[120] == (False, 110, 5, 0)
    assert d[130] == (True, None, None, None)

    b2 = _media(spark, [(200, _y4m(7))])
    admit_video_batch(spark, b2, idx, state, epoch_id=1, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_video_decisions(spark, state).collect()}
    assert d[200] == (False, 110)


def test_video_admission_replay_and_crash_window(spark, tmp_path):
    """Replayed epochs skip; replay after a crashed attempt that
    already inserted converges (same decisions, no duplicate frame
    rows)."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init_video_index(spark, idx, [(1, _y4m(1))])
    b = _media(spark, [(100, _y4m(9)), (110, _y4m(1))])

    admit_video_batch(spark, b, idx, str(tmp_path / "scratch"),
                      epoch_id=0, app_id="x")
    n_rows = spark.read.schema(
        "media_id long, frame_idx int, fhash long, cv long, ci int, cb int"
    ).parquet(idx).count()
    admit_video_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_video_decisions(spark, state).collect()}
    assert d == {100: (True, None), 110: (False, 1)}
    got = spark.read.schema(
        "media_id long, frame_idx int, fhash long, cv long, ci int, cb int"
    ).parquet(idx).count()
    assert got == n_rows

    admit_video_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    assert read_video_decisions(spark, state).count() == 2


def test_video_admission_stream_equals_batch(spark, tmp_path):
    """File-stream == direct batch calls for the video gate."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, _y4m(1))],
        [(10, _y4m(7)), (20, _y4m(7)), (30, _y4m(1, head_trim=1))],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {"media_id": [r[0] for r in rows],
             "payload": [bytes(r[1]) for r in rows]}
        ).to_parquet(src / f"b{i}.parquet")

    def init(idx):
        multimodal.video_index_write(
            spark.createDataFrame(
                [], "media_id long, frame_idx int, fhash long"),
            idx, n_buckets=16,
        )

    idx_b, st_b = str(tmp_path / "idx_b"), str(tmp_path / "st_b")
    init(idx_b)
    for i, rows in enumerate(batches):
        admit_video_batch(spark, _media(spark, rows), idx_b, st_b,
                          epoch_id=i, app_id="b")

    idx_s, st_s = str(tmp_path / "idx_s"), str(tmp_path / "st_s")
    init(idx_s)
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = admit_video_stream(stream, idx_s, st_s,
                           checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    def canon(state):
        return sorted(
            (r.media_id, r.admitted, r.dup_of, r.matched_frames, r.shift)
            for r in read_video_decisions(spark, state).collect()
        )

    assert canon(st_s) == canon(st_b)
    # the head-trimmed clip 30 rejected against clip 1 in both
    d = dict((r.media_id, (r.admitted, r.dup_of, r.shift))
             for r in read_video_decisions(spark, st_s).collect())
    assert d[30] == (False, 1, -1)


def test_video_zero_frame_payload_quarantines(spark, tmp_path):
    """A decodable Y4M with ZERO frames yields no frame hashes — it
    must still get a decision row (ADVICE r11: one decision per input
    id): quarantined as admitted=false with NULL dup_of, and nothing
    of it enters the index."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init_video_index(spark, idx, [(1, _y4m(1))])
    empty_clip = bytearray(b"YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420\n")
    b = _media(spark, [(100, _y4m(9)), (110, empty_clip)])
    admit_video_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_video_decisions(spark, state).collect()}
    assert d == {100: (True, None), 110: (False, None)}
    idx_ids = {
        r.media_id
        for r in spark.read.schema(
            "media_id long, frame_idx int, fhash long, cv long, ci int, "
            "cb int"
        ).parquet(idx).select("media_id").distinct().collect()
    }
    assert idx_ids == {1, 100}


def test_video_partial_self_insert_completes_on_replay(spark, tmp_path):
    """Crash mid video_index_insert leaves an id with only SOME of its
    frame-chunk rows durable. Replay must NOT skip the re-insert on a
    partial id (ADVICE r11: single-chunk self-detection permanently
    under-indexed it); after replay the id is fully present and a
    copy of it still rejects."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init_video_index(spark, idx, [(1, _y4m(1))])

    b = _media(spark, [(100, _y4m(9))])
    fh = multimodal.video_frame_hashes(b, fake=False)
    # simulate the crashed attempt: only chunk ci=0 rows made it in
    partial = multimodal._video_index_chunks(fh, "media_id", 16).filter(
        F.col("ci") == 0
    )
    partial.repartition("ci", "cb").write.mode("append").partitionBy(
        "ci", "cb"
    ).parquet(idx)

    # replay of the never-committed epoch: presence check sees the
    # partial insert and re-inserts in full
    admit_video_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_video_decisions(spark, state).collect()}
    assert d == {100: (True, None)}
    pres = multimodal.video_index_presence(spark, idx, fh).collect()[0]
    assert pres.n_rows == pres.n_expected  # fully indexed now

    probe = multimodal.video_index_probe(
        spark, idx, multimodal.video_frame_hashes(
            _media(spark, [(200, _y4m(9))]), fake=False
        ),
    )
    assert {(r.batch_id, r.index_id) for r in probe.collect()} == {(200, 100)}


def test_video_poison_payload_quarantines(spark, tmp_path):
    """ADVICE r12: a corrupt / unsniffable video payload must not fail
    the micro-batch (the image/audio hashers already had
    on_error='null'; the video hasher gained it this round — it emits
    NO frame rows for the poison clip, which then quarantines through
    the zero-frame decision path). Decodable clips in the same batch
    route normally; the poison id never enters the index."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init_video_index(spark, idx, [(1, _y4m(1))])
    corrupt = bytearray(bytes(_y4m(7))[:40])   # sniffs Y4M, truncated
    garbage = bytearray(b"\x00\x01not-a-video")  # unsniffable
    b = _media(spark, [(100, _y4m(9)), (110, corrupt), (120, garbage)])
    admit_video_batch(spark, b, idx, state, epoch_id=0, app_id="t")
    d = {r.media_id: (r.admitted, r.dup_of)
         for r in read_video_decisions(spark, state).collect()}
    assert d == {100: (True, None), 110: (False, None),
                 120: (False, None)}
    idx_ids = {
        r.media_id
        for r in spark.read.schema(
            "media_id long, frame_idx int, fhash long, cv long, ci int, "
            "cb int"
        ).parquet(idx).select("media_id").distinct().collect()
    }
    assert idx_ids == {1, 100}
