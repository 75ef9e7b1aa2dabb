"""Embedding streaming admission gate (streaming/embedding_admission):
routing, exactly-once epochs, the receipt-guarded crash windows, and
stream == batch parity. The planted quadrant value matrix is
driver-gated by the embedding_admission_gate oracle entry."""

import numpy as np

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import similarity
from ai_fabric_etl_spark.streaming.embedding_admission import (
    _receipt_path,
    admit_embeddings_batch,
    admit_embeddings_stream,
    read_decisions,
)

DIM = 64


def _vec(seed: int, bump: int | None = None) -> list[float]:
    v = np.random.RandomState(seed).normal(0, 0.1, DIM)
    if bump is not None:
        v[bump % DIM] += 1000.0
    return [float(x) for x in v]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(s, b)) for i, s, b in rows],
        "vec_id long, embedding array<float>",
    )


def _init(spark, idx, rows):
    similarity.emb_neardup_index_write(
        _emb(spark, rows).select("vec_id", "embedding"), idx
    )


def test_embedding_admission_routing_and_growth(spark, tmp_path):
    """Corpus copies reject with index provenance at cosine 1.0;
    distinct-bump vectors admit; a within-batch copy rejects against
    the component canonical; a later copy of an admitted vector
    rejects (the insert grows the index)."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init(spark, idx, [(1, 1, None), (2, 2, None)])

    b1 = _emb(spark, [
        (100, 1, None),   # copy of corpus 1
        (110, 7, 7),      # novel (bumped on coord 7)
        (120, 7, 7),      # within-batch copy of 110
        (130, 9, 9),      # novel
    ])
    admit_embeddings_batch(spark, b1, idx, state, epoch_id=0,
                           app_id="t", threshold=0.95)
    d = {r.vec_id: (r.admitted, r.dup_of, r.cosine)
         for r in read_decisions(spark, state).collect()}
    assert d[100] == (False, 1, 1.0)
    assert d[110] == (True, None, None)
    assert d[120] == (False, 110, 1.0)
    assert d[130] == (True, None, None)

    b2 = _emb(spark, [(200, 7, 7)])
    admit_embeddings_batch(spark, b2, idx, state, epoch_id=1,
                           app_id="t", threshold=0.95)
    d = {r.vec_id: (r.admitted, r.dup_of)
         for r in read_decisions(spark, state).collect()}
    assert d[200] == (False, 110)


def test_embedding_admission_replay_and_receipt_windows(spark, tmp_path):
    """Replayed epochs skip. Crash AFTER the receipt (inserts
    durable, commit missing): replay skips the re-insert — no
    duplicate key/vec rows — and commits identical decisions. Crash
    BEFORE the receipt: replay re-inserts; decisions identical."""
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    _init(spark, idx, [(1, 1, None)])
    # 120 is a within-batch copy of 100: under the grown index of the
    # crashed attempt this pair arrives via BOTH the batch path and
    # the index path — the decision join must not fan out
    b = _emb(spark, [(100, 9, 9), (110, 1, None), (120, 9, 9)])

    # crashed attempt on a scratch state: inserts + receipt written
    # under app 't' (the receipt key is the app identity)
    admit_embeddings_batch(spark, b, idx, str(tmp_path / "scratch"),
                           epoch_id=0, app_id="t", threshold=0.95)
    import os
    assert os.path.exists(_receipt_path(idx, "t", 0))
    n_vecs = spark.read.parquet(f"{idx}/vecs").count()

    admit_embeddings_batch(spark, b, idx, state, epoch_id=0,
                           app_id="t", threshold=0.95)
    rows = read_decisions(spark, state).collect()
    assert len(rows) == 3  # one decision per input, no join fan-out
    d = {r.vec_id: (r.admitted, r.dup_of) for r in rows}
    assert d == {100: (True, None), 110: (False, 1), 120: (False, 100)}
    assert spark.read.parquet(f"{idx}/vecs").count() == n_vecs  # no dup rows

    # replayed epoch: decisions and index untouched
    admit_embeddings_batch(spark, b, idx, state, epoch_id=0,
                           app_id="t", threshold=0.95)
    assert read_decisions(spark, state).count() == 3

    # crash BEFORE the receipt, different app: rows re-insert fully
    idx2 = str(tmp_path / "idx2")
    _init(spark, idx2, [(1, 1, None)])
    b2 = _emb(spark, [(300, 5, 5)])
    to_insert = b2  # what the crashed attempt inserted
    similarity.emb_neardup_index_insert(to_insert, idx2)
    admit_embeddings_batch(spark, b2, idx2, str(tmp_path / "s2"),
                           epoch_id=0, app_id="u", threshold=0.95)
    d = {r.vec_id: (r.admitted, r.dup_of)
         for r in read_decisions(spark, str(tmp_path / "s2")).collect()}
    # own prior insert is classified by id membership as batch-side,
    # never a corpus duplicate — the decision stays admit
    assert d == {300: (True, None)}


def test_embedding_admission_stream_equals_batch(spark, tmp_path):
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(100, 9, 9), (110, 1, None)],
        [(200, 9, 9), (210, 3, 3)],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows],
             "embedding": [_vec(r[1], r[2]) for r in rows]}
        ).to_parquet(src / f"b{i}.parquet")

    ib, sb = str(tmp_path / "ib"), str(tmp_path / "sb")
    _init(spark, ib, [(1, 1, None)])
    for i, rows in enumerate(batches):
        admit_embeddings_batch(spark, _emb(spark, rows), ib, sb,
                               epoch_id=i, app_id="b", threshold=0.95)

    is_, ss = str(tmp_path / "is"), str(tmp_path / "ss")
    _init(spark, is_, [(1, 1, None)])
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
    )
    q = admit_embeddings_stream(stream, is_, ss,
                                checkpoint=str(tmp_path / "ckpt"),
                                threshold=0.95)
    q.awaitTermination(120)

    def canon(state):
        return sorted(
            (r.vec_id, r.admitted, r.dup_of, r.cosine)
            for r in read_decisions(spark, state).collect()
        )

    assert canon(ss) == canon(sb)
    d = dict((r.vec_id, (r.admitted, r.dup_of))
             for r in read_decisions(spark, ss).collect())
    assert d[110] == (False, 1)     # corpus dup
    assert d[200] == (False, 100)   # dup of batch-1 admitted vector
    assert d[210] == (True, None)
