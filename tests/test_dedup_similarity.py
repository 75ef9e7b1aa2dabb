"""Dedup + similarity operators: LSH variants verified against their
exact counterparts on the driver's synthetic tables."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import dedup, similarity
from ai_fabric_etl_spark.operators.text import text_profile


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup_groups_partition(docs):
    """Dedup groups partition the table: counts sum to row count."""
    total = docs.count()
    grouped = dedup.exact_dedup_groups(docs).agg(F.sum("dup_count")).collect()[0][0]
    assert grouped == total


def test_drop_exact_duplicates_idempotent(spark, docs):
    """Dropping duplicates twice equals dropping once, and survivors
    plus their duplicates account for every row."""
    once = dedup.drop_exact_duplicates(docs).cache()
    twice = dedup.drop_exact_duplicates(once)
    assert once.count() == twice.count()
    # union with a copy -> dedup recovers the original survivor count
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    assert dedup.drop_exact_duplicates(doubled).count() == once.count()


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates, after Jaccard verification, must contain every
    exact pair at jaccard >= 0.7 (well above the ~0.59 s-curve knee)
    and no false positives (verification is exact)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    for pair in lsh:
        assert pair in exact, f"false positive {pair}"
        assert lsh[pair] == pytest.approx(exact[pair])
    high = {p for p, j in exact.items() if j >= 0.7}
    missed = high - set(lsh)
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_incremental_matches_batch(spark, docs, tmp_path):
    """Incremental screening against a persisted index equals the
    batch LSH path restricted to pairs that involve the new batch:
    same candidates, same exact-Jaccard verdicts. The batch mixes
    planted exact copies (must match their originals at 1.0) with
    novel docs renumbered out of the corpus range."""
    corpus = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    dedup.minhash_index_write(corpus, idx)

    copies = corpus.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    novel = (
        docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 440))
        .select((F.col("doc_id") + 30000).alias("doc_id"), "text")
    )
    batch = copies.unionByName(novel)

    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_incremental(batch, idx, threshold=0.5).collect()
    }
    # every planted copy matches its original exactly
    for i in range(20):
        assert inc.get((i, i + 20000)) == pytest.approx(1.0)
    # parity: batch path over corpus+batch, restricted to new-doc pairs
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            corpus.unionByName(batch), threshold=0.5
        ).collect()
        if r["doc_b"] >= 20000
    }
    assert inc == pytest.approx(full)


def test_simhash_pairs_are_symmetric_sane(docs):
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 3


def test_simhash_identical_docs_zero_hamming(spark):
    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "entirely different words appear in this one text")],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(d, max_hamming=64).collect()}
    assert pairs.get((1, 2)) == 0


def test_lsh_topk_recall(emb):
    """Multi-table hyperplane LSH: measure recall@5 vs brute force;
    must be well above random (random ~ 5/N) and mostly correct."""
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall@5 too low: {recall}"


def test_brute_force_topk_self_excluded_and_ranked(emb):
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["cosine_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_text_profile_sanity(docs):
    prof = text_profile(docs)
    rows = prof.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        assert r["n_tokens"] > 0
        assert 0 <= r["quality_score"] <= 100
        assert r["predicted_lang"] in ("en", "de", "fr", "es", "zh", "und")
        assert len(r["fingerprint"]) == 32


def test_multimodal_decode_plumbing(spark, docs):
    from ai_fabric_etl_spark.operators import multimodal

    media = multimodal.attach_binary_payload(docs.limit(20))
    decoded = multimodal.decode_media(media, fake=True).collect()
    assert len(decoded) == 20
    for r in decoded:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["channels"] <= 3
        assert len(r["content_digest"]) == 32

    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        multimodal.decode_media(media, fake=False).collect()


def test_frame_sample_plan(spark, docs):
    from ai_fabric_etl_spark.operators import multimodal

    media = multimodal.attach_binary_payload(docs.limit(5))
    frames = multimodal.frame_sample_plan(media, every_n=10).collect()
    assert frames
    for r in frames:
        assert r["frame_index"] % 10 == 0


def test_ivf_topk_recall(emb):
    """IVF k-means cells: recall@5 vs brute force with 4/16 cells
    probed; n_probe=n_centroids must reproduce brute force exactly."""
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall@5 too low: {recall}"

    full = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert full == exact, "probing every cell must equal brute force"


def test_multimodal_features_feed_similarity(spark, sf_dir):
    """extract_features output slots straight into brute_force_topk."""
    from ai_fabric_etl_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = multimodal.attach_binary_payload(docs)
    feats = multimodal.extract_features(media, dim=16).cache()
    rows = feats.collect()
    assert all(len(r.features) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.features)
    # deterministic: same payload -> same vector
    again = {r.media_id: r.features for r in multimodal.extract_features(media, dim=16).collect()}
    assert all(again[r.media_id] == r.features for r in rows)

    out = similarity.brute_force_topk(
        feats, feats.limit(2), k=3, id_col="media_id", vec_col="features"
    )
    assert out.count() == 6


def test_multimodal_resize_composes(spark, sf_dir):
    from ai_fabric_etl_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = multimodal.attach_binary_payload(docs)
    resized = multimodal.resize_media(media, width=32, height=8)
    rows = resized.collect()
    assert all(r.n_bytes == 32 * 8 and len(bytes(r.payload)) == 256 for r in rows)
    # schema preserved: a second pass composes
    decoded = multimodal.decode_media(resized)
    assert decoded.count() == 10


def test_neardup_components_and_drop(spark):
    """Connected components: chain {1-2,2-3}, pair {10-11}, isolated 99."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (10, 11, 0.95)],
        "doc_a long, doc_b long, jaccard double",
    )
    comp = {r.doc_id: r.component for r in dedup.neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedup.drop_near_duplicates(docs, pairs).collect())
    assert kept == [1, 10, 99]


def test_neardup_components_long_chain(spark):
    """Both algorithms converge on a short path graph."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(n)], "doc_a long, doc_b long, jaccard double"
    )
    for algo in ("star", "propagation"):
        comp = dedup.neardup_components(pairs, algorithm=algo).collect()
        assert {r.component for r in comp} == {0}, algo
        assert len(comp) == n + 1, algo


def test_components_star_chain_beyond_propagation_budget(spark):
    """A path graph longer than the propagation round budget: star
    converges in O(log n) rounds where propagation (O(diameter))
    must raise instead of returning silently wrong labels."""
    import pytest as _pytest

    n = 60  # diameter 60 >> default 25-round budget
    pairs = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(n)], "doc_a long, doc_b long, jaccard double"
    )
    comp = dedup.neardup_components(pairs, algorithm="star").collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == n + 1
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_components(pairs, algorithm="propagation")


def test_components_star_matches_unionfind_property(spark):
    """Star CC against a driver-side union-find ground truth on
    adversarial random graphs (mixed chains, cliques, bridges)."""
    import random as _random

    def ground_truth(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # fully compress, then label by component min
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        return {n: min(m) for m in comp.values() for n in m}

    rng = _random.Random(4242)
    for trial in range(3):
        n = 120
        edges = set()
        # chains
        start = rng.randrange(n)
        for _ in range(rng.randint(10, 40)):
            nxt = rng.randrange(n)
            if start != nxt:
                edges.add((min(start, nxt), max(start, nxt)))
            start = nxt
        # random extra edges
        for _ in range(rng.randint(5, 30)):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        nodes = sorted({x for e in edges for x in e})
        want = ground_truth(edges, nodes)
        pairs = spark.createDataFrame(
            [(a, b, 1.0) for a, b in sorted(edges)],
            "doc_a long, doc_b long, jaccard double",
        )
        got = {
            r.doc_id: r.component
            for r in dedup.neardup_components(pairs, algorithm="star").collect()
        }
        assert got == want, f"trial {trial}"


def test_components_star_matches_propagation_random(spark):
    """On random clustered graphs (propagation's home turf) the two
    algorithms agree label-for-label."""
    import random as _random

    rng = _random.Random(11)
    edges = set()
    for cluster in range(8):
        base = cluster * 50
        members = [base + k for k in range(rng.randint(2, 12))]
        for m in members[1:]:
            edges.add((members[0], m))
        for _ in range(4):
            a, b = rng.sample(members, 2)
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in sorted(edges)],
        "doc_a long, doc_b long, jaccard double",
    )
    star = {
        r.doc_id: r.component
        for r in dedup.neardup_components(pairs, algorithm="star").collect()
    }
    prop = {
        r.doc_id: r.component
        for r in dedup.neardup_components(pairs, algorithm="propagation").collect()
    }
    assert star == prop


def test_ngram_jaccard_exact_under_boilerplate(spark):
    """Skewed corpus: every doc shares one boilerplate sentence (a hot
    shingle). freq-ordered prefixes must keep the result exact and
    identical to the hash-ordered path."""
    boiler = "this document is confidential and proprietary do not distribute"
    rng_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    for i in range(60):
        w = [rng_words[(i * 7 + j) % len(rng_words)] for j in range(12)]
        rows.append((i, boiler + " " + " ".join(w)))
    # plus 3 true near-dups of doc 0
    base = rows[0][1]
    for i in (100, 101, 102):
        rows.append((i, base + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fo = {(r.doc_a, r.doc_b): round(r.jaccard, 9)
          for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, freq_ordered=True).collect()}
    ho = {(r.doc_a, r.doc_b): round(r.jaccard, 9)
          for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, freq_ordered=False).collect()}
    assert fo == ho and len(fo) > 0
    assert (0, 100) in fo


def test_codecs_bmp_round_trip():
    import numpy as np
    from ai_fabric_etl_spark.operators import codecs

    px = (np.arange(11 * 7 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(7, 11, 3)
    payload = codecs.encode_bmp(px)
    assert codecs.sniff_format(payload) == "bmp"
    w, h, c, back = codecs.decode_bmp(payload)
    assert (w, h, c) == (11, 7, 3)
    assert np.array_equal(back, px)


def test_codecs_pnm_and_wav():
    import numpy as np
    from ai_fabric_etl_spark.operators import codecs

    body = bytes(range(256)) * ((5 * 4 * 3 + 255) // 256)
    ppm = b"P6\n# comment\n5 4\n255\n" + body[: 5 * 4 * 3]
    w, h, c, px = codecs.decode_pnm(ppm)
    assert (w, h, c) == (5, 4, 3) and px.shape == (4, 5, 3)

    frames = (np.sin(np.arange(300) * 0.1) * 2000).astype(np.int16)
    wav = codecs.encode_wav(frames, sample_rate=8000)
    assert codecs.sniff_format(wav) == "wav"
    n_ch, rate, n_frames, back = codecs.decode_wav(wav)
    assert (n_ch, rate, n_frames) == (1, 8000, 300)
    assert np.array_equal(back[:, 0], frames)


def test_codecs_resize_and_features():
    import numpy as np
    from ai_fabric_etl_spark.operators import codecs

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4] = 255
    resized = codecs.resize_nearest(px, 4, 4)
    assert resized.shape == (4, 4, 3)
    assert resized[0, 0, 0] == 255 and resized[3, 3, 0] == 0
    f = codecs.pixel_features(px, bins=16)
    assert len(f) == 16 and abs(float(f.sum()) - 1.0) < 1e-6


def test_multimodal_real_decode_mixed_corpus(spark, docs):
    """synthesize_media -> decode_media(fake=False): every payload is
    REAL media; decoded dims match the generation rule exactly."""
    from ai_fabric_etl_spark.operators import multimodal

    media = multimodal.synthesize_media(docs.limit(30))
    rows = multimodal.decode_media(media, fake=False).collect()
    assert len(rows) == 30
    for r in rows:
        i = r.media_id
        if i % 3 == 0:
            assert (r.fmt, r.width, r.height, r.channels) == ("bmp", 16 + i % 16, 8 + i % 8, 3)
        elif i % 3 == 1:
            assert (r.fmt, r.width, r.height, r.channels) == ("ppm", 12 + i % 10, 6 + i % 6, 3)
        else:
            assert (r.fmt, r.width, r.height, r.channels) == ("wav", 256 + i % 100, 1, 1)


def test_multimodal_real_resize_and_features(spark, docs):
    """Real images really resize (decode->nearest->re-encode BMP) and
    real features are intensity histograms that sum to 1."""
    from ai_fabric_etl_spark.operators import multimodal

    media = multimodal.synthesize_media(
        docs.filter(F.col("doc_id") % 3 != 2).limit(10)  # images only
    )
    resized = multimodal.resize_media(media, width=20, height=10, fake=False)
    decoded = {r.media_id: r for r in multimodal.decode_media(resized, fake=False).collect()}
    assert decoded and all(
        (r.fmt, r.width, r.height) == ("bmp", 20, 10) for r in decoded.values()
    )

    feats = multimodal.extract_features(media, dim=16, fake=False).collect()
    assert feats and all(
        abs(sum(r.features) - 1.0) < 1e-5 and len(r.features) == 16 for r in feats
    )


def test_codecs_y4m_round_trip():
    import numpy as np
    from ai_fabric_etl_spark.operators import codecs

    frames = [
        ((np.arange(6 * 10) + f) % 256).astype(np.uint8).reshape(6, 10)
        for f in range(4)
    ]
    payload = codecs.encode_y4m(frames)
    assert codecs.sniff_format(payload) == "y4m"
    w, h, n, back = codecs.decode_y4m(payload)
    assert (w, h, n) == (10, 6, 4)
    assert all(np.array_equal(a, b) for a, b in zip(back, frames))


def test_video_frame_sampling_real(spark, docs):
    """Y4M containers report their TRUE frame count (parsed, not
    byte-estimated): sampled indices match the generation rule."""
    from ai_fabric_etl_spark.operators import multimodal

    media = multimodal.synthesize_video(docs, max_docs=20)
    got = {}
    for r in multimodal.frame_sample_plan(media, every_n=2).collect():
        got.setdefault(r.media_id, []).append(r.frame_index)
    assert got
    for media_id, idxs in got.items():
        n_frames = 3 + media_id % 5
        assert sorted(idxs) == list(range(0, n_frames, 2))


def test_text_clean_and_redact(spark):
    from ai_fabric_etl_spark.operators.text import clean_text, redact_pii

    df = spark.createDataFrame(
        [(1, "Hi\x07  bob@x.io \n see http://a.b/c?q=1 or 10.0.0.1  ")],
        "id long, text string",
    )
    out = df.select(clean_text(redact_pii(F.col("text"))).alias("t")).collect()[0].t
    assert out == "Hi <EMAIL> see <URL> or <IP>"


def test_minhash_null_text_propagates(spark):
    from ai_fabric_etl_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [(1, "hello world foo"), (2, None), (3, "hello world foo")],
        "doc_id long, text string").repartition(2)
    rows = {r.doc_id: r.sig for r in minhash_signature(df).collect()}
    assert rows[2] is None and rows[1] is not None and len(rows[1]) == 32
    assert rows[1] == rows[3]  # deterministic across rows/partitions


def test_decode_falls_back_on_magic_byte_collision(spark):
    """Arbitrary bytes that merely START like a media format must not
    crash the task: fake=True falls back, fake=False raises cleanly."""
    from ai_fabric_etl_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"P6 is a nice chess move, not a pixmap " * 4)),
         (2, bytearray(b"BM" + b"x" * 60))],
        "media_id long, payload binary",
    ).select("media_id", "payload",
             F.lit("application/octet-stream").alias("mime_type"),
             F.length("payload").cast("long").alias("n_bytes"),
             F.lit("t").alias("source"))
    rows = multimodal.decode_media(df, fake=True).collect()
    assert len(rows) == 2 and all(r.fmt == "fake" for r in rows)
    import pytest as _pytest
    with _pytest.raises(Exception, match="corrupt"):
        multimodal.decode_media(df, fake=False).collect()


def test_resize_passes_through_audio_video(spark, docs):
    """resize on recognized non-image media is a no-op pass-through,
    never digest noise with a lying mime type."""
    from ai_fabric_etl_spark.operators import multimodal

    wavs = multimodal.synthesize_media(
        docs.filter(F.col("doc_id") % 3 == 2).limit(5)
    )
    before = {r.media_id: bytes(r.payload) for r in wavs.collect()}
    after = {r.media_id: (bytes(r.payload), r.mime_type)
             for r in multimodal.resize_media(wavs, 10, 10, fake=False).collect()}
    assert set(after) == set(before)
    assert all(after[k][0] == before[k] and after[k][1] == "audio/wav"
               for k in before)


def test_phone_redaction_covers_plus_prefix(spark):
    from ai_fabric_etl_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "call +1 (555) 123-4567 now")], "id long, t string")
    out = df.select(redact_pii(F.col("t")).alias("t")).collect()[0].t
    assert out == "call <PHONE> now"


def test_edit_distance_pairs_exact_vs_bruteforce(spark):
    from ai_fabric_etl_spark.operators.dedup import edit_distance_pairs

    names = [
        (1, "shimmer blue"),
        (2, "shimer blue"),     # deletion, d=1
        (3, "shimmer blux"),    # substitution, d=1
        (4, "shimmerx blue"),   # insertion, d=1
        (5, "shmer blux"),      # d=2+ from most
        (6, "totally different"),
        (7, "shimmer blue"),    # exact dup, d=0
    ]
    df = spark.createDataFrame(names, "doc_id long, text string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    for d in (1, 2):
        want = sorted(
            (ia, ib, lev(ta, tb))
            for ia, ta in names
            for ib, tb in names
            if ia < ib and lev(ta, tb) <= d
        )
        got = sorted(
            map(tuple, edit_distance_pairs(df, max_dist=d).collect())
        )
        assert got == want, f"d={d}"


def test_quantize_int8_bounds_and_roundtrip(spark):
    from ai_fabric_etl_spark.operators.similarity import (
        normalize_l2,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [3.0, 4.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["qvec"] == [64, -127, 32]  # scale 1/127
    assert out[2]["qvec"] == [0, 0, 0] and out[2]["qvec_scale"] == 0.0
    assert all(-127 <= v <= 127 for r in out.values() for v in r["qvec"])
    # dequantized error bounded by scale/2 per component
    for r in out.values():
        s = r["qvec_scale"]
        orig = {1: [0.5, -1.0, 0.25], 2: [0, 0, 0], 3: [3.0, 4.0, 0.0]}[r["vec_id"]]
        for q, x in zip(r["qvec"], orig):
            assert abs(q * s - x) <= s / 2 + 1e-9

    norm = {r["vec_id"]: r["embedding"] for r in normalize_l2(df).collect()}
    assert abs(sum(v * v for v in norm[3]) - 1.0) < 1e-6
    assert norm[2] == [0.0, 0.0, 0.0]  # zero vector unchanged


def test_ivf_insert_parity_with_batch_assignment(spark, tmp_path, sf_dir):
    """Incremental inserts against frozen centroids must land exactly
    where a batch assignment with the same centroid table would put
    them, and the grown index must serve queries identically to the
    in-memory probe over the same cells."""
    import pyspark.sql.functions as F

    from ai_fabric_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    similarity.ivf_write_index(emb.filter(F.col("vec_id") % 2 == 0), idx,
                               n_centroids=8)
    before = spark.read.parquet(f"{idx}/cells").count()
    similarity.ivf_insert(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.count() == emb.count()
    assert before < cells.count()
    # no duplicate ids, no dropped ids
    assert cells.select("neighbor_id").distinct().count() == emb.count()
    # stats see every cell's growth
    stats = similarity.ivf_cell_stats(spark, idx)
    assert stats.agg(F.sum("n_vectors")).collect()[0][0] == emb.count()
    # queries over the grown index == direct probe over the same cells
    q = emb.filter(F.col("vec_id") < 4)
    centroids = spark.read.parquet(f"{idx}/centroids")
    direct = similarity._ivf_probe_and_score(
        cells, centroids, q, 5, 4, "vec_id", "embedding"
    )
    indexed = similarity.ivf_topk_indexed(spark, idx, q, k=5)
    assert sorted(map(tuple, indexed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_semdedup_invariants(emb):
    """SemDeDup (similarity.semdedup_prune): the greedy per-cell scan
    must satisfy, for EVERY row, the defining invariants — dropped
    rows exceed the threshold against a kept cell-mate, kept rows
    don't, and dup_of always names a kept member of the same cell."""
    thr = 0.8
    out = similarity.semdedup_prune(
        emb.select("vec_id", "embedding"), k=4, threshold=thr
    ).cache()
    rows = out.collect()
    assert len(rows) == emb.count()
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        if r.kept:
            assert r.dup_of is None
            assert r.max_kept_sim is None or r.max_kept_sim <= thr, r
        else:
            assert r.dup_of is not None and r.max_kept_sim > thr, r
            keeper = by_id[r.dup_of]
            assert keeper.kept and keeper.cluster_id == r.cluster_id, r
    # exact cosine check: each dropped row's recorded max_kept_sim is
    # a real cosine to its keeper... >= means argmax picked the best
    pairs = (
        out.filter(~F.col("kept"))
        .select("vec_id", "dup_of")
        .join(emb.select(F.col("vec_id"), F.col("embedding").alias("va")), "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("dup_of"),
                F.col("embedding").alias("vb"),
            ),
            "dup_of",
        )
        .select(
            similarity.cosine(F.col("va"), F.col("vb")).alias("cos")
        )
        .collect()
    )
    for p in pairs:
        assert p.cos > thr - 1e-9
    out.unpersist()


def test_semdedup_planted_copies_always_drop(spark, emb):
    """Planted exact copies must drop with dup_of = original (the
    structural guarantee the emb_semdedup_planted oracle rides)."""
    base = emb.select("vec_id", "embedding")
    copies = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 30000).alias("vec_id"), "embedding"
    )
    out = similarity.semdedup_prune(
        base.unionByName(copies), k=4, threshold=0.99
    )
    dropped = {
        r.vec_id: r.dup_of
        for r in out.filter(F.col("vec_id") >= 30000).collect()
    }
    assert dropped == {i + 30000: i for i in range(20)}


def test_semdedup_cell_cap_raises(emb):
    with pytest.raises(Exception, match="max_cell_rows"):
        similarity.semdedup_prune(
            emb.select("vec_id", "embedding"), k=2, max_cell_rows=3
        ).count()


def test_pca_matches_single_node_numpy(spark, sf_dir):
    """Distributed moment-partial PCA must match numpy PCA computed on
    the collected data: same eigenvalues, same subspace (components
    equal after the shared sign convention), same projections."""
    import numpy as np

    from ai_fabric_etl_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb.repartition(7), "embedding", k=6)
    X = np.stack(
        [np.array(r["embedding"], dtype=np.float64)
         for r in emb.select("embedding").collect()]
    )
    mu = X.mean(0)
    cov = (X - mu).T @ (X - mu) / len(X)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:6]
    assert np.allclose(model["mean"], mu, atol=1e-9)
    assert np.allclose(model["explained_var"], w[order], rtol=1e-8)
    for j, i in enumerate(order):
        c = v[:, i]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        assert np.allclose(model["components"][j], c, atol=1e-7), j
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_project(emb, model, "embedding").select(
            "vec_id", "pca"
        ).collect()
    }
    W = np.array(model["components"])
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = (X - mu) @ W.T
    for row, i in zip(want, ids):
        assert np.allclose(got[i], row, atol=1e-9)


def test_pca_partition_invariance(spark, sf_dir):
    """The fit must not depend on partitioning beyond float round-off:
    1 partition vs 13 partitions agree to 1e-8."""
    import numpy as np

    from ai_fabric_etl_spark.operators.similarity import pca_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m1 = pca_fit(emb.coalesce(1), "embedding", k=4)
    m13 = pca_fit(emb.repartition(13), "embedding", k=4)
    assert np.allclose(m1["explained_var"], m13["explained_var"], rtol=1e-8)
    assert np.allclose(m1["components"], m13["components"], atol=1e-7)


def test_jl_projection_preserves_distances(spark, sf_dir):
    """JL sign projection 64->16: each coordinate is p_j = Σ_i x_i·s_ij
    with independent ±1 signs, so E[p_j²] = ||x||² and the unscaled
    projection satisfies E||p||² = k·||x||². The empirical ratio of
    pairwise squared distances (projected / k) over original must
    concentrate near 1 — the JL property that makes the projection
    usable for ANN pre-filtering."""
    import numpy as np

    from ai_fabric_etl_spark.operators.similarity import random_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    X = np.stack(
        [np.array(r["embedding"], dtype=np.float64)
         for r in emb.select("embedding").collect()]
    )
    proj = random_project(emb, "embedding", k=16, dim=64, keep=["vec_id"])
    pdf = proj.toPandas().sort_values("vec_id")
    P = pdf[[f"p{j}" for j in range(16)]].to_numpy(dtype=np.float64)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    X = X[np.argsort(ids)]
    ratios = []
    for a in range(0, 60, 7):
        for b in range(a + 1, 60, 11):
            d0 = ((X[a] - X[b]) ** 2).sum()
            dp = ((P[a] - P[b]) ** 2).sum() / 16.0
            if d0 > 1e-12:
                ratios.append(dp / d0)
    ratios = np.array(ratios)
    # k=16 is coarse: individual ratios within a generous band, the
    # mean tight around 1 (unbiasedness)
    assert 0.3 < ratios.min() and ratios.max() < 3.0, (ratios.min(), ratios.max())
    assert abs(ratios.mean() - 1.0) < 0.2, ratios.mean()


def test_jl_projection_arrow_sql_bit_parity(spark, sf_dir):
    """The Arrow-batched engine path of random_project must be
    BIT-IDENTICAL to the dim·k-node SQL expression form (the oracle
    twin): both add input dimensions in the same left-associated IEEE
    order, so round-to-6dp decimals match exactly (VERDICT r7 item 2 —
    the engine path must not pay the dim·k codegen plan)."""
    from ai_fabric_etl_spark.operators.similarity import random_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = random_project(emb, "embedding", k=16, dim=64, keep=["vec_id"],
                       method="arrow")
    s = random_project(emb, "embedding", k=16, dim=64, keep=["vec_id"],
                       method="sql")
    assert a.exceptAll(s).count() == 0
    assert s.exceptAll(a).count() == 0


def test_jl_projection_arrow_plan_is_small(spark, sf_dir):
    """The arrow path's plan must not carry the dim·k expression tree
    (the sql path's plan string is ~100x larger)."""
    from ai_fabric_etl_spark.operators.similarity import random_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = random_project(emb, "embedding", k=16, dim=64, method="arrow")
    s = random_project(emb, "embedding", k=16, dim=64, method="sql")
    pa = a._jdf.queryExecution().optimizedPlan().toString()
    ps = s._jdf.queryExecution().optimizedPlan().toString()
    assert len(pa) < len(ps) / 10, (len(pa), len(ps))


def test_neardup_planes_scale_with_corpus():
    """Auto plane derivation keeps expected occupancy constant:
    doubling n adds exactly one plane (so candidate pairs stay linear
    in n), clamped to [4, 24]."""
    from ai_fabric_etl_spark.operators.similarity import neardup_planes_for

    assert neardup_planes_for(10) == 4           # tiny corpus -> floor
    assert neardup_planes_for(2_000) == 6
    assert neardup_planes_for(4_000) == 7        # 2x rows -> +1 plane
    assert neardup_planes_for(40_000) == 11
    assert neardup_planes_for(10**12) == 24      # ceiling
    assert neardup_planes_for(0) == 4


def test_lsh_neardup_resplits_skewed_bucket(spark):
    """A clump of near-identical (but distinct) vectors larger than
    max_bucket must be RE-SPLIT with extra planes, not silently
    dropped: the planted exact-duplicate pair inside the clump is
    still found, and stats_out records rows landing past level 0
    (VERDICT r7 item 1 — the silent recall loss)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    rows = []
    # 120 vectors in a cone around `base` (spread 0.03): they agree on
    # most base-level hyperplane signs, so they overload base buckets,
    # but deeper refinement planes split them below max_bucket
    for i in range(120):
        v = base + 0.03 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    rows.append((1000, rows[0][1]))  # exact duplicate of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats: dict = {}
    pairs = similarity.lsh_cosine_neardup_pairs(
        emb, threshold=0.999999, n_planes=4, n_tables=2, max_bucket=40,
        extra_planes=4, max_resplit_rounds=3, stats_out=stats,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1000) in found, found
    assert stats["oversized_rows"] == 0
    deep = sum(n for lvl, n in stats["rows_per_level"].items() if lvl > 0)
    assert deep > 0, stats  # the clump actually went past level 0


def test_lsh_neardup_oversize_raise_and_drop(spark):
    """>max_bucket byte-identical vectors cannot be separated by any
    hyperplane: on_oversize='raise' (default) surfaces it at execution
    time; on_oversize='drop' removes them and reports the count."""
    import numpy as np

    rng = np.random.default_rng(3)
    v = [float(x) for x in rng.normal(size=64)]
    rows = [(i, v) for i in range(50)]  # 50 identical vectors
    rows += [(100 + i, [float(x) for x in rng.normal(size=64)])
             for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="re-split|assert"):
        similarity.lsh_cosine_neardup_pairs(
            emb, n_planes=4, n_tables=2, max_bucket=10,
            max_resplit_rounds=2,
        ).collect()
    stats: dict = {}
    out = similarity.lsh_cosine_neardup_pairs(
        emb, n_planes=4, n_tables=2, max_bucket=10,
        max_resplit_rounds=2, on_oversize="drop", stats_out=stats,
    ).collect()
    assert stats["oversized_rows"] == 2 * 50  # n_tables x clump size
    ids = {i for r in out for i in (r["id_a"], r["id_b"])}
    assert not (ids & set(range(50)))  # clump excluded, no crash


def test_emb_neardup_index_insert_parity(spark, emb, tmp_path):
    """Index built whole vs built-then-inserted must answer a query
    batch IDENTICALLY: emb_neardup_index_insert derives keys with the
    index's frozen parameters and folds occupancy deltas, so history
    is never re-tagged and the candidate structure is unchanged."""
    half_a = emb.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", "embedding"
    )
    half_b = emb.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    full = emb.select("vec_id", "embedding")
    n = full.count()

    whole = str(tmp_path / "idx_whole")
    grown = str(tmp_path / "idx_grown")
    similarity.emb_neardup_index_write(
        full, whole, expected_final_count=n
    )
    similarity.emb_neardup_index_write(
        half_a, grown, expected_final_count=n
    )
    similarity.emb_neardup_index_insert(half_b, grown)

    batch = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    a = similarity.emb_neardup_incremental(batch, whole, threshold=0.95)
    b = similarity.emb_neardup_incremental(batch, grown, threshold=0.95)
    ra = {(r["id_a"], r["id_b"]) for r in a.collect()}
    rb = {(r["id_a"], r["id_b"]) for r in b.collect()}
    assert ra == rb
    # the planted copies are all found (recall structurally 1.0)
    assert {(i, i + 50000) for i in range(30)} <= ra


def test_ngram_jaccard_exact_boundary_pair(spark):
    """A pair at EXACTLY the threshold survives the r10 PPJoin
    positional filter + df>=2 prefix floor (epsilon slack keeps the
    float bound over-inclusive; verification stays exact). |A|=8
    shingles, |B|=4, overlap=4 -> J = 4/8 = 0.5 on the nose, and the
    length filter is at its own boundary (t*|A| == |B|)."""
    a = " ".join(f"w{i}" for i in range(10))     # 8 distinct shingles
    b = " ".join(f"w{i}" for i in range(4, 10))  # 4 shingles, all shared
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    for fo in (True, False):
        got = {(r.doc_a, r.doc_b, r.jaccard)
               for r in dedup.ngram_jaccard_pairs(
                   docs, threshold=0.5, freq_ordered=fo).collect()}
        assert got == {(1, 2, 0.5)}, f"freq_ordered={fo}"


def test_keep_best_per_cluster_argmax_and_ties(spark):
    """Canonical member = max quality, ties -> min id; transitive
    clusters resolve through components; singletons keep themselves."""
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (7, 2.0)],
        "doc_id long, q double",
    )
    # {1,2,3} is one transitive cluster (1-2, 2-3); {4} pairs with
    # nothing listed... pair 4 with 1 via 1-4 to make a 4-cluster;
    # 7 is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: (r.cluster_rep, r.kept, r.canonical_id)
           for r in dedup.keep_best_per_cluster(
               docs, pairs, quality_col="q").collect()}
    # cluster {1,2,3,4}: max q = 9.0 shared by 2 and 3 -> min id 2
    assert got[1] == (1, False, 2)
    assert got[2] == (1, True, 2)
    assert got[3] == (1, False, 2)
    assert got[4] == (1, False, 2)
    assert got[7] == (7, True, 7)


def test_keep_best_string_ids(spark):
    """String ids order naturally through the min(struct(-q, id))
    formulation — no numeric-id assumption."""
    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0), ("z", 2.0)], "doc_id string, q double"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "z")], "doc_a string, doc_b string"
    )
    got = {r.doc_id: (r.kept, r.canonical_id)
           for r in dedup.keep_best_per_cluster(
               docs, pairs, quality_col="q").collect()}
    assert got == {"a": (False, "b"), "b": (True, "b"),
                   "z": (False, "b")}


def test_minhash_incremental_string_ids(spark, docs, tmp_path):
    """VERDICT r13 item 4: the bucketed sig store must serve string
    ids — r14 stores bucket on an md5 hash of the id's string form,
    so a pruned verify reads exactly the candidates' partitions for
    ANY id type (the r13 'pmod' layout NULLed non-numeric ids into a
    partition no pruned read touched: silently missed duplicates)."""
    corpus = docs.filter(F.col("doc_id") < 200).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "idx")
    dedup.minhash_index_write(corpus, idx)
    n, fn = dedup.sig_store_layout(idx)
    assert (n, fn) == (64, "hash")
    # no signature may land outside an integer sb partition
    import os
    sb_dirs = [
        d for d in os.listdir(os.path.join(idx, "sigs"))
        if d.startswith("sb=")
    ]
    assert sb_dirs and all(
        d.split("=", 1)[1].isdigit() for d in sb_dirs
    ), sb_dirs

    copies = corpus.filter(F.col("doc_id").isin(["doc-0", "doc-1", "doc-2"])).select(
        F.concat(F.col("doc_id"), F.lit("-copy")).alias("doc_id"), "text"
    )
    novel = docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 210)
    ).select(F.concat(F.lit("new-"), F.col("doc_id")).alias("doc_id"), "text")
    batch = copies.unionByName(novel)
    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_incremental(
            batch, idx, threshold=0.5
        ).collect()
    }
    for i in range(3):
        assert inc.get((f"doc-{i}", f"doc-{i}-copy")) == pytest.approx(1.0)


def test_minhash_legacy_pmod_store_rejects_string_ids(spark, docs, tmp_path):
    """A legacy r13 store (meta without sig_bucket_fn -> 'pmod')
    raises loudly on a non-numeric id instead of silently pruning to
    nothing — at append AND at incremental-verify time."""
    import json
    import os

    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    dedup.minhash_index_write(corpus, idx)
    # rebuild the store as an r13 writer would have left it: meta
    # without sig_bucket_fn AND data pmod-bucketed
    sigs = spark.read.parquet(os.path.join(idx, "sigs")).select(
        "doc_id", "hs"
    ).collect()
    import shutil

    shutil.rmtree(os.path.join(idx, "sigs"))
    spark.createDataFrame(
        sigs, "doc_id long, hs array<bigint>"
    ).select(
        "doc_id", "hs",
        F.pmod(F.col("doc_id"), F.lit(64)).cast("int").alias("sb"),
    ).write.partitionBy("sb").parquet(os.path.join(idx, "sigs"))
    meta = os.path.join(idx, "_minhash_index_meta.json")
    with open(meta, "w", encoding="utf-8") as fh:
        json.dump({"sig_buckets": 64}, fh)
    assert dedup.sig_store_layout(idx) == (64, "pmod")

    str_batch = docs.filter(F.col("doc_id") < 5).select(
        F.concat(F.lit("s-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    with pytest.raises(TypeError, match="pmod"):
        dedup.minhash_dedup_incremental(str_batch, idx, threshold=0.5)
    with pytest.raises(TypeError, match="pmod"):
        dedup.sig_store_append(
            str_batch.select(
                "doc_id", dedup.hashed_shingles(F.col("text"), 3).alias("hs")
            ),
            idx,
        )
    # numeric ids still work against the legacy layout (same pmod
    # buckets the r13 writer used), so in-place stores keep serving
    num_batch = corpus.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_incremental(
            num_batch, idx, threshold=0.5
        ).collect()
    }
    for i in range(3):
        assert got.get((i, i + 9000)) == pytest.approx(1.0)


def test_minhash_incremental_survives_index_rebuild(spark, docs, tmp_path):
    """Rebuilding an index at the SAME path must not corrupt a prior
    call's returned frame or the next call's plan (the r14 sweep
    failure: the previous incremental result was returned as a
    CacheManager entry whose lineage read {idx}/bands+sigs; the next
    minhash_index_write's overwrite triggered recacheByPath, whose
    re-planned cached plan left the signature pandas UDF unextracted,
    and the follow-up incremental screen died with 'Cannot generate
    code for expression: sigs(...)'). The result is localCheckpointed
    now — no catalog entry, no path lineage — so both the old frame
    and the rebuilt-index screen must stay readable and identical."""
    corpus = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    dedup.minhash_index_write(corpus, idx)
    batch = corpus.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    out1 = dedup.minhash_dedup_incremental(batch, idx, threshold=0.5)
    rows1 = sorted((r["doc_a"], r["doc_b"]) for r in out1.collect())
    assert rows1  # planted copies must match

    # same-path rebuild (what fp composites + standalone entries do)
    dedup.minhash_index_write(corpus, idx)
    out2 = dedup.minhash_dedup_incremental(batch, idx, threshold=0.5)
    assert sorted((r["doc_a"], r["doc_b"]) for r in out2.collect()) == rows1
    # the first result frame is still readable after the rebuild
    assert sorted((r["doc_a"], r["doc_b"]) for r in out1.collect()) == rows1
