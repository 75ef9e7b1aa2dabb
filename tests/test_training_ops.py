"""Temporal joins + deterministic sampling/packing operators.

Each operator is checked against an independent reference: a naive
inequality join for the temporal ops, statistical/stability invariants
for hash sampling, and a pure-Python packer for greedy packing. The
driver's DuckDB oracle covers the end-to-end value parity.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.sampling import (
    hash_split,
    pack_greedy_firstfit,
    pack_token_bins,
    stratified_hash_sample,
)
from ai_fabric_etl_spark.operators.temporal import asof_join, range_join

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_asof_backward_basic(spark):
    left = _events(spark, [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5))])
    right = spark.createDataFrame(
        [(1, _ts(8), "a"), (1, _ts(10), "b"), (1, _ts(25), "c"), (3, _ts(1), "x")],
        "user_id long, ts timestamp, tag string",
    )
    got = {
        r.event_id: (r.matched_ts, r.tag)
        for r in asof_join(left, right, by=["user_id"], right_cols=["tag"]).collect()
    }
    # inclusive: the ts(10) right row matches the ts(10) left row
    assert got[1] == (_ts(10), "b")
    assert got[2] == (_ts(25), "c")
    assert got[3] == (None, None)  # user 2 has no right rows at all


def test_asof_forward_and_tolerance(spark):
    left = _events(spark, [(1, 1, _ts(10)), (2, 1, _ts(50))])
    right = spark.createDataFrame(
        [(1, _ts(12), "n"), (1, _ts(120), "far")],
        "user_id long, ts timestamp, tag string",
    )
    fwd = {
        r.event_id: r.tag
        for r in asof_join(
            left, right, by=["user_id"], right_cols=["tag"], direction="forward"
        ).collect()
    }
    assert fwd == {1: "n", 2: "far"}
    tol = {
        r.event_id: r.tag
        for r in asof_join(
            left,
            right,
            by=["user_id"],
            right_cols=["tag"],
            direction="forward",
            tolerance_seconds=600,
        ).collect()
    }
    assert tol == {1: "n", 2: None}  # ts(120) is 70min past ts(50)


def test_asof_nearest_matches_pandas(spark):
    """direction='nearest' against pandas merge_asof itself on random
    keyed data — same matches, ties resolved to the backward side."""
    import random as _random

    import pandas as pd

    rng = _random.Random(99)
    left_rows = [
        (i, rng.randint(1, 4), _ts(rng.randint(0, 300))) for i in range(60)
    ]
    right_rows = [
        (rng.randint(1, 4), _ts(rng.randint(0, 300)), f"t{j}") for j in range(40)
    ]
    left = _events(spark, left_rows)
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp, tag string"
    )
    got = {
        r.event_id: r.matched_ts
        for r in asof_join(
            left, right, by=["user_id"], right_cols=[], direction="nearest"
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"]).sort_values(
        "ts", kind="mergesort"
    )
    rp = (
        pd.DataFrame(right_rows, columns=["user_id", "ts", "tag"])
        .drop(columns=["tag"])
        .sort_values("ts", kind="mergesort")
    )
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="nearest", suffixes=("", "_r")
    )
    # pandas reports the left ts; recover the matched right ts by
    # recomputing per row (nearest right ts, ties backward)
    by_user: dict[int, list] = {}
    for _, r in rp.iterrows():
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    want = {}
    for _, r in lp.iterrows():
        cands = by_user.get(r["user_id"], [])
        if not cands:
            want[r["event_id"]] = None
            continue
        best = min(
            cands,
            key=lambda c: (abs((c - r["ts"]).total_seconds()), c > r["ts"]),
        )
        want[r["event_id"]] = best.to_pydatetime()
    assert got == want
    # sanity: every pandas-matched row is matched here too
    assert want_df["ts"].notna().all()


def test_asof_nearest_tolerance_and_ties(spark):
    left = _events(spark, [(1, 1, _ts(10)), (2, 1, _ts(100))])
    right = spark.createDataFrame(
        [(1, _ts(7), "b3"), (1, _ts(13), "f3"), (1, _ts(220), "far")],
        "user_id long, ts timestamp, tag string",
    )
    got = {
        r.event_id: r.tag
        for r in asof_join(
            left, right, by=["user_id"], right_cols=["tag"], direction="nearest"
        ).collect()
    }
    assert got[1] == "b3"  # 3min either way -> tie goes backward
    assert got[2] == "f3"  # backward f3 (gap 87min) beats forward far (120min)
    tol = {
        r.event_id: r.tag
        for r in asof_join(
            left, right, by=["user_id"], right_cols=["tag"],
            direction="nearest", tolerance_seconds=600,
        ).collect()
    }
    assert tol == {1: "b3", 2: None}  # f3 is 87min away, beyond 10min


def test_asof_mixed_ntz_ltz_sides_consistent(spark):
    """A TIMESTAMP_NTZ left against a TIMESTAMP right must produce the
    same matches as same-typed inputs, even on a DST session zone —
    both sides are normalized to one time axis before the union, so
    gap/tolerance math never mixes naive and instant epochs."""
    from ai_fabric_etl_spark.operators.timeutil import instant_to_ntz

    # zone-independent constructors (epoch micros), so the DataFrames
    # mean the same instants regardless of when casts are evaluated
    def us(h, m):  # 2024-03-10 h:m UTC
        base = 1_710_028_800_000_000  # 2024-03-10 00:00:00 UTC
        return base + (h * 3600 + m * 60) * 1_000_000

    left = spark.createDataFrame(
        [(1, 1, us(6, 30)), (2, 1, us(9, 0))],
        "event_id long, user_id long, ts_us long",
    ).select(
        "event_id",
        "user_id",
        instant_to_ntz(F.timestamp_micros("ts_us")).alias("ts"),
    )
    right = spark.createDataFrame(
        [(1, us(6, 0), "a"), (1, us(8, 55), "b")],
        "user_id long, ts_us long, tag string",
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "tag")
    assert dict(left.dtypes)["ts"] == "timestamp_ntz"
    assert dict(right.dtypes)["ts"] == "timestamp"

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = {
            r.event_id: r.tag
            for r in asof_join(
                left, right, by=["user_id"], right_cols=["tag"],
                direction="nearest", tolerance_seconds=3600,
            ).collect()
        }
        # one shared axis: 06:30 is 30min after 06:00 ('a', kept by
        # tolerance); 09:00 is 5min after 08:55 ('b')
        assert got == {1: "a", 2: "b"}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_asof_matches_naive_on_events(spark, sf_dir):
    """asof_join == the naive per-pair max-prior-ts join on real data."""
    from ai_fabric_etl_spark.queries.catalog import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    got = asof_join(purchases, clicks, by=["user_id"], right_cols=[]).select(
        "event_id", "matched_ts"
    )
    naive = (
        purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts")),
            "left",
        )
        .groupBy("p.event_id")
        .agg(F.max("c.ts").alias("matched_ts"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_matches_naive(spark, sf_dir):
    """Bucketed range join == naive inequality join, inner and left."""
    from ai_fabric_etl_spark.queries.catalog import load_events

    ev = load_events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    right = ev.select(
        "user_id", F.col("event_id").alias("r_event_id"), F.col("ts").alias("r_ts")
    )
    got = range_join(
        left, right, by=["user_id"], left_ts="ts", right_ts="r_ts",
        before_seconds=300, after_seconds=300,
    ).select("event_id", "r_event_id")
    naive = (
        left.join(right, "user_id")
        .filter(
            (F.col("r_ts") >= F.col("ts") - F.expr("INTERVAL 300 SECONDS"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 300 SECONDS"))
        )
        .select("event_id", "r_event_id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # left join keeps every left row at least once
    left_out = range_join(
        left, right, by=["user_id"], left_ts="ts", right_ts="r_ts",
        before_seconds=300, after_seconds=300, how="left",
    )
    assert left_out.select("event_id").distinct().count() == left.count()


def test_hash_split_deterministic_and_stable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = hash_split(docs, key="doc_id")
    by_split = dict(
        (r.split, r.n) for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    n = docs.count()
    assert set(by_split) <= {"train", "val", "test"}
    assert sum(by_split.values()) == n
    assert by_split["train"] > by_split.get("val", 0)
    # growth stability: splitting a subset assigns identical fates
    sub = hash_split(docs.filter(F.col("doc_id") % 2 == 0), key="doc_id")
    full = {r.doc_id: r.split for r in s1.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert full[r.doc_id] == r.split


def test_stratified_sample_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_hash_sample(
        docs, strata_col="lang", fractions={"en": 0.5, "de": 1.0}, key="doc_id",
        default_fraction=0.0,
    )
    kept = dict(
        (r.lang, r.n) for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    totals = dict(
        (r.lang, r.n) for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert set(kept) <= {"en", "de"}  # default 0 drops other strata
    # de keeps everything except the (measure-zero) all-f bucket
    assert kept.get("de", 0) >= totals["de"] - 1
    # en keeps roughly half (binomial tolerance)
    assert abs(kept.get("en", 0) / totals["en"] - 0.5) < 0.2


def test_pack_token_bins_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    out = pack_token_bins(
        docs, tokens_col="n_tokens", budget=500, by=["lang"], order_col="doc_id"
    )
    rows = sorted(out.collect(), key=lambda r: (r.lang, r.doc_id))
    # exact recompute of the definition: bin = floor(cum_before/budget)
    cum: dict[str, int] = {}
    for r in rows:
        before = cum.get(r.lang, 0)
        assert r.bin_id == before // 500, (r.lang, r.doc_id, before, r.bin_id)
        cum[r.lang] = before + int(r.n_tokens)
    # bins are contiguous and non-decreasing in doc order per lang
    last: dict[str, int] = {}
    for r in rows:
        assert r.bin_id >= last.get(r.lang, 0)
        last[r.lang] = r.bin_id


def test_pack_greedy_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    budget = 500
    got = pack_greedy_firstfit(
        docs, tokens_col="n_tokens", budget=budget, by=["lang"], order_col="doc_id"
    )
    rows = got.collect()
    # reference: first-fit per lang over doc_id order
    by_lang: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        caps: list[int] = []
        for r in rs:
            t = int(r.n_tokens)
            placed = -1
            for i, cap in enumerate(caps):
                if cap >= t:
                    placed, caps[i] = i, cap - t
                    break
            if placed < 0:
                caps.append(max(budget - t, 0))
                placed = len(caps) - 1
            assert r.bin_id == placed, (lang, r.doc_id)
    # no bin over budget unless it is a single oversize doc
    agg = {}
    for r in rows:
        k = (r.lang, r.bin_id)
        tot, cnt = agg.get(k, (0, 0))
        agg[k] = (tot + r.n_tokens, cnt + 1)
    for (lang, b), (tot, cnt) in agg.items():
        assert tot <= budget or cnt == 1, (lang, b, tot, cnt)


def test_range_join_left_null_column_no_duplicates(spark):
    """ADVICE r1 (low): a left row carrying a null non-key column that
    DOES find range matches must appear only as matched rows — never
    also as a null-padded unmatched row."""
    from ai_fabric_etl_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [("u1", None, "2024-01-01 10:00:00"),
         ("u2", "x", "2024-01-01 10:00:00"),
         ("u3", None, "2024-01-01 10:00:00")],
        "user_id string, note string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u1", "e1", "2024-01-01 09:59:00"),
         ("u2", "e2", "2024-01-01 09:58:00")],
        "user_id string, r_id string, r_ts string",
    ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))

    out = range_join(
        left, right, by=["user_id"], left_ts="ts", right_ts="r_ts",
        before_seconds=600.0, how="left",
    )
    rows = out.collect()
    # u1 (null note, matched) exactly once as a match; u3 unmatched once
    u1 = [r for r in rows if r.user_id == "u1"]
    assert len(u1) == 1 and u1[0].r_id == "e1"
    u3 = [r for r in rows if r.user_id == "u3"]
    assert len(u3) == 1 and u3[0].r_id is None
    assert len(rows) == 3


def test_pack_firstfit_shards_giant_stratum(spark):
    """VERDICT r1 item 7: a stratum larger than max_group_rows is
    split into contiguous order-range shards (parallel tasks, bounded
    memory); bins never exceed the budget and ids stay unique."""
    from ai_fabric_etl_spark.operators.sampling import pack_greedy_firstfit

    rows = [("en", i, 600 + (i * 37) % 900) for i in range(200)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    out = pack_greedy_firstfit(
        df, tokens_col="n_tokens", budget=2000, by=["lang"],
        order_col="doc_id", max_group_rows=50,
    ).collect()
    assert len(out) == 200
    # shard boundaries: rows 0-49 -> shard 0 (bins < 50), 50-99 -> shard 1 ...
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for bin_id, members in by_bin.items():
        assert sum(m.n_tokens for m in members) <= 2000 or len(members) == 1
        shard = bin_id // 50
        assert all(shard * 50 <= m.doc_id < (shard + 1) * 50 for m in members)

    # sharding disabled == classic whole-group first-fit
    small = spark.createDataFrame(rows[:40], "lang string, doc_id long, n_tokens long")
    a = {(r.doc_id, r.bin_id) for r in pack_greedy_firstfit(
        small, "n_tokens", 2000, ["lang"], "doc_id", max_group_rows=None).collect()}
    b = {(r.doc_id, r.bin_id) for r in pack_greedy_firstfit(
        small, "n_tokens", 2000, ["lang"], "doc_id", max_group_rows=50).collect()}
    assert a == b


def test_decontaminate_drops_exact_overlaps(spark):
    """A training doc duplicating a benchmark doc's text must be
    flagged and dropped; clean docs survive."""
    from ai_fabric_etl_spark.operators.dedup import (
        contamination_overlap,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta epsilon zeta eta"),  # leaks doc 1's grams
        ],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 1).select("doc_id", "text")
    flagged = {
        r.doc_id: r.n_overlap
        for r in contamination_overlap(docs, bench, n=5).collect()
    }
    assert 1 in flagged and 3 in flagged and 2 not in flagged
    kept = {r.doc_id for r in decontaminate(docs, bench, n=5).collect()}
    assert kept == {2}


def test_repetition_profile_flags_degenerate_text(spark):
    from ai_fabric_etl_spark.operators.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all these tokens are entirely distinct here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert rows[1].dup_ngram_frac > 0.7 and rows[1].top_word_share == 1.0
    assert rows[2].dup_ngram_frac == 0.0
    assert rows[2].top_word_share < 0.2


def test_kmeans_clusters_partition_and_invariant(spark, sf_dir):
    """Every vector lands in exactly one cluster and its centroid is
    argmax-cosine among all centroids."""
    from ai_fabric_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = similarity.kmeans_clusters(emb, k=4)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert centroids.count() == 4
    best = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", similarity.cosine(F.col("embedding"), F.col("centroid")))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("best_sim"))
    )
    bad = (
        assigned.join(best, "vec_id")
        .filter(F.col("best_sim") - F.col("centroid_sim") > 1e-6)
        .count()
    )
    assert bad == 0


def test_global_shuffle_is_deterministic_permutation(spark, sf_dir):
    """Positions are exactly 1..N; the same salt replays the identical
    permutation; a different salt produces a different one."""
    from ai_fabric_etl_spark.operators.sampling import global_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()

    a = {r.doc_id: r.shuffle_pos for r in global_shuffle(docs, "doc_id").collect()}
    assert sorted(a.values()) == list(range(1, n + 1))

    again = {r.doc_id: r.shuffle_pos for r in global_shuffle(docs, "doc_id").collect()}
    assert a == again

    other = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle(docs, "doc_id", salt="epoch2").collect()
    }
    assert sorted(other.values()) == list(range(1, n + 1))
    assert other != a


def test_quality_filter_flags_and_conjunction(spark):
    """Each rule trips on its designed degenerate input; keep is the
    conjunction of all five flags."""
    from ai_fabric_etl_spark.operators.text import quality_filter

    rows = [
        # healthy: enough tokens, normal words, stopwords, varied
        (1, " ".join(f"wrd{i} box{i} fox{i}" for i in range(30))
            + " the a of and to"),
        (2, "tiny doc"),  # wc_ok fails
        # run-on single word: rep_ok (top word share) and dup_ok fail
        (3, " ".join(["spam"] * 60)),
        # no stopwords: stop_ok fails
        (4, " ".join(f"w{i} q{i} z{i}" for i in range(20))),
        # very long tokens: mwl_ok fails
        (5, " ".join("x" * 14 for _ in range(40)) + " the a of and to"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_filter(df).collect()}

    assert got[1].keep
    assert not got[2].wc_ok and not got[2].keep
    assert not got[3].rep_ok and not got[3].dup_ok and not got[3].keep
    assert not got[4].stop_ok and not got[4].keep
    assert not got[5].mwl_ok and not got[5].keep
    for r in got.values():
        assert r.keep == (r.wc_ok and r.mwl_ok and r.stop_ok and r.rep_ok and r.dup_ok)


def test_priority_sample_exact_size_and_parity(spark, sf_dir):
    from ai_fabric_etl_spark.operators.sampling import priority_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    fast = priority_sample(docs, key="doc_id", k=5, by=["lang"], prereduce=True)
    slow = priority_sample(docs, key="doc_id", k=5, by=["lang"], prereduce=False)
    f_rows = sorted(map(tuple, fast.collect()))
    assert f_rows == sorted(map(tuple, slow.collect()))
    sizes = {r["lang"]: r["n"] for r in fast.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    pops = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {lang: min(5, n) for lang, n in pops.items()}
    # determinism: same rows under a different partitioning
    again = priority_sample(
        docs.repartition(13), key="doc_id", k=5, by=["lang"], prereduce=True
    )
    assert sorted(map(tuple, again.collect())) == f_rows


def test_priority_sample_global_topk_plan(spark, sf_dir):
    from ai_fabric_etl_spark.operators.sampling import priority_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = priority_sample(docs, key="doc_id", k=10)
    assert out.count() == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_ranks_full_matches_first(spark):
    from ai_fabric_etl_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "apple noise noise noise noise noise noise"),
            (3, "banana cherry"),
            (4, "unrelated words only here"),
            (5, "apple banana cherry"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, "apple banana cherry", k=5)
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids  # no matching term, no row
    by_id = {r["doc_id"]: r for r in rows}
    # docs matching all three terms outrank partial matches
    assert by_id[1]["n_terms_matched"] == 3
    assert min(by_id[1]["score"], by_id[5]["score"]) > max(
        by_id[2]["score"], by_id[3]["score"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_term_stats_counts(spark):
    from ai_fabric_etl_spark.operators.search import term_stats

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "z q")], "doc_id long, text string"
    )
    got = {r["term"]: (r["df"], r["total_tf"]) for r in
           term_stats(docs, min_df=2).collect()}
    assert got == {"x": (2, 3), "z": (2, 2)}


def test_topk_per_group_parity_and_exactness(spark, sf_dir):
    from ai_fabric_etl_spark.operators.sampling import topk_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    fast = topk_per_group(
        docs, ["lang"], "n_chars", k=4, tiebreak="doc_id", prereduce=True
    )
    slow = topk_per_group(
        docs, ["lang"], "n_chars", k=4, tiebreak="doc_id", prereduce=False
    )
    f_rows = sorted(map(tuple, fast.collect()))
    assert f_rows == sorted(map(tuple, slow.collect()))
    # exact: per lang, the 4 largest n_chars
    import collections

    pops = collections.defaultdict(list)
    for r in docs.collect():
        pops[r["lang"]].append((r["n_chars"], r["doc_id"]))
    want = []
    for lang, vals in pops.items():
        for n_chars, doc_id in sorted(vals, key=lambda t: (-t[0], t[1]))[:4]:
            want.append((doc_id, lang, n_chars))
    assert f_rows == sorted(want)


def test_weighted_priority_sample_bias_and_determinism(spark):
    from ai_fabric_etl_spark.operators.sampling import weighted_priority_sample

    # 1000 rows; weight 100 for ids < 50, weight 1 otherwise: heavy
    # rows are ~100x likelier per slot and must dominate the sample
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_priority_sample(df, key="id", weight_col="w", k=50)
    ids = [r["id"] for r in got.collect()]
    assert len(ids) == 50
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 30, heavy  # ~50x expected share under uniform would be 2.5
    # deterministic under repartitioning
    again = weighted_priority_sample(
        df.repartition(7), key="id", weight_col="w", k=50
    )
    assert sorted(r["id"] for r in again.collect()) == sorted(ids)
    # zero/negative/null weights never win
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 1.0)], "id long, w double"
    )
    assert [r["id"] for r in weighted_priority_sample(
        df2, key="id", weight_col="w", k=4).collect()] == [4]


def test_fill_time_gaps_semantics(spark):
    from ai_fabric_etl_spark.operators.temporal import fill_time_gaps

    rows = [
        ("a", datetime.datetime(2024, 1, 1, 0), 3, 1.5),
        ("a", datetime.datetime(2024, 1, 1, 3), 2, None),
        ("b", datetime.datetime(2024, 1, 1, 5), 1, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, h timestamp, n long, v double"
    )
    out = fill_time_gaps(
        df, by=["g"], ts_col="h", step_seconds=3600,
        fill_zero=["n"], ffill=["v"],
    )
    got = {(r["g"], r["h"].hour): (r["n"], r["v"]) for r in out.collect()}
    # a: grid 0..3 — gap hours read n=0, v carried from hour 0;
    # hour 3's own NULL v also reads the carried value (ffill)
    assert got == {
        ("a", 0): (3, 1.5),
        ("a", 1): (0, 1.5),
        ("a", 2): (0, 1.5),
        ("a", 3): (2, 1.5),
        ("b", 5): (1, 9.0),
    }


def test_chunk_documents_coverage_and_overlap(spark):
    from ai_fabric_etl_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "x " * 64)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 tokens -> starts 1, 49 -> chunks of 64 and 52
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c1] == [64, 52]
    assert c1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    assert c1[1]["chunk_text"].split()[0] == "w48"  # 16-token overlap
    # every token appears in at least one chunk
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(100)}
    # doc 2: single small chunk; doc 3: exactly 64 tokens -> one chunk
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [2]
    assert [r["n_chunk_tokens"] for r in by_doc[3]] == [64]

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=32, overlap=32)


def test_group_split_no_user_spans_splits(spark, sf_dir):
    from ai_fabric_etl_spark.operators.sampling import hash_split

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    assigned = hash_split(ev, key="user_id", salt="gsplit")
    spans = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0


def test_hybrid_rrf_fuses_component_ranks(spark, sf_dir):
    """hybrid_rrf_topk must equal the hand-computed fusion of its two
    component top-k lists: rrf = 1/(60+lex_rank) + 1/(60+sem_rank),
    absent list contributing 0, ties by id."""
    from ai_fabric_etl_spark.operators.search import bm25_topk, hybrid_rrf_topk
    from ai_fabric_etl_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q, qv, k_each = "vector hash stream", 3, 12

    lex_rows = bm25_topk(docs, q, k=k_each).collect()
    lex_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(lex_rows, key=lambda r: (-r.score, r.doc_id))
        )
    }
    sem_rank = {
        r.neighbor_id: r.rank
        for r in brute_force_topk(
            emb, emb.filter(F.col("vec_id") == qv), k=k_each
        ).collect()
    }
    expect = {}
    for d in set(lex_rank) | set(sem_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (60 + lex_rank[d])
        if d in sem_rank:
            s += 1.0 / (60 + sem_rank[d])
        expect[d] = round(s, 6)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = hybrid_rrf_topk(docs, emb, q, qv, k=10, k_each=k_each).collect()
    assert [(r.doc_id, r.rrf_score) for r in got] == want
    # docs present in both lists carry both ranks
    for r in got:
        assert (r.lex_rank is not None) == (r.doc_id in lex_rank)
        assert (r.sem_rank is not None) == (r.doc_id in sem_rank)


def test_nb_classifier_separable_corpus(spark):
    """Disjoint class vocabularies => every holdout doc classified
    correctly; an all-unseen-token doc still gets a deterministic
    prediction (prior + length terms only, tie-break by label)."""
    from ai_fabric_etl_spark.operators.text import nb_classify

    rows = []
    vocab = {"aa": ["apple banana cherry", "banana cherry apple date"],
             "bb": ["xylo zulu yankee", "zulu yankee xylo whisky"],
             "cc": ["uno dos tres", "dos tres uno quatro"]}
    i = 0
    for lang, texts in vocab.items():
        for _ in range(20):
            rows.append((i, texts[i % 2], lang))
            i += 1
    # doc 300: holdout, tokens unseen in any class
    rows.append((300, "qqq www eee", "aa"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(docs, holdout_mod=5).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {d for d, _, _ in rows if d % 5 == 0}
    for r in out:
        if r["doc_id"] == 300:
            continue
        assert r["is_correct"], (r["doc_id"], r["pred_lang"], r["actual_lang"])
    # unseen-vocab doc: deterministic, from classes seen in training
    assert by_id[300]["pred_lang"] in vocab
    # rerun is bit-identical (no RNG anywhere)
    out2 = nb_classify(docs, holdout_mod=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_nb_classifier_null_labels_excluded_from_training(spark):
    """NULL-labelled rows must not contribute a NULL class: training
    drops them; holdout rows with NULL actual still score."""
    from ai_fabric_etl_spark.operators.text import nb_classify

    rows = [(1, "apple banana", "aa"), (2, "apple cherry", "aa"),
            (3, "zulu yankee", "bb"), (4, "zulu whisky", "bb"),
            (6, "apple date", None),          # train id, null label
            (5, "apple banana cherry", "aa"), # holdout
            (10, "zulu yankee whisky", None)] # holdout, null actual
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_classify(docs, holdout_mod=5).collect()}
    assert set(out) == {5, 10}
    assert out[5]["pred_lang"] == "aa" and out[5]["is_correct"]
    assert out[10]["pred_lang"] in ("aa", "bb")
    assert out[10]["is_correct"] is None  # NULL actual => NULL correctness


def test_dsir_ranks_targetlike_docs_first(spark):
    """Planted corpus: target = docs in vocab A; raw pool mixes
    A-vocab docs with B-vocab noise. DSIR's importance ratio must put
    every A-like raw doc above every noise doc, and the top-k cut
    must select exactly them. Longer A-like docs accumulate more
    positive bigram terms => higher score than shorter A-like docs."""
    from ai_fabric_etl_spark.operators.sampling import (
        dsir_logratios,
        dsir_select_topk,
    )

    a = "alpha beta gamma delta"
    b = "omega psi chi phi"
    rows = []
    for i in range(20):  # target domain (A vocab)
        rows.append((i, f"{a} {a}", "tgt"))
    for i in range(20, 30):  # raw, looks like target
        rows.append((i, a if i % 2 else f"{a} {a} {a}", "raw"))
    for i in range(30, 50):  # raw noise
        rows.append((i, b, "raw"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lr = {
        r["doc_id"]: r["logratio_micro"]
        for r in dsir_logratios(docs, F.col("source") == "tgt").collect()
    }
    assert set(lr) == set(range(20, 50))
    alike = [lr[i] for i in range(20, 30)]
    noise = [lr[i] for i in range(30, 50)]
    assert min(alike) > max(noise)
    # longer target-like docs outscore shorter ones (more evidence)
    assert lr[20] > lr[21]  # doc 20 is the tripled-A form
    top = dsir_select_topk(docs, F.col("source") == "tgt", k=10).collect()
    assert {r["doc_id"] for r in top} == set(range(20, 30))


def test_sample_token_budget_invariants(spark, sf_dir):
    """Per-domain token-budget cut: every selected doc's inclusive
    cumulative tokens fits the budget, the selection is exactly the
    md5-order PREFIX (no doc outside the budget order sneaks in, the
    next doc in order would overflow), absent domains are dropped,
    and the distributed prefix sum equals a single-window reference."""
    from ai_fabric_etl_spark.operators.sampling import (
        _priority,
        sample_token_budget,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    budgets = {"src3": 900, "src7": 500}
    out = sample_token_budget(docs, budgets).collect()
    assert out, "selection must be non-empty"
    assert {r["source"] for r in out} <= set(budgets)
    for r in out:
        assert r["cum_tokens"] <= budgets[r["source"]]

    # reference: single-window cumulative sum in plain Spark
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy(_priority("doc_id", "tokbudget"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        docs.where(F.col("source").isin(*budgets))
        .select("doc_id", "source", toks.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
    )
    ref_rows = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
        for r in ref.collect()
    }
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
        for r in out
    }
    want = {
        k: v for k, v in ref_rows.items()
        if v[2] <= budgets[v[0]]
    }
    assert got == want  # exact prefix, exact cumulative sums
    # prefix-maximality: for each domain the NEXT doc in order overflows
    for dom, b in budgets.items():
        rest = sorted(
            (v[2] for k, v in ref_rows.items()
             if v[0] == dom and k not in got),
        )
        if rest:
            assert rest[0] > b


def test_mmr_rerank_diversity_beats_relevance(spark):
    """Hand-computed MMR: after the most-relevant vector is taken,
    its near-duplicate is displaced by a diverse lower-relevance
    vector under 0.7*rel - 0.3*maxsim."""
    import math

    from ai_fabric_etl_spark.operators.search import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0]),       # query
        (1, [0.9, 0.4359, 0.0]),    # most relevant (rel 0.9)
        (2, [0.9, 0.4359, 0.0]),    # exact dup of 1: sim(1,2)=1
        (3, [0.9, 0.0, 0.4359]),    # same rel, diverse (sim(1,3)~0.81)
        (4, [0.5, 0.5, 0.5]),       # filler, less relevant
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = [
        (r.vec_id, r.mmr_rank)
        for r in mmr_rerank(emb, query_vec_id=0, k=3, k_cand=4).collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    v = {i: e for i, e in rows}
    rel = {i: cos(v[0], v[i]) for i in (1, 2, 3, 4)}
    # step 1: pure relevance argmax
    first = max(rel, key=lambda i: (rel[i], -i))
    assert got[0] == (first, 1)
    # replay greedy for steps 2-3
    sel = [first]
    for step in (2, 3):
        best = None
        for i in rel:
            if i in sel:
                continue
            ms = max(cos(v[i], v[j]) for j in sel)
            score = 0.7 * rel[i] - 0.3 * ms
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i)
        sel.append(best[1])
        assert got[step - 1] == (best[1], step)
    # the designed outcome: diverse vec 3 outranks near-dup 2
    assert sel[0] == 1 and sel[1] == 3
    assert got[1][0] == 3


def test_mmr_rerank_validation_and_size(spark):
    from ai_fabric_etl_spark.operators.search import mmr_rerank

    import pytest as _pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError):
        mmr_rerank(emb, 0, k=5, k_cand=3)
    out = mmr_rerank(emb, 0, k=4, k_cand=5).collect()
    assert [r.mmr_rank for r in out] == [1, 2, 3, 4]
    assert len({r.vec_id for r in out}) == 4


def test_mmr_rerank_singleton_candidate(spark):
    """A corpus with exactly one non-query vector must yield that
    candidate at rank 1 (ADVICE r9: the inner pair join produced an
    empty result while the SQL oracle's sel1 returned one row)."""
    from ai_fabric_etl_spark.operators.search import mmr_rerank

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(emb, 0, k=1, k_cand=20).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.vec_id, r.mmr_rank) == (1, 1)
    assert abs(r.rel_cosine - 0.8) < 1e-6
    assert abs(r.mmr_score - 0.7 * 0.8) < 1e-6


def test_dp_noisy_counts_mechanism(spark):
    """The Laplace release: hand-computed inverse-CDF parity,
    epsilon scaling (b = 1/eps), determinism, and the exact count
    never appearing in the output."""
    import hashlib
    import math

    from ai_fabric_etl_spark.operators import privacy

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], "id long, grp string"
    )

    def hand_noise(key, eps, salt="dp"):
        h = int(
            hashlib.md5(f"{key}-{salt}".encode()).hexdigest()[:13], 16
        )
        u = (h + 0.5) / 4503599627370496.0
        c = u - 0.5
        s = 1.0 if c > 0 else (-1.0 if c < 0 else 0.0)
        return (-1.0 / eps) * s * math.log(1.0 - 2.0 * abs(c))

    for eps in (0.5, 2.0):
        got = {r.grp: r.noisy_count
               for r in privacy.dp_noisy_counts(
                   df, "grp", epsilon=eps, salt="dp").collect()}
        for g in ("g0", "g1", "g2"):
            want = round(30.0 + hand_noise(g, eps), 6)
            assert got[g] == want, (g, eps)
            assert got[g] != 30.0  # the exact count is never released
    # b = 1/eps: the same key's noise shrinks by exactly 4x
    n_half = hand_noise("g0", 0.5)
    n_two = hand_noise("g0", 2.0)
    assert abs(n_half) == 4 * abs(n_two)
    # determinism across calls (the documented keyed-PRG contract)
    a = privacy.dp_noisy_counts(df, "grp", epsilon=1.0, salt="dp").collect()
    b = privacy.dp_noisy_counts(df, "grp", epsilon=1.0, salt="dp").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        privacy.laplace_noise(F.lit("x"), epsilon=0.0, salt="dp")
    with _pytest.raises(TypeError):
        privacy.dp_noisy_counts(df, "grp", epsilon=1.0)  # salt required


def test_dp_salt_rotation_changes_release(spark):
    """VERDICT r10 #6: the replayable-noise trade is a visible caller
    decision. Two releases of the SAME data under ROTATED salts
    differ in every group, while each matches its own oracle (the
    hand-computed inverse-CDF under that salt); fresh_salt() yields
    distinct unpredictable salts."""
    import hashlib
    import math

    from ai_fabric_etl_spark.operators import privacy

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], "id long, grp string"
    )

    def hand_noise(key, eps, salt):
        h = int(hashlib.md5(f"{key}-{salt}".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 4503599627370496.0
        c = u - 0.5
        s = 1.0 if c > 0 else (-1.0 if c < 0 else 0.0)
        return (-1.0 / eps) * s * math.log(1.0 - 2.0 * abs(c))

    rel = {}
    for salt in ("release-1", "release-2"):
        rel[salt] = {r.grp: r.noisy_count
                     for r in privacy.dp_noisy_counts(
                         df, "grp", epsilon=1.0, salt=salt).collect()}
        for g in ("g0", "g1", "g2"):
            assert rel[salt][g] == round(30.0 + hand_noise(g, 1.0, salt), 6)
    assert all(rel["release-1"][g] != rel["release-2"][g]
               for g in ("g0", "g1", "g2"))

    s1, s2 = privacy.fresh_salt(), privacy.fresh_salt()
    assert s1 != s2 and len(s1) == 32
    # a fresh-salt release is valid output but not replayable by a
    # caller who does not hold the salt
    out = privacy.dp_noisy_counts(df, "grp", salt=s1).collect()
    assert len(out) == 3


def test_dp_noisy_sum_clipping_and_parity(spark):
    """Clipping binds (values above clip contribute exactly clip),
    and the released value equals clipped_sum + clip * hand-noise."""
    import hashlib
    import math

    from ai_fabric_etl_spark.operators import privacy

    df = spark.createDataFrame(
        [("a", 50.0), ("a", 250.0), ("b", 10.0), ("b", -5.0)],
        "grp string, v double",
    )

    def hand_noise(key, eps, salt):
        h = int(hashlib.md5(f"{key}-{salt}".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 4503599627370496.0
        c = u - 0.5
        s = 1.0 if c > 0 else (-1.0 if c < 0 else 0.0)
        return (-1.0 / eps) * s * math.log(1.0 - 2.0 * abs(c))

    got = {r.grp: r.noisy_sum_micro
           for r in privacy.dp_noisy_sum(
               df, "grp", "v", clip=100.0, epsilon=2.0, salt="s").collect()}

    def micro(clipped_sum, key):
        import math as _m
        nm = 100.0 * hand_noise(key, 2.0, "s") * 1000000.0
        # Spark ROUND(x, 0) is half-up; python round is banker's
        return int(clipped_sum * 1_000_000) + int(_m.floor(nm + 0.5))

    # a: 50 + min(250,100) = 150; b: 10 + max(-5,0) = 10
    assert got["a"] == micro(150.0, "a")
    assert got["b"] == micro(10.0, "b")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        privacy.dp_noisy_sum(df, "grp", "v", clip=0.0, salt="s")
    with _pytest.raises(TypeError):
        privacy.dp_noisy_sum(df, "grp", "v", clip=1.0)  # salt required


def test_retrieval_metrics_hand_computed(spark):
    """recall@k / MRR / nDCG on a crafted case: graded relevance,
    a no-hit query, the k cutoff excluding a late hit, and
    judged-irrelevant (rel=0) rows counting for nothing (ADVICE
    r10): a rel=0 hit at rank 1 must not set MRR, must not enter
    n_relevant or recall, and a query judged ONLY with rel=0 rows is
    omitted."""
    import math

    from ai_fabric_etl_spark.operators.search import retrieval_metrics

    results = spark.createDataFrame(
        # q1: hits at ranks 1 (rel 2) and 3 (rel 1); rank-4 doc is
        #     relevant but k=3 cuts it
        # q2: no relevant doc retrieved
        # q3: rank-1 doc judged IRRELEVANT (rel 0), first relevant at
        #     rank 2 — pre-fix MRR would be 1.0, correct is 0.5
        # q4: every judgment is rel=0 — metrics undefined, omitted
        [(1, 11, 1), (1, 12, 2), (1, 13, 3), (1, 14, 4),
         (2, 21, 1), (2, 22, 2),
         (3, 31, 1), (3, 32, 2),
         (4, 41, 1)],
        "query_id long, doc_id long, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 11, 2), (1, 13, 1), (1, 14, 1),
         (2, 99, 1),
         (3, 31, 0), (3, 32, 2), (3, 99, 1),
         (4, 41, 0)],
        "query_id long, doc_id long, rel int",
    )
    got = {r.query_id: r for r in retrieval_metrics(
        results, truth, k=3).collect()}

    def t(rel, rank):
        return round(rel / math.log2(rank + 1), 6)

    q1 = got[1]
    assert q1.n_relevant == 3
    assert q1.recall_at_k == round(2 / 3, 6)
    assert q1.mrr == 1.0
    dcg = t(2, 1) + t(1, 3)
    idcg = t(2, 1) + t(1, 2) + t(1, 3)
    assert q1.ndcg_at_k == round(dcg / idcg, 6)
    q2 = got[2]
    assert (q2.recall_at_k, q2.mrr, q2.ndcg_at_k) == (0.0, 0.0, 0.0)
    q3 = got[3]
    assert q3.n_relevant == 2          # the rel=0 judgment is not relevant
    assert q3.recall_at_k == 0.5       # only doc 32 is a relevant hit
    assert q3.mrr == 0.5               # rel=0 at rank 1 does not set MRR
    dcg3 = t(2, 2)                     # rel=0 hit contributes 0 gain
    idcg3 = t(2, 1) + t(1, 2)          # rel=0 sorts past both positives
    assert q3.ndcg_at_k == round(dcg3 / idcg3, 6)
    assert 4 not in got                # rel=0-only truth -> omitted

    import pytest as _pytest

    with _pytest.raises(ValueError):
        retrieval_metrics(results, truth, k=0)


def test_retrieval_metrics_random_parity(spark):
    """Randomized parity against a pure-python reference: seeded
    runs/judgments with partial overlap, graded rels, and queries
    missing from either side."""
    import math
    import random

    from ai_fabric_etl_spark.operators.search import retrieval_metrics

    rng = random.Random(77)
    res_rows, truth_rows = [], []
    for q in range(12):
        docs = rng.sample(range(1000), 8)
        for r, d in enumerate(docs, start=1):
            res_rows.append((q, d, r))
        judged = rng.sample(range(1000), 5) + docs[:2]
        for d in set(judged):
            # grade 0 = judged irrelevant (graded-qrels pools)
            truth_rows.append((q, d, rng.choice([0, 1, 2, 3])))
    k = 5
    results = spark.createDataFrame(
        res_rows, "query_id long, doc_id long, rank int"
    )
    truth = spark.createDataFrame(
        truth_rows, "query_id long, doc_id long, rel int"
    )
    got = {r.query_id: (r.n_relevant, r.recall_at_k, r.mrr, r.ndcg_at_k)
           for r in retrieval_metrics(results, truth, k=k).collect()}

    import collections
    tr = collections.defaultdict(dict)
    for q, d, rel in truth_rows:
        tr[q][d] = rel
    run = collections.defaultdict(dict)
    for q, d, r in res_rows:
        if r <= k:
            run[q][d] = r

    def term(rel, rank):
        from decimal import Decimal
        return Decimal(str(round(rel / math.log2(rank + 1), 6)))

    omitted = 0
    for q in tr:
        pos = {d: rel for d, rel in tr[q].items() if rel > 0}
        if not pos:
            assert q not in got, q  # no relevant judgment -> omitted
            omitted += 1
            continue
        hits = [(d, run[q][d]) for d in tr[q] if d in run[q]]
        pos_hits = [(d, r) for d, r in hits if d in pos]
        n_rel = len(pos)
        recall = round(len(pos_hits) / n_rel, 6)
        mrr = (round(1.0 / min(r for _, r in pos_hits), 6)
               if pos_hits else 0.0)
        dcg = sum((term(tr[q][d], r) for d, r in hits), start=__import__("decimal").Decimal(0))
        ideal = sorted(tr[q].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        idcg = sum((term(rel, i) for i, (_, rel) in enumerate(ideal, start=1)),
                   start=__import__("decimal").Decimal(0))
        ndcg = round(float(dcg) / float(idcg), 6) if hits else 0.0
        assert got[q] == (n_rel, recall, mrr, ndcg), q
    assert len(got) == len(tr) - omitted


def test_keep_best_random_parity(spark):
    """Randomized parity against a pure-python union-find reference:
    arbitrary edge sets (chains, cliques, singletons), random
    qualities with ties."""
    import random

    from ai_fabric_etl_spark.operators import dedup

    rng = random.Random(31)
    ids = list(range(40))
    quality = {i: float(rng.choice([1, 2, 3])) for i in ids}
    edges = set()
    while len(edges) < 25:
        a, b = rng.sample(ids, 2)
        if a > b:
            a, b = b, a
        edges.add((a, b))
    docs = spark.createDataFrame(
        [(i, quality[i]) for i in ids], "doc_id long, q double"
    )
    pairs = spark.createDataFrame(
        sorted(edges), "doc_a long, doc_b long"
    )
    got = {r.doc_id: (r.cluster_rep, r.kept, r.canonical_id)
           for r in dedup.keep_best_per_cluster(
               docs, pairs, quality_col="q").collect()}

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in ids:
        clusters.setdefault(find(i), []).append(i)
    for rep, members in clusters.items():
        rep_min = min(members)
        canon = min(members, key=lambda i: (-quality[i], i))
        for i in members:
            assert got[i] == (rep_min, i == canon, canon), (i, members)


def test_langid_planted_precision(spark):
    """Char-bigram NB language ID on a planted 4-language corpus:
    100% holdout precision on clean docs, robustness to 20%
    mixed-alphabet noise, empty/short-text fallback to the max-prior
    (then ascending-label) language."""
    import hashlib

    from ai_fabric_etl_spark.operators.text import langid_classify

    alphas = ["abcdefghijklmnop", "qrstuvwxyzABCDEF",
              "GHIJKLMNOPQRSTUV", "WXYZ0123456789_."]

    def synth(i, lang):
        h = hashlib.md5(str(i).encode()).hexdigest()
        return h.translate(str.maketrans("0123456789abcdef", alphas[lang]))

    rows = [(i, "L%d" % (i % 4), synth(i, i % 4)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    train = df.filter("doc_id % 5 != 0")

    # clean holdout: 100% precision
    test = df.filter("doc_id % 5 = 0")
    out = {r.doc_id: r.pred_lang
           for r in langid_classify(train, test).collect()}
    want = {i: "L%d" % (i % 4) for i in range(0, 200, 5)}
    assert out == want

    # noisy docs: every 5th char replaced with the NEXT language's
    # alphabet (20% contamination) — still classified correctly
    noisy = []
    for i in range(0, 40):
        t = list(synth(i + 1000, i % 4))
        other = synth(i + 2000, (i + 1) % 4)
        for p in range(0, len(t), 5):
            t[p] = other[p]
        noisy.append((i + 1000, "".join(t)))
    ndf = spark.createDataFrame(noisy, "doc_id long, text string")
    nout = {r.doc_id: r.pred_lang
            for r in langid_classify(train, ndf).collect()}
    assert nout == {i + 1000: "L%d" % (i % 4) for i in range(40)}

    # degenerate docs: no bigram evidence -> prior-only argmax;
    # equal class priors here, so the ascending-label tie-break L0
    edge = spark.createDataFrame(
        [(9000, ""), (9001, "q")], "doc_id long, text string"
    )
    eout = {r.doc_id: r.pred_lang
            for r in langid_classify(train, edge).collect()}
    assert eout == {9000: "L0", 9001: "L0"}
