"""Similarity search over embedding columns (array<float>).

Three paths:
- brute-force cosine top-k: exact baseline; query side broadcast so
  the corpus scan never shuffles.
- hyperplane-LSH bucketed ANN: corpus bucketed once by L sign-pattern
  keys, probes join on bucket keys, top-k within candidates. Recall
  < 1.0 by construction; measured in tests.
- IVF (k-means cells): data-adaptive partitioning; at 100 TB the
  corpus is stored partitioned by centroid id and each query batch
  reads only the probed cells (partition pruning).

Dot products run JVM-side via zip_with/aggregate (codegen), not
Python UDFs.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query with a deterministic tiebreak.

    Returns (query_id, neighbor_id, rank, cosine_sim). Self-matches
    excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _tag_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    stride: int,
    probe_radius: int = 0,
) -> DataFrame:
    """Attach (table, bucket) LSH keys — one output row per table
    (times ``1 + n_planes`` when ``probe_radius=1``).

    All n_tables × n_planes sign tests run as ONE Arrow-batched numpy
    matmul per input batch (X @ P.T), then posexplode fans the packed
    per-table keys out. The expression-tree alternative (n_tables ×
    n_planes separate zip_with/aggregate dots) compiles to a plan so
    large it dominated the bench at sf0.1 (~8.5 s → ~1 s); this is the
    sanctioned vectorized-UDF case — a dense matmul the built-in array
    lambdas can't express efficiently.

    ``probe_radius=1`` is multi-probe LSH (Lv et al., VLDB'07): each
    row additionally lands in the n_planes buckets at Hamming
    distance 1 (one sign flipped). Used on the QUERY side only — it
    buys the recall of ~n_planes extra tables while the corpus index
    keeps one row per table, which is the trade that matters when the
    corpus is 100 TB and the query batch is not."""
    from pyspark.sql.types import ArrayType, LongType

    if probe_radius not in (0, 1):
        raise ValueError(f"probe_radius must be 0 or 1, got {probe_radius}")
    mat = np.asarray(
        [
            plane
            for t in range(n_tables)
            for plane in _hyperplanes(dim, n_planes, seed + stride * t)
        ],
        dtype=np.float64,
    )  # (n_tables * n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    n_t, n_p = n_tables, n_planes
    per_table = 1 + (n_p if probe_radius else 0)

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_keys(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack([np.asarray(e, dtype=np.float64) for e in v])
        bits = (x @ mat.T) >= 0.0
        keys = (bits.reshape(len(x), n_t, n_p) * weights).sum(axis=2)
        if probe_radius:
            flips = keys[:, :, None] ^ weights[None, None, :]
            keys = np.concatenate([keys[:, :, None], flips], axis=2)
        return pd.Series(list(keys.reshape(len(x), n_t * per_table)))

    tagged = df.withColumn("_bks", bucket_keys(F.col(vec_col))).select(
        *df.columns, F.posexplode("_bks").alias("_pos", "bucket")
    )
    return tagged.withColumn(
        "table", (F.col("_pos") / per_table).cast("int")
    ).drop("_pos")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    The corpus is tagged with one bucket key per table (a single
    projection pass); queries join on (table, bucket). At 100 TB the
    corpus side would be written bucket-partitioned once and reused
    across query batches — the join then prunes to matching buckets.

    Tuning: collision prob per plane is 1 - theta/pi, so for corpora
    whose true neighbors sit at modest cosine (like random synthetic
    embeddings) use few planes + many tables. Raise n_planes as the
    corpus grows so bucket sizes stay bounded; buy recall back with
    query-side multi-probe (default on: each query also probes the
    n_planes Hamming-1 buckets per table — corpus index rows stay at
    one per table, so index storage is unchanged at 100 TB).
    Measured at sf0.1 (20k vectors): 4 planes x 16 tables = pooled
    recall@5 0.85 single-probe, 1.0 multi-probe.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_all = _tag_buckets(c, "c_vec", dim, n_planes, n_tables, seed, stride=97)
    q_all = _tag_buckets(
        q, "q_vec", dim, n_planes, n_tables, seed, stride=97,
        probe_radius=probe_radius,
    )

    cand = (
        c_all.join(F.broadcast(q_all), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def _ivf_fit_cells(
    corpus: DataFrame,
    n_centroids: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """K-means (cosine) cell assignment: returns (assigned, centroids)
    — the single source of the index build shared by the in-memory and
    on-disk IVF paths."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    feats = c.withColumn(
        "features", array_to_vector(F.col("c_vec").cast("array<double>"))
    )
    # Pinned for the same reason as kmeans_clusters: the post-fit
    # transform and the probe/score consumers replay blocks, not the
    # corpus scan (KMeans itself caches its instances RDD during fit
    # when storageLevel is NONE). c_vec rides the checkpoint because
    # the scorer needs it anyway; for corpus-scale inputs the blocks
    # stay pinned for the session and are unreplicated — acceptable
    # for the one-off index build this feeds (ivf_write_index
    # persists the real artifact to parquet).
    feats = feats.localCheckpoint(eager=True)
    model = KMeans(
        k=n_centroids, seed=seed, distanceMeasure="cosine", featuresCol="features"
    ).fit(feats)
    assigned = model.transform(feats).select(
        "neighbor_id", "c_vec", F.col("prediction").alias("centroid_id")
    )
    centroids = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    return assigned, centroids


def _ivf_probe_and_score(
    cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Probe selection (broadcast centroid scoring) + candidate search
    + per-query top-k — shared by ivf_topk and ivf_topk_indexed, so
    tie-breaking and the self-match filter cannot drift between them."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("centroid_sim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("centroid_sim", cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cand = cells.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted file) partitioning.

    Index build: k-means (cosine distance) over the corpus assigns
    every vector to its nearest centroid — at 100 TB this is a one-off
    job whose output is the corpus written partitioned by
    ``centroid_id`` (ivf_write_index), so each probe reads only
    n_probe/n_centroids of the data (partition pruning does the work
    LSH does with bucket joins, but with data-adaptive cells).

    Query: score each query against the (tiny, broadcast) centroid
    table, keep the ``n_probe`` nearest cells, then search only those
    cells' vectors. Recall grows with n_probe; n_probe == n_centroids
    degenerates to exact brute force.
    """
    assigned, centroids = _ivf_fit_cells(corpus, n_centroids, seed, id_col, vec_col)
    return _ivf_probe_and_score(
        assigned, centroids, queries, k, n_probe, id_col, vec_col
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index the 100 TB story promises: the corpus
    written PARTITIONED BY its k-means cell, plus the (tiny) centroid
    table alongside. One-off build job; after it, every query batch
    touches only its probed cells' files (see ivf_topk_indexed)."""
    assigned, centroids = _ivf_fit_cells(corpus, n_centroids, seed, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/cells"
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the on-disk IVF index: probe selection against the
    broadcast centroid table, then a broadcast join on ``centroid_id``
    against the partitioned cells — Spark's dynamic partition pruning
    turns that into reading ONLY the probed cells' files (the scan
    carries a dynamicpruning PartitionFilter; asserted in
    tests/test_plans.py). This is the concrete form of "each probe
    reads n_probe/n_centroids of the data"."""
    centroids = spark.read.parquet(f"{path}/centroids")
    cells = spark.read.parquet(f"{path}/cells")
    return _ivf_probe_and_score(
        cells, centroids, queries, k, n_probe, id_col, vec_col
    )


def ivf_insert(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental insertion into the on-disk IVF index — the ANN
    counterpart of the incremental MinHash index (dedup.minhash_dedup_
    incremental): the CENTROIDS STAY FROZEN, each new vector is
    assigned to its argmax-cosine centroid against the broadcast
    centroid table (one map-side pass over the batch — the existing
    corpus is never re-clustered, re-read, or reshuffled), and the
    batch appends into only the cell partitions it lands in (dynamic
    partition append).

    Freezing centroids is how FAISS/ScaNN-style serving indexes grow
    between rebuilds; drift eventually skews cell sizes — watch
    :func:`ivf_cell_stats` and rebuild (ivf_write_index) when the
    hottest cell dwarfs the median, exactly like OPTIMIZE for small
    files."""
    centroids = spark.read.parquet(f"{path}/centroids")
    nv = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    w = Window.partitionBy("neighbor_id").orderBy(
        F.desc("sim"), F.asc("centroid_id")
    )
    assigned = (
        nv.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col("c_vec"), F.col("centroid")))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("neighbor_id", "c_vec", "centroid_id")
    )
    assigned.write.mode("append").partitionBy("centroid_id").parquet(
        f"{path}/cells"
    )


def ivf_cell_stats(spark, path: str) -> DataFrame:
    """Per-cell vector counts of the on-disk index — the rebuild
    trigger signal (max/median imbalance after many inserts)."""
    return (
        spark.read.parquet(f"{path}/cells")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def neardup_planes_for(
    n: int, target_occupancy: int = 32, lo: int = 4, hi: int = 24
) -> int:
    """Plane count that keeps EXPECTED bucket occupancy ~constant as
    the corpus grows: planes = ceil(log2(n / target_occupancy)),
    clamped to [lo, hi]. Constant occupancy is what makes the
    in-bucket candidate-pair count LINEAR in n — a fixed plane count
    caps the bucket space, so occupancy (and pairs, quadratically)
    grows with the corpus instead (measured: sf1->sf2 doubling cost
    3.02x wall before this derivation, 100 TB-fatal)."""
    import math

    if n <= target_occupancy:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_occupancy))))


def lsh_cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 6,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 2000,
    target_occupancy: int = 16,
    corpus_count: int | None = None,
    extra_planes: int = 4,
    max_resplit_rounds: int = 2,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: self-join within LSH buckets
    only, sized for the corpus and skew-safe.

    Two mechanisms keep the candidate set linear in corpus size (the
    100 TB requirement) and the recall loss explicit, not silent:

    1. **Auto-scaled plane count.** ``n_planes=None`` (default)
       derives planes from the corpus count so expected occupancy
       stays ~``target_occupancy`` regardless of n (see
       :func:`neardup_planes_for`). A fixed plane count makes the
       per-bucket pair count — hence the whole operator — quadratic
       in n; measured at 3.02x wall per 2x rows before this change.
    2. **Hierarchical re-split instead of silent drop.** All
       ``n_planes + extra_planes*max_resplit_rounds`` sign bits are
       computed in the ONE Arrow-batched matmul `_tag_buckets` already
       runs; a bucket whose size exceeds ``max_bucket`` sends its rows
       to the next refinement level (``extra_planes`` more low bits of
       the same packed key), up to ``max_resplit_rounds`` times —
       so a skewed bucket is subdivided 2**extra_planes ways per
       round rather than discarded. Rows whose finest bucket is STILL
       oversized (only possible for >max_bucket near-identical
       vectors, which no hyperplane can separate) follow
       ``on_oversize``: ``"raise"`` (default — matches the SemDeDup
       oversized-cell policy at :func:`semdedup_prune`) or ``"drop"``.
       Run exact dedup first if the corpus carries byte-identical
       vectors at that multiplicity.

    Bucket sizes at every level come from one groupBy on the finest
    key plus a rollup over the (small) bucket-count frame — 2 shuffles
    of the tagged rows total, never one window pass per level. Rows
    sharing a final bucket share every coarser key, so they compute
    identical level decisions — pairs are never split across levels.

    Recall: identical vectors agree on EVERY sign bit, so planted
    exact duplicates share buckets at every refinement level; their
    recall is structurally 1.0 under any auto-derived plane count.

    ``stats_out`` (optional dict) receives ``n_planes``,
    ``rows_per_level`` and ``oversized_rows`` — this triggers one
    extra aggregation action over the tagged frame.
    """
    if on_oversize not in ("raise", "drop"):
        raise ValueError(f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}")
    if n_planes is None:
        n = corpus_count if corpus_count is not None else emb.count()
        n_planes = neardup_planes_for(n, target_occupancy)
    rounds = max_resplit_rounds
    total_bits = n_planes + extra_planes * rounds
    if total_bits > 62:
        raise ValueError(
            f"n_planes + extra_planes*max_resplit_rounds = {total_bits} "
            "exceeds the 62-bit packed-key budget"
        )

    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # vectors never enter the bucket machinery: tagging needs them
    # map-side only, and the tagged frame holds n_tables rows PER
    # VECTOR — carrying the embedding there would shuffle every
    # vector n_tables times through the joins below. Ids + keys only;
    # vectors join back once per pair side at the end.
    # checkpointed, not lazy (r14): the tagged frame feeds the bucket
    # counts AND both self-join sides — unpinned, the Arrow-matmul
    # tagging (and the corpus scan under it) executed three times per
    # action. One materialization of the O(n_tables·n) key rows; no
    # cache entry, no path lineage.
    tagged = _tag_buckets(
        v, "v", dim, total_bits, n_tables, seed, stride=31
    ).select("id", "table", "bucket").localCheckpoint(eager=True)
    fine_key = F.col("bucket")

    def mask(r: int) -> int:
        return (1 << (n_planes + extra_planes * r)) - 1

    # one groupBy to the finest-bucket count frame (keys only, no
    # vectors), then one window pass PER LEVEL over that SMALL frame —
    # keys nest, so n_r = sum of finest counts over bucket & mask(r).
    # Never a self-join chain: each join level would re-evaluate the
    # whole tagging subtree (measured 10x wall on the bench row)
    cnts = tagged.groupBy("table", "bucket").agg(
        F.count(F.lit(1)).alias(f"n{rounds}")
    )
    for r in range(rounds - 1, -1, -1):
        w = Window.partitionBy("table", fine_key.bitwiseAND(F.lit(mask(r))))
        cnts = cnts.withColumn(f"n{r}", F.sum(f"n{rounds}").over(w))

    lvl = F.lit(None).cast("int")
    for r in range(rounds, -1, -1):
        ok = F.col(f"n{r}") <= max_bucket
        lvl = F.when(ok, F.lit(r)).otherwise(lvl)
    assign = cnts.select(
        "table", "bucket", lvl.alias("lvl"),
        F.col(f"n{rounds}").alias("_fn"),
    )

    if stats_out is not None:
        rows = assign.groupBy("lvl").agg(F.sum("_fn").alias("n")).collect()
        stats_out["n_planes"] = n_planes
        stats_out["rows_per_level"] = {
            int(r["lvl"]): int(r["n"]) for r in rows if r["lvl"] is not None
        }
        stats_out["oversized_rows"] = sum(
            int(r["n"]) for r in rows if r["lvl"] is None
        )

    if on_oversize == "raise":
        # the guard must be OPAQUE to the optimizer: a raise_error
        # inside a CASE (or assert_true) gets elided — Catalyst infers
        # plain isnotnull(lvl) from the downstream equi-joins, pushes
        # it below the raising expression, and the oversized rows
        # vanish before the raise ever evaluates. A pandas UDF over
        # the SMALL bucket-count frame is a black box: every assign
        # row passes through it unconditionally, so a null level (an
        # unsplittable oversized bucket) always surfaces.
        from pyspark.sql.types import IntegerType

        msg = (
            "lsh_cosine_neardup_pairs: bucket still exceeds "
            f"max_bucket={max_bucket} after {rounds} re-split rounds "
            "(near-identical vector clump no hyperplane separates) — "
            "exact-dedup the corpus first, raise max_bucket, or pass "
            "on_oversize='drop'"
        )

        @F.pandas_udf(IntegerType())
        def _guard_lvl(lv: pd.Series, bkt: pd.Series) -> pd.Series:
            if lv.isna().any():
                bad = bkt[lv.isna()].iloc[0]
                raise ValueError(f"{msg}; finest bucket key {int(bad)}")
            return lv.astype("int32")

        assign = assign.withColumn("lvl", _guard_lvl("lvl", "bucket"))

    # lbucket derives FROM lvl (not its own CASE chain): every use of
    # it — including optimizer-inferred isnotnull predicates — then
    # forces the guard UDF to evaluate, so the raise cannot be pushed
    # around
    assign = assign.withColumn(
        "lbucket",
        fine_key.bitwiseAND(
            F.expr(
                f"shiftleft(1L, lvl * {extra_planes} + {n_planes}) - 1"
            )
        ),
    )
    # checkpointed (r14): assign feeds both self-join sides through
    # `leveled` — unpinned, the per-level window chain and the guard
    # UDF ran twice per action; the frame is O(distinct buckets).
    # Eager, so the on_oversize='raise' guard fires before pair work.
    assign = assign.drop("_fn").localCheckpoint(eager=True)
    leveled = (
        tagged.join(assign, ["table", "bucket"])
        .filter(F.col("lvl").isNotNull())
        .select("id", "table", "lvl", "lbucket")
    )

    a = leveled.alias("a")
    b = leveled.alias("b")
    # id-only candidate pairs, deduped BEFORE any vector touches the
    # pipeline: the pair dedup shuffles 16-byte rows, then each side's
    # embedding joins back exactly once and the cosine runs once per
    # DISTINCT pair
    pairs = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.lvl") == F.col("b.lvl"))
            & (F.col("a.lbucket") == F.col("b.lbucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.join(v.select(F.col("id").alias("id_a"),
                            F.col("v").alias("v_a")), "id_a")
        .join(v.select(F.col("id").alias("id_b"),
                       F.col("v").alias("v_b")), "id_b")
        .select(
            "id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_clusters(
    corpus: DataFrame,
    k: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Cosine k-means over an embedding column — the clustering pass a
    training-data pipeline runs for corpus curation (topic balancing,
    domain mixing, diversity-aware sampling) and that IVF indexing
    reuses for its cells.

    Returns ``(assignments, centroids)``: assignments is
    ``(id_col, cluster_id, centroid_sim)``; centroids is
    ``(cluster_id, centroid)``.

    Scale: Lloyd's iterations are embarrassingly parallel — each step
    is one broadcast of k·dim floats plus a map-side argmin; pyspark.ml
    KMeans does exactly this under the hood with DataFrame-native
    aggregation, so we use it rather than re-rolling the loop.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_vec")
    ).withColumn("features", array_to_vector(F.col("_vec").cast("array<double>")))
    # Pin the feature frame so model.transform and every downstream
    # action replay materialized blocks instead of the source scan +
    # vector conversion. (ml.KMeans caches its instances RDD
    # internally during fit when the input's storageLevel is NONE, so
    # the per-iteration Lloyd scans are covered either way — the pin
    # pays off on the post-fit reads. localCheckpoint, not persist:
    # no CacheManager entry and no path lineage, the r14 lesson.
    # r15 A/B at 32 cores, 5 alternating reps: pinned 2.23-2.48s vs
    # unpinned 2.44-2.97s on emb_semdedup_planted — pinned wins every
    # rep; the r14 driver's 8.61s reading did not reproduce.)
    feats = feats.localCheckpoint(eager=True)
    model = KMeans(
        k=k, seed=seed, distanceMeasure="cosine", maxIter=max_iter,
        featuresCol="features",
    ).fit(feats)
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cluster_id int, centroid array<double>",
    )
    assigned = (
        model.transform(feats)
        .select(id_col, "_vec", F.col("prediction").alias("cluster_id"))
        .join(F.broadcast(centroids), "cluster_id")
        .select(
            id_col,
            "cluster_id",
            cosine(F.col("_vec"), F.col("centroid")).alias("centroid_sim"),
        )
    )
    return assigned, centroids


def normalize_l2(df: DataFrame, col: str = "embedding") -> DataFrame:
    """L2-normalize the embedding column in place (zero vectors pass
    through unchanged) — one codegen aggregate+transform per row, the
    precursor to any cosine-metric index build."""
    norm = F.sqrt(
        F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn(
        col,
        F.when(norm == 0.0, F.col(col)).otherwise(
            F.transform(F.col(col), lambda x: (x.cast("double") / norm).cast("float"))
        ),
    )


def quantize_int8(
    df: DataFrame, col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4× storage/
    bandwidth cut every large ANN index applies before sharding:
    scale = max|x|/127, q = round(x/scale) ∈ [−127, 127], zero
    vectors quantize to zeros with scale 0. Adds ``out_col``
    (array<int>) and ``{out_col}_scale`` (float, the dequantization
    multiplier). Pure expressions — at 100 TB this is a map-only
    pass that shrinks the shuffle/index footprint 4×."""
    # materialize max|x| as a column FIRST: referencing the aggregate
    # expression inside the transform lambda would re-evaluate the
    # O(dim) fold once per element (O(dim^2) per vector — measured
    # ~1.9x on 64-dim vectors at sf1)
    amax_expr = F.aggregate(
        F.col(col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    tmp = f"__{out_col}_amax"
    out = df.withColumn(tmp, amax_expr)
    scale = F.col(tmp) / F.lit(127.0)
    q = F.when(
        F.col(tmp) == 0.0,
        F.transform(F.col(col), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col(col),
            lambda x: F.round(x.cast("double") / scale, 0).cast("int"),
        )
    )
    return (
        out.withColumn(out_col, q)
        .withColumn(f"{out_col}_scale", scale.cast("float"))
        .drop(tmp)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the embedding-compression ANN scheme
# ---------------------------------------------------------------------------


def opq_permutation(
    corpus: DataFrame, m: int, vec_col: str = "embedding"
) -> list[int]:
    """OPQ-style coordinate permutation (the non-parametric variant of
    Ge et al., "Optimized Product Quantization", CVPR'13): sort
    dimensions by variance and deal them round-robin across the m
    subspaces, so no subspace concentrates all the high-variance
    coordinates. Contiguous slicing quantizes a variance-hot subspace
    with the same k centroids as a near-constant one — balancing
    equalizes per-subspace quantization error, which is what ADC
    distance quality depends on. One aggregate over the corpus; the
    returned list is a driver-side literal of size dim."""
    head = corpus.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("opq_permutation: empty corpus")
    dim = len(head[0])
    stats = corpus.select(
        *[
            F.variance(F.element_at(F.col(vec_col), i + 1)).alias(f"v{i}")
            for i in range(dim)
        ]
    ).first()
    order = sorted(range(dim), key=lambda i: -(stats[f"v{i}"] or 0.0))
    sub = dim // m
    perm = [0] * dim
    # deal: j-th dim of subspace s takes the (j*m + s)-th by variance
    for rank, d in enumerate(order):
        s, j = rank % m, rank // m
        perm[s * sub + j] = d
    return perm


def apply_permutation(
    df: DataFrame, perm: list[int], vec_col: str = "embedding"
) -> DataFrame:
    """Reorder every vector's coordinates by ``perm`` (codegen
    element_at gather — no UDF). Cosine/L2 rankings are permutation-
    invariant, so exact rerank may use either layout."""
    gathered = F.array(
        *[F.element_at(F.col(vec_col), p + 1) for p in perm]
    )
    return df.withColumn(vec_col, gathered)


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    seed: int = 29,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train PQ codebooks (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI'11): the vector space is split
    into ``m`` contiguous subspaces and each gets its own k-means
    codebook of ``k`` centroids — storage per vector drops from
    dim×4 bytes to m bytes (m=4, k≤256 here: 16 bytes of floats
    become 4 code bytes).

    Returns (subspace, centroid_id, centroid array<double>) —
    m·k rows, always broadcastable. Training runs one Spark ML
    k-means per subspace over the corpus; at 100 TB train on a
    deterministic sample (priority_sample) exactly as FAISS trains
    on a corpus slice — codebook quality needs thousands of points
    per centroid, not the whole corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    head = corpus.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("pq_train: empty corpus (no vectors to train on)")
    dim = len(head[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    spark = corpus.sparkSession
    # one materialization feeds all m fits (each KMeans iterates its
    # input several times; without the persist the corpus projection
    # is re-scanned m x iterations times)
    vecs = corpus.select(F.col(vec_col).alias("_v")).persist()
    try:
        rows = []
        for j in range(m):
            feats = vecs.select(
                array_to_vector(
                    F.slice(F.col("_v"), j * sub + 1, sub).cast(
                        "array<double>"
                    )
                ).alias("features")
            )
            model = KMeans(
                k=k, seed=seed + j, distanceMeasure="euclidean",
                featuresCol="features",
            ).fit(feats)
            rows += [
                (j, i, [float(x) for x in ctr])
                for i, ctr in enumerate(model.clusterCenters())
            ]
    finally:
        vecs.unpersist()
    return spark.createDataFrame(
        rows, "subspace int, centroid_id int, centroid array<double>"
    )


def _codebook_array(codebooks: DataFrame):
    """Collect the (tiny, m·k-row) codebook table into a numpy array
    [m, k, sub] for broadcast into Arrow-batched encode/score UDFs."""
    import numpy as np

    rows = codebooks.collect()
    m = 1 + max(r.subspace for r in rows)
    k = 1 + max(r.centroid_id for r in rows)
    sub = len(rows[0].centroid)
    books = np.zeros((m, k, sub))
    for r in rows:
        books[r.subspace, r.centroid_id] = r.centroid
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its per-subspace nearest-centroid codes:
    (id, codes array<int>). One Arrow-batched mapInPandas pass, all
    distances as ONE numpy matmul-shaped broadcast op per subspace —
    the compressed corpus this emits is what a 100 TB ANN deployment
    scans instead of raw floats."""
    import numpy as np
    import pandas as pd

    books = _codebook_array(codebooks)
    m, _, sub = books.shape

    def encode(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy())
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
                d = (
                    -2.0 * xs @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes its m×k lookup table of exact subspace distances, and
    every corpus vector's approximate distance is m table lookups —
    no float vector is ever read at query time. Returns
    (query_id, neighbor_id, rank, approx_dist), rank 1..k by
    ascending distance (ties by id). On L2-normalized vectors,
    squared-L2 ranking == cosine ranking, so recall is measured
    against the cosine brute force.

    Scale: the scan reads only the m-byte codes column; the final
    per-query top-k is a window over (query, candidate) scores —
    compose with the bottom-k prereduce for huge query batches."""
    import numpy as np
    import pandas as pd

    # fail fast BEFORE the query collect / table build below
    if rerank > k and corpus is None:
        raise ValueError("rerank > k requires the raw corpus DataFrame")
    books = _codebook_array(codebooks)
    m, kk, sub = books.shape
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()
    if not qrows:
        raise ValueError("pq_topk: no queries (empty query DataFrame)")
    qids = np.array([r.query_id for r in qrows])
    qvecs = np.stack([np.asarray(r.q_vec, dtype=float) for r in qrows])
    # distance tables: tables[qi, j, c] = ||q_sub - c||^2
    tables = np.empty((len(qids), m, kk))
    for j in range(m):
        qs = qvecs[:, j * sub : (j + 1) * sub]
        tables[:, j, :] = (
            (qs**2).sum(axis=1)[:, None]
            - 2.0 * qs @ books[j].T
            + (books[j] ** 2).sum(axis=1)[None, :]
        )

    def score(batches):
        for pdf in batches:
            c = np.stack(pdf["codes"].to_numpy())  # [n, m]
            n = len(pdf)
            # dist[qi, row] = sum_j tables[qi, j, c[row, j]]
            d = np.zeros((len(qids), n))
            for j in range(m):
                d += tables[:, j, :][:, c[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), len(qids)),
                    "approx_dist": d.reshape(-1),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    shortlist_n = max(k, rerank)
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist_n)
    )
    if rerank <= k:
        return shortlist.filter(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "rank", "approx_dist"
        )
    # refine stage (FAISS-style): exact-rescore ONLY the R-row ADC
    # shortlist against the raw vectors — full floats are read for
    # R x |queries| rows total, never the corpus; recall approaches
    # exact as R grows while the scan stays codes-only
    assert corpus is not None  # validated at entry
    qside = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q_vec")
    )
    cside = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_c_vec")
    )
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(cside, "neighbor_id")
        .join(F.broadcast(qside), "query_id")
        .withColumn("cosine_sim", cosine(F.col("_q_vec"), F.col("_c_vec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def semdedup_prune(
    corpus: DataFrame,
    k: int = 8,
    threshold: float = 0.9,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    max_cell_rows: int = 2_000_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication scoped to k-means cells. Embeddings cluster into
    ``k`` cells; ONLY within a cell are pairwise cosines examined, so
    the quadratic pair search is bounded by the largest cell instead
    of the corpus — the property that makes embedding dedup feasible
    at 100 TB (grow ``k`` with the corpus to hold cell sizes flat; a
    cell above ``max_cell_rows`` raises rather than silently running
    a corpus-scale quadratic).

    Within a cell, members are scanned in keep-priority order
    (centroid similarity ASC, id — the paper's keep-the-LOW-
    centroid-similarity convention, which preserved diversity best in
    their ablations): a member is kept if its max cosine to the
    already-kept set is <= ``threshold``, else dropped with
    ``dup_of`` = the kept member it matched most strongly.

    Returns ``(id_col, cluster_id, kept, dup_of, max_kept_sim)``:
    ``dup_of`` is NULL for kept rows, ``max_kept_sim`` is the max
    cosine to previously-kept cell members (NULL for the first member
    of a cell), rounded to the repo's 6-dp derived-double convention.

    The per-cell scan is one applyInPandas over the cell grain — a
    single shuffle by cluster_id; the greedy loop is numpy matmuls
    against the growing kept matrix, Arrow-batched, never row-at-a-
    time Python.
    """
    import numpy as np
    import pandas as pd

    assigned, _ = kmeans_clusters(
        corpus, k=k, seed=seed, id_col=id_col, vec_col=vec_col,
        max_iter=max_iter,
    )
    cells = corpus.select(id_col, vec_col).join(assigned, id_col)

    out_schema = (
        f"{id_col} long, cluster_id int, kept boolean, "
        f"dup_of long, max_kept_sim double"
    )

    def prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cell_rows:
            raise ValueError(
                f"semdedup cell {int(pdf['cluster_id'].iloc[0])} has {n} "
                f"rows > max_cell_rows={max_cell_rows}; increase k so "
                "cells stay bounded (SemDeDup scales k with corpus size)"
            )
        order = np.lexsort(
            (pdf[id_col].to_numpy(), pdf["centroid_sim"].to_numpy())
        )
        ids = pdf[id_col].to_numpy()[order]
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()[order]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cosine contributes 0
        mat = mat / norms[:, None]
        # preallocated kept-rows buffer, matmul against a VIEW of it:
        # fancy-indexing mat[kept_rows] per iteration copies the whole
        # kept matrix each step — O(n²·d) memory traffic on a mostly-
        # kept cell (ADVICE r7). The buffer grows geometrically, rows
        # are appended once, and each scan reads kept_buf[:m] in place.
        kept = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        max_sim = np.full(n, np.nan)
        kept_buf = np.empty((min(n, 256), mat.shape[1]))
        kept_ids = np.empty(n, dtype=np.int64)
        m = 0
        for i in range(n):
            if m:
                sims = kept_buf[:m] @ mat[i]
                j = int(np.argmax(sims))
                max_sim[i] = float(sims[j])
                if sims[j] > threshold:
                    dup_of[i] = kept_ids[j]
                    continue
            kept[i] = True
            if m == len(kept_buf):
                kept_buf = np.concatenate(
                    [kept_buf, np.empty_like(kept_buf)], axis=0
                )
            kept_buf[m] = mat[i]
            kept_ids[m] = ids[i]
            m += 1
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": np.full(n, int(pdf["cluster_id"].iloc[0]),
                                      dtype=np.int32),
                "kept": kept,
                "dup_of": [None if d < 0 else int(d) for d in dup_of],
                "max_kept_sim": [
                    None if np.isnan(s) else round(float(s), 6)
                    for s in max_sim
                ],
            }
        )

    return cells.groupBy("cluster_id").applyInPandas(prune_cell, out_schema)


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 parity — seedless, and identically
    computable in SQL, which is what makes the projection
    value-oracle-able."""
    import hashlib

    return 1 if hashlib.md5(f"{i}:{j}".encode()).digest()[-1] % 2 == 0 else -1


def jl_sign_matrix(dim: int, k: int) -> list[list[int]]:
    """The dense ±1 Achlioptas projection matrix (dim × k), derived
    from md5 — a driver-side literal of dim·k ints, never data."""
    return [[_jl_sign(i, j) for j in range(k)] for i in range(dim)]


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    dim: int | None = None,
    keep: list[str] | None = None,
    method: str = "arrow",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction by a dense ±1
    sign matrix (Achlioptas, JCSS 2003): proj_j = Σ_i x_i · s_ij with
    s_ij = ±1 from md5 parity. Distances are preserved within (1±ε)
    with k = O(ln n / ε²) — the cheap pre-ANN compression when PCA's
    data-dependent fit is overkill or must not drift between runs.

    Scale shape: the matrix is a driver-side literal (dim·k ints),
    the projection is per-row — zero shuffles, zero state,
    embarrassingly parallel in ROWS at any corpus size. In output
    DIMENSIONS the two methods differ:

    - ``method="arrow"`` (default, the engine path): one Arrow-batched
      accumulation per batch that adds input dimensions one at a time
      (``acc += X[:, i] · S[i]``), i.e. the SAME left-associated IEEE
      double additions per coordinate as the SQL form — bit-identical
      output — but as dim numpy vector ops instead of a dim·k-node
      expression tree. Plan size is O(1) in dim·k.
    - ``method="sql"``: each coordinate as an EXPLICIT left-associated
      sum of x_i·(±1) expression nodes. This is the form a SQL oracle
      replays bit-for-bit, and what :func:`jl_project_sql` emits for
      DuckDB — but the plan has dim·k nodes, so codegen/compile time
      dominates small inputs and explodes at common embedding dims
      (768+; ADVICE r7). Keep it for oracle replay and parity tests.

    Both methods: multiplication by ±1 and double addition in a fixed
    order are bit-exact across engines, so the only rounding is the
    final 6-dp quantization (applied Spark-side in both paths) and the
    DuckDB SQL twin replays the result bit-for-bit (no seeds, no RNG
    state, no float-order ambiguity). Bit-parity between the two
    methods is pytest-gated.

    Output: ``keep`` columns (default: all non-vector columns) plus
    ``p0..p{k-1}`` DECIMAL(18,6) coordinate columns.
    """
    if method not in ("arrow", "sql"):
        raise ValueError(f"method must be 'arrow' or 'sql', got {method!r}")
    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if not row:
            raise ValueError("cannot infer dim from an empty frame")
        dim = int(row[0]["d"])
    signs = jl_sign_matrix(dim, k)
    base = keep if keep is not None else [
        c for c in df.columns if c != vec_col
    ]
    if method == "sql":
        cols = []
        for j in range(k):
            term = None
            for i in range(dim):
                x = F.element_at(F.col(vec_col), i + 1).cast("double")
                t = x if signs[i][j] == 1 else -x
                term = t if term is None else term + t
            cols.append(F.round(term, 6).cast("decimal(18,6)").alias(f"p{j}"))
        return df.select(*base, *cols)

    from pyspark.sql.types import ArrayType, DoubleType

    S = np.asarray(signs, dtype=np.float64)  # (dim, k)
    want_dim = dim

    @F.pandas_udf(ArrayType(DoubleType()))
    def jl_proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack([np.asarray(e, dtype=np.float64) for e in v])
        if X.shape[1] != want_dim:
            raise ValueError(
                f"random_project: vector dim {X.shape[1]} != declared {want_dim}"
            )
        acc = np.zeros((len(X), S.shape[1]), dtype=np.float64)
        # dim sequential adds -> per-coordinate left-associated IEEE
        # order, bit-identical to the SQL expression chain
        for i in range(want_dim):
            acc += X[:, i : i + 1] * S[i]
        return pd.Series(list(acc))

    proj = df.withColumn("_jl", jl_proj(F.col(vec_col)))
    cols = [
        F.round(F.element_at(F.col("_jl"), j + 1), 6)
        .cast("decimal(18,6)")
        .alias(f"p{j}")
        for j in range(k)
    ]
    return proj.select(*base, *cols)


def jl_project_sql(
    table: str,
    vec: str,
    dim: int,
    k: int,
    id_col: str = "vec_id",
) -> str:
    """The DuckDB replay of ``random_project`` for oracle use: the
    same literal sign matrix, the same left-associated term order."""
    signs = jl_sign_matrix(dim, k)
    outs = []
    for j in range(k):
        terms = " + ".join(
            f"{'' if signs[i][j] == 1 else '-'}{vec}[{i + 1}]::DOUBLE"
            for i in range(dim)
        )
        outs.append(f"CAST(ROUND({terms}, 6) AS DECIMAL(18,6)) AS p{j}")
    return f"SELECT {id_col}, {', '.join(outs)} FROM {table}"


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> dict:
    """Distributed PCA fit via moment partials: each partition reduces
    its vectors to (n, Σx, ΣxxT) — O(d²) floats — in ONE pass with a
    numpy matmul per Arrow batch; the driver folds the partials IN
    PARTITION ORDER (deterministic float summation) and runs the d×d
    eigendecomposition locally. This is the textbook scale shape for
    tall-skinny PCA: the 100 TB corpus is touched once, the shuffle
    carries partitions × d² doubles, and the eigensolve is a
    milliseconds-sized driver problem (d = embedding dim, not n).

    Eigenvectors are sign-normalized (largest-magnitude component
    positive) so the fit is deterministic run-to-run; numerical parity
    with single-node numpy PCA is pytest-gated. Returns a dict with
    ``mean`` (d), ``components`` (k×d, variance-descending),
    ``explained_var`` (k), ``total_var``.
    """
    from pyspark import TaskContext

    def partials(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s = X.sum(0) if s is None else s + X.sum(0)
            gg = X.T @ X
            g = gg if g is None else g + gg
        if n:
            ctx = TaskContext.get()
            yield pd.DataFrame(
                {
                    "pid": [ctx.partitionId() if ctx else 0],
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    rows = sorted(
        df.select(vec_col).mapInPandas(
            partials, "pid int, n long, s array<double>, g array<double>"
        ).collect(),
        key=lambda r: r["pid"],
    )
    if not rows:
        raise ValueError("pca_fit on an empty frame")
    d = len(rows[0]["s"])
    n_tot, s_tot, g_tot = 0, np.zeros(d), np.zeros((d, d))
    for r in rows:
        n_tot += r["n"]
        s_tot += np.array(r["s"])
        g_tot += np.array(r["g"]).reshape(d, d)
    mean = s_tot / n_tot
    cov = g_tot / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    for i in order:
        c = v[:, i]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append(c.tolist())
    return {
        "mean": mean.tolist(),
        "components": comps,
        "explained_var": [max(float(w[i]), 0.0) for i in order],
        "total_var": float(np.clip(w, 0, None).sum()),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted components: (x − mean) · Wᵀ as
    one Arrow-batched numpy matmul per batch — map-side only, the
    model rides the closure (k·d doubles), no shuffle, no state."""
    W = np.array(model["components"])  # k × d
    mu = np.array(model["mean"])

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(list((X - mu) @ W.T))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


# ---------------------------------------------------------------------------
# incremental embedding near-dup: persisted LSH index, O(batch) admission
# ---------------------------------------------------------------------------


def emb_neardup_index_write(
    emb: DataFrame,
    path: str,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 6,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_occupancy: int = 16,
    expected_final_count: int | None = None,
    extra_planes: int = 4,
    max_resplit_rounds: int = 2,
) -> None:
    """Persist the hyperplane-LSH near-dup index so a continuously
    ingested corpus admits each batch in O(batch) — the embedding
    sibling of :func:`dedup.minhash_index_write`. The plane count is
    FIXED AT BUILD TIME from ``expected_final_count`` (default: the
    current corpus size): auto-deriving per batch would re-key the
    whole index on every insert. Size the index for the corpus you
    expect, not the corpus you have.

    Layout under ``path``:
    - ``keys/``   — (id, table, bucket) with the FULL packed
      ``n_planes + extra_planes·rounds``-bit key, partitioned by
      table (ids + 8-byte keys, never vectors);
    - ``vecs/``   — (id, v) for exact-cosine candidate verification;
    - ``counts/`` — (table, bucket, n) per finest key: the occupancy
      deltas batches merge against WITHOUT rescanning the corpus;
    - ``meta.json`` — every key-derivation parameter, so a batch
      reproduces bit-identical keys.
    """
    import json as _json
    import os as _os

    if n_planes is None:
        n = (
            expected_final_count
            if expected_final_count is not None
            else emb.count()
        )
        n_planes = neardup_planes_for(n, target_occupancy)
    total_bits = n_planes + extra_planes * max_resplit_rounds
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    tagged = _tag_buckets(
        v, "v", dim, total_bits, n_tables, seed, stride=31
    ).select("id", "table", "bucket")
    tagged.write.partitionBy("table").mode("overwrite").parquet(
        f"{path}/keys"
    )
    v.write.mode("overwrite").parquet(f"{path}/vecs")
    (
        tagged.groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(f"{path}/counts")
    )
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w", encoding="utf-8") as fh:
        _json.dump(
            {
                "dim": dim, "n_planes": n_planes, "n_tables": n_tables,
                "seed": seed, "extra_planes": extra_planes,
                "max_resplit_rounds": max_resplit_rounds,
            },
            fh,
        )


def emb_neardup_incremental(
    new_emb: DataFrame,
    index_path: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs for a NEW embedding batch against an indexed
    corpus (:func:`emb_neardup_index_write`) plus within the batch,
    WITHOUT re-tagging the corpus: (id_a, id_b, cosine) with id_a <
    id_b and at least one side in the batch. Index and batch ids must
    be disjoint.

    Scale shape — the batch, not the corpus, pays:
    - only the batch is tagged (one Arrow matmul over O(batch) rows);
    - bucket occupancy merges the stored per-bucket ``counts`` with
      the batch's own (both count frames, no corpus scan), restricted
      to the base-level buckets the batch touches;
    - the corpus-side ``keys`` scan is pruned MAP-SIDE by a broadcast
      of those touched base buckets before any shuffle — untouched
      index regions are never read past the filter;
    - level re-split assignment is the same hierarchy as the batch
      operator (same packed keys, same masks), computed on the merged
      counts so index and batch agree on every bucket's level;
    - candidate verification joins the (small) pair set against the
      stored ``vecs`` — vectors enter exactly once per pair side.

    Oversize policy matches :func:`lsh_cosine_neardup_pairs`: a
    touched bucket still over ``max_bucket`` at the deepest level
    raises (run exact dedup first / rebuild with more planes).
    """
    import json as _json

    with open(f"{index_path}/meta.json", encoding="utf-8") as fh:
        meta = _json.load(fh)
    n_planes = meta["n_planes"]
    extra = meta["extra_planes"]
    rounds = meta["max_resplit_rounds"]
    spark = new_emb.sparkSession

    def mask(r: int) -> int:
        return (1 << (n_planes + extra * r)) - 1

    b = new_emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # checkpointed, not lazy (r14): the tagged batch feeds FOUR
    # subtrees (touched buckets, batch counts, both pair sides) and
    # unpinned the Arrow-matmul tagging re-executed once per subtree
    # (the dumped plan carried 64 ArrowEvalPython nodes). A
    # localCheckpoint holds the O(batch) (id, table, bucket) rows with
    # no cache entry and no path lineage — nothing for a later index
    # append to recache (the minhash incremental lesson).
    b_tagged = _tag_buckets(
        b, "v", meta["dim"], n_planes + extra * rounds, meta["n_tables"],
        meta["seed"], stride=31,
    ).select("id", "table", "bucket").localCheckpoint(eager=True)

    base_key = F.col("bucket").bitwiseAND(F.lit(mask(0)))
    touched = (
        b_tagged.select("table", base_key.alias("_b0")).distinct()
    )
    # map-side prune of the index: only rows sharing a touched BASE
    # bucket can pair with the batch at any refinement level
    ik = spark.read.parquet(f"{index_path}/keys")
    idx_keys = ik.join(
        F.broadcast(touched),
        (ik["table"] == touched["table"])
        & (ik["bucket"].bitwiseAND(F.lit(mask(0))) == touched["_b0"]),
    ).select(ik["id"], ik["table"], ik["bucket"])

    # merged occupancy for touched buckets only: stored counts + batch
    ic = spark.read.parquet(f"{index_path}/counts")
    idx_counts = ic.join(
        F.broadcast(touched),
        (ic["table"] == touched["table"])
        & (ic["bucket"].bitwiseAND(F.lit(mask(0))) == touched["_b0"]),
    ).select(ic["table"], ic["bucket"], ic["n"])
    b_counts = b_tagged.groupBy("table", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    cnts = (
        idx_counts.unionByName(b_counts)
        .groupBy("table", "bucket")
        .agg(F.sum("n").alias(f"n{rounds}"))
    )
    for r in range(rounds - 1, -1, -1):
        w = Window.partitionBy(
            "table", F.col("bucket").bitwiseAND(F.lit(mask(r)))
        )
        cnts = cnts.withColumn(f"n{r}", F.sum(f"n{rounds}").over(w))
    lvl = F.lit(None).cast("int")
    for r in range(rounds, -1, -1):
        ok = F.col(f"n{r}") <= max_bucket
        lvl = F.when(ok, F.lit(r)).otherwise(lvl)
    assign = cnts.select("table", "bucket", lvl.alias("lvl"))

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _guard_lvl(lv: pd.Series, bkt: pd.Series) -> pd.Series:
        if lv.isna().any():
            bad = bkt[lv.isna()].iloc[0]
            raise ValueError(
                "emb_neardup_incremental: touched bucket still exceeds "
                f"max_bucket={max_bucket} at the deepest re-split level "
                f"(finest bucket key {int(bad)}) — exact-dedup first or "
                "rebuild the index with more planes"
            )
        return lv.astype("int32")

    # checkpointed (r14): assign feeds both pair sides — unpinned, the
    # merged-occupancy window chain, the pruned index counts scan and
    # the guard UDF all ran twice per action; the frame is O(touched
    # buckets). Eager, so the oversize guard fires here, before any
    # pair work.
    assign = assign.withColumn("lvl", _guard_lvl("lvl", "bucket")).withColumn(
        "lbucket",
        F.col("bucket").bitwiseAND(
            F.expr(f"shiftleft(1L, lvl * {extra} + {n_planes}) - 1")
        ),
    ).localCheckpoint(eager=True)

    def leveled(keys: DataFrame) -> DataFrame:
        return keys.join(assign, ["table", "bucket"]).select(
            "id", "table", "lvl", "lbucket"
        )

    side_a = leveled(idx_keys.unionByName(b_tagged))
    side_b = leveled(b_tagged)
    pairs = (
        side_a.alias("a")
        .join(
            side_b.alias("b"),
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.lvl") == F.col("b.lvl"))
            & (F.col("a.lbucket") == F.col("b.lbucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = spark.read.parquet(f"{index_path}/vecs").unionByName(b)
    return (
        pairs.join(vecs.select(F.col("id").alias("id_a"),
                               F.col("v").alias("v_a")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"),
                          F.col("v").alias("v_b")), "id_b")
        .select(
            "id_a", "id_b",
            cosine(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def emb_neardup_index_insert(
    new_emb: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit a screened batch into the index: append its keys and
    vectors, fold its counts into the stored occupancy table. Keys
    are derived with the index's OWN frozen parameters, so the index
    never re-tags history (O(batch) like the query path)."""
    import json as _json

    with open(f"{index_path}/meta.json", encoding="utf-8") as fh:
        meta = _json.load(fh)
    spark = new_emb.sparkSession
    b = new_emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    tagged = _tag_buckets(
        b, "v", meta["dim"],
        meta["n_planes"] + meta["extra_planes"] * meta["max_resplit_rounds"],
        meta["n_tables"], meta["seed"], stride=31,
    ).select("id", "table", "bucket")
    tagged.write.partitionBy("table").mode("append").parquet(
        f"{index_path}/keys"
    )
    b.write.mode("append").parquet(f"{index_path}/vecs")
    merged = (
        spark.read.parquet(f"{index_path}/counts")
        .unionByName(
            tagged.groupBy("table", "bucket").agg(
                F.count(F.lit(1)).alias("n")
            )
        )
        .groupBy("table", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    # counts are bucket-granular (no ids): small enough to rewrite;
    # stage then swap so a crash never leaves a half-written table
    merged.cache().count()
    merged.write.mode("overwrite").parquet(f"{index_path}/counts_next")
    import shutil as _shutil

    _shutil.rmtree(f"{index_path}/counts")
    _shutil.move(f"{index_path}/counts_next", f"{index_path}/counts")
    merged.unpersist()
