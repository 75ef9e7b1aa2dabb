"""Shared within-batch rejection policy for the streaming admission
gates (media_admission / text_admission / paired admission).

Policy — ONE REPRESENTATIVE PER NEAR-DUP COMPONENT (ADVICE r10): the
batch's near-pair graph (restricted to docs that survived the corpus
probe) is resolved with connected components; the smallest id in each
component is admitted, every other member is rejected with the
canonical as ``dup_of``. This replaces the r10 "any smaller-id
near-dup rejects" rule, which was non-greedy over chains: with A~B
and B~C (A not ~ C), it rejected C with dup_of=B even though B itself
was rejected — no admitted doc was a near-duplicate of C, and the
provenance pointed at a rejected row. Under the component rule the
invariant is mechanical: EVERY rejected row's ``dup_of`` is an
ADMITTED doc (the component canonical) or an index id. Chains still
over-delete relative to greedy first-wins (C rejects against A even
without a direct A~C pair — the conservative choice, and exactly the
semantics of the batch path's ``dedup.drop_near_duplicates``); the
metric column carries the DIRECT pair's value when the member is
directly paired with its canonical, NULL on transitive chains.

Scale: the edge list is micro-batch-sized by construction (pairs
among one micro-batch's probe survivors — the corpus never enters),
so the components run as a DRIVER-SIDE union-find over the collected
edges. Running the distributed log-round star contraction here (as
r10/r11 did) scheduled several Spark jobs per batch over a ≤thousands-
edge graph — measured 5-7s of pure job overhead per paired-gate batch
at bench scale. The corpus-scale component machinery
(dedup.neardup_components) is unchanged and still serves the batch
dedup family; a batch that outgrows the localization contract fails
loudly (MAX_LOCAL_EDGES) rather than silently OOMing the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

# Localized (driver-side) edge-list ceiling: admission micro-batches
# are trigger-bounded (thousands of items -> at most low-millions of
# survivor edges); past this the caller's batch sizing is wrong, not
# this policy (see the guard below).
MAX_LOCAL_EDGES = 2_000_000



def phase_timer(what: str):
    """Per-phase wall timings on stderr when SPARK_GRAFT_GATE_TIMINGS
    is set (bench/diagnosis only): returns mark(label) stamping the
    delta since the previous mark — the gates call it at their action
    boundaries, so the printout attributes a batch's wall to probe /
    verify / writes / commit without touching the plans."""
    import os
    import sys
    import time

    if not os.environ.get("SPARK_GRAFT_GATE_TIMINGS"):
        return lambda label: None
    t0 = time.perf_counter()
    last = [t0]

    def mark(label: str) -> None:
        now = time.perf_counter()
        print(
            f"[gate-timing {what}] {label}: +{now - last[0]:.2f}s "
            f"(total {now - t0:.2f}s)",
            file=sys.stderr, flush=True,
        )
        last[0] = now

    return mark


def local_id_frame(spark, ids, col: str = "doc_id") -> DataFrame:
    """One-slice localized DataFrame of a (batch-sized) id list — the
    gates' insert sets. Localizing matters twice over: (a) a default
    createDataFrame scatters tiny lists over defaultParallelism
    partitions (see merge.append's n_files note), and (b) keeping the
    insert sets LAZY ties their plans to the index parquet paths, so
    the first index append invalidates them (Spark recacheByPath) and
    every later append re-runs the whole probe subtree against the
    GROWN index — measured 5-7s extra per paired-gate batch at sf0.1
    (VERDICT r12 item 4)."""
    if not ids:
        return spark.createDataFrame([], f"{col} long")
    return spark.createDataFrame(
        spark.sparkContext.parallelize([(int(i),) for i in ids], 1),
        f"{col} long",
    )


def one_slice(spark, rows: list, schema) -> DataFrame:
    """One-partition localized DataFrame of batch-sized rows (the
    gates' insert/decision sets — a default createDataFrame scatters
    tiny lists over defaultParallelism partitions; see
    local_id_frame's note)."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def collect_text_probe_outputs(index_dups, self_ids, sig, bk, occ):
    """ONE union-tagged collect of the text probe's five
    decision-sized outputs, replacing five serial driver actions
    (guide §1.2 — each collect is a full job round-trip of ~0.1-0.3s
    scheduling against decision-sized data). The union's branches read
    the probe's already-persisted frames, so the single job's long
    pole is the exact-Jaccard verify that the first of the five
    collects always paid anyway; per-branch row order is preserved
    (Union concatenates partitions in branch order), so downstream
    row-iteration order — and with it the decision ledger's file
    content — is unchanged.

    Returns ``(dup_rows, self_set, sig_rows, bk_rows, occ_rows)``:
    dup_rows ``[(doc_id, dup_of, jaccard)]``, self_set ``{doc_id}``,
    sig_rows ``[(doc_id, hs)]``, bk_rows ``[(doc_id, band, bucket)]``,
    occ_rows ``[(band, bucket, n)]``.
    """
    nl = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    na = F.lit(None).cast("array<long>")
    tagged = (
        index_dups.select(
            F.lit("d").alias("_t"), F.col("doc_id").alias("_id"),
            F.col("dup_of").alias("_l1"), nl.alias("_l2"),
            F.col("jaccard").alias("_d"), na.alias("_hs"),
        )
        .union(self_ids.select(F.lit("s"), F.col("doc_id"), nl, nl, nd, na))
        .union(sig.select(F.lit("g"), F.col("doc_id"), nl, nl, nd,
                          F.col("hs")))
        .union(bk.select(F.lit("b"), F.col("doc_id"),
                         F.col("band").cast("long"), F.col("bucket"),
                         nd, na))
        .union(occ.select(F.lit("o"), F.col("_n"),
                          F.col("band").cast("long"), F.col("bucket"),
                          nd, na))
    )
    dup_rows: list = []
    self_set: set = set()
    sig_rows: list = []
    bk_rows: list = []
    occ_rows: list = []
    for t, _id, l1, l2, d, hs in tagged.collect():
        if t == "d":
            dup_rows.append((_id, l1, d))
        elif t == "s":
            self_set.add(_id)
        elif t == "g":
            sig_rows.append((_id, hs))
        elif t == "b":
            bk_rows.append((_id, int(l1), l2))
        else:
            occ_rows.append((int(l1), l2, _id))
    return dup_rows, self_set, sig_rows, bk_rows, occ_rows


def round6(x: float) -> float:
    """Driver-side twin of ``F.round(col, 6)`` on a double: Spark
    rounds through ``BigDecimal.valueOf(x).setScale(6, HALF_UP)``,
    i.e. HALF_UP over the shortest decimal representation — NOT
    Python's banker's ``round``. The gates' localized within-batch
    metrics must round identically to the batch operators' plans or
    stream==batch parity (and the value oracles) drift by one ulp on
    ties."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"),
                                  rounding=ROUND_HALF_UP)
    )


def local_jaccard(ha, hb) -> float | None:
    """Driver-side twin of dedup._exact_jaccard's expression over two
    hashed-shingle arrays: ``size(array_intersect)`` counts DISTINCT
    common elements while ``size(hs)`` counts the raw array length —
    replicated exactly (a NULL side or a 0/0 division is NULL in the
    plan, None here)."""
    if ha is None or hb is None:
        return None
    inter = len(set(ha) & set(hb))
    union = len(ha) + len(hb) - inter
    if union == 0:
        return None
    return inter / union


def local_text_within(sig_rows, bk_rows, hot_bb, threshold) -> list:
    """Driver-side twin of _text_probe's within-batch half for ONE
    micro-batch: candidates are pairs sharing any non-hot
    (band, bucket) LSH key, verified with exact Jaccard over the
    hashed shingle sets. ``sig_rows`` = collected (doc_id, hs[, ...])
    rows, ``bk_rows`` = collected (doc_id, band, bucket) rows,
    ``hot_bb`` = the index-occupancy hot (band, bucket) set. Returns
    ``[(doc_a, doc_b, jaccard)]`` with doc_a < doc_b — the same pair
    set and float values as the distributed plan, without its ~6
    micro-stages of shuffle scheduling per batch (measured ~5s of the
    paired gate's wall at sf0.1). Batch-sized by construction — the
    same localization contract as the decision collect below."""
    from collections import defaultdict

    hs_by = {r[0]: r[1] for r in sig_rows}
    bb = defaultdict(set)
    for d, band, bucket in bk_rows:
        if (band, bucket) in hot_bb:
            continue
        bb[(band, bucket)].add(d)
    cand: set = set()
    for members in bb.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
        if len(cand) > MAX_LOCAL_EDGES:
            raise RuntimeError(
                f"local_text_within: {len(cand)} candidate pairs exceed "
                f"MAX_LOCAL_EDGES={MAX_LOCAL_EDGES}; shrink the "
                "micro-batch (see component_rejects)"
            )
    out = []
    for a, b in cand:
        j = local_jaccard(hs_by.get(a), hs_by.get(b))
        if j is not None and j >= threshold:
            out.append((a, b, j))
    return out


def _rem48_py(u: int, ci: int) -> int:
    """Python twin of multimodal._rem48 over the unsigned 64-bit form."""
    if ci == 0:
        return u >> 16
    if ci == 3:
        return u & ((1 << 48) - 1)
    return (u & ((1 << (16 * ci)) - 1)) | ((u >> (16 * (ci + 1))) << (16 * ci))


def local_phash_within(
    hash_rows,
    max_hamming: int = 3,
    max_bucket: int = 2000,
    on_oversize: str = "raise",
    stats_out: dict | None = None,
    what: str = "local_phash_within",
) -> list:
    """Driver-side twin of multimodal.phash_near_pairs for ONE
    micro-batch's collected ``(id, hash64)`` rows: 16-bit-chunk
    pigeonhole candidates, hot buckets re-split on the four 12-bit
    sub-chunks of the remaining 48 bits, sub-buckets still over
    ``max_bucket`` raise (or drop with counters) — the identical
    policy, pair set and hamming values, minus the per-batch
    shuffle-stage scheduling. Returns ``[(id_a, id_b, hamming)]``
    with id_a < id_b."""
    from collections import defaultdict

    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"chunk banding holds for max_hamming in [0, 3], got {max_hamming}"
        )
    if on_oversize not in ("raise", "drop"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'drop', got {on_oversize!r}"
        )
    rows = [(i, h & 0xFFFFFFFFFFFFFFFF) for i, h in hash_rows]
    buckets = defaultdict(list)
    for i, u in rows:
        for ci in range(4):
            buckets[(ci, (u >> (16 * ci)) & 0xFFFF)].append((i, u))
    pairs: dict = {}

    def emit(members) -> None:
        ms = sorted(members)
        for x in range(len(ms)):
            ia, ha = ms[x]
            for y in range(x + 1, len(ms)):
                ib, hb = ms[y]
                d = bin(ha ^ hb).count("1")
                if d <= max_hamming:
                    pairs[(ia, ib) if ia < ib else (ib, ia)] = d
        if len(pairs) > MAX_LOCAL_EDGES:
            raise RuntimeError(
                f"{what}: {len(pairs)} within-batch pairs exceed "
                f"MAX_LOCAL_EDGES={MAX_LOCAL_EDGES}; shrink the micro-batch"
            )

    hot_buckets = 0
    dropped_sb = dropped_rows = 0
    for (ci, _cv), members in buckets.items():
        if len(members) <= max_bucket:
            emit(members)
            continue
        hot_buckets += 1
        sub = defaultdict(list)
        for i, u in members:
            rem = _rem48_py(u, ci)
            for s in range(4):
                sub[(s, (rem >> (12 * s)) & 0xFFF)].append((i, u))
        for sm in sub.values():
            if len(sm) > max_bucket:
                if on_oversize == "raise":
                    raise ValueError(
                        f"{what}: banding bucket exceeds "
                        f"max_bucket={max_bucket} (hot chunk value) — "
                        "exact-dedup the media first, raise max_bucket, "
                        "or pass on_oversize='drop'"
                        f" (observed bucket size {len(sm)})"
                    )
                dropped_sb += 1
                dropped_rows += len(sm)
                continue
            emit(sm)
    if on_oversize == "drop" and stats_out is not None:
        stats_out["hot_buckets"] = hot_buckets
        stats_out["dropped_subbuckets"] = dropped_sb
        stats_out["dropped_rows"] = dropped_rows
    return [(a, b, d) for (a, b), d in pairs.items()]


def resolve_local_components(rows: list, n_metrics: int) -> list:
    """Union-find with min-id rooting over an already-localized edge
    list ``[(a, b, *metrics)]`` — the core of :func:`component_rejects`
    shared with the gates' fully-local decision paths. Returns one
    ``(node, canon, *metrics)`` tuple per NON-canonical member; the
    metrics carry the DIRECT (canon, member) edge's values, None on
    transitive chains."""
    if len(rows) > MAX_LOCAL_EDGES:
        raise RuntimeError(
            f"resolve_local_components: {len(rows)} within-batch near-dup "
            f"edges exceed MAX_LOCAL_EDGES={MAX_LOCAL_EDGES}. The "
            "admission gates localize the batch's survivor edge list on "
            "the driver; shrink the micro-batch (maxFilesPerTrigger / "
            "maxOffsetsPerTrigger) or pre-dedup the feed."
        )
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    direct = {(r[0], r[1]): tuple(r)[2:] for r in rows}
    nulls = (None,) * n_metrics
    out = []
    for node in parent:
        canon = find(node)
        if node == canon:
            continue  # the canonical is admitted, never emitted
        out.append((node, canon) + direct.get((canon, node), nulls))
    return out


def component_rejects(
    pairs: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    metric_col: str,
    extra_metric_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id_col, dup_of, metric_col, *extra_metric_cols)`` — one row
    per NON-canonical member of each within-batch near-dup component.
    ``pairs`` is the batch's survivor edge list (``a_col`` < ``b_col``
    plus metric columns: hamming, jaccard, matched_frames+shift, ...);
    the canonical (minimum id, always admitted) is never emitted. The
    metric columns carry the direct pair's values against the
    canonical, NULL for transitive members."""
    metrics = (metric_col, *extra_metric_cols)
    # The edge list is LOCALIZED first: it is decision-sized (pairs
    # among one micro-batch's probe survivors), and a distributed
    # component loop's repeated self-joins would otherwise drag the
    # full hash/signature UDF lineage through every round.
    spark = pairs.sparkSession
    narrowed = pairs.select(
        F.col(a_col).alias("id_a"),
        F.col(b_col).alias("id_b"),
        *[F.col(m) for m in metrics],
    )
    rows = [tuple(r) for r in narrowed.collect()]
    # max-batch guard (VERDICT r11) + union-find with min-id rooting
    # (each final root IS its component's minimum id — exactly
    # neardup_components' canonical, without per-batch Spark jobs):
    # shared with the gates' fully-local decision paths
    out = resolve_local_components(rows, len(metrics))

    fields = narrowed.schema.fields
    schema = StructType(
        [
            StructField(id_col, fields[1].dataType, True),
            StructField("dup_of", fields[0].dataType, True),
            *[StructField(f.name, f.dataType, True) for f in fields[2:]],
        ]
    )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), schema
    )
