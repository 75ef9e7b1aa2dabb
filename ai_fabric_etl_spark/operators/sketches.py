"""Mergeable-sketch aggregation: HLL partials that roll up without
re-scanning the base data.

At 100 TB, "unique users this week" cannot be COUNT(DISTINCT) over the
raw scan every time: the distinct state itself is the bottleneck (one
shuffle of every key). The scalable pattern is the one every large
OLAP store (Druid/Pinot/BigQuery) uses — build a fixed-size HLL sketch
per partition/day ONCE, persist it, and answer any coarser rollup
(week, month, all-time, any ad-hoc slice union) by merging sketches:
bytes-per-day instead of keys-per-day.

Spark ships the DataSketches HLL family as first-class JVM
expressions (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` — no UDF, codegen-friendly), so the partial →
merge → estimate chain is a plain two-level aggregation here.

The reference's only distinct-count is exact (SURVEY §2.4 A4/A5,
gold_x12_analytics.py:773-787 unique senders/receivers); this module
is the scale path the brief asks to add beyond it, sibling to the
``approx_count_distinct`` variant already gated by a5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_partials(
    df: DataFrame,
    key: str,
    by: list[str],
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch of ``key`` per ``by`` group — the persistable
    partial. lg_k=12 ≈ 2-3 KB per group at ~1.6% relative error."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lg_k)).alias(sketch_col),
        F.count(F.lit(1)).alias("row_count"),
    )


def sketch_merge(
    partials: DataFrame,
    by: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge finer partials to a coarser grain KEEPING the mergeable
    sketch (no estimate), so rollups chain: day → ``sketch_merge`` →
    week → ``sketch_merge`` → month → ``sketch_rollup`` → estimate.
    The output is itself a valid partials frame."""
    agg = [
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
        F.sum("row_count").alias("row_count"),
    ]
    if by:
        return partials.groupBy(*by).agg(*agg)
    return partials.agg(*agg)


def sketch_rollup(
    partials: DataFrame,
    by: list[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge finer partials to a coarser grain (day → week, day →
    total) WITHOUT touching base data: union the sketches, estimate.
    """
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .alias(estimate_col),
        F.sum("row_count").alias("row_count"),
    ]
    if by:
        return partials.groupBy(*by).agg(*agg)
    return partials.agg(*agg)


def misra_gries_partials(
    df: DataFrame,
    col: str,
    k: int = 64,
    count_col: str = "mg_count",
) -> DataFrame:
    """Per-partition Misra–Gries frequency summaries: at most ``k``
    ``(value, lower-bound count)`` rows per partition, built in one
    pass with O(k) memory regardless of the column's cardinality.

    This is the frequent-items sibling of the HLL partials above — the
    sketch every large-scale profiler uses when ``groupBy(col).count()``
    itself is the bottleneck (a shuffle of every distinct value; at
    100 TB a high-cardinality column makes that shuffle the job). Here
    the shuffle carries at most k rows per input partition.

    Guarantees (classic MG, preserved under merge-by-summation per
    Agarwal et al., "Mergeable Summaries", PODS'12): every emitted
    count is a LOWER bound on the true count, the total undercount
    across all values is at most n/(k+1), and therefore any value with
    true frequency > n/(k+1) is guaranteed to survive. When the column
    has at most k distinct values no compression ever fires and the
    summary is EXACT — the driver-gated entry exploits that.

    NULLs are ignored (a null heavy hitter is a data-quality signal
    the profiler reports separately). Implemented with mapInPandas so
    the scan reads only ``col`` (column pruning reaches the parquet
    footer) and each Arrow batch folds in via a vectorized
    value_counts; the counter dict is compressed back to k entries
    whenever it exceeds 8k.
    """
    import pandas as pd

    field = df.schema[col]
    if field.dataType.simpleString() not in ("string",):
        raise ValueError(
            f"misra_gries_partials supports string columns, got "
            f"{col}: {field.dataType.simpleString()}"
        )

    def _compress(counters: dict, limit: int) -> None:
        if len(counters) <= limit:
            return
        # subtract the (limit+1)-th largest count from everyone and
        # drop the non-positive — the standard k-counter decrement,
        # batched
        m = sorted(counters.values(), reverse=True)[limit]
        for v in list(counters):
            c = counters[v] - m
            if c > 0:
                counters[v] = c
            else:
                del counters[v]

    def gen(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            _compress(counters, 8 * k)
        _compress(counters, k)
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), count_col: list(counters.values())}
            )

    return df.select(col).mapInPandas(
        gen, schema=f"{col} string, {count_col} long"
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float,
    k: int = 64,
) -> DataFrame:
    """Values of ``col`` whose frequency is at least ``min_share`` of
    the rows, with (lower-bound) counts and shares, heaviest first.

    Two-level plan: MG partials per partition (≤ k rows each), one
    small groupBy merge, then a broadcast of the single-row total for
    the share filter — no shuffle ever carries per-value rows beyond
    k × partitions. Because MG counts are LOWER bounds undercounting
    by at most n/(k+1) in total, the filter runs at
    ``(min_share − 1/(k+1))·n``: every value with true share ≥
    min_share is then GUARANTEED to surface (ε-approximate
    heavy-hitter semantics — a threshold with no slack would drop a
    qualifying value whose count the compression shaved just below
    it), at the price of possibly including values whose true share
    is within 1/(k+1) below min_share. In the exact regime (distinct
    ≤ k) counts are exact and the slack only widens the reported set
    deterministically."""
    if k <= 1.0 / min_share:
        raise ValueError(
            f"k={k} too small for min_share={min_share}: need k > 1/min_share "
            f"so no qualifying value can be compressed away"
        )
    partials = misra_gries_partials(df, col, k=k)
    merged = partials.groupBy(col).agg(F.sum("mg_count").alias("hh_count"))
    # share denominator = non-null rows, matching the partials' dropna
    total = df.select(col).agg(F.count(F.col(col)).alias("_n"))
    slack = 1.0 / (k + 1)
    return (
        merged.join(F.broadcast(total))
        .filter(
            F.col("hh_count") >= F.lit(min_share - slack) * F.col("_n")
        )
        .select(
            col,
            F.col("hh_count"),
            F.round(F.col("hh_count") / F.col("_n"), 6).alias("hh_share"),
        )
        .orderBy(F.col("hh_count").desc(), F.col(col))
    )


def relative_error_ok(
    estimate: Column, exact: Column, rel_tol: float
) -> Column:
    """|estimate - exact| / exact <= rel_tol (guard against exact=0)."""
    return (
        F.abs(estimate.cast("double") - exact.cast("double"))
        <= F.greatest(exact.cast("double") * rel_tol, F.lit(1.0))
    )


def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Bucket of ``value`` in CMS row ``row``: the first 15 hex digits
    of md5(f"{row}:{value}") mod width — deterministic, seedless, and
    replayable in ANSI SQL (('0x' || substr(md5(..),1,15))::BIGINT %
    width), which is what makes the whole sketch value-oracle-able."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), value)), 1, 15),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_table(
    df: DataFrame, col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) of ``col`` as a
    ``(cms_row, cms_bucket, cms_count)`` table — at most depth·width
    rows regardless of input size.

    The frequency sibling that answers POINT queries where Misra–Gries
    answers top-k: ``estimate(v) = min over rows of bucket count`` is
    always ≥ the true count, and exceeds it by more than ε·n
    (ε = e/width) with probability at most e^−depth. Everything is
    JVM codegen: per-row bucket ids from md5 expressions, one
    aggregation whose map-side partial combine means the shuffle
    carries at most depth·width rows per input partition — the scan
    dominates at 100 TB, exactly like the HLL/MG/MP partials above.
    Mergeable by bucket-wise summation (``cms_merge``), so per-day
    sketches roll up to any coarser grain without rescanning.

    NULLs are ignored (SQL aggregate semantics). Values hash via their
    canonical string form, so the oracle replays bit-for-bit.
    """
    v = F.col(col).cast("string")
    buckets = F.array(*[_cms_bucket(v, i, width) for i in range(depth)])
    return (
        df.filter(v.isNotNull())
        .select(F.posexplode(buckets).alias("cms_row", "cms_bucket"))
        .groupBy("cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).alias("cms_count"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge CMS tables built with the same (width, depth) by
    bucket-wise summation — the output is itself a valid sketch, so
    rollups chain like ``sketch_merge``."""
    it = iter(tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    return u.groupBy("cms_row", "cms_bucket").agg(
        F.sum("cms_count").alias("cms_count")
    )


def cms_estimate(
    table: DataFrame,
    values: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
    estimate_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query frequency estimates for every row of ``values``:
    recompute the depth bucket ids, join the ≤ depth·width-row sketch
    (broadcast — it is bytes, never a shuffle), take the min across
    rows. A value whose buckets were never touched estimates 0."""
    v = F.col(col).cast("string")
    buckets = F.array(*[_cms_bucket(v, i, width) for i in range(depth)])
    pos = values.select(
        col, F.posexplode(buckets).alias("cms_row", "cms_bucket")
    )
    return (
        pos.join(F.broadcast(table), ["cms_row", "cms_bucket"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("cms_count"), F.lit(0))).alias(
                estimate_col
            )
        )
    )


def quantile_partials(
    df: DataFrame,
    col: str,
    by: list[str],
    k: int = 256,
) -> DataFrame:
    """Mergeable QUANTILE summaries (Munro–Paterson / MRL multi-level
    collapse, the deterministic ancestor of KLL): per partition and
    ``by`` group, values fold into levels of weighted samples — level
    i holds items standing for 2^i input rows; a level overflowing
    ``k`` items sort-collapses to half, promoting alternate elements
    (alternating offset, the classic bias cancellation) one level up.
    Output rows are ``(by…, value, weight)`` — at most k·⌈log2(n/k)+1⌉
    rows per (partition, group) enter any shuffle, the quantile
    sibling of the HLL/MG partials above.

    Rank guarantee (Munro–Paterson): an estimate from the summary is
    off by at most ~(log2(n/k)/2 + 1)·(n/k) ranks — gated empirically
    in tests; with ``k`` at least the per-partition group size no
    collapse ever fires and the summary is EXACT (the driver-gated
    entry exploits that, mirroring heavy_hitters).

    NULL values are ignored (SQL aggregate semantics); NULL group
    keys form their own group."""
    import pandas as pd

    def gen(batches):
        state: dict = {}  # group key -> (levels, offsets)
        for pdf in batches:
            for g, part in pdf.groupby(by, dropna=False, sort=False):
                key = g if isinstance(g, tuple) else (g,)
                levels, offsets = state.setdefault(key, ([[]], {}))
                vals = part[col].dropna().tolist()
                lv0 = levels[0]
                for v in vals:
                    lv0.append(float(v))
                    if len(lv0) > k:
                        i = 0
                        while i < len(levels) and len(levels[i]) > k:
                            buf = sorted(levels[i])
                            off = offsets.get(i, 0)
                            offsets[i] = 1 - off
                            levels[i] = []
                            if i + 1 == len(levels):
                                levels.append([])
                            levels[i + 1].extend(buf[off::2])
                            i += 1
                        lv0 = levels[0]
        rows = []
        for key, (levels, _off) in state.items():
            for i, lv in enumerate(levels):
                w = 1 << i
                rows.extend(key + (v, w) for v in lv)
        if rows:
            yield pd.DataFrame(rows, columns=by + ["value", "weight"])

    by_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in by
    )
    return df.select(*by, col).mapInPandas(
        gen, schema=f"{by_schema}, value double, weight long"
    )


def quantile_values(
    partials: DataFrame,
    by: list[str],
    qs: dict[str, float],
) -> DataFrame:
    """Quantile estimates from (unioned) partials, matching the
    discrete-quantile convention ``rank = max(1, ceil(q·W))`` over
    cumulative weights (bit-equal to DuckDB ``quantile_disc`` when the
    summary is exact). Pure JVM: one window cumsum per group (RANGE
    frame, so ties accumulate together deterministically) + one
    aggregate."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*by).orderBy("value")
    cum = partials.withColumn("_cum", F.sum("weight").over(w)).withColumn(
        "_w", F.sum("weight").over(Window.partitionBy(*by))
    )
    aggs = []
    for name, q in qs.items():
        rank = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_w")))
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("value"))).alias(name)
        )
    return cum.groupBy(*by).agg(*aggs)


def quantile_compress(
    partials: DataFrame,
    by: list[str],
    k: int = 256,
) -> DataFrame:
    """Re-compress unioned partials back to ≤ k·levels rows per group
    so rollups CHAIN (day → week → total) without unbounded growth —
    the quantile sibling of ``sketch_merge``. Items re-enter the
    level structure at the level matching their weight, then the same
    alternating collapse bounds each level."""
    import pandas as pd

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        levels: list[list] = [[]]
        offsets: dict = {}
        for v, w in zip(pdf["value"], pdf["weight"]):
            lvl = max(0, int(w).bit_length() - 1)
            while len(levels) <= lvl:
                levels.append([])
            levels[lvl].append(float(v))
        i = 0
        while i < len(levels):
            if len(levels[i]) > k:
                buf = sorted(levels[i])
                off = offsets.get(i, 0)
                offsets[i] = 1 - off
                levels[i] = []
                if i + 1 == len(levels):
                    levels.append([])
                levels[i + 1].extend(buf[off::2])
            i += 1
        rows = []
        for i, lv in enumerate(levels):
            rows.extend(key + (v, 1 << i) for v in lv)
        return pd.DataFrame(rows, columns=list(pdf.columns))

    schema = partials.schema
    return partials.groupBy(*by).applyInPandas(
        lambda key, pdf: merge(key, pdf), schema=schema
    )
