"""Single-pass column profiler: per-column null counts, distinct
counts, and min/max in ONE aggregation over the table.

Generalizes the reference's hand-rolled data-quality mart
(gold_x12_analytics.py:773-787 — per-table null/distinct tallies for
a fixed column list) into the table-generic operator every warehouse
exposes (DESCRIBE/SUMMARY/dbt-style profiling): the statistics a
training-data pipeline checks before admitting a source (null
fraction, cardinality, value range).

Scale notes: everything is computed in a single ``df.agg`` pass, so
the table is scanned once with full column pruning (only the profiled
columns are read). Exact ``countDistinct`` per column makes Catalyst
expand to one aggregate traversal per distinct (correct but
multiplies the shuffle at high column counts); ``approx=True`` swaps
in HLL ``approx_count_distinct`` (one traversal total, ~2% error) —
the 100 TB default. min/max are rendered to strings ENGINE-side so
one long-form schema covers every column type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-form profile: one row per column —
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).

    ``cols`` defaults to every column. min/max/distinct follow SQL
    aggregate semantics (nulls ignored); an all-null column yields
    NULL min/max and 0 distinct.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c)
            if approx
            else F.countDistinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    stacked = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, __nn, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram of ``col`` (per ``by`` group): bin edges
    from the (group's) min/max, EVERY bin present including empty
    ones, the max value closed into the last bin. Output:
    (by…, bin_id, bin_lo, bin_hi, n_rows).

    Plan: one bounds aggregate (broadcast back), one codegen bin
    assignment on the scan, one groupBy — then the empty-bin grid is
    GENERATED (sequence + explode ∝ bins) and left-joined, so the
    histogram of 100 TB costs one scan plus a bins-sized join.
    Degenerate groups (min == max, or a single row) collapse into one
    bin 0 spanning the point."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    by = by or []
    v = F.col(col).cast("double")
    # bounds carries RENAMED group keys (_gk_*): every join below is
    # then name-disjoint, which both avoids Spark's ambiguous-self-join
    # trap and lets the group joins be NULL-SAFE (a NULL group key is
    # a legitimate group; plain equi-join would silently drop its rows)
    bounds = df.groupBy(*by).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    ).select(
        *[F.col(k).alias(f"_gk_{k}") for k in by], "_lo", "_hi"
    )
    if by:
        cond = F.lit(True)
        for k in by:
            cond = cond & F.col(k).eqNullSafe(F.col(f"_gk_{k}"))
        joined = df.join(F.broadcast(bounds), cond)
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    # ONE width expression shared by bin assignment and edge output,
    # and the same association the oracle must use: bin * ((hi-lo)/n)
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    bin_id = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((v - F.col("_lo")) / width).cast("int"),
        )
    )
    counts = (
        joined.filter(v.isNotNull())
        .withColumn("_bin", bin_id)
        .groupBy(*[F.col(f"_gk_{k}") for k in by], F.col("_bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            *[F.col(f"_gk_{k}").alias(f"_ck_{k}") for k in by],
            F.col("_bin").alias("_cbin"),
            "n_rows",
        )
    )
    grid = bounds.select(
        *[f"_gk_{k}" for k in by],
        "_lo",
        "_hi",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("_bin"),
    )
    gcond = F.col("_bin").eqNullSafe(F.col("_cbin"))
    for k in by:
        gcond = gcond & F.col(f"_gk_{k}").eqNullSafe(F.col(f"_ck_{k}"))
    return (
        grid.join(counts, gcond, "left")
        .select(
            *[F.col(f"_gk_{k}").alias(k) for k in by],
            F.col("_bin").alias("bin_id"),
            F.round(F.col("_lo") + F.col("_bin") * width, 6).alias("bin_lo"),
            F.round(
                F.col("_lo") + (F.col("_bin") + 1) * width, 6
            ).alias("bin_hi"),
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        )
    )


def histogram_equidepth(
    df: DataFrame,
    col: str,
    tiebreak: str,
    bins: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-depth (quantile) histogram: per group, ``bins`` buckets of
    near-equal population with their actual value ranges — the
    distribution summary that stays informative under the skew that
    flattens an equi-width histogram into one hot bin. This is also
    exactly the bucket layout an optimizer's equi-height column stats
    use. Output: (by…, bin_id 1..bins, lo, hi, n_rows).

    Buckets are SQL-standard NTILE over (col, tiebreak) — rank
    semantics, no floating-point edge arithmetic at all: lo/hi are
    genuine data values (min/max inside the bucket), so the result is
    bit-stable across engines with no rounding convention needed.
    ``tiebreak`` (a unique key) pins runs of duplicate values to a
    deterministic bucket split.

    Scale plan: one window shuffle keyed by the group columns + one
    aggregate that reuses the same partitioning (zero extra
    exchanges). Groups are category-grain (statuses, sources, langs) —
    bounded; for an UNGROUPED equi-depth histogram of a 100 TB column
    use ranking.global_ntile, which this mirrors.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    from pyspark.sql.window import Window

    by = by or []
    # both paths bin the SAME frame (NULL values excluded — SQL
    # aggregate semantics) and share one summary tail, so the grouped
    # and ungrouped branches cannot drift apart
    work = df.filter(F.col(col).isNotNull())
    if by:
        w = Window.partitionBy(*by).orderBy(F.col(col), F.col(tiebreak))
        binned = work.withColumn("bin_id", F.ntile(bins).over(w))
    else:
        from ai_fabric_etl_spark.operators.ranking import global_ntile

        binned = global_ntile(
            work, bins, [F.col(col), F.col(tiebreak)], "bin_id"
        )
    return binned.groupBy(*by, "bin_id").agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
