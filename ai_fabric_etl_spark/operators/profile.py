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


def skew_gini(
    df: DataFrame,
    key: str,
) -> DataFrame:
    """Key-skew diagnostic: the Gini coefficient of the key-frequency
    distribution plus the heavy-hitter share — the number that tells
    you whether a planned groupBy/join on ``key`` will straggle
    before you run it (0 = uniform keys, →1 = one hot key owns the
    table).

    Exact and cross-engine deterministic: with per-key counts x
    ranked ascending (ties by key), Gini = (2·Σ i·x_i) / (n·Σx)
    − (n+1)/n; both Σ terms are exact DECIMAL(38,0) integer sums, so
    the only float ops are two divisions and a subtraction, rounded
    to 6 dp. The rank comes from ranking.global_row_number — a range
    shuffle over the KEY-grain aggregate, no one-task window even
    when the key cardinality is huge.

    Returns one row: (n_keys, n_rows, max_key_share, gini).
    """
    from ai_fabric_etl_spark.operators.ranking import global_row_number

    counts = df.groupBy(F.col(key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_x")
    )
    ranked = global_row_number(
        counts, [F.col("_x"), F.col("_k")], out_col="_i"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_x").cast("long").alias("n_rows"),
        F.round(
            F.max("_x").cast("double") / F.sum("_x").cast("double"), 6
        ).alias("max_key_share"),
        F.round(
            (F.lit(2) * F.sum(dec("_i") * dec("_x"))).cast("double")
            / (F.count(F.lit(1)) * F.sum(dec("_x"))).cast("double")
            - (F.count(F.lit(1)) + F.lit(1)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("gini"),
    )


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    tiebreak: str,
    bins: int = 10,
) -> DataFrame:
    """Population stability index between a reference and a current
    sample of ``col`` — the standard ML-ops drift gate
    (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 retrain).

    Bin edges are the REFERENCE sample's equi-depth bucket
    boundaries (discrete quantiles from :func:`histogram_equidepth`,
    actual data values — no float edge arithmetic), so the reference
    lands ~uniformly in every bin by construction and drift shows as
    current-sample mass moving between bins. Both samples are bucketed
    by the same broadcast edge list; per-bin shares use Laplace
    smoothing (+1 count per side) so empty bins cannot produce
    ±infinity. Each bin's PSI term quantizes its ln() ratio to
    integer micro-units before the final sum (the zipf-slope
    convention), keeping the driver hash independent of float
    summation order.

    Returns (bin_id, ref_n, cur_n, psi_term_micro) per bin plus exact
    integer counts — total PSI = Σ psi_term_micro / 1e6.
    """
    edges = (
        histogram_equidepth(ref, col=col, tiebreak=tiebreak, bins=bins)
        .select("bin_id", "hi")
        .filter(F.col("bin_id") < bins)  # top bin is open-ended
    )

    # count per value first, then per bin: the edge theta-join (bin =
    # 1 + number of edges strictly below the value) runs on the
    # DISTINCT value grain, not the row grain
    def bin_counts(df, alias):
        vals = (
            df.select(F.col(col).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .groupBy("_v")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        e = edges.select(F.col("hi").alias("_hi"))
        # compare in double on BOTH sides: the streaming monitor's
        # assign_bin carries edges as double literals, so the batch
        # theta-join must bucket boundary-tied values identically
        # (a DECIMAL edge not exactly representable as a double would
        # otherwise split stream vs batch on the tie)
        binned = (
            vals.join(
                F.broadcast(e),
                F.col("_v").cast("double") > F.col("_hi").cast("double"),
                "left",
            )
            .groupBy("_v", "_n")
            .agg((F.lit(1) + F.count("_hi")).alias("bin_id"))
        )
        return binned.groupBy("bin_id").agg(F.sum("_n").alias(alias))

    grid = ref.sparkSession.range(1, bins + 1).select(
        F.col("id").cast("int").alias("bin_id")
    )
    r = bin_counts(ref, "ref_n")
    c = bin_counts(cur, "cur_n")
    both = (
        grid.join(r, "bin_id", "left")
        .join(c, "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    return psi_from_counts(both, bins)


def psi_from_counts(both: DataFrame, bins: int) -> DataFrame:
    """PSI terms from a (bin_id, ref_n, cur_n) frame — the shared
    formula tail of :func:`drift_psi`, also driven per micro-batch by
    streaming/sketch_state.read_drift_psi so the batch and streaming
    monitors cannot diverge. Laplace smoothing, integer-quantized
    terms (see drift_psi)."""
    tot = both.agg(
        F.sum("ref_n").alias("_tr"), F.sum("cur_n").alias("_tc")
    )
    smoothed_p = (F.col("ref_n") + 1).cast("double") / (
        F.col("_tr") + F.lit(bins)
    ).cast("double")
    smoothed_q = (F.col("cur_n") + 1).cast("double") / (
        F.col("_tc") + F.lit(bins)
    ).cast("double")
    return (
        both.crossJoin(F.broadcast(tot))
        .select(
            "bin_id",
            "ref_n",
            "cur_n",
            F.round(
                (smoothed_q - smoothed_p)
                * F.log(smoothed_q / smoothed_p)
                * 1_000_000
            )
            .cast("long")
            .alias("psi_term_micro"),
        )
    )


def assign_bin(col_expr: "F.Column", edges: list[float]) -> "F.Column":
    """Codegen bin assignment against a LITERAL ascending edge list:
    bin = 1 + number of edges strictly below the value — identical
    semantics to drift_psi's edge theta-join, as a pure expression
    for streaming micro-batches (no join, no state beyond the
    literals)."""
    b = F.lit(1)
    v = col_expr.cast("double")  # same double-grain compare as drift_psi
    for e in edges:
        b = b + F.when(v > F.lit(float(e)), 1).otherwise(0)
    return b.cast("int")
