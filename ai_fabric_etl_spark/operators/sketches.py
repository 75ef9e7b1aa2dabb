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


def relative_error_ok(
    estimate: Column, exact: Column, rel_tol: float
) -> Column:
    """|estimate - exact| / exact <= rel_tol (guard against exact=0)."""
    return (
        F.abs(estimate.cast("double") - exact.cast("double"))
        <= F.greatest(exact.cast("double") * rel_tol, F.lit(1.0))
    )
