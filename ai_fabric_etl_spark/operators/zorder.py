"""Z-order (Morton) clustering for multi-column data skipping.

Sorting a table by one column gives perfect parquet footer-stat
pruning on that column and none on any other. Interleaving the bits
of several columns' rank-buckets (the Morton curve) gives every
interleaved column locality: each output file covers a narrow range
of EACH column, so a filter on any of them skips most files. This is
Delta's OPTIMIZE ZORDER BY semantics, built from plain DataFrame ops:

1. per column, map values to a 16-bit rank bucket via percent_rank
   (rank-based, so skew and arbitrary types don't break the curve);
2. interleave the bucket bits JVM-side (shiftleft/bitwise or — whole
   stage codegen, no UDF);
3. repartitionByRange + sortWithinPartitions on the Morton key so
   each written file owns a compact curve segment.

Scale: two window passes over rank (single shuffle each) + one range
exchange — all linear; at 100 TB the rank pass can be replaced by a
sampled quantile map (approxQuantile) without changing the contract.
The reference has no clustering DDL at all (its tables are heaps;
SURVEY §2.1 S4); this is the brief's "design for the 100 TB read
path" extension, wired into ParquetMergeTable.compact(zorder_by=...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BITS = 16


def _bucket(col: str, bits: int) -> Column:
    """Rank-based ``bits``-bit bucket of a column (0 .. 2^bits - 1)."""
    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    return F.least(
        F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


_APPROX_BITS = 8


def _approx_bucket_exprs(
    df: DataFrame, cols: list[str], bits: int
) -> dict[str, Column]:
    """Quantile-breakpoint buckets without any global window: ONE
    aggregation computes 2^bits-1 approximate percentiles per column
    (driver receives a few KB of breakpoints), then each row's bucket
    is the count of breakpoints <= value — a literal-array filter
    inside codegen. This is how OPTIMIZE ZORDER scales: the exact
    percent_rank path funnels every row through one partition, the
    sampled-quantile path touches each row once, fully parallel."""
    qs = [i / (1 << bits) for i in range(1, 1 << bits)]
    agg = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
            for c in cols
        ]
    )
    row = agg.collect()[0]
    out: dict[str, Column] = {}
    for c in cols:
        bps = sorted(set(b for b in (row[c] or []) if b is not None))
        if not bps:
            raise ValueError(
                f"zorder method='approx' needs a numeric-castable column, "
                f"got no quantile breakpoints for {c!r} — use method='exact' "
                "for non-numeric curve columns"
            )
        arr = F.lit(bps).cast("array<double>")
        v = F.col(c).cast("double")
        cnt = F.size(F.filter(arr, lambda x: x <= v))
        # nulls sort first, matching percent_rank's null placement
        out[c] = F.when(v.isNull(), F.lit(0)).otherwise(cnt).cast("long")
    return out


_NUMERIC_BASE_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
}


def _all_numeric(df: DataFrame, cols: list[str]) -> bool:
    # exact base-type match: a startswith("int") prefix test would also
    # match "interval ..." dtypes, routing them to the approx path
    # where cast("double") fails analysis
    types = dict(df.dtypes)
    return all(
        types.get(c, "").split("(")[0].strip() in _NUMERIC_BASE_TYPES
        for c in cols
    )


def morton_key(
    df: DataFrame,
    cols: list[str],
    key_col: str = "_zorder",
    method: str = "auto",
) -> DataFrame:
    """Attach the interleaved Morton key for ``cols`` (2+ columns).

    Bits-per-column is ``min(16, 63 // len(cols))`` so the interleaved
    key always fits the 63 value bits of a signed long: a fixed 16
    would push the top bit into the sign at 4 columns (negative keys
    sort before the curve start) and silently collide via JVM shift
    masking (shift & 63) at 5+.

    ``method="exact"``: percent_rank buckets — deterministic and
    rank-perfect, but the global window funnels through one partition;
    for test/interactive scale. ``method="approx"``: one
    percentile_approx pass derives 2^8-1 breakpoints per (numeric)
    column and every row buckets independently — the 100 TB path: no
    single-partition stage, one extra scan, coarser (8-bit) but still
    curve-cell counts far above any realistic file count.
    ``method="auto"`` (the default) picks the scale-safe approx path
    when every curve column is numeric, exact otherwise — the
    windowless plan is the default wherever it can apply.
    """
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns")
    if method not in ("exact", "approx", "auto"):
        raise ValueError(f"method must be exact|approx|auto, got {method!r}")
    if method == "auto":
        method = "approx" if _all_numeric(df, cols) else "exact"
    bits = min(_BITS if method == "exact" else _APPROX_BITS, 63 // len(cols))
    bucketed = df
    bcols = []
    approx_exprs = (
        _approx_bucket_exprs(df, cols, bits) if method == "approx" else {}
    )
    for i, c in enumerate(cols):
        bc = f"_zb{i}"
        expr = approx_exprs[c] if method == "approx" else _bucket(c, bits)
        bucketed = bucketed.withColumn(bc, expr)
        bcols.append(bc)
    # interleave: output bit (b*len + i) takes bit b of column i
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, bc in enumerate(bcols):
            bit = F.shiftright(F.col(bc), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(bcols) + i).cast("long")
            )
    return bucketed.withColumn(key_col, key).drop(*bcols)


def zorder_sort(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    method: str = "auto",
) -> DataFrame:
    """Return ``df`` ordered for writing: each output file covers a
    compact segment of the Morton curve over ``cols``."""
    keyed = morton_key(df, cols, method=method)
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "_zorder")
    else:
        keyed = keyed.repartitionByRange("_zorder")
    return keyed.sortWithinPartitions("_zorder").drop("_zorder")
