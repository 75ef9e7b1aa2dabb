"""Temporal join operators: as-of join and bounded range join.

The reference has no temporal joins (SURVEY §2.3 — its entire join
surface is one left equi-join), but its ops-analytics consumers
(trace streams, monitoring/sftp-monitoring-queries.md) and any
training-data pipeline need them. Spark also lacks them as
primitives, so both are built as compositions of existing DataFrame
ops (the brief's preferred strategy):

- ``asof_join``: union the two sides, one window pass per key fills
  each left row with the most recent right row at-or-before its
  timestamp. ONE shuffle on the keys, no join blow-up, no range
  cross-product — the classic scalable as-of plan (the same shape
  Flink's event-time join and pandas.merge_asof use). AQE handles
  key skew since it is an ordinary window shuffle.

- ``range_join``: equi-join on (keys, time-bucket) with the left
  side exploded over the buckets its window covers, then an exact
  timestamp filter. Turns an inequality join (which Spark would
  execute as BroadcastNestedLoop or a per-key cross product) into a
  pruned hash join; candidate count per row is bounded by
  window/bucket_width + 1 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ai_fabric_etl_spark.operators.timeutil import ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` of
    the most recent ``right`` row with ``right.ts <= left.ts`` per
    ``by`` key (``direction="backward"``; ``"forward"`` matches the
    nearest ``right.ts >= left.ts``; ``"nearest"`` takes whichever
    side is closer, ties to backward — pandas merge_asof semantics).
    Unmatched left rows keep nulls.

    Among right rows sharing the winning timestamp the choice is
    tie-broken by the order of ``right_cols`` values (deterministic
    input → deterministic output); pre-aggregate ``right`` to one row
    per (key, ts) when that matters.

    If ``tolerance_seconds`` is set, matches farther than that from
    the left timestamp are nulled out (pandas merge_asof semantics).

    Mixed NTZ/LTZ timestamp sides are normalized to TIMESTAMP instants
    (NTZ wall clock read as UTC) before joining, so ordering and gap
    math stay on one time axis; the output then carries the
    normalized types.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != right_ts]
    # Mixed NTZ/LTZ sides would otherwise be union-coerced through the
    # session zone AND make the gap math compare naive-epoch to
    # instant-epoch micros (skew = the session offset). Normalize both
    # to instants via the linear bridge up front; same-typed inputs
    # pass through untouched.
    lt = dict(left.dtypes).get(left_ts)
    rt = dict(right.dtypes).get(right_ts)
    if lt != rt and {lt, rt} == {"timestamp", "timestamp_ntz"}:
        from ai_fabric_etl_spark.operators.timeutil import as_instant_col

        left = left.withColumn(left_ts, as_instant_col(left, left_ts))
        right = right.withColumn(right_ts, as_instant_col(right, right_ts))
        lt = rt = "timestamp"
    out_struct = F.struct(
        F.col(right_ts).alias("_matched_ts"),
        *[F.col(c) for c in right_cols],
    )
    rp = right.select(
        *by, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), out_struct.alias("_r")
    )
    r_type = rp.schema["_r"].dataType
    lp = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    l_type = lp.schema["_l"].dataType
    unioned = lp.unionByName(
        rp.withColumn("_l", F.lit(None).cast(l_type)),
    )
    # right rows (side 0) sort before left rows at equal ts → inclusive.
    # deterministic tiebreak among equal-ts right rows via the payload.
    back_order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc()]
    fwd_order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_r").desc()]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )

    def _w(order):
        return (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction in ("backward", "forward"):
        order = back_order if direction == "backward" else fwd_order
        filled = unioned.withColumn(
            "_m", F.last("_r", ignorenulls=True).over(_w(order))
        ).filter(F.col("_side") == 1)
    else:
        # nearest (pandas merge_asof parity): fill both directions in
        # one keyed shuffle (same partitioning → one exchange, two
        # sorts), pick the closer match, ties to the backward side
        both = (
            unioned.withColumn(
                "_mb", F.last("_r", ignorenulls=True).over(_w(back_order))
            )
            .withColumn("_mf", F.last("_r", ignorenulls=True).over(_w(fwd_order)))
            .filter(F.col("_side") == 1)
        )
        gap_b = ts_micros(F.col("_ts"), lt) - ts_micros(F.col("_mb._matched_ts"), rt)
        gap_f = ts_micros(F.col("_mf._matched_ts"), rt) - ts_micros(F.col("_ts"), lt)
        filled = both.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(gap_f < gap_b, F.col("_mf"))
            .otherwise(F.col("_mb")),
        ).drop("_mb", "_mf")
    if tolerance_seconds is not None:
        # _ts/_matched_ts carry the (normalized) source column types;
        # dispatch so LTZ inputs take the DST-safe unix_micros path
        gap = F.abs(
            (ts_micros(F.col("_ts"), lt) - ts_micros(F.col("_m._matched_ts"), rt))
            / F.lit(1_000_000.0)
        )
        filled = filled.withColumn(
            "_m", F.when(gap <= tolerance_seconds, F.col("_m"))
        )
    return filled.select(
        "_l.*",
        F.col("_m._matched_ts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    before_seconds: float = 0.0,
    after_seconds: float = 0.0,
    how: str = "inner",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Pairs (left, right) sharing ``by`` keys with ``right_ts`` in
    ``[left_ts - before, left_ts + after]``. Column names other than
    ``by`` must be disjoint between the two sides.

    Physical plan: hash join on (by, bucket) — left exploded over the
    covered buckets, right assigned one bucket — then the exact
    interval filter. ``how="left"`` keeps unmatched left rows (their
    right columns null), implemented as join-then-recover so the
    exploded side still joins with equi semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    before_us = int(before_seconds * 1_000_000)
    after_us = int(after_seconds * 1_000_000)
    w_us = int((bucket_seconds or max(before_seconds + after_seconds, 1.0)) * 1_000_000)

    # left-path unmatched recovery anti-joins on a generated row id, not
    # on the left columns: plain column equality never matches null
    # values, so a left row containing a null would be emitted twice —
    # once matched, once null-padded (ADVICE r1). The id column is
    # pinned with a lazy localCheckpoint: monotonically_increasing_id
    # is evaluated independently in the matched and anti-join subtrees,
    # and without pinning a nondeterministically-ordered source could
    # assign different ids per subtree (dup + dropped rows).
    left_in = (
        left.withColumn("_lid", F.monotonically_increasing_id()).localCheckpoint(
            eager=False
        )
        if how == "left"
        else left
    )

    lt = dict(left.dtypes).get(left_ts)
    rt = dict(right.dtypes).get(right_ts)
    lb = F.floor((ts_micros(left_ts, lt) - before_us) / w_us)
    ub = F.floor((ts_micros(left_ts, lt) + after_us) / w_us)
    lex = left_in.withColumn("_bucket", F.explode(F.sequence(lb, ub)))
    rb = right.withColumn("_bucket", F.floor(ts_micros(right_ts, rt) / w_us))

    in_range = F.col(right_ts).between(
        F.col(left_ts) - F.make_dt_interval(secs=F.lit(before_seconds)),
        F.col(left_ts) + F.make_dt_interval(secs=F.lit(after_seconds)),
    )
    matched = lex.join(rb, [*by, "_bucket"], "inner").filter(in_range).drop("_bucket")
    if how == "inner":
        return matched
    right_only = [c for c in right.columns if c not in by]
    unmatched = left_in.join(
        matched.select("_lid").distinct(), ["_lid"], "left_anti"
    )
    for c in right_only:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(right.dtypes)[c])
        )
    return matched.unionByName(unmatched.select(*matched.columns)).drop("_lid")


def fill_time_gaps(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    step_seconds: int,
    fill_zero: list[str] | None = None,
    ffill: list[str] | None = None,
) -> DataFrame:
    """Time-series gap filling: per group, densify ``ts_col`` to a
    complete grid from the group's min to max at ``step_seconds``
    (the input must already be bucket-aligned, e.g. date_trunc'd),
    then repair the new rows — ``fill_zero`` columns read 0 (counts),
    ``ffill`` columns carry the last observed value forward (gauges).
    Everything else reads NULL on gap rows.

    Plan: one tiny per-group bounds aggregate, ``sequence()`` exploded
    into the grid (rows ∝ gaps, never a cross join), one left join
    back on (group, ts) — co-partitioned with the source — and one
    ordered window per group for the forward fill. At 100 TB the grid
    is generated, not shuffled from data, and the join keys on the
    same (group, bucket) partitioning the aggregation that produced
    ``df`` already used."""
    from pyspark.sql.window import Window as _W

    fill_zero = fill_zero or []
    ffill = ffill or []
    bounds = df.groupBy(*by).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"INTERVAL {int(step_seconds)} SECOND"),
            )
        ).alias(ts_col),
    )
    out = grid.join(df, [*by, ts_col], "left")
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            _W.partitionBy(*by)
            .orderBy(ts_col)
            .rowsBetween(_W.unboundedPreceding, _W.currentRow)
        )
        for c in ffill:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
