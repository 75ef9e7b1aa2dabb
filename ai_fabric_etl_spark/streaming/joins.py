"""Stream-stream joins (SURVEY §2.9 free extension).

The reference's only join is a batch left equi-join; a streaming
engine also needs the stream-stream INTERVAL join (enrich one event
stream with time-adjacent rows of another). Spark executes it as a
watermark-bounded symmetric hash join: both sides buffer state, and
the event-time range condition plus the watermarks tell the engine
exactly when buffered rows can never match again and are evicted —
state stays O(watermark window), not O(stream).

Batch twin: operators/temporal.range_join on the same inputs (the
equivalence is asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.timeutil import instant_to_ntz, ntz_to_instant


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    before_seconds: float = 0.0,
    after_seconds: float = 0.0,
    watermark_seconds: float = 600.0,
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` rows with streaming ``right`` rows that
    share ``by`` keys and fall in ``[left_ts - before, left_ts +
    after]``. Column names other than ``by`` must be disjoint.

    Both sides get event-time watermarks: required for state eviction,
    and for outer joins required for correctness (an unmatched row can
    only be emitted once the watermark proves no match can arrive).
    ``how`` supports inner and left_outer, mirroring range_join.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    delay = f"{int(watermark_seconds)} seconds"
    # Spark watermarks require TIMESTAMP (LTZ); parquet sources with
    # isAdjustedToUTC=false arrive as TIMESTAMP_NTZ. A plain
    # NTZ→TIMESTAMP cast goes through the session zone's wall clock,
    # which is nonlinear across DST (nonexistent/ambiguous local
    # times) and can reorder event time → spurious watermark drops.
    # Bridge through epoch micros instead (NTZ read as UTC): linear on
    # any session zone; restore the source types on the way out so the
    # batch twin stays column-for-column comparable.
    l_type = dict(left.dtypes)[left_ts]
    r_type = dict(right.dtypes)[right_ts]

    def _as_instant(c, t):
        return ntz_to_instant(c) if t == "timestamp_ntz" else F.col(c).cast("timestamp")

    def _restore(c, t):
        return instant_to_ntz(c) if t == "timestamp_ntz" else F.col(c).cast(t)

    lw = left.withColumn(left_ts, _as_instant(left_ts, l_type)).withWatermark(
        left_ts, delay
    )
    rw = right.withColumn(right_ts, _as_instant(right_ts, r_type)).withWatermark(
        right_ts, delay
    )
    cond = None
    for k in by:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    # interval LITERALS, not make_dt_interval(...): Spark's stream-
    # stream OUTER join derives the state watermark from the range
    # condition, and its extractor only recognizes `ts ± INTERVAL`
    # with foldable intervals — the function form analyzes fine for
    # inner joins but fails the outer-join requirement with
    # "not supported without ... an appropriate range condition"
    in_range = F.col(right_ts).between(
        F.col(left_ts) - F.expr(f"INTERVAL '{before_seconds}' SECOND"),
        F.col(left_ts) + F.expr(f"INTERVAL '{after_seconds}' SECOND"),
    )
    cond = cond & in_range
    joined = lw.join(rw, cond, how)
    # drop the right side's duplicated key columns
    out = joined.drop(*[rw[k] for k in by])
    return out.withColumn(left_ts, _restore(left_ts, l_type)).withColumn(
        right_ts, _restore(right_ts, r_type)
    )
