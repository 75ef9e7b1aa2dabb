"""Slowly-changing-dimension (SCD type 2) maintenance on the
versioned lakehouse table.

The reference keeps dimension-ish state as mutable Postgres rows with
an ``updated_at`` column (local-development/sql/init.sql — trading
partners, processing state), i.e. type-1 overwrites that lose history.
A warehouse at 100 TB wants the Delta-style SCD2 pattern instead:
every attribute change CLOSES the current row (effective_to stamped,
is_current=false) and INSERTS a new current row, so any query can ask
"what did this dimension look like at time T" with a plain range
predicate — no log replay.

Spark-first shape: one copy-on-write pass per batch, exactly like
``ParquetMergeTable.merge`` — a single full-outer join on the business
key drives close/insert/carry decisions declaratively; no per-row
driver loops, no UDFs. The one shuffle per apply is on the business
key; history rows ride along untouched (they could be partitioned out
by ``is_current`` to keep the rewrite proportional to the live set —
documented, not needed at sandbox scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable

_META = ("effective_from", "effective_to", "is_current")


def scd2_apply(
    table: ParquetMergeTable,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str = "effective_from",
) -> None:
    """Fold one batch of dimension updates into an SCD2 history table.

    ``updates`` carries the business key columns, the tracked
    attribute columns, and ``ts_col`` — the instant the new attribute
    values take effect. At most one row per key per batch (pre-reduce
    a raw feed with arg_max before calling).

    Semantics per key:
    - new key → insert as current (effective_from=ts, open-ended);
    - tracked attributes changed (null-safe) → close the current row
      at ts and insert the new version as current;
    - attributes unchanged → no-op (change suppression: a re-sent
      identical record must not fragment history);
    - keys absent from the batch carry forward untouched.
    """
    # a NULL effective-from timestamp is unanswerable (as_of could
    # never match the row) — reject loudly rather than silently
    # dropping the change. The guard is an in-job assert_true (raises
    # DURING the write job), not a separate count() action that would
    # re-execute an expensive updates plan twice per apply. Presence
    # below is an EXPLICIT flag, independent of _uts null-ness.
    ts_guarded = F.when(
        F.assert_true(
            F.col(ts_col).isNotNull(),
            f"scd2_apply: NULL {ts_col} in updates; "
            "an effective-from instant is required",
        ).isNull(),
        F.col(ts_col),
    )
    u = updates.select(
        *[F.col(k).alias(f"_uk_{k}") for k in keys],
        *[F.col(c).alias(f"_uv_{c}") for c in tracked],
        ts_guarded.alias("_uts"),
        F.lit(True).alias("_u_present"),
    )
    if not table.exists():
        initial = u.select(
            *[F.col(f"_uk_{k}").alias(k) for k in keys],
            *[F.col(f"_uv_{c}").alias(c) for c in tracked],
            F.col("_uts").alias("effective_from"),
            F.lit(None).cast("timestamp").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
        table.overwrite(initial, op="SCD2")
        return

    cur = table.read()
    live = cur.filter(F.col("is_current"))
    hist = cur.filter(~F.col("is_current"))

    cond = F.lit(True)
    for k in keys:
        cond = cond & live[k].eqNullSafe(F.col(f"_uk_{k}"))
    j = live.join(u, on=cond, how="full_outer")

    matched = (
        F.coalesce(F.col("_u_present"), F.lit(False))
        & F.col("is_current").isNotNull()
    )
    changed = matched & ~_all_equal(j, tracked)
    new_key = F.col("is_current").isNull()

    # surviving current rows: unchanged-matched + untouched
    carried = j.filter(~changed & ~new_key).select(*cur.columns)
    # closed versions of changed rows
    closed = j.filter(changed).select(
        *keys,
        *tracked,
        F.col("effective_from"),
        F.col("_uts").alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    # fresh current rows for changed + brand-new keys
    opened = j.filter(changed | new_key).select(
        *[F.col(f"_uk_{k}").alias(k) for k in keys],
        *[F.col(f"_uv_{c}").alias(c) for c in tracked],
        F.col("_uts").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    out = hist.unionByName(carried).unionByName(closed).unionByName(opened)
    table.overwrite(out, op="SCD2")


def _all_equal(j: DataFrame, tracked: list[str]):
    eq = F.lit(True)
    for c in tracked:
        eq = eq & F.col(c).eqNullSafe(F.col(f"_uv_{c}"))
    return eq


def as_of(table: ParquetMergeTable, ts) -> DataFrame:
    """Dimension snapshot as of instant ``ts``: the row version whose
    validity range covers ts. A plain range predicate — the point of
    keeping SCD2 history."""
    t = F.lit(ts).cast("timestamp")
    return table.read().filter(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
    )
