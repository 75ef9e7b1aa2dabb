"""Timezone-robust timestamp→microseconds conversion.

The driver-generated parquet stores event timestamps with the
isAdjustedToUTC=false annotation, which Spark 4 reads as
TIMESTAMP_NTZ.  ``F.unix_micros`` only accepts TIMESTAMP (LTZ), so
every operator that needs epoch arithmetic must go through a
conversion that

- accepts both TIMESTAMP and TIMESTAMP_NTZ inputs, and
- is independent of ``spark.sql.session.timeZone`` for NTZ inputs
  (a cast NTZ→LTZ would shift by the session offset and can even
  shift *differently* for two timestamps straddling a DST change,
  corrupting gap/bucket math on non-UTC clusters).

``ts_micros`` therefore type-dispatches when the caller supplies the
dtype: instant-based ``unix_micros`` for TIMESTAMP (DST-safe), naive
MICROSECOND timestampdiff from the epoch for TIMESTAMP_NTZ — the
exact value DuckDB's ``epoch_us(naive_ts)`` computes, so oracle SQL
stays bit-for-bit comparable. ``ntz_to_instant``/``instant_to_ntz``
give streaming code a linear (session-zone-independent) NTZ↔LTZ
bridge for watermark columns, which Spark requires to be TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def ts_micros(col: Column | str, dtype: str | None = None) -> Column:
    """Microseconds since the epoch, for TIMESTAMP or TIMESTAMP_NTZ
    columns alike (bigint).

    Pass the column's Spark dtype string (``"timestamp"`` /
    ``"timestamp_ntz"``) when the caller has the schema: TIMESTAMP
    (LTZ) inputs then take the instant-based ``unix_micros`` path,
    which is DST-safe on non-UTC sessions — the NTZ-normalizing cast
    would shift two instants straddling a DST transition by different
    offsets, corrupting gap/bucket math. Without ``dtype`` the NTZ
    path is used (correct for the NTZ sources the test data ships;
    matches DuckDB's ``epoch_us(naive_ts)`` bit-for-bit).
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype is not None and dtype.lower() == "timestamp":
        return F.unix_micros(c)
    # Zone-free naive epoch micros. timestamp_diff/to_utc_timestamp
    # both implicitly cast NTZ→LTZ through the session zone (verified:
    # nonexistent DST local times shift by an hour), so build the
    # value from components that ARE naive on NTZ inputs: unix_date /
    # hour / minute / second. The sub-second part can safely detour
    # through the session cast — tzdb offsets are whole seconds, so
    # zone conversion never touches the micros fraction (pmod handles
    # pre-1970 negatives).
    n = c.cast("timestamp_ntz")
    return (
        F.unix_date(F.to_date(n)).cast("long") * F.lit(86_400_000_000)
        + F.hour(n).cast("long") * F.lit(3_600_000_000)
        + F.minute(n).cast("long") * F.lit(60_000_000)
        + F.second(n).cast("long") * F.lit(1_000_000)
        + F.pmod(F.unix_micros(n.cast("timestamp")), F.lit(1_000_000))
    )


def ts_seconds(col: Column | str, dtype: str | None = None) -> Column:
    """Whole seconds since the epoch (bigint).

    Mirrors DuckDB's ``CAST(FLOOR(epoch(ts)) AS BIGINT)`` bit-for-bit:
    both sides compute floor(micros / 1e6) in double math.
    """
    return F.floor(ts_micros(col, dtype) / F.lit(1_000_000.0)).cast("bigint")


def ntz_to_instant(col: Column | str) -> Column:
    """TIMESTAMP_NTZ wall clock, read as UTC, to a TIMESTAMP (LTZ)
    instant — linear across DST regardless of the session zone (a
    plain NTZ→LTZ cast interprets the wall clock in the session zone,
    which is non-monotonic across that zone's DST transitions)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(ts_micros(c))


def as_instant_col(df, col: str) -> Column:
    """Event-time normalization for watermarks: TIMESTAMP passes
    through; TIMESTAMP_NTZ takes the linear epoch-micros bridge
    (identity wall clock under UTC sessions, DST-proof elsewhere —
    a plain cast is nonlinear across the session zone's transitions)."""
    t = dict(df.dtypes).get(col)
    if t == "timestamp_ntz":
        return ntz_to_instant(F.col(col))
    return F.col(col).cast("timestamp")


def instant_to_ntz(col: Column | str) -> Column:
    """Inverse of ``ntz_to_instant``: TIMESTAMP (LTZ) instant to the
    NTZ wall clock equal to its UTC rendering. Integer-exact (epoch
    micros + timestampadd), session-zone independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add(
        "MICROSECOND", F.unix_micros(c), F.lit(_EPOCH_NTZ).cast("timestamp_ntz")
    )
