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

``ts_micros`` therefore normalizes to TIMESTAMP_NTZ (identity for
NTZ; wall-clock-preserving for LTZ under the session zone) and takes
a MICROSECOND timestampdiff from the naive epoch — the exact value
DuckDB's ``epoch_us(naive_ts)`` computes, so oracle SQL stays
bit-for-bit comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def ts_micros(col: Column | str) -> Column:
    """Microseconds since the naive epoch, for TIMESTAMP or
    TIMESTAMP_NTZ columns alike (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def ts_seconds(col: Column | str) -> Column:
    """Whole seconds since the naive epoch (bigint).

    Mirrors DuckDB's ``CAST(FLOOR(epoch(ts)) AS BIGINT)`` bit-for-bit:
    both sides compute floor(micros / 1e6) in double math.
    """
    return F.floor(ts_micros(col) / F.lit(1_000_000.0)).cast("bigint")
