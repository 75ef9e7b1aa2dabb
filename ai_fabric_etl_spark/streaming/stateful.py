"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The reference's only stateful construct is the Postgres running-total
upsert (process_test_data.py:112-148 — covered by running_aggs). This
module demonstrates the general mechanism Spark offers for operators
that SQL windows can't express incrementally: arbitrary per-key state
with event-time timeouts.

Semantics: events for a user belong to one session while consecutive
event times are <= ``gap`` apart. A session is emitted when either
(a) a later event for the same user arrives past the gap, or (b) the
watermark passes session_end + gap (timeout) — so trailing sessions
flush without waiting for the user to return.

Batch equivalent (and the oracle used in tests): classic
gaps-and-islands — ``lag(ts) over (partition by user order by ts)``,
flag gaps, running-sum the flags into session ids, group. The
streaming version computes the same partition-local result with
bounded state: one (start, last, count) triple per live user — at
100 TB of events the state is user-cardinality-sized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# timestamps kept as epoch-microsecond longs in state: Arrow round-trips
# them exactly and comparison arithmetic stays integer
STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _session_fn(gap_s: int):
    gap_us = gap_s * _US

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            cur = state.get if state.exists else None
            ts_us_all: list[int] = []
            for pdf in pdfs:
                ts_us_all.extend(
                    (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
                    if pdf["ts"].dtype.kind == "M"
                    else pdf["ts"].tolist()
                )
            for ts_us in sorted(ts_us_all):
                if cur is None:
                    cur = (ts_us, ts_us, 1)
                elif ts_us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (ts_us, ts_us, 1)
                else:
                    cur = (cur[0], max(cur[1], ts_us), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # flush when the watermark passes last event + gap
                state.setTimeoutTimestamp((cur[1] // 1000) + gap_s * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_with_state(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionizer. ``events`` must be a streaming DataFrame
    with (user_id, ts); output is one row per *closed* session."""
    unit_s = {"minutes": 60, "minute": 60, "hours": 3600, "hour": 3600, "seconds": 1, "second": 1}
    qty, unit = gap.split()
    gap_s = int(qty) * unit_s[unit]
    from ai_fabric_etl_spark.operators.timeutil import as_instant_col

    return (
        events.withColumn("ts", as_instant_col(events, "ts"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
