"""Plan inspection: read the physical plan the way a perf engineer
does, programmatically — so tests can assert "the filter reached the
parquet scan" instead of hoping.

These parse ``explain`` output text (a public, stable-enough surface)
rather than private Catalyst objects; each helper degrades to a
conservative answer if the plan shape changes.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_columns(df: DataFrame, table_path_fragment: str) -> list[str]:
    """Columns actually read (ReadSchema) by the scan whose location
    contains ``table_path_fragment`` — the column-pruning check."""
    plan = plan_string(df)
    for scan in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        if table_path_fragment in scan:
            m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
            if m:
                return [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
    return []


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = plan_string(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_string(df, "simple")))
