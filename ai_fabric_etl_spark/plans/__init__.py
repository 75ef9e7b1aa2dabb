"""Physical-plan tooling: inspection assertions, skew mitigation,
bucketed co-located joins.

The reference has no optimizer of its own (SURVEY §4) — everything it
does is Catalyst-stock. This package is where the rebuild's *scale*
hygiene lives: helpers that keep plans honest (pushdown reached the
scan, the small side broadcast, the bucketed join didn't shuffle) and
operators for the cases Catalyst can't fix alone (hot-key salting).
"""

from ai_fabric_etl_spark.plans.bucketing import bucketize, is_shuffle_free_join
from ai_fabric_etl_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    plan_string,
    pushed_filters,
    scan_columns,
)
from ai_fabric_etl_spark.plans.skew import salted_aggregate

__all__ = [
    "plan_string",
    "pushed_filters",
    "scan_columns",
    "exchange_count",
    "broadcast_join_count",
    "salted_aggregate",
    "bucketize",
    "is_shuffle_free_join",
]
