"""Hot-key mitigation: salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed
*joins* at runtime, but a groupBy on a hot key still funnels that
key's rows into one reducer. Salting splits each key into
``n_salts`` subkeys for a partial aggregate, then combines partials —
two shuffles, but the first spreads the hot key across ``n_salts``
tasks. Worth it only when one key dominates; the API keeps the choice
explicit and the combine step generic over algebraic aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    combine_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, keyed
    by keys + salt). ``combine_aggs``: name -> aggregate over the
    phase-1 partial columns (phase 2, keyed by keys). The caller picks
    decomposable aggregates (count→sum, sum→sum, min→min, max→max,
    avg → sum+count pair).

    Example::

        salted_aggregate(
            events, ["event_type"],
            {"cnt": F.count(F.lit(1)), "val": F.sum("value")},
            {"cnt": F.sum("cnt"), "val": F.sum("val")},
        )
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in combine_aggs.items()]
    )
