"""Lakehouse-semantics contract queries: MERGE / DELETE / sink
round-trips made driver-visible with full DuckDB value oracles.

The reference upserts running aggregates through Postgres ``ON
CONFLICT DO UPDATE`` (local-development/process_test_data.py:112-148)
and reads/writes lakehouse tables (generate_x12_acknowledgments.py:61);
this engine's stand-in is :class:`ParquetMergeTable` (versioned parquet
+ atomically swapped pointer). These entries prove the MERGE semantics
— update-on-match, insert-on-miss, matched-delete, and the partitioned
sink write path — against an independent SQL oracle, not just pytest.

Each query materializes into a fresh per-process temp dir, so driver
re-runs are idempotent.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.merge import ParquetMergeTable
from ai_fabric_etl_spark.queries.catalog import _t, register

_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_custkey
  FROM orders WHERE o_orderkey % 4 <> 3
),
src AS (
  SELECT o_orderkey,
         'U' AS o_orderstatus,
         o_custkey + 1000000 AS o_custkey,
         ((o_custkey + 1000000) % 10 = 7) AS tomb
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT COALESCE(b.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
            ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
            ELSE b.o_custkey END AS o_custkey
FROM base b FULL OUTER JOIN src s ON b.o_orderkey = s.o_orderkey
WHERE NOT (b.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL AND s.tomb)
"""


@register("lakehouse_merge_orders", oracle=_MERGE_ORACLE)
def lakehouse_merge_orders(spark, sf_dir):
    """MERGE INTO semantics end-to-end through the versioned table:
    update-on-match, insert-on-miss, WHEN MATCHED AND tomb THEN DELETE
    — the oracle replays the same merge as one relational expression.

    Replaces the reference's row-at-a-time ON CONFLICT DO UPDATE loop
    (process_test_data.py:112-148) with one key-partitioned full-outer
    join; at 100 TB the join touches only affected partitions when the
    table is partitioned by the merge key (Delta file pruning does the
    same automatically)."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 != 3).select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    src = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_custkey") + 1000000).alias("o_custkey"),
    )
    t = ParquetMergeTable(
        spark, os.path.join(tempfile.mkdtemp(prefix="lakehouse_merge_"), "t")
    )
    t.overwrite(base)
    t.merge(src, keys=["o_orderkey"], delete_condition="o_custkey % 10 = 7")
    return t.read()


_SINK_ORACLE = """
SELECT o_orderstatus,
       CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS order_year,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE CAST(strftime(o_orderdate, '%Y') AS INTEGER) = 1995
GROUP BY o_orderstatus, order_year
"""


@register("sink_partitioned_roundtrip", oracle=_SINK_ORACLE)
def sink_partitioned_roundtrip(spark, sf_dir):
    """Partitioned-sink round trip (SURVEY S6/S7): write orders
    partitioned by (o_orderstatus, order_year) — the reference's
    year/month/day landing layout, silver_x12_parsing.py:1450 — then
    read the directory back with a partition filter and aggregate.
    The read's partition pruning is what makes the sink layout matter
    at 100 TB: the 1995 filter must scan only 1995 directories (plan
    asserted in test_plans; here the VALUES prove write→read
    fidelity)."""
    out = os.path.join(tempfile.mkdtemp(prefix="sink_roundtrip_"), "orders_part")
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy(
        "o_orderstatus", "order_year"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("order_year") == 1995)
    return back.groupBy("o_orderstatus", "order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
