"""Distributed global ranking (operators/ranking.py): exact parity
with the single-window row_number/ntile, with no one-task window over
the data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ai_fabric_etl_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)
from ai_fabric_etl_spark.plans.inspect import plan_string


def _rows(spark, n, seed_mod=7):
    # non-unique sort value (forces tie-breaking) + unique key
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % seed_mod).alias("v")
    )


def test_global_row_number_matches_window(spark):
    df = _rows(spark, 997).repartition(5)
    got = {
        r.k: r.rn
        for r in global_row_number(
            df, [F.col("v").desc(), F.col("k")], out_col="rn"
        ).collect()
    }
    want = {
        r.k: r.rn
        for r in df.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("k"))),
        ).collect()
    }
    assert got == want


def test_global_ntile_matches_window_across_shapes(spark):
    # n % k == 0, n % k != 0, n < k, n == 1, k == 1
    for n, k in [(1000, 5), (997, 5), (3, 7), (1, 4), (50, 1)]:
        df = _rows(spark, n)
        got = {
            r.k: r.b
            for r in global_ntile(
                df, k, [F.col("v"), F.col("k")], out_col="b"
            ).collect()
        }
        want = {
            r.k: r.b
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy(F.col("v"), F.col("k")))
            ).collect()
        }
        assert got == want, f"ntile mismatch at n={n} k={k}"


def test_global_ntile_rejects_bad_buckets(spark):
    import pytest

    with pytest.raises(ValueError):
        global_ntile(_rows(spark, 10), 0, [F.col("k")])


def test_ranking_plan_is_range_partitioned_not_single_window(spark):
    """The data-bearing path range-partitions; the only unpartitioned
    window runs over the per-partition counts frame (<= shuffle
    partitions rows). No ntile/row_number over a SinglePartition
    exchange of the input."""
    df = _rows(spark, 1000)
    out = global_ntile(df, 5, [F.col("v"), F.col("k")], out_col="b")
    plan = plan_string(out, "simple")
    # no ntile window anywhere — the bucket is plain arithmetic
    assert "ntile" not in plan.lower()
    # the input frame never funnels through one partition: every
    # SinglePartition exchange feeds the global prefix-sum aggregate
    # (collect_list over <= shuffle-partition-count count rows), never
    # the data-bearing path
    chunks = plan.split("Exchange SinglePartition")[1:]
    assert chunks, "expected the prefix-sum aggregate's tiny exchange"
    for c in chunks:
        head = "\n".join(c.splitlines()[:4])
        assert "Aggregate" in head, f"single-partition over data:\n{c}"
    # the offsets path has NO window at all (the WindowExec
    # no-partition warning cannot fire) and no nested-loop/cartesian
    # shapes; the only Window is the per-partition local rank, which
    # is partitioned by pid
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the range shuffle itself is hidden behind the localCheckpoint in
    # the final plan; assert it on the pre-checkpoint path instead
    pre = df.repartitionByRange(F.col("v"), F.col("k"))
    assert "rangepartitioning" in plan_string(pre, "simple").lower()


def test_rfm_scores_match_plain_ntile(spark, sf_dir):
    """The RFM entry's distributed scores == the one-window reference
    on the same aggregate (the contract the DuckDB oracle hashes)."""
    from ai_fabric_etl_spark.queries.behavior_queries import (
        rfm_customer_segments,
    )

    got = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in rfm_customer_segments(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    maxd = orders.agg(F.max("o_orderdate").alias("d0"))
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .join(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff(F.col("d0"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    want = {
        r.o_custkey: (r.r, r.f, r.m)
        for r in rfm.select(
            "o_custkey",
            F.ntile(5)
            .over(Window.orderBy(F.col("recency_days").desc(), "o_custkey"))
            .alias("r"),
            F.ntile(5)
            .over(Window.orderBy(F.col("frequency"), F.col("o_custkey")))
            .alias("f"),
            F.ntile(5)
            .over(Window.orderBy(F.col("monetary"), F.col("o_custkey")))
            .alias("m"),
        ).collect()
    }
    assert got == want
