"""Behavioral analytics over the events stream: sequential funnels,
cohort retention, grouped top-k — the product-analytics operators a
query engine is expected to answer natively (brief extension; the
reference's only event analytics are the KQL summarize/time-bucket
shapes, SURVEY §2.4 A9/A10).

Scale notes: every step keys on user_id, so the funnel is a chain of
co-partitioned aggregates (one shuffle each, no fact-fact storm);
cohort retention is two aggregates and a join on the cohort key;
top-k rides the prereduced window (k rows per partition per group
into the shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.sampling import topk_per_group
from ai_fabric_etl_spark.queries.catalog import _t, register

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_then_click,
       (SELECT COUNT(*) FROM s3) AS n_then_purchase,
       ROUND((SELECT COUNT(*) FROM s2) * 1.0
             / (SELECT COUNT(*) FROM s1), 6) AS click_rate,
       ROUND((SELECT COUNT(*) FROM s3) * 1.0
             / NULLIF((SELECT COUNT(*) FROM s2), 0), 6) AS purchase_rate
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE)
def funnel_view_click_purchase(spark, sf_dir):
    """Strict sequential funnel view → click → purchase: each step's
    timestamp must come after the user's EARLIEST completion of the
    previous step. Three co-partitioned aggregates chained on
    user_id — at 100 TB each step shuffles only the surviving users'
    events, and AQE reuses the user_id partitioning across steps."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .join(s2.agg(F.count(F.lit(1)).alias("n_then_click")))
        .join(s3.agg(F.count(F.lit(1)).alias("n_then_purchase")))
    )
    return counts.select(
        "n_view",
        "n_then_click",
        "n_then_purchase",
        F.round(F.col("n_then_click") / F.col("n_view"), 6).alias("click_rate"),
        F.round(
            F.col("n_then_purchase")
            / F.nullif(F.col("n_then_click"), F.lit(0)),
            6,
        ).alias("purchase_rate"),
    )


_COHORT_ORACLE = """
WITH cohort AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events
  GROUP BY user_id
),
active AS (
  SELECT DISTINCT e.user_id, c.cohort_date,
         date_diff('day', c.cohort_date, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN cohort c USING (user_id)
),
sizes AS (
  SELECT cohort_date, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_date
)
SELECT a.cohort_date, a.day_offset,
       COUNT(*) AS n_active,
       ROUND(COUNT(*) * 1.0 / s.cohort_size, 6) AS retention
FROM active a JOIN sizes s USING (cohort_date)
WHERE a.day_offset <= 7
GROUP BY a.cohort_date, a.day_offset, s.cohort_size
"""


@register("cohort_retention_weekly", oracle=_COHORT_ORACLE)
def cohort_retention_weekly(spark, sf_dir):
    """Cohort retention: users grouped by first-seen date, activity
    counted per day offset (first week). Two aggregates on user_id +
    one broadcastable join on the cohort key — the cohort/size table
    is tiny (one row per day) regardless of corpus size."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
        )
        .distinct()
        .filter(F.col("day_offset") <= 7)
    )
    sizes = cohort.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_date")
        .select(
            "cohort_date",
            "day_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


_TOPK_ORACLE = """
SELECT doc_id, source, n_chars
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY n_chars DESC, doc_id
) <= 3
"""


@register("topk_docs_per_source", oracle=_TOPK_ORACLE)
def topk_docs_per_source(spark, sf_dir):
    """Grouped top-k through the prereduced path: 3 longest documents
    per source. The mapInPandas prereduce bounds the shuffle at k
    rows per (group, partition); the oracle is the plain QUALIFY
    window."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return topk_per_group(
        docs, ["source"], "n_chars", k=3, tiebreak="doc_id", prereduce=True
    )


_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n_events,
         ROUND(AVG(value), 6) AS avg_value
  FROM events WHERE event_type IN ('purchase', 'error')
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1
),
grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
  FROM bounds b
)
SELECT g.event_type, g.h,
       COALESCE(hourly.n_events, 0) AS n_events,
       last_value(hourly.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_value_ffill
FROM grid g LEFT JOIN hourly ON hourly.event_type = g.event_type AND hourly.h = g.h
"""


@register("timeseries_gap_fill", oracle=_GAPFILL_ORACLE)
def timeseries_gap_fill(spark, sf_dir):
    """Gap filling over sparse hourly series: purchase/error activity
    densified to a complete per-type hourly grid — counts read 0 on
    missing hours, the average gauge carries forward. The grid is
    GENERATED per group from its own bounds (sequence + explode),
    never built by shuffling data; the repair join is co-partitioned
    with the aggregation that produced the series."""
    from ai_fabric_etl_spark.operators.temporal import fill_time_gaps
    from ai_fabric_etl_spark.queries.catalog import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "error")
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    filled = fill_time_gaps(
        hourly, by=["event_type"], ts_col="h", step_seconds=3600,
        fill_zero=["n_events"], ffill=["avg_value"],
    )
    return filled.select(
        "event_type", "h", "n_events",
        F.col("avg_value").alias("avg_value_ffill"),
    )


_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         AVG(n) AS mu,
         stddev_samp(n) AS sigma
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.d, d.n,
       ROUND((d.n - s.mu) / s.sigma, 6) AS zscore,
       ABS((d.n - s.mu) / s.sigma) > 2.0 AS is_anomaly
FROM daily d JOIN stats s USING (event_type)
WHERE s.sigma > 0
"""


@register("anomaly_zscore_daily", oracle=_ZSCORE_ORACLE)
def anomaly_zscore_daily(spark, sf_dir):
    """Volume-anomaly flags: per event type, each day's count scored
    against the type's own mean/stddev (|z| > 2 flags). One aggregate
    + one broadcast stats join — the daily-counts table is tiny
    regardless of event volume, so anomaly scoring costs one scan."""
    from ai_fabric_etl_spark.queries.catalog import load_events

    daily = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .select(
            "event_type", "d", "n",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


_SEQ_ORACLE = """
SELECT user_id,
       list(event_type ORDER BY ts, event_id)[:20] AS first_events,
       COUNT(*) AS n_events,
       MIN(ts) AS first_ts
FROM events
GROUP BY user_id
"""


@register("user_event_sequences", oracle=_SEQ_ORACLE)
def user_event_sequences(spark, sf_dir):
    """Per-user ordered event sequences (the behavioral-cloning /
    session-modeling export): each user's first 20 event types in
    strict (ts, event_id) order as an array column — sort inside the
    aggregation buffer (sort_array over collected structs), not a
    global sort; one shuffle on user_id."""
    from ai_fabric_etl_spark.queries.catalog import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("ts").alias("ts"),
                                F.col("event_id").alias("event_id"),
                                F.col("event_type").alias("et"),
                            )
                        )
                    ),
                    lambda s: s["et"],
                ),
                1,
                20,
            ).alias("first_events"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
        )
    )


_AFFINITY_ORACLE = """
WITH lines AS (
  SELECT DISTINCT l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
  FROM lines a JOIN lines b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
)
SELECT brand_a, brand_b, COUNT(*) AS support
FROM pairs
GROUP BY brand_a, brand_b
HAVING COUNT(*) >= 10
"""


@register("affinity_brand_pairs", oracle=_AFFINITY_ORACLE)
def affinity_brand_pairs(spark, sf_dir):
    """Market-basket co-occurrence: brand pairs appearing in the same
    order, support-floored (frequent-itemset mining's pair pass).
    The self-join keys on l_orderkey, so the pair space is bounded by
    per-order line counts (≤ 7 in this schema), never the catalog —
    the part dimension broadcasts ahead of the order-key shuffle."""
    lines = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = lines.alias("a")
    b = lines.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 10)
    )


_TRANSITION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n_transitions
FROM ordered
WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark, sf_dir):
    """Behavioral transition matrix: consecutive event-type pairs per
    user in strict (ts, event_id) order (the Markov-chain estimate of
    session behavior). One window on user_id + one small aggregate."""
    from ai_fabric_etl_spark.queries.catalog import load_events
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


_RFM_ORACLE = """
WITH maxd AS (SELECT MAX(o_orderdate) AS d0 FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), (SELECT d0 FROM maxd)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
       ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
       ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
FROM rfm
"""


@register("rfm_customer_segments", oracle=_RFM_ORACLE)
def rfm_customer_segments(spark, sf_dir):
    """RFM segmentation: per customer recency (days before the
    corpus's last order date), order frequency, and monetary total,
    each ntile(5)-scored (higher = better, ties broken by key for
    determinism). One aggregate + three DISTRIBUTED ntile passes
    (operators/ranking.global_ntile: range shuffle + per-partition
    rank + offset cumsum) — the customer grain is "small" relative to
    orders but still runs to hundreds of millions at 100 TB, so no
    pass may collapse into a one-task global window. The
    exact-decimal monetary sum keeps the oracle bit-equal."""
    from ai_fabric_etl_spark.operators.ranking import global_ntile

    orders = _t(spark, sf_dir, "orders")

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
    scored = global_ntile(
        rfm,
        5,
        [F.col("recency_days").desc(), F.col("o_custkey")],
        out_col="r_score",
    )
    scored = global_ntile(
        scored, 5, [F.col("frequency"), F.col("o_custkey")], out_col="f_score"
    )
    scored = global_ntile(
        scored, 5, [F.col("monetary"), F.col("o_custkey")], out_col="m_score"
    )
    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


_WINSOR_ORACLE = """
WITH q AS (
  SELECT o_orderstatus,
         quantile_disc(o_totalprice, 0.05) AS p5,
         quantile_disc(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o.o_totalprice < q.p5 THEN 1
                     WHEN o.o_totalprice > q.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, q.p5), q.p95)
                AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_total
FROM orders o JOIN q USING (o_orderstatus)
GROUP BY o.o_orderstatus
"""


@register("winsorize_prices", oracle=_WINSOR_ORACLE)
def winsorize_prices(spark, sf_dir):
    """Winsorization (outlier clamping to the per-group [p5, p95]
    discrete quantiles — the robust-statistics preprocessing step):
    quantile bounds from one small aggregate broadcast back onto the
    scan, clamp + clipped-count in the same pass. The discrete
    quantile (rank = max(1, ceil(q·n)), an actual data value) is the
    cross-engine-safe convention this repo's sketches already pin."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    # discrete quantiles per group, exactly DuckDB's quantile_disc:
    # sort inside the group via window rank over value
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    ranked = orders.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus"))
    )
    q = ranked.groupBy("o_orderstatus").agg(
        F.min(
            F.when(
                F.col("_rn")
                >= F.greatest(F.lit(1), F.ceil(0.05 * F.col("_n"))),
                F.col("o_totalprice"),
            )
        ).alias("p5"),
        F.min(
            F.when(
                F.col("_rn")
                >= F.greatest(F.lit(1), F.ceil(0.95 * F.col("_n"))),
                F.col("o_totalprice"),
            )
        ).alias("p95"),
    )
    clamped = orders.join(F.broadcast(q), "o_orderstatus").select(
        "o_orderstatus",
        "o_totalprice",
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("p5")), F.col("p95")
        ).alias("_wins"),
        (
            (F.col("o_totalprice") < F.col("p5"))
            | (F.col("o_totalprice") > F.col("p95"))
        ).cast("int").alias("_clip"),
    )
    return clamped.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("_clip").cast("long").alias("n_clipped"),
        F.sum(F.col("_wins").cast("decimal(18,2)"))
        .cast("double")
        .alias("winsorized_total"),
    )


_ATTRIB_ORACLE = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id AS touch_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.purchase_id, p.value, t.touch_id, t.touch_type
  FROM p LEFT JOIN t
    ON p.user_id = t.user_id
   AND t.t_ts BETWEEN p.p_ts - INTERVAL 3600 SECOND AND p.p_ts
),
c AS (
  SELECT purchase_id, value, touch_id, touch_type,
         COUNT(touch_id) OVER (PARTITION BY purchase_id) AS n
  FROM j
)
SELECT CASE WHEN touch_id IS NULL THEN 'direct' ELSE touch_type END AS channel,
       COUNT(*) AS n_credits,
       COUNT(DISTINCT purchase_id) AS n_purchases,
       CAST(ROUND(SUM(CAST(ROUND(
           CASE WHEN touch_id IS NULL THEN value ELSE value / n END, 6)
         AS DECIMAL(18,6))), 4) AS DOUBLE) AS attributed_value
FROM c
GROUP BY 1
"""


@register("attribution_linear_touch", oracle=_ATTRIB_ORACLE)
def attribution_linear_touch(spark, sf_dir):
    """Multi-touch linear attribution: each purchase's value is split
    equally across the user's view/click touchpoints in the hour up
    to the purchase (inclusive); purchases with no touchpoint credit
    'direct'. The marketing-analytics workload the funnel/cohort
    entries don't cover: a windowed range join feeding a per-purchase
    credit split.

    Plan: temporal.range_join's bucketed equi-join (no interval
    cross-product — touches hash-join on (user, hour-bucket) then
    filter exactly), how="left" keeps direct purchases via the
    row-id recovery path; the credit divisor is one window over
    purchase_id (single-purchase groups, never skewed). Each credit
    term rounds to 6 dp BEFORE the exact-decimal sum so engine ulps
    in value/n cannot reach the driver hash."""
    from ai_fabric_etl_spark.operators.temporal import range_join
    from ai_fabric_etl_spark.queries.catalog import load_events
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    j = range_join(
        purchases,
        touches,
        by=["user_id"],
        left_ts="p_ts",
        right_ts="t_ts",
        before_seconds=3600.0,
        after_seconds=0.0,
        how="left",
    )
    n = F.count("touch_id").over(Window.partitionBy("purchase_id"))
    credited = j.select(
        "purchase_id",
        F.when(F.col("touch_id").isNull(), F.lit("direct"))
        .otherwise(F.col("touch_type"))
        .alias("channel"),
        F.round(
            F.when(F.col("touch_id").isNull(), F.col("value")).otherwise(
                F.col("value") / n
            ),
            6,
        ).alias("credit"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.round(F.sum(F.col("credit").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("attributed_value"),
    )
