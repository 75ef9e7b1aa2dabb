"""Graph contract queries: fixed-iteration PageRank over the
customer→supplier purchase graph and pointer-doubling hierarchy
closure — iterative algorithms as bounded DataFrame-join cascades,
each with a full DuckDB value oracle (the PageRank unrolls to a CTE
cascade; the closure to WITH RECURSIVE, which Spark lacks — the
pointer-doubling plan is the engine's answer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.graph import pagerank, resolve_roots
from ai_fabric_etl_spark.queries.catalog import _t, register

_PR_D = 0.85
_PR_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS s, l.l_suppkey + 10000000 AS d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
deg AS (SELECT s, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY s),
r0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS rank FROM nodes),
r1 AS (
  SELECT nodes.node,
         (1 - {_PR_D}) / (SELECT cnt FROM n)
         + {_PR_D} * COALESCE(SUM(r0.rank / deg.deg), 0) AS rank
  FROM nodes
  LEFT JOIN e ON e.d = nodes.node
  LEFT JOIN r0 ON r0.node = e.s
  LEFT JOIN deg ON deg.s = e.s
  GROUP BY nodes.node
),
r2 AS (
  SELECT nodes.node,
         (1 - {_PR_D}) / (SELECT cnt FROM n)
         + {_PR_D} * COALESCE(SUM(r1.rank / deg.deg), 0) AS rank
  FROM nodes
  LEFT JOIN e ON e.d = nodes.node
  LEFT JOIN r1 ON r1.node = e.s
  LEFT JOIN deg ON deg.s = e.s
  GROUP BY nodes.node
),
r3 AS (
  SELECT nodes.node,
         (1 - {_PR_D}) / (SELECT cnt FROM n)
         + {_PR_D} * COALESCE(SUM(r2.rank / deg.deg), 0) AS rank
  FROM nodes
  LEFT JOIN e ON e.d = nodes.node
  LEFT JOIN r2 ON r2.node = e.s
  LEFT JOIN deg ON deg.s = e.s
  GROUP BY nodes.node
)
SELECT node, ROUND(rank, 6) AS rank FROM r3
"""


@register("graph_pagerank_suppliers", oracle=_PR_ORACLE)
def graph_pagerank_suppliers(spark, sf_dir):
    """Three PageRank iterations over who-bought-from-whom (customer →
    supplier edges from orders⋈lineitem, supplier ids offset into
    their own node space). Fixed iteration count makes the engine plan
    a compile-time join cascade — no driver convergence loop — and
    the oracle an exact CTE unroll. Simplified no-dangling-mass
    variant on both sides (documented in operators/graph.py)."""
    edges = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 10000000).alias("dst"),
        )
    )
    return pagerank(edges, iterations=3, damping=_PR_D)


_ROOTS_ORACLE = """
WITH RECURSIVE h AS (
  SELECT c_custkey AS id, c_custkey AS root, 0 AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, h.root, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey // 10 = h.id
  WHERE c.c_custkey >= 10
)
SELECT id, root, depth FROM h
"""


@register("graph_hierarchy_roots", oracle=_ROOTS_ORACLE)
def graph_hierarchy_roots(spark, sf_dir):
    """Transitive closure of a synthetic customer forest (parent =
    custkey DIV 10, roots below 10): every node's root and exact
    depth. Spark has no recursive CTE, so the engine resolves by
    POINTER DOUBLING — ⌈log2 depth⌉ self-joins instead of one join
    per level; the oracle is DuckDB's WITH RECURSIVE walking the same
    forest level by level."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") < 10, F.lit(None))
        .otherwise(F.expr("c_custkey DIV 10"))
        .alias("parent"),
    )
    return resolve_roots(cust, id_col="id", parent_col="parent")


_TRI_ORACLE = """
WITH li AS (
  SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e0 AS (
  SELECT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
  ) GROUP BY node
),
dir AS (
  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.u ELSE e0.v END AS src,
         CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.v ELSE e0.u END AS dst
  FROM e0 JOIN deg du ON du.node = e0.u JOIN deg dv ON dv.node = e0.v
),
wedges AS (
  SELECT w1.src AS a, w1.dst AS p, w2.dst AS q
  FROM dir w1 JOIN dir w2 ON w1.src = w2.src AND w1.dst < w2.dst
),
tris AS (
  SELECT a, p, q FROM wedges JOIN e0 ON e0.u = wedges.p AND e0.v = wedges.q
)
SELECT node, COUNT(*) AS n_triangles
FROM (SELECT a AS node FROM tris UNION ALL SELECT p FROM tris
      UNION ALL SELECT q FROM tris)
GROUP BY node
"""


@register("graph_triangle_counts", oracle=_TRI_ORACLE)
def graph_triangle_counts(spark, sf_dir):
    """Per-part triangle counts over the co-occurrence graph (parts
    linked when they appear in the same order) — the
    clustering-coefficient numerator for product-affinity analysis.

    The EDGE construction is itself scale-bounded: pairs are keyed on
    the order, so the candidate space is Σ (lines-per-order choose 2)
    — linear in lineitem, never customers × suppliers² (the earlier
    supplier co-purchase demo densified into a near-complete graph
    at sf0.1, exactly the blow-up this graph shape avoids; max degree
    here stays ~220 from sf0.001 to sf0.1 while nodes grow 100×).
    Degree orientation then caps wedge fan-out at O(sqrt(E)) per node
    (operators/graph.triangle_counts); the oracle replays edges,
    orientation, and wedge closure relationally. Exact integer
    output — no rounding convention needed."""
    from ai_fabric_etl_spark.operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    # per-order pair expansion from one groupBy instead of a lineitem
    # self-join: the sorted part set gives u < v for free (suffix
    # pairs of an ascending array), one exchange of lineitem replaces
    # two join-leg exchanges + the join sort, and per-row memory is
    # O(lines per order). Identical edge set: distinct unordered part
    # pairs co-occurring in an order. (r14 measured this build slower
    # under the wedge-join consumer, which exploited the join's
    # partitioning; the r15 edge-iterator consumer has no such
    # partitioning to lose and the A/B flipped.)
    grp = li.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("_ps"))
    edges = (
        grp.select("_ps", F.posexplode("_ps").alias("_i", "u"))
        .select(
            "u",
            F.explode(
                F.slice(
                    "_ps",
                    F.col("_i") + F.lit(2),
                    F.size("_ps") - F.col("_i") - F.lit(1),
                )
            ).alias("v"),
        )
        .distinct()
    )
    return triangle_counts(edges)
