"""Shared within-batch rejection policy for the streaming admission
gates (media_admission / text_admission / paired admission).

Policy — ONE REPRESENTATIVE PER NEAR-DUP COMPONENT (ADVICE r10): the
batch's near-pair graph (restricted to docs that survived the corpus
probe) is resolved with connected components; the smallest id in each
component is admitted, every other member is rejected with the
canonical as ``dup_of``. This replaces the r10 "any smaller-id
near-dup rejects" rule, which was non-greedy over chains: with A~B
and B~C (A not ~ C), it rejected C with dup_of=B even though B itself
was rejected — no admitted doc was a near-duplicate of C, and the
provenance pointed at a rejected row. Under the component rule the
invariant is mechanical: EVERY rejected row's ``dup_of`` is an
ADMITTED doc (the component canonical) or an index id. Chains still
over-delete relative to greedy first-wins (C rejects against A even
without a direct A~C pair — the conservative choice, and exactly the
semantics of the batch path's ``dedup.drop_near_duplicates``); the
metric column carries the DIRECT pair's value when the member is
directly paired with its canonical, NULL on transitive chains.

Scale: components run on the batch's pair list only (never payloads,
never the corpus) via the log-round large-star/small-star contraction
shared with the batch dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.dedup import neardup_components


def component_rejects(
    pairs: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    metric_col: str,
    extra_metric_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id_col, dup_of, metric_col, *extra_metric_cols)`` — one row
    per NON-canonical member of each within-batch near-dup component.
    ``pairs`` is the batch's survivor edge list (``a_col`` < ``b_col``
    plus metric columns: hamming, jaccard, matched_frames+shift, ...);
    the canonical (minimum id, always admitted) is never emitted. The
    metric columns carry the direct pair's values against the
    canonical, NULL for transitive members."""
    metrics = (metric_col, *extra_metric_cols)
    # The edge list is LOCALIZED first: it is decision-sized (pairs
    # among one micro-batch's probe survivors), and the component
    # loop's repeated self-joins would otherwise drag the full
    # hash/signature UDF lineage through every round — Spark cannot
    # evaluate a Python UDF inside the interpreted projections its
    # stage re-materialization sometimes falls back to.
    spark = pairs.sparkSession
    narrowed = pairs.select(
        F.col(a_col).alias("id_a"),
        F.col(b_col).alias("id_b"),
        *[F.col(m) for m in metrics],
    )
    local = spark.createDataFrame(narrowed.collect(), narrowed.schema)
    edges = local.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = neardup_components(edges)
    direct = local.select(
        F.col("id_a").alias("component"),
        F.col("id_b").alias("doc_id"),
        *[F.col(m) for m in metrics],
    )
    return (
        comp.filter(F.col("doc_id") != F.col("component"))
        .join(direct, ["component", "doc_id"], "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("component").alias("dup_of"),
            *[F.col(m) for m in metrics],
        )
    )
