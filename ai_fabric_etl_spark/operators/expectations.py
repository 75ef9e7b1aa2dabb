"""Declarative data-quality expectations: rule definitions compiled
into ONE validation pass, with quarantine split and an aggregate
violation report.

Generalizes the reference's hand-rolled X12 validators (SURVEY §2.10
U10/U11 — required-segment checks and the 100−20i−5w score,
silver_x12_parsing.py) into the reusable contract layer every
large-scale pipeline needs (the Great-Expectations/Delta-constraints
shape, rebuilt Spark-native):

- ROW rules are plain Column predicates, all evaluated in one
  projection — a single scan annotates every row with the names of
  the rules it fails (``_violations`` array), so quarantine routing is
  ``size(_violations) > 0``, no per-rule scans;
- the report is one aggregate over that same pass (per-rule violation
  counts + rates);
- DATASET rules (uniqueness, referential integrity) are aggregate/
  anti-join checks that union into the same report — uniqueness is one
  groupBy on the key, referential integrity a broadcast-able left-anti
  join, each O(1 shuffle).

At 100 TB the single-pass property is the design: k rules cost one
scan, not k; the quarantine write shares the scan via the annotated
frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- rules


def expect(name: str, predicate: Column) -> tuple[str, Column]:
    """A named row-level rule: the row PASSES where ``predicate`` is
    TRUE (NULL counts as a violation, matching SQL CHECK semantics
    being violated when not satisfied)."""
    return (name, predicate)


def expect_not_null(col: str) -> tuple[str, Column]:
    return expect(f"{col}_not_null", F.col(col).isNotNull())


def expect_between(col: str, lo, hi) -> tuple[str, Column]:
    return expect(
        f"{col}_between", (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def expect_in(col: str, values: list) -> tuple[str, Column]:
    return expect(f"{col}_in_set", F.col(col).isin(values))


def expect_regex(col: str, pattern: str) -> tuple[str, Column]:
    return expect(f"{col}_regex", F.col(col).rlike(pattern))


# ------------------------------------------------------------ validation


def annotate(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """One projection adding ``_violations``: the array of rule names
    the row fails (empty array = clean row). NULL predicate results
    count as failures (a rule that cannot prove the row clean flags
    it)."""
    flags = [
        F.when(~pred.eqNullSafe(F.lit(True)), F.lit(name)) for name, pred in rules
    ]
    return df.withColumn(
        "_violations",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): quarantined rows keep ``_violations`` for
    triage; clean rows drop it. Both sides derive from the SAME
    annotated single-pass frame."""
    ann = annotate(df, rules)
    clean = ann.filter(F.size("_violations") == 0).drop("_violations")
    bad = ann.filter(F.size("_violations") > 0)
    return clean, bad


def report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_keys: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Violation report: one row per rule —
    (rule, n_violations, n_rows, violation_ppm).

    ``violation_ppm`` is the violation rate in integer parts-per-
    million (floor of n_violations*1e6/n_rows, computed in exact
    integer arithmetic) — the repo's micro-unit discipline: a rounded
    double at 6dp is a cross-engine 1-ulp repr hazard, an integer
    ppm is bit-identical on any engine.

    Row rules share a single aggregate pass. ``unique_keys`` adds a
    ``unique_<cols>`` rule per key set (rows beyond the first in each
    duplicate group count as violations — total − distinct).
    ``references`` adds ``(col, dim_df, dim_col)`` referential checks:
    rows whose non-null value has no match in the dimension (left-anti
    against the dimension, broadcast when small)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules:
        aggs.append(
            F.sum(
                F.when(~pred.eqNullSafe(F.lit(True)), 1).otherwise(0)
            ).alias(name)
        )
    for keys in unique_keys or []:
        kname = f"unique_{'_'.join(keys)}"
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
                - F.sum(
                    F.when(
                        F.greatest(
                            *[F.col(k).isNull() for k in keys]
                        )
                        if len(keys) > 1
                        else F.col(keys[0]).isNull(),
                        1,
                    ).otherwise(0)
                )
            ).alias(kname)
        )
    base = df.agg(*aggs)
    rule_names = [name for name, _ in rules] + [
        f"unique_{'_'.join(k)}" for k in (unique_keys or [])
    ]
    long = base.select(
        F.col("_n"),
        F.expr(
            "stack({n}, {pairs}) as (rule, n_violations)".format(
                n=len(rule_names),
                pairs=", ".join(f"'{r}', {r}" for r in rule_names),
            )
        ),
    )
    out = long.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("_n").cast("long").alias("n_rows"),
        # exact integer ppm: long multiply then integer division —
        # never touches a double, so any oracle replays it exactly
        F.expr("CAST(n_violations AS BIGINT) * 1000000L div _n")
        .cast("long")
        .alias("violation_ppm"),
    )
    n_rows = None
    for col, dim, dim_col in references or []:
        if n_rows is None:
            n_rows = df.count()
        missing = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                on=col,
                how="left_anti",
            )
            .count()
        )
        ref_row = df.sparkSession.createDataFrame(
            [
                (
                    f"{col}_ref_{dim_col}",
                    missing,
                    n_rows,
                    # Python ints: exact floor ppm, same convention as
                    # the aggregate branch above
                    (missing * 1000000) // n_rows if n_rows else 0,
                )
            ],
            "rule string, n_violations long, n_rows long, violation_ppm long",
        )
        out = out.unionByName(ref_row)
    return out
