"""Differential-privacy-SHAPED release mechanisms over aggregates.

The governance face a training-data platform needs next to
pseudonymization / k-anonymity / AEAD column crypto (see the
privacy_* entries in queries/lakehouse_queries.py): release GROUP
COUNTS about the corpus (per-source document counts, per-language
token volumes) with calibrated Laplace noise instead of exact values.

THE PRIVACY GUARANTEE IS CONDITIONAL ON THE SALT (ADVICE r10): the
Laplace draw is a keyed md5 PRG over (group key, salt), so anyone who
knows the salt recomputes the noise exactly and recovers the exact
aggregate — and re-releasing an evolving corpus under the same salt
leaks exact per-group differences. Membership is (epsilon)-deniable
ONLY against an adversary who does not know the salt, i.e. when the
salt is a SECRET drawn fresh per release (use :func:`fresh_salt`) and
epsilon is accounted per release. With a fixed, source-visible salt —
the mode every oracle-parity query entry in this repo uses — the
mechanism is a REPRODUCIBLE pseudo-DP release: bit-verifiable against
the DuckDB oracle, formally not differentially private. ``salt`` is
therefore a REQUIRED argument with no default: the trade is the
caller's visible decision, not a hidden constant.

All math is a fixed-order IEEE expression chain both engines evaluate
identically: u = (h52 + 0.5) / 2^52 in (0, 1) exactly, then the
Laplace inverse CDF -b*sign(u-1/2)*ln(1-2|u-1/2|), rounded to 6 dp.
"""

from __future__ import annotations

import secrets

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^13 = 2^52: 13 md5 hex chars convert exactly to a double
_H52 = 4503599627370496.0


def fresh_salt() -> str:
    """A cryptographically-random per-release salt (32 hex chars).
    This is the salt a PRODUCTION release must use for the epsilon
    guarantee to mean anything: unpredictable to the release's
    audience and never reused across releases of an evolving corpus.
    A release made with :func:`fresh_salt` is NOT replayable — do not
    use it for oracle-parity query entries."""
    return secrets.token_hex(16)


def _uniform(key: F.Column, salt: str) -> F.Column:
    """Deterministic uniform draw in the OPEN interval (0, 1): the
    +0.5 offset keeps u off both endpoints, so ln(1-2|u-0.5|) is
    always finite."""
    k = F.coalesce(key.cast("string"), F.lit("__NULL__"))
    h = F.conv(
        F.substring(F.md5(F.concat(k, F.lit(f"-{salt}")).cast("binary")), 1, 13),
        16,
        10,
    ).cast("double")
    return (h + F.lit(0.5)) / F.lit(_H52)


def laplace_noise(key: F.Column, epsilon: float, salt: str) -> F.Column:
    """Laplace(0, 1/epsilon) noise as a deterministic function of
    (group key, salt) — inverse-CDF over the keyed uniform draw. The
    draw is exactly recomputable by anyone who knows the salt; see
    the module docstring for what that does to the privacy claim."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    u = _uniform(key, salt)
    centered = u - F.lit(0.5)
    sign = (
        F.when(centered > 0, F.lit(1.0))
        .when(centered < 0, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    return (
        F.lit(-1.0 / epsilon)
        * sign
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    *,
    salt: str,
    out_col: str = "noisy_count",
) -> DataFrame:
    """Per-group COUNT(*) released with Laplace(1/epsilon) noise —
    counting queries have L1 sensitivity 1 (one row moves one group
    count by one), so this is the textbook epsilon-DP count SHAPE.
    The guarantee itself is conditional on ``salt`` being secret and
    fresh per release (:func:`fresh_salt`); a fixed salt makes this a
    reproducible pseudo-DP release — see the module docstring.
    Returns ``(group_col, out_col)`` with the noisy value rounded to
    the repo's 6-dp derived-double convention; the exact count never
    leaves the plan.

    Scale: one partial-aggregated groupBy; the noise is a per-GROUP
    codegen expression over the group key (no data-sized state, no
    second pass)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    noisy = F.round(
        F.col("_n").cast("double")
        + laplace_noise(F.col(group_col), epsilon, salt),
        6,
    )
    return counts.select(F.col(group_col), noisy.alias(out_col))


def laplace_noise_sql(key_expr: str, epsilon: float, salt: str) -> str:
    """The ANSI/DuckDB twin of :func:`laplace_noise` — the identical
    IEEE expression chain over the identical md5-derived uniform."""
    u = (
        f"((('0x' || substr(md5(COALESCE(CAST({key_expr} AS VARCHAR), "
        f"'__NULL__') || '-{salt}'), 1, 13))::BIGINT + 0.5) / {_H52!r})"
    )
    sign = (
        f"(CASE WHEN {u} - 0.5 > 0 THEN 1.0 "
        f"WHEN {u} - 0.5 < 0 THEN -1.0 ELSE 0.0 END)"
    )
    return (
        f"({-1.0 / epsilon!r} * {sign} * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )


def dp_noisy_sum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    *,
    salt: str,
    out_col: str = "noisy_sum_micro",
) -> DataFrame:
    """Per-group SUM released with bounded-contribution DP: each
    row's value is CLIPPED to [0, clip] first — without clipping a
    sum has unbounded sensitivity and no finite noise scale is
    private — then Laplace(clip/epsilon) noise is added (add/remove
    of one row moves the clipped sum by at most ``clip``). Returns
    ``(group_col, out_col)`` in integer MICRO-units
    (``noisy_sum_micro`` by default).

    Integer-micro output, not a rounded double: group sums reach
    magnitudes where one ulp of the decimal→double cast equals the
    6-dp rounding quantum (observed: a 2.7e9 sum diverged in the 6th
    decimal between engines), so the exact decimal sum converts to
    micro-units as a LONG (exact on both engines) and the single
    float product — clip·noise·1e6 — rounds to a long once. Same
    keyed-PRG salt condition as :func:`dp_noisy_counts`: the epsilon
    guarantee holds only under a secret, per-release salt
    (:func:`fresh_salt`); fixed salts are the oracle-parity mode."""
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clip)),
    )
    sums = df.groupBy(group_col).agg(
        F.sum(clipped.cast("decimal(18,4)")).alias("_sd")
    )
    s_micro = (F.col("_sd") * 1_000_000).cast("long")
    noise_micro = F.round(
        F.lit(float(clip))
        * laplace_noise(F.col(group_col), epsilon, salt)
        * F.lit(1000000.0),
        0,
    ).cast("long")
    return sums.select(
        F.col(group_col), (s_micro + noise_micro).alias(out_col)
    )
