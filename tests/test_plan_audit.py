"""Fleet-wide plan-hazard gate: every bench-headline query's physical
plan must be free of cartesian products, row-at-a-time Python UDFs,
and unpartitioned (one-task) windows — or carry an explicit
justification in tools/plan_audit.py's WHITELIST. A plan regression
(a lost broadcast, an accidental global window) fails here instead of
at cluster scale."""

from __future__ import annotations


def test_headline_fleet_plans_hazard_free(spark, sf_dir):
    from tools.plan_audit import audit

    results = audit(sf_dir)
    errors = {n: r["error"] for n, r in results.items() if "error" in r}
    assert not errors, errors
    bad = {n: r["unlisted"] for n, r in results.items() if r.get("unlisted")}
    assert not bad, f"unwhitelisted plan hazards: {bad}"


def test_global_window_detector_unit():
    from tools.plan_audit import _has_global_window

    assert _has_global_window(
        "Window [row_number() windowspecdefinition(x#3L ASC NULLS FIRST, "
        "specifiedwindowframe(...))]"
    )
    # partitioned window: first top-level arg is the partition column
    assert not _has_global_window(
        "Window [row_number() windowspecdefinition(user#5, ts#3 DESC "
        "NULLS LAST, specifiedwindowframe(...))]"
    )
    # partition expression containing parens/commas stays partitioned
    assert not _has_global_window(
        "windowspecdefinition(cast(a#1 as double), b#2 ASC NULLS FIRST, f)"
    )
    # ordering expression with a cast is still a global window
    assert _has_global_window(
        "windowspecdefinition(cast(a#1 as double) ASC NULLS FIRST, f)"
    )
