"""Fleet-wide physical-plan hazard audit.

Builds every bench-headline query's DataFrame at a small SF and scans
the PHYSICAL plan string for the patterns that kill 100 TB jobs:

- ``CartesianProduct``            — unconstrained n×m join
- ``BatchEvalPython``             — row-at-a-time Python UDF (the slow
                                    path; Arrow variants are fine)
- global windows                  — ``windowspecdefinition`` whose
                                    spec starts with an ORDER clause
                                    (no partition columns → one-task
                                    stage on a data-sized frame)

Each hazard must be either absent or explicitly whitelisted here with
a justification — a new unlisted hazard fails the pytest gate
(tests/test_plan_audit.py), which is how a plan regression (a lost
broadcast, an accidental global window) surfaces at review time
instead of at cluster scale.

Usage: ``python tools/plan_audit.py [sf_dir]`` prints a per-query
hazard table and exits nonzero on unwhitelisted findings.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hazard -> regex over the executedPlan string
HAZARDS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "python_row_udf": re.compile(r"BatchEvalPython"),
}


def _has_global_window(plan: str) -> bool:
    """True when any windowspecdefinition's FIRST top-level argument
    is an ordering expression (``expr ASC/DESC NULLS ...``) — i.e. the
    window has no partition columns and funnels its whole input
    through one task. Needs a balanced-paren scan: partition and order
    expressions can themselves contain commas/parens (casts, struct
    fields), so a flat regex misreads partitioned windows."""
    needle = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(needle, i)
        if i < 0:
            return False
        j = i + len(needle)
        depth = 0
        first_arg_end = None
        for k in range(j, min(len(plan), j + 2000)):
            c = plan[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    first_arg_end = k
                    break
                depth -= 1
            elif c == "," and depth == 0:
                first_arg_end = k
                break
        first = plan[j:first_arg_end] if first_arg_end else ""
        if first.endswith((" ASC NULLS FIRST", " ASC NULLS LAST",
                           " DESC NULLS FIRST", " DESC NULLS LAST")):
            return True
        i = j
    return False

# query -> {hazard: justification}; keep every entry justified.
# Currently EMPTY: the whole headline fleet plans hazard-free (the
# distributed-ranking offset frames are windowless collect_list
# scans since r5, so even the bounded-frame exemption is unused).
WHITELIST: dict[str, dict[str, str]] = {}


def audit(sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from ai_fabric_etl_spark.queries import queries
    from ai_fabric_etl_spark.session import get_spark

    import bench

    spark = get_spark("plan_audit")
    qs = queries()
    targets = names or [n for n in bench.HEADLINE if n in qs]
    out: dict[str, dict] = {}
    for name in targets:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, keep auditing
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        found = {
            hz: bool(rx.search(plan)) for hz, rx in HAZARDS.items()
        }
        found["global_window"] = _has_global_window(plan)
        hits = [hz for hz, f in found.items() if f]
        unlisted = [
            hz for hz in hits if hz not in WHITELIST.get(name, {})
        ]
        out[name] = {"hazards": hits, "unlisted": unlisted}
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    results = audit(sf_dir)
    bad = 0
    for name, r in sorted(results.items()):
        if "error" in r:
            print(f"ERR  {name}: {r['error']}")
            bad += 1
        elif r["unlisted"]:
            print(f"FAIL {name}: unwhitelisted hazards {r['unlisted']}")
            bad += 1
        elif r["hazards"]:
            print(f"ok   {name} (whitelisted: {r['hazards']})")
        else:
            print(f"ok   {name}")
    print(f"\n{bad} queries with unwhitelisted hazards/errors")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
