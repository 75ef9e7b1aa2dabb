"""er_resolve_entities phase-timed isolation probe (VERDICT r13 item 3).

One FRESH process per repetition, bench-identical warmup, then:

1. two UN-instrumented timed runs — exactly the isolated bench
   protocol (cold + warm; the warm one is what BENCH_*_isolated
   reports), so the numbers are comparable to the artifact rows;
2. one additional instrumented run (SPARK_GRAFT_GATE_TIMINGS set
   in-process) that materializes each phase at its boundary and
   prints the per-phase wall — names agg / SymSpell pairs / star
   components / final agg remainder.

N repetitions give the cross-run variance the r13 verdict asked for
alongside the phase attribution.

Usage: python tools/er_phase_probe.py [n_reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from ai_fabric_etl_spark.session import get_spark
from ai_fabric_etl_spark.queries import catalog

spark = get_spark("er_probe")
sf = {sf!r}
# bench-identical warmup (JIT + footer caches + Python worker pool)
catalog.a1_transaction_summary(spark, sf).write.format("noop").mode(
    "overwrite"
).save()
spark.range(64).toDF("id").mapInPandas(
    lambda it: it, "id long"
).write.format("noop").mode("overwrite").save()

fn = catalog.queries()["er_resolve_entities"]
for run in ("cold", "warm"):
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print(f"ER_RUN {run} {time.perf_counter() - t0:.3f}", flush=True)

# phase attribution on a THIRD run: timings on, caches cleared so
# every phase re-pays its work instead of reading the earlier runs'
# persisted frames
spark.catalog.clearCache()
os.environ["SPARK_GRAFT_GATE_TIMINGS"] = "1"
t0 = time.perf_counter()
fn(spark, sf).write.format("noop").mode("overwrite").save()
print(f"ER_RUN phased {time.perf_counter() - t0:.3f}", flush=True)
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k != "SPARK_GRAFT_GATE_TIMINGS"}
    reps = []
    for i in range(n):
        p = subprocess.run(
            # literal substitution, NOT str.format: the child source's
            # own f-string braces ({run}, {time...}) would otherwise be
            # treated as format fields and raise KeyError
            [
                sys.executable,
                "-c",
                CHILD.replace("{repo!r}", repr(repo)).replace(
                    "{sf!r}", repr(sf)
                ),
            ],
            capture_output=True, text=True, env=env, cwd=repo,
        )
        text = p.stdout + p.stderr
        runs = dict(re.findall(r"ER_RUN (\w+) ([0-9.]+)", text))
        phases = {
            label.strip(): float(v)
            for label, v in re.findall(
                r"\[gate-timing er\] ([^:]+): \+([0-9.]+)s", text
            )
        }
        rep = {
            "cold": float(runs["cold"]) if "cold" in runs else None,
            "warm": float(runs["warm"]) if "warm" in runs else None,
            "phased_total": float(runs["phased"]) if "phased" in runs else None,
            "phases": phases,
        }
        if p.returncode != 0:
            rep["error"] = (p.stderr or "")[-500:]
        reps.append(rep)
        print(json.dumps({"rep": i, **rep}), flush=True)
    warms = [r["warm"] for r in reps if r.get("warm") is not None]
    if warms:
        import statistics as st

        summary = {
            "n": len(warms),
            "warm_min": min(warms),
            "warm_max": max(warms),
            "warm_mean": round(st.mean(warms), 3),
            "warm_stdev": round(st.stdev(warms), 3) if len(warms) > 1 else 0.0,
            "sf_dir": sf,
        }
        print("SUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
