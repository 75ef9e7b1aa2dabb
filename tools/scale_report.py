"""Assemble a SCALE_r{N}.json from scale-subset bench runs.

Usage:
    python tools/scale_report.py OUT.json SF01.out SF1.out SF2.out [SF4.out]
        [--sf2-dir DIR --sf4-dir DIR]

Each input is the stdout of
``SPARK_GRAFT_BENCH_QUERIES=scale SPARK_GRAFT_SF_DIR=<dir> python
bench.py`` (the last line is the bench JSON). The report records
per-query seconds at each scale point, the 10x/20x/40x wall ratios,
and the per-doubling ratios sf1->sf2 and sf2->sf4 — the knee evidence
VERDICT r7 item 3 asks for: a stable (<=~2.1x) per-doubling ratio at
two successive doublings demonstrates the suite is in its linear
regime, not just between two lucky points.

Isolated re-run protocol (VERDICT r10 item 2): late-suite contention
(shuffle spill, cache/GC pressure from 40+ prior queries) recurs as
phantom superlinearity — the r9 ENOSPC and r10 j1/dp_counts episodes
were all cleared by hand re-measures that covered only some outliers.
Now it is mechanical: when ``--sf2-dir``/``--sf4-dir`` are given, any
query whose in-suite sf2->sf4 doubling exceeds ISOLATION_THRESHOLD
(2.1x) is automatically re-run ALONE in a fresh bench process at both
scale points, and the row records the isolated numbers next to the
in-suite ones — so every flagged row ships with its
contention-vs-real-knee verdict in the same artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ISOLATION_THRESHOLD = 2.1
# VERDICT r13 item 5: the two mechanical gates that bound the
# sf2->sf4 drift story. A row's EFFECTIVE doubling (isolated when an
# isolated re-run exists, in-suite otherwise) must stay <= 2.1x, and
# the shared-suite (queries common with the comparison round's suite)
# sf2->sf4 wall ratio must stay <= 1.5x.
PER_ROW_DOUBLING_GATE = 2.1
SHARED_SUITE_SF2_SF4_GATE = 1.5


def _load(path: str) -> dict:
    line = open(path).read().strip().splitlines()[-1]
    return json.loads(line)


def _isolated_run(query: str, sf_dir: str) -> float | None:
    """One query, fresh Spark session, nothing else in the process —
    the bench's own single-query subset mode."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_QUERIES=query,
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=here,
        timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
        except json.JSONDecodeError:
            continue
        return out.get("queries", {}).get(query)
    return None


def main() -> int:
    # argparse, not hand-split argv (ADVICE r11: flag VALUES leaked
    # into the positional list, shifting every positional when flags
    # preceded them or when SF4 was omitted)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_path")
    ap.add_argument("sf01")
    ap.add_argument("sf1")
    ap.add_argument("sf2")
    ap.add_argument("sf4", nargs="?", default=None)
    ap.add_argument("--sf2-dir", dest="sf2_dir", default=None)
    ap.add_argument("--sf4-dir", dest="sf4_dir", default=None)
    ap.add_argument(
        "--shared-with", dest="shared_with", default=None,
        help="prior SCALE_r*.json: compute the comparable-suite "
        "doublings over the queries both suites share, and gate the "
        "shared sf2->sf4 ratio at %.1fx" % SHARED_SUITE_SF2_SF4_GATE,
    )
    ns = ap.parse_args()
    out_path, p01, p1, p2, p4 = ns.out_path, ns.sf01, ns.sf1, ns.sf2, ns.sf4
    opts = {"--sf2-dir": ns.sf2_dir, "--sf4-dir": ns.sf4_dir}
    b01, b1, b2 = _load(p01), _load(p1), _load(p2)
    b4 = _load(p4) if p4 else None
    qs = {}
    ratios = []
    for q, t01 in b01["queries"].items():
        row = {"sf0.1": t01}
        if q in b1["queries"]:
            row["sf1"] = b1["queries"][q]
            row["ratio"] = round(b1["queries"][q] / t01, 2) if t01 else None
            if row["ratio"]:
                ratios.append(row["ratio"])
        if q in b2["queries"]:
            row["sf2"] = b2["queries"][q]
            row["ratio_20x"] = (
                round(b2["queries"][q] / t01, 2) if t01 else None
            )
            if "sf1" in row and row["sf1"]:
                row["doubling_sf1_sf2"] = round(row["sf2"] / row["sf1"], 2)
        if b4 and q in b4["queries"]:
            row["sf4"] = b4["queries"][q]
            if "sf2" in row and row["sf2"]:
                row["doubling_sf2_sf4"] = round(row["sf4"] / row["sf2"], 2)
        qs[q] = row

    # isolated re-runs for every in-suite doubling outlier
    sf2_dir, sf4_dir = opts.get("--sf2-dir"), opts.get("--sf4-dir")
    n_isolated = 0
    if sf2_dir and sf4_dir:
        for q, row in qs.items():
            d = row.get("doubling_sf2_sf4")
            if d is None or d <= ISOLATION_THRESHOLD:
                continue
            i2 = _isolated_run(q, sf2_dir)
            i4 = _isolated_run(q, sf4_dir)
            row["isolated"] = {
                "sf2": i2,
                "sf4": i4,
                "doubling_sf2_sf4": (
                    round(i4 / i2, 2) if i2 and i4 else None
                ),
            }
            n_isolated += 1
            print(
                f"isolated re-run {q}: in-suite {d}x -> isolated "
                f"{row['isolated']['doubling_sf2_sf4']}x "
                f"({i2}s -> {i4}s)"
            )

    report = {
        "generator": (
            "tools/gen_scale.py sf0.1 -> sf1 (x10) / sf2 (x20)"
            + (" / sf4 (x40)" if b4 else "")
            + " replica-remap: replica-local joins, replica-distinct "
            "text/embeddings"
        ),
        "suite": (
            f"bench.py SCALE_HEADLINE ({len(b01['queries'])} "
            "linear-by-construction queries)"
        ),
        "isolated_protocol": (
            f"every query whose in-suite sf2->sf4 doubling exceeds "
            f"{ISOLATION_THRESHOLD}x is re-run alone in a fresh bench "
            f"process at sf2 and sf4; {n_isolated} rows re-run"
            if sf2_dir and sf4_dir
            else "disabled (pass --sf2-dir/--sf4-dir)"
        ),
        "sf0.1_seconds": b01["value"],
        "sf1_seconds": b1["value"],
        "sf2_seconds": b2["value"],
        "wall_ratio_for_10x_data": round(b1["value"] / b01["value"], 2),
        "wall_ratio_for_20x_data": round(b2["value"] / b01["value"], 2),
        "wall_ratio_sf1_to_sf2": round(b2["value"] / b1["value"], 2),
        "max_query_ratio": max(ratios) if ratios else None,
        "queries": qs,
    }
    if b4:
        report["sf4_seconds"] = b4["value"]
        report["wall_ratio_for_40x_data"] = round(b4["value"] / b01["value"], 2)
        report["wall_ratio_sf2_to_sf4"] = round(b4["value"] / b2["value"], 2)

    # --- VERDICT r13 item 5: the two mechanical gates ---
    flags: dict = {}
    offenders = {}
    for q, row in qs.items():
        eff = (row.get("isolated") or {}).get(
            "doubling_sf2_sf4"
        ) or row.get("doubling_sf2_sf4")
        if eff is not None and eff > PER_ROW_DOUBLING_GATE:
            offenders[q] = {
                "effective_sf2_sf4": eff,
                "isolated": "isolated" in row,
            }
    flags["per_row_gate"] = {
        "rule": f"effective (post-isolation) sf2->sf4 doubling <= "
                f"{PER_ROW_DOUBLING_GATE}",
        "offenders": offenders,
        "clean": not offenders,
    }
    if ns.shared_with and b4:
        prior = json.load(open(ns.shared_with))
        shared = sorted(set(qs) & set(prior.get("queries", {})))
        s1 = round(sum(qs[q].get("sf1", 0) for q in shared), 2)
        s2 = round(sum(qs[q].get("sf2", 0) for q in shared), 2)
        s4 = round(sum(qs[q].get("sf4", 0) for q in shared), 2)
        shared_d = round(s4 / s2, 2) if s2 else None
        report[f"comparable_{len(shared)}_query_doublings"] = {
            "note": (
                f"sf1->sf2 and sf2->sf4 wall ratios over the "
                f"{len(shared)} queries shared with "
                f"{os.path.basename(ns.shared_with)}'s suite (suite-mix "
                "additions excluded so rounds compare like-for-like)"
            ),
            "sf1_seconds": s1,
            "sf2_seconds": s2,
            "sf4_seconds": s4,
            "sf1_to_sf2": round(s2 / s1, 2) if s1 else None,
            "sf2_to_sf4": shared_d,
        }
        flags["shared_suite_gate"] = {
            "rule": f"shared-suite sf2->sf4 wall ratio <= "
                    f"{SHARED_SUITE_SF2_SF4_GATE}",
            "shared_sf2_to_sf4": shared_d,
            "clean": shared_d is not None
            and shared_d <= SHARED_SUITE_SF2_SF4_GATE,
        }
    report["flags"] = flags
    if offenders:
        print(f"PER-ROW GATE VIOLATION: {offenders}")
    if "shared_suite_gate" in flags and not flags["shared_suite_gate"]["clean"]:
        print(
            "SHARED-SUITE GATE VIOLATION: sf2->sf4 = "
            f"{flags['shared_suite_gate']['shared_sf2_to_sf4']}"
        )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    msg = (
        f"{out_path}: 10x data -> {report['wall_ratio_for_10x_data']}x wall, "
        f"20x -> {report['wall_ratio_for_20x_data']}x, "
        f"sf1->sf2 (exact 2x rows) -> {report['wall_ratio_sf1_to_sf2']}x"
    )
    if b4:
        msg += f", sf2->sf4 (exact 2x rows) -> {report['wall_ratio_sf2_to_sf4']}x"
    print(msg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
