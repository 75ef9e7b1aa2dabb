"""Assemble a SCALE_r{N}.json from scale-subset bench runs.

Usage:
    python tools/scale_report.py OUT.json SF01.out SF1.out SF2.out [SF4.out]

Each input is the stdout of
``SPARK_GRAFT_BENCH_QUERIES=scale SPARK_GRAFT_SF_DIR=<dir> python
bench.py`` (the last line is the bench JSON). The report records
per-query seconds at each scale point, the 10x/20x/40x wall ratios,
and the per-doubling ratios sf1->sf2 and sf2->sf4 — the knee evidence
VERDICT r7 item 3 asks for: a stable (<=~2.1x) per-doubling ratio at
two successive doublings demonstrates the suite is in its linear
regime, not just between two lucky points.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    line = open(path).read().strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    out_path, p01, p1, p2 = sys.argv[1:5]
    p4 = sys.argv[5] if len(sys.argv) > 5 else None
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
