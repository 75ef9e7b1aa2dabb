"""The printed bench line must survive the driver's 2000-char
stdout-tail capture: rounds 5 and 6 lost their parsed bench records
because the queries dict pushed the JSON line past the cap, cutting
off the opening brace. compact_line guarantees the budget for any
suite size."""

import json
import random
import string

import bench


def _fake_out(n_queries: int, name_len: int = 28) -> dict:
    rng = random.Random(7)
    qs = {
        "".join(rng.choices(string.ascii_lowercase + "_", k=name_len))
        + f"_{i}": round(rng.uniform(0.05, 9.5), 3)
        for i in range(n_queries)
    }
    return {
        "metric": "headline_suite_seconds",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "x12_parse_files": 4096,
        "x12_parse_transactions": 8225,
        "x12_parse_seconds": 1.216,
        "x12_parse_tx_per_sec": 6761.9,
        "regressions": [
            {"query": q, "prev": 0.4, "cur": 0.9, "ratio": 2.25}
            for q in list(qs)[:9]
        ],
        "regressions_vs": "BENCH_r06.json",
    }


def test_current_suite_size_fits_without_folding():
    # 58 queries at real-world name lengths (the r6 shape that broke)
    out = _fake_out(58, name_len=24)
    line = bench.compact_line(out)
    assert len(line) <= bench.LINE_BUDGET
    doc = json.loads(line)
    assert doc["metric"] == "headline_suite_seconds"
    assert doc["value"] == out["value"]
    assert doc["sf"] == 0.1
    # per-query detail survives (2dp) for every entry when it fits
    if "other_queries" not in doc:
        assert set(doc["queries"]) == set(out["queries"])
    assert doc["regressions_n"] == 9
    assert len(doc["regressions"]) == 6  # capped pairs [query, ratio]


def test_oversized_suite_folds_cheapest_and_stays_parseable():
    out = _fake_out(400, name_len=30)
    line = bench.compact_line(out)
    assert len(line) <= bench.LINE_BUDGET
    doc = json.loads(line)
    assert "other_queries" in doc
    folded = doc["other_queries"]
    assert folded["n"] + len(doc["queries"]) == 400
    # folding starts from the cheapest rows: every surviving query
    # costs at least as much as every folded one
    survivor_min = min(doc["queries"].values())
    kept = set(doc["queries"])
    folded_max = max(
        round(v, 2) for k, v in out["queries"].items() if k not in kept
    )
    assert survivor_min >= folded_max
    # total seconds are preserved across the fold (2dp granularity)
    total = sum(doc["queries"].values()) + folded["sec"]
    assert abs(total - sum(round(v, 2) for v in out["queries"].values())) < 0.5


def test_errors_are_truncated_not_dropped():
    out = _fake_out(10)
    out["errors"] = {f"q{i}": "x" * 300 for i in range(8)}
    doc = json.loads(bench.compact_line(out))
    assert doc["errors_n"] == 8
    assert all(len(v) <= 80 for v in doc["errors"].values())
