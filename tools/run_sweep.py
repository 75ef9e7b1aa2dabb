"""Standing full-registry sweep gate (VERDICT r7 item 8): run every
``queries()`` entry against its DuckDB oracle at sf0.001, sf0.01 AND
sf0.1 and record the result as ``SWEEP_r{N}.json`` — so each round
carries a committed artifact proving the whole registry, not just the
50 driver slots, is value-green at all three SFs.

Usage:
    python tools/run_sweep.py SWEEP_r08.json [sf_dir ...]

Defaults to the three driver SFs. Each sweep runs in-process (one
Spark session, one DuckDB connection per SF). The artifact records,
per SF: total entries, oracled entries, rows-only entries, failures
(names), and wall seconds. Exit code 1 if any SF has failures.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from verify_oracle import TABLES, result_fingerprint  # noqa: E402

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def sweep_one(spark, sf_dir: str) -> dict:
    import duckdb

    from ai_fabric_etl_spark.queries import catalog

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures, rows_only = [], 0
    t0 = time.time()
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            s_fp = result_fingerprint(
                sdf.columns, [tuple(r) for r in sdf.collect()]
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {sf_dir} {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_fp = result_fingerprint(
                [d[0] for d in res.description], res.fetchall()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {sf_dir} {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if s_fp != d_fp:
            failures.append(name)
            print(
                f"FAIL {sf_dir} {name}: spark(rows={s_fp[0]}, h={s_fp[2]}) "
                f"duck(rows={d_fp[0]}, h={d_fp[2]})"
            )
    con.close()
    return {
        "entries": len(qs),
        "oracled": len(qs) - rows_only,
        "rows_only": rows_only,
        "failures": failures,
        "seconds": round(time.time() - t0, 1),
    }


def main() -> int:
    out = sys.argv[1]
    sfs = sys.argv[2:] or DEFAULT_SFS

    from ai_fabric_etl_spark.session import get_spark

    spark = get_spark("registry_sweep")
    report = {}
    for sf in sfs:
        report[sf] = sweep_one(spark, sf)
        print(
            f"{sf}: {report[sf]['entries']} entries, "
            f"{len(report[sf]['failures'])} failures, "
            f"{report[sf]['seconds']}s"
        )
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    bad = sum(len(r["failures"]) for r in report.values())
    print(f"wrote {out}: {bad} total failures")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
