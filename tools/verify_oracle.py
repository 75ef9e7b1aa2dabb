"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
sorted column names, and an order-insensitive value hash.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # scale-preserving: Decimal('1.230000') canons as '1.230000',
        # distinct from float 1.23's repr — a DECIMAL/HUGEINT oracle
        # column mismatching a Spark double/long FAILS here, as it
        # does on the driver (it used to pass under fetchall())
        return str(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def result_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from ai_fabric_etl_spark.queries import catalog
    from ai_fabric_etl_spark.session import get_spark

    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            s_n, s_cols, s_h = result_fingerprint(scols, srows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={s_n} (no oracle — rows-only check)")
            continue
        try:
            # Arrow fetch, NOT .fetchall(): fetchall() collapses
            # DuckDB HUGEINT to Python int, masking the exact
            # representation-class divergence the driver's fetch path
            # sees (r13's two driver-red rows). Arrow yields Decimal
            # for HUGEINT/DECIMAL, so canon() exposes it here too.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = tbl.column_names
            # positional, not to_pylist() dicts (which would collapse
            # duplicate column names)
            drows = list(
                zip(*[tbl.column(i).to_pylist() for i in range(tbl.num_columns)])
            )
            d_n, d_cols, d_h = result_fingerprint(dcols, drows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if (s_n, s_cols, s_h) == (d_n, d_cols, d_h):
            print(f"ok   {name}: rows={s_n} hash={s_h}")
        else:
            failures.append(name)
            print(f"FAIL {name}: spark(rows={s_n}, cols={s_cols}, h={s_h})")
            print(f"            duck(rows={d_n}, cols={d_cols}, h={d_h})")
            if s_cols == d_cols and s_n == d_n:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
                d_set = sorted("|".join(canon(r[i]) for i in d_order) for r in drows)
                diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark: {a[:200]}")
                    print(f"   duck : {b[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
