"""End-to-end pipeline CLI — the operational surface a user of the
reference drives through its four notebooks (bronze_x12_ingestion.py,
silver_x12_parsing.py, gold_x12_analytics.py,
generate_x12_acknowledgments.py), as one command:

    python -m ai_fabric_etl_spark run --input LANDING_DIR --out WAREHOUSE
    python -m ai_fabric_etl_spark run --stage silver --input DIR --out W
    python -m ai_fabric_etl_spark queries            # list the catalog
    python -m ai_fabric_etl_spark query NAME --sf-dir /root/testdata/sf0.01

Stages compose exactly like the library calls they wrap (pipeline/
bronze.py -> silver.py -> gold.py, x12/ack997.py); ``--stage all``
(default) chains bronze scan -> distributed parse -> 11 gold marts ->
997 acknowledgment files under ``OUT/{bronze,silver,gold,acks}``.
The monitoring views (pipeline/views.py) are session-scoped SQL and
therefore not materialized here.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_run(args) -> int:
    from pyspark.sql import functions as F

    from ai_fabric_etl_spark.pipeline.bronze import read_bronze, write_bronze
    from ai_fabric_etl_spark.pipeline.gold import build_all_marts, write_marts
    from ai_fabric_etl_spark.pipeline.silver import (
        parse_to_silver,
        silver_with_parsed,
        write_silver,
    )
    from ai_fabric_etl_spark.session import get_spark
    from ai_fabric_etl_spark.x12.ack997 import generate_acks, write_ack_files

    spark = get_spark("ai_fabric_etl_spark.run")
    out = args.out.rstrip("/")
    stages = (
        ["bronze", "silver", "gold", "acks"]
        if args.stage == "all"
        else [args.stage]
    )

    bronze = None
    if "bronze" in stages or "silver" in stages:
        bronze = read_bronze(spark, args.input, glob=args.glob)
    if "bronze" in stages:
        write_bronze(bronze, f"{out}/bronze")
        print(f"bronze: {bronze.count()} files -> {out}/bronze")

    silver = None
    if "silver" in stages:
        valid = bronze.filter(F.col("is_valid_x12"))
        silver = parse_to_silver(valid, batch_id=args.batch_id)
        write_silver(silver, f"{out}/silver")
        print(f"silver: {silver.count()} transactions -> {out}/silver")

    if "gold" in stages or "acks" in stages:
        if silver is None:  # standalone gold/acks stage reads silver back
            silver = spark.read.parquet(f"{out}/silver")
        enriched = silver_with_parsed(silver)

    if "gold" in stages:
        marts = build_all_marts(enriched)
        write_marts(marts, f"{out}/gold")
        print(f"gold: {len(marts)} marts -> {out}/gold")

    if "acks" in stages:
        acks = generate_acks(silver)
        write_ack_files(acks, f"{out}/acks")
        print(f"acks: {acks.count()} 997s -> {out}/acks")
    return 0


def _cmd_queries(_args) -> int:
    from ai_fabric_etl_spark.queries import oracle_sql, queries

    oracles = oracle_sql()
    for name in queries():
        print(f"{name}\t{'oracled' if name in oracles else 'rows-only'}")
    return 0


def _cmd_query(args) -> int:
    from ai_fabric_etl_spark.queries import queries
    from ai_fabric_etl_spark.session import get_spark

    qs = queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r} (see: queries)", file=sys.stderr)
        return 2
    spark = get_spark("ai_fabric_etl_spark.query")
    df = qs[args.name](spark, args.sf_dir)
    rows = df.limit(args.limit).collect()
    if args.json:
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        df.limit(args.limit).show(args.limit, truncate=False)
    print(f"# {len(rows)} row(s) shown (limit {args.limit})", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ai_fabric_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run the X12 medallion pipeline")
    runp.add_argument("--input", required=True, help="landing directory")
    runp.add_argument("--out", required=True, help="warehouse root")
    runp.add_argument(
        "--stage",
        choices=["all", "bronze", "silver", "gold", "acks"],
        default="all",
    )
    runp.add_argument("--glob", default="*.{x12,edi,txt}")
    runp.add_argument("--batch-id", default="cli-batch")
    runp.set_defaults(fn=_cmd_run)

    qsp = sub.add_parser("queries", help="list the contract catalog")
    qsp.set_defaults(fn=_cmd_queries)

    qp = sub.add_parser("query", help="run one catalog query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--json", action="store_true")
    qp.set_defaults(fn=_cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
