"""Regenerate tests/fixtures/x12_silver_golden after a parser or
corpus change: the committed fixture is the cold-start fallback for
the x12 gold-mart DuckDB oracles (queries/x12_queries.py hydrates the
runtime cache from it when absent)."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_fabric_etl_spark.queries import x12_queries  # noqa: E402
from ai_fabric_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("regen_golden_silver")
    tmp = x12_queries._GOLDEN + ".tmp"
    x12_queries._silver(spark).coalesce(2).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(x12_queries._GOLDEN, ignore_errors=True)
    # drop Spark bookkeeping files; keep only the parquet parts
    os.makedirs(x12_queries._GOLDEN)
    for name in os.listdir(tmp):
        if name.endswith(".parquet"):
            shutil.move(os.path.join(tmp, name), os.path.join(x12_queries._GOLDEN, name))
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"regenerated {x12_queries._GOLDEN}")


if __name__ == "__main__":
    main()
