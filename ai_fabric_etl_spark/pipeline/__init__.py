from ai_fabric_etl_spark.pipeline.bronze import read_bronze  # noqa: F401
from ai_fabric_etl_spark.pipeline.silver import parse_to_silver, silver_with_parsed  # noqa: F401
from ai_fabric_etl_spark.pipeline import gold  # noqa: F401
