from ai_fabric_etl_spark.queries import text_queries  # noqa: F401  (registers entries)
from ai_fabric_etl_spark.queries import training_queries  # noqa: F401  (registers entries)
from ai_fabric_etl_spark.queries import x12_queries  # noqa: F401  (registers entries)
from ai_fabric_etl_spark.queries.catalog import oracle_sql, queries  # noqa: F401
