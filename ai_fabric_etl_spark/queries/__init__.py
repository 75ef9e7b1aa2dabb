from ai_fabric_etl_spark.queries.catalog import oracle_sql, queries  # noqa: F401
