"""ai_fabric_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
vincemic/ai-fabric-etl reference system (healthcare X12 EDI medallion
pipeline + operational analytics), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design principles (see SURVEY.md):
- DataFrame/SQL everywhere; Catalyst + AQE do the physical planning.
- File-granular parallelism for parsing (mapInPandas), replacing the
  reference's driver-side for-loops (silver_x12_parsing.py:1388).
- Typed nested structs instead of JSON-string payload columns.
- Partitioned Parquet tables (processing_date, transaction_type).
"""

__version__ = "0.1.0"

from ai_fabric_etl_spark.session import get_spark  # noqa: F401
