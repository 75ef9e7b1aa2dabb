"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY §2): deduplication,
similarity search, text analysis, multimodal columns — the operators a
100 TB training-data pipeline needs, built Spark-first.
"""
