"""X12 EDI format layer.

Pure-Python parsing/validation primitives designed to run *inside*
Spark executors (mapInPandas over whole files), replacing the
reference's driver-side per-file for-loops
(silver_x12_parsing.py:1388) with file-granular task parallelism.
"""

from ai_fabric_etl_spark.x12.segments import Segment, split_segments  # noqa: F401
from ai_fabric_etl_spark.x12.envelope import (  # noqa: F401
    extract_envelope_metadata,
    validate_x12_text,
)
from ai_fabric_etl_spark.x12.parsers import parse_x12_file  # noqa: F401
