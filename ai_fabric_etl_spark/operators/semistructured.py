"""Semi-structured columns via Spark 4 VARIANT.

The reference stores every parsed payload as a JSON *string* and
re-parses it in each consumer (silver_x12_parsing.py keeps
``parsed_data`` as text; every gold mart json-decodes again). This
engine already moves the hot path to a typed struct (from_json once,
JVM-side); VARIANT is the complementary answer for payloads whose
schema is open-ended: ``parse_json`` once into Spark's binary,
field-indexed encoding, then ``variant_get`` extracts typed fields
without re-tokenizing the text — and parquet shredding can push
extraction to the scan. At 100 TB the difference between
string-JSON + get_json_object per access and VARIANT + variant_get
is one text parse per row per query vs one per row total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_variant(
    df: DataFrame, json_col: str, variant_col: str = "_variant"
) -> DataFrame:
    """Parse a JSON-string column into a VARIANT column once;
    malformed JSON becomes NULL (try_parse_json) instead of failing
    the query — the ingest-side contract for open-schema payloads."""
    return df.withColumn(variant_col, F.try_parse_json(F.col(json_col)))


def vfield(variant_col: str | Column, path: str, dtype: str) -> Column:
    """Typed field extraction from a VARIANT column; missing paths
    and cast failures yield NULL (try_variant_get)."""
    c = F.col(variant_col) if isinstance(variant_col, str) else variant_col
    return F.try_variant_get(c, path, dtype)
