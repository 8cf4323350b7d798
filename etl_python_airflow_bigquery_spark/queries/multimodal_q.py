"""Oracle-checked multimodal query: the mapInPandas feature extractor
(operators/multimodal.py) runs for real — payload bytes through the
Arrow boundary, codec stub, byte-level fallback — and DuckDB recomputes
the same rolling checksum from the source text, so the whole pandas
pipeline is value-verified, not just smoke-tested."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_python_airflow_bigquery_spark.operators.multimodal import (
    media_features,
    media_from_documents,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

_MULTIMODAL_ORACLE = """
WITH media AS (
    SELECT doc_id AS media_id,
           text,
           ['jpeg', 'png', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)] AS format,
           (doc_id % 8) * 160 + 320 AS width,
           (doc_id % 8) * 90 + 180 AS height
    FROM documents
)
SELECT media_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(list_reduce(
               list_transform(generate_series(1, strlen(text)),
                              i -> CAST(ord(substring(text, i, 1)) AS BIGINT)),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT) AS checksum,
       format,
       CAST(width * height AS BIGINT) AS pixels
FROM media
"""


@register("multimodal_features", oracle=_MULTIMODAL_ORACLE, ops=("MM1", "U2"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end to end: documents → opaque
    payload + typed metadata → Arrow-batched mapInPandas (decode stub →
    byte-feature fallback). The oracle recomputes the checksum from the
    characters, proving payload bytes crossed the Arrow boundary
    intact."""
    docs = load_table(spark, sf_dir, "documents")
    return media_features(media_from_documents(docs))
