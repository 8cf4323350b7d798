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
           (doc_id % 8) * 90 + 180 AS height,
           (doc_id % 3 + 1) * 16000 AS byte_rate
    FROM documents
)
SELECT media_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(list_reduce(
               list_transform(generate_series(1, strlen(text)),
                              i -> CAST(ord(substring(text, i, 1)) AS BIGINT)),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT) AS checksum,
       format,
       CAST(width * height AS BIGINT) AS pixels,
       CAST(CASE WHEN format IN ('jpeg', 'png') THEN width END AS INTEGER)
           AS decoded_width,
       CAST(CASE WHEN format IN ('jpeg', 'png') THEN height END AS INTEGER)
           AS decoded_height,
       CAST(CASE WHEN format = 'wav'
                 THEN CAST(strlen(text) AS BIGINT) * 1000 // byte_rate
            END AS BIGINT) AS duration_ms
FROM media
"""


@register("multimodal_features", oracle=_MULTIMODAL_ORACLE, ops=("MM1", "U2"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end to end: documents → REAL
    container headers (PNG IHDR / JPEG SOF / WAV fmt+data, built from
    metadata) + text body → Arrow-batched mapInPandas where pure-Python
    parsers read back dimensions/duration from the BYTES (mp4 keeps the
    codec stub → nulls + byte fallback). The oracle recomputes the
    decoded fields from doc_id arithmetic and the body checksum from the
    characters — proving both header and body crossed the Arrow boundary
    intact and the parsers read what the builders wrote."""
    docs = load_table(spark, sf_dir, "documents")
    return media_features(media_from_documents(docs))
