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


# --------------------------------------------------------------------------
# Multimodal sequence packing — token accounting for interleaved training
# --------------------------------------------------------------------------

_SEQ_BUDGET = 8192   # tokens per training sequence
_SEQ_PATCH = 16      # ViT patch edge: image cost = ceil(w/16)*ceil(h/16)
_SEQ_MS_TOK = 80     # audio cost = 1 token per 80 ms

_SECUENCIAS_ORACLE = f"""
WITH media AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS hh,
           len(string_split(text, ' ')) AS t_texto,
           ['jpeg', 'png', 'wav', 'mp4'][CAST(doc_id % 4 + 1 AS INT)] AS fmt,
           (doc_id % 8) * 160 + 320 AS w,
           (doc_id % 8) * 90 + 180 AS h,
           (doc_id % 3 + 1) * 16000 AS byte_rate,
           strlen(text) AS n_bytes
    FROM documents
),
costo AS (
    SELECT doc_id, hh % 16 AS shard, hh, t_texto,
           CASE WHEN fmt IN ('jpeg', 'png', 'mp4')
                THEN ((w + {_SEQ_PATCH - 1}) // {_SEQ_PATCH})
                     * ((h + {_SEQ_PATCH - 1}) // {_SEQ_PATCH})
                ELSE 0 END AS t_imagen,
           CASE WHEN fmt = 'wav'
                THEN (n_bytes * 1000 // byte_rate) // {_SEQ_MS_TOK}
                ELSE 0 END AS t_audio
    FROM media
),
flujo AS (
    SELECT shard, t_texto, t_imagen, t_audio,
           t_texto + t_imagen + t_audio AS costo_doc,
           sum(t_texto + t_imagen + t_audio)
               OVER (PARTITION BY shard ORDER BY hh, doc_id
                     ROWS UNBOUNDED PRECEDING) AS acum
    FROM costo
)
SELECT CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN t_imagen + t_audio > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_multimodales,
       CAST(sum(t_texto) AS BIGINT) AS tokens_texto,
       CAST(sum(t_imagen) AS BIGINT) AS tokens_imagen,
       CAST(sum(t_audio) AS BIGINT) AS tokens_audio,
       CAST((max(acum) + {_SEQ_BUDGET - 1}) // {_SEQ_BUDGET} AS BIGINT)
           AS n_secuencias,
       CAST(sum(CASE WHEN (acum - costo_doc) // {_SEQ_BUDGET}
                          != (acum - 1) // {_SEQ_BUDGET}
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_cruzando,
       CAST((max(acum) + {_SEQ_BUDGET - 1}) // {_SEQ_BUDGET} * {_SEQ_BUDGET}
            - max(acum) AS BIGINT) AS relleno_final
FROM flujo
GROUP BY 1
"""


@register("secuencias_multimodales", oracle=_SECUENCIAS_ORACLE,
          ops=("MM1", "A1", "W1"), driver=False)
def secuencias_multimodales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL SEQUENCE PACKING accounting: every document's training
    cost = text tokens + vision-transformer patches
    (ceil(w/16)·ceil(h/16) for image/video formats) + audio frames
    (1 per 80 ms), and the corpus packs into fixed 8192-token sequences
    as a CONTIGUOUS TOKEN STREAM per shard (the production packing:
    documents cross sequence boundaries and the loss mask handles it —
    so packing is a pure running sum, no bin-packing search). Shard and
    order are the barajado_global permutation (md5 hash), so the plan
    is the same single hash shuffle + one window. Emitted per shard:
    modality token mix, sequence count, boundary-crossing docs
    (start-bin ≠ end-bin over the cumulative stream), and final-sequence
    padding — the numbers a training-data planner actually schedules by.

    Media metadata mirrors media_from_documents' doc_id arithmetic
    (multimodal.py:192) so the oracle derives identical costs; all
    divisions are integer-floor, exact in both engines."""
    from etl_python_airflow_bigquery_spark.queries.text import hex_hash
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    fmt = F.element_at(
        F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    w = (F.col("doc_id") % 8) * 160 + 320
    h = (F.col("doc_id") % 8) * 90 + 180
    byte_rate = (F.col("doc_id") % 3 + 1) * 16000
    p = _SEQ_PATCH
    costo = docs.select(
        "doc_id",
        hex_hash(F.col("doc_id").cast("string")).alias("hh"),
        F.size(F.split("text", " ")).alias("t_texto"),
        F.when(
            fmt.isin("jpeg", "png", "mp4"),
            ((w + (p - 1)) / p).cast("bigint") * ((h + (p - 1)) / p).cast("bigint"),
        )
        .otherwise(0)
        .alias("t_imagen"),
        F.when(
            fmt == "wav",
            F.expr(
                f"(length(text) * 1000 div ((doc_id % 3 + 1) * 16000))"
                f" div {_SEQ_MS_TOK}"
            ),
        )
        .otherwise(0)
        .alias("t_audio"),
    )
    wv = (
        Window.partitionBy(F.col("hh") % 16)
        .orderBy("hh", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flujo = costo.select(
        (F.col("hh") % 16).alias("shard"),
        "t_texto",
        "t_imagen",
        "t_audio",
        (F.col("t_texto") + F.col("t_imagen") + F.col("t_audio")).alias("costo_doc"),
        F.sum(F.col("t_texto") + F.col("t_imagen") + F.col("t_audio"))
        .over(wv)
        .alias("acum"),
    )
    b = _SEQ_BUDGET
    return flujo.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(F.when(F.col("t_imagen") + F.col("t_audio") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_multimodales"),
        F.sum("t_texto").cast("bigint").alias("tokens_texto"),
        F.sum("t_imagen").cast("bigint").alias("tokens_imagen"),
        F.sum("t_audio").cast("bigint").alias("tokens_audio"),
        F.expr(f"CAST((max(acum) + {b - 1}) div {b} AS BIGINT)").alias(
            "n_secuencias"
        ),
        F.sum(
            F.when(
                F.expr(f"(acum - costo_doc) div {b} != (acum - 1) div {b}"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("docs_cruzando"),
        F.expr(
            f"CAST((max(acum) + {b - 1}) div {b} * {b} - max(acum) AS BIGINT)"
        ).alias("relleno_final"),
    )


_FOTOGRAMAS_ORACLE = """
WITH v AS (
    SELECT doc_id AS media_id, CAST(doc_id % 30 + 1 AS INT) AS nf
    FROM documents WHERE doc_id % 4 = 3
),
f AS (
    SELECT media_id, CAST(g.i AS INT) AS frame_idx
    FROM v, LATERAL unnest(generate_series(0, nf - 1, 5)) AS g(i)
)
SELECT media_id, frame_idx,
       CAST(frame_idx * 1000 // 25 AS BIGINT) AS ts_ms,
       md5(CAST(media_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR))
           AS huella
FROM f
"""


@register("muestreo_fotogramas", oracle=_FOTOGRAMAS_ORACLE, ops=("MM1",),
          driver=False)
def muestreo_fotogramas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO FRAME SAMPLING end to end — the fan-out mapInPandas shape
    (rows OUT exceed rows IN: each mp4 row emits one row per 1-in-5
    frame) that none of the other extractors exercise: documents → fake
    media (metadata-real, codec-stubbed) → ``sample_frames`` emits
    (frame_idx, ts_ms, frame bytes) map-only from the partition the
    payload lives in — at 100 TB the video bytes never shuffle and the
    frame fan-out lands in the same tasks. The oracle recomputes the
    sampled indices from the n_frames metadata arithmetic, the REAL
    timestamps (idx·1000//25 at the fixed 25 fps), and the
    deterministic frame fingerprint (md5 of "media:idx" — exactly the
    stand-in bytes the codec stub emits), so the whole Arrow fan-out
    path is value-verified row for row, not just counted."""
    from etl_python_airflow_bigquery_spark.operators.multimodal import (
        sample_frames,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(media_from_documents(docs), every_n=5)
    return frames.select(
        "media_id",
        "frame_idx",
        F.col("ts_ms").cast("bigint").alias("ts_ms"),
        F.lower(F.hex("frame")).alias("huella"),
    )
