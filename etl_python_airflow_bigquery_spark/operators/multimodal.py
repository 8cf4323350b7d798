"""Multimodal columns (BASELINE north-star): images/audio/video as
opaque BINARY columns with a typed metadata struct, processed by
Arrow-batched pandas over ``mapInPandas``.

The container ships no image/audio libraries, so the actual codec step
is STUBBED (``decode_media`` raises NotImplementedError with the wiring
a real deployment drops in); everything Spark-side — schema, partition
behavior, UDF signature, batch shape, deterministic fallback features —
is real and tested (tests/test_multimodal.py).

Scale shape: media bytes never shuffle for feature extraction — the
mapInPandas stage is map-only over whatever partitioning the source
has; only the (small) feature rows continue into joins/aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media table schema: opaque payload + typed metadata (the multimodal
# analog of consumo_detalle's explicit 28-col schema discipline,
# reference consumo_detalle.py:270-306).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id BIGINT, n_bytes BIGINT, checksum BIGINT, "
    "format STRING, pixels BIGINT"
)


def decode_media(payload: bytes, fmt: str):
    """REAL decode hook — intentionally stubbed: the container has no
    PIL/libav. A deployment replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` / ``av.open(...)``; the
    mapInPandas plumbing around it is unchanged."""
    raise NotImplementedError(
        f"media decode for format={fmt!r} requires an image/audio codec "
        "library not present in this environment; extract_features falls "
        "back to byte-level features"
    )


def _byte_features(payload: bytes) -> tuple[int, int]:
    """Deterministic byte-level fallback features: length + a rolling
    checksum (mod 2^31) — stands in for decoded-pixel statistics."""
    acc = 0
    for byte in payload:
        acc = (acc * 31 + byte) % 2147483647
    return len(payload), acc


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, try the real decoder, fall
    back to byte features when the codec stack is absent. Never raises
    on missing codecs — multimodal pipelines must degrade, not die."""
    for pdf in batches:
        n_bytes, checksums, pixels = [], [], []
        for payload, fmt, w, h in zip(
            pdf["payload"], pdf["format"], pdf["width"], pdf["height"]
        ):
            try:
                decode_media(payload, fmt)
            except NotImplementedError:
                pass
            nb, ck = _byte_features(payload or b"")
            n_bytes.append(nb)
            checksums.append(ck)
            pixels.append(int(w) * int(h))
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": n_bytes,
                "checksum": checksums,
                "format": pdf["format"],
                "pixels": pixels,
            }
        )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a deterministic media table from ``documents``: the
    UTF-8 text bytes play the payload; metadata derives from doc_id.
    (The fixture set has no binary table — TESTDATA.md — so the binary
    column is synthesized; every downstream step treats it as opaque.)"""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav"), F.lit("mp4")),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ).alias("format"),
            (F.col("doc_id") % 8 * 160 + 320).cast("int").alias("width"),
            (F.col("doc_id") % 8 * 90 + 180).cast("int").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Flatten metadata next to the payload and run the Arrow-batched
    extractor. Input partitioning is preserved — no shuffle."""
    flat = media.select(
        "media_id",
        "payload",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(extract_features, schema=FEATURES_SCHEMA)
