"""Multimodal columns (BASELINE north-star): images/audio/video as
opaque BINARY columns with a typed metadata struct, processed by
Arrow-batched pandas over ``mapInPandas``.

The decode step is REAL for container headers: pure-Python parsers read
PNG IHDR dimensions, JPEG SOF dimensions, and WAV fmt/data duration —
no codec libraries needed. Full-frame pixel/sample decode goes through
an INJECTABLE codec registry (the maxminddb pattern from
operators/enrich.py:150): stdlib ``wave`` serves WAV sample decode
everywhere, PIL/PyAV are picked up automatically when installed, and a
deployment can ``register_codec`` anything else. A format with no
available codec raises the typed ``CodecUnavailable`` and the extractor
degrades to byte-level features — multimodal pipelines must degrade,
not die.

Scale shape: media bytes never shuffle for feature extraction — the
mapInPandas stage is map-only over whatever partitioning the source
has; only the (small) feature rows continue into joins/aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
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
    "media_id BIGINT, n_bytes BIGINT, checksum BIGINT, format STRING, "
    "pixels BIGINT, decoded_width INT, decoded_height INT, duration_ms BIGINT"
)

_SOF_MARKERS = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _decode_png(payload: bytes) -> dict:
    """PNG: 8-byte signature, then the IHDR chunk (len+type+13 data+CRC)
    carries width/height as 4-byte big-endian at offsets 16/20."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n" or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG header")
    return {
        "width": int.from_bytes(payload[16:20], "big"),
        "height": int.from_bytes(payload[20:24], "big"),
        "header_len": 33,  # sig + IHDR length/type/data/CRC
    }


def _decode_jpeg(payload: bytes) -> dict:
    """JPEG: walk marker segments from SOI until a SOF marker; its
    segment carries height/width as 2-byte big-endian at offsets +5/+7."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG header")
    pos = 2
    while pos + 4 <= len(payload) and payload[pos] == 0xFF:
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if payload[pos + 1] in _SOF_MARKERS:
            return {
                "height": int.from_bytes(payload[pos + 5 : pos + 7], "big"),
                "width": int.from_bytes(payload[pos + 7 : pos + 9], "big"),
                "header_len": pos + 2 + seg_len,
            }
        pos += 2 + seg_len
    raise ValueError("no SOF marker found")


def _decode_wav(payload: bytes) -> dict:
    """WAV/RIFF: walk chunks; ``fmt `` gives byte_rate, ``data`` gives
    payload size — duration follows without decoding a single sample."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV header")
    pos, byte_rate = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            byte_rate = int.from_bytes(payload[pos + 16 : pos + 20], "little")
            sample_rate = int.from_bytes(payload[pos + 12 : pos + 16], "little")
        elif cid == b"data":
            if not byte_rate:
                raise ValueError("data chunk before fmt")
            return {
                "duration_ms": size * 1000 // byte_rate,
                "sample_rate": sample_rate,
                "header_len": pos + 8,
            }
        pos += 8 + size
    raise ValueError("no data chunk found")


class CodecUnavailable(Exception):
    """No codec stack can decode this format here — the typed signal
    extractors catch to degrade to byte-level features instead of dying
    (the optional-dependency contract open_geo_db uses for maxminddb)."""


# Injectable full-decode codec registry: format → callable(payload) →
# dict of decoded fields (n_samples / duration_ms / width / height /
# n_frames, whichever apply). A deployment injects its codec stack
# explicitly; `open_media_codec` also auto-detects optional libraries.
_CODECS: dict[str, object] = {}


def register_codec(fmt: str, fn) -> None:
    """Inject a real decoder for ``fmt`` (e.g. a PIL- or libav-backed
    callable). Explicit registrations win over auto-detection."""
    _CODECS[fmt] = fn


def open_media_codec(fmt: str):
    """Resolve a FULL-decode codec for ``fmt``: explicit registration
    first, then optional libraries (PIL for images, PyAV for video),
    then the stdlib ``wave`` module for WAV (always present — real PCM
    sample decode with no third-party dep). None ⇒ no codec here."""
    if fmt in _CODECS:
        return _CODECS[fmt]
    if fmt in ("png", "jpeg"):
        try:
            from PIL import Image  # optional dep, absent in this sandbox
        except ImportError:
            return None

        def _img(payload: bytes) -> dict:
            import io

            with Image.open(io.BytesIO(payload)) as im:
                im.load()
                return {
                    "width": im.width,
                    "height": im.height,
                    "n_samples": im.width * im.height,
                }

        return _img
    if fmt == "wav":
        import io
        import wave as _wave

        def _wav(payload: bytes) -> dict:
            with _wave.open(io.BytesIO(payload)) as wv:
                n, rate = wv.getnframes(), wv.getframerate()
                return {"n_samples": n, "duration_ms": n * 1000 // rate}

        return _wav
    if fmt == "mp4":
        try:
            import av  # optional dep, absent in this sandbox
        except ImportError:
            return None

        def _mp4(payload: bytes) -> dict:
            import io

            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                return {
                    "n_frames": stream.frames,
                    "width": stream.codec_context.width,
                    "height": stream.codec_context.height,
                }

        return _mp4
    return None


def decode_media(payload: bytes, fmt: str) -> dict:
    """Pure-Python HEADER decode for png/jpeg/wav (dimensions/duration
    without codec deps). Other formats resolve through the injectable
    codec registry; with no codec available the typed CodecUnavailable
    raises and the extractor degrades to byte features."""
    if fmt == "png":
        return _decode_png(payload)
    if fmt == "jpeg":
        return _decode_jpeg(payload)
    if fmt == "wav":
        return _decode_wav(payload)
    codec = open_media_codec(fmt)
    if codec is None:
        raise CodecUnavailable(
            f"no codec available for format={fmt!r} (inject one via "
            "register_codec, or install PIL/PyAV); extract_features "
            "falls back to byte-level features"
        )
    dec = dict(codec(payload))
    dec.setdefault("header_len", 0)
    return dec


def decode_samples(payload: bytes, fmt: str) -> dict:
    """FULL decode through the codec registry (vs decode_media's
    header-only fast path): real pixel/sample-level fields from an
    actual codec. Raises CodecUnavailable when no codec serves ``fmt``
    — WAV always decodes (stdlib wave)."""
    codec = open_media_codec(fmt)
    if codec is None:
        raise CodecUnavailable(f"no codec available for format={fmt!r}")
    return dict(codec(payload))


def _byte_features(payload: bytes) -> tuple[int, int]:
    """Deterministic byte-level fallback features: length + a rolling
    checksum (mod 2^31) — stands in for decoded-pixel statistics."""
    acc = 0
    for byte in payload:
        acc = (acc * 31 + byte) % 2147483647
    return len(payload), acc


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, parse the real container
    header (dims/duration), then checksum the media BODY (payload past
    the header). Codec-less formats fall back to byte features over the
    whole payload — multimodal pipelines must degrade, not die."""
    for pdf in batches:
        n_bytes, checksums, widths, heights, durations = [], [], [], [], []
        for payload, fmt in zip(pdf["payload"], pdf["format"]):
            payload = payload or b""
            w = h = dur = None
            body = payload
            try:
                dec = decode_media(payload, fmt)
                body = payload[dec["header_len"] :]
                w, h = dec.get("width"), dec.get("height")
                dur = dec.get("duration_ms")
            except CodecUnavailable:
                pass
            nb, ck = _byte_features(body)
            n_bytes.append(nb)
            checksums.append(ck)
            widths.append(w)
            heights.append(h)
            durations.append(dur)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": n_bytes,
                "checksum": checksums,
                "format": pdf["format"],
                "pixels": (
                    pdf["width"].astype("int64") * pdf["height"].astype("int64")
                ),
                "decoded_width": pd.array(widths, dtype="Int32"),
                "decoded_height": pd.array(heights, dtype="Int32"),
                "duration_ms": pd.array(durations, dtype="Int64"),
            }
        )


def _be(col: Column, n_bytes: int) -> Column:
    """Integer column → n-byte big-endian binary."""
    return F.unhex(F.lpad(F.hex(col), 2 * n_bytes, "0"))


def _le(col: Column, n_bytes: int) -> Column:
    """Integer column → n-byte little-endian binary (byte-reversed BE)."""
    return F.concat(
        *[
            _be(F.shiftright(col.cast("long"), 8 * i) % 256, 1)
            for i in range(n_bytes)
        ]
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a deterministic media table from ``documents``: a REAL
    container header (PNG/JPEG/WAV, built from the metadata) followed by
    the UTF-8 text bytes as the media body; mp4 rows carry a raw body
    (their decode genuinely needs a codec). Every header field derives
    from doc_id, so the oracle can recompute what the parser must read.
    (The fixture set has no binary table — TESTDATA.md — so the binary
    column is synthesized; downstream treats it as opaque.)"""
    w = (F.col("doc_id") % 8 * 160 + 320).cast("int")
    h = (F.col("doc_id") % 8 * 90 + 180).cast("int")
    body = F.encode("text", "UTF-8")
    body_len = F.length(body)
    sample_rate = ((F.col("doc_id") % 3 + 1) * 8000).cast("int")
    byte_rate = sample_rate * 2
    png_header = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"),
        _be(w, 4), _be(h, 4),
        F.lit(b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"),  # ihdr tail + crc
    )
    jpeg_header = F.concat(
        F.lit(b"\xff\xd8\xff\xc0\x00\x11\x08"),  # SOI + SOF0 + len 17 + prec
        _be(h, 2), _be(w, 2),
        F.lit(b"\x03\x01\x11\x00\x02\x11\x00\x03\x11\x00"),
    )
    wav_header = F.concat(
        F.lit(b"RIFF"), _le(body_len + 36, 4), F.lit(b"WAVEfmt "),
        F.lit(b"\x10\x00\x00\x00\x01\x00\x01\x00"),  # fmt size, pcm, mono
        _le(sample_rate, 4), _le(byte_rate, 4),
        F.lit(b"\x02\x00\x10\x00data"), _le(body_len, 4),
    )
    fmt = F.element_at(
        F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    payload = (
        F.when(fmt == "jpeg", F.concat(jpeg_header, body))
        .when(fmt == "png", F.concat(png_header, body))
        .when(fmt == "wav", F.concat(wav_header, body))
        .otherwise(body)
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            fmt.alias("format"),
            w.alias("width"),
            h.alias("height"),
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


RESIZED_SCHEMA = "media_id BIGINT, width INT, height INT, payload BINARY"
FRAMES_SCHEMA = "media_id BIGINT, frame_idx INT, ts_ms BIGINT, frame BINARY"
VIDEO_FPS = 25


def resize_images(media: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Aspect-preserving thumbnail pass over the image rows. The REAL
    parts are everything Spark-shaped: the header parse feeding true
    source dimensions, the fit-inside-box scale math (never upscales),
    the Arrow batch signature, and the map-only plan (media bytes never
    shuffle). The PIXEL resample is a deterministic fake — md5-seeded
    bytes of exactly width*height*3 — because a real one needs the codec
    stack this container doesn't ship; a deployment swaps one function
    body (PIL.Image.resize) without touching the operator."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                if fmt not in ("png", "jpeg"):
                    continue
                det = decode_media(bytes(payload), fmt)
                w, h = det["width"], det["height"]
                scale = min(max_w / w, max_h / h, 1.0)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                n = nw * nh * 3
                seed = hashlib.md5(f"{mid}:{nw}x{nh}".encode()).digest()
                rows.append((int(mid), nw, nh, (seed * (n // 16 + 1))[:n]))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "width", "height", "payload"]
                )

    flat = media.select(
        "media_id", "payload", F.col("meta.format").alias("format")
    )
    return flat.mapInPandas(fn, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """1-in-``every_n`` frame sampling for the video rows — the fan-out
    batch shape (rows OUT exceed rows IN) that distinguishes this from
    the other extractors. Frame timestamps are real (idx/fps); the frame
    bytes are deterministic fakes for the same codec reason as
    resize_images. Map-only: each video's frames emit from the partition
    its payload already lives in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, fmt, nf in zip(
                pdf["media_id"], pdf["format"], pdf["n_frames"]
            ):
                if fmt != "mp4":
                    continue
                for idx in range(0, int(nf), every_n):
                    seed = hashlib.md5(f"{mid}:{idx}".encode()).digest()
                    rows.append(
                        (int(mid), idx, idx * 1000 // VIDEO_FPS, seed)
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
                )

    flat = media.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return flat.mapInPandas(fn, schema=FRAMES_SCHEMA)
