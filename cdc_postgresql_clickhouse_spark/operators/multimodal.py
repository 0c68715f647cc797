"""Multimodal columns: opaque binary payloads with typed metadata, processed
via Arrow-batched ``mapInPandas`` (survey north star; no counterpart in the
reference, which is text/SQL only).

Design for 100 TB of images/audio/video:

- payloads live in a ``binary`` column next to typed metadata
  (``format``, ``n_bytes``, ``content_md5``) so pruning/filtering happens on
  metadata without touching bytes (Parquet column pruning keeps payload IO
  zero for metadata-only queries);
- decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: Arrow moves the bytes in batches, pandas sees a column of
  ``bytes`` objects, output schema is declared up front — the engine-side
  plumbing (schema, batching, partition preservation) is real and tested;
- the image codec is GUARDED, not stubbed: ``decode_blobs`` imports Pillow
  once per worker when importable and decodes real payloads with it; absent
  Pillow (this container) or on undecodable payloads it substitutes a
  deterministic fake derived from the payload bytes, so tests exercise the
  full dataflow with stable results in either environment. The audio/video
  stages (resize stand-in, frame sampling) keep deterministic byte-level
  stand-ins with the identical Arrow dataflow; swapping in ffmpeg is a
  one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

FEATURE_DIM = 16


def blob_table(docs: DataFrame) -> DataFrame:
    """Build the multimodal table from the documents fixture: UTF-8 bytes
    stand in for the image/audio payload; metadata is computed JVM-side."""
    n_bytes = F.octet_length("text").cast("long")
    return docs.select(
        "doc_id",
        F.when(n_bytes % 3 == 0, F.lit("png"))
        .when(n_bytes % 3 == 1, F.lit("jpeg"))
        .otherwise(F.lit("wav"))
        .alias("format"),
        n_bytes.alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("content_md5"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def pillow_available() -> bool:
    """True iff Pillow is importable (guarded real-codec path)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(payload: bytes) -> Any:
    """Real decoder: Pillow when importable (use-if-present), else
    NotImplementedError so the pipeline substitutes the deterministic fake.
    Kept as a module-level twin of the executor-side closure in
    ``decode_blobs`` for direct unit testing."""
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError("Pillow not installed in this environment") from None
    img = Image.open(io.BytesIO(payload))
    img.load()
    hist = img.histogram()[:FEATURE_DIM]
    hist = hist + [0] * (FEATURE_DIM - len(hist))
    total = max(sum(hist), 1)
    return (
        img.size[0],
        img.size[1],
        len(img.getbands()),
        [round(c / total, 6) for c in hist],
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in: dimensions and features derived from the
    payload bytes (stable across engines/runs, no external libs)."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    return width, height, 3, [round(c / total, 6) for c in hist]


def decode_blobs(blobs: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched decode: mapInPandas keeps partitioning, streams batches,
    and declares DECODED_SCHEMA up front. Tries the real codec (Pillow,
    use-if-present — imported once per worker, not per row) and falls back to
    the deterministic fake for undecodable payloads or when Pillow is absent,
    so the fixture corpus (UTF-8 bytes, never valid images) always takes the
    fake path and the oracle rows stay engine-exact either way."""

    out_cols = [f.name for f in DECODED_SCHEMA.fields]
    feature_dim = FEATURE_DIM

    # NOTE: the closure must be self-contained (stdlib/pandas only): cloudpickle
    # serializes references to this module *by name*, and executor Python
    # workers do not necessarily have the repo on sys.path.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        try:  # guarded real codec; worker-local import
            import io as _io

            from PIL import Image as _Image
        except ImportError:
            _Image = None

        def real_decode(data: bytes):
            if _Image is None:
                raise NotImplementedError("Pillow not installed")
            img = _Image.open(_io.BytesIO(data))
            img.load()
            hist = img.histogram()[:feature_dim]
            hist = hist + [0] * (feature_dim - len(hist))
            total = max(sum(hist), 1)
            return (
                img.size[0],
                img.size[1],
                len(img.getbands()),
                [round(c / total, 6) for c in hist],
            )

        def fake_decode(data: bytes):
            h = _hl.md5(data).digest()
            hist = [0] * feature_dim
            for b in data:
                hist[b % feature_dim] += 1
            total = max(len(data), 1)
            return 64 + h[0] % 192, 64 + h[1] % 192, 3, [round(c / total, 6) for c in hist]

        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(pdf["doc_id"], pdf["format"], pdf["payload"]):
                data = bytes(payload)
                try:
                    width, height, channels, feat = real_decode(data)
                except Exception:  # absent codec or undecodable payload
                    width, height, channels, feat = fake_decode(data)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "format": fmt,
                        "width": width,
                        "height": height,
                        "channels": channels,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return blobs.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_blobs(blobs: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize stub with real dataflow: byte-stride downsampling stands in for
    pixel resampling (the real implementation swaps the two marked lines for
    Pillow's ``Image.resize``). Output schema carries the resized payload and
    its new dimensions — downstream operators (decode, feature-extract,
    dedup-by-md5) compose unchanged on the resized column."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("resized_md5", StringType()),
            StructField("resized_bytes", LongType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]
    target_pixels = max(target_w * target_h // 64, 1)  # fake bytes-per-image budget

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # self-contained closure (see decode_blobs)

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                stride = max(len(data) // target_pixels, 1)
                resized = data[::stride][:target_pixels]  # <- real: Image.resize
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": target_w,
                        "height": target_h,
                        "resized_md5": _hl.md5(resized).hexdigest(),  # <- real: re-encode
                        "resized_bytes": len(resized),
                    }
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return blobs.select("doc_id", "payload").mapInPandas(resize, schema=out_schema)


def sample_frames(blobs: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' payloads: deterministic byte-window slices
    stand in for frame extraction; the real implementation swaps the slicer
    for an ffmpeg call with identical dataflow."""

    out_cols = [f.name for f in FRAME_SCHEMA.fields]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # self-contained closure (see decode_blobs)

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = min(max_frames, max(1, len(data) // every_n_bytes))
                for i in range(n):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_md5": _hl.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return blobs.select("doc_id", "payload").mapInPandas(sample, schema=FRAME_SCHEMA)


AUDIO_FRAME_LEN = 32  # fake-PCM samples per analysis frame

AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_frames(blobs: DataFrame, frame_len: int = AUDIO_FRAME_LEN) -> DataFrame:
    """Audio feature extraction: window the payload into fixed-length sample
    frames and emit per-frame RMS energy — the framing step under every
    audio featurizer (fbank/MFCC/VAD).

    Real-codec path first (stdlib ``wave``): a payload that parses as RIFF
    WAV is decoded to 16-bit PCM and framed from the true samples. The
    fixture payloads are UTF-8 text, never valid RIFF, so they always take
    the deterministic fake — each byte is an 8-bit-PCM-style sample
    (b - 128) — keeping the oracle engine-exact while the same dataflow
    decodes real WAV when given one (pinned by a unit test with a
    stdlib-synthesized WAV).

    Float parity: per-frame sum of squares is integer-exact; rms =
    FLOOR(sqrt(ssq/n)·1e6)/1e6 — both engines do the identical double ops.
    Scale shape: one Arrow mapInPandas pass, frame rows ∝ payload bytes;
    partitioning untouched."""

    out_cols = [f.name for f in AUDIO_FRAME_SCHEMA.fields]

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import math as _math
        import struct as _struct
        import wave as _wave

        def real_samples(data: bytes) -> list[int]:
            with _wave.open(_io.BytesIO(data), "rb") as w:
                if w.getsampwidth() != 2:
                    raise NotImplementedError("only 16-bit PCM")
                raw = w.readframes(w.getnframes())
            step = w.getnchannels()
            all_s = _struct.unpack(f"<{len(raw) // 2}h", raw)
            return list(all_s[::step])  # first channel

        def fake_samples(data: bytes) -> list[int]:
            return [b - 128 for b in data]

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    samples = real_samples(data)
                except Exception:  # not RIFF / unsupported → deterministic fake
                    samples = fake_samples(data)
                for i in range(0, max(len(samples), 1), frame_len):
                    sl = samples[i : i + frame_len]
                    if not sl:
                        break
                    ssq = sum(s * s for s in sl)
                    rms = _math.floor(_math.sqrt(ssq / len(sl)) * 1000000.0) / 1000000.0
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i // frame_len,
                            "n_samples": len(sl),
                            "rms": rms,
                        }
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return blobs.select("doc_id", "payload").mapInPandas(frames, schema=AUDIO_FRAME_SCHEMA)


PHASH_BITS = 60


def perceptual_hash(blobs: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hash (aHash family): per payload, a
    ``PHASH_BITS``-bin byte histogram thresholded at its mean — bit j set
    iff counts[j] * PHASH_BITS > n_bytes — folded into one BIGINT
    signature. 60 bits keeps the value clear of the sign bit in both
    engines (same device as the text SimHash). On real images the
    byte-histogram stage would be the decoded 8x8 grayscale mean-threshold;
    the signature/banding/verify plumbing is codec-agnostic.

    Same closure rules as ``decode_blobs``: self-contained, stdlib only."""
    bits = PHASH_BITS

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                counts = [0] * bits
                for b in data:
                    counts[b % bits] += 1
                n = len(data)
                sig = 0
                for j in range(bits):
                    if counts[j] * bits > n:
                        sig |= 1 << j
                out.append({"doc_id": doc_id, "phash": sig})
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return blobs.select("doc_id", "payload").mapInPandas(
        phash, "doc_id long, phash long"
    )
