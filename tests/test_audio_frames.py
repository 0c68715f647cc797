"""Audio framing: the real stdlib-wave path decodes a synthesized RIFF WAV
(16-bit PCM) to true samples; non-RIFF payloads take the deterministic
8-bit-PCM fake; frame arithmetic invariants hold on the fixture."""

from __future__ import annotations

import io
import math
import struct
import wave

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.multimodal import AUDIO_FRAME_LEN, audio_frames
from cdc_postgresql_clickhouse_spark.queries.multimodal import multimodal_audio_frames


def _wav_bytes(samples: list[int], channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_real_wav_path_decodes_true_samples(spark):
    # constant-amplitude signal: RMS of every full frame == amplitude
    amp = 1000
    samples = [amp] * (AUDIO_FRAME_LEN * 2)
    df = spark.createDataFrame(
        [(1, _wav_bytes(samples))], "doc_id long, payload binary"
    )
    rows = audio_frames(df).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1]
    assert all(r.n_samples == AUDIO_FRAME_LEN for r in rows)
    expected = math.floor(float(amp) * 1000000.0) / 1000000.0
    assert all(r.rms == expected for r in rows)


def test_real_wav_stereo_takes_first_channel(spark):
    # interleaved L=2000, R=0: first-channel extraction -> RMS 2000
    inter = [2000, 0] * AUDIO_FRAME_LEN
    df = spark.createDataFrame(
        [(7, _wav_bytes(inter, channels=2))], "doc_id long, payload binary"
    )
    rows = audio_frames(df).collect()
    assert len(rows) == 1 and rows[0].n_samples == AUDIO_FRAME_LEN
    assert rows[0].rms == 2000.0


def test_fake_path_frame_arithmetic(spark, sf_dir):
    out = multimodal_audio_frames(spark, sf_dir).cache()
    assert out.count() > 0
    # full frames have exactly AUDIO_FRAME_LEN samples; only the last frame
    # per doc may be short; frame indices dense from 0
    per_doc = out.groupBy("doc_id").agg(
        F.max("frame_idx").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("n_samples") != AUDIO_FRAME_LEN, 1).otherwise(0)).alias("short"),
    )
    assert per_doc.filter(F.col("mx") != F.col("n") - 1).count() == 0
    assert per_doc.filter(F.col("short") > 1).count() == 0
    # RMS bounded by the max |sample| of the 8-bit fake (<= 128)
    assert out.filter((F.col("rms") < 0) | (F.col("rms") > 128)).count() == 0
