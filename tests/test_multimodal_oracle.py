"""Preconditions for the multimodal SQL oracles (parity itself runs in the
test_oracle_parity sweep): the fixture payloads must be pure ASCII so
byte-level fake-codec math equals the oracle's character-level math."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.multimodal import (
    multimodal_decode_stats,
    multimodal_frame_sample,
)


def test_fixture_payloads_are_ascii(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_ascii = docs.filter(F.octet_length("text") != F.length("text")).count()
    assert non_ascii == 0, (
        "multimodal oracles equate byte and char offsets; a non-ASCII fixture "
        "would need the oracle rewritten over encode(text) blobs"
    )


def test_frame_sample_contract(spark, sf_dir):
    fr = multimodal_frame_sample(spark, sf_dir)
    agg = fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("frame_idx").alias("lo"), F.max("frame_idx").alias("hi")
    )
    bad = agg.filter((F.col("n") > 8) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.isEmpty()


def test_decode_stats_ranges(spark, sf_dir):
    st = multimodal_decode_stats(spark, sf_dir)
    bad = st.filter(
        ~F.col("width").between(64, 255)
        | ~F.col("height").between(64, 255)
        | (F.col("channels") != 3)
        | ~F.col("feature_argmax").between(0, 15)
    )
    assert bad.isEmpty()


def test_real_codec_hook_raises_without_pillow():
    """Where Pillow is absent the real-codec hook must raise
    NotImplementedError (the pipeline then substitutes the fake); where it
    is present this test is covered by test_real_codec_decodes_png."""
    import pytest

    from cdc_postgresql_clickhouse_spark.operators.multimodal import (
        _decode_image_real,
        pillow_available,
    )

    if pillow_available():
        pytest.skip("Pillow installed; real path tested below")
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"not an image")


def test_real_codec_decodes_png(spark):
    """Guarded real-codec path (skipif-Pillow): a genuine PNG payload decodes
    with its true dimensions through the SAME decode_blobs dataflow, while an
    invalid payload in the same batch falls back to the deterministic fake."""
    import hashlib
    import io

    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    from PIL import Image

    from cdc_postgresql_clickhouse_spark.operators.multimodal import (
        BLOB_SCHEMA,
        decode_blobs,
    )

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    rows = [
        (1, "png", len(png), hashlib.md5(png).hexdigest(), png),
        (2, "png", 9, hashlib.md5(b"not a png").hexdigest(), b"not a png"),
    ]
    out = {
        r.doc_id: r
        for r in decode_blobs(spark.createDataFrame(rows, BLOB_SCHEMA)).collect()
    }
    assert (out[1].width, out[1].height, out[1].channels) == (37, 21, 3)
    fake_w = 64 + hashlib.md5(b"not a png").digest()[0] % 192
    assert out[2].width == fake_w


def test_phash_finds_every_planted_copy(spark, sf_dir):
    """Copy-detection recall: every derived near-copy (doc_id + offset) must
    match its original within the Hamming budget — the one property the
    text-stand-in corpus can meaningfully certify (precision on text byte
    histograms is a fixture artifact, documented in the query)."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.dedup import DERIVED_OFFSET, NEARDUP_IDS
    from cdc_postgresql_clickhouse_spark.queries.multimodal import (
        multimodal_phash_neardup,
    )

    df = multimodal_phash_neardup(spark, sf_dir).cache()
    true_matches = df.filter(F.col("doc_b") - DERIVED_OFFSET == F.col("doc_a")).count()
    import os
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    expected = min(NEARDUP_IDS, n_docs)
    assert true_matches == expected, (true_matches, expected)
    # direction invariant: catalog side left, ingest side right
    assert df.filter(F.col("doc_a") >= DERIVED_OFFSET).count() == 0
    assert df.filter(F.col("doc_b") < DERIVED_OFFSET).count() == 0
