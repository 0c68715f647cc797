"""Unit tests for the Debezium wire-type decoders (functions/debezium.py):
minimal- and fixed-length two's-complement decimal payloads, sign handling,
wide (9-16 byte) high-precision payloads, the 16-byte guard + overflow
detector, and hstore-as-JSON map decode."""

from __future__ import annotations

import base64
from decimal import Decimal

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.debezium import (
    debezium_decimal_overflow,
    decode_debezium_decimal,
    encode_debezium_unscaled,
    hstore_json_to_map,
)


def _b64_minimal(unscaled: int) -> str:
    """Debezium's actual encoding: minimal-length big-endian two's complement
    (BigInteger.toByteArray)."""
    n = max(1, (unscaled.bit_length() + 8) // 8)  # +8 keeps the sign bit
    return base64.b64encode(unscaled.to_bytes(n, "big", signed=True)).decode()


def test_decode_minimal_length_payloads(spark):
    cases = [0, 1, -1, 127, 128, -128, -129, 255, 99999, -99999, 2**55, -(2**55)]
    rows = [(str(i), _b64_minimal(v), v) for i, v in enumerate(cases)]
    df = spark.createDataFrame(rows, "id string, payload string, expected long")
    out = df.select(
        "expected", decode_debezium_decimal("payload", scale=2).alias("d")
    ).collect()
    for r in out:
        assert r.d == Decimal(r.expected).scaleb(-2), (r.expected, r.d)


def test_roundtrip_fixed_8_byte_encoding(spark):
    vals = [0, 1, -1, 123456789, -123456789, 2**62, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], "unscaled long")
    out = df.select(
        "unscaled",
        decode_debezium_decimal(encode_debezium_unscaled("unscaled"), scale=4).alias("d"),
    ).collect()
    for r in out:
        assert r.d == Decimal(r.unscaled).scaleb(-4), (r.unscaled, r.d)


def test_wide_payloads_decode_exactly(spark):
    """PostgreSQL NUMERIC beyond 64 bits (precision 19-38) must decode, not
    silently null — the ADVICE-flagged silent-data-loss mode."""
    cases = [
        2**70,
        -(2**70),
        10**30 + 7,
        -(10**30 + 7),
        10**37,
        -(10**37),
        2**127 - 10**38 + 1,  # still > decimal(38) → expect None
    ]
    rows = [(str(i), _b64_minimal(v), str(v)) for i, v in enumerate(cases)]
    df = spark.createDataFrame(rows, "id string, payload string, expected string")
    out = df.select(
        "expected", decode_debezium_decimal("payload", scale=0).alias("d")
    ).collect()
    for r in out:
        exp = int(r.expected)
        if abs(exp) < 10**38:
            assert r.d == Decimal(exp), (exp, r.d)
        else:
            assert r.d is None


def test_overflow_detector_flags_unrepresentable(spark):
    ok = _b64_minimal(10**30)
    too_wide = base64.b64encode((2**200).to_bytes(26, "big", signed=True)).decode()
    beyond_38 = _b64_minimal(2**127 - 1)  # 16 bytes but > decimal(38)
    df = spark.createDataFrame(
        [("ok", ok), ("wide", too_wide), ("big", beyond_38), ("nul", None)],
        "tag string, payload string",
    )
    got = {
        r.tag: r.o
        for r in df.select("tag", debezium_decimal_overflow("payload").alias("o")).collect()
    }
    assert got == {"ok": False, "wide": True, "big": True, "nul": False}


def test_hstore_json_to_map(spark):
    df = spark.createDataFrame(
        [('{"a": "1", "b": "x"}',), ("{}",), (None,), ("not json",)],
        "props string",
    )
    out = df.select(
        hstore_json_to_map("props").alias("m"),
        F.element_at(hstore_json_to_map("props"), F.lit("a")).alias("a"),
    ).collect()
    assert out[0].m == {"a": "1", "b": "x"} and out[0].a == "1"
    assert out[1].m == {}
    assert out[2].m is None and out[3].m is None
