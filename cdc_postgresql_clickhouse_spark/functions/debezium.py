"""Debezium wire-format decoders the reference configures but never exercises
(its bookings schema has no NUMERIC/HSTORE columns): precise-mode decimals
(``decimal.handling.mode=precise``, ``decimal.format=BASE64`` —
reference debezium_configuration.json:21,26) and hstore-as-JSON
(``hstore.handling.mode=json`` — debezium_configuration.json:24). Flagged in
SURVEY.md §7 as the deferred edge of the envelope surface.

Wire formats:
- precise decimal: the *unscaled* integer as minimal-length big-endian
  two's-complement bytes, base64-encoded; the scale travels in the (here
  out-of-band) schema.
- hstore: a JSON object string ``{"k": "v", ...}``.

Everything below is built-in Catalyst expressions — no Python UDFs — so the
decode runs inside whole-stage codegen. ``conv`` bounds the decimal decode at
8 bytes (64-bit unscaled, i.e. precision ≤ 18 — every PostgreSQL NUMERIC a
CDC pipeline realistically carries); longer payloads decode to NULL rather
than silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 256^n for n = 1..8 as exact decimals: the two's-complement bias per byte length.
_POW256 = [str(256**i) for i in range(1, 9)]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decode_debezium_decimal(col: Column | str, scale: int) -> Column:
    """base64(big-endian two's-complement unscaled bytes) → decimal(38, scale).

    Accepts any payload length 1..8 bytes (Debezium emits minimal-length
    encodings, so the same value may arrive as 1 byte or 8). NULL for longer
    payloads (unscaled > 64 bits) instead of a wrapped/garbage value.
    """
    b = F.unbase64(_col(col))
    h = F.hex(b)  # two uppercase hex chars per byte, leading zeros preserved
    nbytes = F.length(b)
    unsigned = F.conv(h, 16, 10).cast("decimal(38,0)")
    bias = F.element_at(
        F.array(*[F.lit(p).cast("decimal(38,0)") for p in _POW256]), nbytes
    )
    negative = F.substring(h, 1, 1).isin(*"89ABCDEF")
    signed = F.when(negative, unsigned - bias).otherwise(unsigned)
    guarded = F.when(nbytes <= 8, signed)
    return (guarded / F.lit(10**scale)).cast(f"decimal(38,{scale})")


def encode_debezium_unscaled(unscaled: Column | str) -> Column:
    """Inverse for round-trip tests: a 64-bit unscaled integer → base64 of its
    8-byte big-endian two's-complement form (a valid, non-minimal Debezium
    encoding of the same value)."""
    h = F.lpad(F.hex(_col(unscaled)), 16, "0")  # hex(long) is already 2's-complement
    return F.base64(F.to_binary(h, F.lit("hex")))


def encode_debezium_decimal(col: Column | str, scale: int) -> Column:
    """decimal/double column → Debezium precise-mode base64 (unscaled at the
    given scale, half-up like Debezium's BigDecimal.setScale)."""
    unscaled = F.round(_col(col) * F.lit(10**scale)).cast("long")
    return encode_debezium_unscaled(unscaled)


def hstore_json_to_map(col: Column | str) -> Column:
    """hstore.handling.mode=json payload → map<string,string> (NULL values and
    malformed JSON → NULL map, matching from_json's lenient mode)."""
    return F.from_json(_col(col), "map<string,string>")
