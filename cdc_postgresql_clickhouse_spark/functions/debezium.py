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
decode runs inside whole-stage codegen. The decimal decode accepts payloads
up to 16 bytes (128-bit unscaled): PostgreSQL NUMERIC in precise mode can
exceed 64 bits, and a CDC decoder must not silently null high-precision
values. Values beyond decimal(38) (unrepresentable in Spark's decimal type)
and payloads over 16 bytes decode to NULL; ``debezium_decimal_overflow``
detects exactly those rows so a pipeline can route them to the DLQ instead
of losing them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC38 = "decimal(38,0)"
_TWO64 = str(2**64)
# bitwise NOT of a hex string, digit-by-digit (F→0, E→1, ...): the first step
# of two's-complement magnitude extraction without 128-bit integer support
_HEX_NOT_FROM = "0123456789ABCDEF"
_HEX_NOT_TO = "FEDCBA9876543210"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _conv_wide(h32: Column) -> Column:
    """Unsigned value of a 32-char (16-byte) hex string as decimal(38,0):
    hi/lo 64-bit halves via conv (which is exact through 64 bits), then
    hi * 2^64 + lo in exact decimal arithmetic. Overflow past decimal(38)
    yields NULL (non-ANSI decimal semantics), never a wrapped value."""
    hi = F.conv(F.substring(h32, 1, 16), 16, 10).cast(_DEC38)
    lo = F.conv(F.substring(h32, 17, 16), 16, 10).cast(_DEC38)
    # try_*: under ANSI mode (Spark 4 default) a plain overflow would THROW
    # mid-pipeline; NULL-on-overflow is the decode contract here
    return F.try_add(F.try_multiply(hi, F.lit(_TWO64).cast(_DEC38)), lo)


def decode_debezium_decimal(col: Column | str, scale: int) -> Column:
    """base64(big-endian two's-complement unscaled bytes) → decimal(38, scale).

    Accepts any payload length 1..16 bytes (Debezium emits minimal-length
    encodings, so the same value may arrive as 1 byte or 16). Negative
    values are decoded by explicit two's-complement magnitude extraction
    (hex-NOT via ``translate`` + 1), so the 16-byte bias 2^128 — which
    exceeds decimal(38) — never has to be materialized. NULL only for
    payloads over 16 bytes or magnitudes beyond decimal(38), both of which
    are unrepresentable; pair with ``debezium_decimal_overflow`` to route
    those to a DLQ rather than dropping them silently.
    """
    b = F.unbase64(_col(col))
    h = F.hex(b)  # two uppercase hex chars per byte, leading zeros preserved
    nbytes = F.length(b)
    negative = F.substring(h, 1, 1).isin(*"89ABCDEF")
    # pad to 32 hex chars: positives sign-extend with 00 (lpad "0" on h);
    # negatives sign-extend with FF, whose NOT-image is 00 (lpad "0" AFTER
    # the hex-NOT)
    pos = _conv_wide(F.lpad(h, 32, "0"))
    magnitude = F.try_add(
        _conv_wide(F.lpad(F.translate(h, _HEX_NOT_FROM, _HEX_NOT_TO), 32, "0")),
        F.lit(1).cast(_DEC38),
    )
    signed = F.when(negative, -magnitude).otherwise(pos)
    guarded = F.when(nbytes <= 16, signed)
    if scale == 0:
        return guarded.try_cast(_DEC38)
    # Apply the scale by placing the decimal point in the digit string rather
    # than dividing: Spark decimal division forces result scale >= 6, which
    # silently caps representable magnitude at ~1e32; string surgery keeps
    # the full decimal(38,scale) range and stays exact.
    raw_digits = F.abs(guarded).cast("string")
    # NB: lpad truncates longer strings — pad only when actually short
    digits = F.when(
        F.length(raw_digits) < scale + 1, F.lpad(raw_digits, scale + 1, "0")
    ).otherwise(raw_digits)
    ln = F.length(digits)
    txt = F.concat(
        F.when(guarded < 0, F.lit("-")).otherwise(F.lit("")),
        digits.substr(F.lit(1), ln - F.lit(scale)),
        F.lit("."),
        digits.substr(ln - F.lit(scale) + F.lit(1), F.lit(scale)),
    )
    return txt.try_cast(f"decimal(38,{scale})")


def debezium_decimal_overflow(col: Column | str) -> Column:
    """True where a precise-mode payload cannot be represented: longer than
    16 bytes, or within 16 bytes but beyond decimal(38). Use to split a
    decode into (decoded, dead-letter) without silent data loss."""
    b = F.unbase64(_col(col))
    decoded = decode_debezium_decimal(_col(col), scale=0)
    return b.isNotNull() & (decoded.isNull() | (F.length(b) > 16))


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
