"""Registry compatibility rules over envelope row schemas: each transition
class maps to exactly the modes the Confluent semantics allow, and the T4
widening path is certified FULL."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_postgresql_clickhouse_spark.sources.envelope import ROW_SCHEMA
from cdc_postgresql_clickhouse_spark.sources.schema_compat import compatibility


def _s(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


BASE = _s(("id", LongType(), False), ("v", IntegerType(), True))


def test_add_optional_is_full():
    r = compatibility(BASE, _s(("id", LongType(), False), ("v", IntegerType(), True),
                               ("note", StringType(), True)))
    assert r.modes() == ["BACKWARD", "FORWARD", "FULL"]
    assert r.added_optional == ["note"]


def test_add_required_breaks_backward_only():
    r = compatibility(BASE, _s(("id", LongType(), False), ("v", IntegerType(), True),
                               ("must", StringType(), False)))
    assert not r.backward and r.forward
    assert r.modes() == ["FORWARD"]


def test_drop_required_breaks_forward_only():
    r = compatibility(BASE, _s(("v", IntegerType(), True)))
    assert r.backward and not r.forward
    assert r.dropped_required == ["id"]


def test_numeric_widening_is_full_but_narrowing_breaks_both():
    widened = compatibility(BASE, _s(("id", LongType(), False), ("v", LongType(), True)))
    assert widened.full and widened.widened == ["v"]
    narrowed = compatibility(
        _s(("id", LongType(), False), ("v", DoubleType(), True)), BASE
    )
    assert not narrowed.backward and not narrowed.forward
    assert narrowed.breaking_type_changes == ["v: double -> integer"]


def test_envelope_row_schema_self_and_widen():
    """The T4 widening the schema-change tests drive (add a nullable
    column to the bookings row) must certify FULL against the shipped
    ROW_SCHEMA."""
    same = compatibility(ROW_SCHEMA, ROW_SCHEMA)
    assert same.full and not same.widened
    widened = StructType(
        list(ROW_SCHEMA.fields) + [StructField("loyalty_tier", StringType(), True)]
    )
    assert compatibility(ROW_SCHEMA, widened).full
