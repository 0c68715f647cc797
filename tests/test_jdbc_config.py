"""JDBC endpoint config builders: unit-level (no live database in the
sandbox — the builders are pure; the reader wrapper must configure without
connecting)."""

from __future__ import annotations

import pytest

from cdc_postgresql_clickhouse_spark.sources.jdbc import (
    clickhouse_sink_options,
    mod_predicates,
    postgres_snapshot_options,
    postgres_snapshot_reader,
)


def _pg_kwargs(**over):
    kw = dict(
        host="pg.example", port=5432, dbname="defaultdb", user="avnadmin",
        password="s3cret", table="public.bookings",
    )
    kw.update(over)
    return kw


def test_postgres_options_url_and_ssl():
    opts = postgres_snapshot_options(**_pg_kwargs())
    assert opts["url"] == "jdbc:postgresql://pg.example:5432/defaultdb?sslmode=require"
    assert opts["dbtable"] == "public.bookings"
    assert opts["driver"] == "org.postgresql.Driver"
    assert "s3cret" not in opts["url"]  # password only in properties, never the URL


def test_postgres_partitioned_read_options():
    opts = postgres_snapshot_options(
        **_pg_kwargs(partition_column="id", lower_bound=0, upper_bound=1_000_000,
                     num_partitions=64)
    )
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "0", "1000000", "64",
    )


def test_postgres_partition_requires_bounds():
    with pytest.raises(ValueError, match="bound"):
        postgres_snapshot_options(**_pg_kwargs(partition_column="id"))


def test_reader_configures_without_connecting(spark):
    r = postgres_snapshot_reader(spark, **_pg_kwargs())
    # a DataFrameReader is returned fully configured; .load() would connect
    assert r is not None and hasattr(r, "load")


def test_mod_predicates_cover_exactly_once():
    preds = mod_predicates("booking_id", 8)
    assert len(preds) == 8
    assert preds[0] == "abs(booking_id) % 8 = 0"
    # each residue appears exactly once → disjoint and complete
    residues = [int(p.rsplit("= ", 1)[1]) for p in preds]
    assert sorted(residues) == list(range(8))
    with pytest.raises(ValueError):
        mod_predicates("k", 0)


def test_clickhouse_sink_options():
    opts = clickhouse_sink_options(
        host="ch.example", port=8443, database="default", table="bookings_changes",
        user="avnadmin", password="s3cret",
    )
    assert opts["url"] == "jdbc:clickhouse://ch.example:8443/default?ssl=true"
    assert opts["isolationLevel"] == "NONE"
    assert opts["batchsize"] == "100000"
    assert "s3cret" not in opts["url"]
