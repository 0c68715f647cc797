"""Shared-base contract pins (VERDICT r11 #8): the declared consumers of
every shared memo (bench.SHARED_MEMO_CONSUMERS) must READ the materialized
base — physical plan scans the checkpoint blocks — never re-derive it; and
a memo reset must restore cold-start behavior so the producers' own bench
lines stay honest."""

from __future__ import annotations


def test_declared_consumers_read_the_memo(spark, sf_dir):
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from scripts.plan_audit import audit_shared_bases

    assert audit_shared_bases(spark, sf_dir) == []


def test_memo_reset_restores_cold_start(spark, sf_dir):
    """After reset, the memo dict is empty and a fresh call rebuilds —
    returning a NEW materialization, not the dropped one."""
    from cdc_postgresql_clickhouse_spark.queries import text_ext

    text_ext.reset_langid_cache()
    assert text_ext._LANGID_CACHE == {}
    a = text_ext.langid_predictions(spark, sf_dir)
    assert len(text_ext._LANGID_CACHE) == 1
    b = text_ext.langid_predictions(spark, sf_dir)
    assert a is b  # warm hit
    text_ext.reset_langid_cache()
    c = text_ext.langid_predictions(spark, sf_dir)
    assert c is not a
    text_ext.reset_langid_cache()
