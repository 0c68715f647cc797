"""KMV sketch invariants: estimator accuracy vs exact distinct counts, and
the exact-count fallback for groups smaller than k."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.sketches import KMV_K, sketch_kmv_distinct
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_kmv_estimate_within_theoretical_error(spark, sf_dir):
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    got = sketch_kmv_distinct(spark, sf_dir).join(exact, "event_type").collect()
    assert got
    for r in got:
        if r.n_tracked < KMV_K:
            assert r.kmv_estimate == float(r.exact), r
        else:
            # KMV std error ~ 1/sqrt(k-2) ~ 12.7% at k=64; allow 4 sigma
            rel = abs(r.kmv_estimate - r.exact) / r.exact
            assert rel < 0.51, (r.event_type, r.exact, r.kmv_estimate)


def test_kmv_small_group_exact_fallback(spark):
    df = spark.createDataFrame(
        [(i, "rare" if i < 5 else "common") for i in range(500)],
        "user_id long, event_type string",
    )
    df.createOrReplaceTempView("tiny_events")
    from pyspark.sql import Window
    from cdc_postgresql_clickhouse_spark.queries.sketches import _HEX_DIGITS

    hashed = df.select(
        "event_type", F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    per = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_tracked"))
        .collect()
    )
    by = {r.event_type: r.n_tracked for r in per}
    assert by["rare"] == 5  # < k -> the query path reports exactly 5.0
    assert by["common"] == KMV_K


def test_mad_anomaly_invariants(spark, sf_dir):
    from pyspark.sql.types import LongType, StringType

    from cdc_postgresql_clickhouse_spark.queries.sketches import events_anomaly_mad

    out = events_anomaly_mad(spark, sf_dir)
    # r4 lesson: the driver env diverged on double percentile interpolation,
    # so the contract is now ZERO non-integer columns in the output schema
    for f in out.schema.fields:
        assert isinstance(f.dataType, (LongType, StringType)), f
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_anomalies < r.n_events
        assert r.mad_qcents >= 0
        # robust center must sit inside the data range (cents are >= 0 here)
        assert r.median_halfcents >= 0


def test_mad_flags_planted_outlier(spark):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import mad_report

    # 99 values near 10.00, one at 10000.00: the robust rule must flag
    # exactly the one outlier (a mean/stddev rule would be dragged by it)
    vals = [(i, "t", 10.0 + (i % 5) * 0.01) for i in range(99)] + [(99, "t", 10000.0)]
    df = spark.createDataFrame(vals, "event_id long, event_type string, value double")
    d = df.select("event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"))
    r = mad_report(d).first()
    assert r.n_anomalies == 1


def test_mad_rank_median_hand_computed(spark):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import mad_report

    # odd count {1,2,100}: median 2 -> 4 half-cents; ads {1,0,98} -> median 1
    # -> mad 4 quarter-cents... ads in half-cents: |2c-4| = {2,0,196},
    # sorted {0,2,196}, median 2 half-cents -> mad_qc = 2+2 = 4
    odd = spark.createDataFrame(
        [("t", 1), ("t", 2), ("t", 100)], "event_type string, c long"
    )
    r = mad_report(odd).first()
    assert r.median_halfcents == 4 and r.mad_qcents == 4
    # even count {1,2,3,100}: median 2.5 cents -> 5 half-cents; ads in
    # half-cents |2c-5| = {3,1,1,195}, sorted {1,1,3,195}, even midpoint
    # (1+3)/2 -> mad_qc = 1+3 = 4 (i.e. 1.0 cent)
    even = spark.createDataFrame(
        [("t", 1), ("t", 2), ("t", 3), ("t", 100)], "event_type string, c long"
    )
    r = mad_report(even).first()
    assert r.median_halfcents == 5 and r.mad_qcents == 4


def test_ewma_recurrence_hand_computed(spark):
    import datetime

    from cdc_postgresql_clickhouse_spark.queries import sketches

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(seconds=i), i, float(v))
        for i, v in enumerate([4.0, 8.0, 16.0])
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    import types

    # drive the same expression tree through a temp view of the fixture shape
    from pyspark.sql import functions as F

    d = df.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id").alias("eid"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        ).alias("s"),
    )
    arr = d.groupBy("user_id").agg(F.sort_array(F.collect_list("s")).alias("a"))
    ewma = F.aggregate(
        F.slice("a", 2, F.size("a") - 1),
        F.element_at("a", 1).getField("c").cast("double"),
        lambda acc, s: (acc + s.getField("c")) * F.lit(0.5),
    )
    got = arr.select(ewma.alias("e")).first().e
    # fold: 400 -> (400+800)/2 = 600 -> (600+1600)/2 = 1100
    assert got == 1100.0


def test_ewma_fixture_bounds(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.sketches import events_user_ewma

    out = events_user_ewma(spark, sf_dir).cache()
    assert out.count() > 0
    from pyspark.sql import functions as F

    # EWMA is a convex combination of observed cents: stays within [min, max]
    # of the user's values, here conservatively [0, max_cents_overall]
    assert out.filter(F.col("ewma_cents") < 0).count() == 0
    assert out.filter(F.col("n_events") < 1).count() == 0


def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.sketches import HLL_M, sketch_hll_distinct

    rows = sketch_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.registers_used <= HLL_M
        # HLL std error ~ 1.04/sqrt(m) = 13% at m=64; linear counting better
        rel = abs(r.hll_estimate - r.n_exact) / max(r.n_exact, 1)
        assert rel < 0.52, (r.event_type, r.n_exact, r.hll_estimate)


def test_hll_linear_counting_small_range(spark):
    # 3 distinct ids -> z = 64 - used > 0 and E_raw tiny: the linear-counting
    # branch must engage and land near 3
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        _HEX_DIGITS,
        _HLL_SUFFIX_BITS,
        _rho_case,
    )

    df = spark.createDataFrame([(i % 3,) for i in range(300)], "user_id long")
    split = df.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS), 16, 10)
        .cast("long").alias("v")
    ).select(
        F.shiftright(F.col("v"), _HLL_SUFFIX_BITS).alias("reg"),
        (F.col("v") % F.lit(1 << _HLL_SUFFIX_BITS)).alias("w"),
    )
    used = split.withColumn("rho", F.expr(_rho_case("w"))).groupBy("reg").count().count()
    assert used == 3  # 3 distinct hashes -> at most (here exactly) 3 registers


def test_cms_one_sided_error_and_no_false_negatives(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        CMS_PHI,
        sketch_cms_heavy_hitters,
    )
    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    out = sketch_cms_heavy_hitters(spark, sf_dir).collect()
    assert out
    # CMS never undercounts
    for r in out:
        assert r.cms_count >= r.exact_count, r
    # every TRUE heavy hitter is present (one-sided threshold error)
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term").count()
    )
    total = vocab.agg(F.sum("count")).first()[0]
    threshold = int(total * CMS_PHI)
    true_heavy = {r.term for r in vocab.filter(F.col("count") >= threshold).collect()}
    reported = {r.term for r in out}
    assert true_heavy <= reported, true_heavy - reported


def test_kmv_merge_equals_direct_build(spark, sf_dir):
    """The mergeability theorem: k-smallest of (union of per-type k-smallest
    sets) equals k-smallest of the union's full hash set, so the merged-state
    estimate must EQUAL the estimate from a direct build over the combined
    stream — not merely approximate it."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        KMV_K,
        _HEX_DIGITS,
        _NORM,
        sketch_kmv_union,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    merged = {(r.type_a, r.type_b): r.kmv_estimate for r in sketch_kmv_union(spark, sf_dir).collect()}
    assert merged
    ev = load_table(spark, sf_dir, "events")
    for (a, b), est in merged.items():
        hashes = sorted(
            r.h
            for r in ev.filter(F.col("event_type").isin(a, b))
            .select(F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h"))
            .distinct()
            .collect()
        )
        if len(hashes) < KMV_K:
            direct = float(len(hashes))
        else:
            direct = (KMV_K - 1) / (int(hashes[KMV_K - 1], 16) / _NORM)
        import math
        assert est == math.floor(direct * 1e6) / 1e6, (a, b, est, direct)


def test_quantile_bottomk_merge_equals_direct_build(spark, sf_dir):
    """The mergeable-quantile property: pair-of-types quantiles computed
    from the two per-type bottom-k states must EQUAL quantiles from a
    direct bottom-k build over the combined stream — exactly, not
    approximately (bottom-k of a union of bottom-k's is the union's
    bottom-k; event ids are disjoint across types)."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        QSK_K,
        _bottomk_state,
        _sample_quantiles,
        sketch_quantile_merge,
    )
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    merged = {
        (r.type_a, r.type_b): (r.m_sample, r.p25_cents, r.p50_cents, r.p75_cents)
        for r in sketch_quantile_merge(spark, sf_dir).collect()
    }
    assert merged
    ev = load_table(spark, sf_dir, "events")
    for (a, b), got in list(merged.items())[:3]:  # 3 pairs: direct build is per-pair work
        combined = ev.filter(F.col("event_type").isin(a, b)).withColumn(
            "event_type", F.lit(f"{a}|{b}")
        )
        st = _bottomk_state(combined, QSK_K)
        r = _sample_quantiles(st, ["event_type"]).first()
        assert got == (r.m_sample, r.p25_cents, r.p50_cents, r.p75_cents), (a, b)


def test_quantile_bottomk_schema_and_sample_accuracy(spark, sf_dir):
    """All-BIGINT output; sample quantiles land within the O(1/sqrt(k))
    rank-error band of the exact quantiles."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType

    from cdc_postgresql_clickhouse_spark.queries.sketches import sketch_quantile_bottomk
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    out = sketch_quantile_bottomk(spark, sf_dir)
    for f in out.schema.fields:
        assert isinstance(f.dataType, (LongType, StringType)), f
    rows = {r.event_type: r for r in out.collect()}
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    for et, r in rows.items():
        assert r.p25_cents <= r.p50_cents <= r.p75_cents, r
        cs = sorted(x.c for x in ev.filter(F.col("event_type") == et).collect())
        n = len(cs)
        # rank error ~ n/sqrt(k) at k=64 -> 12.5% of n; allow 4 sigma
        for q, got in ((0.25, r.p25_cents), (0.5, r.p50_cents), (0.75, r.p75_cents)):
            import bisect
            lo_rank = bisect.bisect_left(cs, got)
            hi_rank = bisect.bisect_right(cs, got)
            target = q * n
            slack = 0.5 * n  # 4 sigma at k=64
            assert lo_rank - slack <= target <= hi_rank + slack, (et, q, got)


def test_quantile_error_report_zero_when_sample_is_whole_stream(spark, sf_dir):
    """With k >= n the bottom-k sample IS the full stream, so the sketch and
    exact nearest-rank quantiles must coincide exactly — pinning that both
    sides use identical rank arithmetic (any off-by-one would show here)."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.sketches import (
        QSK_K,
        sketch_quantile_error_report,
    )

    full = sketch_quantile_error_report(spark, sf_dir, k=10_000_000).cache()
    assert full.filter(
        (F.col("err25_cents") != 0) | (F.col("err50_cents") != 0) | (F.col("err75_cents") != 0)
    ).count() == 0
    assert full.filter(F.col("m_sample") != F.col("n_events")).count() == 0

    # at the real k the sample caps at k and errors are bounded integers >= 0
    real = sketch_quantile_error_report(spark, sf_dir).cache()
    assert real.filter(F.col("m_sample") > QSK_K).count() == 0
    assert real.filter(F.col("err50_cents") < 0).count() == 0
