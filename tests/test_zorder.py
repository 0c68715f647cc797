"""Z-order layout: the Morton key interleaves correctly, and a z-ordered
file layout gives BOTH dimensions tight per-file min/max boxes — the
property min/max data skipping prunes on — where a one-column sort helps
only its leading column."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.layout import write_zordered, zorder_key


def test_zorder_key_bit_interleave(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 4).alias("z")).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # bit 0 of a -> position 0
    assert got[(0, 1)] == 2  # bit 0 of b -> position 1
    # a=3 (011), b=5 (101): interleave -> b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    assert got[(3, 5)] == 0b100111


def _file_boxes(spark, path):
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    return {
        r.f: (r.xa, r.xb, r.ya, r.yb)
        for r in df.groupBy("f")
        .agg(F.min("x").alias("xa"), F.max("x").alias("xb"), F.min("y").alias("ya"), F.max("y").alias("yb"))
        .collect()
    }


def _files_hit(boxes, x_lo, x_hi, y_lo, y_hi):
    return sum(
        1 for xa, xb, ya, yb in boxes.values() if xb >= x_lo and xa <= x_hi and yb >= y_lo and ya <= y_hi
    )


def test_zorder_prunes_both_dimensions(spark):
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    with tempfile.TemporaryDirectory() as tmp:
        zpath = os.path.join(tmp, "zord")
        xpath = os.path.join(tmp, "xsort")
        write_zordered(grid, zpath, "x", "y", n_files=16, bits=8)
        (
            grid.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.parquet(xpath)
        )
        zb, xb = _file_boxes(spark, zpath), _file_boxes(spark, xpath)
        assert len(zb) >= 8 and len(xb) >= 8
        # a small box predicate in BOTH dims: z-order layout must touch far
        # fewer files than the x-sorted layout does for a y-only predicate
        z_hits = _files_hit(zb, 0, 15, 0, 15)
        x_hits_y_pred = _files_hit(xb, 0, n - 1, 0, 15)  # y predicate only
        assert z_hits <= len(zb) // 2, (z_hits, len(zb))
        assert x_hits_y_pred == len(xb)  # x-sort cannot prune on y at all
        # and the z layout still prunes decently on a pure-x predicate
        assert _files_hit(zb, 0, 7, 0, n - 1) < len(zb)


def test_zbucket_spans_bounded(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.zorder import layout_zorder_clustering

    from pyspark.sql import functions as F

    out = layout_zorder_clustering(spark, sf_dir)
    # top-6-of-16 interleaved bits -> each bucket is a 2^5 x 2^5 box
    assert out.filter((F.col("x_span") > 31) | (F.col("y_span") > 31)).count() == 0
    assert out.count() > 1


def test_hilbert_key_matches_reference_and_is_bijective(spark):
    """The unrolled Hilbert stages equal the classic xy2d loop on every
    coordinate of a 32x32 grid (bits=5), keys are a bijection onto
    [0, 1024), and consecutive keys are Manhattan-adjacent — the property
    that makes Hilbert strictly better than Morton at partition seams."""
    from cdc_postgresql_clickhouse_spark.operators.layout import hilbert_stages

    bits, n = 5, 32

    def rot(x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        return x, y

    def xy2d(x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(x, y, rx, ry)
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.hkey
        for r in hilbert_stages(grid, "x", "y", bits, out="hkey").collect()
    }
    inv = {}
    for (x, y), d in got.items():
        assert d == xy2d(x, y), (x, y, d)
        inv[d] = (x, y)
    assert sorted(inv) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_buckets_are_tight_quadrants(spark, sf_dir):
    """Every 1024-key bucket of the 8-bit curve is one 32x32 subquadrant:
    both spans bounded by 31, rows conserved."""
    from cdc_postgresql_clickhouse_spark.queries.zorder import layout_hilbert_clustering
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    out = layout_hilbert_clustering(spark, sf_dir).toPandas()
    assert (out.x_span <= 31).all() and (out.y_span <= 31).all()
    assert out.n_rows.sum() == load_table(spark, sf_dir, "lineitem").count()
