"""Incremental OPTIMIZE laws: only overlapping files are rewritten, rows
survive as an exact multiset, the result is pairwise-disjoint in key
ranges, untouched files stay byte-identical, and the operation is
idempotent."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.layout import (
    _file_key_ranges,
    optimize_clustered,
    write_zordered,
    zorder_key,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _hashes(path):
    return {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(os.path.join(path, "*.parquet"))
    }


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select("x", "y").collect()
    )


def test_optimize_reclusters_only_overlaps_and_is_idempotent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    tmp = tempfile.mkdtemp(prefix="opt_zorder_")
    try:
        path = os.path.join(tmp, "t")
        # two interleaved clustered APPENDS: each half is internally sorted
        # but their global key ranges fully overlap -> everything dirty
        a = li.filter((F.col("x") + F.col("y")) % 2 == 0)
        b = li.filter((F.col("x") + F.col("y")) % 2 == 1)
        write_zordered(a, path, "x", "y", n_files=3)
        z = zorder_key(F.col("x"), F.col("y"), 16).alias("__z")
        (
            b.withColumn("__z", z)
            .repartitionByRange(3, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("append")
            .parquet(path)
        )
        before_rows = _rows(spark, path)

        stats = optimize_clustered(spark, path, "x", "y", n_files=6)
        assert stats["n_dirty"] > 0
        # rows survive exactly
        assert _rows(spark, path) == before_rows
        # post-state: pairwise-disjoint per-file key ranges
        keyed = spark.read.parquet(path).withColumn(
            "__k", zorder_key(F.col("x"), F.col("y"), 16)
        )
        ranges = sorted((lo, hi) for _, lo, hi in _file_key_ranges(keyed, "__k"))
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, ranges

        # idempotent: nothing overlaps anymore
        h_before = _hashes(path)
        stats2 = optimize_clustered(spark, path, "x", "y", n_files=6)
        assert stats2["n_dirty"] == 0
        assert _hashes(path) == h_before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_optimize_leaves_disjoint_files_untouched(spark, sf_dir):
    """A table with one well-clustered region plus two overlapping appends
    rewrites ONLY the overlapping files; the disjoint file's bytes stay
    identical."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    tmp = tempfile.mkdtemp(prefix="opt_part_")
    try:
        path = os.path.join(tmp, "t")
        z = zorder_key(F.col("x"), F.col("y"), 16)
        keyed = li.withColumn("__z", z)
        lowz = keyed.filter(F.col("__z") < 2000)
        high = keyed.filter(F.col("__z") >= 2000)
        # one clean low-range file
        lowz.sortWithinPartitions("__z").drop("__z").coalesce(1).write.parquet(path)
        # two overlapping high-range appends
        high.filter(F.col("x") % 2 == 0).drop("__z").coalesce(1).write.mode(
            "append"
        ).parquet(path)
        high.filter(F.col("x") % 2 == 1).drop("__z").coalesce(1).write.mode(
            "append"
        ).parquet(path)
        h_before = _hashes(path)
        before_rows = _rows(spark, path)

        stats = optimize_clustered(spark, path, "x", "y", n_files=4)
        assert stats["n_files"] == 3
        assert stats["n_dirty"] == 2
        # the clean file's bytes are untouched
        h_after = _hashes(path)
        untouched = set(h_before.items()) & set(h_after.items())
        assert len(untouched) == 1
        assert _rows(spark, path) == before_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_optimize_hilbert_variant(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    tmp = tempfile.mkdtemp(prefix="opt_hil_")
    try:
        path = os.path.join(tmp, "t")
        li.filter(F.col("x") % 2 == 0).coalesce(2).write.parquet(path)
        li.filter(F.col("x") % 2 == 1).coalesce(2).write.mode("append").parquet(path)
        before_rows = _rows(spark, path)
        stats = optimize_clustered(spark, path, "x", "y", n_files=4, key="hilbert")
        assert stats["n_dirty"] > 0
        assert _rows(spark, path) == before_rows
        stats2 = optimize_clustered(spark, path, "x", "y", n_files=4, key="hilbert")
        assert stats2["n_dirty"] == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_optimize_journal_heals_torn_swap(spark, sf_dir):
    """Crash window (ADVICE r6): staged files moved in, dirty originals not
    yet deleted. Simulated by restoring one doomed original next to the
    completed optimize output and re-planting the journal. The next call
    must FIRST finish the delete phase (the duplicate rows disappear before
    the table is read), then find nothing dirty to recluster."""
    import json

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    tmp = tempfile.mkdtemp(prefix="opt_journal_")
    try:
        path = os.path.join(tmp, "t")
        a = li.filter((F.col("x") + F.col("y")) % 2 == 0)
        b = li.filter((F.col("x") + F.col("y")) % 2 == 1)
        write_zordered(a, path, "x", "y", n_files=2)
        z = zorder_key(F.col("x"), F.col("y"), 16).alias("__z")
        (
            b.withColumn("__z", z)
            .repartitionByRange(2, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("append")
            .parquet(path)
        )
        want_rows = _rows(spark, path)
        # snapshot one pre-optimize file so we can resurrect it as the
        # "never deleted" original
        victim = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
        saved = os.path.join(tmp, "victim.parquet")
        shutil.copy(victim, saved)

        optimize_clustered(spark, path, "x", "y", n_files=4)
        assert _rows(spark, path) == want_rows

        # simulate the torn swap: original back in place, journal present
        resurrected = os.path.join(path, os.path.basename(victim))
        shutil.copy(saved, resurrected)
        with open(os.path.join(path, "_optimize_journal.json"), "w") as fh:
            json.dump({"dirty": [resurrected]}, fh)
        # the duplicate is visible to a raw read right now...
        assert len(_rows(spark, path)) > len(want_rows)

        # ...and the next optimize heals it before reading
        stats = optimize_clustered(spark, path, "x", "y", n_files=4)
        assert not os.path.exists(resurrected)
        assert not os.path.exists(os.path.join(path, "_optimize_journal.json"))
        assert stats["n_dirty"] == 0
        assert _rows(spark, path) == want_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_optimize_journal_rolls_forward_pre_move_crash(spark, sf_dir):
    """Crash window (ADVICE r7, HIGH): journal published, staged replacement
    files NOT yet moved into the table. Delete-only recovery would remove
    every dirty original while its replacement still sits in the orphaned
    staged dir — permanent data loss. Recovery must roll FORWARD: rescue the
    staged parquet into the table first, then delete the originals."""
    import json

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    tmp = tempfile.mkdtemp(prefix="opt_premove_")
    try:
        path = os.path.join(tmp, "t")
        li.filter(F.col("x") % 2 == 0).coalesce(1).write.parquet(path)
        li.filter(F.col("x") % 2 == 1).coalesce(1).write.mode("append").parquet(path)
        want_rows = _rows(spark, path)

        # hand-build the exact crash state: every current file journaled as
        # dirty, its full replacement written to a staged dir that never got
        # its move loop, journal (new format: dirty + staged) in place
        originals = sorted(glob.glob(os.path.join(path, "*.parquet")))
        staged = os.path.join(tmp, ".opt_staged_crash")
        spark.read.parquet(path).repartition(2).write.parquet(staged)
        with open(os.path.join(path, "_optimize_journal.json"), "w") as fh:
            json.dump({"dirty": originals, "staged": staged}, fh)

        stats = optimize_clustered(spark, path, "x", "y", n_files=4)
        # no row lost, no row duplicated
        assert _rows(spark, path) == want_rows
        # every doomed original is gone, the staged dir and journal cleaned
        assert not any(os.path.exists(f) for f in originals)
        assert not os.path.isdir(staged)
        assert not os.path.exists(os.path.join(path, "_optimize_journal.json"))
        assert stats is not None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
