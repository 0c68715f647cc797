"""Crash-safe versioned MV artifacts for the streaming MV sinks.

``streaming/mv.py`` and ``streaming/join_mv.py`` maintain two artifacts per
batch: the key state (idempotent version arg-max — safe to re-apply) and the
MV aggregate (NON-idempotent linear deltas). Writing the MV with a plain
``mode("overwrite")`` and fencing replays on the KEY state's applied_bid is
not crash-safe: the two commits are separate, so a crash between them leaves
the MV advanced but the fence behind (replay double-applies the deltas), and
a crash during the overwrite itself destroys the only copy of the aggregate.

This store gives the MV its OWN fence and makes its publication atomic:

- each batch's MV lands in a fresh ``v{batch_id}/`` directory under the MV
  root (never touching the current version);
- a one-line manifest file (``MV_CURRENT``) names the live version and is
  swapped with ``os.replace`` — atomic on POSIX — after the directory is
  fully written;
- readers resolve the manifest only, so a half-written ``v*`` directory from
  a crashed batch is invisible;
- the ingest consults ``read_mv_versioned``'s returned batch id as the MV
  fence: if it already records ``>= batch_id``, the deltas for this batch
  are ALREADY in the aggregate and the merge is skipped (the key state is
  then re-applied idempotently, closing the crash window between the two
  commits in either direction);
- a manifest that names a missing directory raises instead of silently
  resetting the aggregate (the failure mode of the old bare
  ``except Exception: mv_old = None``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "MV_CURRENT"


def read_mv_versioned(
    spark: SparkSession, mv_root: str
) -> tuple[DataFrame | None, int]:
    """Resolve the live MV version. Returns ``(df, applied_bid)``;
    ``(None, -1)`` when no version has ever been published."""
    manifest = os.path.join(mv_root, _MANIFEST)
    try:
        with open(manifest) as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None, -1
    if not name.startswith("v"):
        raise RuntimeError(f"corrupt MV manifest {manifest!r}: {name!r}")
    path = os.path.join(mv_root, name)
    if not os.path.isdir(path):
        # The manifest is swapped AFTER its directory is fully written, so a
        # missing directory is real corruption (manual deletion, torn copy):
        # fail loudly rather than rebuilding the aggregate from one batch.
        raise RuntimeError(
            f"MV manifest {manifest!r} names missing version {name!r}"
        )
    return spark.read.parquet(path), int(name[1:])


def publish_mv_versioned(df: DataFrame, mv_root: str, batch_id: int) -> None:
    """Write ``df`` as version ``batch_id`` and atomically make it current."""
    name = f"v{int(batch_id)}"
    path = os.path.join(mv_root, name)
    # overwrite handles a half-written directory left by a crashed attempt
    df.write.mode("overwrite").parquet(path)
    tmp = os.path.join(mv_root, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        f.write(name + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mv_root, _MANIFEST))
    # Best-effort cleanup of superseded versions, KEEPING the immediately
    # previous one (ADVICE r7: read_mv takes no lock and returns a lazy
    # DataFrame, so a reader that resolved the manifest just before this
    # publish may still be scanning the old version's directory — deleting
    # it mid-scan fails the read or drops rows. One generation of grace
    # outlives any lazy plan created before the swap; v_{N-2} and older are
    # unreferenced by both the manifest and any pre-swap reader). A crash
    # here only leaves unreferenced directories that the next publish
    # removes.
    live = {name}
    older = sorted(
        (
            int(entry[1:])
            for entry in os.listdir(mv_root)
            if entry.startswith("v") and entry != name and entry[1:].isdigit()
        ),
        reverse=True,
    )
    if older:
        live.add(f"v{older[0]}")
    for entry in os.listdir(mv_root):
        if entry.startswith("v") and entry not in live:
            shutil.rmtree(os.path.join(mv_root, entry), ignore_errors=True)
