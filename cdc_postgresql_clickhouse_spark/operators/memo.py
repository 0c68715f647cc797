"""Shared-memo lifecycle: explicit executor-block release on reset.

The shared-base memos (``queries/cluster.py::clusters``,
``queries/text_ext.py::langid_predictions``, ``queries/search.py::
_kie_relevant_ranks``, ``queries/similarity.py::semdedup_base``) hold
``localCheckpoint``-materialized DataFrames keyed by (applicationId,
sf_dir). Their reset hooks previously just cleared the dict: the dropped
checkpoint blocks then lingered in executor storage until Python GC plus
the async ContextCleaner happened to notice the orphaned RDD references —
across a full multi-pass bench (400+ queries, memos rebuilt per consumer
row) that accumulates into memory pressure that perturbs timings mid-run
(ADVICE r12). Every reset hook now funnels through ``release`` first, so
the blocks are freed synchronously at reset time.
"""

from __future__ import annotations


def release(df) -> None:
    """Free a localCheckpointed DataFrame's storage blocks immediately.

    For a checkpointed Dataset the logical plan is a ``LogicalRDD`` over
    the persisted internal-row RDD, so ``queryExecution().toRdd()`` IS the
    cached RDD — unpersisting it (non-blocking) releases the blocks without
    waiting for the ContextCleaner. Wrapped defensively: py4j API drift or
    an already-stopped context must never break a reset hook.
    """
    try:
        df._jdf.queryExecution().toRdd().unpersist(False)
    except Exception:
        pass
