"""Property-based tests (hypothesis) for the retraction MV and the
ordered-fold sink: on RANDOMIZED change streams and RANDOMIZED batch
splits, the incrementally-maintained results must equal their one-shot
batch twins — the algebraic claim behind both modules, checked beyond the
fixture workload. Key/version domains are small on purpose: same-key
same-batch collisions, group migrations, tombstone churn, and stale
deliveries are the interesting cases."""

from __future__ import annotations

import shutil
import tempfile
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_postgresql_clickhouse_spark.streaming.fold import (
    ingest_batch_ewma,
    read_ewma,
)
from cdc_postgresql_clickhouse_spark.streaming.mv import ingest_batch_mv, read_mv

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (key, us, eid, group_idx, cents); (us, eid) unique via eid enumeration
mv_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=5),   # us (ties allowed)
        st.integers(min_value=0, max_value=3),   # group index (3 = tombstone)
        st.integers(min_value=0, max_value=50),  # cents
    ),
    min_size=1,
    max_size=14,
)

_GROUPS = ["view", "click", "purchase", "error"]
_MV_SCHEMA = "user_id long, us long, eid long, event_type string, cents long"


def _mv_rows(raw):
    return [
        (k, us, eid, _GROUPS[g], c) for eid, (k, us, g, c) in enumerate(raw)
    ]


def _model_mv(rows):
    latest = {}
    for k, us, eid, g, c in rows:
        cur = latest.get(k)
        if cur is None or (us, eid) > (cur[0], cur[1]):
            latest[k] = (us, eid, g, c)
    agg = defaultdict(lambda: [0, 0])
    for us, eid, g, c in latest.values():
        if g != "error":
            agg[g][0] += 1
            agg[g][1] += c
    return {g: tuple(v) for g, v in agg.items()}


@given(raw=mv_events, split=st.integers(min_value=1, max_value=13))
@PROP_SETTINGS
def test_mv_equals_model_under_any_split(spark, raw, split):
    rows = _mv_rows(raw)
    b1, b2 = rows[:split], rows[split:]
    tmp = tempfile.mkdtemp(prefix="mv_prop_")
    try:
        for i, batch in enumerate((b1, b2)):
            if batch:
                ingest_batch_mv(
                    spark, spark.createDataFrame(batch, _MV_SCHEMA), tmp, batch_id=i
                )
        got = {
            r.last_event_type: (r.n_users, r.sum_cents)
            for r in read_mv(spark, tmp).collect()
        }
        assert got == _model_mv(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ordered-fold events: per-key us strictly increasing by construction
fold_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=40),  # cents
    ),
    min_size=1,
    max_size=12,
)


def _model_ewma(rows):
    streams = defaultdict(list)
    for k, _us, _eid, c in rows:
        streams[k].append(float(c))
    out = {}
    for k, cs in streams.items():
        acc = cs[0]
        for x in cs[1:]:
            acc = (acc + x) * 0.5
        out[k] = (len(cs), int(cs[-1]), acc)
    return out


@given(raw=fold_events, split=st.integers(min_value=1, max_value=11))
@PROP_SETTINGS
def test_fold_equals_model_under_any_ordered_split(spark, raw, split):
    # enumerate us/eid so arrival order IS time order (the fold's contract)
    rows = [(k, i, i, c) for i, (k, c) in enumerate(raw)]
    b1, b2 = rows[:split], rows[split:]
    tmp = tempfile.mkdtemp(prefix="fold_prop_")
    try:
        state = f"{tmp}/state"
        schema = "user_id long, us long, eid long, c long"
        for i, batch in enumerate((b1, b2)):
            if batch:
                ingest_batch_ewma(
                    spark, spark.createDataFrame(batch, schema), state, batch_id=i
                )
        got = {
            r.user_id: (r.n_events, r.last_cents, r.ewma_cents)
            for r in read_ewma(spark, state).collect()
        }
        assert got == _model_ewma(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
