"""Rotation-policy guard: every registered query that has never had a
driver CORRECTNESS row must sit inside the driver's 50-query window
(COVERAGE.md policy rule 2), and every query whose LATEST driver row is red
must stay inside the window until it goes green (rule 2b, added r5 per
VERDICT r4). A new query appended after position 49 — or a red query rotated
out while still unproven-fixed — would silently never be driver-verified;
this test makes both a red build instead."""

from __future__ import annotations

import glob
import json
import os

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_rows() -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a row, that row was green)."""
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            rounds[int(path.rsplit("_r", 1)[1].split(".")[0])] = data
    latest: dict[str, tuple[int, bool]] = {}
    for r in sorted(rounds):
        for q, v in rounds[r].items():
            green = bool(
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
                and not v.get("err")
            )
            latest[q] = (r, green)
    return latest


def test_never_driver_checked_queries_fill_the_window():
    """Rule 2 under the round-8 all-registered regime (VERDICT r7 #1: the
    whole pending layer registered at once, so never-checked rows can
    OUTNUMBER the window). Invariant: no already-green row may occupy a
    non-rule-1 window slot while a never-checked row waits behind the
    window — window slots are spent on unchecked (or rule-2b red) rows
    first; once unchecked rows all fit, they must ALL be inside."""
    from cdc_postgresql_clickhouse_spark.queries import all_oracles, all_queries

    names = list(all_queries())
    assert len(names) == len(set(names))
    # every query still has an oracle twin (100% oracle coverage invariant)
    assert set(names) == set(all_oracles())

    seen = _driver_rows()
    window = names[:WINDOW]
    never = [n for n in names if n not in seen]
    # cdc insurance rows, always fronted; capped at 2 while the
    # never-checked queue is non-empty (VERDICT r8 #1) so insurance
    # re-checks cannot delay first-time proof.
    n_rule1_slots = 2 if never else 9
    if never:
        insured = [n for n in window if n.startswith("cdc_") and n in seen and seen[n][1]]
        assert len(insured) <= n_rule1_slots, (
            f"{len(insured)} already-green cdc insurance rows in the window "
            f"while {len(never)} rows are never-checked (cap {n_rule1_slots}): {insured}"
        )
    if len(never) > WINDOW - n_rule1_slots:
        wasted = [
            n
            for n in window[n_rule1_slots:]
            if n in seen and seen[n][1]  # already checked AND green
        ]
        assert not wasted, (
            f"green already-checked rows occupy window slots while "
            f"{len(never)} rows have never been driver-checked: {wasted}"
        )
    else:
        outside = [n for n in never if n not in set(window)]
        assert not outside, (
            f"never-driver-checked queries outside the window: {outside}"
        )


def test_rule3_slots_fill_oldest_first():
    """Rule 3 (staleness, formalized r12 per VERDICT r11 #2): once the
    insurance rows and the never-checked queue are seated, the remaining
    window slots are spent on the already-green rows whose latest driver
    proof is OLDEST. Invariant: no behind-window green row may be strictly
    staler (smaller latest-checked round) than a green row occupying a
    rule-3 slot. cdc rows are exempt from the comparison — rule 1 governs
    them. At a round boundary (a fresh CORRECTNESS file stamping the window
    rows with the newest round) this test goes red by design, demanding the
    next rotation — the same contract the never-checked guard has carried
    since r8."""
    from cdc_postgresql_clickhouse_spark.queries import all_queries

    names = list(all_queries())
    seen = _driver_rows()
    window = names[:WINDOW]
    never = [n for n in names if n not in seen]
    if len(never) >= WINDOW - 2:
        return  # queue fills the window; rule 2 governs every slot
    behind = [n for n in names[WINDOW:] if n in seen and not n.startswith("cdc_")]
    rule3 = [
        n for n in window
        if n in seen and seen[n][1] and not n.startswith("cdc_")
    ]
    if not behind or not rule3:
        return
    oldest_behind = min(seen[n][0] for n in behind)
    stale_violations = [
        (n, seen[n][0]) for n in rule3 if seen[n][0] > oldest_behind
    ]
    assert not stale_violations, (
        f"rule-3 window slots hold rows newer than the stalest behind-window "
        f"row (round {oldest_behind}): {stale_violations}"
    )


def test_red_latest_driver_rows_register_inside_window():
    """Rule 2b: a query whose most recent driver CORRECTNESS row failed must
    re-register inside the first-50 window — rotating it out would leave the
    registry's only hard red signal unretested."""
    from cdc_postgresql_clickhouse_spark.queries import all_queries

    names = list(all_queries())
    window = set(names[:WINDOW])
    reds = [q for q, (_, green) in _driver_rows().items() if not green and q in names]
    outside = [q for q in reds if q not in window]
    assert not outside, f"red-latest queries outside the window: {outside}"


def test_window_front_is_exactly_the_driver_window():
    """_WINDOW_FRONT must be exactly the 50 driver-checked names, in order —
    a shorter list silently delegates window tail composition to module
    order; a longer one silently truncates."""
    from cdc_postgresql_clickhouse_spark.queries import _WINDOW_FRONT, all_queries

    assert len(_WINDOW_FRONT) == WINDOW
    assert len(set(_WINDOW_FRONT)) == WINDOW
    names = list(all_queries())
    assert names[:WINDOW] == _WINDOW_FRONT


MAX_PROOF_AGE = 10


def test_steady_state_proof_age_bound():
    """Staleness can never silently regrow (VERDICT r12 #3): with 50 window
    slots per round and ~416 registered queries, rules 1-3 re-prove every
    row at least once per ~9 rounds; MAX_PROOF_AGE = 10 adds one round of
    slack for insurance/new-registration pressure. Invariant: no registered
    query's latest driver proof may be more than MAX_PROOF_AGE rounds older
    than the newest driver round on record. (Rows with no proof yet are
    rule 2's job; rows no longer registered don't count.)"""
    from cdc_postgresql_clickhouse_spark.queries import all_queries

    names = set(all_queries())
    seen = _driver_rows()
    checked = {q: r for q, (r, _g) in seen.items() if q in names}
    if not checked:
        return
    newest = max(checked.values())
    stale = sorted(
        (q, r) for q, r in checked.items() if newest - r > MAX_PROOF_AGE
    )
    assert not stale, (
        f"latest driver proofs older than {MAX_PROOF_AGE} rounds behind "
        f"round {newest}: {stale} — rule 3 must front these next rotation"
    )
