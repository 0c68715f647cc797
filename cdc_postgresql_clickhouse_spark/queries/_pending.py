"""Pending-registry flip helper shared by the queries modules.

Each module stages new operators in ``PENDING_QUERIES``/``PENDING_ORACLE``
and flips them into the registered ``QUERIES``/``ORACLE`` dicts once they
enter the driver contract. The former inline idiom
(``for _n in list(PENDING_QUERIES): ...; del _n``) raised ``NameError`` at
import time whenever a module's pending dict was empty — which would break
the whole queries package import the first round a module adds the flip
block before staging any rows (ADVICE r8). This helper is a no-op on an
empty pending dict.
"""

from __future__ import annotations

from collections.abc import Iterable


def flip_pending(
    pending_queries: dict,
    pending_oracle: dict,
    queries: dict,
    oracle: dict,
    names: Iterable[str] | None = None,
) -> None:
    """Move ``names`` (default: everything pending) from the pending dicts
    into the registered dicts. Oracle-less rows (genuinely non-SQL ops) are
    flipped without an oracle entry."""
    for n in list(pending_queries) if names is None else list(names):
        queries[n] = pending_queries.pop(n)
        if n in pending_oracle:
            oracle[n] = pending_oracle.pop(n)
