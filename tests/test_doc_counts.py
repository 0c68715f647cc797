"""Doc-count drift guard (VERDICT r12 #7): the README's stated operator
count must equal len(all_queries()) at HEAD, so a closing registration can
never desynchronize the narrative from the registry (commit c29e222 said
413 while HEAD held 414). The count is parsed from the exact wording the
README pins; if the wording changes, change BOTH together."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_operator_count_matches_registry():
    from cdc_postgresql_clickhouse_spark.queries import all_oracles, all_queries

    n = len(all_queries())
    assert len(all_oracles()) == n  # 100% oracle pairing, the README's claim
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    m = re.search(r"`queries\(\)` \((\d+) operators, every one oracle-paired\)", readme)
    assert m, "README.md no longer carries the pinned operator-count wording"
    assert int(m.group(1)) == n, (
        f"README.md says {m.group(1)} operators but the registry holds {n} — "
        "update the README count in the same commit that registers a query"
    )
