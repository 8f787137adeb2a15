"""Registry-size drift gate: the counts quoted in the docs must match
the live registry, so they can never go stale again (the round-4
verdict caught "119"/"157" claims against a 179-query registry)."""

from __future__ import annotations

import re

from quack_reduce_spark.inventory import _HEAD, all_oracles, all_queries

REPO = "/root/repo"


def test_documented_counts_match_registry():
    q, o = all_queries(), all_oracles()
    n_queries, n_oracled = len(q), len(o)
    n_rows_only = n_queries - n_oracled

    cov = open(f"{REPO}/docs/COVERAGE.md").read()
    m = re.search(
        r"(\d+) named queries total: (\d+) with\s+DuckDB oracles, (\d+) rows-only", cov
    )
    assert m, "COVERAGE.md lost its counts line"
    assert tuple(map(int, m.groups())) == (n_queries, n_oracled, n_rows_only)

    readme = open(f"{REPO}/README.md").read()
    m = re.search(r"(\d+) named queries \((\d+) DuckDB-oracled", readme)
    assert m, "README.md lost its counts line"
    assert tuple(map(int, m.groups())) == (n_queries, n_oracled)


# Rows-only keys deliberately spending a head slot this round (each
# needs a written justification — the default rule stands: rows-only
# keys waste driver budget on a permanent no_oracle row). r11: none —
# sim_lsh_topk's r9/r10 re-baseline served its purpose; its slot goes
# back to oracled keys.
HEAD_ROWS_ONLY_EXCEPTIONS: set[str] = set()


def test_head_is_50_keys_leading_the_registry():
    q, o = all_queries(), all_oracles()
    assert len(_HEAD) == 50
    assert list(q)[:50] == _HEAD  # head actually leads insertion order
    oracled_head = [k for k in _HEAD if k in o]
    assert list(o)[: len(oracled_head)] == oracled_head
    missing = set(_HEAD) - set(o) - HEAD_ROWS_ONLY_EXCEPTIONS
    assert not missing, f"rows-only keys would waste driver budget: {missing}"


def test_every_query_callable_and_every_oracle_keyed():
    q, o = all_queries(), all_oracles()
    assert all(callable(f) for f in q.values())
    orphans = set(o) - set(q)
    assert not orphans, f"oracles without queries: {orphans}"
