"""Fault-tolerant materialization of multi-branch-reused intermediates.

Spark re-evaluates every DataFrame reference: a frame feeding N
downstream branches (self-join sides, verify joins, iterative driver
actions) is recomputed up to N times unless it is materialized once.
Two stock tools exist and both have a flaw for this engine:

- ``localCheckpoint``: stores partitions on executors AND truncates
  lineage — on a real cluster an executor loss mid-query kills the
  job unrecoverably (the guide's §5 trade-off). Fine on local[n],
  wrong for the 100 TB deployment this engine targets.
- bare ``persist()``: keeps lineage (lost partitions recompute), but
  Spark's CacheManager indexes cache entries by CANONICALIZED PLAN —
  a later invocation of the same query function builds the same plan,
  and its action would silently REUSE the previous invocation's
  cached data instead of recomputing from the parquet inputs. For a
  benchmark (or any rerun-to-remeasure flow) that turns timed
  repetitions into cache reads, which is measurement corruption, and
  entries are never released (``unpersist`` is unreachable once the
  builder returns: the caller holds only the downstream frame).

:func:`reuse_persist` combines the two contracts: ``persist()`` for
fault-tolerant within-query branch dedup, plus a per-site registry
that UNPERSISTS the previous invocation's entry the moment the site
is invoked again — so repeated invocations recompute from source
exactly like ``localCheckpoint`` did, and at most one cache entry per
site is ever live (bounded memory across long sessions).

Concurrency note: two in-flight queries sharing one site would evict
each other's entry mid-run. With ``persist`` that is graceful —
lineage recomputes the lost partitions, results are unchanged — and
no engine query path invokes the same site concurrently today (the
burst pool runs relational SQL, not these operators).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def reuse_persist(df: DataFrame, site: str) -> DataFrame:
    """Materialize ``df`` for reuse across downstream branches/actions
    of ONE query invocation. ``site`` names the call site (unique per
    builder); the previous invocation's entry for the same site is
    unpersisted first, so reruns recompute from the source inputs."""
    with _LOCK:
        prev = _LIVE.pop(site, None)
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped — nothing to release
        out = df.persist()
        _LIVE[site] = out
    return out
