"""As-of join: for each left row, the latest right row at-or-before it.

The reference's dialect exposes ``ASOF JOIN`` as a Tier-B feature
(SURVEY §2, reachable via the reference's ``app.py:51`` SQL
passthrough); Spark has no single primitive, so this is the documented
composite (SURVEY §7 "custom composites"):

    union(left-tagged, right-tagged)
      → window last(right_value, ignorenulls=True)
          over (partition by keys order by ts, side)
      → keep left rows

Scale notes: one shuffle on (keys), one window sort per partition —
the same cost as a sort-merge join. No cross product, no range
explosion; skewed keys can be salted upstream. Right rows sort before
left rows at equal ts (side=0 < 1) so an exact-ts match is taken,
i.e. the match predicate is ``right.ts <= left.ts``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Returns all left columns + ``{v}{suffix}`` for
    each value col (NULL if no match):

    - ``direction='backward'`` (default): the value from the latest
      right row with ``right_ts <= left_ts`` matching on ``on``.
    - ``direction='forward'``: the earliest right row with
      ``right_ts >= left_ts`` (pandas merge_asof's forward mode; the
      dialect's ``ASOF JOIN ... ON l.ts <= r.ts``).

    Both directions are the same one-shuffle union + per-key window;
    forward just flips the fill to first-over-following. At equal
    timestamps the right row matches in either direction (side
    ordering places right rows inside the fill frame).
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        # right rows (side 0) sort before left at equal ts → included
        # in the preceding frame; fill = last non-null before me.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # right rows sort after left at equal ts → included in the
        # following frame; fill = first non-null at-or-after me.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__side"),
        *[fill(F.col(f"__v_{v}")).alias(f"{v}{suffix}") for v in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    broadcast_row_limit: int = 1_000_000,
) -> DataFrame:
    """Dispatch between the two as-of plans so callers can't pick the
    wrong one at scale: a dimension-sized right side routes to
    ``asof_join_broadcast`` (fact never shuffled), anything bigger to
    the union+window composite (``asof_join``), which has no
    fits-in-a-broadcast requirement.

    The size probe is a BOUNDED count — ``right.limit(threshold+1)``
    — so deciding never scans more than threshold+1 rows even when the
    right side is a 100 TB table; at the default threshold the
    collapsed per-key arrays of ≤1M (ts, value) structs sit comfortably
    under Spark's broadcast limit. The probe is one extra small job;
    callers that already know their shape keep calling the specific
    variant directly.
    """
    n_right = right.limit(broadcast_row_limit + 1).count()
    impl = asof_join_broadcast if n_right <= broadcast_row_limit else asof_join
    return impl(
        left,
        right,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=value_cols,
        suffix=suffix,
        direction=direction,
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join specialized for a SMALL right side (dimension-sized:
    prices, config history, slowly-changing reference data).

    The union+window composite (``asof_join``) shuffles AND window-sorts
    the fact table; on a 100 TB fact with a broadcast-able right side
    that sort is pure waste. Here the right side is collapsed to ONE row
    per key — a ts-sorted array of (ts, values) structs — broadcast
    equi-joined to the fact, and the as-of match becomes a projection:
    filter the array by the ts predicate, take the last (backward) or
    first (forward) element. The fact is never shuffled, never sorted;
    the plan is Scan → BroadcastHashJoin → Project, all inside
    whole-stage codegen (plan-asserted in tests/test_asof.py).

    Match semantics are identical to ``asof_join``: latest right row
    with ``right_ts <= left_ts`` (backward) / earliest with
    ``right_ts >= left_ts`` (forward), NULL when no match. Ties on
    (key, right_ts) should be pre-aggregated away by the caller (same
    requirement the windowed composite has for determinism).

    ``F.get`` (not ``element_at``) keeps the empty-candidate case NULL
    under ANSI mode instead of raising INVALID_ARRAY_INDEX.

    Cost model: per-key array must fit in a row (~right rows per key),
    and the whole collapsed right side under the broadcast threshold —
    exactly the "small right" contract. For right sides beyond that,
    use ``asof_join``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    entry = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(v).alias(v) for v in value_cols],
    )
    # sort_array orders structs by field order → __ts first → time order
    packed = right.groupBy(*on).agg(
        F.sort_array(F.collect_list(entry)).alias("__arr")
    )
    joined = left.join(F.broadcast(packed), on=on, how="left")
    lts = F.col(left_ts)
    if direction == "backward":
        cand = F.filter(F.col("__arr"), lambda s: s["__ts"] <= lts)
        pick = F.get(cand, F.size(cand) - 1)
    else:
        cand = F.filter(F.col("__arr"), lambda s: s["__ts"] >= lts)
        pick = F.get(cand, F.lit(0))
    staged = joined.withColumn("__pick", pick)
    return staged.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__pick")[v].alias(f"{v}{suffix}") for v in value_cols],
    )
