"""Banded range (interval) join — the 100 TB path for non-equi joins.

A pure inequality join (``p >= s AND p < e`` with no equi key) plans
as BroadcastNestedLoopJoin in OSS Spark: O(|points| x |intervals|)
comparisons and the whole interval side broadcast. The reference's
dialect reaches range joins through SQL passthrough (SURVEY §2 Tier B,
``app.py:51``); Databricks ships a range-join hint for exactly this
shape — this module is the open composite equivalent:

  1. quantize the axis into fixed-width bands
  2. points key by their single band; intervals EXPLODE to every band
     they overlap (~len/width + 1 rows each)
  3. equi-join on the band key (ordinary shuffle hash join, linear)
  4. re-verify the exact predicate inside the band

Each (point, interval) match shares exactly one band — the point's —
so no dedup pass is needed. Band width should be ~the median interval
length: wider bands cut interval duplication, narrower bands cut
false band-mates filtered in step 4.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` via band-equality (no nested loop).

    All columns from both sides survive (names must not collide).
    ``how`` supports 'inner' only — outer semantics over banding need
    an anti-join follow-up.
    """
    if how != "inner":
        raise ValueError("banded range join supports how='inner' only")
    w = F.lit(band_width)
    pts = points.withColumn("__band", F.floor(F.col(point_col) / w).cast("long"))
    ivs = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivs, "__band")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("__band")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    band_width: float,
) -> DataFrame:
    """Interval-overlap join (``ls < re AND rs < le``) via banding.

    Both sides explode to their covering bands; matches can share
    several bands, so a dedup on the concatenated originating rows'
    band-minimum keeps exactly one copy: a pair is kept only in the
    FIRST band where both appear (max of the two start-bands).
    """
    w = F.lit(band_width)

    def banded(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        return df.withColumn(
            f"__band",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / w).cast("long"),
                    F.floor(F.col(e) / w).cast("long"),
                )
            ),
        ).withColumn(f"__first_{tag}", F.floor(F.col(s) / w).cast("long"))

    lb = banded(left, left_start, left_end, "l")
    rb = banded(right, right_start, right_end, "r")
    overlap = (F.col(left_start) < F.col(right_end)) & (F.col(right_start) < F.col(left_end))
    # keep the pair only in the first band both intervals cover
    first_shared = F.greatest(F.col("__first_l"), F.col("__first_r"))
    return (
        lb.join(rb, "__band")
        .filter(overlap & (F.col("__band") == first_shared))
        .drop("__band", "__first_l", "__first_r")
    )
