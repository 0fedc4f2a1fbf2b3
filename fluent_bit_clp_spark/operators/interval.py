"""Bucketized range (interval) join — points joined to covering
intervals without the O(L×R)-per-key explosion of a raw inequality join
(driver brief: custom operators like range joins, composed from existing
DataFrame ops).

Spark executes ``p.k = i.k AND p.ts BETWEEN i.s AND i.e`` as a broadcast
nested-loop or a per-key cartesian filter — fine for tiny sides, fatal at
100 TB.  The standard fix (what Databricks' range-join hint does under
the hood) is time bucketing:

1. each interval is replicated to every ``bucket_width``-wide bucket it
   overlaps (``sequence(floor(s/w), floor(e/w))`` + ``explode`` — the
   replication factor is ``len/w + 2``, chosen by the caller to be small);
2. each point lands in exactly ONE bucket — so the (key, bucket)
   equi-join emits every candidate (point, interval) pair exactly once,
   no dedup needed;
3. a cheap residual filter applies the exact ``BETWEEN``.

The join is then a plain shuffled equi-join on uniform (key, bucket)
keys — partial-aggregatable, AQE-skew-splittable, broadcastable when one
side is small.  Pick ``bucket_width`` near the typical interval length:
width ≫ length wastes candidates, width ≪ length replicates intervals.

Intervals are inclusive on both ends (``BETWEEN`` semantics, matching
the DuckDB oracle of query ``e_range_attribution``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """All matching (point, interval) row pairs; columns = points' then
    intervals' (caller aliases collisions away beforehand — a duplicate
    name raises).  ``how="inner"`` only: the outer variants of a range
    join are ambiguous (which unmatched side?) — compose with a left-anti
    join against the result when you need unmatched points.

    ``point_col``/``start_col``/``end_col`` must be integral (cast
    timestamps to ``unix_millis`` first) so bucket arithmetic is exact.
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    dup = [c for c in intervals.columns if c in points.columns and c not in on]
    if dup:
        raise ValueError(f"alias away duplicate non-key columns first: {dup}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn("_bucket", F.floor(F.col(point_col) / w))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    joined = p.join(i, [*on, "_bucket"])
    return joined.where(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    ).drop("_bucket")
