"""As-of (nearest-event) join — a core log/telemetry operator Spark's
DataFrame API lacks as a primitive (driver brief: custom operators like
as-of joins should compose from existing ops where semantics allow).

``asof_join(left, right, ...)`` attaches, to every left row, the columns
of the LATEST right row with ``right_ts <= left_ts`` per equality key
(``direction="backward"``, the pandas ``merge_asof`` / QuestDB / DuckDB
``ASOF JOIN`` default), or the EARLIEST with ``right_ts >= left_ts``
(``"forward"``).  Typical pipeline uses: join events to the most recent
prior config change / deploy marker / session login.

Scale shape — the union-window trick, ONE shuffle, no range explosion:

1. stack both sides into one table tagged ``_side`` (right = 0 sorts
   before left = 1 on timestamp ties, so an exactly-simultaneous right
   row IS visible to the left row — the standard inclusive ``<=``);
2. one window per key ordered by ``(ts, _side, payload)`` carrying
   ``last(right_payload, ignorenulls=True)`` over the preceding rows;
3. keep left rows, unpack the carried payload.

Compare the naive alternatives at 100 TB: an inequality join explodes to
O(L×R) per key before aggregation, and ``mapInPandas`` merge-join needs
co-partitioned sorted inputs.  Here the only exchange is the window's
hash partition on the key — same cost class as any per-key groupBy.
A pathologically hot key serializes its window partition; pre-split hot
keys by time range (route.salted_repartition's block trick) if profiling
shows one.

Determinism: ties on ``(ts, _side)`` (several right rows at the same
timestamp) resolve to the LARGEST struct of the ORDERABLE right columns
(field order = ``right_ts`` then ``right_cols``; map-typed columns are
excluded from the tie-break because Spark cannot sort them — include a
unique id among ``right_cols`` for full determinism when payloads carry
maps).  Stable across runs/parallelism.  DuckDB's native ``ASOF JOIN``
reproduces this when right timestamps are unique per key (query
``e_asof_prior_view`` pins the equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """All left columns + each requested right column (suffixed on name
    collision, including the right timestamp).  Unmatched left rows keep
    NULLs — a left join, like ``merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = [c for c in (right_cols or right.columns) if c not in on]
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols
    out_names = {
        c: (c + suffix) if (c in left.columns) else c for c in right_cols
    }

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    # tie-break struct: the ORDERABLE subset of the payload (window sort
    # rejects map types — review fix r4: a map column in right_cols made
    # the whole join raise AnalysisException)
    orderable = [
        c
        for c in right_cols
        if not _contains_map(right.schema[c].dataType)
    ]
    tiebreak = F.struct(*[F.col(c) for c in orderable]).alias("_tb")
    l_side = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload).schema["_r"].dataType
        ).alias("_r"),
        F.lit(None).cast(
            right.select(tiebreak).schema["_tb"].dataType
        ).alias("_tb"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_l"),
        payload,
        tiebreak,
    )
    stacked = l_side.unionByName(r_side)

    if direction == "backward":
        # right rows (side 0) at the same ts sort before the left row →
        # inclusive <=; last() carries the latest-so-far right payload
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("_asof_ts").asc(), F.col("_side").asc(), F.col("_tb").asc()
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # forward: scan from the future backwards; left (side 1) must see
        # same-ts right rows, so rights sort after lefts descending-wise
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("_asof_ts").desc(), F.col("_side").asc(), F.col("_tb").asc()
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = stacked.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    lefts = carried.where(F.col("_side") == 1)
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(out_names[c]) for c in right_cols
    ]
    return lefts.select(*cols)
