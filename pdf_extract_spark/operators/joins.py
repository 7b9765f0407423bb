"""Join operators beyond stock equi-joins.

The reference has no relational joins (SURVEY.md §2.3); these are the
additions a training-data pipeline needs.  Everything is composed from
built-in DataFrame ops so Catalyst keeps optimizing (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (direction='backward') within the same `on` key.

    Implementation is the union-and-carry-forward pattern: tag both sides,
    union on (key, ts), and carry the right side's values forward with
    last(ignorenulls) over an ordered per-key window — one shuffle on the
    key, no range-explosion, skew-safe for the same reasons a window agg
    is.  This beats a theta-join (ts <= ts') + argmax, which Catalyst can
    only express as a broadcast-nested-loop at scale.

    `tiebreak`: when multiple right rows share (key, right_ts), the row
    with the GREATEST tiebreak column wins — without it the winner is
    whichever row the shuffle happened to order last, which silently
    varies run-to-run and engine-to-engine (caught by the sf0.1 oracle:
    duplicate order dates per customer made Spark and DuckDB disagree).
    Pass a unique column (an id) whenever the right side's (key, ts) is
    not known to be unique."""
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rsel = right
    if tiebreak is not None:
        rw = Window.partitionBy(on, right_ts).orderBy(F.desc(tiebreak))
        rsel = (
            right.withColumn("__rk", F.row_number().over(rw))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
    rt = rsel.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_cols],
    )
    lcols = [c for c in left.columns]
    lt = lt.select(*lcols, "__ts", "__side", *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in right_cols])
    rt = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on else F.col(on) for c in lcols],
        "__ts",
        "__side",
        *right_cols,
    )
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at the same timestamp (side 0 < 1),
    # so an exact-tie right row is visible to the left row: ts' <= ts
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join via bucketing: explode each interval into the
    buckets it overlaps, equi-join on bucket, then re-check the predicate.
    Turns an O(n*m) theta join into an equi-join whose fanout is bounded by
    interval_width / bucket_width — the standard trick for interval joins
    at scale."""
    lb = left.withColumn("__b", F.floor(F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "__bs",
        F.sequence(
            F.floor(F.col(right_lo) / bucket_width).cast("long"),
            F.floor(F.col(right_hi) / bucket_width).cast("long"),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    return (
        lb.join(rb, "__b")
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("__b")
    )
