"""As-of (temporal) join: match each left row to the most recent
right row at or before its timestamp, per key.

SURVEY.md §2.3 notes the reference has no temporal as-of join but its
interval join (J1, intervaldb.c:319-338) is the same find-latest-
boundary shape; an analytics engine surface needs the op itself.

Scale design: NOT a range join (which explodes candidates and then
filters). Union both sides with a tag, sort within key by
(ts, tag) — right rows sort before left rows at equal ts so "at or
before" includes ties — and carry the last non-null right payload
forward with ``last(..., ignorenulls=True)`` over a running window.
ONE shuffle on the key, linear in |L|+|R|, no candidate blow-up;
skewed keys are bounded by the per-key sort (AQE handles residuals).
This is exactly how Structured Streaming's state store would pair the
streams, expressed in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    how: str = "inner",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row: the right row with the greatest
    ``right_ts <= left_ts`` on the same ``key``. ``right`` must be
    unique per (key, right_ts) with non-null payload — either
    pre-aggregate it or pass ``right_tiebreak`` (a right column whose
    MAX wins among equal-ts rows; it joins the carry sort as a third
    key, so no pre-aggregate pass is needed and the sort stays the one
    the carry already pays). Without either, ties would be
    nondeterministic on any engine, and the ignorenulls carry would
    skip a legitimately-NULL payload back to an older row.
    ``how='left'`` keeps unmatched left rows with NULL payload.

    Returns left columns + ``r_ts`` + the right ``value_cols``.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (key, right_ts)
        ]
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast("long").alias("_r_ts"),
        F.lit(None).cast(
            right.schema[right_tiebreak].dataType if right_tiebreak else "long"
        ).alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_ts).cast("long").alias("_r_ts"),
        (
            F.col(right_tiebreak) if right_tiebreak else F.lit(None).cast("long")
        ).alias("_tb"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    both = tagged_l.unionByName(tagged_r)
    # _is_left sorts right rows before left at equal ts ("at or
    # before"); among equal-ts right rows the tiebreak orders them so
    # the carry's LAST non-null — the max tiebreak — wins.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left", F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "_k",
        "_ts",
        "_is_left",
        *lcols,
        F.last("_r_ts", ignorenulls=True).over(w).alias("r_ts"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    ).filter(F.col("_is_left") == 1)
    out = carried.select(
        F.col("_k").alias(key),
        F.col("_ts").alias(left_ts),
        *lcols,
        "r_ts",
        *value_cols,
    )
    if how == "inner":
        out = out.filter(F.col("r_ts").isNotNull())
    return out
