"""Time-series regularization: resample an irregular event stream onto
a fixed grid with forward fill (gap filling).

The reference has no time-series surface; this is part of the
large-pipeline extras (metrics/feature stores resample irregular
events to a fixed cadence before training). Classic composition of
Spark built-ins — no UDF:

1. per (key, bucket): keep the LAST observation (row_number over
   event order — ns timestamp, then event id as the deterministic
   tiebreak);
2. per key: explode ``sequence(min_bucket, max_bucket, step)`` into
   the dense grid — one narrow generator per key, no cross join;
3. forward fill = ``last(value, ignorenulls=True)`` over a running
   window (unboundedPreceding→currentRow — the O(n) frame direction,
   see SCALING.md "window frames").

Scale shape: everything partitions by key; the grid explode is
output-proportional (keys × buckets); the running-frame fill is a
single in-partition pass. Skewed keys are bounded by time-range, not
row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key: str,
    ts_ns: str,
    value: str,
    step_s: int = 3600,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Resample ``events`` (irregular) to a dense ``step_s``-second
    grid per ``key``, carrying the last observed ``value`` forward
    into empty buckets. Returns
    ``(key, bucket_start_s, value, observed)`` — ``observed`` 0/1
    marks buckets with a real observation; the first bucket of every
    key is observed by construction, so the fill never emits null."""
    tb = [F.col(order_tiebreak).desc()] if order_tiebreak else []
    # integer DIV, not /: epoch-ns exceeds 2^53, double division would
    # mis-bucket near second boundaries
    sec = F.expr(f"CAST({ts_ns} DIV 1000000000 AS BIGINT)")
    bucket = (sec - (sec % F.lit(step_s))).alias("_bk")
    extra = [F.col(order_tiebreak)] if order_tiebreak else []
    e = events.select(
        F.col(key), bucket, F.col(ts_ns).alias("_ns"), F.col(value).alias("_v"), *extra
    )
    wlast = Window.partitionBy(key, "_bk").orderBy(F.col("_ns").desc(), *tb)
    last_obs = (
        e.withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select(key, "_bk", "_v")
    )
    grid = (
        e.groupBy(key)
        .agg(F.min("_bk").alias("_a"), F.max("_bk").alias("_b"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_a"), F.col("_b"), F.lit(step_s))
            ).alias("_bk"),
        )
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_obs, [key, "_bk"], "left")
        .select(
            F.col(key),
            F.col("_bk").alias("bucket_start_s"),
            F.last("_v", ignorenulls=True).over(wf).alias(value),
            F.when(F.col("_v").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("observed"),
        )
    )
