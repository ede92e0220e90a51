"""Sweep-line coverage ("groupBySequences", A6) — pygr's vertical sweep
as a boundary-event window pipeline.

Reference semantics (cnestedlist.pyx:899-1008): build sorted boundary
events (pos, isStart, seq) (936-955), sweep counting open intervals
with a DictQueue (mapping.py:248-264), mask regions where the number of
aligned sequences < ``minAligned`` or the fraction < ``pMinAligned``,
emit the surviving segments. Tie rule: at equal pos, stop events sort
BEFORE start events (cnestedlist.pyx:951-955) — encoded here as
``orderBy(pos, delta)`` with delta = -1 for stops (SURVEY.md §7.3:
affects coverage counts; golden-tested in tests/test_sweep.py).

Spark shape: explode each interval into (+1 at start, -1 at stop)
events, cumulative-sum over a window partitioned by the sequence id →
open-interval count per segment [pos, next_pos) → filter segments by
coverage → re-merge adjacent surviving segments (gap_merge). All
window functions, one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygr_spark.operators.groupmerge import gap_merge


def coverage_segments(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    stop: str = "stop",
) -> DataFrame:
    """Per key: segments [pos, next_pos) with the count of intervals
    covering each segment. Zero-coverage gaps between intervals are
    emitted with coverage 0; zero-length segments are dropped.
    """
    events = df.select(
        *keys, F.col(start).alias("pos"), F.lit(1).alias("delta")
    ).unionByName(
        df.select(*keys, F.col(stop).alias("pos"), F.lit(-1).alias("delta"))
    )
    # collapse simultaneous events first: net delta per position
    net = events.groupBy(*keys, "pos").agg(F.sum("delta").alias("delta"))
    w = Window.partitionBy(*keys).orderBy("pos")
    seg = (
        net.withColumn(
            "coverage",
            F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("seg_start", F.col("pos"))
        .withColumn("seg_stop", F.lead("pos").over(w))
    )
    return seg.filter(
        F.col("seg_stop").isNotNull() & (F.col("seg_stop") > F.col("seg_start"))
    ).select(*keys, "seg_start", "seg_stop", "coverage")


def sweep_coverage_mask(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    stop: str = "stop",
    min_aligned: int = 1,
    p_min_aligned: float = 0.0,
    total: int | None = None,
) -> DataFrame:
    """Regions where coverage >= ``min_aligned`` AND coverage/total >=
    ``p_min_aligned`` (reference minAligned / pMinAligned masking,
    cnestedlist.pyx:962-1008), with adjacent surviving segments merged.

    ``total`` (the number of sequences, for the fraction rule) defaults
    to the global count of distinct intervals' sources being swept —
    pass it explicitly for reference-exact fraction semantics.
    """
    seg = coverage_segments(df, keys, start, stop)
    cond = F.col("coverage") >= min_aligned
    if p_min_aligned > 0.0 and total:
        cond = cond & (F.col("coverage") / F.lit(total) >= p_min_aligned)
    kept = seg.filter(cond)
    return gap_merge(
        kept, keys, start="seg_start", stop="seg_stop", maxgap=0
    ).withColumnRenamed("seg_start", start).withColumnRenamed("seg_stop", stop)
