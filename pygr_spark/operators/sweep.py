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
    indel_cut: bool = False,
    seq: str = "seq",
) -> DataFrame:
    """Regions where coverage >= ``min_aligned`` AND coverage/total >=
    ``p_min_aligned`` (reference minAligned / pMinAligned masking,
    cnestedlist.pyx:962-1008), with adjacent surviving segments merged.

    ``total`` (the number of sequences, for the fraction rule) defaults
    to the global count of distinct intervals' sources being swept —
    pass it explicitly for reference-exact fraction semantics.

    ``indel_cut`` implements ``groupBySequences(sourceOnly=True,
    indelCut=True)`` (cnestedlist.pyx:999-1008): the merged masked
    regions additionally SPLIT at every bound of a sequence's
    non-first interval — the positions where ``seq``'s alignment
    breaks (the reference flags both bounds of every interval after
    the first per sequence as ``isIndel`` and cuts the open region
    there, cnestedlist.pyx:950-955, 1004-1008). Requires a ``seq``
    column naming the contributing sequence; the input is expected
    per-sequence pre-merged (groupByIntervals output), so open-
    interval count == distinct-open-sequence count (DictQueue len,
    mapping.py:248-264).

    Spark shape: every cut position is already a segment boundary in
    the sweep (all cuts are interval bounds), so indelCut is merely a
    merge rule — a run also breaks where the segment start is a cut
    position. One extra distinct + equi-join on (keys, pos); no new
    shuffle pattern, no range join.
    """
    seg = coverage_segments(df, keys, start, stop)
    cond = F.col("coverage") >= min_aligned
    if p_min_aligned > 0.0 and total:
        cond = cond & (F.col("coverage") / F.lit(total) >= p_min_aligned)
    kept = seg.filter(cond)
    if not indel_cut:
        return gap_merge(
            kept, keys, start="seg_start", stop="seg_stop", maxgap=0
        ).withColumnRenamed("seg_start", start).withColumnRenamed(
            "seg_stop", stop
        )
    # cut positions: both bounds of every non-first interval per
    # (keys, seq), in (start, stop) order — reference bound order
    # (cnestedlist.pyx:950-955: isIndel stays False only for the
    # first interval of each sequence)
    wseq = Window.partitionBy(*keys, seq).orderBy(F.col(start), F.col(stop))
    later = df.withColumn("_rn", F.row_number().over(wseq)).filter(
        F.col("_rn") > 1
    )
    cuts = (
        later.select(*keys, F.col(start).alias("seg_start"))
        .unionByName(later.select(*keys, F.col(stop).alias("seg_start")))
        .distinct()
        .withColumn("_is_cut", F.lit(1))
    )
    m = kept.join(cuts, [*keys, "seg_start"], "left")
    w = Window.partitionBy(*keys).orderBy("seg_start", "seg_stop")
    prev_stop = F.lag("seg_stop").over(w)
    split = F.when(
        prev_stop.isNull()
        | (prev_stop != F.col("seg_start"))
        | F.col("_is_cut").isNotNull(),
        1,
    ).otherwise(0)
    grouped = m.withColumn("_split", split).withColumn(
        "_grp", F.sum("_split").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy(*keys, "_grp")
        .agg(
            F.min("seg_start").alias(start),
            F.max("seg_stop").alias(stop),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_grp")
    )
