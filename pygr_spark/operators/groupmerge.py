"""Gap-merge ("groupByIntervals", A5) — pygr's horizontal merge as a
gaps-and-islands window pipeline.

Reference semantics (cnestedlist.pyx:722-845, merge loop 800-840): per
target sequence, sort intervals by start and merge a run into one
interval while
  - the gap on the source axis between consecutive intervals is
    <= ``maxgap``,
  - the insert on the target axis is within [``mininsert``, ``maxinsert``],
  - the merged span stays <= ``maxsize``;
otherwise start a new group. Presets ``mergeAll`` (unbounded) and
``mergeMost`` (maxgap=maxinsert=1e6, cnestedlist.pyx:746-752 region).

Spark shape (SURVEY.md §2.5): ``lag`` over a window partitioned by the
grouping keys → split flag → running sum → group id → groupBy
min/max/collect. One shuffle on the grouping keys; scales by adding
keys to the partitionBy (at 100 TB the window partition is a single
sequence/document — bounded state, no driver involvement).

The same pipeline is ``merge_intervals`` (plain interval coalescing,
maxgap=0) and time-domain sessionization over ``events``
(``session_window`` is exactly this with gap in the time axis —
SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: pygr presets, cnestedlist.pyx:746-752.
MERGE_ALL = dict(maxgap=-1, maxinsert=-1, mininsert=0, maxsize=-1)
MERGE_MOST = dict(maxgap=1_000_000, maxinsert=1_000_000, mininsert=0, maxsize=-1)


def gap_merge(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    stop: str = "stop",
    maxgap: int = 0,
    aggs: list[Column] | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Merge intervals per ``keys`` whose gap (next.start - running max
    stop) is <= maxgap; maxgap < 0 means merge everything per key.

    Returns one row per merged group: keys + ``start``/``stop`` bounds
    + ``n_merged`` + any extra ``aggs``.
    """
    aggs = aggs or []
    if maxgap < 0:
        return df.groupBy(*keys).agg(
            F.min(start).alias(start),
            F.max(stop).alias(stop),
            F.count(F.lit(1)).alias("n_merged"),
            *aggs,
        )
    # materialize ONE canonical order first: with duplicate
    # (start, stop) rows, separate window passes may order ties
    # differently, and a tie carrying split=1 that interleaves
    # between passes fractures a group nondeterministically. Ordering
    # both passes by a materialized row_number pins the order; group
    # COMPOSITION is tie-permutation-invariant (only the first of a
    # tie run can split; the rest always follow it), so the result is
    # deterministic and engine-independent.
    w0 = Window.partitionBy(*keys).orderBy(F.col(start), F.col(stop))
    df = df.withColumn("_rn", F.row_number().over(w0))
    w = Window.partitionBy(*keys).orderBy("_rn")
    # running max of stop over preceding rows handles contained intervals
    prev_max_stop = F.max(stop).over(w.rowsBetween(Window.unboundedPreceding, -1))
    split = F.when(
        prev_max_stop.isNull() | (F.col(start) - prev_max_stop > maxgap), 1
    ).otherwise(0)
    grouped = df.withColumn("_split", split).withColumn(
        "_grp", F.sum("_split").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    out = grouped.groupBy(*keys, "_grp").agg(
        F.min(start).alias(start),
        F.max(stop).alias(stop),
        F.count(F.lit(1)).alias("n_merged"),
        *aggs,
    )
    target = group_col
    if target is None:
        return out.drop("_grp")
    return out.withColumnRenamed("_grp", target)


def group_by_intervals_exact(
    df: DataFrame,
    keys: list[str],
    src_start: str = "src_start",
    src_stop: str = "src_stop",
    dst_start: str = "dst_start",
    dst_stop: str = "dst_stop",
    maxgap: int = 0,
    maxinsert: int = 0,
    mininsert: int = 0,
    maxsize: int = -1,
) -> DataFrame:
    """Reference-exact groupByIntervals via applyInPandas — the
    sequential per-group merge loop (cnestedlist.pyx:800-840) runs as
    an Arrow-batched grouped-map UDF, one group per key. This is the
    ``maxsize``-faithful variant: the span bound applies to the run
    accumulated SO FAR within the current group, which a single window
    pass cannot express (the window form approximates it against the
    partition start). Use the window ``group_by_intervals`` when
    maxsize < 0 (identical results, no Python in the path).

    This is also the template for the reference's pluggable
    ``ivalMethod`` hook (cnestedlist.pyx:801-804): swap the inner loop
    for a custom merger without touching the distribution strategy.
    """
    import pandas as pd

    key_fields = ", ".join(
        f"`{k}` {dict(df.dtypes)[k]}" for k in keys
    )
    schema = (
        f"{key_fields}, {src_start} long, {src_stop} long, "
        f"{dst_start} long, {dst_stop} long, n_merged long"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([src_start, dst_start])
        out = []
        cur = None
        for r in pdf.itertuples(index=False):
            row = r._asdict()
            if cur is None:
                cur = _new_group(row, src_start, src_stop, dst_start, dst_stop)
                continue
            gap = row[src_start] - cur["ss_max"]
            insert = row[dst_start] - cur["prev_de"]
            new_span = max(cur["se"], row[src_stop]) - cur["ss"]
            split = (
                (maxgap >= 0 and gap > maxgap)
                or (maxinsert >= 0 and insert > maxinsert)
                or insert < mininsert
                or (maxsize >= 0 and new_span > maxsize)
            )
            if split:
                out.append(cur)
                cur = _new_group(row, src_start, src_stop, dst_start, dst_stop)
            else:
                cur["se"] = max(cur["se"], row[src_stop])
                cur["ss_max"] = max(cur["ss_max"], row[src_stop])
                cur["ds"] = min(cur["ds"], row[dst_start])
                cur["de"] = max(cur["de"], row[dst_stop])
                cur["prev_de"] = row[dst_stop]
                cur["n"] += 1
        if cur is not None:
            out.append(cur)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    **{k: first[k] for k in keys},
                    src_start: g["ss"],
                    src_stop: g["se"],
                    dst_start: g["ds"],
                    dst_stop: g["de"],
                    "n_merged": g["n"],
                }
                for g in out
            ]
        )

    return df.groupBy(*keys).applyInPandas(merge, schema)


def _new_group(row, src_start, src_stop, dst_start, dst_stop):
    return {
        "ss": row[src_start],
        "se": row[src_stop],
        "ss_max": row[src_stop],
        "ds": row[dst_start],
        "de": row[dst_stop],
        "prev_de": row[dst_stop],
        "n": 1,
    }


def group_by_intervals(
    df: DataFrame,
    keys: list[str],
    src_start: str = "src_start",
    src_stop: str = "src_stop",
    dst_start: str = "dst_start",
    dst_stop: str = "dst_stop",
    maxgap: int = 0,
    maxinsert: int = 0,
    mininsert: int = 0,
    maxsize: int = -1,
) -> DataFrame:
    """Full pygr groupByIntervals over aligned interval *pairs*: merge
    consecutive pairs per key when the source-axis gap <= maxgap AND the
    target-axis insert is within [mininsert, maxinsert] AND the merged
    source span <= maxsize (cnestedlist.pyx:800-840).

    maxgap/maxinsert/maxsize < 0 disable the respective bound. Emits
    merged (src_start, src_stop, dst_start, dst_stop, n_merged,
    match_ivals) rows; match_ivals keeps the kept 1:1 interval list the
    reference accumulates for Seq2SeqEdge (cnestedlist.pyx:820-828).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(src_start), F.col(dst_start))
    wcum = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_src_stop = F.max(src_stop).over(wcum)
    prev_dst_stop = F.lag(dst_stop).over(w)
    first_src_start = F.min(src_start).over(wcum)

    gap = F.col(src_start) - prev_src_stop
    insert = F.col(dst_start) - prev_dst_stop
    too_wide = (
        F.lit(maxsize >= 0)
        & (F.col(src_stop) - F.least(first_src_start, F.col(src_start)) > maxsize)
    )
    split = F.when(
        prev_src_stop.isNull()
        | (F.lit(maxgap >= 0) & (gap > maxgap))
        | (F.lit(maxinsert >= 0) & (insert > maxinsert))
        | (insert < mininsert)
        | too_wide,
        1,
    ).otherwise(0)

    grouped = df.withColumn("_split", split).withColumn(
        "_grp", F.sum("_split").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grouped.groupBy(*keys, "_grp").agg(
        F.min(src_start).alias(src_start),
        F.max(src_stop).alias(src_stop),
        F.min(dst_start).alias(dst_start),
        F.max(dst_stop).alias(dst_stop),
        F.count(F.lit(1)).alias("n_merged"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(src_start).alias("ss"),
                    F.col(src_stop).alias("se"),
                    F.col(dst_start).alias("ds"),
                    F.col(dst_stop).alias("de"),
                )
            )
        ).alias("match_ivals"),
    ).drop("_grp")
