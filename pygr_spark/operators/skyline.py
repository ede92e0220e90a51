"""Per-group 2-D skyline (Pareto frontier) without a self-join.

A point survives iff no other point in its group weakly dominates it
(>= on both axes, > on at least one). The textbook formulation is a
quadratic NOT EXISTS anti-join; the engine shape here is the
O(n log n) sweep: sort each group by x descending and a point is
dominated exactly when

  - some row with strictly greater x has y >= its y  (running max
    over the strict-x-greater prefix — a RANGE frame), or
  - some row with the SAME x has strictly greater y (per-(group, x)
    max).

Both are partitioned windows (``partitionBy(group)``), so the plan is
two window passes over one shuffle by group — no global sort, no
pair blow-up. Duplicate points (same x and y) are mutually
non-dominating and both survive, matching the NOT EXISTS semantics
the DuckDB oracle runs.

Axes must be integer-valued columns (the RANGE frame offset of 1
means "strictly greater" only on integers); cast money to cents
first, as the whole catalog does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_front(
    df: DataFrame, group: str, x: str, y: str
) -> DataFrame:
    """Rows of ``df`` on the per-``group`` Pareto frontier, maximizing
    integer columns ``x`` and ``y``. Preserves all input columns."""
    w_gt = (
        Window.partitionBy(group)
        .orderBy(F.col(x).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(group, x)
    max_y_gt = F.max(y).over(w_gt)
    max_y_eq = F.max(y).over(w_eq)
    dominated = F.coalesce(
        max_y_gt >= F.col(y), F.lit(False)
    ) | (max_y_eq > F.col(y))
    return (
        df.withColumn("_dom", dominated)
        .filter(~F.col("_dom"))
        .drop("_dom")
    )
