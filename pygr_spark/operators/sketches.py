"""Deterministic sketches: Count-Min over tokens with engine-portable
md5-derived hash rows, so the sketch — normally "approximate and
engine-specific" — is bit-identical in any SQL engine and can sit
under the exact-hash oracle gate (unlike HLL/theta sketches, whose
binary registers are implementation-defined; those stay rows-only,
see the approx_aggs entry).

Reference analog: none (pygr has no sketches; SURVEY.md §2.4 lists
approximate aggregates as new engine surface).

Scale shape: the sketch is a groupBy over (depth, cell) — at most
d×w rows regardless of corpus size, the definitional Count-Min
property; estimates are a broadcast join of probes against those d×w
rows. Both ends are one shuffle on high-cardinality keys followed by
tiny aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygr_spark.operators.dedup import md5_hash60


def countmin_build(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a d×w Count-Min sketch from an item stream: cell (j, c)
    holds the summed weight of items with ``md5(j || ',' || item) mod
    width == c``. Returns (depth_j, cell, total) — at most d·w rows.
    """
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    rows = []
    for j in range(depth):
        rows.append(
            items.select(
                F.lit(j).alias("depth_j"),
                F.pmod(
                    md5_hash60(
                        F.concat_ws(",", F.lit(str(j)), F.col(item_col))
                    ),
                    F.lit(width),
                ).cast("long").alias("cell"),
                w.alias("_w"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("depth_j", "cell").agg(
        F.sum("_w").cast("long").alias("total")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: the estimate for an item is the MIN
    over its d cells — an overestimate of (never below) the true
    count. The sketch side is ≤ d·w rows and broadcasts."""
    probe_cells = probes.select(
        F.col(item_col),
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("depth_j"),
    ).withColumn(
        "cell",
        F.pmod(
            md5_hash60(
                F.concat_ws(",", F.col("depth_j").cast("string"), F.col(item_col))
            ),
            F.lit(width),
        ).cast("long"),
    )
    joined = probe_cells.join(F.broadcast(sketch), ["depth_j", "cell"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("total"), F.lit(0))).cast("long").alias("estimate")
    )
