"""Incremental aggregate maintenance (materialized-view refresh):
keep a persisted partial-aggregate state; absorb a delta by
re-aggregating ONLY (state ∪ delta-partials).

SUM/COUNT/MIN/MAX are self-maintainable under append: the merged
aggregate of partials equals the full recompute (associativity —
the same property Spark's map-side partial aggregation exploits
inside one job, lifted across jobs via a parquet-persisted state).
At 100 TB this is the difference between a refresh that costs
O(|delta| + |state|) and one that rescans the world; AVG and friends
derive from (sum, count) at read time.

The reference maintains no materialized aggregates (its SQL tables
are read-through); this is warehouse-grade surface the brief's
pipeline needs (daily corpus/stats rollups over append-only event
logs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_partials(
    df: DataFrame,
    path: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> None:
    """Aggregate ``df`` by ``keys`` with the (associative) ``aggs``
    and persist the partials as the view's refreshable state."""
    df.groupBy(*keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    ).write.mode("overwrite").parquet(path)


def refresh_with_delta(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    merge: dict[str, Column] | None = None,
) -> DataFrame:
    """Merge the persisted state with the delta's partials: one
    groupBy over (|state| + |delta-partial|) rows — never the base
    relation. ``merge`` maps each agg column to its re-aggregation
    (default: SUM, correct for sum/count partials; pass e.g.
    ``F.min``/``F.max`` columns for min/max partials)."""
    state = spark.read.parquet(path)
    dp = delta.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    merged = state.unionByName(dp)
    if merge is None:
        merge_cols = [F.sum(n).alias(n) for n in aggs]
    else:
        merge_cols = [c.alias(n) for n, c in merge.items()]
    return merged.groupBy(*keys).agg(*merge_cols)
