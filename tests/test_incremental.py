"""Incremental aggregate maintenance (operators/incremental.py):
refresh(state, delta) must equal the full recompute for every
self-maintainable aggregate, including the non-SUM merge path."""

from pyspark.sql import functions as F

from pygr_spark.operators.incremental import (
    materialize_partials,
    refresh_with_delta,
)


def test_refresh_equals_full_recompute_sum_count(spark, tmp_path):
    full = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5), ("a", 10), ("b", 1), ("c", 7)],
        "k string, v long",
    )
    base, delta = full.limit(3), full.subtract(full.limit(3))
    aggs = {"s": F.sum("v").cast("long"), "n": F.count(F.lit(1)).cast("long")}
    path = str(tmp_path / "state")
    materialize_partials(base, path, ["k"], aggs)
    got = {
        r.k: (r.s, r.n)
        for r in refresh_with_delta(spark, path, delta, ["k"], aggs).collect()
    }
    want = {
        r.k: (r.s, r.n)
        for r in full.groupBy("k")
        .agg(F.sum("v").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want


def test_refresh_minmax_merge_path(spark, tmp_path):
    full = spark.createDataFrame(
        [("a", 3), ("a", -2), ("b", 9), ("b", 4)], "k string, v long"
    )
    base = full.filter("v >= 0")
    delta = full.filter("v < 0")
    aggs = {"lo": F.min("v"), "hi": F.max("v")}
    merge = {"lo": F.min("lo"), "hi": F.max("hi")}
    path = str(tmp_path / "state2")
    materialize_partials(base, path, ["k"], aggs)
    got = {
        r.k: (r.lo, r.hi)
        for r in refresh_with_delta(
            spark, path, delta, ["k"], aggs, merge=merge
        ).collect()
    }
    assert got == {"a": (-2, 3), "b": (4, 9)}


def test_refresh_with_empty_delta_is_state(spark, tmp_path):
    full = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    aggs = {"s": F.sum("v").cast("long")}
    path = str(tmp_path / "state3")
    materialize_partials(full, path, ["k"], aggs)
    empty = full.filter("v > 100")
    got = {
        r.k: r.s
        for r in refresh_with_delta(spark, path, empty, ["k"], aggs).collect()
    }
    assert got == {"a": 1, "b": 2}
