"""Count-Min sketch: determinism + the overestimate guarantee."""

from pyspark.sql import functions as F

from pygr_spark.operators.sketches import countmin_build, countmin_estimate


def test_countmin_never_underestimates(spark):
    items = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]], ["item"]
    )
    sketch = countmin_build(items, depth=4, width=16)  # narrow -> collisions
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], ["item"])
    est = {r.item: r.estimate for r in countmin_estimate(sketch, probes, depth=4, width=16).collect()}
    exact = {"a": 50, "b": 20, "c": 5, "d": 1}
    for k, v in exact.items():
        assert est[k] >= v  # CM guarantee
    # total mass bound: no cell exceeds the stream size
    assert sketch.agg(F.max("total")).collect()[0][0] <= 76


def test_countmin_deterministic_across_builds(spark):
    items = spark.createDataFrame([(f"w{i % 7}",) for i in range(100)], ["item"])
    a = sorted(map(tuple, countmin_build(items).collect()))
    b = sorted(map(tuple, countmin_build(items).collect()))
    assert a == b
    assert len(a) <= 4 * 256


def test_countmin_unseen_item_estimates_low(spark):
    items = spark.createDataFrame([("x",)] * 10, ["item"])
    sketch = countmin_build(items, depth=4, width=256)
    probes = spark.createDataFrame([("never-seen",)], ["item"])
    est = countmin_estimate(sketch, probes, depth=4, width=256).collect()[0]
    # with 1 distinct item in 4x256 cells, an unseen probe almost
    # surely misses every cell -> estimate 0 (min over empty cells)
    assert est.estimate in (0, 10)
