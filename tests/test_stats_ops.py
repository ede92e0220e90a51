"""Library-level tests for operators/stats.py — the reusable forms of
the experimentation/calibration catalog entries."""

import numpy as np
from pyspark.sql import functions as F


def test_group_moments_complement_identity(spark):
    from pygr_spark.operators.stats import group_moments

    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5), ("b", 7), ("c", 9)], ["g", "v"]
    )
    rows = {r.g: r for r in group_moments(df, "g", "v").collect()}
    # complements are exact subtractions from the grand total
    assert rows["a"].n1 + rows["a"].n2 == 5
    assert rows["a"].s1 == 4 and rows["a"].s2 == 21
    assert rows["b"].q1 == 25 + 49 and rows["b"].q2 == 1 + 9 + 81


def test_poisson_bootstrap_weights_mean_near_one(spark):
    from pygr_spark.operators.stats import poisson_bootstrap

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    reps = poisson_bootstrap(df, "k", "v", b=8).collect()
    assert len(reps) == 8
    for r in reps:
        # Poisson(1): replicate size concentrates around n
        assert 0.85 * n < r.n_b < 1.15 * n
    # deterministic: second run is identical
    again = poisson_bootstrap(df, "k", "v", b=8).collect()
    assert sorted(map(tuple, reps)) == sorted(map(tuple, again))


def test_pava_isotonic_known_fixture(spark):
    from pygr_spark.operators.stats import pava_isotonic

    # classic PAVA fixture: values [1, 3, 2, 4] (unit weights) pools
    # bins 2-3 into mean 2.5
    bins = spark.createDataFrame(
        [(1, 1, 1), (2, 3, 1), (3, 2, 1), (4, 4, 1)],
        ["bin", "tot", "cnt"],
    )
    got = {
        r.bin: r.y_star for r in pava_isotonic(bins).collect()
    }
    assert got == {1: 1.0, 2: 2.5, 3: 2.5, 4: 4.0}


def test_pava_isotonic_weighted_pooling(spark):
    from pygr_spark.operators.stats import pava_isotonic

    # weights matter: [4 (w=1), 0 (w=3)] pools to weighted mean 1.0
    bins = spark.createDataFrame(
        [(1, 4, 1), (2, 0, 3)], ["bin", "tot", "cnt"]
    )
    got = {r.bin: r.y_star for r in pava_isotonic(bins).collect()}
    assert got == {1: 1.0, 2: 1.0}


def test_conformal_split_order_statistic(spark):
    from pygr_spark.operators.stats import conformal_split

    # residuals 1..19 in one group: n=19, ceil(20*0.9)=18 → qhat=18
    df = spark.createDataFrame(
        [("g", float(i), i) for i in range(1, 20)], ["grp", "r", "id"]
    )
    row = conformal_split(df, "grp", "r", "id").first()
    assert (row.n_cal, row.qhat) == (19, 18.0)
