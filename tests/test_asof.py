"""Golden tests for the as-of join (union+running-window form)."""

from pygr_spark.operators.asof import asof_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_asof_inner_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("a", 5, 100), ("a", 10, 101), ("a", 2, 102), ("b", 7, 103)],
        ["k", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [("a", 3, 30), ("a", 5, 50), ("a", 9, 90), ("b", 8, 80)],
        ["k", "ts", "v"],
    )
    out = _rows(asof_join(left, right, key="k"))
    # ties included (left ts=5 matches right ts=5); a@2 and b@7 have
    # no prior purchase -> dropped by the inner form
    assert out == [("a", 5, 100, 5, 50), ("a", 10, 101, 9, 90)]


def test_asof_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [("a", 5, 100), ("a", 1, 101), ("b", 7, 103)], ["k", "ts", "eid"]
    )
    right = spark.createDataFrame([("a", 3, 30)], ["k", "ts", "v"])
    out = _rows(asof_join(left, right, key="k", how="left"))
    assert out == [
        ("a", 1, 101, None, None),
        ("a", 5, 100, 3, 30),
        ("b", 7, 103, None, None),
    ]
