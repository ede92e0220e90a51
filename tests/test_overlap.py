"""Golden tests for the interval overlap join.

The sign-convention goldens are lifted verbatim from the reference's
tests/nlmsa_test.py:9-33 (implementation-independent tuples).
"""

from pyspark.sql import functions as F

from pygr_spark.operators.overlap import overlap_join, overlap_join_signed

#: reference nlmsa_test.py:11
IVALS = [(0, 10, 1, -110, -100), (-20, -5, 2, 300, 315)]
DB_COLS = ["start", "stop", "target_id", "target_start", "target_stop"]


def _db(spark):
    return spark.createDataFrame(IVALS, DB_COLS)


def _query(spark, start, stop):
    return spark.createDataFrame([(start, stop)], ["start", "stop"])


def _hits(df):
    rows = df.select("start", "stop", "target_id", "target_start", "target_stop")
    return sorted(tuple(r) for r in rows.collect())


def test_query_forward(spark):
    # reference nlmsa_test.py:14-17
    out = overlap_join_signed(_query(spark, 0, 10), _db(spark))
    assert _hits(out) == sorted([(0, 10, 1, -110, -100), (5, 20, 2, -315, -300)])


def test_query_reverse(spark):
    # reference nlmsa_test.py:19-22
    out = overlap_join_signed(_query(spark, -11, -7), _db(spark))
    assert _hits(out) == sorted([(-10, 0, 1, 100, 110), (-20, -5, 2, 300, 315)])


def test_strategies_agree(spark):
    left = spark.createDataFrame(
        [("a", 0, 100), ("a", 5000, 20001), ("b", 3, 7), ("a", 250000, 250010)],
        ["id", "start", "stop"],
    )
    right = spark.createDataFrame(
        [
            ("a", 50, 60),
            ("a", 99, 5001),
            ("a", 20000, 30000),
            ("b", 6, 9),
            ("b", 7, 9),
            ("c", 0, 10),
            ("a", 240000, 260000),
        ],
        ["id", "start", "stop"],
    )
    base = overlap_join(left, right, strategy="range")
    binned = overlap_join(left, right, strategy="binned", bin_width=1000)

    def key(df):
        return sorted(
            tuple(r)
            for r in df.select(
                "id", "start", "stop", "start_r", "stop_r"
            ).collect()
        )

    got, want = key(binned), key(base)
    assert got == want
    assert len(want) > 0


def test_binned_no_duplicates(spark):
    # one pair overlapping across many bins must be emitted exactly once
    left = spark.createDataFrame([("x", 0, 100000)], ["id", "start", "stop"])
    right = spark.createDataFrame([("x", 50, 99950)], ["id", "start", "stop"])
    out = overlap_join(left, right, strategy="binned", bin_width=100)
    assert out.count() == 1


def test_extra_condition(spark):
    left = spark.createDataFrame([("a", 0, 10, 1)], ["id", "start", "stop", "tag"])
    right = spark.createDataFrame(
        [("a", 5, 15, 1), ("a", 5, 15, 2)], ["id", "start", "stop", "tag"]
    )
    out = overlap_join(
        left, right, extra_condition=F.col("tag") == F.col("tag_r")
    )
    assert out.count() == 1


def test_auto_bin_width_matches_binned_result(spark):
    from pygr_spark.operators.overlap import auto_bin_width, overlap_join

    left = spark.createDataFrame(
        [("a", 0, 10), ("a", 50, 60)], ["id", "start", "stop"]
    )
    right = spark.createDataFrame(
        [("a", 5, 12), ("a", 55, 58), ("a", 100, 104)],
        ["id", "start", "stop"],
    )
    w = auto_bin_width(right)
    assert w >= 8 and (w & (w - 1)) == 0  # power of two
    auto = overlap_join(left, right, strategy="binned", bin_width="auto")
    plain = overlap_join(left, right, strategy="range")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain.collect()))
