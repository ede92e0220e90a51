from pygr_spark.operators.sweep import coverage_segments, sweep_coverage_mask


def test_coverage_segments(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 5, 15), ("s", 20, 30)], ["id", "start", "stop"]
    )
    out = coverage_segments(df, ["id"])
    got = sorted(
        (r.seg_start, r.seg_stop, r.coverage) for r in out.collect()
    )
    assert got == [(0, 5, 1), (5, 10, 2), (10, 15, 1), (15, 20, 0), (20, 30, 1)]


def test_stop_before_start_tie(spark):
    # [0,10) and [10,20): at pos 10 the stop fires before the start,
    # so coverage never reaches 2 (reference tie rule cnestedlist.pyx:951-955)
    df = spark.createDataFrame([("s", 0, 10), ("s", 10, 20)], ["id", "start", "stop"])
    out = coverage_segments(df, ["id"])
    assert out.agg({"coverage": "max"}).collect()[0][0] == 1


def test_sweep_mask(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 5, 15), ("s", 8, 30), ("s", 25, 40)],
        ["id", "start", "stop"],
    )
    out = sweep_coverage_mask(df, ["id"], min_aligned=2)
    got = sorted((r.start, r.stop) for r in out.collect())
    # coverage>=2 on [5,15) and [25,30)
    assert got == [(5, 15), (25, 30)]
