from pygr_spark.operators.groupmerge import gap_merge, group_by_intervals


def test_gap_merge_basic(spark):
    df = spark.createDataFrame(
        [
            ("s1", 0, 10),
            ("s1", 10, 20),   # adjacent: gap 0 -> merge
            ("s1", 25, 30),   # gap 5 -> split at maxgap=0
            ("s2", 0, 5),
        ],
        ["id", "start", "stop"],
    )
    out = gap_merge(df, ["id"], maxgap=0)
    got = sorted(tuple(r) for r in out.select("id", "start", "stop", "n_merged").collect())
    assert got == [("s1", 0, 20, 2), ("s1", 25, 30, 1), ("s2", 0, 5, 1)]


def test_gap_merge_contained(spark):
    # contained interval must not break the run (running-max semantics)
    df = spark.createDataFrame(
        [("s", 0, 100), ("s", 10, 20), ("s", 100, 110)], ["id", "start", "stop"]
    )
    out = gap_merge(df, ["id"], maxgap=0)
    got = sorted(tuple(r) for r in out.select("id", "start", "stop").collect())
    assert got == [("s", 0, 110)]


def test_gap_merge_maxgap(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 15, 20), ("s", 40, 50)], ["id", "start", "stop"]
    )
    out = gap_merge(df, ["id"], maxgap=5)
    got = sorted(tuple(r) for r in out.select("id", "start", "stop").collect())
    assert got == [("s", 0, 20), ("s", 40, 50)]


def test_gap_merge_merge_all(spark):
    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 500, 600)], ["id", "start", "stop"]
    )
    out = gap_merge(df, ["id"], maxgap=-1)
    got = sorted(tuple(r) for r in out.select("id", "start", "stop").collect())
    assert got == [("s", 0, 600)]


def test_group_by_intervals_pairs(spark):
    # two colinear aligned blocks with small gap+insert merge; the far one splits
    df = spark.createDataFrame(
        [
            ("a", "b", 0, 10, 100, 110),
            ("a", "b", 12, 20, 113, 121),   # gap 2, insert 3
            ("a", "b", 500, 510, 700, 710), # far -> new group
        ],
        ["src_id", "dst_id", "src_start", "src_stop", "dst_start", "dst_stop"],
    )
    out = group_by_intervals(
        df, ["src_id", "dst_id"], maxgap=5, maxinsert=5, mininsert=0
    )
    rows = sorted(
        (r.src_start, r.src_stop, r.dst_start, r.dst_stop, r.n_merged)
        for r in out.collect()
    )
    assert rows == [(0, 20, 100, 121, 2), (500, 510, 700, 710, 1)]
    merged = [r for r in out.collect() if r.n_merged == 2][0]
    assert [(m.ss, m.se, m.ds, m.de) for m in merged.match_ivals] == [
        (0, 10, 100, 110),
        (12, 20, 113, 121),
    ]


def test_gap_merge_duplicate_intervals(spark):
    # duplicate (start, stop) rows used to risk fracturing a group when
    # the split-flag pass and the cumsum pass ordered ties differently;
    # the pinned row_number makes grouping deterministic
    df = spark.createDataFrame(
        [("a", 0, 2), ("a", 1, 3), ("a", 10, 12), ("a", 10, 12), ("a", 10, 12)],
        ["id", "start", "stop"],
    )
    out = sorted(
        (r.start, r.stop, r.n_merged)
        for r in gap_merge(df, ["id"], maxgap=5).collect()
    )
    assert out == [(0, 3, 2), (10, 12, 3)]
