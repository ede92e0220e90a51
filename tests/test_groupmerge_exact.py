from pygr_spark.operators.groupmerge import (
    group_by_intervals,
    group_by_intervals_exact,
)

ROWS = [
    ("a", "b", 0, 10, 100, 110),
    ("a", "b", 12, 20, 113, 121),
    ("a", "b", 22, 30, 123, 131),
    ("a", "b", 500, 510, 700, 710),
]
COLS = ["src_id", "dst_id", "src_start", "src_stop", "dst_start", "dst_stop"]


def _get(df):
    return sorted(
        (r.src_start, r.src_stop, r.dst_start, r.dst_stop, r.n_merged)
        for r in df.collect()
    )


def test_exact_matches_window_when_no_maxsize(spark):
    df = spark.createDataFrame(ROWS, COLS)
    kw = dict(maxgap=5, maxinsert=5, mininsert=0, maxsize=-1)
    a = _get(group_by_intervals(df, ["src_id", "dst_id"], **kw).drop("match_ivals"))
    b = _get(group_by_intervals_exact(df, ["src_id", "dst_id"], **kw))
    assert a == b == [(0, 30, 100, 131, 3), (500, 510, 700, 710, 1)]


def test_exact_maxsize_splits_run(spark):
    df = spark.createDataFrame(ROWS, COLS)
    out = _get(
        group_by_intervals_exact(
            df, ["src_id", "dst_id"], maxgap=5, maxinsert=5, maxsize=25
        )
    )
    # third interval would stretch the merged span to 30 > 25 → split
    assert out == [(0, 20, 100, 121, 2), (22, 30, 123, 131, 1), (500, 510, 700, 710, 1)]


def test_sliding_counts(spark, sf_dir):
    from pygr_spark.streaming.events import (
        read_events_stream,
        run_stream_to_table,
        sliding_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_table(sliding_counts(stream), spark)
    rows = got.collect()
    assert len(rows) > 0
    # sliding 10m/5m: every event is counted exactly twice across windows
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == 2 * n_events
