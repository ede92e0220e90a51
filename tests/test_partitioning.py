import pytest
from pyspark.sql import functions as F

from pygr_spark.operators.partitioning import (
    bucketed_table,
    salted_join,
    slice_from_chunks,
    write_bucketed,
)
from pygr_spark.sources.fasta import chunked


def test_salted_join_matches_plain(spark):
    skewed = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1)], ["k", "v"]
    )
    other = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])
    plain = sorted(
        (r.k, r.v, r.tag) for r in skewed.join(other, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(skewed, other, "k", salt=4).collect()
    )
    assert salted == plain
    assert len(salted) == 501


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bt_a", "k", buckets=8, sort_by="k")
    write_bucketed(b, "bt_b", "k", buckets=8, sort_by="k")
    ta, tb = bucketed_table(spark, "bt_a"), bucketed_table(spark, "bt_b")
    joined = ta.join(tb, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # co-located buckets
    assert joined.count() == 1000
    agg = ta.groupBy("k").agg(F.sum("va"))
    plan2 = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan2


def test_slice_from_chunks(spark):
    df = spark.createDataFrame([("s", "abcdefghijklmnop")], ["id", "seq"])
    ch = chunked(df, chunk=4)
    out = slice_from_chunks(ch, "s", 2, 11, chunk=4).collect()
    assert len(out) == 1
    assert out[0].letters == "cdefghijk"
    # slice inside one chunk
    assert slice_from_chunks(ch, "s", 5, 7, chunk=4).collect()[0].letters == "fg"
    # full-length
    assert (
        slice_from_chunks(ch, "s", 0, 16, chunk=4).collect()[0].letters
        == "abcdefghijklmnop"
    )


def test_slices_from_chunks_batch(spark):
    from pygr_spark.operators.partitioning import slices_from_chunks

    df = spark.createDataFrame(
        [("a", "abcdefghijklmnop"), ("b", "xyz")], ["id", "seq"]
    )
    ch = chunked(df, chunk=4)
    req = spark.createDataFrame(
        [("a", 2, 11), ("a", 5, 7), ("b", 0, 3), ("b", 1, 2)],
        ["id", "start", "stop"],
    )
    out = {
        (r.id, r.start, r.stop): r.letters
        for r in slices_from_chunks(ch, req).collect()
    }
    assert out == {
        ("a", 2, 11): "cdefghijk",
        ("a", 5, 7): "fg",
        ("b", 0, 3): "xyz",
        ("b", 1, 2): "y",
    }
