"""Sequence algebra goldens from reference tests/sequence_test.py:10-91."""

from pyspark.sql import functions as F

from pygr_spark.functions.seqfns import (
    guess_seqtype,
    revcomp,
    seq_slice,
    six_frames,
    translate_orf,
)

SEQ = "atttgactatgctccag"  # sequence_test.py:10 ('foo')


def _one(spark, expr):
    return spark.createDataFrame([(SEQ,)], ["seq"]).select(expr.alias("x")).collect()[0].x


def s(spark, start, stop=None):
    return lambda: None  # placeholder


def test_slice(spark):
    # str(seq[5:10]) == 'actat'
    assert _one(spark, seq_slice(F.col("seq"), F.lit(5), F.lit(10))) == "actat"


def test_slice_rc(spark):
    # str(-(seq[5:10])) == 'atagt'
    assert _one(spark, revcomp(seq_slice(F.col("seq"), F.lit(5), F.lit(10)))) == "atagt"


def test_rc_slice(spark):
    # str((-seq)[5:10]) == 'gcata'
    assert (
        _one(spark, seq_slice(revcomp(F.col("seq")), F.lit(5), F.lit(10))) == "gcata"
    )


def test_truncate(spark):
    # sequence_test.py:29-35
    assert _one(spark, seq_slice(F.col("seq"), F.lit(-202020202), F.lit(5))) == "atttg"
    assert _one(spark, seq_slice(F.col("seq"), F.lit(-2020202))) == SEQ
    assert (
        _one(spark, seq_slice(F.col("seq"), F.lit(-202020202), F.lit(-5)))
        == "atttgactatgc"
    )
    assert _one(spark, seq_slice(F.col("seq"), F.lit(-5), F.lit(2029))) == "tccag"
    assert _one(spark, seq_slice(F.col("seq"), F.lit(-5))) == "tccag"
    # out-of-bounds → NULL (the IndexError analog, sequence_test.py:36-50)
    assert _one(spark, seq_slice(F.col("seq"), F.lit(999), F.lit(10000))) is None
    assert _one(spark, seq_slice(F.col("seq"), F.lit(-10000), F.lit(-3000))) is None
    assert _one(spark, seq_slice(F.col("seq"), F.lit(1000))) is None


def test_rc_truncate(spark):
    # sequence_test.py:52-60 on seq = -original
    rc = revcomp(F.col("seq"))
    assert _one(spark, seq_slice(rc, F.lit(-202020202), F.lit(5))) == "ctgga"
    assert _one(spark, seq_slice(rc, F.lit(-202020202), F.lit(-5))) == "ctggagcatagt"
    assert _one(spark, seq_slice(rc, F.lit(-5))) == "caaat"


def test_seqtype(spark):
    # sequence_test.py:85-91
    df = spark.createDataFrame(
        [("atttgactatgctccag",), ("auuugacuaugcuccag",), ("kqwestvvarphal",)],
        ["seq"],
    )
    got = [r.t for r in df.select(guess_seqtype(F.col("seq")).alias("t")).collect()]
    assert got == [0, 1, 2]  # DNA, RNA, PROTEIN


def test_translate_orf(spark):
    # ATG GCT TAA -> M A *
    assert _one(spark, translate_orf(F.lit("ATGGCTTAA"))) == "MA*"
    # partial tail codon -> X
    assert _one(spark, translate_orf(F.lit("ATGGC"))) == "MX"
    # RNA input (U->T)
    assert _one(spark, translate_orf(F.lit("AUGGCUUAA"))) == "MA*"


def test_six_frames(spark):
    df = spark.createDataFrame([("s1", "ATGGCTTAAC")], ["id", "seq"])
    out = {r.frame: r for r in six_frames(df).collect()}
    assert set(out) == {1, 2, 3, -1, -2, -3}
    assert out[1].protein == "MA*"
    assert out[1].aa_length == 3
    assert len(out[2].frame_seq) == 9
    # frame -1 reads the revcomp from its start
    assert out[-1].frame_seq == "GTTAAGCCA"


def test_interval_mask(spark):
    from pygr_spark.operators.annotation import interval_mask

    df = spark.createDataFrame(
        [("s", 0, 10), ("s", 20, 30), ("t", 0, 10)], ["id", "start", "stop"]
    )
    mask = spark.createDataFrame([("s", 5, 25)], ["id", "start", "stop"])
    out = sorted((r.id, r.start, r.stop) for r in interval_mask(df, mask, ["id"]).collect())
    assert out == [("s", 5, 10), ("s", 20, 25)]


def test_project_annotations_and_prefix_union(spark):
    from pygr_spark.operators.annotation import prefix_union, project_annotations

    seqs = spark.createDataFrame([("foo", SEQ)], ["id", "seq"])
    annots = spark.createDataFrame(
        [("X", "foo", 5, 10, 1), ("Y", "foo", 5, 10, -1), ("Z", "foo", 900, 1000, 1)],
        ["annot_id", "seq_id", "start", "stop", "orientation"],
    )
    out = {r.annot_id: r.letters for r in project_annotations(annots, seqs).collect()}
    assert out == {"X": "actat", "Y": "atagt"}  # Z dropped: out of bounds

    u = prefix_union({"a": seqs, "b": seqs})
    ids = sorted(r.id for r in u.collect())
    assert ids == ["a.foo", "b.foo"]
