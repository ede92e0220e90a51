import pytest

from pygr_spark.sources.axt import (
    dump_alignment_text,
    load_alignment_text,
    parse_axt_block,
    read_axt,
)
from pygr_spark.validators import assert_unique_key, key_violations, null_violations

AXT = """0 chr19 3001012 3001075 chr11 70568380 70568443 - 3500
TCAGCTCATAAATCACCTCCTGCCACAAGCCTGGCCTGGTCCCAGGAGAGTGTCCAGGCTCAGA
TCTGTTCATAAACCACCTGCCATGACAAGCCTGGCCTGTTCCCAAGACAATGTCCAGGCTCAGA

1 chr19 3008279 3008357 chr11 70573976 70574054 - 3900
CACAATCTTCACATTGAGATCCTGAGTTGCTGATCAGAATGGAAGGCTGAGCTAAGATGAGCGACGAGGCAATGTCACA
CACAGTCTTCACATTGAGGTACCAAGTTGTGGATCAGAATGGAAAGCTAGGCTATGATGAGGGACAAGGCAATGTCACA
"""


def test_parse_axt_block():
    blocks = AXT.split("\n\n")
    rows = list(parse_axt_block(blocks[0]))
    # no indels in the texts → one 1:1 segment
    assert len(rows) == 1
    num, score, t, ts, te, q, qs, qe, strand = rows[0]
    assert (t, ts, te) == ("chr19", 3001011, 3001075)
    assert (q, qs, qe) == ("chr11", 70568379, 70568443)
    assert strand == -1 and score == 3500.0


def test_parse_axt_minus_strand_sizes():
    rows = list(parse_axt_block(AXT.split("\n\n")[0], q_sizes={"chr11": 135086622}))
    _, _, _, _, _, _, qs, qe, strand = rows[0]
    assert qs == 135086622 - 70568443  # forward-strand coords
    assert strand == -1


def test_read_axt_and_text_roundtrip(spark, tmp_path):
    p = tmp_path / "test.axt"
    p.write_text(AXT)
    df = read_axt(spark, str(p))
    assert df.count() == 2
    out = str(tmp_path / "dump")
    dump_alignment_text(df, out)
    back = load_alignment_text(spark, out)
    assert back.count() == 2
    assert sorted(back.columns) == sorted(df.columns)


def test_validators(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None)], ["k", "v"]
    )
    assert [(r.k, r.n_rows) for r in key_violations(df, ["k"]).collect()] == [(1, 2)]
    with pytest.raises(ValueError, match="not unique"):
        assert_unique_key(df, ["k"])
    assert_unique_key(df.filter("v = 'a' OR v IS NULL"), ["k"])
    assert null_violations(df, ["v"]).count() == 1
