"""MAF + BLAST source tests.

BLAST input is the reference's canned output file
(tests/data/blastp_output.txt — data fixture, not code). The MAF
fixture is a standard UCSC multiz block.
"""

import os

from pygr_spark.sources.blast import parse_blast_record, read_blast
from pygr_spark.sources.maf import parse_maf_block, read_maf

MAF = """##maf version=1
a score=23262.0
s hg18.chr7    27578828 38 + 158545518 AAA-GGGAATGTTAACCAAATGA---ATTGTCTCTTACGGTG
s panTro1.chr6 28741140 38 + 161576975 AAA-GGGAATGTTAACCAAATGA---ATTGTCTCTTACGGTG
s baboon         116834 38 +   4622798 AAA-GGGAATGTTAACCAAATGA---GTTGTCTCTTATGGTG

a score=5062.0
s hg18.chr7    27699739 6 + 158545518 TAAAGA
s rn3.chr4     81444246 6 - 187371129 taagga
"""

BLASTP = "/root/reference/tests/data/blastp_output.txt"


def test_parse_maf_block():
    blocks = [b for b in MAF.split("\n\n")]
    rows = list(parse_maf_block(0, blocks[0]))
    # two pairwise targets, one gap-free segment each (gaps are shared
    # columns, so the zipped texts have no one-sided gaps)
    assert len(rows) == 2
    b, score, src, s0, s1, so, dst, d0, d1, do = rows[0]
    assert (src, s0, s1, so) == ("hg18.chr7", 27578828, 27578828 + 38, 1)
    assert (dst, d0, d1, do) == ("panTro1.chr6", 28741140, 28741140 + 38, 1)
    assert score == 23262.0

    rows2 = list(parse_maf_block(1, blocks[1]))
    assert len(rows2) == 1
    _, _, src, s0, s1, so, dst, d0, d1, do = rows2[0]
    # '-' strand start converted to forward coords
    assert (dst, do) == ("rn3.chr4", -1)
    assert d0 == 187371129 - 81444246 - 6 and d1 == d0 + 6


def test_parse_maf_block_one_sided_gaps():
    block = (
        "a score=1.0\n"
        "s a 0 5 + 10 AC-GTA\n"
        "s b 0 4 + 10 ACG--A\n"
    )
    rows = list(parse_maf_block(0, block))
    # columns: (A,A)(C,C)(-,G)(G,-)(T,-)(A,A) → runs [0,2)x[0,2) and [4,5)x[3,4)
    segs = [(r[3], r[4], r[7], r[8]) for r in rows]
    assert segs == [(0, 2, 0, 2), (4, 5, 3, 4)]


def test_read_maf(spark, tmp_path):
    p = tmp_path / "test.maf"
    p.write_text(MAF)
    df = read_maf(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    assert {r.dst_id for r in rows} == {"panTro1.chr6", "baboon", "rn3.chr4"}


def test_parse_blast_record():
    text = open(BLASTP).read()
    # single-query file
    rows = parse_blast_record(text)
    assert len(rows) > 0
    by_subject = {}
    for r in rows:
        by_subject.setdefault(r[1], []).append(r)
    # self-hit: identity 100%, full length, coords 0-based half-open
    self_hits = by_subject["HBB1_XENLA"]
    assert any(
        (q0, q1, s0, s1) == (0, 145, 0, 145)
        for (_, _, _, _, _, q0, q1, s0, s1) in self_hits
    )
    assert self_hits[0][4] == 100.0
    assert abs(self_hits[0][3] - 85.7) < 0.1  # -log10(2e-86)
    # myoglobin hits exist (weakest listed subjects)
    assert "MYG_GALCR" in by_subject


def test_read_blast(spark):
    if not os.path.exists(BLASTP):
        return
    df = read_blast(spark, BLASTP)
    rows = df.collect()
    assert len(rows) > 10
    assert df.filter("subject_id = 'HBB1_XENLA' AND pct_identity = 100.0").count() >= 1
