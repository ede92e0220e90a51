from pygr_spark.sources.fasta import chunked, read_fasta, to_fasta_lines

FASTA = """>foo test sequence
atttgactat
gctccag
>bar
ACGT
ACGT
>baz third one
ttttt
"""


def _write(tmp_path):
    p = tmp_path / "test.fasta"
    p.write_text(FASTA)
    return str(p)


def test_read_fasta(spark, tmp_path):
    df = read_fasta(spark, _write(tmp_path))
    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {"foo", "bar", "baz"}
    assert rows["foo"].seq == "atttgactatgctccag"
    assert rows["foo"].length == 17
    assert rows["foo"].descr == "foo test sequence"
    assert rows["bar"].seq == "ACGTACGT"
    assert rows["baz"].seq == "ttttt"


def test_fasta_roundtrip(spark, tmp_path):
    df = read_fasta(spark, _write(tmp_path))
    lines = to_fasta_lines(df, width=4)
    text = "\n".join(r.value for r in lines.collect())
    # re-parse the written form
    import re

    records = [r for r in re.split(r"^>|\n>", text) if r.strip()]
    parsed = {}
    for rec in records:
        head, *body = rec.split("\n")
        parsed[head.split()[0]] = "".join(body).replace("\n", "").strip()
    assert parsed["foo"] == "atttgactatgctccag"
    assert parsed["bar"] == "ACGTACGT"


def test_chunked(spark):
    df = spark.createDataFrame([("s", "abcdefghij")], ["id", "seq"])
    out = sorted(
        (r.chunk_no, r.chunk_start, r.chunk) for r in chunked(df, chunk=4).collect()
    )
    assert out == [(0, 0, "abcd"), (1, 4, "efgh"), (2, 8, "ij")]
