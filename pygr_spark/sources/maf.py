"""MAF (multiz multiple alignment) reader → alignment DataFrame (S6).

Reference: ``readMAFfiles`` (cnestedlist.pyx:1725-1837) + the C
tokenizer (apps/maf2nclist.c) parse MAF blocks into IntervalMap arrays
packed into LPO/union coordinate systems, spilling to .build files and
splitting coordinate systems at int32 overflow. None of that survives
here (SURVEY.md §1.1 NLMSA row): coordinates are int64, storage is a
pairwise alignment DataFrame partitioned by sequence id, and the LPO
middle coordinate system is dropped in favor of pairwise rows
(pygr's own pairwiseMode, cnestedlist.pyx:1645-1656).

Format (UCSC): blocks separated by blank lines;
  a score=...
  s <src> <start> <size> <strand> <srcSize> <gapped text>
'-' strand starts are offsets on the reverse strand; converted to
forward-strand coords here, strand kept as ±1.

The block parser is plain Python applied per record — the scalable
path reads blocks via the Hadoop record delimiter (one block per
record, splits align at blank lines) so a multi-GB MAF parallelizes;
per-block work is pure CPU with no cross-block state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ALN_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("src_id", T.StringType()),
        T.StructField("src_start", T.LongType()),
        T.StructField("src_stop", T.LongType()),
        T.StructField("src_strand", T.IntegerType()),
        T.StructField("dst_id", T.StringType()),
        T.StructField("dst_start", T.LongType()),
        T.StructField("dst_stop", T.LongType()),
        T.StructField("dst_strand", T.IntegerType()),
    ]
)


def _parse_s_line(parts: list[str]):
    # s src start size strand srcSize text
    src, start, size, strand, src_size, text = (
        parts[1],
        int(parts[2]),
        int(parts[3]),
        parts[4],
        int(parts[5]),
        parts[6],
    )
    ori = 1 if strand == "+" else -1
    if ori < 0:  # convert reverse-strand offset to forward coords
        fstart = src_size - start - size
    else:
        fstart = start
    return src, fstart, fstart + size, ori, text


def _segments(ref_text: str, other_text: str, ref_start: int, other_start: int):
    """1:1 gap-free segment pairs from two gapped alignment texts."""
    rs, os_ = ref_start, other_start
    run_r = run_o = None
    for rc, oc in zip(ref_text, other_text):
        r_gap, o_gap = rc == "-", oc == "-"
        if not r_gap and not o_gap:
            if run_r is None:
                run_r, run_o = rs, os_
        elif r_gap != o_gap:
            # one-sided gap = indel → close the run; both-gap columns
            # (inserted by a third sequence in the block) are no-ops
            if run_r is not None:
                yield (run_r, rs, run_o, os_)
                run_r = run_o = None
        if not r_gap:
            rs += 1
        if not o_gap:
            os_ += 1
    if run_r is not None:
        yield (run_r, rs, run_o, os_)


def parse_maf_block(block_id: int, record: str):
    """One MAF block → pairwise rows (reference sequence = first s
    line, as in multiz output; matches pygr's pairwise storage)."""
    score = None
    s_lines = []
    for line in record.strip().splitlines():
        line = line.strip()
        if line.startswith("a "):
            for tok in line[2:].split():
                if tok.startswith("score="):
                    try:
                        score = float(tok[6:])
                    except ValueError:
                        score = None
        elif line.startswith("s "):
            parts = line.split()
            if len(parts) >= 7:
                s_lines.append(_parse_s_line(parts))
    if len(s_lines) < 2:
        return
    ref_id, ref_start, _ref_stop, ref_ori, ref_text = s_lines[0]
    for dst_id, dst_start, _d_stop, dst_ori, dst_text in s_lines[1:]:
        for r0, r1, o0, o1 in _segments(ref_text, dst_text, ref_start, dst_start):
            yield (
                block_id,
                score,
                ref_id,
                r0,
                r1,
                ref_ori,
                dst_id,
                o0,
                o1,
                dst_ori,
            )


def read_maf(spark: SparkSession, path: str) -> DataFrame:
    """Distributed MAF → pairwise alignment DataFrame (ALN_SCHEMA)."""
    import sys

    from pygr_spark.sources import ship_to_workers

    ship_to_workers(sys.modules[__name__])
    conf = {"textinputformat.record.delimiter": "\n\n"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    )
    rows = rdd.flatMap(lambda kv: parse_maf_block(kv[0], kv[1]))
    return spark.createDataFrame(rows, ALN_SCHEMA)
