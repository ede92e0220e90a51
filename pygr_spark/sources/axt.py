"""axtNet pairwise alignment reader (S7).

Reference: cnestedlist.pyx:1858-1975 parses UCSC axt files into the
NLMSA build pipeline, with the per-file bidirectionality rule
(prune_self_mappings, nlmsa_utils.py:394-402). Format: blank-line
separated blocks of

    <num> <tName> <tStart> <tEnd> <qName> <qStart> <qEnd> <strand> <score>
    <target alignment text>
    <query alignment text>

axt coordinates are 1-based inclusive (converted here to 0-based
half-open); a '-' strand means query coords count from the reverse
strand end (kept as strand=-1, coords converted to forward). Gapped
texts are split into 1:1 segments exactly like the MAF reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pygr_spark.sources.maf import _segments

AXT_SCHEMA = T.StructType(
    [
        T.StructField("aln_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("src_id", T.StringType()),
        T.StructField("src_start", T.LongType()),
        T.StructField("src_stop", T.LongType()),
        T.StructField("dst_id", T.StringType()),
        T.StructField("dst_start", T.LongType()),
        T.StructField("dst_stop", T.LongType()),
        T.StructField("dst_strand", T.IntegerType()),
    ]
)


def parse_axt_block(record: str, q_sizes: dict[str, int] | None = None):
    """One axt block → gap-split pairwise segment rows. ``q_sizes``
    (query chromosome sizes) enables '-'-strand forward-coordinate
    conversion; without it reverse coords stay query-local."""
    lines = [ln for ln in record.strip().splitlines() if not ln.startswith("#")]
    if len(lines) < 3:
        return
    head = lines[0].split()
    if len(head) < 9:
        return
    num = int(head[0])
    t_name, t_start, t_end = head[1], int(head[2]), int(head[3])
    q_name, q_start, q_end = head[4], int(head[5]), int(head[6])
    strand = 1 if head[7] == "+" else -1
    score = float(head[8])
    t_text, q_text = lines[1], lines[2]
    # 1-based inclusive → 0-based half-open
    t0, q0 = t_start - 1, q_start - 1
    if strand < 0 and q_sizes and q_name in q_sizes:
        size = q_sizes[q_name]
        q0 = size - q_end  # forward-strand start
    for ts, te, qs, qe in _segments(t_text, q_text, t0, q0):
        yield (num, score, t_name, ts, te, q_name, qs, qe, strand)


def read_axt(
    spark: SparkSession, path: str, q_sizes: dict[str, int] | None = None
) -> DataFrame:
    import sys

    from pygr_spark.sources import maf, ship_to_workers

    # _segments comes from the maf module — ship both by value
    ship_to_workers(sys.modules[__name__])
    ship_to_workers(maf)
    conf = {"textinputformat.record.delimiter": "\n\n"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    )
    rows = rdd.flatMap(lambda kv: parse_axt_block(kv[1], q_sizes))
    return spark.createDataFrame(rows, AXT_SCHEMA)


def dump_alignment_text(df: DataFrame, path: str) -> None:
    """S11 portable text round-trip (reference dump_textfile,
    cnestedlist.pyx:2050-2143) — CSV with header; any engine reloads it."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def load_alignment_text(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
