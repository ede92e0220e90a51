"""FASTA source/sink (S1/S2/S3).

The reference streams FASTA building a length index + concatenated
letters file (seqdb.py:570-591 ``_store_seqlen_dict``, seqfmt.pyx);
random access is fseek into ``.pureseq`` (seqdb.py:458-472). Spark
replaces all of that with one DataFrame ``(id, seq, length)`` persisted
as Parquet: row-group min/max stats on ``id`` give keyed access, and
``substring`` does random-access slicing.

Scalable read path: Hadoop ``textinputformat.record.delimiter = "\\n>"``
splits records at FASTA boundaries *inside the input format*, so a
multi-GB multi-record file parallelizes across splits without any
driver-side parsing. Each record is then parsed with pure column
expressions. For genome-length sequences, ``chunked`` re-rows a
sequence into fixed-size chunks — the layout the reference fakes with
fseek (chunk_no ≈ file offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FASTA reader → (id, descr, seq, length)."""
    conf = {"textinputformat.record.delimiter": "\n>"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: (kv[1],))
    raw = spark.createDataFrame(rdd, "record string")
    return parse_fasta_records(raw)


def parse_fasta_records(raw: DataFrame, record: str = "record") -> DataFrame:
    """Parse '>'-delimited records (leading '>' optional — the first
    record of a file keeps it, later ones lose it to the delimiter)."""
    rec = F.regexp_replace(F.col(record), r"^>", "")
    header = F.substring_index(rec, "\n", 1)
    body = F.expr(
        f"substring({record}, length(substring_index({record}, '\\n', 1)) + 2)"
    )
    seq = F.regexp_replace(body, r"\s", "")
    return (
        raw.select(
            F.trim(F.substring_index(header, " ", 1)).alias("id"),
            F.trim(header).alias("descr"),
            seq.alias("seq"),
        )
        .filter(F.length("id") > 0)
        .withColumn("length", F.length("seq").cast("long"))
    )


def to_fasta_lines(df: DataFrame, id_col: str = "id", seq: str = "seq",
                   width: int = 60) -> DataFrame:
    """FASTA sink projection (S3, sequtil.py:38-57): one text column,
    sequence wrapped at ``width``; write with ``df.write.text``."""
    wrapped = F.regexp_replace(F.col(seq), f"(.{{{width}}})", "$1\n")
    return df.select(
        F.concat(F.lit(">"), F.col(id_col), F.lit("\n"), wrapped).alias("value")
    )


def chunked(df: DataFrame, id_col: str = "id", seq: str = "seq",
            chunk: int = 1_000_000) -> DataFrame:
    """Re-row genome-length sequences into fixed chunks
    (id, chunk_no, chunk_start, chunk) — the scale-out storage layout
    for letter-level ops (SURVEY.md S2: 'for huge genomes, chunk')."""
    n_chunks = F.ceil(F.length(seq) / chunk).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.select(F.col(id_col), F.col(seq).alias("_s"), F.explode(idx).alias("chunk_no"))
    return out.select(
        id_col,
        "chunk_no",
        (F.col("chunk_no").cast("long") * chunk).alias("chunk_start"),
        F.substring(F.col("_s"), (F.col("chunk_no") * chunk + 1).cast("int"), chunk).alias(
            "chunk"
        ),
    )
