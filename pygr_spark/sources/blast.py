"""BLAST text-output parser → hits DataFrame (S8).

Reference: ``BlastHitParser`` (parse_blast.py:39-215) walks blastall
-m0 text tracking query/subject state and splits gapped alignment
text into 1:1 interval pairs with score/E-value/%identity attached
(hit shape: FIXTURES.md §9). This is the same state machine as plain
Python, applied per query-record so a many-query output file
parallelizes: records split on the "Query=" boundary via the Hadoop
record delimiter; each record parses independently.

Coordinates convert from BLAST's 1-based inclusive to 0-based
half-open. E-values are emitted as -log10 (parse_blast.py:62-76 keeps
the same transform).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

HIT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("subject_id", T.StringType()),
        T.StructField("blast_score", T.DoubleType()),
        T.StructField("e_value", T.DoubleType()),  # -log10(E)
        T.StructField("pct_identity", T.DoubleType()),
        T.StructField("q_start", T.LongType()),
        T.StructField("q_stop", T.LongType()),
        T.StructField("s_start", T.LongType()),
        T.StructField("s_stop", T.LongType()),
    ]
)

_RE_SCORE = re.compile(
    r"Score\s*=\s*([\d.eE+-]+)\s*bits.*Expect[^=]*=\s*([\d.eE+-]+)"
)
_RE_IDENT = re.compile(r"Identities\s*=\s*(\d+)/(\d+)\s*\((\d+)%\)")
_RE_QLINE = re.compile(r"^Query:?\s+(\d+)\s+(\S+)\s+(\d+)\s*$")
_RE_SLINE = re.compile(r"^Sbjct:?\s+(\d+)\s+(\S+)\s+(\d+)\s*$")


def _neg_log10_evalue(text: str) -> float:
    if text.startswith("e"):  # blast prints 'e-105' for 1e-105
        text = "1" + text
    val = float(text)
    if val <= 0.0:
        return 300.0
    return -math.log10(val)


def _segments(q_text, s_text, q0, s0, q_dir, s_dir):
    """Gap-split 1:1 interval pairs from aligned text rows."""
    qi, si = q0, s0
    run = None
    for qc, sc in zip(q_text, s_text):
        qg, sg = qc == "-", sc == "-"
        if not qg and not sg:
            if run is None:
                run = (qi, si)
        else:
            if run is not None:
                yield (run[0], qi, run[1], si)
                run = None
        if not qg:
            qi += q_dir
        if not sg:
            si += s_dir
    if run is not None:
        yield (run[0], qi, run[1], si)


def parse_blast_record(record: str):
    """One 'Query=' record of blastall -m0 output → hit segment rows."""
    query_id = None
    subject_id = None
    score = evalue = pct = None
    q_text = s_text = ""
    q_first = q_last = s_first = s_last = None

    def flush():
        nonlocal q_text, s_text, q_first, q_last, s_first, s_last
        if subject_id and q_text and q_first is not None:
            q_dir = 1 if q_last >= q_first else -1
            s_dir = 1 if s_last >= s_first else -1
            q0 = q_first - 1 if q_dir > 0 else -(q_first)
            s0 = s_first - 1 if s_dir > 0 else -(s_first)
            for qa, qb, sa, sb in _segments(q_text, s_text, q0, s0, 1, 1):
                # direction handled by emitting signed coords for '-' frames
                yield (
                    query_id,
                    subject_id,
                    score,
                    evalue,
                    pct,
                    qa,
                    qb,
                    sa,
                    sb,
                )
        q_text = s_text = ""
        q_first = q_last = s_first = s_last = None

    out = []
    for raw in record.splitlines():
        line = raw.rstrip()
        if line.startswith("Query="):
            # a file starting with "Query=" yields an empty leading
            # record → "Query=" with no id; skip, flush() guards on it
            toks = line.split("=", 1)[1].split()
            query_id = toks[0].strip() if toks else None
        elif line.startswith(">"):
            out.extend(flush())
            subject_id = line[1:].split()[0].strip()
        elif "Score =" in line:
            out.extend(flush())
            m = _RE_SCORE.search(line)
            if m:
                score = float(m.group(1))
                evalue = _neg_log10_evalue(m.group(2))
        elif "Identities =" in line:
            m = _RE_IDENT.search(line)
            if m:
                pct = float(m.group(3))
        else:
            m = _RE_QLINE.match(line.strip())
            if m:
                if q_first is None:
                    q_first = int(m.group(1))
                q_text += m.group(2)
                q_last = int(m.group(3))
                continue
            m = _RE_SLINE.match(line.strip())
            if m:
                if s_first is None:
                    s_first = int(m.group(1))
                s_text += m.group(2)
                s_last = int(m.group(3))
    out.extend(flush())
    return out


def read_blast(spark: SparkSession, path: str) -> DataFrame:
    """Distributed blastall -m0 output → hits DataFrame (HIT_SCHEMA)."""
    import sys

    from pygr_spark.sources import ship_to_workers

    ship_to_workers(sys.modules[__name__])
    conf = {"textinputformat.record.delimiter": "Query="}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: "Query=" + kv[1])
    rows = rdd.flatMap(parse_blast_record)
    return spark.createDataFrame(rows, HIT_SCHEMA)
