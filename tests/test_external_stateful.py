"""S9 external-process source + applyInPandasWithState streaming."""

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pygr_spark.sources.external import fasta_formatter, run_external_tool


def test_run_external_tool_wordcount(spark):
    # fake 'domain tool': awk computing per-record sequence lengths
    df = spark.createDataFrame(
        [("a", "ACGT"), ("b", "ACGTACGT")], ["id", "seq"]
    ).repartition(2)
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("n", T.LongType())]
    )

    def parse(line):
        sid, n = line.split("\t")
        return [{"id": sid, "n": int(n)}]

    out = run_external_tool(
        df,
        ["awk", "/^>/{id=substr($0,2); next} {print id \"\\t\" length($0)}"],
        fasta_formatter(),
        parse,
        schema,
    )
    got = {r.id: r.n for r in out.collect()}
    assert got == {"a": 4, "b": 8}


def test_streaming_gap_merge(spark):
    from pygr_spark.streaming.stateful import streaming_gap_merge

    # file stream of (id, start) events in two micro-batch files
    d = tempfile.mkdtemp(prefix="pygr_stateful_")
    spark.createDataFrame(
        [(1, 10), (1, 12), (1, 100), (2, 5)], ["id", "start"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))

    stream = spark.readStream.schema("id long, start long").parquet(
        os.path.join(d, "in")
    )
    merged = streaming_gap_merge(stream, maxgap=5)
    q = (
        merged.writeStream.format("memory")
        .queryName("merged_stream")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pygr_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.id, r.start, r.stop): r.n_merged
        for r in spark.table("merged_stream").collect()
    }
    # closed run: id=1 [10,13) broken by 100; open runs (1@100, 2@5)
    # stay in state awaiting timeout — only the closed one is emitted
    assert rows == {(1, 10, 13): 2}


def test_streaming_gap_merge_late_event_widens_run_downward(spark):
    # ADVICE r1: a late out-of-order position arriving in a LATER
    # micro-batch below the open run's start must lower the run's
    # start, not just bump n_merged (no-watermark late-data policy)
    from pygr_spark.streaming.stateful import streaming_gap_merge

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="pygr_stateful_late_")
    indir = os.path.join(d, "in")
    os.makedirs(indir)
    # batch 1 opens run [10,11); batch 2 delivers late p=7 (merges,
    # must widen to [7,11)) then p=100 (closes the widened run)
    pq.write_table(pa.table({"id": [1], "start": [10]}),
                   os.path.join(indir, "b1.parquet"))
    pq.write_table(pa.table({"id": [1, 1], "start": [7, 100]}),
                   os.path.join(indir, "b2.parquet"))
    os.utime(os.path.join(indir, "b1.parquet"), (1_000_000_000, 1_000_000_000))
    os.utime(os.path.join(indir, "b2.parquet"), (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("id long, start long")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    merged = streaming_gap_merge(stream, maxgap=5)
    q = (
        merged.writeStream.format("memory")
        .queryName("merged_late_stream")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pygr_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.id, r.start, r.stop): r.n_merged
        for r in spark.table("merged_late_stream").collect()
    }
    assert rows == {(1, 7, 11): 2}
