"""Fault-tolerance: the reference's restartable-iterator protocol
(tests/restartIterator_megatest.py, coordinator.py Processor restarts)
maps to Structured Streaming checkpoints — a stopped query resumed
with the same checkpoint processes each input exactly once."""

import os
import tempfile

from pyspark.sql import functions as F


def test_checkpoint_restart_exactly_once(spark):
    d = tempfile.mkdtemp(prefix="pygr_restart_")
    indir, ckpt = os.path.join(d, "in"), os.path.join(d, "ckpt")
    os.makedirs(indir)

    spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]).coalesce(1).write.parquet(
        os.path.join(indir, "batch1")
    )
    # file source streams a directory tree of parquet parts
    stream = spark.readStream.schema("id long, v long").option(
        "recursiveFileLookup", "true"
    ).parquet(indir)
    counted = stream.groupBy("id").agg(F.sum("v").alias("total"))

    def run(name):
        q = (
            counted.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.id: r.total for r in spark.table(name).collect()}

    assert run("restart_a") == {1: 10, 2: 20}

    # add data, restart from the same checkpoint: old files NOT reprocessed
    spark.createDataFrame([(1, 5)], ["id", "v"]).coalesce(1).write.parquet(
        os.path.join(indir, "batch2")
    )
    assert run("restart_b") == {1: 15, 2: 20}


def test_catalog_sql_view(spark):
    from pygr_spark.plans.catalog import Catalog

    spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"]).createOrReplaceTempView(
        "cat_view_src"
    )
    cat = Catalog()
    cat.add_view("Views.Filtered", "SELECT * FROM cat_view_src WHERE id > 1", spark)
    rows = cat("Views.Filtered").collect()
    assert [(r.id, r.v) for r in rows] == [(2, "y")]
