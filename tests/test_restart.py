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


def test_durable_catalog_restart(spark, sf_dir):
    """metabase persistence semantics (metabase.py:576-693): register
    resources + schema in one catalog instance, reopen from disk in a
    FRESH instance (and a fresh session namespace), everything still
    answers."""
    from pygr_spark.plans.catalog import SchemaEdge
    from pygr_spark.plans.durable import DurableCatalog

    root = tempfile.mkdtemp(prefix="pygr_wbase_t_")
    cat = DurableCatalog(spark, root)
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    cat.save_resource("Tpc.Nation", nation, doc="TPC-H nation dim")
    cat.save_resource("Tpc.Region", region, partition_by=["r_regionkey"])
    cat.add_schema(
        SchemaEdge(
            "Tpc.Nation", "region", "Tpc.Region",
            "many:one", "n_regionkey", "r_regionkey",
        )
    )
    cat.save_view(
        "Tpc.NationNames",
        "SELECT n_name FROM parquet.`" + os.path.join(sf_dir, "nation.parquet") + "`",
    )
    del cat

    # fresh session namespace + fresh catalog object: disk state only
    s2 = spark.newSession()
    reopened = DurableCatalog.open(s2, root)
    assert reopened.dir("Tpc.") == ["Tpc.Nation", "Tpc.NationNames", "Tpc.Region"]
    assert reopened.doc("Tpc.Nation") == "TPC-H nation dim"
    assert reopened("Tpc.Nation").count() == nation.count()
    assert reopened("Tpc.NationNames").count() == nation.count()
    j = reopened.auto_join("Tpc.Nation", "region")
    assert j.count() == nation.count()
    edges = reopened.edges_df().collect()
    assert len(edges) == 1 and edges[0]["relation"] == "many:one"

    # partition pruning on the declared layout: scan reads one dir
    pruned = reopened("Tpc.Region").filter("r_regionkey = 2")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "r_regionkey" in plan.split(
        "PartitionFilters"
    )[1][:120]

    # re-registration overwrites, not duplicates
    cat3 = DurableCatalog.open(s2, root)
    cat3.add_schema(
        SchemaEdge(
            "Tpc.Nation", "region", "Tpc.Region",
            "many:one", "n_regionkey", "r_regionkey",
        )
    )
    assert len(cat3.edges_df().collect()) == 1


def test_catalog_sql_view(spark):
    from pygr_spark.plans.catalog import Catalog

    spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"]).createOrReplaceTempView(
        "cat_view_src"
    )
    cat = Catalog()
    cat.add_view("Views.Filtered", "SELECT * FROM cat_view_src WHERE id > 1", spark)
    rows = cat("Views.Filtered").collect()
    assert [(r.id, r.v) for r in rows] == [(2, "y")]


def test_durable_catalog_name_collision(spark):
    """Distinct resource names that sanitize to the same readable form
    must not share a data directory (review finding: 'A.b/c' vs
    'A.b_c' silently overwrote each other)."""
    from pygr_spark.plans.durable import _safe

    assert _safe("Genome.hg18/chr1") != _safe("Genome.hg18_chr1")

    root = tempfile.mkdtemp(prefix="pygr_wbase_coll_")
    from pygr_spark.plans.durable import DurableCatalog

    cat = DurableCatalog(spark, root)
    df1 = spark.createDataFrame([(1,)], "v long")
    df2 = spark.createDataFrame([(2,)], "v long")
    cat.save_resource("A.b/c", df1)
    cat.save_resource("A.b_c", df2)
    assert [r.v for r in cat("A.b/c").collect()] == [1]
    assert [r.v for r in cat("A.b_c").collect()] == [2]


def test_auto_join_path(spark, sf_dir):
    """Chained bound attributes: supplier.nation.region resolves two
    schema hops into one plan (ItemDescriptor chains)."""
    import pytest

    from pygr_spark.plans.catalog import Catalog, SchemaEdge

    cat = Catalog()
    cat.add_resource("T.S", spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")))
    cat.add_resource("T.N", spark.read.parquet(os.path.join(sf_dir, "nation.parquet")))
    cat.add_resource("T.R", spark.read.parquet(os.path.join(sf_dir, "region.parquet")))
    cat.add_schema(SchemaEdge("T.S", "nation", "T.N", "many:one", "s_nationkey", "n_nationkey"))
    cat.add_schema(SchemaEdge("T.N", "region", "T.R", "many:one", "n_regionkey", "r_regionkey"))
    j = cat.auto_join_path("T.S", ["nation", "region"])
    n_sup = cat("T.S").count()
    assert j.count() == n_sup  # many:one hops preserve cardinality
    assert "r_name" in j.columns and "s_name" in j.columns
    with pytest.raises(KeyError):
        cat.auto_join_path("T.S", ["nation", "bogus"])
