"""JDBC source/sink (S4/S5) against embedded Derby — the one JDBC
engine on Spark's stock classpath (derby + derbytools jars ship with
pyspark). Mirrors the reference's SQLTable scan/insert semantics
(sqlgraph.py:506-560, 911-975, 2148-2195)."""

import os
import tempfile

import pytest

from pygr_spark.sources.jdbc import (
    quiet_derby,
    read_sql_query,
    read_sql_table,
    sql_graph_edges,
    write_sql_table,
)


@pytest.fixture(scope="module")
def derby(spark):
    tmp = tempfile.mkdtemp(prefix="pygr_jdbc_t_")
    quiet_derby(spark, os.path.join(tmp, "derby.log"))
    return f"jdbc:derby:{tmp}/db;create=true"


@pytest.fixture(scope="module")
def nation(spark, sf_dir, derby):
    df = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    write_sql_table(df, derby, "nation", mode="overwrite")
    return df


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_roundtrip_plain(spark, derby, nation):
    back = read_sql_table(spark, derby, "nation")
    assert sorted(back.columns) == sorted(nation.columns)
    assert _rows(back.select(*nation.columns)) == _rows(nation)


def test_roundtrip_partitioned(spark, derby, nation):
    """Keyset-partitioned scan: bounds auto-discovered, each partition
    a concurrent range query (reference BlockIterator made parallel)."""
    back = read_sql_table(
        spark, derby, "nation", partition_col="n_nationkey", num_partitions=4
    )
    assert back.rdd.getNumPartitions() == 4
    assert _rows(back.select(*nation.columns)) == _rows(nation)


def test_roundtrip_predicates(spark, derby, nation):
    """Predicate-list scan for non-numeric splits: partitions must
    tile the table (disjoint + covering) exactly once."""
    back = read_sql_table(
        spark,
        derby,
        "nation",
        predicates=['"n_regionkey" < 2', '"n_regionkey" >= 2'],
    )
    assert back.rdd.getNumPartitions() == 2
    assert _rows(back.select(*nation.columns)) == _rows(nation)


def test_filter_pushdown(spark, derby, nation):
    """Per-key access (reference __getitem__, sqlgraph.py:926-942) is
    a pushed filter, not a full scan."""
    back = read_sql_table(spark, derby, "nation")
    one = back.filter("n_nationkey = 3")
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "n_nationkey" in plan
    assert one.count() == 1


def test_pushed_query(spark, derby, nation):
    agg = read_sql_query(
        spark,
        derby,
        'SELECT "n_regionkey", COUNT(*) AS "cnt" FROM nation GROUP BY "n_regionkey"',
    )
    got = {r["n_regionkey"]: r["cnt"] for r in agg.collect()}
    want = {
        r["n_regionkey"]: r["cnt"]
        for r in nation.groupBy("n_regionkey").count().withColumnRenamed("count", "cnt").collect()
    }
    assert got == want


def test_sql_graph_edges(spark, derby, nation):
    """SQLGraph (edge table → adjacency) as scan + projection."""
    g = sql_graph_edges(spark, derby, "nation", "n_nationkey", "n_regionkey")
    assert g.columns == ["src", "dst"]
    assert g.count() == nation.count()
    want = _rows(nation.select("n_nationkey", "n_regionkey"))
    assert _rows(g) == want


def test_append_mode(spark, derby, nation):
    write_sql_table(nation.limit(5), derby, "nation_copy", mode="overwrite")
    write_sql_table(nation.limit(3), derby, "nation_copy", mode="append")
    assert read_sql_table(spark, derby, "nation_copy").count() == 8


def test_upsert_merge(spark, derby, nation):
    """S5 update path: bulk-staged MERGE (the reference's per-row
    __setitem__ update, sqlgraph.py:944-975, as one set-based
    statement). Updates hit matched keys, inserts cover new keys,
    untouched rows survive."""
    from pyspark.sql import functions as F

    from pygr_spark.sources.jdbc import upsert_sql_table

    write_sql_table(nation, derby, "nation_up", mode="overwrite")
    changes = (
        nation.filter("n_nationkey < 3")
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_v2")))
        .unionByName(
            nation.limit(1).select(
                (F.col("n_nationkey") + 1000).alias("n_nationkey"),
                F.lit("ATLANTIS").alias("n_name"),
                *[c for c in nation.columns if c not in ("n_nationkey", "n_name")],
            ).select(*nation.columns)
        )
    )
    upsert_sql_table(changes, derby, "nation_up", keys=["n_nationkey"])
    back = read_sql_table(spark, derby, "nation_up")
    assert back.count() == nation.count() + 1
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    for r in nation.collect():
        expect_name = r.n_name + "_v2" if r.n_nationkey < 3 else r.n_name
        assert got[r.n_nationkey] == expect_name
    assert got[1000 + nation.limit(1).collect()[0].n_nationkey] == "ATLANTIS"
    # staging table dropped (Derby folds unquoted names to upper)
    leftover = read_sql_query(
        spark,
        derby,
        "SELECT tablename FROM sys.systables "
        "WHERE tablename LIKE 'NATION_UP_STAGE%'",
    )
    assert leftover.count() == 0


def test_jdbc_resource_in_durable_catalog(spark, derby, nation):
    """metabase persistence of a SQL-table reference
    (SQLTableServerInfo, sqlgraph.py:2196-2221): the durable catalog
    stores url+table, a reopened catalog re-scans the live DB."""
    from pygr_spark.plans.durable import DurableCatalog

    root = tempfile.mkdtemp(prefix="pygr_wbase_jdbc_")
    cat = DurableCatalog(spark, root)
    cat.save_jdbc_table(
        "Db.Nation", derby, "nation",
        doc="live nation table", partition_col="n_nationkey", num_partitions=2,
    )
    del cat
    reopened = DurableCatalog.open(spark.newSession(), root)
    df = reopened("Db.Nation")
    assert df.count() == nation.count()
    assert df.rdd.getNumPartitions() == 2
    assert reopened.doc("Db.Nation") == "live nation table"


def test_empty_table_bounds(spark, derby, nation):
    """Auto-bounds on an empty table must not crash (MIN/MAX = NULL)."""
    write_sql_table(nation.limit(0), derby, "nation_empty", mode="overwrite")
    back = read_sql_table(
        spark, derby, "nation_empty", partition_col="n_nationkey", num_partitions=4
    )
    assert back.count() == 0
