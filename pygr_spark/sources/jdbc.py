"""JDBC SQL-table source/sink (S4/S5).

The reference's ``SQLTable`` family provides dict-style access to rows
in a relational table (sqlgraph.py:506-560, 904-975): full ``load()``
scans, keyset pagination for iteration (``BlockIterator``,
sqlgraph.py:2148-2195, pages ``WHERE pk > ?  LIMIT n``), and
per-key ``__getitem__`` probes (sqlgraph.py:926-942). ``SQLGraph``
(sqlgraph.py:1579-1688) exposes an edge table as a graph mapping.

Spark-first mapping: one ``spark.read.jdbc`` scan per table.  The
keyset pagination becomes *range partitioning* on the primary key —
``numPartitions`` executors each issue ``WHERE pk BETWEEN lo AND hi``,
which is the same index-range scan the reference's block iterator
does, but issued concurrently from many executors instead of serially
from one cursor.  Per-key probes become Catalyst filter pushdown: a
``.filter(col(pk) == k)`` on the returned DataFrame is pushed into the
remote WHERE clause (visible as ``PushedFilters`` in ``.explain``).

At 100 TB the database is the bottleneck, not Spark: size
``num_partitions`` to what the DB can serve concurrently (the
reference serializes everything through one cursor — strictly worse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_sql_table",
    "read_sql_query",
    "write_sql_table",
    "upsert_sql_table",
    "sql_graph_edges",
    "quiet_derby",
]


def _props(properties: dict | None, driver: str | None) -> dict:
    out = dict(properties or {})
    if driver:
        out["driver"] = driver
    return out


def _quote_ident(spark: SparkSession, url: str, name: str) -> str:
    """Quote an identifier the way Spark's JDBC dialect for ``url``
    would (Derby/Postgres fold unquoted names; Spark writes columns
    quoted, so hand-built probe SQL must quote them identically)."""
    try:
        return (
            spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
            .quoteIdentifier(name)
        )
    except Exception:  # pragma: no cover - non-py4j session
        return '"' + name.replace('"', '""') + '"'


def read_sql_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_col: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    predicates: list[str] | None = None,
    properties: dict | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Scan a SQL table into a DataFrame (S4, SQLTable.load /
    iteration, sqlgraph.py:911-924).

    Three strategies, mirroring the reference's scan modes:

    - plain: one connection, whole table (``SQLTable.load``,
      sqlgraph.py:911-924) — fine for dimension tables.
    - keyset-partitioned: pass ``partition_col`` (the primary key or
      any indexed numeric/date column); the table is read as
      ``num_partitions`` concurrent range scans.  Bounds are
      auto-discovered with one ``SELECT MIN(k), MAX(k)`` when not
      given — the same bounds probe the reference's iterator setup
      performs (sqlgraph.py:2156-2175), one tiny row to the driver.
    - predicate list: pass ``predicates`` (one WHERE fragment per
      partition) for non-numeric splits, e.g. hash buckets or region
      codes.
    """
    props = _props(properties, driver)
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_col is None:
        return spark.read.jdbc(url, table, properties=props)
    if lower_bound is None or upper_bound is None:
        k = _quote_ident(spark, url, partition_col)
        bounds = spark.read.jdbc(
            url,
            f"(SELECT MIN({k}) AS lo, MAX({k}) AS hi "
            f"FROM {table}) bounds_probe",
            properties=props,
        ).head()
        # positional: engines fold the unquoted lo/hi aliases differently
        lower_bound = bounds[0] if lower_bound is None else lower_bound
        upper_bound = bounds[1] if upper_bound is None else upper_bound
    if lower_bound is None or upper_bound is None:  # empty table
        return spark.read.jdbc(url, table, properties=props)
    return spark.read.jdbc(
        url,
        table,
        column=partition_col,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=props,
    )


def read_sql_query(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    properties: dict | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Push an arbitrary SQL query to the database and read the result
    (the reference's ``select()`` free-query path, sqlgraph.py:189-204).
    Prefer :func:`read_sql_table` + DataFrame ops — Catalyst pushes
    filters/projections down anyway and the plan stays optimizable."""
    return spark.read.jdbc(
        url, f"({query}) pushed_query", properties=_props(properties, driver)
    )


def write_sql_table(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "error",
    batchsize: int = 10_000,
    properties: dict | None = None,
    driver: str | None = None,
) -> None:
    """Row sink (S5): write a DataFrame to a SQL table, the bulk form
    of the reference's ``SQLTable.insert`` / ``__setitem__``
    (sqlgraph.py:944-975).  Each partition writes over its own
    connection with JDBC batch inserts of ``batchsize`` rows — the
    distributed analogue of the reference's one-row-at-a-time cursor
    insert.  Row *update*/MERGE is out of scope for v0 (reference
    sqlgraph.py:944-962); use mode='append' + dedup-on-read, or stage
    to a temp table and MERGE DB-side."""
    props = _props(properties, driver)
    props.setdefault("batchsize", str(batchsize))
    df.write.jdbc(url, table, mode=mode, properties=props)


def upsert_sql_table(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    *,
    properties: dict | None = None,
    driver: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """Row update/MERGE sink — the reference's ``SQLTable.__setitem__``
    delete-then-insert update path (sqlgraph.py:944-975), done the way
    a distributed engine must: executors bulk-stage the rows into a
    temp table (parallel JDBC batch inserts), then ONE driver-side
    ``MERGE`` statement upserts staging into the target and drops the
    staging table. The per-row network round-trips of the reference
    become a single set-based statement the database optimizes itself;
    Spark never needs row-level update support.

    Requires a target table that already exists and a database with
    ANSI MERGE (Derby 10.11+, Postgres 15+, MySQL via its upsert
    dialects would need the SQL adapted)."""
    import uuid

    spark = df.sparkSession
    staging = f"{table}_stage_{uuid.uuid4().hex[:8]}"
    write_sql_table(
        df, url, staging, mode="overwrite",
        properties=properties, driver=driver, batchsize=batchsize,
    )
    q = lambda c: _quote_ident(spark, url, c)  # noqa: E731
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    non_keys = [c for c in df.columns if c not in keys]
    set_sql = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
    cols = ", ".join(q(c) for c in df.columns)
    vals = ", ".join(f"s.{q(c)}" for c in df.columns)
    merge = (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        + (f"WHEN MATCHED THEN UPDATE SET {set_sql} " if non_keys else "")
        + f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
    jvm = spark._jvm
    jprops = jvm.java.util.Properties()
    for k_, v_ in (properties or {}).items():
        jprops.setProperty(k_, str(v_))
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(merge)
        finally:
            # drop staging even when MERGE fails (constraint violation,
            # engine without ANSI MERGE) — retries must not accumulate
            # stage tables
            try:
                stmt.executeUpdate(f"DROP TABLE {staging}")
            except Exception:
                pass
            stmt.close()
    finally:
        conn.close()


def sql_graph_edges(
    spark: SparkSession,
    url: str,
    table: str,
    src: str,
    dst: str,
    edge: str | None = None,
    *,
    partition_col: str | None = None,
    num_partitions: int = 8,
    properties: dict | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Load a SQL edge table as the (src, dst, edge) adjacency
    DataFrame the graph operators consume (``SQLGraph``,
    sqlgraph.py:1579-1688 maps an edge table to a graph-of-dicts; here
    it is simply a scan + projection, and joins against it are the
    graph traversal)."""
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if edge is not None:
        cols.append(F.col(edge).alias("edge"))
    return read_sql_table(
        spark,
        url,
        table,
        partition_col=partition_col,
        num_partitions=num_partitions,
        properties=properties,
        driver=driver,
    ).select(*cols)


def quiet_derby(spark: SparkSession, log_path: str) -> None:
    """Point embedded Derby's log at ``log_path`` instead of
    ``derby.log`` in the JVM working directory.  Must run before the
    Derby engine boots in this JVM; silently a no-op afterwards."""
    try:
        spark._jvm.System.setProperty("derby.stream.error.file", log_path)
    except Exception:  # pragma: no cover - non-py4j session
        pass
