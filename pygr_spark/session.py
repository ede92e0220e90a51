"""SparkSession factory + table loading helpers.

Local-mode defaults are tuned for the driver harness (local[32],
single JVM); on a real cluster every setting here is still sane —
AQE handles skew/coalescing at runtime, shuffle partitions are a
floor that AQE coalesces, and Arrow is required for the Pandas-UDF
slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Spark's bundled RocksDB state-store provider — the production
#: choice for large streaming state (spills to disk, incremental
#: checkpoint uploads) vs the default in-memory HDFS-backed provider
#: that holds every key's state on-heap.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "pygr_spark",
    cpus: int | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``rocksdb_state`` (or env ``PYGR_SPARK_ROCKSDB=1``) selects the
    RocksDB state-store provider for streaming queries — parity with
    production clusters where stateful-operator state exceeds executor
    heap. The provider is pinned per-query at first checkpoint, so
    flipping it only affects queries started afterwards.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if rocksdb_state is None:
        rocksdb_state = os.environ.get("PYGR_SPARK_ROCKSDB", "") == "1"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PYGR_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long (ns since epoch)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the generated-class cache defaults to 100 entries; a full
        # catalog pass compiles thousands of codegen stages, so by the
        # time the bench's second (min-of-2) pass replays a query its
        # classes are evicted and every stage recompiles — sizing the
        # cache to the catalog makes repeat plans actually warm
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = DRIVER_TABLES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load driver parquet tables; optionally register temp views.

    Reads are lazy; Catalyst pushes filters/projections into the
    parquet scan, so loading "all" tables costs nothing until used.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
