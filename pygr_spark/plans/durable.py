"""Durable worldbase catalog: resources + schema graph that survive a
restart (SURVEY.md §1.1 metabase row; VERDICT r1 "What's missing" #2).

The reference's metabase persists resources by pickling them into a
shelve file plus a schema graph of typed relations
(metabase.py:576-693 ``ShelveMetabase``; 384-553 ``MySQLMetabase``;
1529-1616 schema binding). Spark-first durable form:

- resource *data* → parquet directories under ``<root>/data/<name>``
  (columnar, splittable, statistics — what saveAsTable writes, minus
  the session-scoped metastore: Spark's default in-memory catalog
  forgets tables on JVM exit, so the layout must be self-describing
  on disk);
- resource *metadata* + the schema-edge table → one small JSON file
  ``<root>/catalog.json``, written atomically (rename), the shelve
  analog.  It is metadata about datasets, not data: bytes, not
  terabytes — a driver-side file is the right scale;
- SQL *views* are stored as their query text and re-evaluated lazily
  on access, like the reference's ``viewSQL`` (sqlgraph.py:2223-2290).

``DurableCatalog.open(spark, root)`` reconstructs the full dotted-name
namespace + schema graph in a brand-new session; every resource loads
lazily via ``spark.read.parquet`` so opening a catalog of 100 TB of
resources costs one small JSON read.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from pygr_spark.plans.catalog import Catalog, SchemaEdge

_META = "catalog.json"


def _safe(name: str) -> str:
    """Filesystem-safe, COLLISION-free resource directory name: the
    readable sanitized form plus a short digest of the exact name —
    'A.b/c' and 'A.b_c' would otherwise sanitize to the same directory
    and silently overwrite each other's data."""
    import hashlib

    readable = "".join(c if (c.isalnum() or c in "._-") else "_" for c in name)
    return f"{readable}-{hashlib.md5(name.encode()).hexdigest()[:8]}"


class DurableCatalog(Catalog):
    """A :class:`Catalog` whose registrations persist under ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        super().__init__()
        self.spark = spark
        self.root = root
        self._meta: dict = {"resources": {}, "edges": []}
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        self._load()

    # -- persistence --------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.root, _META)

    def _load(self) -> None:
        if not os.path.exists(self._meta_path()):
            return
        with open(self._meta_path()) as fh:
            self._meta = json.load(fh)
        for name, rec in self._meta["resources"].items():
            self._register(name, rec)
        for e in self._meta["edges"]:
            super().add_schema(SchemaEdge(**e))

    def _flush(self) -> None:
        """Atomic metadata write: temp file + rename, so a crashed
        writer never leaves a torn catalog (the shelve file's
        transactional role, metabase.py:628-640 commit/rollback)."""
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(self._meta, fh, indent=1)
        os.replace(tmp, self._meta_path())

    def _register(self, name: str, rec: dict) -> None:
        if rec["kind"] == "parquet":
            path = rec["path"]
            super().add_resource(
                name, lambda s=self.spark, p=path: s.read.parquet(p)
            )
        elif rec["kind"] == "view":
            super().add_view(name, rec["sql"], self.spark)
        elif rec["kind"] == "jdbc":
            from pygr_spark.sources.jdbc import read_sql_table

            super().add_resource(
                name,
                lambda s=self.spark, r=rec: read_sql_table(
                    s,
                    r["url"],
                    r["table"],
                    partition_col=r.get("partition_col"),
                    num_partitions=r.get("num_partitions", 8),
                ),
            )
        else:  # pragma: no cover - forward compat
            raise ValueError(f"unknown resource kind {rec['kind']!r}")

    # -- durable registration ----------------------------------------
    def save_resource(
        self,
        name: str,
        df: DataFrame,
        doc: str = "",
        partition_by: list[str] | None = None,
    ) -> None:
        """Persist a DataFrame as a named resource (worldbase
        ``__setattr__`` + pickle, metabase.py:1395-1463 — here a
        parquet write, so the stored form is splittable and pruned
        at scan time). ``partition_by`` lays out hive-style partition
        directories for partition pruning on the declared keys."""
        path = os.path.join(self.root, "data", _safe(name))
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        self._meta["resources"][name] = {
            "kind": "parquet",
            "path": path,
            "doc": doc,
            "partition_by": partition_by or [],
        }
        self._flush()
        self._register(name, self._meta["resources"][name])

    def save_view(self, name: str, sql: str, doc: str = "") -> None:
        """Persist a resource defined by SQL text, re-evaluated lazily
        at access (GraphView/MapView viewSQL, sqlgraph.py:2223-2290)."""
        self._meta["resources"][name] = {"kind": "view", "sql": sql, "doc": doc}
        self._flush()
        self._register(name, self._meta["resources"][name])

    def save_jdbc_table(
        self,
        name: str,
        url: str,
        table: str,
        doc: str = "",
        partition_col: str | None = None,
        num_partitions: int = 8,
    ) -> None:
        """Persist a *reference* to a live SQL table — the metabase's
        pickled ``SQLTableServerInfo`` (sqlgraph.py:2196-2221): data
        stays in the database, the catalog stores how to reach it.
        Reopening re-issues a partitioned JDBC scan lazily."""
        self._meta["resources"][name] = {
            "kind": "jdbc",
            "url": url,
            "table": table,
            "doc": doc,
            "partition_col": partition_col,
            "num_partitions": num_partitions,
        }
        self._flush()
        self._register(name, self._meta["resources"][name])

    def add_schema(self, edge: SchemaEdge) -> None:  # durable override
        super().add_schema(edge)
        rec = edge.__dict__
        self._meta["edges"] = [
            e
            for e in self._meta["edges"]
            if not (e["source"] == edge.source and e["attr"] == edge.attr)
        ] + [rec]
        self._flush()

    def doc(self, name: str) -> str:
        """Stored docstring for a resource (worldbase __doc__)."""
        return self._meta["resources"][name].get("doc", "")

    def edges_df(self) -> DataFrame:
        """The schema graph as a DataFrame — joinable metadata, the
        'schema_edges table' form."""
        return self.spark.createDataFrame(
            [SchemaEdge(**e).__dict__ for e in self._meta["edges"]]
            or [],
            schema="source string, attr string, target string, "
            "relation string, source_key string, target_key string",
        )

    # -- reopening ----------------------------------------------------
    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "DurableCatalog":
        """Reconstruct a catalog in a fresh session from disk alone."""
        return cls(spark, root)
