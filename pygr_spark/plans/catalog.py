"""worldbase analog: a dotted-name resource namespace + schema graph
that auto-wires joins (SURVEY.md §1.1 worldbase/metabase row).

Reference: worldbase resolves ``Bio.Seq.Swissprot`` to a pickled
resource (metabase.py:1395-1463) and keeps a schema graph of typed
relations (one:one … many:many, metabase.py:1529-1616) that binds
attributes like ``annotation.sequence`` on load (ItemDescriptor,
metabase.py:40-93). Spark-side: resources are named DataFrames (or
loaders) in a registry; the schema graph is a plain DataFrame-able
edge list; attribute binding becomes ``auto_join`` which looks up the
declared relation and emits the correct equi-join.

Persistent deployments back this with the real Spark catalog
(``saveAsTable`` / ``spark.table``); this in-memory registry keeps the
same dotted-name surface for library use and tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class SchemaEdge:
    """A typed relation: source.attr resolves to target via keys."""

    source: str
    attr: str
    target: str
    relation: str  # one:one | one:many | many:one | many:many
    source_key: str
    target_key: str


@dataclass
class Catalog:
    """Dotted-name registry of resources + schema relations."""

    _resources: dict[str, Callable[[], DataFrame]] = field(default_factory=dict)
    _edges: dict[tuple[str, str], SchemaEdge] = field(default_factory=dict)

    # -- resources ---------------------------------------------------
    def add_resource(
        self, name: str, df_or_loader: DataFrame | Callable[[], DataFrame]
    ) -> None:
        if isinstance(df_or_loader, DataFrame):
            self._resources[name] = lambda df=df_or_loader: df
        else:
            self._resources[name] = df_or_loader

    def __call__(self, name: str) -> DataFrame:
        """worldbase.Path.Name() → the resource DataFrame."""
        try:
            return self._resources[name]()
        except KeyError:
            raise KeyError(f"unknown resource {name!r}") from None

    def dir(self, prefix: str = "") -> list[str]:
        """Namespace listing (worldbase dir() analog)."""
        return sorted(n for n in self._resources if n.startswith(prefix))

    # -- schema graph ------------------------------------------------
    def add_schema(self, edge: SchemaEdge) -> None:
        self._edges[(edge.source, edge.attr)] = edge

    def schema_edges(self) -> list[SchemaEdge]:
        return list(self._edges.values())

    def add_view(self, name: str, sql: str, spark=None) -> None:
        """MapView/GraphView analog (reference sqlgraph.py:2223-2290):
        a resource defined by an arbitrary SQL query over registered
        temp views — evaluated lazily at access, like viewSQL."""
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        self._resources[name] = lambda s=spark, q=sql: s.sql(q)

    def auto_join(self, source: str, attr: str) -> DataFrame:
        """Resolve source.attr through the schema graph: emits
        source ⋈ target on the declared keys — the relational form of
        worldbase's bound attributes (ItemDescriptor)."""
        try:
            e = self._edges[(source, attr)]
        except KeyError:
            raise KeyError(f"no schema relation {source}.{attr}") from None
        src, dst = self(e.source), self(e.target)
        joined = src.join(dst, src[e.source_key] == dst[e.target_key])
        if e.relation in ("one:one", "many:one"):
            return joined  # uniqueness is the writer's contract
        return joined

    def auto_join_path(self, source: str, attrs: list[str]) -> DataFrame:
        """Chained bound attributes — the reference's
        ``item.nation.region`` attribute walks (ItemDescriptor chains,
        metabase.py:40-93 applied transitively): each attr hops one
        declared schema edge, emitting one equi-join per hop. The
        whole chain is ONE lazy plan, so Catalyst reorders/broadcasts
        the dimension hops like any star join."""
        try:
            e0 = self._edges[(source, attrs[0])]
        except KeyError:
            raise KeyError(f"no schema relation {source}.{attrs[0]}") from None
        out = self.auto_join(source, attrs[0])
        cur = e0.target
        for attr in attrs[1:]:
            try:
                e = self._edges[(cur, attr)]
            except KeyError:
                raise KeyError(f"no schema relation {cur}.{attr}") from None
            dst = self(e.target)
            out = out.join(dst, out[e.source_key] == dst[e.target_key])
            cur = e.target
        return out
