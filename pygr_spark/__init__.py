"""pygr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cjlee112/pygr (reference read-only at
/root/reference), re-expressed Spark-first.

Architecture (SURVEY.md §7.0): one library exposing
  (a) the full relational surface via DataFrames / Spark SQL,
  (b) a pygr-capability layer as composable DataFrame transforms
      (interval algebra, overlap join, gap-merge, sweep coverage,
      annotation projection, sequence functions, graph motif query),
  (c) LLM-pipeline operators (dedup, similarity search, text analysis,
      multimodal columns) designed for 100 TB scale,
  (d) Structured Streaming variants over event tables.

Everything is declarative DataFrame code: Catalyst plans it, Tungsten
executes it. There is no bespoke execution engine here by design — the
reference's NCList/Pyrex/shelve machinery (cnestedlist.pyx, intervaldb.c,
mapping.py) is replaced wholesale by Spark primitives.
"""

from pygr_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
