"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the catalog in
pygr_spark/queries.py — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pygr_spark.queries import ORACLES, QUERIES

#: Catalog entries with no driver CORRECTNESS record through round 7
#: (the driver samples ~50/round; the judge's full 233-entry sweeps
#: cover these, but they are listed FIRST so any driver sampling
#: order derived from this dict reaches them before the long-green
#: rest — judge r7 item #7).
_NEVER_DRIVER_SAMPLED = [
    # round-8 additions (no driver record yet by definition)
    "q3_shipping_priority", "q4_late_shipment", "triplet_mining", "q18_large_orders", "snapshot_dedup",
    "ccnet_buckets",
    "coverage_indelcut", "media_real_decode", "split_prefix",
    "interval_algebra", "chunked_slice", "grouping_sets", "token_topk",
    "asof_join", "value_percentiles", "salted_join", "stream_dedup",
    "clean_corpus", "pack_documents", "full_outer_balance",
    "slice_edges", "lsh_ann_multiprobe", "hash_sample",
    "jdbc_roundtrip", "catalog_restart", "dedup_clusters",
    "stream_join", "tfidf_terms", "keyword_search", "vocab_coverage",
    "closest_interval", "catalog_path", "overlap_reciprocal",
    "stream_gap_merge", "minhash_near_dups", "simhash_near_dups",
    "lsh_ann", "ivf_ann", "approx_aggs", "stream_sessions",
    "pagerank", "connected_components", "decontaminate", "chunk_dedup",
    "repetition_stats", "train_split", "corpus_mix", "pii_scrub",
    "bm25_search", "quantize_emb", "stream_topk", "media_frames",
    "seed_homology", "liftover", "seq_n50", "interval_subtract",
    "countmin_topk", "event_funnel", "graph_bfs", "bucketed_join",
    "lm_surprise", "coverage_hist",
]


def _reordered(mapping):
    out = {k: mapping[k] for k in _NEVER_DRIVER_SAMPLED if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interval overlap join (J1, binned) on sf0.001."""
    return QUERIES["overlap_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _reordered(ORACLES)
