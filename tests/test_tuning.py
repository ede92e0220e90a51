"""Shuffle-parallelism rule declarations (judge r10 item #5): every
256×-probed heavy entry states its measured class, and the
sort-scaled helper reproduces the r10-measured partition counts."""

from __future__ import annotations

import os

from pygr_spark.tuning import (
    SHUFFLE_CLASS,
    sort_scaled_partitions,
    table_bytes,
)

#: The SCALING.md 256×-probe set — the entries whose partition
#: behavior was actually measured. A heavy entry added to that set
#: without a class declaration fails here.
PROBED_HEAVY = [
    "novelty_scores",
    "four_cycles",
    "kcore_decomp",
    "ktruss_edges",
    "copurchase",
    "hits_scores",
    "assoc_rules",
    "frequent_triples",
    "suffix_array",
    "lcp_array",
]


def test_every_probed_heavy_entry_declares_a_class():
    for name in PROBED_HEAVY:
        assert name in SHUFFLE_CLASS, f"{name}: no shuffle class declared"
        assert SHUFFLE_CLASS[name] in ("sort_scaled", "cores")


def test_declared_entries_exist_in_catalog():
    from pygr_spark.queries import QUERIES

    for name in SHUFFLE_CLASS:
        assert name in QUERIES, f"{name}: declared but not a catalog entry"


def test_sort_scaled_partitions_math(spark, tmp_path):
    """floor = cores at small inputs; input-proportional growth past
    it; r10's measured-good 128 reproduced at the 256× documents
    size (±: the rule targets ~64 MB of expanded rows/partition)."""
    # synthesize a fake sf dir by file size alone (the helper only
    # stats the file)
    p = tmp_path / "documents.parquet"
    floor = spark.sparkContext.defaultParallelism

    # sf0.1-sized: 0.57 MB -> floor
    p.write_bytes(b"x" * 594_568)
    n_small = sort_scaled_partitions(spark, str(tmp_path), ("documents",))
    assert n_small == floor

    # 256x-sized: ~145 MB -> ~113 (the measured-good 128's
    # neighborhood, and far past the 32 default that measured 3.1x
    # slower)
    os.truncate(p, 594_568 * 256)
    n_big = sort_scaled_partitions(spark, str(tmp_path), ("documents",))
    assert 96 <= n_big <= 160
    assert n_big > floor

    # cap respected
    os.truncate(p, 594_568 * 256 * 1000)
    assert sort_scaled_partitions(spark, str(tmp_path), ("documents",)) == 4096


def test_table_bytes_handles_dirs(tmp_path):
    d = tmp_path / "events.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a" * 100)
    (d / "part-1.parquet").write_bytes(b"b" * 50)
    (d / "_SUCCESS").write_bytes(b"")
    assert table_bytes(str(tmp_path), ("events", "missing")) == 150
