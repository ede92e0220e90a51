from pygr_spark.operators.graphs import (
    connected_components,
    degrees,
    foreign_key_graph,
    invert,
    pagerank,
    splice_graph,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_invert(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    got = sorted((r.src, r.dst) for r in invert(e).collect())
    assert got == [(2, 1), (3, 2)]


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    d = {r.node: (r.out_degree, r.in_degree) for r in degrees(e).collect()}
    assert d == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_foreign_key_graph(spark):
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    tgt = spark.createDataFrame([(10, 1), (11, 1)], ["row_id", "fk"])
    out = foreign_key_graph(src, tgt, "id", "fk")
    assert out.count() == 2
    left = foreign_key_graph(src, tgt, "id", "fk", how="left")
    assert left.count() == 3  # source 2 kept with NULL target


def test_pagerank_star(spark):
    # everyone points at node 0 → node 0 has the max rank
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    ranks = {r.node: r.rank for r in pagerank(e, n_iter=8).collect()}
    assert max(ranks, key=ranks.get) == 0
    assert abs(ranks[0] - (0.15 + 0.85 * 3 * 0.15)) < 1e-9
    assert all(abs(ranks[n] - 0.15) < 1e-9 for n in (1, 2, 3))


def test_connected_components(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (12, 12)])
    cc = {r.node: r.component for r in connected_components(e).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[12] == 12
    assert cc[1] != cc[10]


def test_connected_components_long_chain(spark):
    """Pointer jumping must converge a path graph whose diameter far
    exceeds max_iter: distance covered doubles per round (O(log d)),
    where plain neighbor propagation would silently return unconverged
    labels after the cap."""
    from pyspark.sql import functions as F

    chain = spark.range(499).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(chain, max_iter=12)
    comps = [r.component for r in out.collect()]
    assert len(comps) == 500
    assert set(comps) == {0}  # one component, labeled by the min node


def test_splice_graph(spark):
    exons = spark.createDataFrame(
        [
            ("e1", "c1", 0, 100),
            ("e2", "c1", 200, 300),
            ("e3", "c1", 200, 400),   # alt3 with e2? shares start 200 (alt5)
        ],
        ["exon_id", "cluster_id", "genomic_start", "genomic_end"],
    )
    splices = spark.createDataFrame(
        [("s1", "c1", 100, 200)],
        ["splice_id", "cluster_id", "ver_gen_start", "ver_gen_end"],
    )
    g = splice_graph(exons, splices)
    edges = sorted(
        (r.from_exon, r.splice_id, r.to_exon) for r in g["splice_edges"].collect()
    )
    assert edges == [("e1", "s1", "e2"), ("e1", "s1", "e3")]
    alt5 = [(r.exon_a, r.exon_b) for r in g["alt5"].collect()]
    assert alt5 == [("e2", "e3")]  # shared genomic_start
    assert g["alt3"].count() == 0


def test_bfs_levels_golden(spark):
    from pygr_spark.operators.graphs import bfs_levels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (4, 1)], ["src", "dst"]
    )
    srcs = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.level for r in bfs_levels(edges, srcs).collect()}
    # cycle back to 1 does not lower its level; 10/11 unreachable
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_levels_max_depth_truncates(spark):
    from pygr_spark.operators.graphs import bfs_levels

    chain = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.level for r in bfs_levels(chain, srcs, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_pagerank_exact_broadcast_knob_parity(spark):
    """broadcast_ranks=True (the cluster shape: node vector broadcast,
    edges never re-shuffled) must be bit-identical to the default
    shuffle form — the arithmetic is order-independent integer math,
    so only the exchange strategy may differ."""
    from pygr_spark.operators.graphs import pagerank_exact

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12)
         if a != b and (a * 7 + b) % 3 == 0],
        "src long, dst long",
    )
    base = {
        (r.node, r.rank)
        for r in pagerank_exact(edges, n_iter=4).collect()
    }
    bc = {
        (r.node, r.rank)
        for r in pagerank_exact(edges, n_iter=4, broadcast_ranks=True).collect()
    }
    assert base == bc and base
