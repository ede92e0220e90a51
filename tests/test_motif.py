"""Motif query goldens — the six implementation-independent fixtures
from the reference's tests/graph_test.py:88-159, verbatim."""

from pygr_spark.operators.motif import graph_from_dict, motif_query


def run(spark, datagraph, querygraph, filters=None):
    edges = graph_from_dict(spark, datagraph)
    out = motif_query(edges, querygraph, filters=filters)
    qnodes = sorted(int(c[2:]) for c in out.columns)
    rows = out.collect()
    return sorted(
        tuple((q, r[f"q_{q}"]) for q in qnodes) for r in rows
    )


def expect(result):
    return sorted(tuple(sorted(d.items())) for d in result)


def test_basic_query(spark):
    # graph_test.py:89-100
    datagraph = {0: {1: None, 2: None, 3: None}, 1: {2: None},
                 3: {4: None, 5: None}, 4: {6: None}, 5: {6: None}, 2: {}, 6: {}}
    querygraph = {0: {1: None, 2: None, 3: None}, 3: {4: None}, 1: {}, 2: {}, 4: {}}
    result = [{0: 0, 1: 1, 2: 2, 3: 3, 4: 4},
              {0: 0, 1: 1, 2: 2, 3: 3, 4: 5},
              {0: 0, 1: 2, 2: 1, 3: 3, 4: 4},
              {0: 0, 1: 2, 2: 1, 3: 3, 4: 5}]
    assert run(spark, datagraph, querygraph) == expect(result)


def test_cyclic_query_cyclic_data(spark):
    # graph_test.py:114-121
    datagraph = {1: {2: None}, 2: {3: None}, 3: {4: None}, 4: {5: None},
                 5: {2: None}}
    querygraph = {0: {1: None}, 1: {2: None}, 2: {4: None}, 3: {1: None},
                  4: {3: None}}
    result = [{0: 1, 1: 2, 2: 3, 3: 5, 4: 4}]
    assert run(spark, datagraph, querygraph) == expect(result)


def test_cyclic_query_acyclic_data(spark):
    # graph_test.py:123-130
    datagraph = {0: {1: None}, 1: {3: None}, 5: {3: None}, 4: {5: None},
                 2: {4: None, 1: None}, 3: {}}
    querygraph = {0: {1: None}, 1: {3: None}, 3: {5: None}, 5: {4: None},
                  4: {2: None}, 2: {1: None}}
    assert run(spark, datagraph, querygraph) == []


def test_symmetric_query(spark):
    # graph_test.py:132-139
    datagraph = {1: {2: None}, 2: {3: None, 4: None}, 5: {2: None}, 3: {}, 4: {}}
    querygraph = {0: {1: None}, 1: {2: None}, 2: {}}
    result = [{0: 1, 1: 2, 2: 3}, {0: 1, 1: 2, 2: 4},
              {0: 5, 1: 2, 2: 3}, {0: 5, 1: 2, 2: 4}]
    assert run(spark, datagraph, querygraph) == expect(result)


def test_filtered_query(spark):
    # graph_test.py:141-148 — edge filter: toNode == 3
    datagraph = {0: {1: None, 2: None, 3: None}, 1: {2: None, 3: None},
                 3: {4: None}}
    querygraph = {0: {1: None}, 1: {}}
    filters = {(0, 1): lambda s, d, e: d == 3}
    result = [{0: 0, 1: 3}, {0: 1, 1: 3}]
    assert run(spark, datagraph, querygraph, filters=filters) == expect(result)


def test_callable_generator_query(spark):
    """CallableGQI flavor (graphquery.py:636-645): the filtered
    fixture (graph_test.py:141-148) expressed as a per-edge candidate
    GENERATOR — a callable supplies the (src, dst) candidates for
    query edge (0, 1) instead of the data edge table. Same solutions
    as the filter form."""
    datagraph = {0: {1: None, 2: None, 3: None}, 1: {2: None, 3: None},
                 3: {4: None}}
    querygraph = {0: {1: None}, 1: {}}
    edges = graph_from_dict(spark, datagraph)

    def gen_to_node_3():
        return edges.filter("dst = 3")

    out = motif_query(edges, querygraph, generators={(0, 1): gen_to_node_3})
    rows = sorted(tuple((q, r[f"q_{q}"]) for q in (0, 1)) for r in out.collect())
    assert rows == expect([{0: 0, 1: 3}, {0: 1, 1: 3}])


def test_callable_container_generator(spark):
    """CallableContainerGQI (graphquery.py:648-658): generator with no
    edge info — a bare DataFrame of candidate pairs (here: synthesized
    pairs NOT present in the data graph for one query edge, showing
    the generator fully replaces the edge table for that leg)."""
    datagraph = {1: {2: None}, 2: {3: None, 4: None}, 5: {2: None},
                 3: {}, 4: {}}
    querygraph = {0: {1: None}, 1: {2: None}, 2: {}}
    edges = graph_from_dict(spark, datagraph)
    # candidates for edge (1,2): only allow the 2->4 hop
    only_24 = spark.createDataFrame([(2, 4)], "src long, dst long")
    out = motif_query(edges, querygraph, generators={(1, 2): only_24})
    rows = sorted(tuple((q, r[f"q_{q}"]) for q in (0, 1, 2)) for r in out.collect())
    assert rows == expect([{0: 1, 1: 2, 2: 4}, {0: 5, 1: 2, 2: 4}])


def test_headless_query(spark):
    # graph_test.py:150-159 — cyclic query with no start node
    datagraph = {0: {1: None}, 1: {2: None}, 2: {3: None}, 3: {4: None},
                 4: {1: None}}
    querygraph = {0: {1: None}, 1: {2: None}, 2: {3: None}, 3: {0: None}}
    result = [{0: 1, 1: 2, 2: 3, 3: 4},
              {0: 2, 1: 3, 2: 4, 3: 1},
              {0: 3, 1: 4, 2: 1, 3: 2},
              {0: 4, 1: 1, 2: 2, 3: 3}]
    assert run(spark, datagraph, querygraph) == expect(result)
