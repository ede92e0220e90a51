"""Randomized motif-query validation: compare the join-chain compiler
against a 15-line brute-force subgraph-monomorphism enumerator on
small random graphs (inspired by the reference's backend-parity test
pattern, SURVEY.md §5 — but randomized, which the reference lacked).
"""

from itertools import permutations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pygr_spark.operators.motif import graph_from_dict, motif_query

edge_sets = st.sets(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=10,
)

QUERIES = [
    {0: {1: None}},                              # single edge
    {0: {1: None}, 1: {2: None}},                # path of 2
    {0: {1: None, 2: None}},                     # fan-out
    {0: {1: None}, 1: {2: None}, 2: {0: None}},  # triangle (cyclic)
    {0: {1: None}, 2: {1: None}},                # fan-in
]


def brute_force(data_edges, query):
    qnodes = sorted({n for a, ts in query.items() for n in [a, *ts]} | set(query))
    qedges = [(a, b) for a, ts in query.items() for b in (ts or {})]
    dnodes = sorted({n for e in data_edges for n in e})
    out = set()
    for perm in permutations(dnodes, len(qnodes)):
        m = dict(zip(qnodes, perm))
        if all((m[a], m[b]) in data_edges for a, b in qedges):
            out.add(tuple(m[q] for q in qnodes))
    return out


@given(data=edge_sets, qi=st.integers(0, len(QUERIES) - 1))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_motif_matches_bruteforce(spark, data, qi):
    query = QUERIES[qi]
    edges = graph_from_dict(
        spark, {a: {b: None for (x, b) in data if x == a} for (a, _) in data}
    )
    out = motif_query(edges, query)
    qnodes = sorted(int(c[2:]) for c in out.columns)
    got = {tuple(r[f"q_{q}"] for q in qnodes) for r in out.collect()}
    assert got == brute_force(data, query)
