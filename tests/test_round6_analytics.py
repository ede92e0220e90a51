"""Round-6 additions: suffix array (prefix doubling), RRF fusion,
champion lists, largest-remainder mix allocation, exact OLS trend."""

from pyspark.sql import functions as F


def test_suffix_ranks_match_python_sort(spark):
    from pygr_spark.operators.fmindex import suffix_ranks

    seqs = {
        1: "banana",
        2: "acgtacgt",
        3: "aaaa",
        4: "mississippi",
        5: "a",
        6: "ab" * 40,      # repetitive: forces doubling past the q=8 seed
        7: "a" * 100,      # worst case: every 8-gram identical
    }
    df = spark.createDataFrame(list(seqs.items()), ["doc_id", "seq"])
    got = {
        (r.doc_id, r.pos): r.sa_rank
        for r in suffix_ranks(df, max_len=128).collect()
    }
    for d, s in seqs.items():
        order = sorted(range(1, len(s) + 1), key=lambda i: s[i - 1:])
        for rank, pos in enumerate(order, start=1):
            assert got[(d, pos)] == rank, (d, pos, s)


def test_suffix_ranks_without_checkpoint_same_result(spark):
    from pygr_spark.operators.fmindex import suffix_ranks

    df = spark.createDataFrame([(1, "abracadabra")], ["doc_id", "seq"])
    a = sorted(map(tuple, suffix_ranks(df, max_len=16, checkpoint=True).collect()))
    b = sorted(map(tuple, suffix_ranks(df, max_len=16, checkpoint=False).collect()))
    assert a == b


def test_rrf_fuse_combines_rank_positions(spark):
    from pygr_spark.operators.textstats import rrf_fuse

    # leg A ranks d1 > d2; leg B ranks d2 > d1 > d3 — d3 appears in
    # one leg only and must still be fused (missing leg contributes 0)
    a = spark.createDataFrame(
        [(1, 1, 101), (1, 2, 102)], ["query_id", "rank", "doc_id"]
    )
    b = spark.createDataFrame(
        [(1, 1, 102), (1, 2, 101), (1, 3, 103)], ["query_id", "rank", "doc_id"]
    )
    out = {r.doc_id: (r.rank, r.rrf_score) for r in rrf_fuse([a, b], k=10).collect()}
    t = lambda r: 1_000_000 // (60 + r)
    assert out[101][1] == t(1) + t(2)
    assert out[102][1] == t(2) + t(1)
    assert out[103][1] == t(3)
    # ties (101 vs 102 have equal scores) break by doc_id
    assert out[101][0] == 1 and out[102][0] == 2 and out[103][0] == 3


def test_champion_topk_excludes_non_champions(spark):
    from pygr_spark.operators.textstats import champion_topk

    # r=2 champions per term: doc 3 has the LOWEST tf for 'x' and must
    # be pruned even though it would score > 0 in exact retrieval
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x x z"), (3, "x q")],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame([(1, "x")], ["query_id", "term"])
    got = {r.doc_id for r in champion_topk(docs, queries, k=10, r=2).collect()}
    assert got == {1, 2}


def test_mix_allocation_sums_to_budget(spark, sf_dir):
    from pygr_spark.queries import q_mix_allocation

    out = q_mix_allocation(spark, sf_dir).toPandas()
    assert out.alloc.sum() == 10_000
    # every allocation is the floor quota or floor+1 (Hamilton property)
    total = out.n_docs.sum()
    base = (10_000 * out.n_docs) // total
    assert ((out.alloc - base).isin([0, 1])).all()


def test_ols_trend_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    from pygr_spark.queries import q_ols_trend, read_events

    out = q_ols_trend(spark, sf_dir).collect()
    ev = (
        read_events(spark, sf_dir)
        .select(
            "event_type",
            F.expr("CAST(ts_sec DIV 86400 AS BIGINT)").alias("day"),
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
        .toPandas()
    )
    d0 = ev.day.min()
    for r in out:
        g = ev[ev.event_type == r.event_type]
        slope = np.polyfit(g.day - d0, g.y, 1)[0]
        assert abs(r.slope_num / r.slope_den - slope) < 1e-6 * max(1, abs(slope))
