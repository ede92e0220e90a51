"""Semantic properties of the round-5 analytics batch: BWT
invertibility, de Bruijn edge conservation, PWM argmax optimality,
Gini bounds, lag-correlation moment identities."""

from pyspark.sql import functions as F

from pygr_spark.queries import (
    _t,
    q_bwt_transform,
    q_debruijn_degrees,
    q_lag_correlation,
    q_pwm_scan,
    q_spend_gini,
)


def _inverse_bwt_rows(bwt: str) -> list[str]:
    """O(n^2) textbook inverse (sort, prepend, repeat): returns the
    sorted rotation table; the original string is one of the rows."""
    rows = [""] * len(bwt)
    for _ in range(len(bwt)):
        rows = sorted(b + r for b, r in zip(bwt, rows))
    return rows


def test_bwt_is_invertible_up_to_rotation(spark, sf_dir):
    out = {r.doc_id: r.bwt for r in q_bwt_transform(spark, sf_dir).collect()}
    seqs = {
        r.doc_id: r.seq
        for r in _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(F.lower("text"), "[^acgt]", "").alias("seq"),
        )
        .filter(F.length("seq").between(2, 512))
        .collect()
    }
    assert set(out) == set(seqs)
    checked = 0
    for doc_id, bwt in sorted(out.items())[:5]:
        seq = seqs[doc_id]
        assert len(bwt) == len(seq)
        assert sorted(bwt) == sorted(seq)  # BWT is a permutation
        assert seq in _inverse_bwt_rows(bwt)
        checked += 1
    assert checked > 0


def test_debruijn_edges_conserve(spark, sf_dir):
    df = q_debruijn_degrees(spark, sf_dir).toPandas()
    # every edge leaves one node and enters one: totals match, and
    # imbalances cancel globally
    assert df.out_n.sum() == df.in_n.sum()
    assert df.imbalance.sum() == 0
    assert (df.node.str.len() == 3).all()
    assert len(df) <= 64


def test_pwm_best_beats_fixed_position(spark, sf_dir):
    """The reported best score must be >= the score at position 1
    (any fixed site is a lower bound on the argmax)."""
    from pygr_spark.queries import _PWM

    best = {r.doc_id: r.best_score for r in q_pwm_scan(spark, sf_dir).collect()}
    seqs = {
        r.doc_id: r.seq
        for r in _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(F.lower("text"), "[^acgt]", "").alias("seq"),
        )
        .filter(F.length("seq") >= 6)
        .collect()
    }
    for doc_id, seq in seqs.items():
        s1 = sum(_PWM[p][seq[p]] for p in range(6))
        assert best[doc_id] >= s1


def test_gini_bounds_and_den(spark, sf_dir):
    df = q_spend_gini(spark, sf_dir).toPandas()
    assert (df.gini_num >= 0).all()          # sorted ascending => nonneg
    assert (df.gini_num <= df.gini_den).all()  # G <= 1
    assert (df.gini_den == df.n_cust * df.sum_cents).all()


def test_lag_correlation_moments(spark, sf_dir):
    """Cauchy-Schwarz: num^2 <= den_x * den_y (|corr| <= 1), and the
    zero-lag row exists with the largest sample count window."""
    df = q_lag_correlation(spark, sf_dir).toPandas()
    assert set(df.lag) == set(range(-3, 4))
    assert ((df.num.astype("float64") ** 2)
            <= (df.den_x.astype("float64") * df.den_y.astype("float64")) * (1 + 1e-12)).all()


def test_auc_matches_bruteforce_pair_count(spark, sf_dir):
    """The distributed prefix-sum AUC must equal the O(n^2) textbook
    pair count on the same (label, margin) data."""
    from pygr_spark.queries import q_auc_metric, q_classifier_filter

    row = q_auc_metric(spark, sf_dir).collect()[0]
    sc = q_classifier_filter(spark, sf_dir).toPandas()
    pos = sc[sc.label.astype(int) < 5].margin_u.to_numpy()
    neg = sc[sc.label.astype(int) >= 5].margin_u.to_numpy()
    gt = sum((p > neg).sum() for p in pos)
    ties = sum((p == neg).sum() for p in pos)
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.auc_num2 == 2 * gt + ties
    assert row.auc_den2 == 2 * len(pos) * len(neg)
    auc = row.auc_num2 / row.auc_den2
    assert 0.0 <= auc <= 1.0


def test_eval_metrics_margins_consistent(spark, sf_dir):
    """Confusion margins must tie out: sum(support) == sum(n_pred)
    == #queries, and micro-precision == micro-recall (same tp total
    over the same denominator)."""
    from pygr_spark.queries import q_eval_metrics, q_knn_classify

    m = q_eval_metrics(spark, sf_dir).toPandas()
    n_queries = q_knn_classify(spark, sf_dir).count()
    assert m.support.sum() == n_queries
    assert m.n_pred.sum() == n_queries
    assert (m.tp + m.fn == m.support).all()
    assert (m.tp <= m.n_pred).all()


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: squared distances in the 8-dim projection
    correlate strongly with the 64-dim originals (scaled by d'/d)."""
    import numpy as np

    from pygr_spark.queries import _t, q_random_projection
    from pygr_spark.operators.similarity import quantized

    proj = q_random_projection(spark, sf_dir).toPandas()
    y = proj.pivot(index="vec_id", columns="j", values="y").to_numpy(
        dtype="float64"
    )
    q = np.array(
        _t(spark, sf_dir, "embeddings")
        .select(quantized(F.col("embedding")).alias("qv"))
        .orderBy("vec_id")
        .toPandas()
        .qv.tolist(),
        dtype="float64",
    )
    rng = np.random.RandomState(7)
    idx = rng.choice(len(q), size=(60, 2))
    d_orig = ((q[idx[:, 0]] - q[idx[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((y[idx[:, 0]] - y[idx[:, 1]]) ** 2).sum(axis=1)
    mask = d_orig > 0
    # the testdata embeddings are near-uniform random, so pairwise
    # distances CONCENTRATE (cv ~ 0.13) and a rank correlation would
    # only measure JL noise; the sharp testable property is the
    # Rademacher unbiasedness E[||Sx||^2] = d' * ||x||^2 — the mean
    # ratio over pairs must sit near 1 (measured 1.04)
    ratio = (d_proj[mask] / (8.0 * d_orig[mask])).mean()
    assert 0.8 < ratio < 1.25, f"JL energy ratio off: {ratio}"


def test_target_breadth_matches_bruteforce_union(spark, sf_dir):
    """Per-target covered bases must equal the Python set-union of
    clipped read intervals (bedtools-coverage ground truth)."""
    from collections import defaultdict

    from pygr_spark.queries import (
        _lineitem_ivals,
        _order_ivals,
        q_target_breadth,
    )

    out = {r.o_orderkey: r for r in q_target_breadth(spark, sf_dir).collect()}
    targets = _order_ivals(spark, sf_dir).toPandas()
    reads = _lineitem_ivals(spark, sf_dir).toPandas()
    by_id = defaultdict(list)
    for r in reads.itertuples():
        by_id[r.id].append((r.start, r.stop))
    for t in targets.itertuples():
        bases = set()
        n = 0
        for (rs, re) in by_id.get(t.id, ()):
            cs, ce = max(t.start, rs), min(t.stop, re)
            if ce > cs:
                n += 1
                bases.update(range(cs, ce))
        if n == 0:
            assert t.o_orderkey not in out
        else:
            row = out[t.o_orderkey]
            assert row.covered == len(bases)
            assert row.n_reads == n
            assert row.covered <= row.target_len


def test_weighted_median_matches_bruteforce(spark, sf_dir):
    """The window-based weighted median must equal the textbook
    scan: sort values, walk cumulative weight to half the total."""
    from pygr_spark.queries import _t, cents, q_weighted_median

    out = {r.l_returnflag: r for r in q_weighted_median(spark, sf_dir).collect()}
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("q"),
            cents(F.col("l_extendedprice")).alias("w"),
        )
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        tot = g.w.sum()
        cum = 0
        med = None
        for q, w in sorted(g.groupby("q").w.sum().items()):
            cum += w
            if 2 * cum >= tot:
                med = q
                break
        assert out[flag].wmedian_qty == med
        assert out[flag].total_weight == tot
        counts = g.groupby("q").size()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (out[flag].mode_qty, out[flag].mode_count) == best


def test_hll_registers_merge_like_partial_aggregates(spark):
    """HLL mergeability — the property Spark's partial aggregation
    exploits at scale: registers of a union stream equal the
    register-wise MAX of the parts' registers."""
    from pygr_spark.operators.sketches import hll_registers

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["item"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], ["item"])
    ra = {r.register: r.m_j for r in hll_registers(a.withColumn("g", F.lit(1)), ["g"]).collect()}
    rb = {r.register: r.m_j for r in hll_registers(b.withColumn("g", F.lit(1)), ["g"]).collect()}
    ru = {
        r.register: r.m_j
        for r in hll_registers(
            a.unionAll(b).withColumn("g", F.lit(1)), ["g"]
        ).collect()
    }
    merged = {
        j: max(ra.get(j, 0), rb.get(j, 0))
        for j in set(ra) | set(rb)
    }
    assert ru == merged


def test_interval_jaccard_identities(spark, sf_dir):
    """Set identities must hold exactly: intersect <= min(len_a,
    len_b), union = a + b - intersect >= max side, and the self
    Jaccard of A with A is 1 by construction of the merge."""
    from pygr_spark.queries import q_interval_jaccard

    df = q_interval_jaccard(spark, sf_dir).toPandas()
    assert (df.len_intersect <= df[["len_a", "len_b"]].min(axis=1)).all()
    assert (df.len_union == df.len_a + df.len_b - df.len_intersect).all()
    assert (df.len_union >= df[["len_a", "len_b"]].max(axis=1)).all()
    assert (df.len_intersect >= 0).all()


def test_ks_matches_bruteforce(spark, sf_dir):
    """The prefix-sum KS must equal the brute-force max CDF gap."""
    import numpy as np

    from pygr_spark.queries import _margin_scored, q_ks_statistic

    row = q_ks_statistic(spark, sf_dir).collect()[0]
    sc = _margin_scored(spark, sf_dir).toPandas()
    pos = np.sort(sc[sc.pos == 1].s.to_numpy())
    neg = np.sort(sc[sc.pos == 0].s.to_numpy())
    scores = np.unique(sc.s.to_numpy())
    best = 0
    for t in scores:
        gap = abs(
            int((pos <= t).sum()) * len(neg) - int((neg <= t).sum()) * len(pos)
        )
        best = max(best, gap)
    assert row.ks_num == best
    assert row.ks_den == len(pos) * len(neg)
    assert 0 <= row.ks_num <= row.ks_den


def test_gains_table_is_exact_ntile(spark, sf_dir):
    """The window-free interval-clip deciling must reproduce the SQL
    ntile exactly: sizes follow the q/q+1 split, totals tie out, and
    cum_pos is the running sum of n_pos."""
    from pygr_spark.queries import _margin_scored, q_gains_table

    df = q_gains_table(spark, sf_dir).toPandas().sort_values("decile")
    n = int(df.n_rows.sum())
    q, r = divmod(n, 10)
    expected_sizes = [q + 1 if d <= r else q for d in range(1, 11)]
    assert df.n_rows.tolist() == expected_sizes
    assert df.cum_pos.tolist() == df.n_pos.cumsum().tolist()
    sc = _margin_scored(spark, sf_dir).toPandas()
    assert df.n_pos.sum() == sc.pos.sum()
    # top decile must capture at least its prorated share (the model
    # margin is informative by construction)
    assert df.iloc[0].n_pos * 10 >= df.n_pos.sum()


def test_frequent_triples_apriori_consistency(spark, sf_dir):
    """Downward closure: every sub-pair of a frequent triple must be
    frequent with support >= the triple's support."""
    from pygr_spark.queries import _t, q_frequent_triples

    triples = q_frequent_triples(spark, sf_dir).collect()
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("b"), (F.col("l_partkey") % 500).alias("i")
    ).distinct().toPandas()
    baskets = li.groupby("b").i.apply(frozenset)
    from collections import Counter

    pair_sup = Counter()
    for bs in baskets:
        if len(bs) > 50:
            continue
        items = sorted(bs)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pair_sup[(items[x], items[y])] += 1
    for t in triples:
        a, b_, c = t.item_a, t.item_b, t.item_c
        assert a < b_ < c
        for p in [(a, b_), (a, c), (b_, c)]:
            assert pair_sup[p] >= t.support >= 3
        exact = sum(
            1 for bs in baskets if len(bs) <= 50 and {a, b_, c} <= bs
        )
        assert exact == t.support
    # COMPLETENESS: the trimmed count-then-filter plan must find every
    # frequent triple the brute force finds (the r6 plan change from
    # candidate materialization relies on anti-monotonicity — this is
    # the equivalence check the docstring promises)
    from itertools import combinations

    tri_sup = Counter()
    for bs in baskets:
        if len(bs) > 50:
            continue
        for t3 in combinations(sorted(bs), 3):
            tri_sup[t3] += 1
    expected = {t for t, n in tri_sup.items() if n >= 3}
    assert {(t.item_a, t.item_b, t.item_c) for t in triples} == expected


def test_cusum_matches_bruteforce(spark, sf_dir):
    """The windowed CUSUM argmax must equal a per-type Python scan."""
    from pygr_spark.queries import q_cusum_changepoint, read_events, cents

    out = {r.event_type: r for r in q_cusum_changepoint(spark, sf_dir).collect()}
    ev = (
        read_events(spark, sf_dir)
        .select("event_type", "event_id", "ts_sec", cents(F.col("value")).alias("c"))
        .toPandas()
        .sort_values(["event_type", "ts_sec", "event_id"])
    )
    for typ, g in ev.groupby("event_type"):
        c = g.c.to_numpy()
        n = len(c)
        s = c.cumsum()
        dev = abs(n * s - (1 + __import__("numpy").arange(n)) * s[-1])
        best_dev = int(dev.max())
        best_k = int(dev.argmax()) + 1
        assert out[typ].cusum_dev == best_dev
        assert out[typ].cp_k == best_k


def test_overlap_layout_finds_known_overlaps(spark):
    """Constructed reads with known suffix-prefix overlaps: the
    entry's core (anchor join + verify) must report exactly them."""
    from pygr_spark.queries import q_overlap_layout

    # fake the documents table via a temp view matched by _t? — no:
    # exercise the same logic inline on constructed sequences
    from pyspark.sql import functions as F

    k, max_l = 12, 64
    s1 = "acgtacgggtcatgca" + "ttagcacgtagc"        # ends with X (12)
    s2 = "ttagcacgtagc" + "gggcatatcgatcg"          # starts with X
    s3 = "aaaaccccggggtttt"                          # no overlaps
    docs = spark.createDataFrame(
        [(1, s1), (2, s2), (3, s3)], ["doc_id", "text"]
    )
    # reuse the query body by monkey-building the same pipeline
    import pygr_spark.queries as Q

    orig = Q._t
    try:
        Q._t = lambda sp, sf, name: docs
        out = {(r.id_a, r.id_b): r.max_overlap
               for r in q_overlap_layout(spark, "unused").collect()}
    finally:
        Q._t = orig
    assert out[(1, 2)] == 12
    assert (2, 1) not in out
    assert all(a != 3 and b != 3 for (a, b) in out)
