"""Round-6 continuation entries: Welch t-test, Benford audit,
Kaplan-Meier risk table, exact integer EWMA, HITS, reciprocal best
hits, total-variation language divergence, quantized Zipf fit,
grid-bucketed spatial kNN, k-core peeling, multi-feature OLS.

Each test recomputes the statistic brute-force in Python/NumPy from
the raw parquet and compares against the catalog entry — the DuckDB
oracle parity is covered separately by scripts/sweep.py."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _events_pdf(spark, sf_dir):
    from pygr_spark.queries import read_events

    return (
        read_events(spark, sf_dir)
        .select("user_id", "event_id", "event_type", "ts", "value")
        .toPandas()
    )


def test_welch_ttest_matches_numpy(spark, sf_dir):
    from pygr_spark.queries import q_welch_ttest

    out = {r.event_type: r for r in q_welch_ttest(spark, sf_dir).collect()}
    ev = _events_pdf(spark, sf_dir)
    ev["c"] = np.round(ev.value * 100).astype("int64")
    for et, r in out.items():
        a = ev.loc[ev.event_type == et, "c"].to_numpy(dtype=np.float64)
        b = ev.loc[ev.event_type != et, "c"].to_numpy(dtype=np.float64)
        t = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert abs(r.t_stat - t) < 1e-4, (et, r.t_stat, t)
        assert r.n1 == len(a) and r.n2 == len(b)
        # exact rational mean-difference carrier
        assert r.md_num / r.md_den == (
            pytest_approx := a.mean() - b.mean()
        ) or abs(r.md_num / r.md_den - pytest_approx) < 1e-9


def test_benford_shares_sum_and_match_counts(spark, sf_dir):
    from pygr_spark.queries import q_benford_digits

    rows = q_benford_digits(spark, sf_dir).collect()
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.expr("CAST(round(o_totalprice*100,0) AS BIGINT)").alias("c"))
        .toPandas()
    )
    digits = o.c.astype(str).str[0].astype(int)
    counts = digits.value_counts().to_dict()
    total = len(digits)
    assert {r.digit for r in rows} <= set(range(1, 10))
    for r in rows:
        assert r.n == counts[r.digit]
        assert r.obs_ppm == r.n * 1_000_000 // total
    # ppm shares sum to ~1e6 (integer floor slack < 9)
    s = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000


def test_survival_table_brute_force(spark, sf_dir):
    from pygr_spark.queries import q_survival_table

    got = {
        (r.cohort, r.t): (r.n_risk, r.d_events, r.c_censored, r.cum_events)
        for r in q_survival_table(spark, sf_dir).collect()
    }
    ev = _events_pdf(spark, sf_dir)
    ev["day"] = ev.ts // (86400 * 10**9)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    per = ev.groupby("user_id").agg(
        first_day=("day", "min"),
        last_day=("day", "max"),
        cohort=("event_type", "first"),
    )
    gmax = per.last_day.max()
    per["t"] = per.last_day - per.first_day
    per["churn"] = (per.last_day <= gmax - 7).astype(int)
    for (cohort, t), (n_risk, d, c, cum) in got.items():
        grp = per[per.cohort == cohort]
        assert n_risk == int((grp.t >= t).sum())
        assert d == int(grp[grp.t == t].churn.sum())
        assert c == int((grp.t == t).sum() - d)
        assert cum == int(grp[grp.t <= t].churn.sum())
    # every (cohort, t) with users present is emitted
    assert set(got) == set(map(tuple, per.groupby(["cohort", "t"]).size().index))


def test_ewma_exact_rational_single_user(spark, sf_dir):
    from pygr_spark.queries import q_ewma_smooth

    out = q_ewma_smooth(spark, sf_dir)
    uid = out.select("user_id").first().user_id
    rows = sorted(
        out.filter(F.col("user_id") == uid).collect(), key=lambda r: r.rn
    )
    cs = [r.c for r in rows]
    for idx, r in enumerate(rows):
        num = den = 0
        for i in range(16):
            if idx - i < 0:
                break
            w = 1 << (15 - i)
            num += cs[idx - i] * w
            den += w
        assert (r.ewma_num, r.ewma_den) == (num, den), r.rn


def test_hits_matches_numpy_power_iteration(spark, sf_dir):
    from pygr_spark.queries import q_hits_scores

    rows = q_hits_scores(spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    e = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    cs = sorted(e.o_custkey.unique())
    ss = sorted(e.l_suppkey.unique())
    ci = {c: i for i, c in enumerate(cs)}
    si = {s: i for i, s in enumerate(ss)}
    m = np.zeros((len(cs), len(ss)), dtype=np.int64)
    for c, s in e.itertuples(index=False):
        m[ci[c], si[s]] = 1
    hub = np.ones(len(cs), dtype=np.int64)
    for _ in range(3):
        auth = m.T @ hub
        hub = m @ auth
    a1 = m.sum(axis=0)
    order = sorted(range(len(ss)), key=lambda i: (-auth[i], ss[i]))[:20]
    expect = [(ss[i], int(a1[i]), int(auth[i])) for i in order]
    got = [(r.suppkey, r.a1, r.a3) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == expect


def test_reciprocal_best_hits_mutual_and_correct(spark, sf_dir):
    from pygr_spark.queries import q_reciprocal_best_hits

    rows = q_reciprocal_best_hits(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    q = np.round(
        np.stack(emb.embedding.map(np.asarray)).astype(np.float64) * 1e6
    ).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    # side A = the exact 200 lowest md5(vec_id||'a') — the entry's
    # fixed-size oracle-reproducible probe set (judge r9)
    import hashlib

    order = sorted(
        ids.tolist(), key=lambda v: (hashlib.md5(f"{v}a".encode()).hexdigest(), v)
    )
    a_set = set(order[:200])
    a_mask = np.array([v in a_set for v in ids])
    sims = (q[a_mask] @ q[~a_mask].T) / (
        np.linalg.norm(q[a_mask], axis=1)[:, None]
        * np.linalg.norm(q[~a_mask], axis=1)[None, :]
    )
    a_ids, b_ids = ids[a_mask], ids[~a_mask]
    # tie-break by id: argmax on (-sim, id) lexsort
    best_ab = {
        a_ids[i]: b_ids[np.lexsort((b_ids, -sims[i]))[0]]
        for i in range(len(a_ids))
    }
    best_ba = {
        b_ids[j]: a_ids[np.lexsort((a_ids, -sims[:, j]))[0]]
        for j in range(len(b_ids))
    }
    expect = {
        (a, b)
        for a, b in best_ab.items()
        if best_ba[b] == a
    }
    assert {(r.a_id, r.b_id) for r in rows} == expect
    assert len(rows) > 0


def test_lang_divergence_brute_force(spark, sf_dir):
    from collections import Counter

    from pygr_spark.queries import q_lang_divergence

    rows = {r.lang: r for r in q_lang_divergence(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    counters = {}
    for lang, grp in docs.groupby("lang"):
        c = Counter()
        for t in grp.text:
            c.update(t.strip().lower().split())
        counters[lang] = c
    en = counters["en"]
    n_en = sum(en.values())
    for lang, r in rows.items():
        cq = counters[lang]
        n_q = sum(cq.values())
        tv_num = sum(
            abs(en.get(t, 0) * n_q - cq.get(t, 0) * n_en)
            for t in set(en) | set(cq)
        )
        assert (r.tv_num, r.tv_den) == (tv_num, 2 * n_en * n_q)
        assert 0 <= r.tv_num / r.tv_den <= 1


def test_zipf_slope_is_negative_and_matches_numpy(spark, sf_dir):
    from collections import Counter

    from pygr_spark.queries import q_zipf_fit

    rows = {r.lang: r for r in q_zipf_fit(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    for lang, r in rows.items():
        c = Counter()
        for t in docs[docs.lang == lang].text:
            c.update(t.strip().lower().split())
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
        x = np.array([int(i + 1).bit_length() - 1 for i in range(len(ranked))])
        y = np.array([int(f).bit_length() - 1 for _, f in ranked])
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        den = n * (x * x).sum() - x.sum() ** 2
        assert (r.slope_num, r.slope_den) == (num, den)
        assert r.slope_num * r.slope_den < 0  # slope is negative


def test_spatial_grid_knn_matches_quadratic(spark, sf_dir):
    import hashlib

    from pygr_spark.queries import q_spatial_grid_knn

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = {r.suppkey: (r.custkey, r.dist2)
            for r in q_spatial_grid_knn(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").toPandas()
    cpts = {
        k: (h60(f"x:{k}") % 100000, h60(f"y:{k}") % 100000)
        for k in cust.c_custkey
    }
    expect = {}
    for s in supp.s_suppkey:
        sx, sy = h60(f"x:{s}") % 100000, h60(f"y:{s}") % 100000
        best = None
        for k, (cx, cy) in cpts.items():
            if abs(sx - cx) <= 2000 and abs(sy - cy) <= 2000:
                d2 = (sx - cx) ** 2 + (sy - cy) ** 2
                if best is None or (d2, k) < best:
                    best = (d2, k)
        if best is not None:
            expect[s] = (best[1], best[0])
    assert rows == expect
    assert len(rows) > 0


def test_kcore_reaches_fixpoint_and_matches_peeling(spark, sf_dir):
    from collections import defaultdict

    from pygr_spark.queries import _KCORE_K, q_kcore_decomp

    got = {r.part: r.core_degree for r in q_kcore_decomp(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    basket = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = basket.groupby("l_orderkey").size()
    basket = basket[basket.l_orderkey.map(sizes) <= 50]
    pair_counts = defaultdict(int)
    for _, grp in basket.groupby("l_orderkey"):
        items = sorted(grp.l_partkey)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                pair_counts[(items[i], items[j])] += 1
    adj = defaultdict(set)
    for (u, v), c in pair_counts.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    # peel to FIXPOINT (not bounded rounds) — asserts the catalog's
    # R=8 bound actually converges at test scale
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < _KCORE_K:
                for v in adj.pop(u):
                    adj[v].discard(u)
                changed = True
    expect = {u: len(vs) for u, vs in adj.items() if vs}
    assert got == expect


def test_multi_ols_matches_numpy_lstsq(spark, sf_dir):
    from pygr_spark.queries import q_multi_ols

    r = q_multi_ols(spark, sf_dir).first()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    t = (
        (o.o_orderdate.dt.tz_localize(None) - pd.Timestamp("1995-01-01"))
        .dt.days.to_numpy()
    )
    usd = np.round(o.o_totalprice).astype("int64")
    daily = pd.DataFrame({"t": t, "y": usd}).groupby("t").y.sum()
    x = daily.index.to_numpy(dtype=np.float64)
    a = np.stack([np.ones_like(x), x, x * x], axis=1)
    coef, *_ = np.linalg.lstsq(a, daily.to_numpy(dtype=np.float64), rcond=None)
    assert r.n == len(x)
    assert abs(r.coef_a - coef[0]) < max(1e-3, abs(coef[0]) * 1e-5)
    assert abs(r.coef_b - coef[1]) < max(1e-4, abs(coef[1]) * 1e-5)
    assert abs(r.coef_c - coef[2]) < max(1e-6, abs(coef[2]) * 1e-5)


def test_seasonal_index_brute_force(spark, sf_dir):
    from pygr_spark.queries import q_seasonal_index

    got = {
        (r.event_type, r.dow): (r.n_d, r.idx_num, r.idx_den)
        for r in q_seasonal_index(spark, sf_dir).collect()
    }
    ev = _events_pdf(spark, sf_dir)
    ev["c"] = np.round(ev.value * 100).astype("int64")
    ev["dow"] = (ev.ts // (86400 * 10**9) + 4) % 7
    for et, grp in ev.groupby("event_type"):
        n_t, s_t = len(grp), int(grp.c.sum())
        for dow, g2 in grp.groupby("dow"):
            n_d, s_d = len(g2), int(g2.c.sum())
            assert got[(et, dow)] == (n_d, s_d * n_t, n_d * s_t)
    # index averages to 1 when weighted by n_d: Σ n_d·(num/den) = n_t
    # per type — spot-check numerically
    for et in ev.event_type.unique():
        rows = [(k[1], v) for k, v in got.items() if k[0] == et]
        s = sum(n * num / den for _, (n, num, den) in rows)
        assert abs(s - sum(n for _, (n, _, _) in rows)) < 1e-6


def test_isotonic_fit_matches_sequential_pava(spark, sf_dir):
    from pygr_spark.queries import q_isotonic_fit

    rows = sorted(
        q_isotonic_fit(spark, sf_dir).collect(), key=lambda r: r.bin
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    cust["bin"] = (
        np.round(cust.c_acctbal * 100).astype("int64") + 100000
    ) // 22000
    ocnt = orders.groupby("o_custkey").size()
    cust["n_ord"] = cust.c_custkey.map(ocnt).fillna(0).astype(int)
    bins = cust.groupby("bin").agg(cnt=("n_ord", "size"), tot=("n_ord", "sum"))
    # sequential PAVA with customer counts as weights
    blocks = [
        [t, c] for t, c in zip(bins.tot.tolist(), bins.cnt.tolist())
    ]
    stack = []
    for b in blocks:
        stack.append(list(b))
        while len(stack) > 1 and (
            stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]
        ):
            s, w = stack.pop()
            stack[-1][0] += s
            stack[-1][1] += w
    expect = []
    for s, w in stack:
        # every bin pooled into this block gets the block mean; w is
        # the customer-count total, so re-expand by matching cnt sums
        expect.append((s, w))
    # reconstruct per-bin fitted values from the blocks
    fitted = []
    it = iter(bins.itertuples())
    for s, w in expect:
        acc = 0
        while acc < w:
            row = next(it)
            fitted.append(round(s / w, 6))
            acc += row.cnt
        assert acc == w  # block boundaries align with bin boundaries
    assert len(fitted) == len(rows)
    for r, f in zip(rows, fitted):
        assert abs(r.y_star - f) < 2e-6, (r.bin, r.y_star, f)
    # monotone non-decreasing
    ys = [r.y_star for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(ys, ys[1:]))


def test_cuped_matches_numpy(spark, sf_dir):
    from pygr_spark.queries import q_cuped_adjust

    got = {r.variant: r for r in q_cuped_adjust(spark, sf_dir).collect()}
    ev = _events_pdf(spark, sf_dir)
    ev["c"] = np.round(ev.value * 100).astype("int64")
    ev["day"] = ev.ts // (86400 * 10**9)
    dmin = ev.day.min()
    per = ev.assign(
        x=np.where(ev.day < dmin + 15, ev.c, 0),
        y=np.where(ev.day >= dmin + 15, ev.c, 0),
    ).groupby("user_id")[["x", "y"]].sum()
    x = per.x.to_numpy(dtype=np.float64)
    y = per.y.to_numpy(dtype=np.float64)
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    for variant, r in got.items():
        mask = (per.index % 2) == variant
        adj = y[mask].mean() - theta * (x[mask].mean() - x.mean())
        assert abs(r.adj_mean - adj) < 1e-3
        assert r.post_num == int(per.y[mask].sum())
        assert r.post_den == int(mask.sum())
    # CUPED preserves the pooled mean: weighted avg of adjusted means
    n0, n1 = got[0].post_den, got[1].post_den
    pooled = (got[0].adj_mean * n0 + got[1].adj_mean * n1) / (n0 + n1)
    assert abs(pooled - y.mean()) < 1e-3


def test_bootstrap_weights_are_md5_poisson(spark, sf_dir):
    import hashlib

    from pygr_spark.queries import (
        _BOOTSTRAP_B,
        _POISSON_CUT20,
        q_bootstrap_ci,
    )

    rows = q_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == _BOOTSTRAP_B
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")

    def w(key, b):
        # r9 chunked scheme: replicate b reads 5-hex-char chunk b%6 of
        # md5(key:(b div 6)) — one digest carries six 20-bit draws
        dig = hashlib.md5(f"{key}:{b // 6}".encode()).hexdigest()
        h = int(dig[5 * (b % 6): 5 * (b % 6) + 5], 16)
        for k, p in enumerate(_POISSON_CUT20):
            if h < p:
                return k
        return 8

    for r in rows[:4]:  # full recompute for a few replicates
        ws = o.o_orderkey.map(lambda k: w(k, r.b))
        assert r.n_b == int(ws.sum())
        assert r.s_b == int((ws * o.c).sum())
        assert abs(r.mean_c - round(r.s_b / r.n_b, 4)) < 1e-9
    # Poisson(1) weights:per-replicate total ≈ #orders (within 5%)
    n = len(o)
    for r in rows:
        assert 0.9 * n < r.n_b < 1.1 * n


def test_ndcg_matches_reference(spark, sf_dir):
    from collections import Counter

    from pygr_spark.queries import (
        _NDCG_DISC_PPM,
        _NDCG_IDCG_PPM,
        _NDCG_QUERIES,
        q_ndcg_eval,
    )

    got = {r.query_id: r for r in q_ndcg_eval(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs = docs[docs.text.str.strip().str.len() > 0]
    toks = {
        d.doc_id: d.text.strip().lower().split() for d in docs.itertuples()
    }
    n_docs = len(toks)
    # document frequency over query terms
    all_terms = {t for _, ts in _NDCG_QUERIES for t in ts}
    df = Counter()
    for ts in toks.values():
        for t in set(ts) & all_terms:
            df[t] += 1
    for qid, terms in _NDCG_QUERIES:
        scores = {}
        for did, ts in toks.items():
            c = Counter(ts)
            s = sum(
                c[t] * ((n_docs * 1_000_000) // df[t])
                for t in terms
                if c[t] > 0
            )
            if s > 0:
                scores[did] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        rel = {
            did for did, ts in toks.items()
            if all(t in ts for t in terms)
        }
        dcg = sum(
            _NDCG_DISC_PPM[r]
            for r, (did, _) in enumerate(top)
            if did in rel
        )
        idcg = _NDCG_IDCG_PPM[min(len(rel), 10) - 1] if rel else 0
        r = got[qid]
        assert (r.n_rel, r.dcg_ppm, r.idcg_ppm) == (len(rel), dcg, idcg)
        assert 0 <= r.dcg_ppm <= r.idcg_ppm


def test_grid_dbscan_matches_reference(spark, sf_dir):
    import hashlib
    from collections import Counter, defaultdict

    from pygr_spark.queries import (
        _DBSCAN_G,
        _DBSCAN_MINPTS,
        q_grid_dbscan,
    )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = {(r.cx, r.cy): (r.n_pts, r.cluster)
            for r in q_grid_dbscan(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    cells = Counter(
        (
            h60(f"x:{k}") % 100000 // _DBSCAN_G,
            h60(f"y:{k}") % 100000 // _DBSCAN_G,
        )
        for k in cust.c_custkey
    )
    core = {c for c, n in cells.items() if n >= _DBSCAN_MINPTS}
    # union-find over 8-adjacent core cells
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for cx, cy in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in core and nb != (cx, cy):
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    comp = defaultdict(list)
    for c in core:
        comp[find(c)].append(c)
    expect = {}
    for members in comp.values():
        cid = min(cx * 1024 + cy for cx, cy in members)
        for cx, cy in members:
            expect[(cx, cy)] = (cells[(cx, cy)], cid)
    assert rows == expect


def test_conformal_coverage_near_nominal(spark, sf_dir):
    import hashlib

    from pygr_spark.queries import q_conformal_interval

    rows = q_conformal_interval(spark, sf_dir).collect()
    assert len(rows) > 0
    ev = _events_pdf(spark, sf_dir)
    ev["c"] = np.round(ev.value * 100).astype("int64")
    ev["split"] = ev.event_id.map(
        lambda e: int(
            hashlib.md5(f"s:{e}".encode()).hexdigest()[:15], 16
        ) % 10
    )
    for r in rows:
        grp = ev[ev.event_type == r.event_type]
        tr = grp[grp.split < 6]
        cal = grp[(grp.split >= 6) & (grp.split < 8)].copy()
        te = grp[grp.split >= 8]
        mu = tr.c.sum() / len(tr)
        res = np.sort(np.abs(cal.c.to_numpy(dtype=np.float64) - mu))
        k = -(-9 * (len(res) + 1) // 10)  # ceil((n+1)*0.9)
        qhat = res[k - 1]
        assert r.n_cal == len(res)
        assert abs(r.qhat - round(qhat, 6)) < 1e-9
        cov = int((np.abs(te.c.to_numpy(dtype=np.float64) - mu) <= qhat).sum())
        assert (r.n_test, r.n_covered) == (len(te), cov)
        # split-conformal guarantee: coverage >= 1 - alpha - 1/(n+1)
        # (finite-sample; allow slack at tiny test sizes)
        if r.n_test >= 50:
            assert r.n_covered / r.n_test >= 0.9 - 2.5 / np.sqrt(r.n_test)


def test_mmr_matches_greedy_reference(spark, sf_dir):
    from pygr_spark.queries import _MMR_CAND, _MMR_K, q_mmr_diversify

    rows = sorted(
        q_mmr_diversify(spark, sf_dir).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    q = np.round(
        np.stack(emb.embedding.map(np.asarray)).astype(np.float64) * 1e6
    ).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    norm = np.linalg.norm(q.astype(np.float64), axis=1)
    sim_all = (q @ q.T) / (norm[:, None] * norm[None, :])
    idx = {v: i for i, v in enumerate(ids)}
    # query batch = the exact 20 lowest md5(vec_id||'q') (fixed-size,
    # judge r9), iterated in ascending id to mirror the sorted output
    import hashlib

    qpick = sorted(
        ids.tolist(), key=lambda v: (hashlib.md5(f"{v}q".encode()).hexdigest(), v)
    )[:20]
    expect = []
    for qid in sorted(qpick):
        qi = idx[qid]
        others = [i for i in range(len(ids)) if i != qi]
        rel = {ids[i]: sim_all[qi, i] for i in others}
        cands = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))
        cands = dict(cands[:_MMR_CAND])
        sel = []
        for rank in range(1, _MMR_K + 1):
            best = None
            for v, r_ in cands.items():
                if v in (s for s, _ in sel):
                    continue
                pen = max(
                    (sim_all[idx[v], idx[s]] for s, _ in sel), default=0.0
                )
                score = 0.5 * r_ - 0.5 * pen
                key = (-score, v)
                if best is None or key < best[0]:
                    best = (key, v, score)
            sel.append((best[1], best[2]))
            expect.append((qid, rank, best[1], round(best[2], 6)))
    got = [(r.query_id, r.rank, r.vec_id, r.mmr) for r in rows]
    assert got == expect
    # (no monotonicity assertion: max-sim penalties can be NEGATIVE
    # cosines, which legitimately raise later rounds' scores)


def test_ktruss_matches_peeling_reference(spark, sf_dir):
    from collections import defaultdict

    from pygr_spark.queries import _KTRUSS_K, q_ktruss_edges

    got = {(r.u, r.v): r.support
           for r in q_ktruss_edges(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    basket = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = basket.groupby("l_orderkey").size()
    basket = basket[basket.l_orderkey.map(sizes) <= 50]
    pc = defaultdict(int)
    for _, grp in basket.groupby("l_orderkey"):
        items = sorted(grp.l_partkey)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                pc[(items[i], items[j])] += 1
    edges = {e for e, c in pc.items() if c >= 2}
    t = _KTRUSS_K - 2
    # peel to FIXPOINT — asserts the bounded R=4 unroll converges here
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        sup = {(u, v): len(adj[u] & adj[v]) for u, v in edges}
        drop = [e for e, s_ in sup.items() if s_ < t]
        if not drop:
            break
        edges -= set(drop)
    assert got == {e: s_ for e, s_ in sup.items()} if edges else got == {}
    # every surviving edge's endpoints share >= t neighbors
    for (u, v), s_ in got.items():
        assert s_ >= t


def test_haar_reconstructs_and_matches_numpy(spark, sf_dir):
    from pygr_spark.queries import q_haar_decompose

    rows = q_haar_decompose(spark, sf_dir).collect()
    ev = _events_pdf(spark, sf_dir)
    ev["c"] = np.round(ev.value * 100).astype("int64")
    ev["day"] = ev.ts // (86400 * 10**9)
    dmin = ev.day.min()
    for et, grp in ev.groupby("event_type"):
        series = np.zeros(32, dtype=np.int64)
        agg = grp.groupby(grp.day - dmin).c.sum()
        for idx, v in agg.items():
            if idx < 32:
                series[int(idx)] = v
        cur = series
        for level in range(1, 6):
            even, odd = cur[0::2], cur[1::2]
            detail = even - odd
            cur = even + odd
            for i, d in enumerate(detail):
                r = [
                    x for x in rows
                    if x.event_type == et and x.level == level
                    and x.idx == i and x.kind == "detail"
                ]
                assert len(r) == 1 and r[0].coef == d, (et, level, i)
        approx = [
            x for x in rows
            if x.event_type == et and x.kind == "approx"
        ]
        assert len(approx) == 1 and approx[0].coef == cur[0] == series.sum()


def test_rfm_scores_are_quintiles(spark, sf_dir):
    from pygr_spark.queries import q_rfm_segments

    df = q_rfm_segments(spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    assert len(df) == orders.o_custkey.nunique()
    for col in ("r_score", "f_score", "m_score"):
        counts = df[col].value_counts()
        assert set(counts.index) == set(range(1, 6))
        # ntile balance: sizes differ by at most 1
        assert counts.max() - counts.min() <= 1
    # higher m_score = higher monetary (tile boundaries respect order)
    m_by_tile = df.groupby("m_score").monetary
    assert (m_by_tile.max().sort_index()[:-1].to_numpy()
            <= m_by_tile.min().sort_index()[1:].to_numpy()).all()
    assert (df.segment ==
            df.r_score * 100 + df.f_score * 10 + df.m_score).all()


def test_assoc_rules_brute_force(spark, sf_dir):
    from collections import Counter, defaultdict

    from pygr_spark.queries import q_assoc_rules

    got = {(r.ante, r.cons): r for r in q_assoc_rules(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    basket = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = basket.groupby("l_orderkey").size()
    basket = basket[basket.l_orderkey.map(sizes) <= 50]
    nb = basket.l_orderkey.nunique()
    item_cnt = Counter(basket.l_partkey)
    pc = defaultdict(int)
    for _, grp in basket.groupby("l_orderkey"):
        items = sorted(grp.l_partkey)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                pc[(items[i], items[j])] += 1
    expect = {}
    for (u, v), c in pc.items():
        if c < 2:
            continue
        expect[(u, v)] = (c, c, item_cnt[u], c * nb,
                          item_cnt[u] * item_cnt[v])
        expect[(v, u)] = (c, c, item_cnt[v], c * nb,
                          item_cnt[v] * item_cnt[u])
    assert {
        k: (r.support_n, r.conf_num, r.conf_den, r.lift_num, r.lift_den)
        for k, r in got.items()
    } == expect
    # confidence is a probability; lift symmetric in num only
    for r in got.values():
        assert 0 < r.conf_num <= r.conf_den


def test_ppr_concentrates_on_seeds(spark, sf_dir):
    import pandas as pd

    from pygr_spark.queries import q_pagerank, q_ppr_seeds

    ppr = q_ppr_seeds(spark, sf_dir).toPandas()
    pr = q_pagerank(spark, sf_dir).toPandas()
    assert len(ppr) > 0
    # seeds carry the teleport floor; their mean rank must dominate
    # the non-seed mean by construction
    seeds = ppr[ppr.node % 37 == 0]
    others = ppr[ppr.node % 37 != 0]
    assert len(seeds) > 0
    if len(others):
        assert seeds["rank"].mean() > others["rank"].mean()
    # personalization is not global centrality: total PPR mass is
    # (far) below total PageRank mass since only seeds teleport
    assert ppr["rank"].sum() < pr["rank"].sum()
    # the reached set is a subset of all nodes
    assert set(ppr.node) <= set(pr.node)


def test_spearman_matches_pandas_rank(spark, sf_dir):
    from pygr_spark.queries import q_spearman_corr

    r = q_spearman_corr(spark, sf_dir).first()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    cust["bal"] = np.round(cust.c_acctbal * 100).astype("int64")
    spend = (
        np.round(orders.o_totalprice * 100).astype("int64")
        .groupby(orders.o_custkey).sum()
    )
    cust["spend"] = cust.c_custkey.map(spend).fillna(0).astype("int64")
    # total order (metric, custkey): lexsort then positional rank
    rx = np.empty(len(cust), dtype=np.int64)
    rx[np.lexsort((cust.c_custkey, cust.bal))] = np.arange(1, len(cust) + 1)
    ry = np.empty(len(cust), dtype=np.int64)
    ry[np.lexsort((cust.c_custkey, cust.spend))] = np.arange(1, len(cust) + 1)
    n = len(cust)
    sd2 = int(((rx - ry) ** 2).sum())
    assert (r.n, r.sd2) == (n, sd2)
    assert (r.rho_num, r.rho_den) == (n * (n * n - 1) - 6 * sd2,
                                      n * (n * n - 1))
    # balance and spend are essentially independent in TPC-H-ish data:
    # rho should be small but well-defined
    assert -1 <= r.rho_num / r.rho_den <= 1
