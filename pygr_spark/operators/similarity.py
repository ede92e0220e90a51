"""Similarity search over embedding columns (array<float>).

Two paths (north star: ANN over 100 TB of embeddings):

- **Brute-force cosine top-k** — the exactness baseline. The query
  side is small (broadcast); each partition of the corpus computes
  dot products JVM-side via ``zip_with``/``aggregate`` array
  expressions, then a per-query top-k window. One broadcast, one
  shuffle (the top-k partial aggregation).

- **Random-hyperplane LSH bucketing** — the scale path: hash each
  vector to a b-bit signature of hyperplane signs; candidates are
  vectors sharing a bucket (optionally with multi-probe on nearby
  buckets); exact cosine re-rank within candidates only.

Determinism for the DuckDB oracle: vectors are quantized to integer
micro-units per element, so dot products and squared norms are exact
integers; cosine = dot / (sqrt(n1)·sqrt(n2)) is then a deterministic
double on both engines (see pygr_spark/queries.py rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-unit quantization for exact dot products


def quantized(vec: Column) -> Column:
    """array<long> of round(v * 1e6) — exact integer embedding."""
    return F.transform(vec, lambda v: F.round(v.cast("double") * SCALE, 0).cast("long"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sqnorm(a: Column) -> Column:
    return dot(a, a)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus
    vectors (excluding itself when ids collide). Returns
    (query_id, vec_id, cos_sim, rank) with deterministic
    (sim desc, vec_id) ranking."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), quantized(F.col(vec_col)).alias("cv")
    ).withColumn("cn", sqnorm(F.col("cv")))
    q = queries.select(
        F.col(query_id).alias("query_id"), quantized(F.col(vec_col)).alias("qv")
    ).withColumn("qn", sqnorm(F.col("qv")))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sim = (
        dot(F.col("cv"), F.col("qv"))
        / (F.sqrt(F.col("cn").cast("double")) * F.sqrt(F.col("qn").cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Same contract as cosine_topk, computed with one Arrow-batched
    NumPy matmul per partition instead of per-pair interpreted array
    expressions — the '10-100× via Pandas UDF' path for the hot loop.

    The query matrix collects to the driver (small by contract) and
    ships inside the closure; each corpus batch does quantized-int64
    matmul → float64 cosine, preserving the exact-integer determinism
    of the expression version (identical results, including ranking).
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array(
        [np.round(np.asarray(r[1], dtype=np.float64) * SCALE) for r in q_rows],
        dtype=np.int64,
    )
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1).astype(np.float64))

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(
                [
                    np.round(np.asarray(v, dtype=np.float64) * SCALE)
                    for v in pdf[vec_col]
                ],
                dtype=np.int64,
            )
            norms = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
            sims = (mat @ q_mat.T).astype(np.float64) / np.outer(norms, q_norm)
            n_c, n_q = sims.shape
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], n_c, 0).ravel(),
                    "vec_id": np.repeat(ids, n_q),
                    "cos_sim": sims.ravel(),
                }
            )
            yield out[out["query_id"] != out["vec_id"]]

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """b-bit bucket id: bit i = sign(vec · plane_i). Planes are plain
    Python lists (broadcast as literals into the plan)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in p]),
                    lambda v, w_: v.cast("double") * w_,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out.bitwiseOR(b)
    return out.cast("long")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane signature,
    equi-join on the bucket, exact cosine re-rank within candidates.
    Recall grows with multiple plane sets (union of buckets); this
    single-table variant keeps one bucket column per side."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        quantized(F.col(vec_col)).alias("cv"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("cn", sqnorm(F.col("cv")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        quantized(F.col(vec_col)).alias("qv"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("qn", sqnorm(F.col("qv")))
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = (
        dot(F.col("cv"), F.col("qv"))
        / (F.sqrt(F.col("cn").cast("double")) * F.sqrt(F.col("qn").cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
