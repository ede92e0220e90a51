from pyspark.sql import functions as F

from pygr_spark.operators.similarity import cosine_topk, cosine_topk_vectorized


def test_vectorized_matches_expression(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = cosine_topk(emb, queries, k=5)
    b = cosine_topk_vectorized(emb, queries, k=5)

    def norm(df):
        return sorted(
            (r.query_id, r.vec_id, r.rank, round(r.cos_sim, 9)) for r in df.collect()
        )

    assert norm(a) == norm(b)
    assert len(norm(a)) > 0
