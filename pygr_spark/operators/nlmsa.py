"""Alignment-database construction helpers — the NLMSA build surface
(reference NLMSABuilder, nlmsa_utils.py:405-431; save_tuples /
aligned-interval ingestion forms, tests/nlmsa_test.py:129-261).

An "NLMSA" here is just a pairwise alignment DataFrame
(src_id, src_start, src_stop[, src_ori], dst_id, dst_start, dst_stop
[, dst_ori]); building it from any aligned-interval source is a
projection, and the reference's storage-level concerns disappear:

- bidirectionality (is_bidirectional, cnestedlist.pyx:1479-1482) is a
  union with the swapped projection instead of double-insertion;
- inversion (__invert__, cnestedlist.pyx:2041-2047) is the swap alone;
- the union-coordinate packing / int32 ceiling does not exist
  (LongType coords, partitioned by src_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SWAP = {
    "src_id": "dst_id",
    "src_start": "dst_start",
    "src_stop": "dst_stop",
    "src_ori": "dst_ori",
    "dst_id": "src_id",
    "dst_start": "src_start",
    "dst_stop": "src_stop",
    "dst_ori": "src_ori",
}


def invert_alignment(aln: DataFrame) -> DataFrame:
    """~msa (cnestedlist.pyx:2041-2047): swap src and dst roles."""
    return aln.select(
        *[F.col(c).alias(_SWAP.get(c, c)) for c in aln.columns]
    ).select(*aln.columns)


def build_alignment(
    pairs: DataFrame,
    bidirectional: bool = True,
    prune_self: bool = True,
) -> DataFrame:
    """Aligned-interval rows → queryable alignment DataFrame.

    ``bidirectional`` stores both directions (the reference's default
    for non-LPO pairwise NLMSAs); ``prune_self`` drops degenerate
    self-mappings (prune_self_mappings, nlmsa_utils.py:394-402).
    Sorted within partitions by (src_id, src_start) so a parquet sink
    gets the row-group min/max stats that replace the NCList index
    (SURVEY.md S10)."""
    aln = pairs
    if bidirectional:
        aln = aln.unionByName(invert_alignment(pairs))
    if prune_self:
        aln = aln.filter(
            (F.col("src_id") != F.col("dst_id"))
            | (F.col("src_start") != F.col("dst_start"))
            | (F.col("src_stop") != F.col("dst_stop"))
        )
    return aln.repartition("src_id").sortWithinPartitions("src_id", "src_start")


def translated_similarity_join(
    dna: DataFrame,
    protein_db: DataFrame,
    k: int = 4,
    threshold: float = 0.3,
    id_col: str = "id",
    seq: str = "seq",
    db_id: str = "id",
    db_seq: str = "seq",
) -> DataFrame:
    """BlastxMapping shape (J8 through six-frame translation,
    reference blast.py:366-384): translate every DNA sequence in all
    six frames, then k-mer Jaccard similarity join of the translated
    proteins against a protein database. Returns
    (id, frame, db_id, inter, size_a, size_b)."""
    from pygr_spark.functions.seqfns import six_frames

    frames = six_frames(dna, id_col, seq).select(
        F.concat_ws("#", id_col, F.col("frame").cast("string")).alias("_qid"),
        F.col("protein"),
    )

    def kmers(col: F.Column) -> F.Column:
        n = F.length(col)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(idx, lambda i: col.substr(i, F.lit(k)))
        )

    q = frames.select(
        "_qid", F.explode(kmers(F.col("protein"))).alias("_km")
    )
    d = protein_db.select(
        F.col(db_id).alias("_did"), F.col(db_seq).alias("_dseq")
    ).select("_did", F.explode(kmers(F.col("_dseq"))).alias("_km"))
    q_sizes = q.groupBy("_qid").agg(F.count(F.lit(1)).alias("size_a"))
    d_sizes = d.groupBy("_did").agg(F.count(F.lit(1)).alias("size_b"))
    inter = (
        q.join(d, "_km")
        .groupBy("_qid", "_did")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = inter.join(q_sizes, "_qid").join(F.broadcast(d_sizes), "_did")
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    split = F.split(F.col("_qid"), "#")
    return out.filter(F.col("inter") >= F.lit(threshold) * union).select(
        split.getItem(0).alias("id"),
        split.getItem(1).cast("int").alias("frame"),
        F.col("_did").alias("db_id"),
        "inter",
        "size_a",
        "size_b",
    )
