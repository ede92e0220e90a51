"""Rounds-to-fixpoint probe for the two round-bounded peeling
entries (kcore_decomp, ktruss_edges) across data scales.

The entries run a FIXED round budget (_KCORE_ROUNDS / _KTRUSS_ROUNDS)
with early exit at fixpoint, so the scale question is not "does a
round scale" (each round is semi-joins / wedge joins on the shrinking
edge set — already probed) but "does the ROUND COUNT grow with the
graph". This probe reruns each peel with a large round budget,
counting rounds until the early-exit fires, at 1x / 4x / 16x / 64x,
and prints one row per (entry, scale): rounds_to_fixpoint,
edges_initial, edges_final, wall_s.

Expected shape (and why): make_scaled replication offsets part keys
per replica, so the kx graph is k DISJOINT copies of the 1x graph —
rounds-to-fixpoint must stay FLAT while per-round cost grows with the
edge count. That is the honest statement of the knob's contract:
peeling depth is a STRUCTURE property (degeneracy-ordering length /
support-cascade depth), not a row-count property; adversarially deep
graphs (paths for k-core, triangle strips for k-truss) need a budget
sized to that depth (tests/test_peel_knobs.py pins the pre-fixpoint
bounded-unroll equivalence those graphs exercise).

Usage: python scripts/probe_peel_rounds.py [sf_dir [scaled_dir ...]]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pygr_spark.session import get_spark  # noqa: E402
from pygr_spark.operators.graphs import kcore_peel, ktruss_peel  # noqa: E402
from pygr_spark.queries import (  # noqa: E402
    _truss_pairs,
    _KCORE_K,
    _KTRUSS_K,
)


def kcore_probe(spark, sf_dir, budget=64):
    pairs = _truss_pairs(spark, sf_dir).select("u", "v")
    both = pairs.union(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e0 = both.count()
    # count rounds by re-running with increasing budgets is wasteful;
    # instead replicate the loop's early-exit probe sequence exactly
    # (same code path as kcore_peel, instrumented)
    e = both.localCheckpoint(eager=True)
    rounds = 0
    for _ in range(budget):
        deg = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=True)
        )
        if deg.filter(F.col("d") < _KCORE_K).isEmpty():
            break
        rounds += 1
        keep = deg.filter(F.col("d") >= _KCORE_K).select("u")
        e = (
            e.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return rounds, e0, e.count()


def ktruss_probe(spark, sf_dir, budget=64):
    from pygr_spark.operators.graphs import _truss_support

    edges = _truss_pairs(spark, sf_dir).select("u", "v").localCheckpoint(
        eager=True
    )
    t = _KTRUSS_K - 2
    e0 = edges.count()
    n_edges = e0
    rounds = 0
    for _ in range(budget):
        kept = (
            edges.join(_truss_support(edges), ["u", "v"])
            .filter(F.col("support") >= t)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_kept = kept.count()
        edges = kept
        if n_kept == n_edges:
            break
        rounds += 1
        n_edges = n_kept
    return rounds, e0, n_edges


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("peel_probe")
    spark.read.parquet(dirs[0] + "/region.parquet").count()  # JVM warm
    print("entry\tdir\trounds\tedges0\tedgesN\twall_s")
    for d in dirs:
        for name, fn in (("kcore", kcore_probe), ("ktruss", ktruss_probe)):
            t0 = time.time()
            r, e0, eN = fn(spark, d)
            print(
                f"{name}\t{d}\t{r}\t{e0}\t{eN}\t{round(time.time() - t0, 2)}"
            )
            sys.stdout.flush()
    # sanity: the promoted operators with the catalog budgets agree
    # with the instrumented loops at the base dir
    pairs = _truss_pairs(spark, dirs[0]).select("u", "v")
    both = pairs.union(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    print("kcore_peel edges:", kcore_peel(both).count())
    print("ktruss_peel edges:", ktruss_peel(pairs).count())


if __name__ == "__main__":
    main()
