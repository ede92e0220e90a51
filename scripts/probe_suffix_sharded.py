"""Giant-single-sequence probe for suffix_ranks_sharded (judge r10
item #4): build ONE >= 50M-char synthetic acgt sequence, run the
sharded prefix-doubling path, and verify the output is a full
permutation with correct local order at sampled rank-adjacent pairs.

Usage: python scripts/probe_suffix_sharded.py [n_chars] [n_parts]

The window path (suffix_ranks) would run this doc's seed sort and
every refinement round in ONE task (every exchange hashes doc_id);
the sharded path distributes the position axis, so this probe is the
existence proof that a genome-length document no longer serializes.
The correctness of the ranks themselves is pinned by
tests/test_fmindex.py parity on small docs (identical algorithm,
identical code path); here we additionally spot-check 1000 sampled
adjacent-rank suffix pairs by direct 64-char prefix comparison.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from pygr_spark.operators.fmindex import suffix_ranks_sharded  # noqa: E402
from pygr_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    path = f"/tmp/genome_{n}.parquet"
    if not os.path.exists(path):
        rng = np.random.default_rng(42)
        seq = rng.integers(0, 4, size=n, dtype=np.uint8)
        s = np.frombuffer(b"acgt", dtype=np.uint8)[seq].tobytes().decode()
        pq.write_table(
            pa.table({"doc_id": pa.array([0], pa.int64()),
                      "seq": pa.array([s])}),
            path,
        )
        del seq, s
    spark = get_spark("suffix_sharded_probe")
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    out = suffix_ranks_sharded(docs, n_parts=n_parts)
    # full-permutation check forces the whole computation
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("sa_rank").alias("d"),
        F.max("sa_rank").alias("mx"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    ok = agg["n"] == n and agg["d"] == n and agg["mx"] == n
    print(f"n={n} n_parts={n_parts} wall={dt:.1f}s permutation_ok={ok}")

    # spot-check sampled adjacent-rank pairs by direct prefix compare
    t1 = time.perf_counter()
    sample = out.filter(F.col("sa_rank") % (n // 1000) == 0)
    nbr = out.filter((F.col("sa_rank") + 1) % (n // 1000) == 0).select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("pos").alias("pos2"),
    )
    pairs = sample.join(nbr, "sa_rank").select("pos", "pos2").collect()
    import pyarrow.parquet as _pq

    s = _pq.read_table(path).column("seq")[0].as_py()
    bad = [
        (p.pos, p.pos2)
        for p in pairs
        if not s[p.pos - 1 : p.pos - 1 + 64] <= s[p.pos2 - 1 : p.pos2 - 1 + 64]
    ]
    print(
        f"adjacent-pair order check: {len(pairs)} pairs, {len(bad)} bad "
        f"({time.perf_counter() - t1:.1f}s)"
    )
    assert ok and not bad


if __name__ == "__main__":
    main()
