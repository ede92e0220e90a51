"""Deterministic sampling operators for corpus construction.

``stratified_sample`` — exactly-n-per-stratum sampling, deterministic
across runs and engines (the rank key is md5 of the row id, so any
engine agrees on which rows are "first").

The naive shape — row_number() over (partition by stratum order by
key) then filter <= n — is correct but collapses EACH STRATUM onto a
single task for the sort. With 10 strata over 100 TB that is 10 tasks
sorting 10 TB each: a scale-killer. The two-phase shape here keeps the
same exact output:

  phase 1: per-stratum counts (tiny aggregate) -> broadcast back ->
           keep only rows whose 32-bit key prefix falls under
           ``safety * n / count`` of the key space. This is a narrow
           filter that discards ~(1 - safety*n/count) of every
           stratum before any sort.
  phase 2: run the exact per-stratum window ONLY on the survivors
           (expected safety*n rows per stratum — kilobytes).

Exactness guard: the prefilter could in principle cut below n rows in
a stratum (probability < e^{-n(safety-1)^2/3} by Chernoff; ~1e-18 for
n=100, safety=2). We do not rely on probability for a correctness
gate: phase 2 counts survivors per stratum, and any stratum that came
up short is re-run through the exact window over its FULL data
(per-stratum fallback, usually the empty set). Output is therefore
bit-identical to the naive shape, at ~n/count of its shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^8 — the key prefix is the first 8 hex chars of md5, uniform here.
_KEY_SPACE = 16**8


def _rank_key(id_col: str) -> F.Column:
    """Engine-portable uniform rank key: lowercase md5 hex of the id
    rendered as a decimal string (DuckDB and Spark agree on both)."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    safety: float = 2.0,
    prefilter: bool = True,
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum: the n smallest
    (md5(id), id) rows. Adds ``_rk`` (the rank key) to the output so
    callers/tests can verify determinism; strata keys must be non-null.
    """
    key = _rank_key(id_col)
    w = Window.partitionBy(*strata).orderBy("_rk", id_col)
    keyed = df.withColumn("_rk", key)

    def exact(rows: DataFrame) -> DataFrame:
        return (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_stratum)
            .drop("_rn")
        )

    if not prefilter:
        return exact(keyed)

    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_cnt"))
    # 32-bit uniform prefix of the rank key; threshold per stratum.
    pref = F.conv(F.substring("_rk", 1, 8), 16, 10).cast("long")
    thresh = F.least(
        F.lit(_KEY_SPACE),
        F.ceil(F.lit(_KEY_SPACE) * F.lit(float(n_per_stratum) * safety) / F.col("_cnt")),
    )
    surv = (
        keyed.join(F.broadcast(counts), on=strata)
        .filter(pref <= thresh)
        .drop("_cnt")
    )
    # Exactness check: strata whose survivor count fell under n (and
    # that actually have >= n rows) must be re-run over full data.
    short = (
        surv.groupBy(*strata)
        .agg(F.count(F.lit(1)).alias("_nsurv"))
        .join(F.broadcast(counts), on=strata)
        .filter(
            (F.col("_nsurv") < n_per_stratum)
            & (F.col("_cnt") > F.col("_nsurv"))
        )
        .select(*strata)
    )
    ok_part = exact(surv.join(F.broadcast(short), on=strata, how="left_anti"))
    fb_part = exact(keyed.join(F.broadcast(short), on=strata, how="left_semi"))
    # joins on strata reorder columns — restore the input order
    cols = df.columns + ["_rk"]
    return ok_part.select(*cols).unionByName(fb_part.select(*cols))
