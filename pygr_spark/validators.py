"""Data-contract validators (P11): the reference asserts "found and
unique" on every keyed probe (fetchmany(2) + len==1, sqlgraph.py:89-94,
1214-1217, 2253-2257). Relationally that is a key-uniqueness contract;
these helpers check it set-at-a-time instead of per-probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of (keys..., n_rows) for every key appearing more than
    once — empty means the unique-key contract holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_unique_key(df: DataFrame, keys: list[str], sample: int = 5) -> None:
    """Raise ValueError listing sample violations if ``keys`` is not
    unique — the engine-side analog of pygr's limit-2 probe."""
    bad = key_violations(df, keys).take(sample)
    if bad:
        raise ValueError(f"key {keys} not unique; sample violations: {bad}")


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with NULLs in supposedly NOT NULL columns (the reference's
    'source_id int not null' schema contract, sqlgraph.py:1396-1398)."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.filter(cond)
