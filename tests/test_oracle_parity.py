"""Local mirror of the driver's t2 gate: run every catalog query in
Spark AND its DuckDB oracle on the same parquet, compare exactly
(row count + order-insensitive values). Uses sf0.001 for speed; the
driver runs the same comparison at sf0.01.
"""

import math
import os

import duckdb
import pytest

from pygr_spark.queries import ORACLES, QUERIES
from pygr_spark.session import DRIVER_TABLES


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    # DuckDB returns LIST columns as numpy arrays and Spark/Arrow as
    # Python lists; both are unhashable / ambiguous under tuple
    # compare. Canonicalize recursively so a complex-typed entry
    # fails with a clean value assert, not a ValueError — though the
    # catalog-wide schema lint below should catch it first.
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_flat(spark, sf_dir, name):
    """The driver's canonicalizer (pandas sort_values over all
    columns) cannot factorize array/map/struct cells — any
    complex-typed output column errors the real correctness gate
    (round-4 `supplier_top_parts` shipped red this way). Every
    catalog entry must emit scalar columns only: explode, to_json,
    or concat_ws the nested shape instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, sf_dir).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would "
        "error the driver's canonicalizer — flatten them"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, sf_dir, name):
    if name not in ORACLES:
        # rows-only contract: must run and produce a stable schema
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    oracle_df = _duck(sf_dir, ORACLES[name])
    s_cols, s_rows = _norm(spark_df)
    o_cols, o_rows = _norm(oracle_df)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


def test_catalog_registry_invariants():
    """Registry hygiene the driver depends on: every oracle key has a
    query, every query is a callable with the (spark, sf_dir)
    signature, names are snake_case, and EVERY entry has an oracle —
    the last two rows-only entries (approx_aggs, media_real_decode)
    were restructured to oracleable projections in round 9, so an
    oracle-less entry is now always an oversight."""
    import inspect
    import re

    from pygr_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert set(QUERIES) - set(ORACLES) == set()
    for name, fn in QUERIES.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(fn), name
        assert len(inspect.signature(fn).parameters) == 2, name
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
