"""Driver-contract sweep: run catalog entries under a VANILLA
SparkSession (exactly like the external driver) and compare each to
its DuckDB oracle at a given scale factor.

Usage:
    cd /tmp && python /root/repo/scripts/sweep.py [entry ...]
    cd /tmp && python /root/repo/scripts/sweep.py            # all entries
    SWEEP_SF_DIR=/root/testdata/sf0.001 python scripts/sweep.py q1_pricing_summary

Compares sorted-column / sorted-row stringified values, mirroring the
driver's hash compare. Entries without an oracle_sql() entry get a
rows-only check (>= 0 rows, stable schema).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def digest(df) -> tuple[int, int]:
    """Order-insensitive multiset digest of stringified rows over
    name-sorted columns: (row_count, wrapping sum of per-row uint64
    hashes). Stringify first so dtype differences between engines
    (int32 vs int64) cannot change the hash; summing replaces the
    multi-minute sort on 16M-row interval-join results."""
    import numpy as np
    import pandas as pd

    cols = sorted(df.columns)
    s = df[cols].astype(str)
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype="uint64")
    with np.errstate(over="ignore"):
        return len(h), int(h.sum(dtype=np.uint64))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, MapType, StructType

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        # Arrow OFF means toPandas() row-converts in Python — minutes
        # for the 16M-row sf0.1 interval joins. The compare harness
        # needs it; the queries under test still run under whatever
        # session the driver gives them.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sys.argv[1:] or list(qs)
    bad = []
    for name in names:
        if name not in qs:
            print(f"{name}: NO SUCH ENTRY")
            bad.append(name)
            continue
        t0 = time.time()
        try:
            spark_plan = qs[name](spark, SF_DIR)
            # The driver's canonicalizer (pandas sort_values over all
            # columns) cannot factorize list/struct/map cells — a
            # complex-typed output column errors the real gate even
            # though this sweep's stringified digest would tolerate
            # it (that exact gap hid the round-4 supplier_top_parts
            # failure). Reject it here so local green ⇒ driver green.
            complex_cols = [
                f.name
                for f in spark_plan.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"{name}: COMPLEX-TYPE OUTPUT {complex_cols} — "
                    "driver canon would error; flatten/explode/to_json"
                )
                bad.append(name)
                continue
            sdf = spark_plan.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        if name not in osql:
            print(f"{name}: rows-only {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok = ok_schema and digest(sdf) == digest(odf)
        status = "MATCH" if ok else ("SCHEMA-MISMATCH" if not ok_schema else "VALUE-MISMATCH")
        print(f"{name}: {status} spark={len(sdf)} oracle={len(odf)} ({time.time()-t0:.1f}s)")
        if not ok:
            bad.append(name)
            if not ok_schema:
                print(f"  spark cols:  {sorted(sdf.columns)}")
                print(f"  oracle cols: {sorted(odf.columns)}")
    print(f"\n{len(names) - len(bad)}/{len(names)} ok; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
