"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row counts + column names + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from bleve_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canary mirroring the driver's _canon: the gate sorts the RAW frame
    # with pandas, which raises TypeError on unhashable cells (lists,
    # dicts). Reproduce that here so a non-scalar output column fails
    # locally instead of only in the driver gate (round-3 lesson:
    # multimodal_features array<float> crashed the gate but passed the
    # stringified compare below).
    df.sort_values(list(df.columns), kind="stable")
    # stringify for robust compare; floats via repr of rounded value
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].map(lambda x: f"{x:.6f}").astype(object)
        else:
            out[c] = out[c].astype(str).astype(object)
    # astype(object) keeps empty frames dtype-comparable: a 0-row float64
    # column vs a 0-row object column would fail DataFrame.equals even
    # though both stringify to nothing (the driver gate hashes values, so
    # empty==empty there; the replica must match that)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[{name}] SPARK ERROR: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(
                f"[{name}] rows-only: {len(sdf)} rows, cols={sorted(sdf.columns)}"
                f" ({t_spark:.1f}s)"
            )
            continue
        t0 = time.time()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        t_oracle = time.time() - t0
        a, b = normalize(sdf), normalize(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "OK" if ok_vals else "MISMATCH"
        print(
            f"[{name}] {status} rows={len(a)}/{len(b)} cols_ok={ok_cols}"
            f" ({t_spark:.1f}s spark / {t_oracle:.1f}s duck)"
        )
        if not ok_vals:
            failed.append(name)
            if ok_cols and ok_rows:
                diff = (a != b).any(axis=1)
                print("  first diffs (spark vs duck):")
                print(pd.concat([a[diff].head(3), b[diff].head(3)], axis=1))
            else:
                print("  spark cols:", list(a.columns), "rows:", len(a))
                print("  duck  cols:", list(b.columns), "rows:", len(b))
                print("  spark head:", a.head(3).to_dict("records"))
                print("  duck head:", b.head(3).to_dict("records"))
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
