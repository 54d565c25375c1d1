"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
paired oracle_sql() in DuckDB over the same parquet files, and compares
row count, column names/order-insensitive values. Exit nonzero on any
mismatch. Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from chainalytic_framework_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"okro {name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails.append(name)
            continue
        a, b = norm(sdf.copy()), norm(odf.copy())
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails.append(name)
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails.append(name)
            continue
        eq = a.equals(b)
        if not eq:
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.any(axis=1).sum())
            print(f"FAIL {name}: {ndiff}/{len(a)} rows differ")
            badrows = diff.any(axis=1)
            print("  spark:", a[badrows].head(3).to_dict("records"))
            print("  oracle:", b[badrows].head(3).to_dict("records"))
            fails.append(name)
        else:
            print(f"PASS {name}: rows={len(a)}")
    spark.stop()
    if fails:
        print("FAILURES:", fails)
        return 1
    print("all pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
