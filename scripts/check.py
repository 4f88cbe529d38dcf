#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run each oracle SQL in DuckDB over the parquet tables, load the Spark
result parquet, sort columns by name, and compare values.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        a_f = np.issubdtype(a[c].dtype, np.floating)
        b_f = np.issubdtype(b[c].dtype, np.floating)
        # int64-vs-float64 asymmetry: values compare equal as floats but the
        # driver hashes representations (round-1 q17/q21/q31 failure mode).
        if a_f != b_f and not (a[c].dtype == object or b[c].dtype == object):
            return f"DTYPE col {c}: {a[c].dtype} vs {b[c].dtype} (driver hash diverges)"
        if a_f or b_f:
            af = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bf = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            nan_ok = np.isnan(af) == np.isnan(bf)
            eq = np.where(np.isnan(af), nan_ok, af == bf)
            if not eq.all():
                i = int(np.argmin(eq))
                return f"VALUE col {c} row {i}: {af[i]!r} vs {bf[i]!r}"
        else:
            eq = pd.Series(av).astype(str).fillna("NULL").values == \
                 pd.Series(bv).astype(str).fillna("NULL").values
            if not eq.all():
                i = int(np.argmin(eq))
                return f"VALUE col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    # Expected-query manifest: a query that fails before its parquet write
    # leaves no output dir, so directory iteration alone would miss it.
    names_path = os.path.join(out_dir, "query_names.json")
    if os.path.exists(names_path):
        with open(names_path) as f:
            for name in json.load(f):
                if not os.path.isdir(os.path.join(out_dir, name)):
                    results[name] = "NO SPARK OUTPUT (query failed?)"
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        files = glob.glob(p + "/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            if len(spark_df) == 0:
                results[name] = "EMPTY rows-only output"
            else:
                results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        err = compare(name, spark_df, duck_df)
        results[name] = err or f"OK ({len(spark_df)} rows)"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values()
               if v.startswith("OK") or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
