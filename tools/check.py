#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, sorts columns by name, and compares shape / dtypes /
values exactly. Exit 1 on any mismatch.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == 'f' or y.dtype.kind == 'f':
            ok = ((x.isna() & y.isna()) | (x == y)).all()
        else:
            sx, sy = x.astype(object), y.astype(object)
            ok = ((x.isna() & y.isna()) | (sx == sy)).all()
        if not ok:
            return False
    return True


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        # sorted: multi-part output must concatenate in part order (range-
        # partitioned sort order of orderBy output); glob order is arbitrary
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        s, o = norm(spark_df), norm(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            failed.append(name)
            continue
        if s.shape != o.shape:
            print(f"FAIL {name}: shape spark={s.shape} oracle={o.shape}")
            failed.append(name)
            continue
        if [str(d) for d in s.dtypes] != [str(d) for d in o.dtypes]:
            print(f"WARN {name}: dtypes spark={list(map(str, s.dtypes))} oracle={list(map(str, o.dtypes))}")
        if not values_equal(s, o):
            print(f"FAIL {name}: value mismatch")
            for c in s.columns:
                x, y = s[c], o[c]
                try:
                    neq = ~((x.isna() & y.isna()) | (x.astype(object) == y.astype(object)))
                except Exception:
                    neq = pd.Series([True] * len(x))
                if neq.any():
                    i = int(np.argmax(neq.values))
                    print(f"  col {c}: first diff row {i}: spark={x.iloc[i]!r} oracle={y.iloc[i]!r} ({int(neq.sum())} rows)")
            failed.append(name)
        else:
            print(f"OK   {name} ({s.shape[0]} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
