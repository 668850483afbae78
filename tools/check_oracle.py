#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views over
<sfDir>/*.parquet), sorts rows, sorts columns by name, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

ORDERED = "--ordered" in sys.argv  # keep emitted row order (the driver
# hashes values in row order — sorting here can MASK an ORDER BY
# divergence like DuckDB's NULLS-LAST default vs Spark's NULLS FIRST)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if not ORDERED:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = [a for a in sys.argv[1:] if not a.startswith("--")][:2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'").df())
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # exact value compare (driver hashes values)
        try:
            eq = got.equals(want)
            if not eq:
                # locate first diff
                for c in got.columns:
                    gv, wv = got[c], want[c]
                    neq = ~(gv.eq(wv) | (gv.isna() & wv.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        print(f"FAIL {name}: col {c} row {i}: spark={gv[i]!r} oracle={wv[i]!r} "
                              f"(dtypes {gv.dtype}/{wv.dtype}, {int(neq.sum())} diffs)")
                        break
                else:
                    print(f"FAIL {name}: frames differ (dtype-only?) "
                          f"{[(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns]}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
