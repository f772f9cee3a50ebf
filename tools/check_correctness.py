#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables =
views over <sfDir>/*.parquet), sort columns by name, sort rows, compare
values (exact for strings/ints, tiny tolerance for floats).
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    # dtype drift (e.g. int32 vs int64, decimal scale) may hash-mismatch
    # in the driver even when values compare equal — treat as failure
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            return f"dtype mismatch col {c}: {a[c].dtype} vs {b[c].dtype}"
    if len(a) != len(b):
        return f"row count mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                # Driver strictness: the driver hashes values EXACTLY, so
                # the local gate must too (r12's q49 passed locally at
                # 1e-9 tolerance and failed the driver's hash). Bitwise
                # equality via repr — the only escape is NaN==NaN.
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if repr(fx) != repr(fy):
                    return f"col {c} row {i}: {fx!r} != {fy!r} (exact)"
            elif str(x) != str(y):
                return f"col {c} row {i}: {x!r} != {y!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        err = cmp(norm(got), norm(exp))
        if err:
            print(f"FAIL {name}: {err}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
