#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: for each query result parquet in
<outDir>, executes the corresponding oracle SQL (oracle_sql.json) in DuckDB
against the same source tables, sorts columns by name + rows by all columns,
and compares values exactly. Reports per-query PASS/FAIL with diffs.

Usage: python3 scripts/oracle_check.py <sfDir> <outDir> [query ...]
"""
import json, math, os, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    # Type-strict: the driver hashes values, so int 12 vs float 12.0 is a
    # mismatch (bit us in r2 — DuckDB sum(INT) is HUGEINT, which pandas
    # renders as float64; the oracle SQL must CAST(... AS BIGINT)).
    if isinstance(a, float) != isinstance(b, float):
        return False
    # bool vs int is the same class: Python True == 1, but the driver's
    # value hash distinguishes a boolean column from an integer one
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            if pd.isna(a) != pd.isna(b):
                return False
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b


def register_tables(con, sf_dir):
    """One DuckDB view per table. The driver's testdata is one file per
    table; Spark-written replicas (ScaleUp's sf1/sf10 dirs) are DIRECTORIES
    of part files — glob those."""
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def compare(name, spark_df, duck_df):
    problems = []
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        problems.append(f"schema: spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"rows: spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)]
        if bad:
            problems.append(f"col {c}: {len(bad)} mismatches, first: {bad[:3]}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    register_tables(con, sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            results[name] = ["NO SPARK OUTPUT"]
            continue
        # exception-isolate the whole per-query body: one pathological
        # result (mixed-type sort, array cells) must FAIL that query, not
        # abort the gate mid-loop with no summary
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            duck_df = con.execute(oracle[name]).fetchdf()
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            results[name] = [f"CHECK ERROR: {type(e).__name__}: {e}"]
    # rows-only queries (no oracle): enumerate the REGISTRY when Verify
    # dumped it (query_names.json) — a rows-only query that crashed in
    # Verify has no output dir and must FAIL, not silently vanish
    names_file = os.path.join(out_dir, "query_names.json")
    if os.path.exists(names_file):
        with open(names_file) as f:
            rows_only = [n for n in json.load(f) if n not in oracle]
    else:
        rows_only = [os.path.basename(d) for d in sorted(glob.glob(os.path.join(out_dir, "*")))
                     if os.path.isdir(d) and os.path.basename(d) not in oracle]
    for name in sorted(rows_only):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        try:
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        except Exception as e:
            results[name] = [f"CHECK ERROR: {type(e).__name__}: {e}"]
            continue
        results[name] = [] if n > 0 else ["rows-only: NO/EMPTY OUTPUT"]
    if not results:
        # a vacuous run (typo'd query filter, wrong/empty outDir) must be
        # loud — "0/0 PASS" is indistinguishable from a green round
        print(f"ERROR: no queries matched (only={sorted(only)}, out_dir={out_dir})")
        sys.exit(2)
    if only:
        missing = only - set(results)
        if missing:
            print(f"ERROR: query name(s) matched nothing: {sorted(missing)}")
            sys.exit(2)
    npass = sum(1 for v in results.values() if not v)
    print(f"== {npass}/{len(results)} PASS ==")
    for name, problems in sorted(results.items()):
        if problems:
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
