#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name + rows, and compares values exactly. This script is
NOT part of the engine (driver-side python only) — it exists so oracle SQL
mismatches are caught before the round gate runs.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark result")
            n_bad += 1
            continue
        try:
            spark_tbl = con.execute(
                f"SELECT * FROM read_parquet({files!r})").arrow()
            duck_tbl = con.execute(sql).arrow()
            spark_df = spark_tbl.to_pandas()
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            print(f"ERROR   {name}: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA  {name}: spark={list(s.columns)} duck={list(d.columns)}")
            n_bad += 1
            continue
        # Strict arrow-dtype compare: the driver's hash is type- and
        # rendering-sensitive (round 1: value-equal DECIMAL(28,2) vs
        # DECIMAL(38,2) and int64 vs HUGEINT still hash-mismatched).
        stypes = {f.name: str(f.type) for f in spark_tbl.schema}
        dtypes_ = {f.name: str(f.type) for f in duck_tbl.schema}
        tmism = [(c, stypes[c], dtypes_[c]) for c in s.columns
                 if stypes[c] != dtypes_[c]]
        if tmism:
            c, a, b = tmism[0]
            print(f"DTYPE   {name}: col={c} spark={a} duck={b}")
            n_bad += 1
            continue
        if len(s) != len(d):
            print(f"ROWS    {name}: spark={len(s)} duck={len(d)}")
            n_bad += 1
            continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
        mismatch = None
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a != b and str(a) != str(b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"VALUE   {name}: col={c} row={i} spark={a!r} duck={b!r}")
            n_bad += 1
        else:
            print(f"OK      {name} ({len(s)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
