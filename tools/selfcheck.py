#!/usr/bin/env python
"""Replicates the driver's DuckDB oracle compare against a Verify dump.

Usage: python tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir: load the Spark result parquet and the oracle SQL
result (DuckDB over views of the sfDir tables), sort columns by name,
sort rows, and compare exactly.
"""
import json
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(con, rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = norm(con, con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            want = norm(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:300]}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: values differ in {bad_cols} "
                  f"({int(neq.any(axis=1).sum())}/{len(got)} rows)")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"   e.g. {c}[{i}]: spark={got[c][i]!r} duck={want[c][i]!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
