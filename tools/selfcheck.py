#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name, compares row counts, dtypes, and values.
This script is a development harness only — the shipped Scala library
has no Python dependency.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonical row order: sort by all columns (stringified for stability)
    key = df.astype(str)
    idx = key.sort_values(by=list(df.columns)).index
    return df.loc[idx].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            rel = con.sql(sql)
            # Driver-parity: its hasher canonicalizes HUGEINT/DECIMAL
            # differently from BIGINT, so value-identical results still
            # hash-mismatch. Fail any oracle that binds such a type —
            # the fix is a CAST(... AS BIGINT) in the oracle SQL.
            bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()
                   or "DECIMAL" in str(t).upper()]
            if bad:
                print(f"FAIL {name}: driver-unsafe oracle types {bad} "
                      f"(cast to BIGINT in the oracle SQL)")
                failures += 1
                continue
            exp = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        kinds_g = [d.kind for d in g.dtypes]
        kinds_e = [d.kind for d in e.dtypes]
        if kinds_g != kinds_e:
            print(f"FAIL {name}: dtype kinds differ "
                  f"{list(zip(g.columns, kinds_g, kinds_e))}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
        except AssertionError as ex:
            print(f"FAIL {name}: values differ:\n{str(ex)[:800]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
