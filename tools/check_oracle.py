#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table of
<sfDir> in DuckDB, runs each oracle query, and compares row-by-row with the
Spark result parquet at <verifyOutDir>/<name>/ (columns sorted by name,
rows sorted, values compared with float tolerance).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # a SPARK_GRAFT_VERIFY_ONLY run writes the suffixed partial artifact
    # instead of clobbering the complete one; fall back to it for local
    # iteration against a fresh outDir
    import os
    path = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(path):
        path = f"{out_dir}/oracle_sql.partial.json"
    with open(path) as fh:
        oracles = json.load(fh)

    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            expected = canon(con.execute(sql).fetchdf())
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expected.columns)}")
            failed.append(name)
            continue
        if len(expected) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expected)}")
            failed.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, expected, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"OK   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            failed.append(name)
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
