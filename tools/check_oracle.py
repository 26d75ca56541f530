#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table of
<sfDir> in DuckDB, runs each oracle query, and compares row-by-row with the
Spark result parquet at <verifyOutDir>/<name>/ (columns sorted by name,
rows sorted).

Stricter than the float-tolerant first version (the driver's gate hashes
values exactly, so the local mimic must too):

- every oracle is DESCRIBEd first and any top-level HUGEINT / UHUGEINT /
  DECIMAL column is an immediate FAIL — DuckDB's ``sum()`` over integers
  returns HUGEINT, which pandas widens to float64 and the driver's hasher
  then sees 123.0 vs Spark's int64 123 (the ``curation_recipe`` r15
  regression class); the oracle must ``CAST(... AS BIGINT)``;
- integer / boolean / string columns are compared exactly; only genuinely
  float columns get the 1e-9 tolerance.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB types that pandas silently widens to float64 (or object),
# breaking the driver's exact value hash even when values are equal.
HASH_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def unsafe_columns(con, sql: str):
    """Top-level oracle columns whose DuckDB type the driver can't hash
    compatibly with Spark's int64 output. One DESCRIBE per query."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(name, typ) for name, typ, *_ in desc
            if any(typ.upper().startswith(t) for t in HASH_UNSAFE_TYPES)]


def compare(got: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Exact compare for integer/bool/object columns; 1e-9 tolerance only
    for genuine floats. Raises AssertionError with the column name."""
    for col in expected.columns:
        e, g = expected[col], got[col]
        exact = not (pd.api.types.is_float_dtype(e) or
                     pd.api.types.is_float_dtype(g))
        pd.testing.assert_series_equal(
            g, e, check_dtype=False, check_names=False,
            check_exact=exact, rtol=1e-9, atol=1e-9, obj=f"column {col!r}")


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
            bad = unsafe_columns(con, sql)
            if bad:
                cols = ", ".join(f"{c} {t}" for c, t in bad)
                print(f"FAIL {name}: hash-unsafe oracle column types "
                      f"[{cols}] — CAST(... AS BIGINT) in the final SELECT")
                failed.append(name)
                continue
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
            compare(got, expected)
            print(f"OK   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            failed.append(name)
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


def selftest() -> int:
    """Regression test for the r15 HUGEINT class: a deliberately un-cast
    integer sum() MUST be flagged, the CAST form must not, and integer
    columns must compare exactly (no rtol escape hatch)."""
    con = duckdb.connect()
    bad = unsafe_columns(con, "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert bad == [("s", "HUGEINT")], f"un-cast sum() not flagged: {bad}"
    ok = unsafe_columns(
        con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)")
    assert ok == [], f"cast sum() wrongly flagged: {ok}"
    dec = unsafe_columns(con, "SELECT CAST(1 AS DECIMAL(10,2)) AS d")
    assert dec == [("d", "DECIMAL(10,2)")], f"DECIMAL not flagged: {dec}"
    try:
        compare(pd.DataFrame({"a": [1, 2]}), pd.DataFrame({"a": [1, 3]}))
        raise SystemExit("integer mismatch not caught")
    except AssertionError:
        pass
    compare(pd.DataFrame({"f": [1.0 + 1e-12]}), pd.DataFrame({"f": [1.0]}))
    print("selftest OK")
    return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
