#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the parquet tables
in <sfDir>, and compares: schema (column names), row count, and exact values
(column-name-sorted, like the driver). Dev tool only — the engine itself has
no Python dependency.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Decimal -> str for stable compare; floats kept as float64
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    # views derive from the fixtures actually present (not a hardcoded
    # copy of Tables.names that would go stale when a table is added)
    for f in sorted(Path(sf_dir).glob("*.parquet")):
        con.sql(f"CREATE VIEW {f.stem} AS SELECT * FROM '{f}'")
    n_ok = n_bad = 0
    # manifest (written by Verify/VerifyOne) = every query the run
    # ATTEMPTED: a rows-only query that crashed leaves no dir and no
    # oracle entry, and without this it was invisible to the gate
    manifest_path = Path(out_dir) / "manifest.json"
    manifest = set(json.loads(manifest_path.read_text())) \
        if manifest_path.exists() else set()
    for name in sorted(manifest - set(oracle)):
        if not (Path(out_dir) / name).exists():
            print(f"FAIL {name}: attempted (manifest) but no result dir")
            n_bad += 1
    for name in sorted(oracle):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            spark_df = pd.read_parquet(res_dir)
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(a)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:800]}")
            n_bad += 1
    # queries without oracle: rows-only check (driver semantics: rows>0)
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                if n > 0:
                    print(f"ROWS {d.name}: {n} rows (no oracle)")
                else:
                    print(f"FAIL {d.name}: 0 rows (rows-only check needs >0)")
                    n_bad += 1
            except Exception as e:
                print(f"FAIL {d.name}: unreadable result: {e}")
                n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
