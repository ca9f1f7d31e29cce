#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the library).

Runs graft.Verify at a given sf dir, then replays each oracle_sql.json query
in DuckDB over the same parquet tables and compares values column-by-column
(columns sorted by name, rows sorted by all columns) — the same shape of
check the driver applies.

Usage: python3 scripts/check_oracle.py [sfdir] [outdir]
"""
import json
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify failed")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    failures = 0
    names = sorted(p.name for p in OUT.iterdir() if p.is_dir())
    for name in names:
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in (OUT / name).glob("*.parquet")],
            ignore_index=True)
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            failures += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: schema mismatch spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name}: row count {len(a)} vs {len(b)}")
            failures += 1
            continue
        # Mirror the driver's hash compare: an int on one side and a float on
        # the other (e.g. DuckDB sum(INTEGER) -> HUGEINT -> float) prints
        # differently (56017 vs 56017.0) and flips the driver's hash even
        # when values are numerically equal — so dtype KINDS must match, and
        # values compare exactly (floats are pre-rounded on both sides).
        kind_mismatch = [
            c for c in a.columns
            if (a[c].dtype.kind in "iu") != (b[c].dtype.kind in "iu")
            or (a[c].dtype.kind == "f") != (b[c].dtype.kind == "f")
        ]
        if kind_mismatch:
            print(f"✗ {name}: dtype-kind mismatch (driver hash would differ): "
                  + ", ".join(f"{c} spark={a[c].dtype} duck={b[c].dtype}" for c in kind_mismatch))
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"✓ {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"✗ {name}: value mismatch\n{str(e)[:1500]}")
            # print the first differing rows with full precision: a 1-ulp
            # boundary flip under round() looks identical at print precision,
            # so the raw values are what identify it (fix by query design —
            # tie-breaks/casts — never by loosening this compare)
            diff_mask = (a != b) & ~(a.isna() & b.isna())
            bad_rows = diff_mask.any(axis=1)
            for idx in list(a.index[bad_rows])[:5]:
                cols = [c for c in a.columns if diff_mask.at[idx, c]]
                for c in cols:
                    print(f"    row {idx} col {c}: spark={a.at[idx, c]!r} duck={b.at[idx, c]!r}")
            failures += 1
    missing = set(oracle) - set(names)
    if missing:
        print(f"✗ oracle entries with no query output: {missing}")
        failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
