#!/usr/bin/env python3
"""Cross-RUN determinism check (NOT part of the library): compare two
graft.Verify output directories content-wise (columns sorted, rows sorted,
exact values). The oracle gate proves one run matches DuckDB; this proves
a second run matches the first — catching nondeterminism (AQE layout,
aggregation merge order, execution-time randomness) that a single-run
gate cannot see.

Usage: python3 scripts/check_determinism.py /tmp/verify_runA /tmp/verify_runB
"""
import sys
from pathlib import Path

import pandas as pd

A = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_runA")
B = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_runB")


def load(d: Path) -> pd.DataFrame:
    files = sorted(d.glob("*.parquet"))
    if not files:
        raise ValueError(f"{d}: no parquet files (empty or partial Verify output)")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    failures = 0
    # union of both runs' query dirs: a query present only in run B is just
    # as much a determinism failure as one present only in run A
    names = sorted({p.name for d in (A, B) if d.is_dir()
                    for p in d.iterdir() if p.is_dir()})
    if not names:
        sys.exit(f"no query directories under {A} or {B}")
    for name in names:
        if not (A / name).is_dir():
            print(f"✗ {name}: missing in first run")
            failures += 1
            continue
        if not (B / name).is_dir():
            print(f"✗ {name}: missing in second run")
            failures += 1
            continue
        try:
            a, b = load(A / name), load(B / name)
        except ValueError as e:
            print(f"✗ {name}: {e}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"✓ {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"✗ {name}: runs differ\n{str(e)[:800]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
