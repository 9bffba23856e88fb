#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query.

Usage: python3 tools/check_determinism.py <dir_a> <dir_b>

Run graft.Verify twice into separate dirs first. Any query whose two runs
differ is nondeterministic and would randomly fail the driver's oracle gate
(float folds with unstable partition order, unstable top-k ties, etc).
"""
import sys, os
import duckdb
import numpy as np


def norm(df):
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df[sorted(df.columns)].sort_values(sorted(df.columns)) \
        .reset_index(drop=True)


def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    bad = 0
    for n in names:
        a = norm(con.execute(
            f"SELECT * FROM read_parquet('{a_dir}/{n}/*.parquet')").df())
        b = norm(con.execute(
            f"SELECT * FROM read_parquet('{b_dir}/{n}/*.parquet')").df())
        same = a.shape == b.shape and all(a[c].equals(b[c]) for c in a.columns)
        if not same:
            bad += 1
            print("NONDETERMINISTIC:", n, a.shape, b.shape)
    print(f"checked {len(names)} queries, {bad} nondeterministic")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
