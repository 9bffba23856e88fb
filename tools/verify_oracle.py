#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle check.

Usage: python3 tools/verify_oracle.py <verify_out_dir> <sf_dir>

Loads each <verify_out_dir>/<name>/*.parquet produced by graft.Verify, runs
the matching SQL from oracle_sql.json in DuckDB over the sf_dir tables,
sorts columns by name and rows by value, and reports MATCH/MISMATCH.
"""
import sys, json
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    # The DRIVER's comparator cannot hash array cells (pandas sort_values on
    # numpy.ndarray columns raises) — flag ANY dump with array columns, even
    # rows-only ones, as driver-incompatible.
    import glob as _glob, os as _os
    for d in sorted(_glob.glob(f"{out_dir}/*/")):
        name = _os.path.basename(d.rstrip("/"))
        try:
            df = con.execute(
                f"SELECT * FROM read_parquet('{d}*.parquet') LIMIT 100").df()
            arr_cols = [c for c in df.columns if df[c].apply(
                lambda v: isinstance(v, (list, np.ndarray))).any()]
            if arr_cols:
                bad += 1
                print(name, "DRIVER-INCOMPATIBLE array columns:", arr_cols)
        except Exception:
            pass
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.execute(sql).df()
            g = norm(got[sorted(got.columns)])
            e = norm(exp[sorted(exp.columns)])
            same = (g.shape == e.shape and list(g.columns) == list(e.columns)
                    and all(g[c].equals(e[c]) for c in g.columns))
            print(name, g.shape, e.shape, "MATCH" if same else "MISMATCH")
            if not same:
                bad += 1
                if g.shape == e.shape:
                    for c in g.columns:
                        if not g[c].equals(e[c]):
                            if g[c].dtype != e[c].dtype:
                                print(f"  col={c} DTYPE spark={g[c].dtype} "
                                      f"duckdb={e[c].dtype}")
                            d = g[c] != e[c]
                            if d.any():
                                print(f"  col={c} spark={g[c][d].iloc[0]!r} "
                                      f"duckdb={e[c][d].iloc[0]!r} "
                                      f"({int(d.sum())} rows differ)")
        except Exception as ex:
            bad += 1
            print(name, "ERROR", ex)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
