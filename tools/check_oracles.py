#!/usr/bin/env python
"""Driver-simulation: run every queries() entry AND its oracle_sql() at
sf0.01 side-by-side, compare row count + dtypes + exact sorted values —
the same gate the round driver applies (CORRECTNESS_r{N}.json).

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_entry():
    spec = importlib.util.spec_from_file_location("_ray_entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    entry = load_entry()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            res = qs[name](args.sf)
            eng = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        except Exception as e:  # keep sweeping; record the crash as a failure
            failures.append(name)
            print(f"  {name:24s} CRASH: {type(e).__name__}: {str(e)[:200]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(eng):7d} rows   ({t1-t0:5.1f}s ray)")
            continue
        ora = con.sql(oracles[name]).df()
        a, b = norm(eng), norm(ora)
        status = "OK"
        if a.shape != b.shape:
            status = f"SHAPE {a.shape} != {b.shape}"
        elif list(a.dtypes) != list(b.dtypes):
            status = f"DTYPES {dict(a.dtypes)} != {dict(b.dtypes)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            status = f"VALUES differ in {bad_cols} ({int(neq.any(axis=1).sum())} rows)"
        ok = status == "OK"
        if not ok:
            failures.append(name)
        print(f"  {name:24s} {'OK ' if ok else 'FAIL'}: {len(eng):7d} rows   "
              f"({t1-t0:5.1f}s ray, {time.time()-t1:4.1f}s sql)  {status if not ok else ''}")
    print(f"\n{len(names) - len(failures)}/{len(names)} matched; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
