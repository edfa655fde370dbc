"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on one sf dir, compare row count, columns,
and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: bytes(v).decode() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name, got, want):
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}")
        return problems
    g, w = canon(got), canon(want)
    if len(g) != len(w):
        problems.append(f"row count {len(g)} vs {len(w)}")
        return problems
    import numpy as np

    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
            gv = np.asarray(gv, dtype=np.float64)
            wv = np.asarray(wv, dtype=np.float64)
            bad = ~(np.isclose(gv, wv, rtol=0, atol=1e-9) | (np.isnan(gv) & np.isnan(wv)))
        else:
            bad = gv != wv
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(f"col {c}: {int(bad.sum())} mismatches, first at row {i}: {gv[i]!r} vs {wv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            report[name] = {"status": "QUERY_ERROR", "error": f"{type(e).__name__}: {e}"}
            print(f"[{name}] QUERY ERROR: {e}")
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            report[name] = {"status": "ROWS_ONLY", "rows": len(res), "sec": round(dt, 2)}
            print(f"[{name}] rows-only: {len(res)} rows in {dt:.1f}s")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            report[name] = {"status": "ORACLE_ERROR", "error": str(e)}
            print(f"[{name}] ORACLE ERROR: {e}")
            continue
        problems = compare(name, res, want)
        if problems:
            report[name] = {"status": "MISMATCH", "problems": problems,
                            "rows": len(res), "sec": round(dt, 2)}
            print(f"[{name}] MISMATCH ({len(res)} rows, {dt:.1f}s):")
            for p in problems:
                print(f"    - {p}")
        else:
            report[name] = {"status": "OK", "rows": len(res), "sec": round(dt, 2)}
            print(f"[{name}] OK: {len(res)} rows in {dt:.1f}s")

    n_ok = sum(1 for r in report.values() if r["status"] == "OK")
    n_ro = sum(1 for r in report.values() if r["status"] == "ROWS_ONLY")
    n_bad = len(report) - n_ok - n_ro
    print(f"\n{n_ok} OK, {n_ro} rows-only, {n_bad} problems / {len(report)} queries")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(report, f, indent=1)
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
