"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and, where an
``oracle_sql()`` entry exists, compares against DuckDB: row count, column
names, and order-insensitive values (rows sorted by all columns, exact
comparison; floats compared to 1e-9 after the shared rounding).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

def pinned_to_sf001(oracles: dict) -> set:
    """Queries whose rendered oracle SQL reads the sf0.01 pages fixture by
    absolute path (oracle_sql() is static; the driver compares at sf0.01) —
    detected from the SQL text so new fixture-backed queries are never
    silently compared against the wrong scale."""
    return {name for name, sql in oracles.items()
            if any(p in sql for p in ("/lk_pages/", "/lk_lines/", "/lk_recrawl/"))}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint", "int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"SCHEMA MISMATCH mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"ROWCOUNT MISMATCH mine={len(mine)} oracle={len(oracle)}"
    a, b = normalize(mine), normalize(oracle)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            ok = np.allclose(a[c].astype(float), b[c].astype(float),
                             atol=1e-9, rtol=0, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        if not ok:
            bad = (a[c] != b[c])
            i = int(np.argmax(bad.to_numpy())) if bad.any() else 0
            return (f"VALUE MISMATCH col={c} row{i}: "
                    f"mine={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True,
                 logging_level="ERROR")
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name}: RAY ERROR {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if (name in pinned_to_sf001(oracles)
                and not sf_dir.rstrip("/").endswith("sf0.01")):
            # these oracles read the sf0.01 pages fixture by absolute path
            # (oracle_sql() is static; the driver compares at sf0.01) — at
            # any other sf the comparison mismatches by construction
            print(f"{name}: skipped (oracle pinned to the sf0.01 fixture) "
                  f"[{dt:.1f}s, {len(mine)} rows]")
            continue
        if name in oracles:
            try:
                ora = con.execute(oracles[name]).df()
            except Exception as ex:
                print(f"{name}: ORACLE SQL ERROR {ex}")
                n_fail += 1
                continue
            verdict = compare(name, mine, ora)
        else:
            verdict = f"rows-only ({len(mine)} rows)"
        status = verdict if verdict.startswith(("OK", "rows-only")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            n_fail += 1
        print(f"{name}: {status}  [{dt:.1f}s, {len(mine)} rows]")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
