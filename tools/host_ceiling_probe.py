"""No-Ray control experiment for the single-box scaling ceiling.

Runs the row-phase work (parquet row-group read + full RowChecker._process)
in a raw ``multiprocessing`` pool — no Ray, no object store, no scheduler —
at several worker counts over the same fixture. If aggregate rows/s stops
growing with workers here too, the ceiling is host-level (shared memory
bandwidth / virtualized CPU overcommit), not a property of the engine.

Usage: python tools/host_ceiling_probe.py [n_rows]
Prints one JSON line: {workers: rows_per_sec, ...}.
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(args):
    path, lo, hi = args
    import pyarrow.parquet as pq

    from lk_data_test_ray.checks.row import RowChecker

    rc = RowChecker()
    tbl = pq.ParquetFile(path).read_row_groups(list(range(lo, hi)))
    rc._process(tbl, 0)
    return tbl.num_rows


def items_for(fix: str, step: int = 4) -> list:
    import pyarrow.parquet as pq

    items = []
    for f in sorted(glob.glob(os.path.join(fix, "pages", "*.parquet"))):
        n_rg = pq.ParquetFile(f).metadata.num_row_groups
        for lo in range(0, n_rg, step):
            items.append((f, lo, min(n_rg, lo + step)))
    return items


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_rows = int(args[0]) if args else 2_400_000
    # --pairs: only the worker counts the scaling gate compares
    # --count=N: ONE worker count (bench.py's same-run denominator)
    counts = (2, 8, 32) if "--pairs" in sys.argv else (1, 2, 8, 16, 32)
    for a in sys.argv[1:]:
        if a.startswith("--count="):
            counts = (int(a.split("=", 1)[1]),)
        elif a.startswith("--counts="):
            counts = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    from lk_data_test_ray.sources.pages import ensure_pages

    fix = ensure_pages(n_rows)
    items = items_for(fix)
    out = {}
    for workers in counts:
        with mp.Pool(workers) as pool:
            pool.map(_work, items[:workers])  # warm imports
            t0 = time.time()
            rows = sum(pool.map(_work, items, chunksize=1))
            dt = time.time() - t0
        out[workers] = round(rows / dt)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
