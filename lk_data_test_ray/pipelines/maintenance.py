"""Table-maintenance operators: parquet small-file compaction.

The 100-TB operational task the reference never needed (its corpus is ~4k
XML files checked in git — ``data/editions/``): a long-lived ingest
landing thousands of tiny parquet files per partition makes every
downstream scan pay one open/footer-read per file. Compaction rewrites a
fragmented directory into ~target-size files in ONE streaming pass —
read → repartition → write, no driver materialization — and is safe to
re-run (fresh output directory, atomic rename).
"""

from __future__ import annotations

import math
import os
import shutil

import ray.data as rd


def compact_parquet(in_dir: str, out_dir: str,
                    target_bytes: int = 128 << 20,
                    rows_per_block: int | None = None) -> dict:
    """Rewrite ``in_dir``'s parquet files into ``ceil(size/target_bytes)``
    files (or ``ceil(rows/rows_per_block)`` when given — deterministic
    across runs, unlike byte estimates). Returns
    ``{files_in, files_out, rows}``. Output lands in ``out_dir`` via a
    ``.tmp`` + rename, so a killed compaction never leaves a half-written
    directory where readers look.
    """
    files_in = [f for f in os.listdir(in_dir) if f.endswith(".parquet")]
    ds = rd.read_parquet(in_dir)
    n_rows = ds.count()
    if rows_per_block is not None:
        n_blocks = max(1, math.ceil(n_rows / rows_per_block))
    else:
        size = ds.size_bytes() or 0
        n_blocks = max(1, math.ceil(size / target_bytes))
    tmp = out_dir + ".tmp"
    old = out_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    ds.repartition(n_blocks).write_parquet(tmp)
    # Swap so a valid directory is installed at every instant: move the
    # current output aside, rename the new one in, then drop the old copy.
    # A crash mid-swap leaves either the old or the new output at out_dir
    # (or the old one recoverable at .old) — never a missing directory.
    if os.path.isdir(out_dir):
        os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    files_out = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {"files_in": len(files_in), "files_out": len(files_out),
            "rows": n_rows}
