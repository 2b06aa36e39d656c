"""Z-order (Morton) clustered storage + two-dimensional zone-map pruning.

The lakehouse data-layout operator (Delta OPTIMIZE ZORDER / Iceberg
sort-order): interleaving the bits of two quantized dimensions before ONE
global sort makes file/row-group min-max stats selective on BOTH columns
at once, so a corner predicate (``user_id`` range AND ``ts`` range) prunes
most of the layout at the read — a linear sort can only ever prune its
leading column. Reference analog: none (the reference re-reads whole
files); this is the "prune at the read" scale rule made into a write-side
operator.

Scale shape: the quantization bounds come from one distributed min/max
partial pass; the z column is pure vectorized bit math per batch; the one
global sort IS the cost of clustering (documented all-to-all — run it
once per snapshot, amortized over every subsequent pruned read); files
are written per-block so footer stats are the zone map.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of x's low 16 bits to even positions (u32 → u32)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit quantized dims into one 32-bit z-value."""
    return (_part1by1(a) << np.uint64(1)) | _part1by1(b)


def quantize(v: np.ndarray, lo: float, hi: float,
             bits: int = 16) -> np.ndarray:
    """Map values in [lo, hi] onto [0, 2^bits-1] (monotone, clipped)."""
    span = max(hi - lo, 1.0)
    q = np.floor((v.astype(np.float64) - lo) / span * ((1 << bits) - 1))
    return np.clip(q, 0, (1 << bits) - 1).astype(np.uint64)


def minmax2(ds: rd.Dataset, col_a: str, col_b: str) -> tuple:
    """One distributed pass of min/max partials for both columns
    (col_b may be a timestamp — compared as epoch µs int64)."""
    def partial(batch: pa.Table) -> pa.Table:
        a = batch[col_a]
        b = batch[col_b]
        if pa.types.is_timestamp(b.type):
            b = pc.cast(b, pa.int64())
        ma, mb = pc.min_max(a), pc.min_max(b)
        return pa.table({
            "a_min": pa.array([ma["min"].as_py()], pa.int64()),
            "a_max": pa.array([ma["max"].as_py()], pa.int64()),
            "b_min": pa.array([mb["min"].as_py()], pa.int64()),
            "b_max": pa.array([mb["max"].as_py()], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (int(parts["a_min"].min()), int(parts["a_max"].max()),
            int(parts["b_min"].min()), int(parts["b_max"].max()))


def zorder_write(ds: rd.Dataset, col_a: str, col_b: str, out_dir: str,
                 bounds: tuple, n_files: int = 16) -> None:
    """Cluster ``ds`` by morton(col_a, col_b) and write ``n_files``
    parquet files (tmp + rename, idempotent re-run safe)."""
    a_lo, a_hi, b_lo, b_hi = bounds

    def add_z(batch: pa.Table) -> pa.Table:
        a = batch[col_a].to_numpy(zero_copy_only=False)
        b = batch[col_b]
        if pa.types.is_timestamp(b.type):
            b = pc.cast(b, pa.int64())
        b = b.to_numpy(zero_copy_only=False)
        z = morton2(quantize(a, a_lo, a_hi), quantize(b, b_lo, b_hi))
        return batch.append_column("z", pa.array(z.view(np.int64)))

    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    (ds.map_batches(add_z, batch_format="pyarrow")
       .sort("z")
       .repartition(n_files)
       .drop_columns(["z"])
       .write_parquet(tmp))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)


def overlapping_files(out_dir: str, col_a: str, col_b: str,
                      a_rng: tuple, b_rng: tuple) -> tuple[list, int]:
    """Zone-map prune: the files whose footer min/max stats overlap BOTH
    ranges (this is exactly what a lakehouse reader does with its
    manifest; parquet footers are the manifest here). Returns
    (survivors, total)."""
    files = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.endswith(".parquet"))
    def to_us(v):
        if hasattr(v, "timestamp"):
            return int(v.timestamp() * 1_000_000)
        return v

    keep = []
    for f in files:
        md = pq.read_metadata(f)
        names = md.schema.to_arrow_schema().names
        ia, ib = names.index(col_a), names.index(col_b)
        amins, amaxs, bmins, bmaxs = [], [], [], []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sa, sb = rg.column(ia).statistics, rg.column(ib).statistics
            amins.append(sa.min)
            amaxs.append(sa.max)
            bmins.append(to_us(sb.min))
            bmaxs.append(to_us(sb.max))
        if not amins:
            continue
        a_min, a_max = min(amins), max(amaxs)
        b_min, b_max = min(bmins), max(bmaxs)
        if (a_min <= a_rng[1] and a_max >= a_rng[0]
                and b_min <= b_rng[1] and b_max >= b_rng[0]):
            keep.append(f)
    return keep, len(files)
