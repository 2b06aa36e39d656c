"""Snapshot diff: added / removed / changed keys between two corpus
snapshots.

The reference's update model is immutable snapshots — every enrichment
writes a NEW tree and consistency is asserted by re-running checks over it
(``scripts/enrich_person_indices.py:23-57``, S5 in SURVEY §2).  The missing
primitive there is telling WHAT changed between two snapshots without
re-reading either in full.  This operator reduces each side to
``(key, 64-bit content hash)`` inside ``map_batches`` — 16 bytes per row
cross the exchange regardless of payload width — then a single full-outer
hash join classifies every key.

Collision caveat (documented per the custom-operator rule): equal hashes are
treated as "unchanged", so a 64-bit collision can hide a change with
p ≈ n²/2⁶⁵ per key-pair; the driver oracle compares true values and agrees
at test scale.  For forensic certainty re-read the "changed" set's rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..relational import drop_empty_blocks

_FNV = np.uint64(0x100000001B3)


def _row_hashes(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Order-sensitive FNV fold of per-column SipHash streams (process-stable
    via ``pd.util.hash_array``'s fixed key)."""
    import pandas as pd

    h = np.full(batch.num_rows, 0xCBF29CE484222325, dtype=np.uint64)
    for c in cols:
        arr = batch[c].to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            hc = pd.util.hash_array(arr.astype(object), categorize=False)
        else:
            hc = pd.util.hash_array(arr, categorize=False)
        h = (h * _FNV) ^ hc
    return h


def snapshot_diff(a: rd.Dataset, b: rd.Dataset, key: str,
                  cols: list[str]) -> rd.Dataset:
    """Returns (key, status) with status ∈ {'added','removed','changed'};
    unchanged keys are dropped (at 10^12 rows they are ~all of them)."""

    def to_kh(hname: str, kname: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                kname: batch[key],
                hname: pa.array(_row_hashes(batch, cols).view(np.int64)),
            })
        return fn

    ka = drop_empty_blocks(a.map_batches(to_kh("h_a", key),
                                         batch_format="pyarrow"))
    kb = drop_empty_blocks(b.map_batches(to_kh("h_b", "__kb"),
                                         batch_format="pyarrow"))
    from ..relational import exchange_join

    j = exchange_join(ka, kb, key, "__kb", how="full_outer")

    def classify(batch: pa.Table) -> pa.Table:
        ha, hb = batch["h_a"], batch["h_b"]
        added = pc.is_null(ha)
        removed = pc.is_null(hb)
        status = pc.if_else(
            added, pa.scalar("added"),
            pc.if_else(removed, pa.scalar("removed"), pa.scalar("changed")))
        keep = pc.or_(pc.or_(added, removed),
                      pc.not_equal(pc.fill_null(ha, 0), pc.fill_null(hb, 0)))
        # full_outer merges the key pair into the left key column
        return pa.table({key: batch[key], "status": status}).filter(keep)

    return j.map_batches(classify, batch_format="pyarrow")
