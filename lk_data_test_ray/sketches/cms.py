"""Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005).

The fourth classic mergeable summary next to HLL / t-digest / Bloom /
Misra-Gries: a depth×width counter matrix; add hashes each key into one
bucket per row, point query takes the min over rows. Estimates never
undercount; overcount is ≤ εN (ε = e/width) with probability 1−δ
(δ = e^−depth). Merging is elementwise sum — the map-side-partial shape
(one constant-size matrix per block, summed in one reduce).

Reference analog: the reference's exact in-memory Counters
(wordcount-style passes) — exact at toy scale, a constant-size mergeable
partial per block at 10^12 rows.
"""

from __future__ import annotations

import numpy as np

# fixed odd multipliers / offsets per row (splitmix-derived, deterministic)
_A = np.uint64(0x9E3779B97F4A7C15)
_B = np.uint64(0xBF58476D1CE4E5B9)


def _row_hashes(key_hashes: np.ndarray, depth: int,
                width: int) -> np.ndarray:
    """(depth, n) bucket indices from 64-bit key hashes (vectorized)."""
    h = np.asarray(key_hashes, dtype=np.uint64)
    rows = np.empty((depth, len(h)), dtype=np.int64)
    x = h.copy()
    for d in range(depth):
        x = (x + _B) * _A  # one splitmix-style round per row
        x ^= x >> np.uint64(31)
        rows[d] = (x % np.uint64(width)).astype(np.int64)
    return rows


class CountMin:
    __slots__ = ("depth", "width", "table")

    def __init__(self, depth: int = 4, width: int = 2048,
                 table: np.ndarray | None = None):
        self.depth, self.width = depth, width
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))

    def add_hashed(self, key_hashes: np.ndarray,
                   counts: np.ndarray) -> None:
        """Add pre-hashed keys with weights (vectorized np.add.at)."""
        if not len(key_hashes):
            return
        rows = _row_hashes(key_hashes, self.depth, self.width)
        c = np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], rows[d], c)

    def query_hashed(self, key_hashes: np.ndarray) -> np.ndarray:
        """Point estimates (min over rows) for pre-hashed keys."""
        if not len(key_hashes):
            return np.empty(0, np.int64)
        rows = _row_hashes(key_hashes, self.depth, self.width)
        est = self.table[0][rows[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][rows[d]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CountMin(self.depth, self.width, self.table + other.table)

    @classmethod
    def merge_many(cls, sketches: list["CountMin"]) -> "CountMin":
        out = sketches[0]
        for s in sketches[1:]:
            out = out.merge(s)
        return out

    def to_bytes(self) -> bytes:
        import struct

        return struct.pack("<ii", self.depth, self.width) \
            + self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        import struct

        depth, width = struct.unpack_from("<ii", b)
        table = np.frombuffer(b, dtype="<i8", offset=8) \
            .reshape(depth, width).astype(np.int64)
        return cls(depth, width, table)
