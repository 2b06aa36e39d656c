"""Bloom filter (Bloom 1970): membership pre-screen with zero false negatives.

Available for broadcast semi/anti joins when the key set is too large to ship
exactly. Mergeable by OR (same size/seeds). The C1 uniqueness check was
originally planned around a Bloom pre-screen (SURVEY.md §7.1) but ships as a
two-phase raw-Ray hash exchange instead — strictly less IO at every scale
(8-byte hashes, no per-row filter pass; measured in BASELINE.md); the filter
remains the right tool for one-sided membership at 10^12 keys where even the
hash index exceeds a reducer's heap.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class BloomFilter:
    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 n_bits: int | None = None, k: int | None = None,
                 bits: np.ndarray | None = None):
        if n_bits is None:
            n_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
            n_bits = 1 << int(math.ceil(math.log2(n_bits)))  # power of 2 → mask, not mod
        if k is None:
            k = max(1, int(round(n_bits / max(1, capacity) * math.log(2))))
        self.n_bits = n_bits
        self.k = min(k, 8)
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """k positions per item via double hashing h1 + i*h2 (Kirsch–Mitzenmacher)."""
        h = np.asarray(hashes, dtype=np.uint64)
        h1 = h
        h2 = (h >> np.uint64(17)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(self.n_bits - 1)
        return pos

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def add_strings(self, values) -> None:
        self.add_hashes(pd.util.hash_array(np.asarray(values, dtype=object),
                                           categorize=False))

    def contains_strings(self, values) -> np.ndarray:
        return self.contains_hashes(
            pd.util.hash_array(np.asarray(values, dtype=object), categorize=False))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        return BloomFilter(0, n_bits=self.n_bits, k=self.k,
                           bits=np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        return self.k.to_bytes(1, "little") + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        k = b[0]
        bits = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return cls(0, n_bits=len(bits) * 8, k=k, bits=bits)
