"""Mergeable approximate top-k (heavy hitters) sketch.

The distributed "top-M partial + residual bound" scheme (a batched
Misra-Gries / SpaceSaving variant): each partial keeps its local exact
top-``m`` (item, count) pairs plus the LARGEST dropped count as the
residual bound. Merging concatenates partials, sums counts per item, and
keeps the new top-``m``; an item absent from some partial may have been
undercounted there by at most that partial's bound, so the merged sketch
carries per-item lower/upper count bounds. With ``m`` a few × k, the true
top-k are guaranteed in the sketch whenever the k-th count exceeds the
accumulated bound — the classic condition, asserted in tests.

Reference analog: exact in-memory Counters (the reference's wordcount-style
passes) — exact at toy scale, a constant-size mergeable partial per block
at 10^12 tokens.
"""

from __future__ import annotations

import pickle

import numpy as np


class ApproxTopK:
    __slots__ = ("m", "items", "lo", "hi", "bound")

    def __init__(self, m: int = 128, items: np.ndarray | None = None,
                 lo: np.ndarray | None = None, hi: np.ndarray | None = None,
                 bound: int = 0):
        self.m = m
        self.items = items if items is not None else np.empty(0, object)
        self.lo = lo if lo is not None else np.empty(0, np.int64)
        self.hi = hi if hi is not None else np.empty(0, np.int64)
        self.bound = bound          # max count ever dropped from this sketch

    @classmethod
    def from_counts(cls, items: np.ndarray, counts: np.ndarray,
                    m: int = 128) -> "ApproxTopK":
        """Build from EXACT (item, count) pairs of one block (vectorized)."""
        counts = np.asarray(counts, dtype=np.int64)
        items = np.asarray(items, dtype=object)
        if len(items) > m:
            # keep top-m by count (ties: item asc, for determinism)
            order = np.lexsort((items.astype(str), -counts))
            kept, dropped = order[:m], order[m:]
            bound = int(counts[dropped].max()) if len(dropped) else 0
            items, counts = items[kept], counts[kept]
        else:
            bound = 0
        return cls(m, items, counts.copy(), counts.copy(), bound)

    @classmethod
    def merge_many(cls, sketches: list["ApproxTopK"]) -> "ApproxTopK":
        """One-shot merge (concat + group-sum + one truncation)."""
        if not sketches:
            return cls()
        m = sketches[0].m
        all_items = np.concatenate([s.items for s in sketches]) \
            if any(len(s.items) for s in sketches) else np.empty(0, object)
        total_bound = sum(s.bound for s in sketches)
        if len(all_items) == 0:
            return cls(m, bound=total_bound)
        all_lo = np.concatenate([s.lo for s in sketches])
        # an item missing from sketch s may hide up to s.bound occurrences
        miss_hi = np.concatenate([
            s.hi + (total_bound - s.bound) for s in sketches])
        uniq, inv = np.unique(all_items.astype(str), return_inverse=True)
        lo = np.bincount(inv, weights=all_lo).astype(np.int64)
        # hi(x) = Σ_{s∋x} hi_s(x) + Σ_{s∌x} bound_s; accumulate
        # (hi_s + total_bound − bound_s) per occurrence, then subtract the
        # (n_present − 1) over-counted total_bound terms
        hi = np.bincount(inv, weights=miss_hi).astype(np.int64)
        n_present = np.bincount(inv).astype(np.int64)
        hi -= (n_present - 1) * total_bound
        order = np.lexsort((uniq, -lo))
        kept, dropped = order[:m], order[m:]
        # an item absent from the merged sketch was either dropped here
        # (true count ≤ its hi) or absent from every partial (≤ total_bound)
        new_bound = max(total_bound,
                        int(hi[dropped].max()) if len(dropped) else 0)
        return cls(m, uniq[kept].astype(object), lo[kept], hi[kept],
                   new_bound)

    def top(self, k: int) -> list[tuple[str, int, int]]:
        """Top-k by lower-bound count → (item, count_lo, count_hi)."""
        if len(self.items) == 0:
            return []
        order = np.lexsort((self.items.astype(str), -self.lo))[:k]
        return [(str(self.items[i]), int(self.lo[i]), int(self.hi[i]))
                for i in order]

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            (self.m, list(self.items), self.lo.tolist(),
             self.hi.tolist(), self.bound))

    @classmethod
    def from_bytes(cls, b: bytes) -> "ApproxTopK":
        m, items, lo, hi, bound = pickle.loads(b)
        return cls(m, np.array(items, object), np.array(lo, np.int64),
                   np.array(hi, np.int64), bound)
