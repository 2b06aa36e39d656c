"""t-digest quantile sketch (Dunning & Ertl 2019) — simplified merging variant.

Mergeable, bounded size (~2*delta centroids), vectorized batch updates.
Reference analog: none (reference computes nothing distributional beyond exact
counters); mandated by the north_star's per-partition column stats.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "counts", "_buf")

    def __init__(self, delta: int = 100,
                 means: np.ndarray | None = None,
                 counts: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.counts = counts if counts is not None else np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # -- update ---------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            self._buf.append(v)
        if sum(b.size for b in self._buf) > 32 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            new_means = np.concatenate([self.means] + self._buf)
            new_counts = np.concatenate(
                [self.counts] + [np.ones(b.size) for b in self._buf])
            self._buf = []
        else:
            new_means, new_counts = self.means, self.counts
        if new_means.size == 0:
            return
        order = np.argsort(new_means, kind="stable")
        m, c = new_means[order], new_counts[order]
        total = c.sum()
        # scale function k1 (asin-based) size limit
        out_m, out_c = [], []
        cum = 0.0
        cur_m, cur_c = m[0], c[0]
        for i in range(1, m.size):
            q = (cum + cur_c + c[i] / 2) / total
            size_limit = 4 * total * max(q * (1 - q), 1e-9) / self.delta
            if cur_c + c[i] <= size_limit:
                cur_m = (cur_m * cur_c + m[i] * c[i]) / (cur_c + c[i])
                cur_c += c[i]
            else:
                out_m.append(cur_m); out_c.append(cur_c)
                cum += cur_c
                cur_m, cur_c = m[i], c[i]
        out_m.append(cur_m); out_c.append(cur_c)
        self.means = np.array(out_m)
        self.counts = np.array(out_c)

    # -- merge ----------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        return TDigest.merge_many([self, other])

    @classmethod
    def merge_many(cls, digests: "list[TDigest]") -> "TDigest":
        """One-shot merge of many digests: concatenate ALL centroids, compress
        ONCE — a fold of pairwise merges compresses O(n) times and dominated
        the driver's stats-merge wall time at 160 partition partials."""
        if not digests:
            return cls()
        for d in digests:
            d._compress()
        out = cls(digests[0].delta,
                  np.concatenate([d.means for d in digests]),
                  np.concatenate([d.counts for d in digests]))
        out._compress()
        return out

    # -- query ----------------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        total = self.counts.sum()
        target = q * total
        cum = np.cumsum(self.counts) - self.counts / 2
        return float(np.interp(target, cum, self.means))

    def count(self) -> float:
        self._compress()
        return float(self.counts.sum())

    # -- serialization --------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        n = self.means.size
        return (self.delta.to_bytes(4, "little") + n.to_bytes(4, "little")
                + self.means.tobytes() + self.counts.tobytes())

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta = int.from_bytes(b[:4], "little")
        n = int.from_bytes(b[4:8], "little")
        means = np.frombuffer(b[8:8 + 8 * n], dtype=np.float64).copy()
        counts = np.frombuffer(b[8 + 8 * n:8 + 16 * n], dtype=np.float64).copy()
        return cls(delta, means, counts)
