"""String-similarity kernels for fuzzy matching (entity resolution).

``levenshtein_matrix`` computes the full edit-distance grid between two
name lists with the DP loops running over CHARACTER positions only
(L_a × L_b ≈ 625 steps for 25-char names); every step is one numpy op
over the whole |a| × |b| pair grid, so the per-pair Python cost is zero.
Unit insert/delete/substitute costs — byte-level, which equals DuckDB's
``levenshtein`` for ASCII inputs (fuzz-tested in tests/test_extract.py).

Memory: the DP state is (L_b+1, |a|, |b|) int16 — size the probe batch
and keep the ``a`` side small (it is the broadcast side of the fuzzy
join); 100 × 4096 pairs ≈ 21 MB of state.
"""

from __future__ import annotations

import numpy as np


def _pack(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    enc = [s.encode("utf-8") for s in names]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    L = int(lens.max()) if len(lens) else 0
    out = np.zeros((len(enc), L), dtype=np.uint8)
    for i, e in enumerate(enc):
        out[i, :len(e)] = np.frombuffer(e, dtype=np.uint8)
    return out, lens


def levenshtein_matrix(a: list[str], b: list[str]) -> np.ndarray:
    """(len(a), len(b)) int32 matrix of edit distances."""
    S, C = len(a), len(b)
    if S == 0 or C == 0:
        return np.zeros((S, C), dtype=np.int32)
    A, lenA = _pack(a)
    B, lenB = _pack(b)
    La, Lb = A.shape[1], B.shape[1]
    R = np.zeros((S, C), dtype=np.int32)
    if (lenA == 0).any():
        R[lenA == 0] = lenB[None, :]
    dp_prev = np.empty((Lb + 1, S, C), dtype=np.int16)
    dp_cur = np.empty_like(dp_prev)
    dp_prev[:] = np.arange(Lb + 1, dtype=np.int16)[:, None, None]
    for i in range(1, La + 1):
        dp_cur[0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            cost = (ai[:, None] != B[None, :, j - 1]).astype(np.int16)
            np.minimum(dp_prev[j] + 1, dp_cur[j - 1] + 1, out=dp_cur[j])
            np.minimum(dp_cur[j], dp_prev[j - 1] + cost, out=dp_cur[j])
        mask = lenA == i
        if mask.any():
            dpc = dp_cur[:, mask, :]
            R[mask] = np.take_along_axis(
                dpc, lenB.reshape(1, 1, C).astype(np.intp), axis=0)[0]
        dp_prev, dp_cur = dp_cur, dp_prev
    return R
