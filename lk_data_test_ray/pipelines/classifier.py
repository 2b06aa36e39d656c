"""Distributed trained quality classifier (fasttext-style hashed linear
model) — the model-based document-filtering step of an LLM data pipeline
(CCNet / GPT-3 use a linear classifier over hashed n-gram features to keep
"wikipedia-like" pages; Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification").

Reference parity note: the reference has no trained models — this is one of
the beyond-reference LLM-pipeline components (like dedup/ANN), built on the
same distributed-aggregation machinery as the rest of the engine.

Design (scale-first):
- Features are HASHED token counts (feature id = stable 64-bit token hash
  mod D) — no vocabulary build, no dictionary shuffle, constant driver
  state of D+1 floats.
- Training is full-batch logistic regression by synchronous gradient
  descent: each epoch broadcasts the weight vector, every block computes a
  SPARSE gradient partial (np.add.at over token columns — the dense
  document-term matrix is never materialized), partials (D+2 floats per
  block) are summed on the driver, one update per epoch.
- The featurized training set is materialized ONCE (doc row → (cols,
  counts) triplets) so E epochs do not re-tokenize E times. At 100-TB
  scale you train on a deterministic hash-sample (the default here: 20%)
  — bounded materialization — and score the FULL corpus with one
  stateless broadcast pass, which is exactly what this module does.
- Everything is float64 and seeded; across-run differences are limited to
  partial-sum ordering (≤1e-12 relative), asserted in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import hash_strings64

TOKEN_SPLIT = r"\s+"


def _featurize_batch(batch: pa.Table, text_col: str, D: int):
    """(parent_row, feature_col, count) triplets for one batch — all Arrow/
    numpy, tokens hashed once per *unique* token via dictionary encoding."""
    texts = pc.fill_null(batch[text_col].combine_chunks(), "")
    toks = pc.split_pattern_regex(texts, TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[keep]
    dict_arr = flat.filter(pa.array(keep)).dictionary_encode()
    uniq = dict_arr.dictionary.to_numpy(zero_copy_only=False)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    cols_of_uniq = (hash_strings64(uniq) % np.uint64(D)).astype(np.int64)
    cols = cols_of_uniq[codes]
    # collapse (row, col) duplicates to counts
    key = parent.astype(np.int64) * D + cols
    uk, cnt = np.unique(key, return_counts=True)
    return (uk // D).astype(np.int64), (uk % D).astype(np.int64), \
        cnt.astype(np.float64)


def featurize(ds: rd.Dataset, text_col: str, label_col: str,
              D: int = 1024) -> rd.Dataset:
    """Hashed sparse features per document: one output row per document,
    with list columns ``cols``/``cnts`` (its nonzero feature ids and
    counts) and the float64 label. One pass; no shuffle."""
    out_schema = pa.schema([
        ("cols", pa.list_(pa.int64())), ("cnts", pa.list_(pa.float64())),
        ("y", pa.float64())])

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return out_schema.empty_table()
        rows, cols, cnts = _featurize_batch(batch, text_col, D)
        # rows is sorted (np.unique of row-major keys) → offsets by bincount
        per_row = np.bincount(rows, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(per_row)]).astype(np.int32)
        y = batch[label_col].cast(pa.float64())
        return pa.table({
            "cols": pa.ListArray.from_arrays(pa.array(offsets),
                                             pa.array(cols, pa.int64())),
            "cnts": pa.ListArray.from_arrays(pa.array(offsets),
                                             pa.array(cnts, pa.float64())),
            "y": y,
        }, schema=out_schema)

    return ds.map_batches(fn, batch_format="pyarrow")


def _grad_partial(batch: pa.Table, w_ref, D: int) -> pa.Table:
    """One (D+2)-float gradient partial per block: sparse X^T(sigmoid(Xw)-y)
    plus bias gradient and row count."""
    w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
    cols_l = batch["cols"].combine_chunks()
    cnts_l = batch["cnts"].combine_chunks()
    y = batch["y"].to_numpy(zero_copy_only=False)
    n = len(y)
    cols = cols_l.values.to_numpy(zero_copy_only=False)
    cnts = cnts_l.values.to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(cols_l).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(n), lens)
    margin = np.zeros(n, dtype=np.float64)
    np.add.at(margin, parent, w[cols] * cnts)
    margin += w[D]  # bias
    p = 1.0 / (1.0 + np.exp(-margin))
    resid = p - y
    grad = np.zeros(D + 1, dtype=np.float64)
    np.add.at(grad, cols, resid[parent] * cnts)
    grad[D] = resid.sum()
    return pa.table({"g": pa.array([grad.tolist()],
                                   pa.list_(pa.float64())),
                     "n": pa.array([n], pa.int64())})


def train_logreg_hashed(feats: rd.Dataset, D: int = 1024,
                        epochs: int = 25, lr: float = 0.5,
                        l2: float = 1e-6) -> np.ndarray:
    """Synchronous full-batch gradient descent over a featurized Dataset.

    Per epoch: broadcast w (``ray.put`` once — read zero-copy by every
    block task), sum per-block sparse gradient partials, one driver-side
    update. Driver state and network per epoch are O(D), independent of
    corpus size. Returns w of length D+1 (last entry = bias)."""
    feats = feats.materialize()  # bounded: the training sample only
    w = np.zeros(D + 1, dtype=np.float64)
    for _ in range(epochs):
        w_ref = ray.put(w)
        parts = feats.map_batches(
            lambda b, wr=w_ref: _grad_partial(b, wr, D),
            batch_format="pyarrow").take_all()
        grad = np.zeros(D + 1, dtype=np.float64)
        n = 0
        for row in parts:
            grad += np.asarray(row["g"], dtype=np.float64)
            n += int(row["n"])
        grad /= max(n, 1)
        grad[:D] += l2 * w[:D]
        w = w - lr * grad
    return w


def score_logreg_hashed(ds: rd.Dataset, text_col: str, id_col: str,
                        w: np.ndarray, D: int = 1024) -> rd.Dataset:
    """Stateless broadcast scoring pass over the FULL corpus: per-batch
    sparse margin (same kernel as training), sigmoid, 6-decimal prob."""
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        n = batch.num_rows
        rows, cols, cnts = _featurize_batch(batch, text_col, D)
        margin = np.zeros(n, dtype=np.float64)
        np.add.at(margin, rows, ww[cols] * cnts)
        margin += ww[D]
        p = 1.0 / (1.0 + np.exp(-margin))
        return pa.table({
            id_col: batch[id_col],
            "prob": pa.array(np.round(p, 6), pa.float64()),
            "pred": pa.array((p >= 0.5).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
