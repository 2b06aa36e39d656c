"""Distributed BPE vocabulary induction (byte-pair-encoding merge learning).

The tokenizer-training step of an LLM data pipeline: learn the top-K merge
rules from corpus statistics. Standard decomposition (same as the HF/SentencePiece
trainers): BPE statistics are a function of the WORD-TYPE frequency table,
not the token stream — words don't interact across boundaries — so one
corpus-wide (word, n) aggregate reduces the problem by the type/token ratio,
and every later iteration runs over word types only.

Per merge step, everything is data-parallel:
  * pair counting: one numpy pass over each batch's flattened symbol stream
    (adjacent-pair mask × word weight), pre-aggregated per batch, then a tiny
    (l, r) groupby-sum and a distributive top-1 (count desc, pair lexical asc
    tiebreak — deterministic);
  * merge application: vectorized leftmost-greedy non-overlapping replace
    (run + parity trick for 'aaa' chains), rebuilding the list column.

State between iterations is a materialized (syms: list<string>, n) Dataset —
K materializations of the word-TYPE table, never of the corpus.

No reference analog (the reference has no tokenizer); 'Beyond the
reference' text-analysis item. Single-process reference equality is
asserted in tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MERGE_SCHEMA = pa.schema([
    ("step", pa.int64()),
    ("left", pa.string()),
    ("right", pa.string()),
    ("merged", pa.string()),
    ("n", pa.int64()),
])


def _flat_syms(batch: pa.Table):
    syms = batch["syms"].combine_chunks()
    lens = pc.fill_null(pc.list_value_length(syms), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(pc.list_flatten(syms).to_pylist(), dtype=object)
    rows = np.repeat(np.arange(len(lens)), lens)
    return flat, lens, rows


def pair_counts_batch(batch: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts for one (syms, n) batch, pre-aggregated."""
    flat, lens, rows = _flat_syms(batch)
    empty = pa.table({"l": pa.array([], pa.string()),
                      "r": pa.array([], pa.string()),
                      "w": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    m = rows[1:] == rows[:-1]
    if not m.any():
        return empty
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({
        "l": pa.array(flat[:-1][m], pa.string()),
        "r": pa.array(flat[1:][m], pa.string()),
        "w": pa.array(n[rows[:-1][m]], pa.int64()),
    })
    agg = t.group_by(["l", "r"]).aggregate([("w", "sum")])
    return agg.rename_columns(["l", "r", "w"])


def apply_merge_batch(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Replace every non-overlapping leftmost (a, b) adjacency with a+b."""
    flat, lens, rows = _flat_syms(batch)
    if len(flat) >= 2:
        m = np.zeros(len(flat), dtype=bool)
        m[:-1] = (flat[:-1] == a) & (flat[1:] == b) & (rows[:-1] == rows[1:])
        pos = np.flatnonzero(m)
    else:
        pos = np.empty(0, dtype=np.int64)
    if len(pos):
        # leftmost-greedy within runs of consecutive hits ('aaa' + (a,a)
        # merges once): keep even indices within each run
        run_start = np.concatenate([[True], np.diff(pos) != 1])
        run_id = np.cumsum(run_start) - 1
        first_of_run = np.flatnonzero(run_start)
        idx_in_run = np.arange(len(pos)) - first_of_run[run_id]
        pos = pos[idx_in_run % 2 == 0]
        flat = flat.copy()
        flat[pos] = a + b
        delete = np.zeros(len(flat), dtype=bool)
        delete[pos + 1] = True
        flat = flat[~delete]
        lens = lens - np.bincount(rows[pos], minlength=len(lens))
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    out = pa.ListArray.from_arrays(pa.array(offsets),
                                   pa.array(flat, pa.string()))
    return pa.table({"syms": out, "n": batch["n"]})


def train_bpe(words: rd.Dataset, n_merges: int = 8) -> pa.Table:
    """Learn ``n_merges`` BPE rules from a (word, n) word-type Dataset.

    Returns the merge table (step, left, right, merged, n) — n is the
    weighted occurrence count the pair had when chosen.

    The iteration loop runs as raw-Ray task waves over the word-type
    table's block refs (the k-means-loop pattern): one task per block per
    step fuses apply-previous-merge + pair-count, the driver merges the
    tiny per-block count tables and picks the next merge — no per-step
    Dataset-executor floor (measured 46 s → ~4 s for 8 merges at fixture
    scale). Driver state is O(distinct symbol pairs), never the table.
    """
    import ray

    def to_syms(batch: pa.Table) -> pa.Table:
        ws = batch["word"].to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in ws], pa.list_(pa.string())),
            "n": batch["n"].cast(pa.int64()),
        })

    blocks = words.map_batches(to_syms, batch_format="pyarrow") \
        .materialize().to_arrow_refs()

    @ray.remote(num_returns=2)
    def step_task(tbl, merge):
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_batches([tbl])
        if "syms" not in tbl.schema.names:
            # a zero-row block can bypass the to_syms UDF entirely and
            # arrive with the upstream (word, n) schema — normalize it
            tbl = pa.table({"syms": pa.array([], pa.list_(pa.string())),
                            "n": pa.array([], pa.int64())})
        if merge is not None:
            tbl = apply_merge_batch(tbl, *merge)
        return tbl, pair_counts_batch(tbl)

    steps, lefts, rights, counts = [], [], [], []
    merge = None
    for step in range(n_merges):
        outs = [step_task.remote(b, merge) for b in blocks]
        blocks = [o for o, _ in outs]
        cnts = ray.get([c for _, c in outs])
        live = [c for c in cnts if c.num_rows]
        if not live:
            break
        total = pa.concat_tables(live).group_by(["l", "r"]) \
            .aggregate([("w", "sum")])
        idx = pc.sort_indices(total, sort_keys=[
            ("w_sum", "descending"), ("l", "ascending"), ("r", "ascending")])
        top = total.take(idx[:1])
        w = int(top["w_sum"][0].as_py())
        if w <= 0:
            break
        a, b = top["l"][0].as_py(), top["r"][0].as_py()
        steps.append(step)
        lefts.append(a)
        rights.append(b)
        counts.append(w)
        merge = (a, b)
    return pa.table({
        "step": pa.array(steps, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "merged": pa.array([x + y for x, y in zip(lefts, rights)],
                           pa.string()),
        "n": pa.array(counts, pa.int64()),
    }, schema=MERGE_SCHEMA)
