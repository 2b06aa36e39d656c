"""Iterative graph algorithms over edge Datasets — PageRank.

The reference derives inverse edges and deduplicates them
(``scripts/owl_inverse_props.py:68-134``) but never iterates; PageRank is
the canonical iterative extension of that edge model (power iteration over
the link graph — the web-corpus ranking signal a curation pipeline feeds).

Simplified (dangling mass dropped) power iteration:
    r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) / outdeg(u)

Three execution shapes, chosen by graph size:
  * ``local`` — the EDGE set fits the driver: collect once,
    dictionary-encode nodes, power-iterate with np.bincount.  Avoids the
    per-iteration streaming-executor floor entirely.
  * ``broadcast`` — ranks fit in one table: per iteration ONE streaming
    pass over the (materialized) edge set with the rank/outdeg map
    broadcast via the closure; contributions reduced map-side
    (partial_groupby_agg). This is the right call whenever the NODE table
    fits a worker (edges may be arbitrarily large).
  * ``shuffle`` — ranks as a Dataset: per iteration a hash join
    edges ⋈ ranks on src + a grouped sum on dst. The 10^10-node path;
    same numbers (property-tested equal to broadcast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..relational import (drop_empty_blocks,
                          partial_groupby_agg, round_half_away)


def pagerank(edges: rd.Dataset, src_col: str, dst_col: str,
             damping: float = 0.85, iters: int = 5,
             mode: str = "auto", broadcast_max_nodes: int = 5_000_000,
             local_max_edges: int = 5_000_000,
             round_digits: int = 6) -> pa.Table:
    """Returns (node, rank) for every node in src ∪ dst, ranks rounded."""
    edges = edges.select_columns([src_col, dst_col]).materialize()

    # Tiny graphs (edge set fits the driver): every extra Dataset execution
    # costs a ~1s streaming-executor floor, so 5 iterations × 2 executions
    # dominates wall time.  Collect the edge list ONCE, dictionary-encode
    # nodes to int32, and power-iterate with np.bincount — identical numbers
    # (property-tested against broadcast/shuffle in tests/test_graph.py).
    if mode == "auto" and edges.count() <= local_max_edges:
        mode = "local"
    if mode == "local":
        et = pa.concat_tables(
            edges.iter_batches(batch_format="pyarrow", batch_size=None))
        n_edges = et.num_rows
        combined = pa.chunked_array(
            [et[src_col].combine_chunks(), et[dst_col].combine_chunks()])
        denc = combined.combine_chunks().dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        node_arr = denc.dictionary
        n = len(node_arr)
        si, di = codes[:n_edges], codes[n_edges:]
        outdeg = np.bincount(si, minlength=n).astype(np.float64)
        base = (1.0 - damping) / n
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = np.bincount(di, weights=r[si] / outdeg[si],
                                  minlength=n)
            r = base + damping * contrib
        return pa.table({
            "node": pa.array(node_arr, node_arr.type),
            "rank": pa.array(round_half_away(r, round_digits),
                             pa.float64()),
        })

    # node set + out-degrees (map-side partials; the shuffle moves one row
    # per (node, batch))
    srcs = edges.select_columns([src_col]).map_batches(
        lambda b: pa.table({"node": b[src_col]}), batch_format="pyarrow")
    dsts = edges.select_columns([dst_col]).map_batches(
        lambda b: pa.table({"node": b[dst_col]}), batch_format="pyarrow")
    nodes_ds = partial_groupby_agg(
        srcs.union(dsts).map_batches(
            lambda b: b.append_column("one", pa.array(
                np.ones(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow"),
        ["node"], [("one", "count", "c")])
    outdeg_ds = partial_groupby_agg(
        edges.map_batches(
            lambda b: pa.table({"node": b[src_col],
                                "one": pa.array(np.ones(b.num_rows,
                                                        dtype=np.int64))}),
            batch_format="pyarrow"),
        ["node"], [("one", "count", "od")])

    nodes = pa.concat_tables(
        list(nodes_ds.select_columns(["node"])
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_nodes = nodes.num_rows
    if mode == "auto":
        mode = "broadcast" if n_nodes <= broadcast_max_nodes else "shuffle"
    base = (1.0 - damping) / n_nodes

    if mode == "broadcast":
        od_tbl = pa.concat_tables(
            [bt for bt in outdeg_ds.iter_batches(batch_format="pyarrow",
                                                 batch_size=None)])
        od = dict(zip(od_tbl["node"].to_pylist(),
                      od_tbl["od"].to_pylist()))
        node_list = nodes["node"].to_pylist()
        ranks = {u: 1.0 / n_nodes for u in node_list}
        for _ in range(iters):
            w = {u: ranks[u] / od[u] for u in od}  # src weight map

            def contribs(batch: pa.Table, w=w) -> pa.Table:
                import pandas as pd

                # vectorized map (C-level hash probes), not a Python loop
                c = pd.Series(batch[src_col].to_pandas()).map(w) \
                    .to_numpy(dtype=np.float64)
                return pa.table({"node": batch[dst_col],
                                 "c": pa.array(c, pa.float64())})

            agg = partial_groupby_agg(
                edges.map_batches(contribs, batch_format="pyarrow"),
                ["node"], [("c", "sum", "c")])
            sums = {}
            for bt in agg.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
                sums.update(zip(bt["node"].to_pylist(),
                                bt["c"].to_pylist()))
            ranks = {u: base + damping * sums.get(u, 0.0)
                     for u in node_list}
        out = pa.table({
            "node": pa.array(node_list, nodes["node"].type),
            "rank": pa.array(round_half_away(
                np.array([ranks[u] for u in node_list]), round_digits),
                pa.float64()),
        })
        return out

    # ---- shuffle path: ranks stay a Dataset ------------------------------
    ranks_ds = nodes_ds.map_batches(
        lambda b: pa.table({"rnode": b["node"],
                            "r": pa.array(np.full(b.num_rows, 1.0 / n_nodes),
                                          pa.float64())}),
        batch_format="pyarrow")
    from ..relational import exchange_join

    ew = exchange_join(edges, outdeg_ds.map_batches(
        lambda b: pa.table({"onode": b["node"], "od": b["od"]}),
        batch_format="pyarrow"), src_col, "onode").materialize()
    for _ in range(iters):
        j = exchange_join(ew, ranks_ds, src_col, "rnode")

        def contrib(batch: pa.Table) -> pa.Table:
            c = (batch["r"].to_numpy(zero_copy_only=False)
                 / batch["od"].to_numpy(zero_copy_only=False))
            return pa.table({"node": batch[dst_col],
                             "c": pa.array(c, pa.float64())})

        # empty (schema-less) blocks crash the hash-join partitioner — the
        # drop_empty_blocks guard from relational.py applies to every
        # derived side here (tiny graphs produce many empty blocks)
        sums = drop_empty_blocks(partial_groupby_agg(
            j.map_batches(contrib, batch_format="pyarrow"),
            ["node"], [("c", "sum", "c")]))

        def new_rank(batch: pa.Table, base=base) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.fill_null(batch["c"], 0.0)
            r = pc.add(pa.scalar(base),
                       pc.multiply(pa.scalar(damping), c))
            return pa.table({"rnode": batch["node"], "r": r})

        if sums is None:  # no in-edges anywhere: every rank is the base
            ranks_ds = nodes_ds.select_columns(["node"]).map_batches(
                lambda b: pa.table({
                    "rnode": b["node"],
                    "r": pa.array(np.full(b.num_rows, base), pa.float64())}),
                batch_format="pyarrow").materialize()
            continue
        joined = exchange_join(
            nodes_ds.select_columns(["node"]),
            sums.map_batches(lambda b: pa.table({"snode": b["node"],
                                                 "c": b["c"]}),
                             batch_format="pyarrow"),
            "node", "snode", how="left_outer")
        ranks_ds = joined.map_batches(new_rank,
                                      batch_format="pyarrow").materialize()

    out_tbl = pa.concat_tables(
        [bt for bt in ranks_ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)])
    return pa.table({
        "node": out_tbl["rnode"],
        "rank": pa.array(round_half_away(
            out_tbl["r"].to_numpy(zero_copy_only=False), round_digits),
            pa.float64()),
    })


def components_min_label(edges: rd.Dataset, src_col: str, dst_col: str,
                         max_rounds: int = 25) -> rd.Dataset:
    """Connected components of an UNDIRECTED graph by fully-distributed
    min-label propagation: every node's component id converges to the
    lexicographic minimum node key reachable from it.

    This is the full-graph CC operator (``dedup.connected_components``
    handles candidate-pair graphs whose edge set is small by LSH
    construction; here both nodes and edges stream as Datasets and no
    driver table is ever built). Per round: ONE distributed hash join
    ships each node's current label to its neighbors (edges are
    pre-oriented both ways so one join covers both directions), then one
    grouped string-min adopts the smallest proposal; convergence = the
    count of changed labels reaching zero, checked with a join on the
    previous round's labels (a driver scalar per round). Rounds needed =
    graph diameter — web host graphs are shallow (≤ ~6); a 10^10-node
    long-path graph would want the large-star/small-star doubling variant
    (Kiveris et al. 2014), noted here as the scale escape hatch.

    Returns (node, cluster) with cluster = min reachable node key.
    """
    from ..relational import exchange_join, partial_groupby_agg

    def orient(batch: pa.Table) -> pa.Table:
        a = batch[src_col].cast(pa.string())
        b = batch[dst_col].cast(pa.string())
        t = pa.table({"a": pa.concat_arrays(
            [a.combine_chunks(), b.combine_chunks()]),
            "b": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})
        return t.group_by(["a", "b"]).aggregate([])  # per-batch distinct

    both = edges.map_batches(orient, batch_format="pyarrow").materialize()

    labels = partial_groupby_agg(
        both.map_batches(lambda b: pa.table({"node": b["a"],
                                             "lbl": b["a"]}),
                         batch_format="pyarrow"),
        ["node"], [("lbl", "min", "lbl")]).materialize()

    for _ in range(max_rounds):
        msgs = exchange_join(both, labels, "a", "node").map_batches(
            lambda b: pa.table({"node": b["b"], "lbl": b["lbl"]}),
            batch_format="pyarrow")
        new = partial_groupby_agg(msgs.union(labels), ["node"],
                                  [("lbl", "min", "lbl")]).materialize()
        prev = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "lbl_old": b["lbl"]}),
            batch_format="pyarrow")
        changed = exchange_join(new, prev, "node", "node").map_batches(
            lambda b: pa.table({"c": pa.array(
                [pc.sum(pc.cast(pc.not_equal(b["lbl"], b["lbl_old"]),
                                pa.int64())).as_py() or 0], pa.int64())}),
            batch_format="pyarrow")
        n_changed = sum(r["c"] for r in changed.take_all())
        labels = new
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "cluster": b["lbl"]}),
        batch_format="pyarrow")
