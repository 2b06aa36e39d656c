"""Generic relational operators, Ray-Data-first.

These re-express the reference's join/aggregate shapes (SURVEY.md §2.4/§2.5)
as scale-conscious Ray Data primitives:

* **Broadcast joins** (J1/J2/J3/J6): the reference probes small in-memory
  dicts built before its main loop (``scripts/make_texts.py:150-271`` probed
  at ``:362-366, 419, 436``). Here the small side is shipped ONCE via
  ``ray.put`` and probed per batch with vectorized ``pc.index_in`` — never a
  shuffle, never re-serialized per batch.
* **Map-side partial aggregation** (A4): per-batch Arrow ``group_by`` partials
  → a tiny final shuffle over (keys × batches) partial rows instead of the
  full fact table. At 10^12 rows this is the difference between shuffling
  terabytes and shuffling megabytes.
* **Distributed top-k** (O1): per-batch local top-k, then a global sort+limit
  over ≤ k×num_batches survivors.

Reference analogs cited per function; none of the reference's execution code
is reused (it is single-threaded lxml/rdflib, SURVEY.md §4).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# ---------------------------------------------------------------------------
# broadcast joins
# ---------------------------------------------------------------------------


# Per-worker-process cache of prepared (key array, payload table) broadcast
# sides, keyed by ObjectRef hex — ray.get of a shared-memory Arrow table is
# zero-copy, but preparing (combine_chunks, rename) is done once per worker.
_BCAST_CACHE: dict = {}


def _prepared_side(ref, right_on: str, suffix: str):
    key = (ref.hex(), right_on, suffix)
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        small: pa.Table = ray.get(ref)
        keys = small[right_on].combine_chunks()
        payload = small.drop_columns([right_on])
        if suffix:
            payload = payload.rename_columns(
                [c + suffix for c in payload.column_names])
        hit = (keys, payload)
        _BCAST_CACHE[key] = hit
    return hit


def join_partitions(*dss: rd.Dataset) -> int:
    """Shuffle-join partition count scaled to the DATA, clamped by the
    cluster: ≈1 partition per 256 MiB of joined input, in [8, 4×CPUs].

    A fixed count tuned to one box is wrong both ways at 4N nodes: too few
    partitions → aggregator memory pressure and no parallelism at volume;
    too many → one actor + scheduling floor per near-empty partition at
    bench scale (measured +37% on the sf0.1 join queries when 8 → 32).
    Callers pass the join's input Datasets (or their upstream reads —
    joined size never exceeds source size); inputs with no metadata-derived
    size estimate contribute 0 and the floor of 8 applies.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    total = 0
    for ds in dss:
        try:
            total += ds.size_bytes() or 0
        except Exception:
            pass
    return int(min(max(8, total // (256 << 20) + 1), max(8, 4 * cpus)))


def broadcast_join(big: rd.Dataset, small: pa.Table, left_on: str, right_on: str,
                   how: str = "inner", suffix: str = "",
                   concurrency: int | None = None) -> rd.Dataset:
    """Join a big Dataset against a small Arrow table without a shuffle.

    Modes:
      * ``inner`` / ``left``: append the small side's payload columns
        (≙ enrichment join J6, ``scripts/enrich_person_indices.py:23-57``)
      * ``semi``: keep rows whose key exists in the small side
        (≙ existence probe J3, ``scripts/make_texts.py:363-366``)
      * ``anti``: keep rows whose key does NOT exist — referential-integrity
        check (J2, ``curation/check_authors_exist_in_listperson.py:21-25``)

    Runs as STATELESS tasks, not an actor pool: the probe holds no expensive
    state (the broadcast table lives in the object store, read zero-copy and
    prepared once per worker process via ``_BCAST_CACHE``), and task-based
    stages can't starve peer stages of CPU slots the way stacked actor pools
    do. The ``concurrency`` arg caps the stage's parallelism if given.
    """
    ref = ray.put(small)

    def probe(batch: pa.Table) -> pa.Table:
        keys, payload = _prepared_side(ref, right_on, suffix)
        idx = pc.index_in(batch[left_on], value_set=keys)
        if how == "semi":
            return batch.filter(pc.is_valid(idx))
        if how == "anti":
            return batch.filter(pc.is_null(idx))
        if how == "inner":
            mask = pc.is_valid(idx)
            batch = batch.filter(mask)
            idx = idx.filter(mask)
        out = batch
        for name in payload.column_names:
            out = out.append_column(name, pc.take(payload[name], idx))
        return out

    kwargs = dict(batch_format="pyarrow")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return big.map_batches(probe, **kwargs)


# ---------------------------------------------------------------------------
# map-side partial aggregation (combiner before the shuffle)
# ---------------------------------------------------------------------------

_ARROW_OP = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
# merge op applied to partials of each base op
_MERGE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def partial_groupby_agg(
    ds: rd.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    pre: "callable | None" = None,
    ts_cols: "tuple[str, ...]" = (),
) -> rd.Dataset:
    """``GROUP BY keys`` with aggregation pushed map-side.

    specs: (column, op, out_name) with op ∈ {sum, count, min, max, mean}.
    ``pre``: optional pa.Table → pa.Table projection applied per batch before
    aggregating (e.g. compute a revenue expression).
    ``ts_cols``: names of ``timestamp("us")`` columns among the keys / spec
    columns. Ray's aggregate round-trips blocks through numpy, silently
    downcasting timestamp columns to 's' precision (with a per-worker 'D'
    precision warning); listed columns are exchanged as raw int64 µs and
    cast back to ``timestamp("us")`` on output, so the merge is precision-
    stable end to end.

    Per batch: Arrow ``Table.group_by`` produces one partial row per distinct
    key in the batch; the global shuffle then moves only those partials
    (reference analog: global counters accumulated in one process,
    ``curation/check_fackel_references.py:32-37`` — here made distributive).
    """
    from ray.data.aggregate import Max, Min, Sum

    base: list[tuple[str, str]] = []
    for col, op, _out in specs:
        if op == "mean":
            base += [(col, "sum"), (col, "count")]
        else:
            base.append((col, _ARROW_OP[op]))
    base = sorted(set(base))
    partial_names = [f"{c}_{o}" for c, o in base]

    def make_partials(batch: pa.Table) -> pa.Table:
        if pre is not None:
            batch = pre(batch)
        for c in ts_cols:
            i = batch.schema.get_field_index(c)
            if i >= 0:
                batch = batch.set_column(
                    i, c, batch.column(i).cast(pa.timestamp("us"))
                    .cast(pa.int64()))
        return batch.group_by(keys).aggregate(base)

    # merge partials with Ray's VECTORIZED built-in aggregations — never
    # map_groups, which invokes a Python function once per group and melts
    # down on high-cardinality keys (e.g. 10^7 near-dup candidate pairs)
    merge_aggs = []
    for (c, o), pn in zip(base, partial_names):
        mo = _MERGE_OP[o]
        cls = {"sum": Sum, "min": Min, "max": Max}[mo]
        merge_aggs.append(cls(pn, alias_name=pn))
    partials = ds.map_batches(make_partials, batch_format="pyarrow")
    merged = partials.groupby(keys).aggregate(*merge_aggs)

    def project(batch: pa.Table) -> pa.Table:
        def restore(name: str, col):
            if name in ts_cols:
                return col.cast(pa.int64()).cast(pa.timestamp("us"))
            return col

        out = {k: restore(k, batch[k]) for k in keys}
        for col, op, outn in specs:
            if op == "mean":
                out[outn] = pc.divide(
                    pc.cast(batch[f"{col}_sum"], pa.float64()),
                    pc.cast(batch[f"{col}_count"], pa.float64()))
            elif op in ("min", "max"):
                out[outn] = restore(col, batch[f"{col}_{_ARROW_OP[op]}"])
            else:
                out[outn] = batch[f"{col}_{_ARROW_OP[op]}"]
        return pa.table(out)

    return merged.map_batches(project, batch_format="pyarrow")


def small_groupby_agg(
    ds: rd.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    pre: "callable | None" = None,
    ts_cols: "tuple[str, ...]" = (),
    fanin: int = 64,
) -> pa.Table:
    """``partial_groupby_agg`` for SMALL result sets (≤ ~10^5 groups):
    tree-fold the per-block partials instead of Ray's sort-based
    Aggregate exchange. Measured on the day-keyed series (4,385 groups,
    600k rows): Ray's Aggregate pays 6.8 s on the 440k partial rows
    (day cardinality ≈ block size, so the map-side combine barely
    shrinks anything); folding blocks pairwise-by-``fanin`` and merging
    the last ≤ ``fanin`` partial tables on the driver takes <0.5 s. At
    10^12 rows the fold depth grows logarithmically (10^6 blocks → 2
    folds at fanin=64) and no stage ever holds more than
    fanin × n_groups rows. Use ONLY when the group count is known-small
    (day series, lang histograms); high-cardinality groupbys stay on
    ``partial_groupby_agg``'s exchange.

    Returns a driver ``pa.Table`` (the result is driver-sized by
    precondition)."""
    from math import ceil

    import ray

    base: list[tuple[str, str]] = []
    for col, op, _out in specs:
        if op == "mean":
            base += [(col, "sum"), (col, "count")]
        else:
            base.append((col, _ARROW_OP[op]))
    base = sorted(set(base))
    partial_names = [f"{c}_{o}" for c, o in base]
    merge_pairs = [(pn, _MERGE_OP[o]) for (c, o), pn in
                   zip(base, partial_names)]

    def make_partials(batch: pa.Table) -> pa.Table:
        if pre is not None:
            batch = pre(batch)
        for c in ts_cols:
            i = batch.schema.get_field_index(c)
            if i >= 0:
                batch = batch.set_column(
                    i, c, batch.column(i).cast(pa.timestamp("us"))
                    .cast(pa.int64()))
        return batch.group_by(keys).aggregate(base)

    def combine(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(keys).aggregate(merge_pairs)
        cols = {k: g[k] for k in keys}
        for pn, mo in merge_pairs:
            cols[pn] = g[f"{pn}_{mo}"]
        return pa.table(cols)

    folded = ds.map_batches(make_partials, batch_format="pyarrow",
                            batch_size=None).materialize()
    while folded.num_blocks() > fanin:
        folded = folded.repartition(
            max(1, ceil(folded.num_blocks() / fanin))) \
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=None).materialize()
    merged = combine(pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in ray.get(folded.to_arrow_refs())]))

    def restore(name: str, col):
        if name in ts_cols:
            return col.cast(pa.int64()).cast(pa.timestamp("us"))
        return col

    out = {k: restore(k, merged[k]) for k in keys}
    for col, op, outn in specs:
        if op == "mean":
            out[outn] = pc.divide(
                pc.cast(merged[f"{col}_sum"], pa.float64()),
                pc.cast(merged[f"{col}_count"], pa.float64()))
        elif op in ("min", "max"):
            out[outn] = restore(col, merged[f"{col}_{_ARROW_OP[op]}"])
        else:
            out[outn] = merged[f"{col}_{_ARROW_OP[op]}"]
    return pa.table(out)


# ---------------------------------------------------------------------------
# distributed top-k (sort + limit with per-batch pruning)
# ---------------------------------------------------------------------------


def topk(ds: rd.Dataset, sort_keys: list[tuple[str, bool]], k: int) -> rd.Dataset:
    """Top-k by (col, descending) keys: local per-batch top-k, global sort+limit.

    Reference analog: sort-by-count-desc report ordering
    (``curation/check_fackel_references.py:33-35``) — distributive here so the
    global sort sees ≤ k rows per batch instead of the whole table.
    """
    names = [c for c, _ in sort_keys]
    orders = ["descending" if d else "ascending" for _, d in sort_keys]

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[(n, o) for n, o in zip(names, orders)])
        return batch.take(idx[:k])

    pruned = ds.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(names, descending=[d for _, d in sort_keys]).limit(k)


# ---------------------------------------------------------------------------
# misc small helpers
# ---------------------------------------------------------------------------


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read of one testdata table.

    An explicit metadata-free schema is passed: the testdata files carry a
    ``pandas`` schema-metadata blob that makes ``pa.Schema`` unhashable,
    which made every downstream schema-dedup log a
    "Failed to hash the schemas" warning per block."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    full = pq.read_schema(path).remove_metadata()
    schema = (pa.schema([full.field(c) for c in columns])
              if columns is not None else full)
    return rd.read_parquet(path, columns=columns, schema=schema)


def read_table(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side Arrow read of a SMALL dimension table."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    """Round half away from zero (DuckDB ROUND semantics; np.round is banker's)."""
    p = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def round_cols(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Round float columns (half away from zero — DuckDB ROUND semantics)."""
    for name, nd in cols.items():
        i = tbl.column_names.index(name)
        tbl = tbl.set_column(
            i, name,
            pc.round(tbl[name], ndigits=nd, round_mode="half_towards_infinity"))
    return tbl


def argmax_per_key(ds: rd.Dataset, key: str,
                   sort_keys: list[tuple[str, bool]]) -> rd.Dataset:
    """Best-match resolution (J4): one winning row per key.

    Reference analog: multi-condition best-match join with tiebreaks
    (``scripts/enrich_fackel_bibls.py:67-117`` — exact key equality, then
    page-bound filters, then title tiebreak). Distributive: each batch keeps
    its local winner per key (first row in (key, sort_keys) order), later
    rounds resolve winners-of-winners — only ≤ one row per key per batch
    ever moves, never the fact table.

    Fully vectorized winner-halving: per-batch local winners (sort + first
    per key), then repartition and re-reduce until one block holds the global
    winners — never ``map_groups``, whose per-group Python call melts down at
    high key cardinality. The final round concentrates ≤ one row per key; at
    key cardinalities too large for one block, insert a hash exchange on the
    key before the last round (the C1 exchange in checks/uniqueness.py is the
    template).
    """
    names = [key] + [c for c, _ in sort_keys]
    orders = ["ascending"] + ["descending" if d else "ascending"
                              for _, d in sort_keys]

    def local_winners(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=list(zip(names, orders)))
        sorted_tbl = batch.take(idx)
        keys_np = np.asarray(sorted_tbl[key].to_pandas())
        _, first = np.unique(keys_np, return_index=True)
        return sorted_tbl.take(pa.array(np.sort(first)))

    cur = ds.map_batches(local_winners, batch_format="pyarrow")
    for n_blocks in (8, 1):
        cur = cur.repartition(n_blocks).map_batches(
            local_winners, batch_format="pyarrow", batch_size=None)
    return cur


def salted_groupby_count(ds: rd.Dataset, key: str, salt_buckets: int = 16,
                         out_name: str = "n") -> rd.Dataset:
    """Skew-safe grouped count: group on ``(key, salt)`` then merge salts.

    The north-rule's hot-host scenario: a Zipf-skewed key (one host = 20% of
    rows) makes a single reducer the straggler in a plain ``groupby(key)``.
    Salting splits every hot key across ``salt_buckets`` reducers; the second
    reduce merges ≤ salt_buckets tiny partial rows per key. The salt is
    derived from a stable row hash (never ``random`` — permutation-invariant,
    SURVEY.md §4 'Skew').

    Note: the engine's own C5 drift check needs NO salting — per-batch
    map-side partials (checks/row.py) shrink the shuffle to (#langs ×
    #batches) rows before any exchange. Salting is for groupbys that must
    move raw rows, e.g. per-host accounting below a cardinality where
    map-side combine stops helping.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        # counts are invariant to the salt assignment, so a round-robin salt
        # (deterministic, no RNG, no process-salted hash()) suffices to
        # spread a hot key's rows across salt_buckets reducers
        salt = (np.arange(batch.num_rows, dtype=np.int64)
                % salt_buckets).astype(np.int32)
        return pa.table({
            key: batch[key],
            "salt": pa.array(salt, pa.int32()),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    per_salt = partial_groupby_agg(salted, [key, "salt"],
                                   [("one", "count", "c")])
    merged = partial_groupby_agg(per_salt, [key], [("c", "sum", out_name)])
    return merged


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable 64-bit hash per row (strings via the shared string hasher,
    integers via multiply-shift / Fibonacci hashing — uniform top bits)."""
    from .functions.hashing import hash_strings64  # noqa: circular-safe

    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype == object:
        return hash_strings64(vals.astype(object))
    return (vals.astype(np.int64).view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15))


def _bucket_of(col: pa.ChunkedArray | pa.Array, p_bits: int) -> np.ndarray:
    """Stable hash bucket per row (top ``p_bits`` of a 64-bit hash)."""
    return (_hash64(col) >> np.uint64(64 - p_bits)).astype(np.int64)


def default_p_bits() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(6, int(np.log2(max(2, cpus)))))


def hash_repartition_map(ds: rd.Dataset, key: str, fn,
                         p_bits: int | None = None) -> rd.Dataset:
    """Hash-exchange on ``key`` then apply ``fn`` ONCE per co-located partition.

    The scale-safe replacement for ``groupby(key).map_groups(fn_per_group)``
    on high-cardinality keys: a raw-Ray two-phase exchange (the C1 uniqueness
    pattern, ``checks/uniqueness.py``) moves each row to the partition owning
    its key's hash range — no sort, no per-group Python call. ``fn`` receives
    one Arrow table holding EVERY row of its keys and must itself be
    vectorized (sort-within-block + segmented numpy / ``pa.Table.group_by``).

    Partitioning assumption: one hash range fits a worker's heap; size
    ``p_bits`` to the cluster (default ≈ log2(cores), capped). Wall time is
    partition-count-parallel and group-count-independent.
    """
    if p_bits is None:
        p_bits = default_p_bits()
    P = 1 << p_bits
    base_schema = ds.schema().base_schema

    @ray.remote
    def split(tbl, pb: int):
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_batches([tbl])
        if tbl.num_rows == 0:
            return tuple(tbl for _ in range(1 << pb))
        bucket = _bucket_of(tbl[key], pb)
        return tuple(tbl.filter(pa.array(bucket == p))
                     for p in range(1 << pb))

    @ray.remote
    def apply_fn(*parts):
        live = [p for p in parts if p.num_rows]
        tbl = (pa.concat_tables(live) if live
               else base_schema.empty_table())
        return fn(tbl)

    refs = ds.to_arrow_refs()
    if not refs:
        return rd.from_arrow(fn(base_schema.empty_table()))
    per_block = [split.options(num_returns=P).remote(r, p_bits) for r in refs]
    if P == 1:
        per_block = [[r] for r in per_block]
    out_refs = [apply_fn.remote(*[refs_[p] for refs_ in per_block])
                for p in range(P)]
    return rd.from_arrow_refs(out_refs)


_ARROW_JOIN_TYPE = {
    "inner": "inner", "left_outer": "left outer",
    "right_outer": "right outer", "full_outer": "full outer",
    "left_semi": "left semi", "left_anti": "left anti",
}


def exchange_join(left: rd.Dataset, right: rd.Dataset,
                  left_on: str, right_on: str, how: str = "inner",
                  p_bits: int | None = None,
                  coalesce_keys: bool = True,
                  bloom_reduce: bool = False,
                  bloom_fp: float = 0.01) -> rd.Dataset:
    """Distributed equi-join as a raw two-sided hash exchange + one local
    Arrow (Acero) hash join per partition.

    The big-to-big join operator (J2/J3 big side, q3/q5/q10 fact joins):
    both sides split by the same hash of their key, each of the P join
    tasks receives one disjoint hash range of BOTH sides and joins it with
    ``pa.Table.join`` — vectorized C++, no sort, no per-group Python.
    Measured 2.2× faster than ``Dataset.join`` at bench scale (same rows):
    the generic operator pays aggregator-actor spin-up and row
    re-blocking that a range-owned join task does not.

    ``how`` uses Dataset.join names (inner/left_outer/right_outer/
    full_outer/left_semi/left_anti). Output columns follow Arrow semantics:
    the right key column is coalesced into the left's unless
    ``coalesce_keys=False``. Null join keys: rows with null keys hash to a
    bucket but never match (Acero equi-join semantics), same as SQL.

    Partitioning assumption: one hash range of BOTH sides fits a join
    task's heap. Default ``p_bits`` scales with the DATA, not just the
    cluster: ≈ one partition per 256 MiB of joined input (metadata
    estimate), floored at log2(cores) and capped at 2^10 — a count tuned
    to one box is wrong both ways at 4N nodes (the join_partitions
    rationale). Skewed keys: a single pathological key lands in one task —
    salt upstream (``salted_groupby_count`` pattern) if one key exceeds a
    worker.
    """
    if p_bits is None:
        total = 0
        for ds in (left, right):
            try:
                total += ds.size_bytes() or 0
            except Exception:
                pass
        need = int(np.ceil(np.log2(max(1, total // (256 << 20)) + 1)))
        p_bits = min(10, max(default_p_bits(), need))
    P = 1 << p_bits
    arrow_how = _ARROW_JOIN_TYPE[how]
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema

    @ray.remote
    def split(tbl, key: str, pb: int):
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_batches([tbl])
        if tbl.num_rows == 0:
            return tuple(tbl for _ in range(1 << pb))
        bucket = _bucket_of(tbl[key], pb)
        return tuple(tbl.filter(pa.array(bucket == p))
                     for p in range(1 << pb))

    @ray.remote
    def pjoin(nl: int, *parts):
        lp = [p for p in parts[:nl] if p.num_rows]
        rp = [p for p in parts[nl:] if p.num_rows]
        lt = pa.concat_tables(lp) if lp else l_schema.empty_table()
        rt = pa.concat_tables(rp) if rp else r_schema.empty_table()
        return lt.join(rt, keys=[left_on], right_keys=[right_on],
                       join_type=arrow_how, coalesce_keys=coalesce_keys)

    lrefs = left.to_arrow_refs()
    rrefs = right.to_arrow_refs()
    if not lrefs and not rrefs:
        return rd.from_arrow(
            l_schema.empty_table().join(
                r_schema.empty_table(), keys=[left_on],
                right_keys=[right_on], join_type=arrow_how,
                coalesce_keys=coalesce_keys))

    # --- Bloom semi-join reduction (optional) ----------------------------
    # Shrink the LEFT side's shuffle volume by a broadcast Bloom filter of
    # the right keys: a zero-false-negative pre-screen, so rows it drops
    # could never have matched. inner/left_semi: definite misses are
    # discarded pre-exchange. left_anti: definite misses ARE output rows
    # and bypass the join entirely. FPs (≤ bloom_fp) just ride the exchange
    # and resolve exactly in the Acero join — results are exact either way.
    # Worth it when join selectivity is low (most left rows miss); the
    # filter costs O(bits) broadcast vs O(dropped rows) shuffle saved.
    miss_refs: list = []
    if bloom_reduce and how in ("inner", "left_semi", "left_anti") and rrefs:
        from .sketches.bloom import BloomFilter

        @ray.remote
        def nrows(tbl) -> int:
            if not isinstance(tbl, pa.Table):
                tbl = pa.Table.from_batches([tbl])
            return tbl.num_rows

        @ray.remote
        def bloom_partial(tbl, n_bits: int, k: int) -> bytes:
            if not isinstance(tbl, pa.Table):
                tbl = pa.Table.from_batches([tbl])
            bf = BloomFilter(1, n_bits=n_bits, k=k)
            if tbl.num_rows:
                bf.add_hashes(_hash64(tbl[right_on]))
            return bf.to_bytes()

        cap = max(64, sum(ray.get([nrows.remote(r) for r in rrefs])))
        proto = BloomFilter(cap, fp_rate=bloom_fp)
        parts = ray.get([bloom_partial.remote(r, proto.n_bits, proto.k)
                         for r in rrefs])
        merged = BloomFilter.from_bytes(parts[0])
        for b in parts[1:]:
            merged = merged.merge(BloomFilter.from_bytes(b))
        bloom_ref = ray.put(merged.to_bytes())

        @ray.remote
        def prefilter(tbl, bloom_bytes):
            """(possibly-matching rows, definite-miss rows)."""
            if not isinstance(tbl, pa.Table):
                tbl = pa.Table.from_batches([tbl])
            if tbl.num_rows == 0:
                return tbl, tbl
            bf = BloomFilter.from_bytes(bloom_bytes)
            hit = pa.array(bf.contains_hashes(_hash64(tbl[left_on])))
            return tbl.filter(hit), tbl.filter(pc.invert(hit))

        pre = [prefilter.options(num_returns=2).remote(r, bloom_ref)
               for r in lrefs]
        lrefs = [p[0] for p in pre]
        if how == "left_anti":
            miss_refs = [p[1] for p in pre]

    lsp = [split.options(num_returns=P).remote(r, left_on, p_bits)
           for r in lrefs]
    rsp = [split.options(num_returns=P).remote(r, right_on, p_bits)
           for r in rrefs]
    if P == 1:
        lsp = [[r] for r in lsp]
        rsp = [[r] for r in rsp]
    out = [pjoin.remote(len(lsp), *[refs[p] for refs in lsp],
                        *[refs[p] for refs in rsp])
           for p in range(P)]
    return rd.from_arrow_refs(out + miss_refs)


def topk_per_key(ds: rd.Dataset, key: str,
                 sort_keys: list[tuple[str, bool]], k: int) -> rd.Dataset:
    """Top-k rows per key (the general-k form of ``argmax_per_key``): one
    hash exchange, then per partition ONE sort + a segmented vectorized rank
    (arange minus each key's first index) — no per-group Python, wall time
    independent of key count. Deterministic: ties broken by the sort_keys
    themselves (make them total)."""
    names = [key] + [c for c, _ in sort_keys]
    orders = ["ascending"] + ["descending" if d else "ascending"
                              for _, d in sort_keys]
    base = ds.schema().base_schema

    def local(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return base.empty_table()
        idx = pc.sort_indices(tbl, sort_keys=list(zip(names, orders)))
        tbl = tbl.take(idx)
        keys_np = tbl[key].to_numpy(zero_copy_only=False)
        n = len(keys_np)
        change = np.concatenate([[True], keys_np[1:] != keys_np[:-1]])
        starts = np.flatnonzero(change)
        seg_start = np.repeat(starts, np.diff(np.append(starts, n)))
        rank = np.arange(n) - seg_start
        return tbl.filter(pa.array(rank < k))

    return hash_repartition_map(ds, key, local)


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset | None:
    """Remove zero-row blocks (which carry NO schema: Ray skips map UDFs on
    empty blocks, so a filtered-to-empty block degrades to a column-less
    table that ``Dataset.join``'s hash partitioner cannot key). The probe is
    a remote row-count per block — block data never moves and never touches
    the driver. Returns None when every block is empty (caller supplies the
    typed empty result)."""

    @ray.remote
    def nrows(t) -> int:
        return t.num_rows if hasattr(t, "num_rows") else len(t)

    refs = ds.to_arrow_refs()
    counts = ray.get([nrows.remote(r) for r in refs])
    live = [r for r, n in zip(refs, counts) if n]
    if not live:
        return None
    return rd.from_arrow_refs(live)


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str,
              left_ts: str, right_ts: str, left_cols: list[str],
              right_cols: list[str],
              right_tiebreak: str | None = None,
              direction: str = "backward",
              right_key: str | None = None) -> rd.Dataset:
    """As-of join: for each left row, the latest right row of the same key
    with right_ts ≤ left_ts (``direction="backward"``), or the EARLIEST
    right row with right_ts ≥ left_ts (``direction="forward"``) — a custom
    operator Ray Data lacks; SURVEY.md §2 'custom operators' (no reference
    analog, J4's containment fallback is the closest shape).
    ``right_key`` names the right side's key column when it differs from
    the left's. Tiebreak among equal right timestamps: backward keeps the
    MAX ``right_tiebreak`` (last row in sort order), forward keeps the MIN
    (first row) — mirror the same in any SQL oracle.

    Plan: tag and union both sides (null-filled opposite columns), ONE hash
    exchange on the key co-locates each key's rows, then each partition runs
    a single vectorized ``pd.merge_asof(..., by=key)`` over its ts-sorted
    slice — one C call per PARTITION, never per key (a per-group Python
    ``map_groups`` melts down at user-scale key cardinality). Output columns
    are cast back to the DECLARED Arrow types: pandas upcasts nullable int64
    to float64 inside the merge, which round 1 shipped as the
    ``e_asof_last_order`` hash mismatch. Output: ``[key, left_ts] +
    left_cols + right_cols`` (right cols null when no right row precedes).
    Partitioning assumption: one hash range fits a worker; a single skewed
    key would need a ts-range sub-split.
    """
    import pandas as pd

    r_keep = list(dict.fromkeys(
        right_cols + ([right_tiebreak] if right_tiebreak
                      and right_tiebreak not in right_cols else [])))
    # union requires identical schemas: both sides carry the full column set,
    # null-filled for the columns the other side owns
    l_types = {f.name: f.type for f in left.schema().base_schema}
    r_types = {f.name: f.type for f in right.schema().base_schema}
    all_cols = ([(c, l_types[c], 0) for c in left_cols]
                + [(c, r_types[c], 1) for c in r_keep])
    out_schema = pa.schema(
        [(key, l_types[key]), (left_ts, l_types[left_ts])]
        + [(c, l_types[c]) for c in left_cols]
        + [(c, r_types[c]) for c in right_cols])

    def tag(side: int, ts_col: str, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {key: batch[key_col], "__ts": batch[ts_col]}
            for c, typ, owner in all_cols:
                cols[c] = batch[c] if owner == side else pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag(0, left_ts, key), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_ts, right_key or key),
                           batch_format="pyarrow")

    def merge_partition(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        df = tbl.to_pandas()
        lg = df[df["__side"] == 0].sort_values("__ts", kind="mergesort")
        # deterministic among equal right timestamps: backward ⇒ merge_asof
        # picks the LAST row ⇒ max tiebreak; forward ⇒ the FIRST ⇒ min
        r_sort = ["__ts"] + ([right_tiebreak] if right_tiebreak else [])
        rg = df[df["__side"] == 1].sort_values(r_sort, kind="mergesort")
        out = pd.merge_asof(
            lg[[key, "__ts"] + left_cols],
            rg[[key, "__ts"] + right_cols],
            on="__ts", by=key, direction=direction)
        out = out.rename(columns={"__ts": left_ts})
        # cast back to declared types (pandas float64-upcast + NaN → null)
        return pa.Table.from_arrays(
            [pa.Array.from_pandas(out[f.name], type=f.type)
             for f in out_schema], schema=out_schema)

    return hash_repartition_map(lt.union(rt), key, merge_partition)


def nearest_join(left: rd.Dataset, right: rd.Dataset, key: str,
                 left_ts: str, right_ts: str, left_cols: list[str],
                 right_cols: list[str], right_id: str,
                 right_key: str | None = None) -> rd.Dataset:
    """Nearest-match temporal join: for each left row, the right row of the
    same key minimizing ``(|right_ts - left_ts|, right_ts, right_id)``
    lexicographically (ties → the EARLIER right row, then the smaller id) —
    the bidirectional sibling of :func:`asof_join`. Inner semantics: left
    rows whose key has no right rows are dropped.

    Plan: same union-tag + single hash exchange as ``asof_join``; each
    partition runs TWO vectorized ``pd.merge_asof`` passes (backward with
    the right side sorted ``(ts asc, id desc)`` so the backward candidate is
    the min-id row of the max qualifying ts; forward with ``(ts asc, id
    asc)``) and a vectorized per-row choose — never a per-key Python call,
    and never the quadratic key-cross-product a rank-over-all-pairs plan
    pays. The nearest row is always the backward or forward ts-neighbor, so
    two candidates suffice; on equal distance the backward one wins (earlier
    ts ⇒ lexicographic order above).

    Output: ``[key, left_ts] + left_cols + right_cols`` in source dtypes.
    Partitioning assumption: one key-hash range fits a worker (asof_join's).
    """
    import pandas as pd

    right_key = right_key or key  # the right side's key column name
    r_keep = list(dict.fromkeys(right_cols + [right_id]))
    l_types = {f.name: f.type for f in left.schema().base_schema}
    r_types = {f.name: f.type for f in right.schema().base_schema}
    all_cols = ([(c, l_types[c], 0) for c in left_cols]
                + [(c, r_types[c], 1) for c in r_keep])
    out_schema = pa.schema(
        [(key, l_types[key]), (left_ts, l_types[left_ts])]
        + [(c, l_types[c]) for c in left_cols]
        + [(c, r_types[c]) for c in right_cols])

    def tag(side: int, ts_col: str, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {key: batch[key_col], "__ts": batch[ts_col]}
            for c, typ, owner in all_cols:
                cols[c] = batch[c] if owner == side else pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag(0, left_ts, key), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_ts, right_key), batch_format="pyarrow")

    def merge_partition(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        df = tbl.to_pandas()
        lg = (df[df["__side"] == 0][[key, "__ts"] + left_cols]
              .sort_values("__ts", kind="mergesort"))
        rg = df[df["__side"] == 1][[key, "__ts"] + r_keep]
        if not len(lg):
            return out_schema.empty_table()
        if not len(rg):
            return out_schema.empty_table()
        back = pd.merge_asof(
            lg, rg.sort_values(["__ts", right_id], ascending=[True, False],
                               kind="mergesort").rename(
                columns={"__ts": "__rts"}),
            left_on="__ts", right_on="__rts", by=key, direction="backward",
            suffixes=("", "__r"))
        fwd = pd.merge_asof(
            lg, rg.sort_values(["__ts", right_id], kind="mergesort").rename(
                columns={"__ts": "__rts"}),
            left_on="__ts", right_on="__rts", by=key, direction="forward",
            suffixes=("", "__r"))
        # vectorized choose: backward wins on smaller-or-EQUAL distance
        # (equal ⇒ earlier ts ⇒ lexicographic (|Δ|, ts, id) order)
        ts = lg["__ts"].to_numpy()
        bd = ts - back["__rts"].to_numpy()  # ≥ 0 or NaT
        fd = fwd["__rts"].to_numpy() - ts
        has_b, has_f = ~pd.isna(bd), ~pd.isna(fd)
        use_b = has_b & (~has_f | (bd <= fd))
        matched = has_b | has_f
        out_cols = {key: lg[key].to_numpy()[matched],
                    left_ts: ts[matched]}
        for c in left_cols:
            out_cols[c] = lg[c].to_numpy()[matched]
        for c in right_cols:
            cname = c if c in back.columns else f"{c}__r"
            out_cols[c] = np.where(use_b, back[cname].to_numpy(),
                                   fwd[cname].to_numpy())[matched]
        return pa.Table.from_arrays(
            [pa.Array.from_pandas(pd.Series(out_cols[f.name]), type=f.type)
             for f in out_schema], schema=out_schema)

    return hash_repartition_map(lt.union(rt), key, merge_partition)


def interval_join(points: rd.Dataset, intervals: pa.Table, value_col: str,
                  lo_col: str = "lo", hi_col: str = "hi") -> rd.Dataset:
    """Range join: attach the interval [lo, hi) containing each point value
    (the 'range join' custom operator; reference analog: the containment
    fallback of the staged match, ``scripts/enrich_fackel_bibls.py:103-117``).

    The interval table is broadcast once; each batch probes with one
    ``np.searchsorted`` over the sorted interval bounds — O(log n_intervals)
    per row, no shuffle. Assumes non-overlapping, sorted intervals (the
    banding case); points outside every interval get null payload columns.
    """
    order = pc.sort_indices(intervals, sort_keys=[(lo_col, "ascending")])
    intervals = intervals.take(order)
    ref = ray.put(intervals)

    def probe(batch: pa.Table) -> pa.Table:
        iv: pa.Table = ray.get(ref)
        lo = np.asarray(iv[lo_col].to_pylist(), dtype=np.float64)
        hi = np.asarray(iv[hi_col].to_pylist(), dtype=np.float64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(lo, v, side="right") - 1
        valid = (idx >= 0) & (v < hi[np.clip(idx, 0, len(hi) - 1)])
        idx_arr = pa.array(np.where(valid, idx, -1), pa.int64())
        take_idx = pc.if_else(pc.equal(idx_arr, -1),
                              pa.scalar(None, pa.int64()), idx_arr)
        out = batch
        for name in iv.column_names:
            if name in (lo_col, hi_col):
                continue
            out = out.append_column(name, pc.take(iv[name], take_idx))
        return out

    return points.map_batches(probe, batch_format="pyarrow")


def collect_tables(ds: rd.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL Dataset as one Arrow table with a fixed schema.

    Empty blocks can pass through ``map_batches`` with their upstream schema
    (Ray skips the UDF for zero-row blocks) — they are dropped here, and the
    declared schema is returned even when every block is empty.
    """
    tables = []
    for t in ray.get(ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_batches([t])
        if t.num_rows and set(schema.names) <= set(t.column_names):
            tables.append(t.select(schema.names).cast(schema))
    return pa.concat_tables(tables) if tables else schema.empty_table()


# ---------------------------------------------------------------------------
# skew-aware join (hot-key broadcast + cold-key exchange)
# ---------------------------------------------------------------------------


def detect_hot_keys(refs: list, key: str, m: int = 256):
    """Heavy-hitter sketch of ``key`` across Arrow block refs.

    One remote Misra-Gries partial per block (``sketches.topk.ApproxTopK``:
    local exact top-m + residual bound), merged on the driver — O(m) bytes
    per block regardless of key cardinality. Returns (merged sketch,
    total row count); callers threshold on the sketch's UPPER count
    bounds, which makes detection conservative: a possibly-hot key is
    treated as hot (any split is correct; misclassification only costs a
    little broadcast traffic).
    """
    from .sketches.topk import ApproxTopK

    @ray.remote
    def partial(tbl) -> tuple[bytes, int]:
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_batches([tbl])
        if tbl.num_rows == 0:
            return ApproxTopK(m).to_bytes(), 0
        vc = pa.table({key: tbl[key]}).group_by([key]).aggregate(
            [(key, "count")])
        items = vc[key].to_numpy(zero_copy_only=False).astype(object)
        counts = vc[f"{key}_count"].to_numpy(zero_copy_only=False)
        return ApproxTopK.from_counts(items, counts, m).to_bytes(), tbl.num_rows

    parts = ray.get([partial.remote(r) for r in refs])
    merged = ApproxTopK.merge_many([ApproxTopK.from_bytes(b)
                                    for b, _ in parts])
    total = sum(n for _, n in parts)
    return merged, total


def skew_join(left: rd.Dataset, right: rd.Dataset,
              left_on: str, right_on: str, how: str = "inner",
              hot_count: int | None = None, p_bits: int | None = None,
              sketch_m: int = 256) -> rd.Dataset:
    """Equi-join that survives skewed keys: the hybrid broadcast/exchange
    plan (Spark AQE's skew-join treatment, done eagerly).

    A plain hash exchange sends EVERY row of a key to one partition — one
    pathological key (a bot host hammering one URL, a null-ish default id)
    turns a 256-node join into one straggler task. Here:

      1. ONE pass over the left side's blocks builds mergeable heavy-hitter
         partials (constant bytes per block); keys whose upper count bound
         ≥ ``hot_count`` (default: 4× an average hash-range's share, i.e.
         keys that would dominate their partition) are *hot*.
      2. The right side's rows for hot keys are collected and broadcast
         once via ``ray.put`` (assumption, documented: the right side is
         per-key bounded — dimension-like — so |hot slice| ≈ |hot keys| ×
         rows/key is small even when the LEFT side is pathological).
      3. Hot left rows join the broadcast slice **block-parallel** — every
         left block is its own join task, so the hot key's work spreads
         over the cluster instead of one partition.
      4. Cold rows of both sides go through the normal disjoint-range
         ``exchange_join``; results union (hot/cold partition the key
         space, so no row is produced twice).

    Both sides are consumed exactly once (raw block refs, as
    ``exchange_join``). Supported ``how``: inner / left_outer / left_semi /
    left_anti (right/full outer would need right-unmatched tracking across
    the block-parallel hot tasks — use ``exchange_join`` for those).
    Reference analog: the reference's lookup joins never face skew
    (single process, toy scale) — this is the 100-TB capability its
    semantics demand (SURVEY.md §4 "Skew").
    """
    if how not in ("inner", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"skew_join does not support how={how!r}")
    if p_bits is None:
        p_bits = default_p_bits()
    P = 1 << p_bits
    arrow_how = _ARROW_JOIN_TYPE[how]
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema

    lrefs = left.to_arrow_refs()
    rrefs = right.to_arrow_refs()
    if not lrefs or not rrefs:
        return exchange_join(left, right, left_on, right_on, how,
                             p_bits=p_bits)

    def _as_ds(refs, schema):
        # blocks are already materialized — wrap, don't re-execute
        return rd.from_arrow_refs(refs) if refs else rd.from_arrow(
            schema.empty_table())

    sketch, total = detect_hot_keys(lrefs, left_on, m=sketch_m)
    # default threshold: a key 4× an average hash-range's share would
    # dominate its partition
    thr = hot_count if hot_count is not None else max(1024, 4 * total // P)
    hot = [item for item, _lo, hi in sketch.top(sketch_m) if hi >= thr]
    key_type = l_schema.field(left_on).type
    # sketch items come back stringified (merge canonicalizes to str);
    # cast back through Arrow — integer & string join keys supported
    hot_arr = pc.cast(pa.array([str(h) for h in hot], pa.string()),
                      key_type) if hot else None

    if hot_arr is None or len(hot_arr) == 0:
        return exchange_join(_as_ds(lrefs, l_schema), _as_ds(rrefs, r_schema),
                             left_on, right_on, how, p_bits=p_bits)

    @ray.remote
    def split(tbl, key: str, hot_keys, pb: int):
        """bucket 0..P-1 = cold hash ranges; bucket P = hot rows."""
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_batches([tbl])
        if tbl.num_rows == 0:
            return tuple(tbl for _ in range((1 << pb) + 1))
        is_hot = pc.is_in(tbl[key], value_set=hot_keys)
        hot_part = tbl.filter(is_hot)
        cold = tbl.filter(pc.invert(pc.fill_null(is_hot, False)))
        if cold.num_rows == 0:
            return tuple([cold] * (1 << pb) + [hot_part])
        bucket = _bucket_of(cold[key], pb)
        return tuple([cold.filter(pa.array(bucket == p))
                      for p in range(1 << pb)] + [hot_part])

    @ray.remote
    def pjoin(nl: int, *parts):
        lp = [p for p in parts[:nl] if p.num_rows]
        rp = [p for p in parts[nl:] if p.num_rows]
        lt = pa.concat_tables(lp) if lp else l_schema.empty_table()
        rt = pa.concat_tables(rp) if rp else r_schema.empty_table()
        return lt.join(rt, keys=[left_on], right_keys=[right_on],
                       join_type=arrow_how)

    @ray.remote
    def concat_parts(*parts):
        live = [p for p in parts if p.num_rows]
        return pa.concat_tables(live) if live else r_schema.empty_table()

    @ray.remote
    def hot_join(lpart, rhot):
        if lpart.num_rows == 0:
            return l_schema.empty_table().join(
                r_schema.empty_table(), keys=[left_on],
                right_keys=[right_on], join_type=arrow_how)
        return lpart.join(rhot, keys=[left_on], right_keys=[right_on],
                          join_type=arrow_how)

    lsp = [split.options(num_returns=P + 1).remote(r, left_on, hot_arr,
                                                   p_bits) for r in lrefs]
    rsp = [split.options(num_returns=P + 1).remote(r, right_on, hot_arr,
                                                   p_bits) for r in rrefs]
    out = [pjoin.remote(len(lsp), *[refs[p] for refs in lsp],
                        *[refs[p] for refs in rsp])
           for p in range(P)]
    rhot_ref = concat_parts.remote(*[refs[P] for refs in rsp])
    out += [hot_join.remote(refs[P], rhot_ref) for refs in lsp]
    return rd.from_arrow_refs(out)


def union_by_name(parts: "list[rd.Dataset]") -> rd.Dataset:
    """Schema-evolution union (UNION ALL BY NAME semantics).

    Aligns every input Dataset to the union of all schemas — column order is
    first-seen, a column missing from an input becomes typed nulls, and a
    column present with a different (castable) type is cast to the
    first-seen type — then streams a zero-shuffle ``Dataset.union``. This is
    the data-lake ingestion shape: snapshot files written before a column
    existed union with newer files that carry it, without rewriting either.

    Schema discovery reads only parquet/Dataset metadata (``ds.schema()``
    on a lazy read is a footer fetch, not an execution of the pipeline
    body); per-batch alignment is O(missing columns) null-array allocation.
    """
    schemas = []
    for p in parts:
        s = p.schema()
        schemas.append(getattr(s, "base_schema", None) or pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]))

    fields: list[pa.Field] = []
    seen: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name not in seen:
                seen[f.name] = f.type
                fields.append(pa.field(f.name, f.type))
    target = pa.schema(fields)

    def aligner(batch: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in batch.column_names:
                col = batch[f.name]
                cols.append(col if col.type == f.type else col.cast(f.type))
            else:
                cols.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=target)

    aligned = [p.map_batches(aligner, batch_format="pyarrow")
               for p in parts]
    out = aligned[0]
    return out.union(*aligned[1:]) if len(aligned) > 1 else out
