"""C1 global url uniqueness — the engine's one unavoidable all-to-all exchange.

Reference semantics: ``@xml:id`` is a primary key (``scripts/make_rdf.py:61-63``)
and duplicates are counted and reported (``curation/check_fackel_references.py:
32-37``).

Scale design (10^12 rows), implemented as a RAW-RAY two-phase hash exchange —
the one spot where the Dataset API is deliberately bypassed: a generic
sort-based ``groupby`` shuffles and ORDERS the keys, but uniqueness needs only
hash-partitioned equality grouping; the custom exchange moves 8-byte hashes
with no sort and no block re-materialization.

  1. **Prune at the read** — map tasks read ONLY the ``url`` column (at
     100 TB the html column dominates; a url-only read is ~1% of the bytes).
  2. **Hash compaction** — urls → stable u64 hashes (vectorized SipHash);
     the exchange moves 8-byte ints, not ~70-byte strings (~10x volume cut).
     ``hash(url)`` is uniform, so no salting is needed for this key
     (SURVEY.md §4: skew lives in hosts, not hashes).
  3. **Partition by hash top bits** (``num_returns=P`` map tasks → P reduce
     tasks): each reducer sees a disjoint hash range, finds counts > 1 with
     one ``np.unique`` — candidate hashes are a tiny set (dups are rare by
     construction of a web corpus).
  4. **Verify exactly** — map tasks re-read urls, keep rows whose hash is in
     the (broadcast) candidate set, and the driver counts the survivors —
     also collapsing u64 hash collisions (expected ~n²/2⁶⁵ ≈ 3·10⁴ false
     candidate pairs at 10^12 rows; the verify pass removes them exactly).

Partitioning assumption: P reducers each hold ~n/P hashes in memory — size P
to ~cluster cores so a reducer's range fits a worker heap (8 bytes/row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import hash_strings64
from ..schema import make_violations


@ray.remote
def _map_hash_partition(path: str, key: str, p_bits: int):
    """Read one file's key column, hash, split by hash top bits → P arrays."""
    tbl = pq.read_table(path, columns=[key])
    h = hash_strings64(np.asarray(tbl[key].to_pandas(), dtype=object))
    bucket = (h >> np.uint64(64 - p_bits)).astype(np.int64)
    parts = [h[bucket == p] for p in range(1 << p_bits)]
    return tuple(parts)


@ray.remote
def _reduce_find_dups(*parts: np.ndarray) -> np.ndarray:
    """One hash range: concatenate partials, return hashes with count > 1."""
    if not parts:
        return np.empty(0, dtype=np.uint64)
    allh = np.concatenate(parts)
    vals, counts = np.unique(allh, return_counts=True)
    return vals[counts > 1]


@ray.remote
def _map_collect_candidates(path: str, key: str, cand_ref) -> list:
    """Re-read urls, return those whose hash is in the candidate set."""
    cands = cand_ref
    tbl = pq.read_table(path, columns=[key])
    vals = np.asarray(tbl[key].to_pandas(), dtype=object)
    h = hash_strings64(vals)
    mask = np.isin(h, cands)
    return vals[mask].tolist()


def find_duplicate_urls(paths: list[str] | str, key: str = "url",
                        p_bits: int | None = None) -> pa.Table:
    """Return an Arrow table (url, count) for every url appearing > 1 time."""
    if isinstance(paths, str):
        paths = [paths]
    if p_bits is None:
        # P ≈ cluster cores, capped; each reducer holds ~n/P 8-byte hashes
        cpus = int(ray.cluster_resources().get("CPU", 8))
        p_bits = max(2, min(6, int(np.log2(max(2, cpus)))))
    P = 1 << p_bits

    # phase 1+2+3: hash exchange → candidate hashes
    per_file = [
        _map_hash_partition.options(num_returns=P).remote(f, key, p_bits)
        for f in paths
    ]
    if P == 1:  # num_returns=1 returns the bare tuple ref
        per_file = [[r] for r in per_file]
    cand_refs = [
        _reduce_find_dups.remote(*[refs[p] for refs in per_file])
        for p in range(P)
    ]
    cand = np.concatenate(ray.get(cand_refs))
    if cand.size == 0:
        return pa.table({key: pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})

    # phase 4: exact verify on the (tiny) candidate set
    cand_ref = ray.put(np.sort(cand))
    survivors = ray.get([
        _map_collect_candidates.remote(f, key, cand_ref) for f in paths
    ])
    flat = [u for part in survivors for u in part]
    vc = pd.Series(flat, dtype=object).value_counts()
    vc = vc[vc > 1]
    return pa.table({key: pa.array(vc.index.astype(str), pa.string()),
                     "count": pa.array(vc.to_numpy(), pa.int64())})


# ---------------------------------------------------------------------------
# Fused C1 feed: the row-phase scan tasks already hold every url column —
# they push pre-aggregated (hash, count) partials straight into a small ring
# of collector actors, deleting the standalone hash pass over parquet
# (BASELINE.md measured that second url read at ~1-1.5 s concurrent / ~3.5%
# of row-phase CPU at sf0.1; at 100 TB it is a full extra column scan).
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
class C1Collector:
    """Accumulates per-scan-item (hash, count) partials for one slice of the
    corpus (items are routed by a stable item-key hash, NOT by hash range —
    equal url-hashes may land in different collectors; ``buckets`` re-splits
    by hash top-bits so the final reduce sees disjoint ranges).

    Adds are IDEMPOTENT by item key: Ray Data lineage retries and the
    speculative re-issue path (validate.py) can legally deliver the same
    scan item twice; only the first add lands. ``num_cpus=0`` so collectors
    never take scan slots — an add is an O(1) list append; the occasional
    compaction and the finalize-time bucketing are bounded by this
    collector's slice (~n_rows/P hashes, 16 B each).
    """

    def __init__(self, compact_every: int = 128):
        self._seen: set = set()
        self._h: list = []
        self._c: list = []
        self._compact_every = compact_every

    def reset(self) -> bool:
        """Clear state for pool reuse — actor process spawn costs ~2 s each
        (BASELINE.md), so validate runs recycle one session-lived pool
        instead of paying a cold-actor wave that the scan's first items
        block on."""
        self._seen.clear()
        self._h, self._c = [], []
        return True

    def add(self, item_key: str, hashes: np.ndarray, counts: np.ndarray) -> bool:
        if item_key in self._seen:
            return False
        self._seen.add(item_key)
        if len(hashes):
            self._h.append(np.ascontiguousarray(hashes, dtype=np.uint64))
            self._c.append(np.ascontiguousarray(counts, dtype=np.int64))
        if len(self._h) > self._compact_every:
            self._compact()
        return True

    def _compact(self) -> None:
        h = np.concatenate(self._h)
        hu, inv = np.unique(h, return_inverse=True)
        cu = np.bincount(inv, weights=np.concatenate(self._c)).astype(np.int64)
        self._h, self._c = [hu], [cu]

    def buckets(self, p_bits: int):
        """Split the merged multiset by hash top-bits → 2^p_bits
        (hashes, counts) pairs (disjoint ranges across ALL collectors)."""
        if not self._h:
            e = (np.empty(0, np.uint64), np.empty(0, np.int64))
            return tuple(e for _ in range(1 << p_bits)) if p_bits else e
        self._compact()
        h, c = self._h[0], self._c[0]
        b = (h >> np.uint64(64 - p_bits)).astype(np.int64) if p_bits else None
        if p_bits == 0:
            return (h, c)
        return tuple((h[b == p], c[b == p]) for p in range(1 << p_bits))


@ray.remote
def _reduce_dup_candidates(*parts) -> np.ndarray:
    """One hash range: sum counts across collector partials → hashes with a
    GLOBAL count > 1 (a url split across collectors/items must still dup)."""
    hs = [h for h, _ in parts if len(h)]
    if not hs:
        return np.empty(0, dtype=np.uint64)
    h = np.concatenate(hs)
    c = np.concatenate([c for _, c in parts if len(c)])
    hu, inv = np.unique(h, return_inverse=True)
    cu = np.bincount(inv, weights=c)
    return hu[cu > 1.5]


@ray.remote
def _feed_collector(path: str, key: str, collector, item_key: str) -> bool:
    """Resume path: a previously-committed partition's scan never re-runs,
    so its url hashes are fed by this url-only read instead (still one
    column, still pre-aggregated; only non-committed work is fused)."""
    tbl = pq.read_table(path, columns=[key])
    h = hash_strings64(np.asarray(tbl[key].to_pandas(), dtype=object))
    hu, cu = np.unique(h, return_counts=True)
    return ray.get(collector.add.remote(item_key, hu, cu.astype(np.int64)))


_COLLECTOR_POOL: dict = {}  # n → session-lived list of collector handles


def make_collectors(n: int | None = None, reuse: bool = True) -> list:
    """A ring of collector actors sized to the cluster.

    ``reuse=True`` (default) recycles one session-lived pool per size after
    resetting its state: collectors are num_cpus=0 and hold no state between
    runs, while a fresh pool costs an actor-spawn wave (~2 s/actor) that the
    scan's first items would block on. A pool whose actors died with a
    previous Ray session is detected by the reset ping and rebuilt.
    Concurrent run_validation calls in one driver must pass reuse=False for
    all but one of them (per-item idempotence keys would collide)."""
    if n is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n = max(2, min(8, cpus // 4))
    if reuse:
        pool = _COLLECTOR_POOL.get(n)
        if pool is not None:
            try:
                ray.get([c.reset.remote() for c in pool], timeout=10)
                return pool
            except Exception:
                pass  # dead pool (new ray session): rebuild below
        pool = [C1Collector.remote() for _ in range(n)]
        _COLLECTOR_POOL[n] = pool
        return pool
    return [C1Collector.remote() for _ in range(n)]


def collector_candidates(collectors: list, p_bits: int | None = None) -> np.ndarray:
    """Distributed reduce over the collectors' accumulated partials →
    candidate duplicate hashes (exactness restored by verify_candidates)."""
    if p_bits is None:
        p_bits = max(1, int(np.log2(max(2, len(collectors)))))
    P = 1 << p_bits
    per = []
    for col in collectors:
        refs = col.buckets.options(num_returns=P).remote(p_bits)
        per.append([refs] if P == 1 else list(refs))
    cand_refs = [
        _reduce_dup_candidates.remote(*[refs[p] for refs in per])
        for p in range(P)
    ]
    return np.concatenate(ray.get(cand_refs))


def verify_candidates(paths: list[str], key: str,
                      cand: np.ndarray) -> pa.Table:
    """Exact verify of candidate hashes (collapses u64 collisions and
    recovers the url strings): url-only re-read, runs ONLY when candidates
    exist."""
    if cand.size == 0:
        return pa.table({key: pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    cand_ref = ray.put(np.sort(cand))
    survivors = ray.get([
        _map_collect_candidates.remote(f, key, cand_ref) for f in paths
    ])
    flat = [u for part in survivors for u in part]
    vc = pd.Series(flat, dtype=object).value_counts()
    vc = vc[vc > 1]
    return pa.table({key: pa.array(vc.index.astype(str), pa.string()),
                     "count": pa.array(vc.to_numpy(), pa.int64())})


def duplicates_to_violations(dups: pa.Table, key: str = "url") -> pa.Table:
    urls = dups[key].to_pylist()
    counts = dups["count"].to_pylist()
    return make_violations(
        "c1_url_unique", urls, -1, "error", [f"count={c}" for c in counts]
    )
