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

import os

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

    Feeds are routed by URL-HASH TOP BITS (``split_by_range``), so each
    collector owns a DISJOINT hash range and decides duplicates LOCALLY —
    there is no cross-collector reduce stage at all. (The previous design
    routed whole items by item-key hash and needed a bucketing +
    reduce exchange at drain time: ~3×pool_size remote ops moving the
    full hash multiset through the object store. On a kernel-taxed host
    each of those ops stochastically stalled seconds; range routing cuts
    the drain to ONE small RPC per collector and is the textbook
    disjoint-range exchange shape at any scale.)

    Adds are IDEMPOTENT by item key: Ray Data lineage retries and the
    speculative re-issue path (validate.py) can legally deliver the same
    scan item's slices twice; only the first add of a key lands.
    ``num_cpus=0`` so collectors never take scan slots — an add is an O(1)
    list append; the finalize-time unique is bounded by this collector's
    range (~n_rows/P hashes, 16 B each).

    Partials are kept PER ITEM (not compacted across items): per-item
    hashes are already unique, and cross-item duplicate urls are rare by
    construction of a web corpus, so per-item storage costs the same
    ~16 B/row as a merged multiset — and the retained item attribution
    makes the exact verify's IO proportional to DUP INCIDENCE (only files
    whose items held a candidate hash are re-read), not corpus size. At
    10^12 rows the unattributed design re-read every fragment's url column
    (~1% of 100 TB) to verify a handful of duplicates.
    """

    def __init__(self):
        self._seen: set = set()
        self._items: list = []  # (item_key, uint64 hashes, int64 counts)

    def reset(self) -> bool:
        """Clear state for pool reuse — actor process spawn costs ~2 s each
        (BASELINE.md), so validate runs recycle one session-lived pool
        instead of paying a cold-actor wave that the scan's first items
        block on."""
        self._seen.clear()
        self._items = []
        return True

    def add(self, item_key: str, hashes: np.ndarray, counts: np.ndarray) -> bool:
        if item_key in self._seen:
            return False
        self._seen.add(item_key)
        if len(hashes):
            self._items.append((item_key,
                                np.ascontiguousarray(hashes, np.uint64),
                                np.ascontiguousarray(counts, np.int64)))
        return True

    def candidates(self) -> np.ndarray:
        """Hashes with a global count > 1 — exact within this collector's
        DISJOINT hash range, so no cross-collector reconciliation exists."""
        if not self._items:
            return np.empty(0, np.uint64)
        h = np.concatenate([h for _, h, _ in self._items])
        hu, inv = np.unique(h, return_inverse=True)
        cu = np.bincount(
            inv, weights=np.concatenate([c for _, _, c in self._items]))
        return hu[cu > 1.5]

    def candidate_files(self, cand_sorted: np.ndarray) -> list:
        """Files whose items contained ANY candidate hash (u64 collisions
        can only add a file — harmless; the verify is exact on urls)."""
        out = set()
        for item_key, h, _ in self._items:
            idx = np.searchsorted(cand_sorted, h)
            idx[idx == len(cand_sorted)] = 0
            if len(cand_sorted) and bool((cand_sorted[idx] == h).any()):
                out.add(_item_file(item_key))
        return sorted(out)


def _item_file(item_key: str) -> str:
    """Scan items key as '<path>:<lo>:<hi>'; resume feeds as 'file:<path>'."""
    if item_key.startswith("file:"):
        return item_key[5:]
    return item_key.rsplit(":", 2)[0]


def split_by_range(hashes: np.ndarray, counts: np.ndarray,
                   n: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split a SORTED unique-hash array (np.unique output) into ``n``
    top-bit ranges — two searchsorted cuts per range, zero boolean masks.
    ``n`` must be a power of two."""
    p_bits = int(np.log2(n))
    assert (1 << p_bits) == n, "collector pool size must be a power of two"
    if p_bits == 0:
        return [(hashes, counts)]
    edges = (np.arange(1, n, dtype=np.uint64)
             << np.uint64(64 - p_bits))
    cuts = [0, *np.searchsorted(hashes, edges).tolist(), len(hashes)]
    return [(hashes[a:b], counts[a:b]) for a, b in zip(cuts, cuts[1:])]


@ray.remote
def _feed_sidecars(sidecar_paths: list, collectors: list) -> bool:
    """Resume path, sidecar form: feed committed partitions' url-hash
    partials from the ``.npz`` sidecars their original scan persisted —
    no parquet read, no re-hashing. Item keys travel inside the sidecars,
    so dedup semantics are identical to a live scan's adds."""
    acks = []
    for sp in sidecar_paths:
        with np.load(sp) as d:
            hu = d["h"].view(np.uint64)
            cu = d["c"].astype(np.int64)
            item_key = str(d["item_key"])
        for j, (hj, cj) in enumerate(
                split_by_range(hu, cu, len(collectors))):
            if len(hj):
                acks.append(collectors[j].add.remote(item_key, hj, cj))
    return all(ray.get(acks)) if acks else True


@ray.remote
def _feed_collector(path: str, key: str, collectors: list,
                    item_key: str) -> bool:
    """Resume path: a previously-committed partition's scan never re-runs,
    so its url hashes are fed by this url-only read instead (still one
    column, still pre-aggregated, still hash-range-routed; only
    non-committed work is fused)."""
    tbl = pq.read_table(path, columns=[key])
    h = hash_strings64(np.asarray(tbl[key].to_pandas(), dtype=object))
    hu, cu = np.unique(h, return_counts=True)
    acks = [collectors[j].add.remote(item_key, hj, cj)
            for j, (hj, cj) in enumerate(
                split_by_range(hu, cu.astype(np.int64), len(collectors)))
            if len(hj)]
    return all(ray.get(acks)) if acks else True


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
        # power of two ≤ cpus/4: collectors own disjoint hash-top-bit ranges
        n = 1 << max(1, min(3, int(np.log2(max(2, cpus // 4)))))
    elif n < 1 or (n & (n - 1)):
        # validate HERE, not as an AssertionError deep inside a remote scan
        # task: collectors own disjoint hash top-bit ranges, so the pool
        # size must be a power of two
        raise ValueError(
            f"collector pool size must be a power of two, got {n}")
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


def collector_candidates(collectors: list) -> np.ndarray:
    """Candidate duplicate hashes: each collector owns a disjoint hash
    range, so the global candidate set is the plain union of the
    collectors' LOCAL count>1 sets — one small RPC per collector, no
    reduce stage (exactness restored by verify_candidates)."""
    return np.concatenate(
        ray.get([c.candidates.remote() for c in collectors]))


def verify_candidates(paths: list[str], key: str,
                      cand: np.ndarray,
                      collectors: list | None = None) -> pa.Table:
    """Exact verify of candidate hashes (collapses u64 collisions and
    recovers the url strings): url-only re-read, runs ONLY when candidates
    exist. When ``collectors`` is given, their per-item attribution narrows
    the re-read to files that actually held a candidate hash — IO scales
    with dup incidence, not corpus size."""
    if cand.size == 0:
        return pa.table({key: pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    cand_ref = ray.put(np.sort(cand))
    if collectors is not None:
        hit = ray.get([c.candidate_files.remote(cand_ref)
                       for c in collectors])
        norm = {os.path.normpath(p): p for p in paths}
        paths = sorted({norm[os.path.normpath(f)] for part in hit
                        for f in part if os.path.normpath(f) in norm})
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
