"""C1 global url uniqueness — the engine's one unavoidable all-to-all shuffle.

Reference semantics: ``@xml:id`` is a primary key (``scripts/make_rdf.py:61-63``)
and duplicates are counted and reported (``curation/check_fackel_references.py:
32-37``).

Scale design (10^12 rows):
  1. **Prune at the read** — re-read only the ``url`` column (at 100 TB the
     html column dominates; a url-only read is ~1% of input bytes).
  2. **Hash compaction** — map urls to stable u64 hashes in a vectorized
     ``map_batches`` and shuffle 8-byte integers instead of ~70-byte strings
     (~10x shuffle-volume reduction). ``hash(url)`` is uniform, so no salting
     is needed for this key (SURVEY.md §4: skew lives in hosts, not hashes).
  3. ``groupby(url_hash).count()`` → candidate hashes with count > 1 — a tiny
     result (duplicates are rare by construction of the web corpus).
  4. **Broadcast-verify** — ship the candidate hash set back (ray.put), filter
     the url column against it per batch, and do an exact groupby on the
     (tiny) surviving urls, which also collapses u64 hash collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import hash_strings64
from ..schema import make_violations


def find_duplicate_urls(paths: list[str] | str, key: str = "url") -> pa.Table:
    """Return an Arrow table (url, count) for every url appearing > 1 time."""
    urls = rd.read_parquet(paths, columns=[key])

    def to_hash(batch: pa.Table) -> pa.Table:
        # int64 view of the u64 hash: equality-preserving, and stays native
        # through every pandas/Arrow boundary in the groupby
        h = hash_strings64(batch[key].to_pandas()).view(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    hashed = urls.map_batches(to_hash, batch_format="pyarrow")
    cand = hashed.groupby("h").count().map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    )
    cand_pdf = cand.to_pandas()
    if "h" not in cand_pdf.columns or len(cand_pdf) == 0:
        cand_hashes = np.empty(0, dtype=np.int64)
    else:
        cand_hashes = np.asarray(cand_pdf["h"].to_numpy(), dtype=np.int64)
    if cand_hashes.size == 0:
        return pa.table({key: pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})

    cand_ref = ray.put(frozenset(int(x) for x in cand_hashes))

    class FilterCandidates:
        def __init__(self, ref):
            self.cands = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = hash_strings64(batch[key].to_pandas()).view(np.int64)
            mask = np.fromiter((int(x) in self.cands for x in h), dtype=bool,
                               count=len(h))
            return batch.filter(pa.array(mask))

    survivors = rd.read_parquet(paths, columns=[key]).map_batches(
        FilterCandidates, fn_constructor_kwargs={"ref": cand_ref},
        batch_format="pyarrow", concurrency=4,
    )
    exact = survivors.groupby(key).count().map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    )
    pdf = exact.to_pandas().rename(columns={"count()": "count"})
    if key not in pdf.columns or len(pdf) == 0:
        return pa.table({key: pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    pdf[key] = pdf[key].astype(str)
    return pa.Table.from_pandas(pdf[[key, "count"]], preserve_index=False)


def duplicates_to_violations(dups: pa.Table, key: str = "url") -> pa.Table:
    urls = dups[key].to_pylist()
    counts = dups["count"].to_pylist()
    return make_violations(
        "c1_url_unique", urls, -1, "error", [f"count={c}" for c in counts]
    )
