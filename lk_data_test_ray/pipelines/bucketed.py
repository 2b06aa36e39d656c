"""Bucketed (sort-merge-bucket-style) storage: hash-bucketed parquet write
plus a shuffle-free co-bucketed join.

The scale rationale: at 10^12 rows every ``Dataset.join`` is an all-to-all
exchange of the fact table.  If the corpus is written ONCE partitioned by a
stable hash of the join key (``bucket_write``), then every later join on that
key degenerates into N independent bucket-pair tasks (``bucketed_join``) —
no shuffle, no driver materialization, and a failed run resumes per bucket
because each bucket directory is a self-contained unit (the resumable-output
rule).  This is the "pick ONE partitioning key and reuse it across stages"
pattern; the reference's curation scripts re-scan and re-index the same
listperson/listwork key space in every check
(``curation/check_authors_exist_in_listperson.py:12-25``) — bucketing is the
at-scale replacement for those repeated index builds.

Partitioning assumptions (documented per the custom-operator rule):
  * both sides were bucketed with the SAME ``n_buckets`` and the same stable
    hash family (``_bucket_codes``: SipHash for strings via
    ``pd.util.hash_array``, Fibonacci multiply-shift for integers — both
    process-stable);
  * one bucket PAIR fits a worker's heap (size ``n_buckets`` to the data:
    buckets of ~1-4 GB keep the per-task Acero hash join in memory).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _bucket_codes(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Stable bucket id per row: 64-bit hash of the key, modulo n_buckets."""
    from ..functions.hashing import hash_strings64

    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype == object:
        h = hash_strings64(vals.astype(object))
    else:
        h = (vals.astype(np.int64).view(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucket_write(ds: rd.Dataset, key: str, out_dir: str,
                 n_buckets: int = 16) -> None:
    """Write ``ds`` hive-partitioned as ``out_dir/bucket=<i>/``.

    One streaming pass: tag each row's bucket inside ``map_batches`` (no
    shuffle — the sink groups rows by partition value per block, so a block
    fans out to at most ``n_buckets`` files; co-location happens at READ
    time, which is what the join needs).
    """

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(_bucket_codes(batch[key], n_buckets)))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])


def _bucket_dir(root: str, i: int) -> str:
    return os.path.join(root, f"bucket={i}")


def _read_bucket(root: str, i: int, schema: pa.Schema) -> pa.Table:
    files = sorted(glob.glob(os.path.join(_bucket_dir(root, i), "*.parquet")))
    if not files:
        return schema.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def _side_schema(root: str) -> pa.Schema:
    files = sorted(glob.glob(os.path.join(root, "bucket=*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no bucketed parquet under {root}")
    # data files don't carry the hive partition column
    return pq.read_schema(files[0])


def bucketed_join(left_dir: str, right_dir: str, left_on: str, right_on: str,
                  n_buckets: int = 16, join_type: str = "inner") -> rd.Dataset:
    """Join two co-bucketed parquet corpora WITHOUT a shuffle.

    One Ray task per bucket id: read ``left_dir/bucket=i`` and
    ``right_dir/bucket=i`` and run an in-memory Acero ``pa.Table.join``.
    Equal keys hash to equal buckets on both sides, so the bucket-pair joins
    are independent and their union is exactly the global join
    (property-tested against a whole-table join in tests/test_bucketed.py).
    """
    lschema, rschema = _side_schema(left_dir), _side_schema(right_dir)

    @ray.remote
    def join_bucket(i: int) -> pa.Table:
        lt = _read_bucket(left_dir, i, lschema)
        rt = _read_bucket(right_dir, i, rschema)
        return lt.join(rt, keys=[left_on], right_keys=[right_on],
                       join_type=join_type).combine_chunks()

    refs = [join_bucket.remote(i) for i in range(n_buckets)]
    return rd.from_arrow_refs(refs)
