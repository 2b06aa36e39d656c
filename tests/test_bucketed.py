"""Bucketed storage: round-trip, cross-side bucket agreement, and
shuffle-free bucketed join == whole-table join."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _sorted(tbl: pa.Table, keys) -> pa.Table:
    import pyarrow.compute as pc
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(k, "ascending")
                                                    for k in keys]))


def test_bucket_write_roundtrip_and_join(ray_session, tmp_path):
    from lk_data_test_ray.pipelines.bucketed import (bucket_write,
                                                     bucketed_join)

    rng = np.random.default_rng(7)
    # keys span buckets; some left keys missing on the right and vice versa
    lk = rng.integers(0, 50, 300)
    rk = np.arange(10, 60)
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "v": pa.array(rng.integers(0, 1000, 300), pa.int64())})
    right = pa.table({"rk": pa.array(rk, pa.int64()),
                      "name": pa.array([f"n{k}" for k in rk])})

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    bucket_write(rd.from_arrow(left).repartition(4), "k", ldir, n_buckets=8)
    bucket_write(rd.from_arrow(right), "rk", rdir, n_buckets=8)

    # round trip: all rows come back
    import glob
    import pyarrow.parquet as pq
    got = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(f"{ldir}/bucket=*/*.parquet")])
    assert got.num_rows == 300
    assert _sorted(got.select(["k", "v"]), ["k", "v"]).equals(
        _sorted(left, ["k", "v"]))

    # bucketed join == whole-table Acero join
    joined = pa.concat_tables(
        bucketed_join(ldir, rdir, "k", "rk", n_buckets=8)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    want = left.join(right, keys=["k"], right_keys=["rk"], join_type="inner")
    assert _sorted(joined, ["k", "v"]).equals(_sorted(want, ["k", "v"]))


def test_bucketed_join_string_keys_empty_buckets(ray_session, tmp_path):
    from lk_data_test_ray.pipelines.bucketed import (bucket_write,
                                                     bucketed_join)

    # 3 distinct string keys over 16 buckets -> most buckets empty
    left = pa.table({"url": pa.array(["a", "b", "c", "a"]),
                     "x": pa.array([1, 2, 3, 4], pa.int64())})
    right = pa.table({"u": pa.array(["a", "c", "d"]),
                      "y": pa.array([10, 30, 40], pa.int64())})
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    bucket_write(rd.from_arrow(left), "url", ldir, n_buckets=16)
    bucket_write(rd.from_arrow(right), "u", rdir, n_buckets=16)

    joined = pa.concat_tables(
        bucketed_join(ldir, rdir, "url", "u", n_buckets=16)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    want = left.join(right, keys=["url"], right_keys=["u"], join_type="inner")
    assert _sorted(joined, ["url", "x"]).equals(_sorted(want, ["url", "x"]))
