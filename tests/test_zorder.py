"""Z-order clustering: morton math, pruning effectiveness, losslessness."""
import numpy as np
import pyarrow.parquet as pq

from lk_data_test_ray.pipelines.zorder import (minmax2, morton2,
                                               overlapping_files, quantize,
                                               zorder_write)


def test_morton_interleave_bits():
    a = np.array([0b1010], dtype=np.uint64)
    b = np.array([0b0110], dtype=np.uint64)
    # a's bits land on odd positions, b's on even
    z = morton2(a, b)[0]
    assert z == 0b10011100, bin(z)
    # monotone along each axis when the other is fixed
    xs = np.arange(100, dtype=np.uint64)
    fixed = np.zeros(100, dtype=np.uint64)
    assert (np.diff(morton2(xs, fixed).astype(np.int64)) > 0).all()
    assert (np.diff(morton2(fixed, xs).astype(np.int64)) > 0).all()


def test_quantize_clips_and_spans():
    v = np.array([0, 50, 100], dtype=np.int64)
    q = quantize(v, 0, 100, bits=16)
    assert q[0] == 0 and q[2] == (1 << 16) - 1 and 0 < q[1] < q[2]
    # degenerate span doesn't divide by zero
    assert (quantize(v, 5, 5) <= (1 << 16) - 1).all()


def test_zorder_prunes_both_dims_and_is_lossless(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 20_000
    import pyarrow as pa

    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n).astype(np.int64)),
    })
    ds = rd.from_arrow(tbl).repartition(8)
    bounds = minmax2(ds, "user_id", "ts")
    out = str(tmp_path / "z")
    zorder_write(ds, "user_id", "ts", out, bounds, n_files=16)

    # lossless: every row survives the rewrite exactly once
    back = pq.read_table(out)
    assert back.num_rows == n
    assert (np.sort(back["event_id"].to_numpy()) == np.arange(n)).all()

    # corner predicate (10% x 10%) must prune most files; a single-dim
    # sort can never prune the second dimension
    a_lo, a_hi, b_lo, b_hi = bounds
    u = (a_lo, a_lo + (a_hi - a_lo) // 10)
    t = (b_lo, b_lo + (b_hi - b_lo) // 10)
    keep, total = overlapping_files(out, "user_id", "ts", u, t)
    assert total == 16
    assert len(keep) <= total // 4, (len(keep), total)

    # soundness: rows matching the predicate all live in surviving files
    m = ((back["user_id"].to_numpy() >= u[0])
         & (back["user_id"].to_numpy() <= u[1])
         & (back["ts"].to_numpy() >= t[0])
         & (back["ts"].to_numpy() <= t[1]))
    want = set(back["event_id"].to_numpy()[m].tolist())
    got = set()
    for f in keep:
        ft = pq.read_table(f)
        fm = ((ft["user_id"].to_numpy() >= u[0])
              & (ft["user_id"].to_numpy() <= u[1])
              & (ft["ts"].to_numpy() >= t[0])
              & (ft["ts"].to_numpy() <= t[1]))
        got |= set(ft["event_id"].to_numpy()[fm].tolist())
    assert got == want
