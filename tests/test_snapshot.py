"""snapshot_diff: classification matrix, unchanged rows dropped, string
payload columns."""

import pyarrow as pa
import ray.data as rd


def test_snapshot_diff_matrix(ray_session):
    from lk_data_test_ray.pipelines.snapshot import snapshot_diff

    a = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array(["a", "b", "c", "d"])})
    b = pa.table({"k": pa.array([2, 3, 4, 5], pa.int64()),
                  "v": pa.array(["b", "CHANGED", "d", "e"])})
    out = pa.concat_tables(
        snapshot_diff(rd.from_arrow(a).repartition(2),
                      rd.from_arrow(b).repartition(3), "k", ["v"])
        .iter_batches(batch_format="pyarrow", batch_size=None))
    got = dict(zip(out["k"].to_pylist(), out["status"].to_pylist()))
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_identical(ray_session):
    from lk_data_test_ray.pipelines.snapshot import snapshot_diff

    a = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "x": pa.array([1.5, 2.5], pa.float64()),
                  "y": pa.array(["p", "q"])})
    batches = list(
        snapshot_diff(rd.from_arrow(a), rd.from_arrow(a), "k", ["x", "y"])
        .iter_batches(batch_format="pyarrow", batch_size=None))
    assert sum(b.num_rows for b in batches) == 0
