"""exchange_join (raw two-sided hash exchange + per-partition Acero join)
must equal a single-table Arrow join for every join type, key dtype, and
duplicate/empty-side shape — it now carries q3/q5/q10, J2/J3, the bigram-LM
joins and PageRank."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from lk_data_test_ray.relational import exchange_join  # noqa: E402

JOIN_TYPES = ["inner", "left_outer", "full_outer", "left_semi", "left_anti"]


def _sorted_pd(tbl: pa.Table):
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True)


def _make(rng, n, key_pool, ktype):
    keys = rng.choice(key_pool, size=n)
    if ktype == "string":
        keys = np.array([f"k{v}" for v in keys], dtype=object)
        karr = pa.array(keys, pa.string())
    else:
        karr = pa.array(keys.astype(np.int64), pa.int64())
    return keys, karr


@pytest.mark.parametrize("how", JOIN_TYPES)
@pytest.mark.parametrize("ktype", ["int", "string"])
def test_exchange_join_equals_arrow_join(ray_session, how, ktype):
    import ray.data as rd

    rng = np.random.default_rng(42)
    _, lk = _make(rng, 200, np.arange(60), ktype)
    _, rk = _make(rng, 150, np.arange(40, 90), ktype)
    left = pa.table({"k": lk, "a": pa.array(rng.integers(0, 5, 200))})
    right = pa.table({"rk": rk, "b": pa.array(rng.integers(0, 5, 150))})
    want = left.join(right, keys=["k"], right_keys=["rk"],
                     join_type=how.replace("_", " "))
    got = exchange_join(
        rd.from_arrow(left).repartition(7),
        rd.from_arrow(right).repartition(5),
        "k", "rk", how=how, p_bits=3)
    got_tbl = pa.concat_tables(
        [b for b in got.iter_batches(batch_format="pyarrow",
                                     batch_size=None)],
        promote_options="default")
    assert _sorted_pd(got_tbl).equals(_sorted_pd(want)), how


def test_exchange_join_empty_sides(ray_session):
    import ray.data as rd

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "a": pa.array([10, 20], pa.int64())})
    empty = pa.table({"rk": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    out = exchange_join(rd.from_arrow(left), rd.from_arrow(empty),
                        "k", "rk", how="left_outer", p_bits=2).to_pandas()
    assert len(out) == 2 and out["b"].isna().all()
    out2 = exchange_join(rd.from_arrow(left), rd.from_arrow(empty),
                         "k", "rk", how="inner", p_bits=2).to_pandas()
    assert len(out2) == 0


def test_exchange_join_null_keys(ray_session):
    """Null join keys never match (SQL semantics), but left_outer keeps the
    null-keyed left rows with a null right side."""
    import ray.data as rd

    left = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                     "a": pa.array([10, 11, 12], pa.int64())})
    right = pa.table({"rk": pa.array([1, None], pa.int64()),
                      "b": pa.array([100, 101], pa.int64())})
    inner = exchange_join(rd.from_arrow(left), rd.from_arrow(right),
                          "k", "rk", how="inner", p_bits=2).to_pandas()
    assert sorted(inner["a"]) == [10]
    louter = exchange_join(rd.from_arrow(left), rd.from_arrow(right),
                           "k", "rk", how="left_outer", p_bits=2).to_pandas()
    assert len(louter) == 3
    assert louter.set_index("a")["b"].notna().to_dict() == {
        10: True, 11: False, 12: False}
