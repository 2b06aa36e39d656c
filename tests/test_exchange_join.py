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


# ---------------------------------------------------------------------------
# skew_join: hybrid broadcast-hot/exchange-cold must equal exchange_join
# ---------------------------------------------------------------------------

SKEW_TYPES = ["inner", "left_outer", "left_semi", "left_anti"]


@pytest.mark.parametrize("how", SKEW_TYPES)
@pytest.mark.parametrize("ktype", ["int", "string"])
def test_skew_join_equals_exchange_join(ray_session, how, ktype):
    import ray.data as rd

    from lk_data_test_ray.relational import skew_join

    rng = np.random.default_rng(11)
    n = 4000
    # pathological skew: one key owns half the left side
    raw = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 80, n))
    if ktype == "string":
        lk = pa.array([f"k{v}" for v in raw], pa.string())
        rk = pa.array([f"k{v}" for v in range(100)], pa.string())
    else:
        lk = pa.array(raw.astype(np.int64), pa.int64())
        rk = pa.array(np.arange(100, dtype=np.int64), pa.int64())
    left = rd.from_arrow(pa.table(
        {"k": lk, "v": np.arange(n, dtype=np.int64)})).repartition(6)
    right = rd.from_arrow(pa.table(
        {"rk": rk, "w": np.arange(100, dtype=np.int64) * 7})).repartition(3)

    got = _sorted_pd(pa.Table.from_pandas(
        skew_join(left, right, "k", "rk", how=how,
                  hot_count=300).to_pandas(), preserve_index=False))
    want = _sorted_pd(pa.Table.from_pandas(
        exchange_join(left, right, "k", "rk", how=how).to_pandas(),
        preserve_index=False))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), how


def test_skew_join_detects_hot_key(ray_session):
    import ray.data as rd

    from lk_data_test_ray.relational import detect_hot_keys

    rng = np.random.default_rng(5)
    n = 5000
    keys = np.where(rng.random(n) < 0.6, 42, rng.integers(100, 5000, n))
    ds = rd.from_arrow(pa.table(
        {"k": pa.array(keys.astype(np.int64))})).repartition(8)
    sketch, total = detect_hot_keys(ds.to_arrow_refs(), "k")
    assert total == n
    top = sketch.top(1)[0]
    assert top[0] == "42"
    # upper/lower bounds must bracket the true count
    true = int((keys == 42).sum())
    assert top[1] <= true <= top[2]


def test_skew_join_no_hot_keys_falls_back(ray_session):
    import ray.data as rd

    from lk_data_test_ray.relational import skew_join

    # uniform keys, huge threshold: hot set empty -> pure exchange path
    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(500, dtype=np.int64) % 50),
        "v": pa.array(np.arange(500, dtype=np.int64))})).repartition(4)
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.arange(50, dtype=np.int64)),
        "w": pa.array(np.arange(50, dtype=np.int64))}))
    got = _sorted_pd(pa.Table.from_pandas(
        skew_join(left, right, "k", "rk", hot_count=10**9).to_pandas(),
        preserve_index=False))
    want = _sorted_pd(pa.Table.from_pandas(
        exchange_join(left, right, "k", "rk").to_pandas(),
        preserve_index=False))
    assert got.equals(want)


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti"])
def test_exchange_join_bloom_reduce(ray_session, how):
    """Bloom pre-screen must not change results (zero false negatives);
    definite anti-misses bypass the exchange entirely."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    # low-selectivity join: right covers only 5% of the left key space
    lk = pa.array(rng.integers(0, 2000, 3000).astype(np.int64))
    rk = pa.array(np.arange(0, 100, dtype=np.int64))
    left = rd.from_arrow(pa.table(
        {"k": lk, "v": np.arange(3000, dtype=np.int64)})).repartition(5)
    right = rd.from_arrow(pa.table(
        {"rk": rk, "w": np.arange(100, dtype=np.int64)})).repartition(2)
    got = _sorted_pd(pa.Table.from_pandas(
        exchange_join(left, right, "k", "rk", how=how,
                      bloom_reduce=True).to_pandas(), preserve_index=False))
    want = _sorted_pd(pa.Table.from_pandas(
        exchange_join(left, right, "k", "rk", how=how).to_pandas(),
        preserve_index=False))
    assert got.equals(want), how
