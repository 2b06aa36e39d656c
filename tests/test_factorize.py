"""ALS factorization: determinism, reconstruction of a low-rank matrix,
and agreement with a driver-side numpy reference of the same updates."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _low_rank_ratings(n_users=40, n_items=6, rank=2, seed=3):
    rng = np.random.default_rng(seed)
    U = rng.standard_normal((n_users, rank))
    V = rng.standard_normal((n_items, rank))
    R = U @ V.T + 3.0
    # observe ~70% of cells
    mask = rng.random((n_users, n_items)) < 0.7
    u, i = np.nonzero(mask)
    return pa.table({
        "user": pa.array(u.astype(np.int64)),
        "item": pa.array([f"it{k}" for k in i], pa.string()),
        "val": pa.array(R[u, i], pa.float64()),
    }), R, mask


def _reference_als(tbl, rank=3, iters=8, reg=0.1, seed=17):
    """Driver numpy replay of the distributed updates (same init, same
    closed forms, same iteration order)."""
    u = tbl["user"].to_numpy(zero_copy_only=False)
    items = sorted(set(tbl["item"].to_pylist()))
    it = np.array([items.index(v) for v in tbl["item"].to_pylist()])
    r = tbl["val"].to_numpy(zero_copy_only=False)
    users = np.unique(u)
    n_items = len(items)
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n_items, rank)) * 0.1
    for _ in range(iters):
        U = np.zeros((len(users), rank))
        for k, uu in enumerate(users):
            m = u == uu
            qv = Q[it[m]]
            A = qv.T @ qv + reg * np.eye(rank)
            U[k] = np.linalg.solve(A, qv.T @ r[m])
        newQ = np.zeros_like(Q)
        pos = {int(x): k for k, x in enumerate(users)}
        uv = U[[pos[int(x)] for x in u]]
        for j in range(n_items):
            m = it == j
            A = uv[m].T @ uv[m] + reg * np.eye(rank)
            newQ[j] = np.linalg.solve(A, uv[m].T @ r[m])
        Q = newQ
    return users, U, items, Q


def test_als_reconstructs_low_rank_matrix(ray_session):
    from lk_data_test_ray.pipelines.factorize import als_factorize

    tbl, R, mask = _low_rank_ratings()
    user_parts, items, Q = als_factorize(
        rd.from_arrow(tbl).repartition(4), "user", "item", "val",
        rank=3, iters=12, reg=0.05)
    # stitch user factors
    ids = np.concatenate([p[0] for p in user_parts if len(p[0])])
    U = np.vstack([p[1] for p in user_parts if len(p[0])])
    order = np.argsort(ids)
    ids, U = ids[order], U[order]
    item_pos = {v: k for k, v in enumerate(items)}
    pred = U @ Q.T
    # observed-cell RMSE far below the matrix's own std
    obs = []
    for k, uu in enumerate(ids):
        for j, itname in enumerate(items):
            jj = int(itname[2:])
            if mask[uu, jj]:
                obs.append(pred[k, item_pos[itname]] - R[uu, jj])
    rmse = float(np.sqrt(np.mean(np.square(obs))))
    assert rmse < 0.15, rmse
    assert rmse < 0.1 * float(R.std())


def test_als_matches_reference_and_is_deterministic(ray_session):
    from lk_data_test_ray.pipelines.factorize import als_factorize

    tbl, _, _ = _low_rank_ratings(n_users=25, n_items=5, seed=9)
    runs = []
    for _ in range(2):
        user_parts, items, Q = als_factorize(
            rd.from_arrow(tbl).repartition(3), "user", "item", "val",
            rank=3, iters=8)
        ids = np.concatenate([p[0] for p in user_parts if len(p[0])])
        U = np.vstack([p[1] for p in user_parts if len(p[0])])
        order = np.argsort(ids)
        runs.append((ids[order], U[order], items, Q))
    assert np.array_equal(runs[0][0], runs[1][0])
    assert np.array_equal(runs[0][1], runs[1][1])  # bit-identical rerun
    assert np.array_equal(runs[0][3], runs[1][3])

    ru, rU, ritems, rQ = _reference_als(tbl)
    assert ritems == runs[0][2]
    assert np.array_equal(ru, runs[0][0])
    # same math, different summation order -> tight numeric agreement
    assert np.allclose(rQ, runs[0][3], atol=1e-8)
    assert np.allclose(rU, runs[0][1], atol=1e-8)


def test_als_recommend_masks_seen_items(ray_session):
    from lk_data_test_ray.pipelines.factorize import als_recommend

    tbl, _, _ = _low_rank_ratings(n_users=20, n_items=4, seed=5)
    out = als_recommend(rd.from_arrow(tbl).repartition(3),
                        "user", "item", "val", rank=2, iters=5)
    seen = set(zip(tbl["user"].to_pylist(), tbl["item"].to_pylist()))
    recs = list(zip(out["user_id"].to_pylist(),
                    out["rec_item"].to_pylist()))
    assert len(recs) > 0
    for u, i in recs:
        assert (u, i) not in seen
