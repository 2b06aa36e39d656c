"""PageRank operator: broadcast and shuffle execution shapes must agree
with each other and with a dense numpy power iteration."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _edges():
    # small directed graph with a dangling node (3) and a hub (0)
    e = [(1, 0), (2, 0), (3, 0), (0, 1), (2, 1), (4, 2), (0, 4), (4, 0)]
    return pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64()),
    })


def _dense_pagerank(edges, n, d=0.85, iters=5):
    od = np.zeros(n)
    for a, _ in edges:
        od[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for a, b in edges:
            c[b] += r[a] / od[a]
        r = (1 - d) / n + d * c
    return r


def test_pagerank_modes_agree(ray_session):
    from lk_data_test_ray.pipelines.graph import pagerank

    tbl = _edges()
    bcast = pagerank(rd.from_arrow(tbl), "src", "dst", iters=5,
                     mode="broadcast", round_digits=9)
    shuf = pagerank(rd.from_arrow(tbl), "src", "dst", iters=5,
                    mode="shuffle", round_digits=9)
    loc = pagerank(rd.from_arrow(tbl), "src", "dst", iters=5,
                   mode="local", round_digits=9)
    b = dict(zip(bcast["node"].to_pylist(), bcast["rank"].to_pylist()))
    s = dict(zip(shuf["node"].to_pylist(), shuf["rank"].to_pylist()))
    l = dict(zip(loc["node"].to_pylist(), loc["rank"].to_pylist()))
    assert set(b) == set(s) == set(l) == {0, 1, 2, 3, 4}
    for u in b:
        assert abs(b[u] - s[u]) < 1e-8, (u, b[u], s[u])
        assert abs(b[u] - l[u]) < 1e-8, (u, b[u], l[u])

    edges = list(zip(tbl["src"].to_pylist(), tbl["dst"].to_pylist()))
    want = _dense_pagerank(edges, 5)
    for u in b:
        assert abs(b[u] - want[u]) < 1e-8, (u, b[u], want[u])
