"""Unit tests for the dedup family: exact, first-wins, shingle Jaccard,
MinHash+LSH, SimHash, embedding cosine."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lk_data_test_ray.pipelines import dedup

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different words entirely here now",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "another unrelated document about databases",
        "short",
    ],
})


def _ds():
    return rd.from_arrow(DOCS)


def test_exact_dedup_groups():
    out = dedup.exact_dedup_groups(_ds(), "doc_id", "text").to_pandas()
    dups = out[out["n_rows"] > 1]
    assert len(dups) == 1
    assert dups.iloc[0]["keeper_id"] == 0  # min id wins, order-independent
    assert dups.iloc[0]["n_rows"] == 2
    assert len(out) == 5  # 5 distinct texts


def test_first_wins():
    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"], "id": pa.array([7, 3, 9], pa.int64())}))
    out = dedup.first_wins(ds, ["k"], "id").to_pandas()
    got = {r["k"]: (r["keeper_id"], r["group_size"])
           for _, r in out.iterrows()}
    assert got == {"a": (3, 2), "b": (9, 1)}


def _jaccard(a: str, b: str, k: int = 2) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)} \
            if len(toks) >= k else {" ".join(toks)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_shingle_jaccard_pairs_exact():
    out = dedup.shingle_jaccard_pairs(_ds(), "doc_id", "text", k=2,
                                      threshold=0.5).to_pandas()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for _, r in out.iterrows()}
    # exact dup pair (0,3) at J=1.0; near-dup (0,1) and (1,3)
    assert pairs[(0, 3)] == 1.0
    exp = _jaccard(DOCS["text"][0].as_py(), DOCS["text"][1].as_py())
    assert abs(pairs[(0, 1)] - round(exp, 6)) < 1e-9
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_near_dups():
    out = dedup.minhash_lsh_pairs(_ds(), "doc_id", "text", num_perm=64,
                                  bands=16, threshold=0.5).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 3) in pairs  # exact dup always collides
    assert (0, 1) in pairs  # J≈0.78 → collision prob ≈ 1 at 16 bands of 4
    est = dict(zip(zip(out["id_a"], out["id_b"]), out["est_jaccard"]))
    assert est[(0, 3)] == 1.0


def test_simhash_pairs():
    out = dedup.simhash_pairs(_ds(), "doc_id", "text",
                              max_hamming=6).to_pandas()
    pairs = dict(zip(zip(out["id_a"], out["id_b"]), out["hamming"]))
    assert pairs[(0, 3)] == 0  # identical text → identical simhash


def test_embedding_cosine_pairs():
    vecs = np.eye(4, dtype=np.float64)
    vecs = np.vstack([vecs, [1.0, 0.02, 0.0, 0.0]])  # ≈ e0
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(5), pa.int64()),
        "vec": [list(v) for v in vecs],
        "block": pa.array([0] * 5, pa.int32()),
    }))
    out = dedup.embedding_cosine_pairs(ds, "id", "vec", "block",
                                       threshold=0.95).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(0, 4)}
    assert out.iloc[0]["cosine"] > 0.999


def test_shingle_jaccard_matmul_equals_inverted_index():
    a = dedup.shingle_jaccard_pairs(_ds(), "doc_id", "text", k=2,
                                    threshold=0.5).to_pandas()
    b = dedup.shingle_jaccard_pairs_matmul(_ds(), "doc_id", "text", k=2,
                                           threshold=0.5).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["jaccard"], b["jaccard"], atol=1e-9)


def test_connected_components():
    # two components: {1,2,3,7} (chain) and {10,11}; min-label clusters
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 7, 10], pa.int64()),
        "id_b": pa.array([2, 3, 3, 11], pa.int64()),
    }))
    out = dedup.connected_components(pairs).to_pandas()
    got = dict(zip(out["node"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_asof_join():
    from lk_data_test_ray.relational import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "lt": pa.array([10, 25, 5, 30], pa.int64()),
        "ev": ["a", "b", "c", "d"],
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "rt": pa.array([8, 20, 40], pa.int64()),
        "val": pa.array([100, 200, 300], pa.int64()),
    }))
    out = asof_join(left, right, "k", "lt", "rt",
                    left_cols=["ev"], right_cols=["val"]).to_pandas()
    got = {(r["k"], r["lt"]): r["val"] for _, r in out.iterrows()}
    assert got[(1, 10)] == 100   # latest right ts ≤ 10 is 8
    assert got[(1, 25)] == 200   # 20
    assert np.isnan(got[(2, 5)])  # nothing precedes 5
    assert np.isnan(got[(2, 30)])  # right ts 40 is after
    assert len(out) == 4


def test_shingle_jaccard_matmul_fallback_guard():
    """With a tiny max_dense_cells the guard must route to the inverted-index
    plan BEFORE any driver collect — and results stay identical."""
    a = dedup.shingle_jaccard_pairs_matmul(
        _ds(), "doc_id", "text", k=2, threshold=0.5,
        max_dense_cells=1).to_pandas()
    b = dedup.shingle_jaccard_pairs(_ds(), "doc_id", "text", k=2,
                                    threshold=0.5).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["jaccard"], b["jaccard"], atol=1e-9)


def test_bloom_incremental_members_exact():
    """Bloom pre-screen + exact verify equals a plain exact semi-join
    (zero false negatives end-to-end), including key overlap and misses."""
    committed = rd.from_arrow(pa.table({
        "rid": pa.array([1, 2, 3], pa.int64()),
        "k": ["a", "b", "c"],
    }))
    incoming = rd.from_arrow(pa.table({
        "rid": pa.array([10, 11, 12, 13], pa.int64()),
        "k": ["b", "x", "c", "y"],
    }))
    out = dedup.bloom_incremental_members(
        committed, incoming, ["k"], capacity=1 << 10).to_pandas()
    assert sorted(out["rid"]) == [10, 12]
    # all-miss incoming → empty result, no crash on empty candidate blocks
    none_in = rd.from_arrow(pa.table({
        "rid": pa.array([20], pa.int64()), "k": ["zz"]}))
    out2 = dedup.bloom_incremental_members(
        committed, none_in, ["k"], capacity=1 << 10).to_pandas()
    assert len(out2) == 0


def test_minhash_batch_equals_scalar():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lk_data_test_ray.functions.hashing import (minhash_signature,
                                                    minhash_signatures_batch)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.lists(st.text(max_size=8), max_size=12), max_size=6))
    def check(docs):
        got = minhash_signatures_batch(docs, 16)
        for i, d in enumerate(docs):
            assert (got[i] == minhash_signature(d, 16)).all()

    check()


def test_connected_components_distributed_path_matches():
    """Force the distributed rounds (driver_max_edges=0) and check identical
    clustering to the driver-side numpy path on a chain + separate pair."""
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([5, 4, 3, 2, 100], pa.int64()),
        "id_b": pa.array([4, 3, 2, 1, 101], pa.int64()),
    }))
    fast = dedup.connected_components(pairs).to_pandas()
    dist = dedup.connected_components(pairs, driver_max_edges=0).to_pandas()
    f = dict(zip(fast["node"], fast["cluster"]))
    d = dict(zip(dist["node"], dist["cluster"]))
    assert f == d == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 100: 100, 101: 100}


def test_minhash_from_token_hashes_edges():
    """Token-hash signer semantics: dup docs identical, zero-token docs get
    the sentinel signature, single-token docs fold just their own token
    (never a cross-doc-boundary shingle)."""
    import numpy as np
    import pandas as pd

    from lk_data_test_ray.functions.hashing import (_MERSENNE61,
                                                    minhash_from_token_hashes)

    toks = ["a b c", "a b c", "", "z", "q r"]
    flat = [t for d in toks for t in d.split()]
    counts = np.array([len(d.split()) for d in toks], dtype=np.int64)
    th = pd.util.hash_array(np.array(flat, dtype=object), categorize=False)
    sig = minhash_from_token_hashes(th, counts, 32)
    assert (sig[0] == sig[1]).all()                      # dup-identical
    assert (sig[2] == np.uint64(_MERSENNE61 - 1)).all()  # empty sentinel
    # single-token doc: signature = fold of its own token only — recompute
    # it standalone (so no neighboring doc can have leaked into the fold)
    solo = minhash_from_token_hashes(
        pd.util.hash_array(np.array(["z"], dtype=object), categorize=False),
        np.array([1], dtype=np.int64), 32)
    assert (sig[3] == solo[0]).all()


def test_simhash_batch_equals_scalar():
    import numpy as np
    import pandas as pd

    from lk_data_test_ray.functions.hashing import simhash64, simhash64_batch

    docs = [["a", "b", "c"], [], ["z"], ["b", "a", "c", "a"], ["q", "r"]]
    flat = [t for d in docs for t in d]
    counts = np.array([len(d) for d in docs], dtype=np.int64)
    th = (pd.util.hash_array(np.array(flat, dtype=object), categorize=False)
          if flat else np.empty(0, np.uint64))
    got = simhash64_batch(th, counts)
    for i, d in enumerate(docs):
        assert int(got[i]) == simhash64(d), (i, d)


def test_semantic_dedup_matches_numpy_reference():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lk_data_test_ray.pipelines.dedup import semantic_dedup
    from lk_data_test_ray.pipelines.similarity import (_normalize,
                                                       train_centroids)

    rng = np.random.default_rng(5)
    n, d, tau, cells = 300, 16, 0.95, 4
    base = rng.normal(size=(40, d))
    # near-identical groups: each base vector plus jittered copies
    X = np.concatenate([base[rng.integers(0, 40, n - 40)]
                        + rng.normal(scale=0.01, size=(n - 40, d)), base])
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float64())),
    }))
    got = semantic_dedup(ds, "vec_id", "embedding", n_cells=cells,
                         threshold=tau, train_sample=4096).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)

    # single-process reference with identical semantics
    cents = train_centroids(X[: 2048].astype(np.float64), cells, seed=13)
    Xn = _normalize(X.astype(np.float64))
    cell = np.argmax(Xn @ cents.T, axis=1)
    ref_keeper = np.empty(n, dtype=np.int64)
    for c in np.unique(cell):
        sel = np.flatnonzero(cell == c)
        S = Xn[sel]
        adj = (S @ S.T) >= tau
        lab = ids[sel].astype(float)
        while True:
            new = np.min(np.where(adj, lab[None, :], np.inf), axis=1)
            if np.array_equal(new, lab):
                break
            lab = new
        ref_keeper[sel] = lab.astype(np.int64)
    assert (got["cluster"].to_numpy() == cell).all()
    assert (got["keeper"].to_numpy() == ref_keeper).all()
    # the jittered corpus must actually deduplicate something
    assert (got["keeper"] != got["id"]).sum() > 50


def test_gram_hash_pairs_equality_structure():
    """The 128-bit gram-hash fold must induce EXACTLY the string grams'
    equality classes (fuzzed): equal windows hash equal, different windows
    hash different (collisions impossible at this scale)."""
    import numpy as np
    import pyarrow as pa

    from lk_data_test_ray.functions.hashing import (gram_hash_pairs,
                                                    hash_strings64)
    from lk_data_test_ray.functions.text import word_ngrams_batch

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(12)], dtype=object)
    K = 4
    for trial in range(20):
        n_docs = int(rng.integers(1, 9))
        texts, all_counts, all_toks = [], [], []
        for _ in range(n_docs):
            ln = int(rng.integers(0, 14))  # includes docs shorter than K
            toks = list(vocab[rng.integers(0, len(vocab), ln)])
            texts.append(" ".join(toks) if toks else None)
        arr = pa.array(texts, pa.string())
        grams, gcnt, grow = word_ngrams_batch(arr, K)
        gs = np.array(grams.to_pylist(), dtype=object)

        import pyarrow.compute as pc
        toks = pc.split_pattern_regex(arr, r"\s+")
        counts = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).dictionary_encode()
        if len(flat):
            uh = hash_strings64(
                flat.dictionary.to_numpy(zero_copy_only=False))
            th = uh[flat.indices.to_numpy(zero_copy_only=False)]
        else:
            th = np.empty(0, np.uint64)
        h1, h2, grow2 = gram_hash_pairs(th, counts, K)
        assert len(h1) == len(gs)
        assert (grow2 == grow).all()
        key = [(int(a), int(b)) for a, b in zip(h1, h2)]
        # same string gram <=> same hash pair
        for i in range(len(gs)):
            for j in range(i + 1, len(gs)):
                assert (gs[i] == gs[j]) == (key[i] == key[j]), \
                    (trial, gs[i], gs[j])


def test_md5_hex_matches_hashlib():
    """md5_hex / md5_hex_ints (DuckDB C kernel on the hot path) are exactly
    hashlib's md5 over utf-8 bytes, with NULL passthrough — the sampling-key
    spec the td_* oracles assume."""
    import hashlib

    import pyarrow as pa

    from lk_data_test_ray.functions.hashing import md5_hex, md5_hex_ints

    vals = ["", "a", "hello world", "héllo wörld", "日本語" * 40,
            None, "x" * 1000]
    got = md5_hex(vals)
    for v, g in zip(vals, got):
        ref = None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
        assert g == ref, (v, g)
    # chunked Arrow input (the map_batches shape) and int-id fast path
    got2 = md5_hex(pa.chunked_array([pa.array(["ab", "cd"]), pa.array(["ef"])]))
    assert list(got2) == [hashlib.md5(x.encode()).hexdigest()
                          for x in ["ab", "cd", "ef"]]
    ids = [0, -5, 123456789, 2 ** 62, -(2 ** 62)]
    assert list(md5_hex_ints(ids)) == [
        hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def test_capped_pair_indices():
    """≤cap: exhaustive triu; >cap: bounded (≤8n), unique, chain-complete
    (consecutive pairs present ⇒ true dup clusters stay connected)."""
    ia, ib = dedup._capped_pair_indices(5, 512)
    ra, rb = np.triu_indices(5, k=1)
    assert (ia == ra).all() and (ib == rb).all()
    n, cap = 5000, 64
    ia, ib = dedup._capped_pair_indices(n, cap)
    assert len(ia) <= 8 * n
    assert (ia < ib).all() and ib.max() < n and ia.min() >= 0
    pairs = set(zip(ia.tolist(), ib.tolist()))
    assert len(pairs) == len(ia)  # no duplicate pairs
    assert all((i, i + 1) in pairs for i in range(n - 1))  # the chain


def test_lsh_degenerate_bucket_bounded_and_connected():
    """Boilerplate-bucket property (round-3 verdict item): thousands of
    copies of ONE template must not blow up bucket pairing or the survivor
    signature broadcast. Low bucket_cap + sig_broadcast_limit=0 force both
    bounded paths; every template copy must still land in one connected
    component of the output pairs."""
    n_tpl, n_noise = 2000, 500
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    texts = ["copyright notice all rights reserved contact us about"] * n_tpl
    texts += [" ".join(rng.choice(words, size=12).tolist())
              for _ in range(n_noise)]
    tbl = pa.table({
        "doc_id": pa.array(range(n_tpl + n_noise), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = dedup.minhash_lsh_pairs(
        rd.from_arrow(tbl), "doc_id", "text", num_perm=32, bands=8,
        threshold=0.9, bucket_cap=64, sig_broadcast_limit=0).to_pandas()
    # bounded: the capped subset is ≤ ~8n per band bucket, never n^2/2
    assert 0 < len(out) <= 8 * (n_tpl + n_noise) * 8
    # connectivity: union-find over emitted pairs joins ALL template copies
    parent = list(range(n_tpl + n_noise))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(out["id_a"], out["id_b"]):
        parent[find(int(a))] = find(int(b))
    roots = {find(i) for i in range(n_tpl)}
    assert len(roots) == 1  # one template cluster, fully connected
    assert (out["est_jaccard"] >= 0.9).all()


def test_lsh_exchange_path_equals_broadcast():
    """sig_broadcast_limit=0 (exchange-joined signatures) and the default
    broadcast path produce identical pairs + estimates on the normal
    fixture."""
    kw = dict(num_perm=64, bands=16, threshold=0.5)
    a = dedup.minhash_lsh_pairs(_ds(), "doc_id", "text", **kw).to_pandas()
    b = dedup.minhash_lsh_pairs(_ds(), "doc_id", "text",
                                sig_broadcast_limit=0, **kw).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["est_jaccard"], b["est_jaccard"])


def test_simhash_capped_bucket():
    """SimHash pairing respects the bucket cap (bounded output on a
    degenerate identical-text corpus) and still finds the dups."""
    n = 300
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["same exact text for everyone"] * n, pa.string()),
    })
    out = dedup.simhash_pairs(rd.from_arrow(tbl), "doc_id", "text",
                              bucket_cap=16).to_pandas()
    assert 0 < len(out) <= 8 * n
    assert (out["hamming"] == 0).all()


def test_cdc_chunks_match_scalar_replay(ray_session):
    """Vectorized zero-copy CDC chunking must equal a per-byte scalar
    replay of the gear-window boundary rule, including null/empty docs
    and sliced input arrays."""
    import numpy as np
    import pyarrow as pa

    from lk_data_test_ray.pipelines.dedup import (CDC_MASK, CDC_WINDOW,
                                                  _gear, cdc_chunks)

    def scalar(ids, texts):
        out = []
        for di, tx in zip(ids, texts):
            if tx is None:
                continue
            b = tx.encode()
            cuts = [j + 1 for j in range(CDC_WINDOW - 1, len(b))
                    if (sum(int(_gear(np.array([b[j - k]], np.uint8))[0])
                            << k for k in range(CDC_WINDOW)) & CDC_MASK)
                    == 0 and j + 1 < len(b)]
            bounds = [0] + cuts + [len(b)]
            ci = 0
            for a, e in zip(bounds[:-1], bounds[1:]):
                if e > a:
                    out.append((di, ci, tx[a:e]))
                    ci += 1
        return out

    rng = np.random.default_rng(7)
    texts = ["".join(chr(rng.integers(97, 123))
                     for _ in range(int(rng.integers(0, 400))))
             for _ in range(30)]
    texts[5] = None
    texts[7] = ""
    ids = list(range(100, 130))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    for t in (tbl, tbl.slice(3, 20)):
        got = list(zip(cdc_chunks(t)["doc_id"].to_pylist(),
                       cdc_chunks(t)["chunk_idx"].to_pylist(),
                       cdc_chunks(t)["chunk"].to_pylist()))
        want = scalar(t["doc_id"].to_pylist(), t["text"].to_pylist())
        assert got == want

    # content shifted by a prefix still yields the same tail chunks
    # (the position-independence fixed-size blocking lacks)
    base = texts[0]
    shifted = "zq" + base
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array([base, shifted], pa.string())})
    ch = cdc_chunks(t2)
    c1 = [c for d, c in zip(ch["doc_id"].to_pylist(),
                            ch["chunk"].to_pylist()) if d == 1]
    c2 = [c for d, c in zip(ch["doc_id"].to_pylist(),
                            ch["chunk"].to_pylist()) if d == 2]
    if len(c1) > 2 and len(c2) > 2:
        assert c1[-1] == c2[-1]
