"""Distributed BPE trainer vs a single-process reference."""
import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from lk_data_test_ray.functions.bpe import apply_merge_batch, train_bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE on a word-frequency dict, same tiebreak (count desc,
    (left, right) lexical asc), leftmost-greedy non-overlapping apply."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(n_merges):
        counts = collections.Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), w = best
        merges.append((step, a, b, a + b, w))
        for word, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[word] = out
    return merges


def test_apply_merge_overlapping_chain():
    batch = pa.table({
        "syms": pa.array([["a", "a", "a"], ["a", "a", "a", "a"],
                          ["b", "a", "a"], []],
                         pa.list_(pa.string())),
        "n": pa.array([1, 1, 1, 1], pa.int64()),
    })
    out = apply_merge_batch(batch, "a", "a")
    assert out["syms"].to_pylist() == [
        ["aa", "a"], ["aa", "aa"], ["b", "aa"], []]


def test_train_bpe_matches_reference():
    rng = np.random.default_rng(3)
    vocab = ["the", "then", "there", "other", "hello", "help", "low",
             "lower", "lowest", "newest", "widest", "banana", "bandana"]
    wc = {w: int(rng.integers(1, 50)) for w in vocab}
    ds = rd.from_arrow(pa.table({
        "word": pa.array(list(wc), pa.string()),
        "n": pa.array([wc[w] for w in wc], pa.int64()),
    })).repartition(4)
    got = train_bpe(ds, n_merges=10).to_pylist()
    ref = _ref_bpe(wc, 10)
    assert [(r["step"], r["left"], r["right"], r["merged"], r["n"])
            for r in got] == ref


def test_bpe_encode_matches_reference(sf_dir):
    from lk_data_test_ray.pipelines.queries import (t_bpe_encode,
                                                    t_bpe_merges)

    merges = t_bpe_merges(sf_dir).to_pylist()
    got = t_bpe_encode(sf_dir).to_pandas().set_index("doc_id")

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    checked = 0
    for _, row in docs.head(40).iterrows():
        words = [w for w in (row["text"] or "").split() if w]
        n_bpe = 0
        for w in words:
            s = list(w)
            for m in merges:
                a, b = m["left"], m["right"]
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            n_bpe += len(s)
        g = got.loc[row["doc_id"]]
        assert int(g["n_words"]) == len(words)
        assert int(g["n_bpe_tokens"]) == n_bpe, row["doc_id"]
        checked += 1
    assert checked == 40


def test_train_bpe_survives_empty_block(ray_session):
    """A zero-row block can bypass the to_syms UDF inside train_bpe and
    reach step_task with the upstream (word, n) schema — regression for
    the KeyError('syms') seen in a long-session sweep."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lk_data_test_ray.functions.bpe import train_bpe

    live = pa.table({"word": pa.array(["abab", "ab"], pa.string()),
                     "n": pa.array([3, 2], pa.int64())})
    empty = live.slice(0, 0)
    ds = rd.from_arrow_refs([ray.put(empty), ray.put(live)])
    got = train_bpe(ds, n_merges=2).to_pydict()
    want = train_bpe(rd.from_arrow(live), n_merges=2).to_pydict()
    assert got == want
    assert got["merged"][0] == "ab"
