"""Extraction determinism (the C6 invariant) + link extraction."""

from lk_data_test_ray.functions.extract import extract_links, extract_text


def test_basic_strip():
    html = b"<html><body><h1>Title</h1><p>Hello  world</p></body></html>"
    assert extract_text(html) == "Title Hello world"


def test_script_style_removed():
    html = b"<p>keep</p><script>var x = '<b>no</b>';</script><style>p{}</style><p>it</p>"
    assert extract_text(html) == "keep it"


def test_entities_and_whitespace():
    assert extract_text(b"<p>a &amp; b\n\t &lt;c&gt;&nbsp;d</p>") == "a & b <c> d"


def test_none_and_bytesish():
    assert extract_text(None) is None
    assert extract_text("<i>str input</i>") == "str input"
    assert extract_text(memoryview(b"<b>mv</b>")) == "mv"


def test_invalid_utf8_deterministic():
    bad = b"<p>ok \xff\xfe bytes</p>"
    assert extract_text(bad) == extract_text(bad)


def test_determinism_repeated():
    html = ("<html><head><title>t</title></head><body>" +
            "<p>x y z</p>" * 100 + "</body></html>").encode()
    outs = {extract_text(html) for _ in range(5)}
    assert len(outs) == 1


def test_extract_links():
    html = b'<a href="https://a/1">one</a> text <a href="https://a/2"><b>two</b> words</a>'
    assert extract_links(html) == [("https://a/1", "one"),
                                   ("https://a/2", "two words")]
    assert extract_links(None) == []


def test_extraction_deterministic_across_workers():
    """input_hint invariant: extract_text(html) is byte-identical no matter
    which worker process computes it."""
    import ray

    from lk_data_test_ray.functions.extract import extract_text

    html = ("<html><head><title>T&amp;T</title><style>.x{}</style></head>"
            "<body><p>a  b c</p><script>s()</script>"
            "<!-- c --><ul><li>x</li></ul></body></html>").encode()

    @ray.remote
    def remote_extract(h):
        from lk_data_test_ray.functions.extract import extract_text as ex

        return ex(h)

    local = extract_text(html)
    remote = ray.get([remote_extract.remote(html) for _ in range(4)])
    assert all(r == local for r in remote)


def test_extract_fuzz_hypothesis():
    """Pure-function properties on arbitrary bytes: never raises, None-safe,
    idempotent whitespace collapse, deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lk_data_test_ray.functions.extract import extract_links, extract_text

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def check(data):
        out = extract_text(data)
        assert out == extract_text(data)  # deterministic
        assert isinstance(out, str)
        # collapsed + trimmed under v3's ASCII-whitespace semantics
        assert "  " not in out and out == out.strip(" \t\r\n\v\f")
        extract_links(data)  # never raises
        # zero-copy memoryview input must equal the bytes path
        from lk_data_test_ray.functions.extract import extract_text_bytes
        assert extract_text_bytes(memoryview(data)) == out

    check()


def test_hashing_fuzz_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lk_data_test_ray.functions.hashing import (minhash_signature,
                                                    rolling_fingerprint,
                                                    simhash64, stable_hash64)

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=256))
    def check(t):
        assert stable_hash64(t) == stable_hash64(t)
        assert rolling_fingerprint(t) == rolling_fingerprint(t)
        toks = t.split()
        assert simhash64(toks) == simhash64(toks)
        sig = minhash_signature(toks, 16)
        assert (sig == minhash_signature(toks, 16)).all()
        assert len(sig) == 16

    check()


def test_word_ngrams_batch_matches_naive():
    """Fuzz the shared n-gram kernel against a naive Python reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from lk_data_test_ray.functions.text import word_ngrams_batch

    word = st.text(alphabet="abcxyz", min_size=1, max_size=4)
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(doc, st.none()), min_size=0, max_size=8),
           st.integers(min_value=1, max_value=5))
    def check(docs, k):
        grams, gcnt, grow = word_ngrams_batch(pa.array(docs, pa.string()), k)
        want = []
        for i, d in enumerate(docs):
            toks = (d or "").split(" ") if d else []
            # split_pattern_regex("") yields [""] like str.split(" ") does
            if d == "":
                toks = [""]
            for j in range(max(len(toks) - k + 1, 0)):
                want.append((i, " ".join(toks[j:j + k])))
        got = list(zip(grow.tolist(), grams.to_pylist()))
        assert got == want, (docs, k, got, want)
        assert [c for c in gcnt] == [
            max((len((d or "").split(" ")) if d else (1 if d == "" else 0))
                - k + 1, 0) for d in docs]

    check()


def test_redact_kernels_golden():
    """Email/IP paths don't occur in the pages fixture — cover them here."""
    import pyarrow as pa

    from lk_data_test_ray.functions.redact import redact

    col = pa.chunked_array([pa.array([
        "contact bob@example.com or visit https://a.b/c?d=1 now",
        "server at 10.0.0.1 and 192.168.1.255 end",
        None,
        "no pii here",
        "http://x.y/z mailto bob.smith+tag@mail.example.org",
    ])])
    out, counts = redact(col)
    assert out.to_pylist() == [
        "contact <EMAIL> or visit <URL> now",
        "server at <IP> and <IP> end",
        None,
        "no pii here",
        "<URL> mailto <EMAIL>",
    ]
    assert counts["url"].to_pylist() == [1, 0, None, 0, 1]
    assert counts["email"].to_pylist() == [1, 0, None, 0, 1]
    assert counts["ipv4"].to_pylist() == [0, 2, None, 0, 0]


def test_levenshtein_matrix_vs_duckdb():
    """Fuzz the vectorized pair-grid DP against DuckDB's levenshtein."""
    import duckdb
    import numpy as np

    from lk_data_test_ray.functions.strings import levenshtein_matrix

    rng = np.random.default_rng(7)
    alphabet = list("abcdeXYZ #019")
    def rand_name():
        n = int(rng.integers(0, 12))
        return "".join(rng.choice(alphabet, size=n))

    a = [rand_name() for _ in range(23)] + ["", "kitten"]
    b = [rand_name() for _ in range(31)] + ["", "sitting"]
    got = levenshtein_matrix(a, b)
    con = duckdb.connect()
    for i, s in enumerate(a):
        for j, t in enumerate(b):
            want = con.execute(
                "SELECT levenshtein(?, ?)", [s, t]).fetchone()[0]
            assert got[i, j] == want, (s, t, got[i, j], want)


def test_rolling_fingerprints_batch_equals_scalar():
    """Batch winnowing signer is bitwise-equal to the scalar, including
    empty/short/unicode rows, nulls, sliced arrays and large_string."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lk_data_test_ray.functions.hashing import (
        rolling_fingerprint, rolling_fingerprints_batch)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=20))
    def check(texts):
        want = np.array([rolling_fingerprint(t or "") for t in texts],
                        dtype=np.uint64)
        for typ in (pa.string(), pa.large_string()):
            arr = pa.array(texts, typ)
            assert np.array_equal(rolling_fingerprints_batch(arr), want)
        if len(texts) > 2:
            sl = pa.array(texts, pa.string()).slice(1, len(texts) - 2)
            assert np.array_equal(rolling_fingerprints_batch(sl), want[1:-1])

    check()
