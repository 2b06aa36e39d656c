

def test_nfc_normalize_composes(ray_session):
    from lk_data_test_ray.pipelines import queries as q

    df = q.m_nfc_normalize("/root/testdata/sf0.001").to_pandas()
    has_a = df["text_nfc"].str.contains("\u00e1", na=False)
    assert has_a.any()
    # composition shortens exactly by the number of combining marks
    assert (df.loc[has_a, "len_nfc"]
            < df.loc[has_a, "len_decomposed"]).all()
    # no decomposed sequence survives in the output
    assert not df["text_nfc"].str.contains("a\u0301", na=False).any()
    # docs without 'a' are untouched
    import unicodedata
    row = df.loc[~has_a].iloc[0] if (~has_a).any() else None
    if row is not None:
        assert row["len_nfc"] == row["len_decomposed"]


def test_duck_exec_survives_interrupted_connection():
    """Ray cancels tasks by raising KeyboardInterrupt inside the worker;
    DuckDB converts one landing mid-query into ``RuntimeError: Query
    interrupted`` on the cached connection (observed as a mid-bench task
    failure on md5_hex_ints). _duck_exec must discard the poisoned
    connection and retry once on a fresh one — and must NOT retry
    non-interrupt errors."""
    import hashlib as hl

    import pytest

    from lk_data_test_ray.functions import hashing as H

    class PoisonedCon:
        def register(self, *a):
            pass

        def unregister(self, *a):
            pass

        def close(self):
            pass

        def execute(self, sql):
            raise RuntimeError("Query interrupted")

    want = [hl.md5(str(i).encode()).hexdigest() for i in range(5)]
    H._MD5_CON = PoisonedCon()
    # first execute raises the interrupt shape -> fresh connection, retry
    assert list(H.md5_hex_ints(range(5))) == want
    assert not isinstance(H._MD5_CON, PoisonedCon)  # cache was replaced
    assert list(H.md5_hex(["a", "b"])) == [
        hl.md5(b"a").hexdigest(), hl.md5(b"b").hexdigest()]

    class BrokenCon(PoisonedCon):
        def execute(self, sql):
            raise RuntimeError("Binder Error: no such column")

    H._MD5_CON = BrokenCon()
    with pytest.raises(RuntimeError, match="Binder"):
        H.md5_hex_ints(range(5))
    H._MD5_CON = None  # leave the module cache clean for other tests
