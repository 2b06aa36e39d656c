

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
