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
