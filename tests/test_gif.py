"""REAL GIF codec (pure-Python GIF89a LZW + numpy): roundtrip, external
vector, and spec-conformance.

gif_decode is the real decode path for the third most common web image
format — header walk, sub-block reassembly, variable-width LSB-first LZW
(code-width growth, KwKwK, 4096-entry table reset), palette map. The encoder
exists to render deterministic fixtures, exactly like png_encode.
"""

import numpy as np
import pytest

from lk_data_test_ray.pipelines import multimodal as mm


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("h,w,npal", [
    (1, 1, 2), (3, 5, 4), (13, 7, 16), (16, 16, 256),
    (64, 64, 256),    # > 4096 px: exercises the table-full LZW reset
    (128, 128, 256),  # multiple resets
])
def test_roundtrip(h, w, npal):
    rng = _rng(h * 1000 + w * 10 + npal)
    idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    out = mm.gif_decode(mm.gif_encode(idx, pal))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, pal[idx])


def test_roundtrip_fuzz():
    rng = _rng(7)
    for _ in range(25):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        npal = int(rng.choice([2, 3, 5, 16, 100, 256]))
        idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        assert np.array_equal(mm.gif_decode(mm.gif_encode(idx, pal)),
                              pal[idx])


def test_constant_image_kwkwk():
    """A constant image is the canonical KwKwK stress (every code is the
    just-added table entry)."""
    idx = np.zeros((50, 50), np.uint8)
    pal = np.array([[7, 8, 9], [1, 2, 3]], np.uint8)
    assert np.array_equal(mm.gif_decode(mm.gif_encode(idx, pal)), pal[idx])


def test_known_external_vector():
    """The canonical 1x1 white GIF — bytes authored by an INDEPENDENT
    encoder, so a decoder that merely mirrors our encoder's conventions
    (bit order, width growth) would fail here."""
    known = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
             b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;")
    img = mm.gif_decode(known)
    assert img.shape == (1, 1, 3)
    assert img.ravel().tolist() == [255, 255, 255]


def test_extension_blocks_skipped():
    """Graphic-control/comment extensions precede the image descriptor in
    most real GIFs; the walker must skip their sub-blocks."""
    idx = _rng(3).integers(0, 4, size=(4, 4), dtype=np.uint8)
    pal = _rng(4).integers(0, 256, size=(4, 3), dtype=np.uint8)
    payload = bytearray(mm.gif_encode(idx, pal))
    at = payload.index(b",")  # image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    comment = b"\x21\xfe\x05hello\x00"
    patched = bytes(payload[:at]) + gce + comment + bytes(payload[at:])
    assert np.array_equal(mm.gif_decode(patched), pal[idx])


def test_magic_sniff_and_registry():
    idx = _rng(5).integers(0, 16, size=(8, 8), dtype=np.uint8)
    pal = _rng(6).integers(0, 256, size=(16, 3), dtype=np.uint8)
    payload = mm.gif_encode(idx, pal)
    assert mm.sniff_kind([payload[:8]]) == ["image/gif"]
    assert "image/gif" in mm.DECODERS


def test_unsupported_rejected():
    with pytest.raises(ValueError):
        mm.gif_decode(b"not a gif")
    idx = np.zeros((2, 2), np.uint8)
    pal = np.zeros((2, 3), np.uint8)
    payload = bytearray(mm.gif_encode(idx, pal))
    at = payload.index(b",")
    payload[at + 9] |= 0x40  # set the interlace flag
    with pytest.raises(ValueError):
        mm.gif_decode(bytes(payload))


def test_decode_stage_handles_gif():
    """DecodeStage(fake=False) REALLY decodes GIF payloads via the
    registry."""
    import pyarrow as pa

    idx = _rng(9).integers(0, 256, size=(16, 16), dtype=np.uint8)
    pal = _rng(10).integers(0, 256, size=(256, 3), dtype=np.uint8)
    img = _rng(11).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    batch = pa.table({
        "url": pa.array(["gif1", "png1", "skip1"], pa.string()),
        "html": pa.array([mm.gif_encode(idx, pal),
                          mm.png_encode(img),
                          b"\xff\xd8\xffjpeg-ish"], pa.binary()),
    })
    out = mm.DecodeStage(fake=False)(batch)
    got = dict(zip(out["url"].to_pylist(),
                   zip(out["kind"].to_pylist(), out["width"].to_pylist(),
                       out["height"].to_pylist(),
                       out["n_channels"].to_pylist())))
    assert got["gif1"] == ("image/gif", 16, 16, 3)
    assert got["png1"] == ("image/png", 16, 16, 3)
    assert "skip1" not in got  # jpeg: no codec in this container


def test_decode_stage_skips_truncated_payloads():
    """Corrupt/truncated payloads of EVERY registered codec skip the row,
    never kill the task — truncation inside the gif/jpeg header walks
    surfaces as IndexError, not ValueError (web-scale skip contract)."""
    import pyarrow as pa

    idx = _rng(12).integers(0, 4, size=(8, 8), dtype=np.uint8)
    pal = _rng(13).integers(0, 256, size=(4, 3), dtype=np.uint8)
    img = _rng(14).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    gif, png = mm.gif_encode(idx, pal), mm.png_encode(img)
    jpg = mm.jpeg_encode(img)
    payloads = (
        [gif[:8], gif[:20], gif[:-4], png[:10], png[:-6],
         jpg[:4], jpg[: len(jpg) // 2], jpg[:-2]]
        + [gif]  # one intact row proves the stage still decodes
    )
    batch = pa.table({
        "url": pa.array([f"p{i}" for i in range(len(payloads))], pa.string()),
        "html": pa.array(payloads, pa.binary()),
    })
    out = mm.DecodeStage(fake=False)(batch)  # must not raise
    got = set(out["url"].to_pylist())
    # p4 (png minus IEND) and p7 (jpeg minus EOI) lose only trailing
    # markers — all pixel data is present, so decoding them is correct.
    assert f"p{len(payloads) - 1}" in got  # intact row decodes
    assert got.isdisjoint({"p0", "p1", "p2", "p3", "p5", "p6"})
