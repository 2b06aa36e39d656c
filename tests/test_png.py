"""REAL PNG codec (stdlib zlib + numpy): roundtrip and spec-conformance.

png_decode is the real decode path for the most common web image format —
chunk walk, IDAT inflate, all five scanline filters. The encoder exists to
render deterministic fixtures (and cycles filter types so decoding exercises
every unfilter branch, not just None).
"""

import numpy as np
import pytest

from lk_data_test_ray.pipelines import multimodal as mm


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filters", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_all_colortypes_and_filters(ch, filters):
    img = _rng(ch * 100 + (0 if filters == "cycle" else filters)) \
        .integers(0, 256, size=(13, 7, ch), dtype=np.uint8)
    out = mm.png_decode(mm.png_encode(img, filters=filters))
    assert out.shape == (13, 7, ch)
    assert np.array_equal(out, img)


def test_roundtrip_fuzz():
    rng = _rng(7)
    for _ in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ch = int(rng.choice([1, 2, 3, 4]))
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        assert np.array_equal(mm.png_decode(mm.png_encode(img)), img)


def test_2d_input_and_magic_sniff():
    img = _rng(1).integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload = mm.png_encode(img)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert mm.sniff_kind([payload[:8]]) == ["image/png"]
    out = mm.png_decode(payload)
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_multi_idat_chunks():
    """Decoders must concatenate split IDAT streams (encoders may flush)."""
    import struct
    import zlib

    img = _rng(3).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    raw = np.concatenate(
        [np.concatenate([[0], img[y].reshape(-1)]).astype(np.uint8)
         for y in range(6)]).tobytes()
    comp = zlib.compress(raw)
    half = len(comp) // 2
    ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", comp[:half])
               + mm._png_chunk(b"IDAT", comp[half:])
               + mm._png_chunk(b"IEND", b""))
    assert np.array_equal(mm.png_decode(payload), img)


def test_unsupported_rejected():
    img = _rng(0).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(mm.png_encode(img))
    with pytest.raises(ValueError):
        mm.png_decode(b"nota png")
    # corrupt bit depth (IHDR data starts at offset 8+4+4; depth at +8)
    payload[8 + 8 + 8] = 16
    with pytest.raises(ValueError):
        mm.png_decode(bytes(payload))


def test_decode_stage_handles_png():
    """DecodeStage(fake=False) REALLY decodes PNG payloads now (registry)."""
    import pyarrow as pa

    img = _rng(9).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    batch = pa.table({
        "url": pa.array(["png1", "ppm1", "skip1"], pa.string()),
        "html": pa.array([mm.png_encode(img),
                          mm.ppm_encode(img),
                          b"\xff\xd8\xffjpeg-ish"], pa.binary()),
    })
    out = mm.DecodeStage(fake=False)(batch)
    got = dict(zip(out["url"].to_pylist(),
                   zip(out["kind"].to_pylist(), out["width"].to_pylist(),
                       out["height"].to_pylist(),
                       out["n_channels"].to_pylist())))
    assert got["png1"] == ("image/png", 16, 16, 3)
    assert got["ppm1"] == ("image/ppm", 16, 16, 3)
    assert "skip1" not in got  # jpeg: no codec in this container
