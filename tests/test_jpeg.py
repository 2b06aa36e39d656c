"""REAL baseline JPEG codec (ITU-T T.81 sequential DCT, pure numpy):
DC-exact roundtrips, near-lossless general roundtrips, 4:2:0 subsampling,
restart markers, corrupt-payload behavior.

jpeg_decode is general for baseline JPEG — it reads quantization and
Huffman tables from the stream's own DQT/DHT segments, so it decodes any
baseline stream, not just this encoder's. JPEG is lossy by design: only
blockwise-constant (DC-only) fixtures round-trip exactly; everything else
is asserted to a 1-LSB tolerance at quantization 1.
"""

import numpy as np
import pytest

from lk_data_test_ray.pipelines import multimodal as mm


def _rng(seed):
    return np.random.default_rng(seed)


def _blocky(rng, bh, bw, crop=None):
    vals = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    return img if crop is None else img[:crop[0], :crop[1]]


@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (24, 40), (17, 9)])
def test_gray_dc_exact(h, w):
    img = _blocky(_rng(h * 100 + w), (h + 7) // 8, (w + 7) // 8, (h, w))
    out = mm.jpeg_decode(mm.jpeg_encode(img))
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_color_444_dc_exact():
    rng = _rng(1)
    vals = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = mm.jpeg_decode(mm.jpeg_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_color_420_mcu_constant_exact():
    """4:2:0: constant 16x16 MCUs survive the chroma downsample exactly."""
    rng = _rng(2)
    vals = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 16, axis=0), 16, axis=1)
    out = mm.jpeg_decode(mm.jpeg_encode(img, subsample=True))
    assert np.array_equal(out, img)


def test_general_roundtrip_near_lossless():
    """quant=1 on arbitrary content: within 1 LSB (DCT float rounding)."""
    rng = _rng(3)
    for shape in [(32, 32), (19, 27)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = mm.jpeg_decode(mm.jpeg_encode(img))[:, :, 0]
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_restart_markers():
    """DRI/RSTn: decoded pixels must match the no-restart encoding."""
    rng = _rng(4)
    img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    with_rst = mm.jpeg_encode(img, restart_interval=3)
    without = mm.jpeg_encode(img)
    assert b"\xff\xdd" in with_rst and b"\xff\xdd" not in without
    assert np.array_equal(mm.jpeg_decode(with_rst),
                          mm.jpeg_decode(without))


def test_420_restart_consistent():
    rng = _rng(5)
    img = rng.integers(0, 256, size=(33, 18, 3), dtype=np.uint8)
    o1 = mm.jpeg_decode(mm.jpeg_encode(img, subsample=True,
                                       restart_interval=2))
    o2 = mm.jpeg_decode(mm.jpeg_encode(img, subsample=True))
    assert np.array_equal(o1, o2)


def test_quantization_actually_compresses():
    rng = _rng(6)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    fine = mm.jpeg_encode(img, quant=1)
    coarse = mm.jpeg_encode(img, quant=32)
    assert len(coarse) < len(fine)
    out = mm.jpeg_decode(coarse)  # lossy but decodable
    assert out.shape == (64, 64, 1)


def test_unsupported_and_corrupt_rejected():
    with pytest.raises(ValueError):
        mm.jpeg_decode(b"not a jpeg")
    img = _rng(7).integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload = bytearray(mm.jpeg_encode(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        mm.jpeg_decode(bytes(payload))
    # header-only stream (dimension fixtures) has no SOS scan
    with pytest.raises(ValueError):
        mm.jpeg_decode(mm.jpeg_header(16, 16))


def test_decode_stage_handles_jpeg_and_skips_corrupt():
    import pyarrow as pa

    img = _rng(8).integers(0, 256, size=(16, 16), dtype=np.uint8)
    batch = pa.table({
        "url": pa.array(["jpg1", "corrupt1"], pa.string()),
        "html": pa.array([mm.jpeg_encode(img),
                          b"\xff\xd8\xffjunk-after-magic"], pa.binary()),
    })
    out = mm.DecodeStage(fake=False)(batch)
    got = dict(zip(out["url"].to_pylist(),
                   zip(out["kind"].to_pylist(), out["width"].to_pylist(),
                       out["height"].to_pylist(),
                       out["n_channels"].to_pylist())))
    assert got["jpg1"] == ("image/jpeg", 16, 16, 1)
    assert "corrupt1" not in got  # skipped row, not a dead task
