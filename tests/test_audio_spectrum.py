"""Batched-FFT spectral features: peak find, ragged lengths, skips."""
import numpy as np
import pyarrow as pa

from lk_data_test_ray.pipelines.multimodal import (spectrum_feature_table,
                                                   wav_encode)


def _tone(n, sr, k, amp, k2=None):
    i = np.arange(n, dtype=np.float64)
    s = amp * np.sin(2 * np.pi * k * i / n)
    if k2 is not None:
        s = s + (amp / 4) * np.sin(2 * np.pi * k2 * i / n)
    return wav_encode(np.round(s).astype(np.int16), sr)


def test_peak_and_amplitude_with_distractor():
    payloads = [_tone(800, 8000, 42, 6250, k2=97),
                _tone(800, 8000, 350, 7990, k2=5)]
    t = spectrum_feature_table(pa.table({
        "url": pa.array(["a", "b"]),
        "html": pa.array(payloads, pa.binary())}))
    assert t["dom_freq_hz"].to_pylist() == [420, 3500]
    assert t["amp10"].to_pylist() == [6250, 7990]


def test_ragged_lengths_grouped_batch_fft():
    # two length groups in one batch → two stacked FFT passes
    payloads = [_tone(800, 8000, 10, 5000),
                _tone(400, 8000, 25, 4000),
                _tone(800, 8000, 20, 3000),
                _tone(400, 8000, 50, 2000)]
    t = spectrum_feature_table(pa.table({
        "url": pa.array(["a", "b", "c", "d"]),
        "html": pa.array(payloads, pa.binary())}))
    got = dict(zip(t["url"].to_pylist(), t["dom_freq_hz"].to_pylist()))
    # 400-sample windows have 20 Hz bins
    assert got == {"a": 100, "b": 500, "c": 200, "d": 1000}


def test_corrupt_and_non_riff_skipped_per_row():
    good = _tone(800, 8000, 30, 5000)
    t = spectrum_feature_table(pa.table({
        "url": pa.array(["x", "y", "z", "w"]),
        "html": pa.array([b"<html>not audio</html>", good,
                          b"RIFFxxxxWAVEtrunc", None], pa.binary())}))
    assert t["url"].to_pylist() == ["y"]
    assert t["dom_freq_hz"].to_pylist() == [300]


def test_dc_offset_not_reported_as_tone():
    i = np.arange(800, dtype=np.float64)
    s = 900 + 500 * np.sin(2 * np.pi * 60 * i / 800)  # big DC + small tone
    p = wav_encode(np.round(s).astype(np.int16), 8000)
    t = spectrum_feature_table(pa.table({
        "url": pa.array(["d"]), "html": pa.array([p], pa.binary())}))
    assert t["dom_freq_hz"].to_pylist() == [600]
