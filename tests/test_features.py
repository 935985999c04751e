"""Native feature extraction (data/features.py): wav I/O, numpy fbank
spec, batched jax parity."""

import os
import tempfile

import numpy as np
import pytest

from pychain_tpu.data import (FbankConfig, add_deltas, cmvn, fbank,
                              fbank_batch, mel_banks, mfcc, num_frames,
                              read_wav, write_wav)


CFG = FbankConfig(sample_rate=16000, num_bins=24)


def test_frame_counting():
    assert num_frames(0, CFG) == 0
    assert num_frames(CFG.frame_length - 1, CFG) == 0
    assert num_frames(CFG.frame_length, CFG) == 1
    assert num_frames(CFG.frame_length + CFG.frame_shift, CFG) == 2
    n = 16000
    assert num_frames(n, CFG) == 1 + (n - 400) // 160


def test_mel_banks_partition():
    banks = mel_banks(CFG)
    assert banks.shape == (24, CFG.fft_size // 2 + 1)
    assert banks.min() >= 0.0
    # interior fft bins inside [low, high] are covered by the triangles
    freqs = np.arange(banks.shape[1]) * CFG.sample_rate / CFG.fft_size
    inside = (freqs > 300) & (freqs < 7000)
    assert (banks.sum(axis=0)[inside] > 0).all()


def test_pure_tone_peaks_at_matching_bin():
    """A sine at a filter's center frequency maximizes that filter."""
    cfg = CFG
    banks = mel_banks(cfg)
    freqs = np.arange(banks.shape[1]) * cfg.sample_rate / cfg.fft_size
    target_bin = 10
    f0 = freqs[np.argmax(banks[target_bin])]
    t = np.arange(16000) / cfg.sample_rate
    tone = 0.5 * np.sin(2 * np.pi * f0 * t)
    feats = fbank(tone, cfg)
    assert feats.shape == (num_frames(16000, cfg), cfg.num_bins)
    # the hottest mel bin (averaged over frames) is the matching one
    hot = int(np.argmax(feats.mean(axis=0)))
    assert abs(hot - target_bin) <= 1


def test_int16_and_float_agree():
    rng = np.random.RandomState(0)
    x = (rng.randn(8000) * 0.1).clip(-0.99, 0.99)
    xi = (x * 32768.0).astype(np.int16)
    a = fbank(x.astype(np.float32), CFG)
    b = fbank(xi, CFG)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_jax_batch_int16_matches_spec():
    rng = np.random.RandomState(7)
    x = (rng.randn(2, 6400) * 3000).astype(np.int16)
    batched = np.asarray(fbank_batch(x, CFG))
    for b in range(2):
        np.testing.assert_allclose(batched[b], fbank(x[b], CFG),
                                   rtol=1e-3, atol=1e-3)


def test_jax_batch_matches_numpy():
    rng = np.random.RandomState(1)
    B, N = 3, 6400
    xs = rng.randn(B, N).astype(np.float32) * 0.2
    batched = np.asarray(fbank_batch(xs, CFG))
    for b in range(B):
        solo = fbank(xs[b], CFG)
        np.testing.assert_allclose(batched[b], solo, rtol=1e-3,
                                   atol=1e-3)


def test_wav_roundtrip():
    rng = np.random.RandomState(2)
    x = (rng.randn(5000) * 0.3).clip(-1, 1).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        write_wav(path, x, 16000)
        y, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_rejects_garbage():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav file at all")
        with pytest.raises(ValueError):
            read_wav(path)


def test_short_signal_empty_output():
    assert fbank(np.zeros(10, np.float32), CFG).shape == (0, 24)
    out = fbank_batch(np.zeros((2, 10), np.float32), CFG)
    assert out.shape == (2, 0, 24)


def test_mfcc_dct_orthonormal_and_shape():
    rng = np.random.RandomState(3)
    x = rng.randn(8000).astype(np.float32) * 0.2
    m = mfcc(x, CFG, num_ceps=13)
    assert m.shape == (num_frames(8000, CFG), 13)
    # DCT with num_ceps == num_bins preserves energy (orthonormal)
    full = mfcc(x, CFG, num_ceps=CFG.num_bins)
    fb = fbank(x, CFG)
    np.testing.assert_allclose((full ** 2).sum(axis=1),
                               (fb ** 2).sum(axis=1), rtol=1e-3)
    with pytest.raises(ValueError):
        mfcc(x, CFG, num_ceps=CFG.num_bins + 1)


def test_cmvn():
    rng = np.random.RandomState(4)
    x = rng.randn(50, 10).astype(np.float32) * 3 + 5
    y = cmvn(x)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
    z = cmvn(x, norm_vars=True)
    np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-4)
    # with a length, only real frames define the stats
    x2 = np.concatenate([x, np.full((5, 10), 100, np.float32)])
    y2 = cmvn(x2, length=50)
    np.testing.assert_allclose(y2[:50], y, atol=1e-5)


def test_deltas():
    # a linear ramp has constant first delta and zero second delta
    T, D = 20, 3
    ramp = np.outer(np.arange(T, dtype=np.float32), np.ones(D))
    out = add_deltas(ramp, window=2, order=2)
    assert out.shape == (T, D * 3)
    d1 = out[:, D:2 * D]
    interior = d1[2:-2]
    np.testing.assert_allclose(interior, 1.0, atol=1e-5)
    d2 = out[4:-4, 2 * D:]
    np.testing.assert_allclose(d2, 0.0, atol=1e-5)


def test_config_validation():
    with pytest.raises(ValueError):
        mel_banks(FbankConfig(low_freq=9000.0))  # low above nyquist-400
    with pytest.raises(ValueError):
        fbank(np.zeros((2, 100)), CFG)
    with pytest.raises(ValueError):
        fbank(np.zeros(1000), FbankConfig(window="blackman"))


def test_batched_cmvn_and_deltas_match_numpy():
    import jax
    rng = np.random.RandomState(8)
    from pychain_tpu.data import add_deltas_batch, cmvn_batch
    B, T, D = 3, 20, 5
    x = rng.randn(B, T, D).astype(np.float32) * 2 + 1
    lengths = np.array([20, 14, 9], np.int32)
    out = np.asarray(jax.jit(lambda f: cmvn_batch(f, lengths,
                                                  norm_vars=True))(x))
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(out[b, :n], cmvn(x[b, :n],
                                                    norm_vars=True),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[b, n:], 0.0, atol=1e-6)
    dj = np.asarray(jax.jit(add_deltas_batch)(x))
    for b in range(B):
        np.testing.assert_allclose(dj[b], add_deltas(x[b]), rtol=1e-5,
                                   atol=1e-6)
