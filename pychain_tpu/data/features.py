"""Native acoustic feature extraction: wav -> log-mel filterbanks.

The reference consumes features Kaldi computed offline
(`compute-fbank-feats`); together with the transcript->graph builder
this module removes the last offline dependency: wav in, LF-MMI
training out.  Two implementations with tested parity:

* :func:`fbank` — numpy, one utterance, the behavioural spec,
* :func:`fbank_batch` — jax, batched and jittable, so feature
  extraction can run ON the TPU as part of the input pipeline (frames
  gather + one rFFT + one (F, M) matmul — MXU-friendly).

The parameters follow Kaldi's conventions (25 ms windows, 10 ms shift,
preemphasis 0.97, the "povey" window, snip_edges frame counting,
mel scale 1127*ln(1+f/700)); this is a faithful same-design
implementation, not a bit-exact clone of Kaldi's binaries.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_bins: int = 40
    low_freq: float = 20.0
    high_freq: float = 0.0        # <= 0: offset from Nyquist
    preemphasis: float = 0.97
    window: str = "povey"         # povey | hann | hamming
    remove_dc: bool = True
    log_floor: float = 1e-10

    @property
    def frame_length(self) -> int:
        return int(round(self.sample_rate * self.frame_length_ms / 1000.0))

    @property
    def frame_shift(self) -> int:
        return int(round(self.sample_rate * self.frame_shift_ms / 1000.0))

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * np.pi / (n - 1)
    t = np.arange(n)
    hann = 0.5 - 0.5 * np.cos(a * t)
    if cfg.window == "hann":
        w = hann
    elif cfg.window == "hamming":
        w = 0.54 - 0.46 * np.cos(a * t)
    elif cfg.window == "povey":
        w = hann ** 0.85
    else:
        raise ValueError(f"unknown window {cfg.window!r}")
    return w.astype(np.float64)


def _mel(f):
    return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """(num_bins, fft_size//2 + 1) triangular mel filterbank matrix."""
    nyquist = cfg.sample_rate / 2.0
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    if not (0 <= cfg.low_freq < high <= nyquist):
        raise ValueError("bad low/high frequency range")
    n_fft_bins = cfg.fft_size // 2 + 1
    fft_freqs = np.arange(n_fft_bins) * (cfg.sample_rate / cfg.fft_size)
    mel_lo, mel_hi = _mel(cfg.low_freq), _mel(high)
    centers = np.linspace(mel_lo, mel_hi, cfg.num_bins + 2)
    m = _mel(fft_freqs)
    banks = np.zeros((cfg.num_bins, n_fft_bins), np.float64)
    for b in range(cfg.num_bins):
        left, center, right = centers[b], centers[b + 1], centers[b + 2]
        up = (m - left) / (center - left)
        down = (right - m) / (right - center)
        banks[b] = np.clip(np.minimum(up, down), 0.0, None)
    return banks


def num_frames(num_samples: int, cfg: FbankConfig) -> int:
    """snip_edges frame count: frames that fit entirely in the signal."""
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def fbank(samples, cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """Log-mel filterbank features, (num_frames, num_bins) float32.

    ``samples``: 1-D float array in [-1, 1] (or int16, scaled down).
    """
    x = np.asarray(samples)
    if x.ndim != 1:
        raise ValueError("one utterance at a time; see fbank_batch")
    if x.dtype == np.int16:
        x = x.astype(np.float64) / 32768.0
    x = x.astype(np.float64)
    T = num_frames(x.shape[0], cfg)
    if T == 0:
        return np.zeros((0, cfg.num_bins), np.float32)
    idx = (np.arange(T)[:, None] * cfg.frame_shift
           + np.arange(cfg.frame_length)[None, :])
    frames = x[idx]                               # (T, L)
    if cfg.remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis > 0:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * pre
    frames = frames * _window(cfg)[None, :]
    spec = np.fft.rfft(frames, n=cfg.fft_size, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2)
    mel = power @ mel_banks(cfg).T                # (T, num_bins)
    return np.log(np.maximum(mel, cfg.log_floor)).astype(np.float32)


def fbank_batch(samples, cfg: FbankConfig = FbankConfig()):
    """Batched, jittable log-mel filterbanks on device.

    ``samples``: (B, N) float32 in [-1, 1] (pad with zeros; compute
    feature lengths with :func:`num_frames` of the true sample counts).
    Returns (B, T, num_bins) float32 with T = num_frames(N).
    """
    import jax.numpy as jnp

    if (hasattr(samples, "dtype")
            and np.dtype(samples.dtype) == np.int16):
        samples = np.asarray(samples).astype(np.float32) / 32768.0
    x = jnp.asarray(samples, jnp.float32)
    if x.ndim != 2:
        raise ValueError("expected (B, N) samples")
    T = num_frames(x.shape[1], cfg)
    if T == 0:
        return jnp.zeros((x.shape[0], 0, cfg.num_bins), jnp.float32)
    idx = (np.arange(T)[:, None] * cfg.frame_shift
           + np.arange(cfg.frame_length)[None, :])
    frames = x[:, idx]                            # (B, T, L)
    if cfg.remove_dc:
        frames = frames - frames.mean(axis=2, keepdims=True)
    if cfg.preemphasis > 0:
        pre = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]],
                              axis=2)
        frames = frames - cfg.preemphasis * pre
    frames = frames * jnp.asarray(_window(cfg), jnp.float32)
    spec = jnp.fft.rfft(frames, n=cfg.fft_size, axis=2)
    power = spec.real ** 2 + spec.imag ** 2
    mel = power @ jnp.asarray(mel_banks(cfg).T, jnp.float32)
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def mfcc(samples, cfg: FbankConfig = FbankConfig(), num_ceps: int = 13):
    """MFCCs: DCT-II (orthonormal) of the log-mel filterbanks,
    keeping the first ``num_ceps`` coefficients."""
    if num_ceps > cfg.num_bins:
        raise ValueError("num_ceps cannot exceed num_bins")
    fb = fbank(samples, cfg).astype(np.float64)
    return _dct_matrix(cfg.num_bins, num_ceps).dot(fb.T).T.astype(
        np.float32)


def _dct_matrix(n: int, k: int) -> np.ndarray:
    """(k, n) orthonormal DCT-II matrix."""
    m = np.cos(np.pi / n * (np.arange(n) + 0.5)[None, :]
               * np.arange(k)[:, None])
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def cmvn(feats, length=None, norm_vars: bool = False):
    """Per-utterance cepstral mean (and optional variance)
    normalization over the real frames.  feats (T, D) numpy.
    Frames beyond ``length`` are zeroed — matching
    :func:`cmvn_batch`'s masked output exactly."""
    x = np.asarray(feats, np.float32)
    n = x.shape[0] if length is None else int(length)
    if n < 1:
        return x
    mean = x[:n].mean(axis=0)
    out = x - mean
    if norm_vars:
        std = x[:n].std(axis=0)
        out = out / np.maximum(std, 1e-8)
    out[n:] = 0.0
    return out


def add_deltas(feats, window: int = 2, order: int = 2):
    """Append delta (and delta-delta, ...) features, Kaldi-style
    regression over ``window`` frames with edge replication.
    feats (T, D) -> (T, D * (order + 1))."""
    x = np.asarray(feats, np.float32)
    T = x.shape[0]
    if T == 0:
        return x.reshape(0, x.shape[1] * (order + 1))
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    outs = [x]
    cur = x
    for _ in range(order):
        pad = np.concatenate([np.repeat(cur[:1], window, axis=0), cur,
                              np.repeat(cur[-1:], window, axis=0)])
        d = np.zeros_like(cur)
        for i in range(1, window + 1):
            d += i * (pad[window + i:window + i + T]
                      - pad[window - i:window - i + T])
        cur = d / denom
        outs.append(cur)
    return np.concatenate(outs, axis=1)


def cmvn_batch(feats, lengths=None, norm_vars: bool = False):
    """Batched, jittable per-utterance CMVN.  feats (B, T, D); with
    ``lengths`` (B,), stats are computed over real frames only and
    padding stays untouched at zero mean contribution."""
    import jax.numpy as jnp

    x = jnp.asarray(feats, jnp.float32)
    B, T, D = x.shape
    if lengths is None:
        n = jnp.full((B, 1, 1), T, jnp.float32)
        mask = jnp.ones((B, T, 1), jnp.float32)
    else:
        lengths = jnp.asarray(lengths)
        mask = (jnp.arange(T)[None, :] < lengths[:, None]
                ).astype(jnp.float32)[:, :, None]
        n = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None, None]
    mean = (x * mask).sum(axis=1, keepdims=True) / n
    out = (x - mean) * mask
    if norm_vars:
        var = (jnp.square(x - mean) * mask).sum(axis=1,
                                                keepdims=True) / n
        out = out / jnp.maximum(jnp.sqrt(var), 1e-8)
    return out


def add_deltas_batch(feats, window: int = 2, order: int = 2):
    """Batched, jittable delta features: (B, T, D) ->
    (B, T, D*(order+1)), same regression + edge replication as
    :func:`add_deltas` (parity-tested)."""
    import jax.numpy as jnp

    x = jnp.asarray(feats, jnp.float32)
    B, T, D = x.shape
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    outs = [x]
    cur = x
    for _ in range(order):
        pad = jnp.concatenate(
            [jnp.repeat(cur[:, :1], window, axis=1), cur,
             jnp.repeat(cur[:, -1:], window, axis=1)], axis=1)
        d = jnp.zeros_like(cur)
        for i in range(1, window + 1):
            d = d + i * (pad[:, window + i:window + i + T]
                         - pad[:, window - i:window - i + T])
        cur = d / denom
        outs.append(cur)
    return jnp.concatenate(outs, axis=2)


# ----------------------------------------------------------------------
# Minimal WAV I/O (PCM16 / float32 mono), no external deps
# ----------------------------------------------------------------------

def read_wav(filename: str):
    """Read a mono RIFF WAV (PCM16 or IEEE float32).  Returns
    (samples float32 in [-1, 1], sample_rate)."""
    with open(filename, "rb") as f:
        riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        fmt = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError("no data chunk")
            tag, sz = struct.unpack("<4sI", hdr)
            if tag == b"fmt ":
                if sz < 16:
                    raise ValueError(f"malformed fmt chunk (size {sz})")
                fmt = struct.unpack("<HHIIHH", f.read(16))
                f.read(sz - 16)
            elif tag == b"data":
                raw = f.read(sz)
                break
            else:
                f.read(sz + (sz & 1))
        if fmt is None:
            raise ValueError("no fmt chunk")
        audio_fmt, channels, rate, _, _, bits = fmt
        if channels != 1:
            raise ValueError("mono only")
        if audio_fmt == 1 and bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif audio_fmt == 3 and bits == 32:
            x = np.frombuffer(raw, "<f4").astype(np.float32)
        else:
            raise ValueError(f"unsupported format {audio_fmt}/{bits}bit")
        return x, rate


def write_wav(filename: str, samples, sample_rate: int) -> None:
    """Write mono PCM16."""
    x = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    # round (not truncate) at the same 1/32768 scale the reader uses
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(
        "<i2").tobytes()
    with open(filename, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE"))
        f.write(struct.pack("<4sI", b"fmt ", 16))
        f.write(struct.pack("<HHIIHH", 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(struct.pack("<4sI", b"data", len(pcm)))
        f.write(pcm)
