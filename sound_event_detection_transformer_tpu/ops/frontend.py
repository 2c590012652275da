"""Waveform -> log-mel spectrogram frontend, TPU-native.

Numerically mirrors the reference's librosa pipeline
(/root/reference/data_utils/SedData.py:195-217): Hamming window, centered
reflect-padded STFT, *amplitude* (not power) mel projection with a slaney-scale
unnormalized filterbank (``htk=False, norm=None``), and
``librosa.amplitude_to_db`` (ref=1, amin=1e-5, top_db=80).

TPU-first design: instead of an FFT, the STFT is expressed as
framing (a strided gather) followed by a single [T, n_fft] x [n_fft, 2*n_bins]
matmul against a precomputed real-DFT basis — this targets the MXU directly,
fuses with the downstream mel matmul, and avoids XLA's comparatively slow
small-batch FFT path.  ``jnp.fft.rfft`` remains available as a fallback
(``use_matmul_dft=False``); both are tested to agree.

Everything is pure jnp: jit-able, vmap-able over a batch of waveforms, and
differentiable, so the frontend can be fused into the train step (the
BASELINE.json north-star).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hamming_window(n: int) -> np.ndarray:
    """Symmetric Hamming window, matching ``np.hamming`` (SedData.py:196)."""
    return np.hamming(n).astype(np.float32)


def hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney-scale (htk=False) Hz->mel, as used by librosa."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    """Slaney-scale mel->Hz inverse."""
    mels = np.asarray(mels, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Triangular slaney-scale mel filterbank with ``norm=None``.

    Returns [n_mels, n_fft // 2 + 1] float32, matching
    ``librosa.filters.mel(sr, n_fft, n_mels, htk=False, norm=None)``.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(np.array(fmin)), hz_to_mel(np.array(fmax)), n_mels + 2)
    mel_f = mel_to_hz(mel_pts)  # [n_mels + 2]
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]  # [n_mels+2, n_bins]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    return weights.astype(np.float32)


def dft_basis(n_fft: int, window: np.ndarray) -> np.ndarray:
    """Windowed real-DFT basis: [n_fft, 2 * n_bins] (cos block then -sin block).

    ``frames @ basis`` gives [real | imag] of the windowed rFFT — one MXU
    matmul replaces the FFT.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    cos = np.cos(angle) * window[:, None]
    sin = np.sin(angle) * window[:, None]
    return np.concatenate([cos, sin], axis=1).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered reflect-pad + frame: [num_samples] -> [n_frames, n_fft].

    Matches librosa's ``center=True, pad_mode='reflect'`` (SedData.py:203-204).
    """
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return y[idx]


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: np.ndarray,
    use_matmul_dft: bool = True,
) -> jnp.ndarray:
    """|STFT| via matmul-DFT (MXU path) or rFFT: [n_frames, n_bins]."""
    frames = frame_signal(y, n_fft, hop)
    if use_matmul_dft:
        basis = jnp.asarray(dft_basis(n_fft, window))
        ri = jnp.dot(frames, basis, preferred_element_type=jnp.float32)
        n_bins = n_fft // 2 + 1
        re, im = ri[:, :n_bins], ri[:, n_bins:]
        return jnp.sqrt(re * re + im * im + 1e-30)
    else:
        spec = jnp.fft.rfft(frames * jnp.asarray(window)[None, :], n=n_fft, axis=-1)
        return jnp.abs(spec)


def amplitude_to_db(
    s: jnp.ndarray, amin: float = 1e-5, top_db: Optional[float] = 80.0
) -> jnp.ndarray:
    """librosa.amplitude_to_db semantics (ref=1.0): 20*log10(max(amin, S)),
    then clip below ``max - top_db`` (SedData.py:212)."""
    log_spec = 20.0 * jnp.log10(jnp.maximum(amin, s))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


@partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "n_window", "hop", "n_mels", "compute_log", "use_matmul_dft"),
)
def waveform_to_logmel(
    y: jnp.ndarray,
    *,
    sr: int,
    n_fft: int,
    n_window: int,
    hop: int,
    n_mels: int,
    compute_log: bool = True,
    use_matmul_dft: bool = True,
) -> jnp.ndarray:
    """Full frontend for one waveform: [num_samples] -> [n_frames, n_mels].

    Equivalent to ``SedData.load_and_compute_mel_spec`` (SedData.py:195-217);
    the transpose to time-major is included.
    """
    window = hamming_window(n_window)
    if n_window < n_fft:
        # center-pad window to n_fft (librosa behavior)
        lpad = (n_fft - n_window) // 2
        window = np.pad(window, (lpad, n_fft - n_window - lpad))
    mag = stft_magnitude(y, n_fft, hop, window, use_matmul_dft)  # [T, n_bins]
    mel_w = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))  # [n_mels, n_bins]
    mel = jnp.dot(mag, mel_w.T, preferred_element_type=jnp.float32)  # [T, n_mels]
    if compute_log:
        mel = amplitude_to_db(mel)
    return mel


def batch_waveform_to_logmel(ys: jnp.ndarray, **kw) -> jnp.ndarray:
    """Vmapped frontend over a batch [B, num_samples] -> [B, T, n_mels]."""
    return jax.vmap(lambda y: waveform_to_logmel(y, **kw))(ys)


def make_frontend_fn(
    sr: int,
    n_fft: int,
    n_window: int,
    hop: int,
    n_mels: int,
    max_frames: int,
    scaler_mean: Optional[np.ndarray] = None,
    scaler_std: Optional[np.ndarray] = None,
    compute_log: bool = True,
):
    """Build the fused in-graph frontend: raw waveforms [B, num_samples] ->
    normalized model input [B, max_frames, n_mels, 1].

    This is the BASELINE.json north-star path: featurization compiles into the
    same XLA program as the model, so the host pipeline ships raw audio and
    the MXU does the STFT.  Numerics match the offline .npy cache
    (``data/features.logmel_numpy``) + Scaler.normalize.
    """
    mean = None if scaler_mean is None else jnp.asarray(scaler_mean, jnp.float32)
    std = None if scaler_std is None else jnp.asarray(scaler_std, jnp.float32)

    def fn(waveforms: jnp.ndarray) -> jnp.ndarray:
        if waveforms.ndim == 3:  # collated wav batches carry [B, N, 1]
            waveforms = waveforms[..., 0]
        mel = batch_waveform_to_logmel(
            waveforms, sr=sr, n_fft=n_fft, n_window=n_window, hop=hop,
            n_mels=n_mels, compute_log=compute_log,
        )  # [B, T, n_mels]
        t = mel.shape[1]
        if t < max_frames:
            mel = jnp.pad(mel, ((0, 0), (0, max_frames - t), (0, 0)))
        else:
            mel = mel[:, :max_frames, :]
        if mean is not None:
            mel = (mel - mean) / std
        return mel[..., None]

    return fn
