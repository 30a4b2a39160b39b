"""Pure-JAX log-mel frontend with exact torchaudio-0.13 numerics.

This is the *reference* implementation of the DSP stage that the reference
repo builds from ``torchaudio.transforms.MelSpectrogram`` +
``AmplitudeToDB(top_db=120)`` (see reference ``models/uit.py:298-308``).
The fused Pallas production kernel in ``uit_mobile_tpu/ops/pallas_mel.py``
must match this module bit-tightly (<=1e-4 dB); this module in turn matches
torchaudio semantics:

- STFT: ``center=True`` with reflect padding of ``n_fft//2``; periodic Hann
  window of ``win_length``; ``power=2.0``; one-sided (``n_fft//2+1`` bins);
  no normalization.
- Mel filterbank: HTK scale (``mel = 2595*log10(1+f/700)``), ``norm=None``,
  triangular filters over ``n_freqs`` linearly spaced bins in
  ``[0, sample_rate/2]``.
- AmplitudeToDB (power): ``10*log10(clamp(p, 1e-10))`` then clamped from
  below at ``max - top_db``. torchaudio computes the max over dims
  ``(-3,-2,-1)`` after packing, which for a 3-D ``(B, F, T)`` batch couples
  the whole batch through a single global max (reference quirk we replicate
  under ``top_db_mode='torch'``); ``'per_sample'`` gives the saner
  per-clip max for production use.

Everything here is jit-compatible with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Log-mel frontend hyperparameters (defaults = reference uit.py:287-307)."""

    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 512
    hop_length: int = 160
    n_mels: int = 64
    f_min: float = 0.0
    f_max: float = 8000.0
    center: bool = True
    top_db: float = 120.0
    # 'torch'      : replicate torchaudio's batch-global max for 3-D inputs
    # 'per_sample' : clamp each clip against its own max
    top_db_mode: str = "torch"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        if self.center:
            return 1 + num_samples // self.hop_length
        return 1 + (num_samples - self.n_fft) // self.hop_length


def hann_window_periodic(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*k / N), k=0..N-1."""
    k = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / win_length)
    return w.astype(dtype)


def padded_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann window center-padded to n_fft (torch.stft semantics for
    win_length < n_fft: pad (n_fft - win)//2 zeros on each side)."""
    assert win_length <= n_fft, (win_length, n_fft)
    w = hann_window_periodic(win_length, dtype)
    if win_length == n_fft:
        return w
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=dtype)
    out[left:left + win_length] = w
    return out


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_cached(n_freqs, n_mels, sample_rate, f_min, f_max):
    # torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk')
    # computed in float32 to match torchaudio's default dtype end to end.
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs).astype(np.float32)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts).astype(np.float32)

    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)                          # (n_freqs, n_mels)


def mel_filterbank(config: FrontendConfig) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank, norm=None."""
    return _mel_filterbank_cached(
        config.n_freqs, config.n_mels, config.sample_rate, config.f_min, config.f_max
    )


def frame_signal(wav: jax.Array, config: FrontendConfig) -> jax.Array:
    """(..., T) waveform -> (..., n_frames, n_fft) frames.

    Reflect-pads by n_fft//2 on both sides when ``center`` (torch.stft
    semantics), then extracts hop-strided frames with a static gather.
    """
    n_fft, hop = config.n_fft, config.hop_length
    if config.center:
        pad = n_fft // 2
        if wav.shape[-1] <= pad:
            raise ValueError(
                f"waveform of {wav.shape[-1]} samples is too short for "
                f"reflect padding of {pad}; need > {pad} samples"
            )
        wav = jnp.concatenate(
            [wav[..., 1 : pad + 1][..., ::-1], wav, wav[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
    num_samples = wav.shape[-1]
    n_frames = (num_samples - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return wav[..., idx]


def spectrogram(wav: jax.Array, config: FrontendConfig) -> jax.Array:
    """Power spectrogram, (..., T) -> (..., n_freqs, n_frames). power=2.0."""
    frames = frame_signal(wav, config)
    window = jnp.asarray(padded_window(config.win_length, config.n_fft))
    spec = jnp.fft.rfft(frames * window, n=config.n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.swapaxes(power, -1, -2)


def amplitude_to_db(power: jax.Array, config: FrontendConfig) -> jax.Array:
    """Power -> dB with top_db floor, matching torchaudio AmplitudeToDB."""
    x_db = 10.0 * jnp.log10(jnp.clip(power, min=1e-10))
    if config.top_db is not None:
        if config.top_db_mode == "torch":
            # torchaudio packs (B, F, T) as (1, B, F, T) and maxes over
            # (-3,-2,-1): the clamp reference is a single global max over
            # the whole batch. 4-D (B, C, F, T) inputs reduce the SAME
            # last three dims — per-sample, matching torchaudio exactly.
            if power.ndim <= 3:
                ref = jnp.max(x_db)
            else:
                ref = jnp.max(x_db, axis=(-3, -2, -1), keepdims=True)
        elif config.top_db_mode == "per_sample":
            red = tuple(range(power.ndim))[-2:]
            ref = jnp.max(x_db, axis=red, keepdims=True)
        else:
            raise ValueError(f"unknown top_db_mode {config.top_db_mode!r}")
        x_db = jnp.maximum(x_db, ref - config.top_db)
    return x_db


def quantize_pcm16(wav) -> np.ndarray:
    """Host-side float -> raw int16 PCM, THE framework-wide quantizer.

    Rounds to nearest (0.5 LSB worst case); exact — bit-for-bit invertible
    by normalize_pcm16 — whenever the floats came from int16 PCM (any real
    wav file), because x*32768 is then already integral. Every site that
    quantizes must use this helper: the int16 path's bitwise-parity
    guarantee holds only if all sites agree on one formula."""
    if np.asarray(wav).dtype == np.int16:
        return np.asarray(wav)
    return np.clip(np.rint(np.asarray(wav, np.float32) * 32768.0),
                   -32768, 32767).astype(np.int16)


def normalize_pcm16(wav) -> np.ndarray:
    """Host-side raw int16 PCM -> normalized float32 (exact: /2^15)."""
    w = np.asarray(wav)
    if w.dtype == np.int16:
        return w.astype(np.float32) * (1.0 / 32768.0)
    return np.asarray(w, np.float32)


def log_mel_spectrogram(wav: jax.Array, config: FrontendConfig) -> jax.Array:
    """(..., T) waveform -> (..., n_mels, n_frames) log-mel in dB.

    int16 PCM is accepted and normalized by 1/32768 (exact: a power-of-two
    exponent shift), matching the HDF5 datasets' on-host convention and the
    Pallas kernel's int16 fast path."""
    if wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
    power = spectrogram(wav, config)                       # (..., F, TT)
    fb = jnp.asarray(mel_filterbank(config))               # (F, n_mels)
    mel = jnp.swapaxes(jnp.swapaxes(power, -1, -2) @ fb, -1, -2)
    return amplitude_to_db(mel, config)
