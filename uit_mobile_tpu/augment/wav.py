"""Waveform augmentations (JAX-RNG equivalents of torch_audiomentations).

The reference parses config dicts into torch_audiomentations transforms
(utils.py:254-264) applied per-example inside model.forward when training
(uit.py:453-454). We implement the three transforms its shipped configs use
(train_uit_xs.yaml:40-46) with matching defaults:

- Shift(min_shift=-0.5, max_shift=0.5, fraction units, rollover) — circular
  time shift by a per-sample random fraction;
- Gain(min=-18 dB, max=6 dB) — per-sample random gain;
- PolarityInversion — sign flip.

Each applies per-sample with probability p (default 0.5). All are static-
shape jit-compatible; composition happens in one fused elementwise pass.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def shift(rng, wav, min_shift=-0.5, max_shift=0.5, p=0.5):
    """Per-sample circular shift by a random fraction of the clip length."""
    B, T = wav.shape[0], wav.shape[-1]
    r_apply, r_frac = jax.random.split(rng)
    frac = jax.random.uniform(r_frac, (B,), minval=min_shift, maxval=max_shift)
    n = jnp.round(frac * T).astype(jnp.int32)
    apply = jax.random.bernoulli(r_apply, p, (B,))
    n = jnp.where(apply, n, 0)
    idx = (jnp.arange(T)[None, :] - n[:, None]) % T
    return jnp.take_along_axis(wav, idx, axis=-1)


def gain(rng, wav, min_gain_in_db=-18.0, max_gain_in_db=6.0, p=0.5):
    B = wav.shape[0]
    r_apply, r_db = jax.random.split(rng)
    db = jax.random.uniform(r_db, (B,), minval=min_gain_in_db, maxval=max_gain_in_db)
    g = 10.0 ** (db / 20.0)
    apply = jax.random.bernoulli(r_apply, p, (B,))
    g = jnp.where(apply, g, 1.0)
    return wav * g[:, None]


def polarity_inversion(rng, wav, p=0.5):
    B = wav.shape[0]
    apply = jax.random.bernoulli(rng, p, (B,))
    return wav * jnp.where(apply, -1.0, 1.0)[:, None]


WAV_TRANSFORMS = {
    "Shift": shift,
    "Gain": gain,
    "PolarityInversion": polarity_inversion,
}

# transforms that never move audio along the time axis — the only ones
# admissible for strong-label (SED) training, where per-segment targets
# are rasterized from the ORIGINAL event times (train/sed.py checks this)
TIME_PRESERVING_WAV_TRANSFORMS = frozenset({"Gain", "PolarityInversion"})


def parse_wavtransforms(transforms_dict: dict) -> Callable:
    """Config dict {name: kwargs} -> fn(rng, wav) applying them in order."""
    fns = []
    for name, kwargs in (transforms_dict or {}).items():
        fns.append(functools.partial(WAV_TRANSFORMS[name], **(kwargs or {})))

    def apply(rng, wav):
        for fn in fns:
            rng, r = jax.random.split(rng)
            wav = fn(r, wav)
        return wav

    return apply if fns else None
