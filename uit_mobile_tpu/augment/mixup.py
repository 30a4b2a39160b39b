"""Mixup, matching reference semantics.

The reference draws per-sample Beta(alpha, alpha) lambdas in the trainer
(run.py:176-186), mixes the MEL SPECTROGRAM inside the model against the
batch-flipped spectrogram (uit.py:16-24, applied at uit.py:456-457), and
mixes targets with the same lambdas (utils.py:302-310). Lengths combine by
elementwise max with the flipped batch (utils.py:313-317).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_mixup_lambdas(rng, batch_size: int, alpha: float):
    """Per-sample Beta(alpha, alpha) mixing coefficients."""
    return jax.random.beta(rng, alpha, alpha, (batch_size,))


def mixup_tensor(x: jax.Array, lamb: jax.Array, batch_axis: int = 0) -> jax.Array:
    """mixed = flip(x)*lamb + x*(1-lamb), lamb broadcast from the batch
    axis (axis 0 for the reference 'bft'/wav layouts; -1 for the
    transpose-free 'tfb' mel whose batch lives in lanes)."""
    batch_axis = batch_axis % x.ndim
    shape = [1] * x.ndim
    shape[batch_axis] = -1
    l = lamb.reshape(shape)
    return jnp.flip(x, axis=batch_axis) * l + x * (1.0 - l)


def mixup_targets(y: jax.Array, lamb: jax.Array) -> jax.Array:
    return mixup_tensor(y, lamb)


def mixup_lengths(lengths: jax.Array) -> jax.Array:
    return jnp.maximum(lengths, jnp.flip(lengths, axis=0))
