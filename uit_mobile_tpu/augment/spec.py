"""Spectrogram augmentations (JAX equivalents of torchaudio masking).

Reference parses TimeMasking/FrequencyMasking configs (utils.py:267-283,
train_uit_xs.yaml:29-39) applied on the dB-scale mel inside model.forward
(uit.py:458-459). torchaudio semantics (mask_along_axis_iid): draw
value ~ U[0, param) and min_value ~ U[0, length - value), then FLOOR
both — the mask covers integer bins [floor(min_value),
floor(min_value) + floor(value)), so widths are whole bins and
P(no mask) = 1/param. Masked bins set to 0.0, iid per sample when
``iid_masks``. Implemented as static-shape `where` masks.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def _axis_mask(rng, batch, length, mask_param, iid):
    n = batch if iid else 1
    r_w, r_s = jax.random.split(rng)
    # torchaudio floors BOTH continuous draws (.long()): integer mask
    # boundaries, integer widths in [0, param) — fractional boundaries
    # would shift every mask by up to one bin and change the masked-bin
    # distribution (including P(no mask) = 1/param)
    value = jax.random.uniform(r_w, (n,), minval=0.0,
                               maxval=float(mask_param))
    min_value = jax.random.uniform(r_s, (n,)) * (length - value)
    start = jnp.floor(min_value)
    end = start + jnp.floor(value)
    pos = jnp.arange(length)[None, :]
    mask = (pos >= start[:, None]) & (pos < end[:, None])
    return mask  # (n, length) True where masked


def time_masking(rng, spec, time_mask_param=20, iid_masks=True,
                 mask_value=0.0, layout="bft"):
    """spec: (B, F, T) for 'bft' (reference orientation) or (T, F, B) for
    'tfb' (the transpose-free training layout). The mask DRAWS are layout-
    independent (same rng stream), only the broadcast differs — the tfb
    result is bitwise the transposed bft result (tests/test_tfb_train.py)."""
    if layout == "tfb":
        T, F, B = spec.shape
        mask = _axis_mask(rng, B, T, time_mask_param, iid_masks)  # (B|1, T)
        return jnp.where(mask.T[:, None, :], mask_value, spec)
    B, F, T = spec.shape
    mask = _axis_mask(rng, B, T, time_mask_param, iid_masks)  # (B|1, T)
    return jnp.where(mask[:, None, :], mask_value, spec)


def frequency_masking(rng, spec, freq_mask_param=8, iid_masks=True,
                      mask_value=0.0, layout="bft"):
    if layout == "tfb":
        T, F, B = spec.shape
        mask = _axis_mask(rng, B, F, freq_mask_param, iid_masks)  # (B|1, F)
        return jnp.where(mask.T[None, :, :], mask_value, spec)
    B, F, T = spec.shape
    mask = _axis_mask(rng, B, F, freq_mask_param, iid_masks)  # (B|1, F)
    return jnp.where(mask[:, :, None], mask_value, spec)


SPEC_TRANSFORMS = {
    "TimeMasking": time_masking,
    "FrequencyMasking": frequency_masking,
}


def parse_spectransforms(transforms, layout: str = "bft") -> Callable:
    """List [{name: kwargs}] or dict {name: kwargs} -> fn(rng, spec).

    ``layout`` must match the mel orientation the model trains in ('bft'
    reference default, 'tfb' transpose-free) — the built callable carries
    it as ``apply.layout`` so models.uit.forward can refuse a mismatched
    pairing instead of silently masking the wrong axes."""
    if layout not in ("bft", "tfb"):
        raise ValueError(f"spec transforms support 'bft'/'tfb', got {layout!r}")
    items = []
    if isinstance(transforms, dict):
        items = list(transforms.items())
    elif isinstance(transforms, (list, tuple)):
        for entry in transforms:
            items.extend(entry.items())
    elif transforms is None:
        items = []
    else:
        raise ValueError(f"bad spectransforms {transforms!r}")
    fns = [functools.partial(SPEC_TRANSFORMS[name], layout=layout, **(kw or {}))
           for name, kw in items]

    def apply(rng, spec):
        for fn in fns:
            rng, r = jax.random.split(rng)
            spec = fn(r, spec)
        return spec

    apply.layout = layout
    return apply if fns else None
