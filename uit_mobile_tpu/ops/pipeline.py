"""Fully-fused inference pipeline: mel kernel -> tokens -> encoder kernel.

`fused_forward` is the fastest eval path for supported configs (the
published uit_* family, 1-s windows or long clips via window folding);
`make_forward_fn` picks the best available implementation and is what the
serving/bench layers use.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import models
from ..models import uit as uit_model
from .pallas_mel import pallas_log_mel
from . import pallas_encoder


def fused_forward(cfg, params, state, wav, *, clips_per_block: int = 32,
                  interpret: Optional[bool] = None) -> jax.Array:
    """(B, T) waveform -> (B, outputdim) probs via both Pallas kernels."""
    assert pallas_encoder.supports(cfg), "config not covered by fused encoder"
    mel = pallas_log_mel(wav, cfg.frontend, interpret=interpret)
    x = uit_model.apply_init_bn(cfg, params, state, mel)
    T = x.shape[-1]
    n_crops = 1
    if T > cfg.target_length:
        x, n_crops = uit_model.chunk_long_mel(cfg, x)
    tokens = uit_model.patch_embed(cfg, params["patch_embed"], x)
    tg = tokens.shape[2]
    tokens = tokens + params["time_pos_embed"][None, None, :tg, :]
    tokens = tokens + params["freq_pos_embed"][None, :, None, :]
    B = tokens.shape[0]
    tokens = tokens.reshape(B, -1, cfg.embed_dim)
    probs = pallas_encoder.encode_tokens_fused(
        cfg, params, tokens, clips_per_block=clips_per_block, interpret=interpret
    )
    if n_crops > 1:
        probs = probs.reshape(-1, n_crops, cfg.outputdim)
        probs = probs.mean(axis=1) if cfg.eval_avg == "mean" else probs.max(axis=1)
    return probs


def make_forward_fn(cfg, params, state, use_pallas: Optional[bool] = None):
    """Best-available eval forward: fused kernels on TPU for supported
    configs, XLA path otherwise. Returns fn(wav)->probs (not yet jitted)."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas and isinstance(cfg, models.UITConfig) and pallas_encoder.supports(cfg):
        return lambda wav: fused_forward(cfg, params, state, wav)
    from .pallas_mel import make_frontend_fn

    frontend = make_frontend_fn(getattr(cfg, "frontend", None), use_pallas=use_pallas)
    return lambda wav: models.apply(cfg, params, state, wav, frontend_fn=frontend)
