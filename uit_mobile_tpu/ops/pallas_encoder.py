"""Fused whole-encoder Pallas kernel for the UiT family.

Why: at D=128 with 24 tokens, every XLA op in the 12-block encoder
materializes a ~25 MB activation in HBM (B=2048); the stack is HBM-bound,
not FLOP-bound (~3.6 GB of activation traffic per batch). This kernel runs
the ENTIRE encoder — all blocks, final LayerNorm, mean-pool and the
sigmoid head — on a block of R clips whose activations never leave VMEM.
All layer weights are depth-stacked and stay VMEM-resident across the
grid (constant index maps).

Supported configs: BNeckAttention or full Attention, qkv bias, ReLU/GELU
MLP, pooling='mean', no LayerScale (i.e. the published uit_xs/xxs/xxxs
family); anything else falls back to the XLA path (see `supports`).

Design notes:
- tokens are processed as flat rows (R*N, D): LN/matmuls run at full MXU
  M-extent;
- attention is BANDED: score matmuls run on bands of `band_clips` clips
  (band_clips*N rows, e.g. 192) with an additive block-diagonal mask so
  tokens only attend within their own clip. Banding keeps the masked-pair
  FLOP waste at band_clips x a tiny base (dense across the whole block
  was measurably slower) while every matmul stays MXU-sized;
- mean-pooling is a precomputed (R, R*N) averaging matmul (reshaping
  (R*N, D) -> (R, N, D) in-kernel would relayout since 24 is not a
  sublane multiple);
- the 537-way head is padded to 640 lanes; sigmoid applied in-kernel.

Matmul precision follows XLA's default (bf16 passes with f32
accumulation) — identical numerics class to the XLA encoder path it
replaces; `precision='highest'` is available for bit-chasing.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports(cfg) -> bool:
    """Whether the fused kernel covers this UITConfig (eval mode)."""
    return (
        cfg.pooling == "mean"
        and cfg.init_values is None
        and not cfg.causal
        and cfg.act in ("relu", "gelu")
        and cfg.compute_dtype == "float32"
    )


def _stack_weights(cfg, params):
    """Depth-stack block weights into contiguous arrays (+ head)."""
    D = cfg.embed_dim
    inner = cfg.inner_dim
    hidden = int(D * cfg.mlp_ratio)
    blocks = params["blocks"]

    def st(path):
        return jnp.stack([functools.reduce(lambda d, k: d[k], path, b) for b in blocks])

    w = {
        "norm1_s": st(["norm1", "scale"]), "norm1_b": st(["norm1", "bias"]),
        "qkv_w": st(["attn", "qkv", "kernel"]),                    # (L, D, 3I)
        "proj_w": st(["attn", "proj", "kernel"]),                  # (L, I, D)
        "proj_b": st(["attn", "proj", "bias"]),
        "norm2_s": st(["norm2", "scale"]), "norm2_b": st(["norm2", "bias"]),
        "fc1_w": st(["mlp", "fc1", "kernel"]), "fc1_b": st(["mlp", "fc1", "bias"]),
        "fc2_w": st(["mlp", "fc2", "kernel"]), "fc2_b": st(["mlp", "fc2", "bias"]),
    }
    if "bias" in blocks[0]["attn"]["qkv"]:
        w["qkv_b"] = st(["attn", "qkv", "bias"])
    else:
        w["qkv_b"] = jnp.zeros((cfg.depth, 3 * inner))
    w["norm_s"] = params["norm"]["scale"][None]
    w["norm_b"] = params["norm"]["bias"][None]
    w["head_norm_s"] = params["head_norm"]["scale"][None]
    w["head_norm_b"] = params["head_norm"]["bias"][None]
    out_pad = _round_up(cfg.outputdim, 128)
    head_w = jnp.zeros((D, out_pad)).at[:, : cfg.outputdim].set(params["head"]["kernel"])
    head_b = jnp.full((1, out_pad), -1e30).at[:, : cfg.outputdim].set(params["head"]["bias"])
    w["head_w"] = head_w
    w["head_b"] = head_b  # -inf bias on padding -> sigmoid==0 there
    # TPU kernels want >=2-D operands: vectors broadcast as (1, D)/(L, 1, D)
    return w


_WKEYS = [
    "norm1_s", "norm1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
    "norm2_s", "norm2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    "norm_s", "norm_b", "head_norm_s", "head_norm_b", "head_w", "head_b",
]


def _ln(x, s, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * s + b


def _encoder_kernel(x_ref, mask_ref, pool_ref, *refs, cfg, prec, band_rows):
    wrefs = dict(zip(_WKEYS, refs[:-1]))
    out_ref = refs[-1]
    D = cfg.embed_dim
    inner = cfg.inner_dim
    h = cfg.num_heads
    hd = inner // h
    act = jax.nn.relu if cfg.act == "relu" else (lambda v: jax.nn.gelu(v, approximate=False))

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=prec, preferred_element_type=jnp.float32)

    x = x_ref[:]  # (M, D) flat tokens
    mask = mask_ref[:]  # (band_rows, band_rows) additive block-diag mask
    M = x.shape[0]
    for d in range(cfg.depth):
        y = _ln(x, wrefs["norm1_s"][d:d + 1], wrefs["norm1_b"][d:d + 1], 1e-6)
        qkv = mm(y, wrefs["qkv_w"][d]) + wrefs["qkv_b"][d:d + 1]  # (M, 3I)
        bands = []
        for i in range(M // band_rows):
            rows = slice(i * band_rows, (i + 1) * band_rows)
            head_outs = []
            for head in range(h):
                q = qkv[rows, head * hd:(head + 1) * hd]
                k = qkv[rows, inner + head * hd: inner + (head + 1) * hd]
                v = qkv[rows, 2 * inner + head * hd: 2 * inner + (head + 1) * hd]
                s = jax.lax.dot_general(  # q @ k^T: contract the hd axis
                    q, k, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32,
                ) * cfg.attn_scale + mask
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                head_outs.append(mm(p, v))  # (band_rows, hd)
            bands.append(jnp.concatenate(head_outs, axis=-1))
        a = jnp.concatenate(bands, axis=0)  # (M, I)
        x = x + (mm(a, wrefs["proj_w"][d]) + wrefs["proj_b"][d:d + 1])
        y = _ln(x, wrefs["norm2_s"][d:d + 1], wrefs["norm2_b"][d:d + 1], 1e-6)
        y = act(mm(y, wrefs["fc1_w"][d]) + wrefs["fc1_b"][d:d + 1])
        x = x + (mm(y, wrefs["fc2_w"][d]) + wrefs["fc2_b"][d:d + 1])

    x = _ln(x, wrefs["norm_s"][:], wrefs["norm_b"][:], 1e-6)
    pooled = mm(pool_ref[:], x)  # (R, D) mean over each clip's N tokens
    pooled = _ln(pooled, wrefs["head_norm_s"][:], wrefs["head_norm_b"][:], 1e-5)
    logits = mm(pooled, wrefs["head_w"][:]) + wrefs["head_b"][:]
    out_ref[:] = jax.nn.sigmoid(logits)


def encode_tokens_fused(cfg, params, tokens, *, clips_per_block: int = 32,
                        band_clips: int = 8, precision: str = "default",
                        interpret: Optional[bool] = None) -> jax.Array:
    """(B, N, D) position-encoded tokens -> (B, outputdim) probs.

    Covers forward_features' block stack + final LN + mean pooling + head
    (reference uit.py:393-404) in one kernel launch.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, N, D = tokens.shape
    R = min(clips_per_block, B)
    while B % R:
        R -= 1
    band = min(band_clips, R)
    while R % band:
        band -= 1
    M = R * N
    band_rows = band * N
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    w = _stack_weights(cfg, params)
    out_pad = w["head_w"].shape[1]

    blk = np.arange(band_rows) // N
    mask = np.where(blk[:, None] == blk[None, :], 0.0, -1e30).astype(np.float32)
    pool = np.zeros((R, M), dtype=np.float32)
    for r in range(R):
        pool[r, r * N:(r + 1) * N] = 1.0 / N

    kernel = functools.partial(_encoder_kernel, cfg=cfg, prec=prec,
                               band_rows=band_rows)
    flat = tokens.reshape(B * N, D)

    const = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    probs = pl.pallas_call(
        kernel,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((M, D), lambda b: (b, 0), memory_space=pltpu.VMEM),
            const(mask.shape),
            const(pool.shape),
        ] + [const(tuple(w[k].shape)) for k in _WKEYS],
        out_specs=pl.BlockSpec((R, out_pad), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_pad), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(mask), jnp.asarray(pool), *[w[k] for k in _WKEYS])
    return probs[:, : cfg.outputdim]
