"""Functional NN primitives shared by the model family.

Design: models are pure functions over explicit parameter pytrees
(`params` = trainables, `state` = BatchNorm statistics). No module
framework — this keeps jit/vmap/grad/shard_map composition and the
torch->JAX checkpoint converter trivial, and all shapes static for XLA.

Weight layout convention: ``y = x @ kernel + bias`` with ``kernel``
shaped (in, out) — i.e. torch ``Linear.weight.T``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- init helpers

def trunc_normal(rng, shape, std=0.02, dtype=jnp.float32):
    """timm-style truncated normal in [-2std, 2std] (reference uit.py:371)."""
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def linear_init(rng, d_in, d_out, std=0.02, bias=True):
    p = {"kernel": trunc_normal(rng, (d_in, d_out), std=std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def conv2d_torch_default_init(rng, shape):
    """torch Conv2d default (kaiming-uniform a=sqrt(5) => U[-b, b]).

    shape = (kh, kw, c_in, c_out). fan_in = kh*kw*c_in.
    """
    kh, kw, c_in, c_out = shape
    fan_in = kh * kw * c_in
    # kaiming_uniform(a=sqrt(5)): gain=sqrt(1/3), bound=gain*sqrt(3/fan_in)
    bound = 1.0 / math.sqrt(fan_in)
    kr, br = jax.random.split(rng)
    kernel = jax.random.uniform(kr, shape, minval=-bound, maxval=bound)
    bias = jax.random.uniform(br, (c_out,), minval=-bound, maxval=bound)
    return {"kernel": kernel, "bias": bias}


# ------------------------------------------------------------------ primitives

def layer_norm(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def drop_path(rng, x, rate: float, deterministic: bool):
    """Stochastic depth: drop whole residual branches per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


def batch_norm_inference(p, s, x, axis=-1, eps=1e-5):
    """Per-channel affine using running stats; `axis` is the channel axis."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]

    def r(v):
        return v.reshape(shape)

    inv = jax.lax.rsqrt(r(s["var"]) + eps)
    return (x - r(s["mean"])) * inv * r(p["scale"]) + r(p["bias"])


def batch_norm_train(p, s, x, axis=-1, momentum=0.1, eps=1e-5):
    """BatchNorm forward with batch stats; returns (y, new_state).

    Matches torch: running stats updated with *unbiased* batch variance,
    normalization uses biased variance.
    """
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
    mean = jnp.mean(x, axis=reduce_axes)
    var = jnp.var(x, axis=reduce_axes)
    n = x.size // x.shape[axis]
    unbiased = var * n / max(n - 1, 1)
    new_s = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]

    def r(v):
        return v.reshape(shape)

    y = (x - r(mean)) * jax.lax.rsqrt(r(var) + eps) * r(p["scale"]) + r(p["bias"])
    return y, new_s


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
}


def multihead_attention(p, x, num_heads: int, scale: float, inner_dim: int,
                        causal: bool = False, key_mask=None,
                        attn_drop: float = 0.0, proj_drop: float = 0.0,
                        rng=None, deterministic: bool = True):
    """Shared full/bottleneck MHSA.

    Full attention: inner_dim == D. Bottleneck (reference BNeckAttention,
    uit.py:89-122): qkv projects D -> 3*(D/4), attention runs in the D/4
    space, proj maps back D/4 -> D. NOTE the reference's `scale` is
    head_dim**-0.5 computed from the FULL dim (uit.py:99-100), not from the
    bottleneck head dim — callers pass it in explicitly to preserve
    checkpoint parity.
    """
    B, N, _ = x.shape
    h = num_heads
    hd = inner_dim // h
    qkv = linear(p["qkv"], x)  # (B, N, 3*inner)
    # Heads are processed as LANE SLICES of the fused qkv output, not via a
    # (B, N, 3, h, hd) reshape: at this family's geometry (hd=16, N=24) the
    # 5-D reshape forces XLA to materialize a tiny-minor-dim relayout copy
    # per block (~0.16 ms each at B=2048 — profiled), and the per-head
    # slice formulation removes them all: +8% end-to-end on v5e, bitwise
    # identical outputs. h is tiny (2 in every published config), so the
    # Python loop emits a handful of clean batched matmuls.
    causal_mask = np.triu(np.ones((N, N), dtype=bool), k=1) if causal else None
    # Contraction formulation (B is static under jit, so this is a
    # compile-time choice): the per-head batched dot_generals demand
    # {1,2,0}-layout operands while the encoder's fusions emit batch-minor
    # {0,2,1} — XLA inserts a tiny layout copy per head per product per
    # block (~87 copies ~1.4 ms/batch at B=2048, profiled). For small
    # heads at serving batch sizes, an explicit broadcast-multiply-reduce
    # keeps the batch-minor layout end-to-end on the VPU: measured -7.8%
    # device time at B=256 and -2% at B=2048 (+6-8% wall from the smaller
    # op count), with f32 products where the dot_generals ran bf16 passes
    # (~1.7e-4 more accurate on TPU; identical reduction on CPU). Below
    # the gate the copies are latency-trivial and the lane-starved VPU
    # loses (B=1: -17%); at hd>16 the (B,N,N,hd) intermediates outgrow
    # the copy saving (hd=64: -10%). tools/profile_gaps.py re-measures.
    # type(B) is int: under batch-polymorphic export (ckpt/artifact.py) B
    # is a symbolic dim and `B >= 256` would be inconclusive — take the
    # dot_general formulation, correct at every batch size.
    mul_reduce = hd <= 16 and type(B) is int and B >= 256
    head_outs = []
    for i in range(h):
        q = qkv[..., i * hd:(i + 1) * hd]                                # (B, N, hd)
        k = qkv[..., inner_dim + i * hd: inner_dim + (i + 1) * hd]
        v = qkv[..., 2 * inner_dim + i * hd: 2 * inner_dim + (i + 1) * hd]
        # logits + softmax in f32 regardless of compute dtype (stability)
        if mul_reduce:
            attn = (q[:, :, None, :].astype(jnp.float32)
                    * k[:, None, :, :].astype(jnp.float32)).sum(-1) * scale
        else:
            attn = jnp.einsum(
                "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
            ) * scale
        if causal_mask is not None:
            attn = jnp.where(causal_mask, jnp.finfo(attn.dtype).min, attn)
        if key_mask is not None:  # (B, N) True = valid key token
            attn = jnp.where(key_mask[:, None, :], attn,
                             jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn, axis=-1)
        if not deterministic and attn_drop > 0.0:
            rng, r1 = jax.random.split(rng)
            attn = dropout(r1, attn, attn_drop, deterministic)
        if mul_reduce:
            head_outs.append(
                (attn[:, :, :, None].astype(v.dtype) * v[:, None, :, :]).sum(2)
            )
        else:
            head_outs.append(jnp.einsum("bnm,bmd->bnd", attn.astype(v.dtype), v))
    out = head_outs[0] if h == 1 else jnp.concatenate(head_outs, axis=-1)
    out = linear(p["proj"], out.astype(x.dtype))
    if not deterministic and proj_drop > 0.0:
        rng, r2 = jax.random.split(rng)
        out = dropout(r2, out, proj_drop, deterministic)
    return out


def mlp(p, x, act: str, drop: float = 0.0, rng=None, deterministic: bool = True):
    x = ACTIVATIONS[act](linear(p["fc1"], x))
    if not deterministic and drop > 0.0:
        rng, r1 = jax.random.split(rng)
        x = dropout(r1, x, drop, deterministic)
    x = linear(p["fc2"], x)
    if not deterministic and drop > 0.0:
        rng, r2 = jax.random.split(rng)
        x = dropout(r2, x, drop, deterministic)
    return x
