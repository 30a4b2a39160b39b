"""Whole-encoder Pallas kernel, round 3 ("v2") — VMEM-resident activations.

Why try again (round 2's fused encoder lost and was removed): the loss
predated the tfb layout and the multiply-reduce attention, and its
per-token matmuls starved the MXU. The round-2 closing profile shows the
XLA encoder spends ~3.4 ms of the 6.16 ms serving batch (B=2048) while
its matmul FLOPs need only ~0.7 ms — the rest is HBM activation traffic:
XLA cannot fuse through dot roots, so qkv (19 MB), per-head products,
proj/LN outs (25 MB each), and the MLP hidden (75 MB) all round-trip
HBM, ~2 GB per batch across 12 blocks.

This kernel keeps ALL activations in VMEM:

- grid (B/b_blk, depth): the batch block is the outer axis; for a fixed
  batch block the layer axis iterates sequentially (TPU grids are
  sequential), carrying x in a VMEM scratch — each grid cell DMAs ONLY
  its layer's weight slice (~0.5 MB), so VMEM holds one layer of
  weights, not twelve;
- matmuls run at the same big-M shapes XLA uses — (b_blk*N, D) rows —
  with bf16 1-pass products + f32 accumulation (matching XLA's DEFAULT
  TPU matmul precision, which the round-2 parity budget already covers);
  a 'f32' mode (3-pass split via HIGHEST) exists for tight CPU tests;
- attention per head runs as the multiply-reduce formulation IN VMEM:
  q/k/v are transposed to (hd, N, b_blk) lane-major tiles and the
  (N, N, b_blk) gram accumulates over hd with broadcast multiplies —
  the exact formulation that beat dot_generals in XLA (PERF_NOTES), now
  without any HBM spill of the products;
- LayerNorm in f32 over the lane (D) axis; residuals in scratch.

Serving/eval only: no dropout/droppath, no token mask, no cls token
(the UiT factories all use mean pooling), LayerScale unsupported (none
of the shipped configs uses it). Single-window token grids.

Measured verdict lives in PERF_NOTES.md (see "round 3").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-6):
    """LayerNorm over the last (lane) axis, f32."""
    x = x.astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _dot(a, b, precision):
    if precision == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _encoder_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                    lnfs_ref, lnfb_ref,
                    out_ref, x_scr, *, depth, n_tokens, num_heads, head_dim,
                    scale, act, precision):
    """One (b_blk, layer) grid cell: apply transformer block `l` to the
    carried activations. x logical (b_blk, N, D); rows (b_blk*N, D)."""
    l = pl.program_id(1)
    b_blk = x_ref.shape[0]
    N, D = n_tokens, x_ref.shape[2]
    inner = wproj_ref.shape[1]  # (1, inner, D) slice

    @pl.when(l == 0)
    def _():
        x_scr[...] = x_ref[...].astype(jnp.float32)

    x = x_scr[...]                       # (b_blk, N, D) f32
    rows = x.reshape(b_blk * N, D)

    # ---- attention sublayer
    # (1-D per-layer params ride as (depth, 1, dim): Mosaic requires the
    # last-two block dims be 8/128-divisible or full — (1, dim) is full)
    h = _ln(rows, ln1s_ref[0, 0], ln1b_ref[0, 0])
    qkv = _dot(h, wqkv_ref[0], precision) + bqkv_ref[0, 0]  # (rows, 3*inner)
    hd = head_dim
    outs = []
    for head in range(num_heads):
        # lane slices of the fused qkv output (no (B,N,3,h,hd) reshape)
        q = qkv[:, head * hd:(head + 1) * hd]
        k = qkv[:, inner + head * hd:inner + (head + 1) * hd]
        v = qkv[:, 2 * inner + head * hd:2 * inner + (head + 1) * hd]
        # -> (hd, N, b_blk): d outer, tokens in sublanes, batch in lanes
        qt = q.reshape(b_blk, N, hd).transpose(2, 1, 0)
        kt = k.reshape(b_blk, N, hd).transpose(2, 1, 0)
        vt = v.reshape(b_blk, N, hd).transpose(2, 1, 0)
        # gram G[i, j, b] = sum_d q[d,i,b] k[d,j,b]  (multiply-reduce)
        g = jnp.zeros((N, N, b_blk), jnp.float32)
        for d in range(hd):
            qd = qt[d]                   # (N, b_blk)
            kd = kt[d]
            g = g + qd[:, None, :] * kd[None, :, :]
        g = g * scale
        # softmax over j (the middle axis)
        g = g - jnp.max(g, axis=1, keepdims=True)
        e = jnp.exp(g)
        a = e / jnp.sum(e, axis=1, keepdims=True)   # (N, N, b_blk)
        # O[d, i, b] = sum_j a[i,j,b] v[d,j,b]
        o = jnp.zeros((hd, N, b_blk), jnp.float32)
        for j in range(N):
            aj = a[:, j, :]              # (N, b_blk)
            vj = vt[:, j, :]             # (hd, b_blk)
            o = o + aj[None, :, :] * vj[:, None, :]
        outs.append(o.transpose(2, 1, 0).reshape(b_blk * N, hd))
    attn = jnp.concatenate(outs, axis=1)            # (rows, inner)
    rows = rows + (_dot(attn, wproj_ref[0], precision) + bproj_ref[0, 0])

    # ---- MLP sublayer
    h = _ln(rows, ln2s_ref[0, 0], ln2b_ref[0, 0])
    h = _dot(h, w1_ref[0], precision) + b1_ref[0, 0]
    h = jnp.maximum(h, 0.0) if act == "relu" else jax.nn.gelu(h)
    rows = rows + (_dot(h, w2_ref[0], precision) + b2_ref[0, 0])

    x_scr[...] = rows.reshape(b_blk, N, D)

    @pl.when(l == depth - 1)
    def _():
        final = _ln(x_scr[...].reshape(b_blk * N, D), lnfs_ref[0, 0], lnfb_ref[0, 0])
        out_ref[...] = final.reshape(b_blk, N, D)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, act, precision):
    """Fused MLP sublayer: out = x + fc2(act(fc1(LN(x)))) — one VMEM pass
    over an (m_blk, D) row block. Kills the LN output, the (rows, hidden)
    activation, and the residual read/write that XLA materializes in HBM
    between its dot roots (hidden alone is 75 MB/block at B=2048)."""
    x = x_ref[...]
    h = _ln(x, lns_ref[0], lnb_ref[0])
    h = _dot(h, w1_ref[...], precision) + b1_ref[0]
    h = jnp.maximum(h, 0.0) if act == "relu" else jax.nn.gelu(h)
    out_ref[...] = x + (_dot(h, w2_ref[...], precision) + b2_ref[0])


def fused_mlp(blk_params, x: jax.Array, *, act: str,
              precision: str = "bf16", block_m: int = 2048,
              interpret: bool | None = None) -> jax.Array:
    """x (rows, D) -> x + MLP(LN2(x)), fused. blk_params: one entry of
    params['blocks'] (norm2 + mlp weights)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    rows, D = x.shape
    w1 = blk_params["mlp"]["fc1"]["kernel"]
    hidden = w1.shape[1]
    m_blk = min(block_m, rows)
    grid = (pl.cdiv(rows, m_blk),)
    row_spec = pl.BlockSpec((m_blk, D), lambda m: (m, 0),
                            memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda m: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * rows * D * hidden,
        bytes_accessed=2 * rows * D * 4 + 2 * D * hidden * 4,
        transcendentals=0,
    )
    kernel = functools.partial(_mlp_kernel, act=act, precision=precision)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[row_spec, full(1, D), full(1, D),
                  full(D, hidden), full(1, hidden),
                  full(hidden, D), full(1, D)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, D), jnp.float32),
        cost_estimate=cost, interpret=interpret,
    )(x, blk_params["norm2"]["scale"][None], blk_params["norm2"]["bias"][None],
      w1, blk_params["mlp"]["fc1"]["bias"][None],
      blk_params["mlp"]["fc2"]["kernel"], blk_params["mlp"]["fc2"]["bias"][None])


def encoder_hybrid(cfg, params, tokens: jax.Array, *,
                   precision: str = "bf16", block_m: int = 2048,
                   interpret: bool | None = None) -> jax.Array:
    """XLA attention + fused-MLP-kernel encoder: the attention sublayer
    keeps XLA's full-batch multiply-reduce formulation (which beats
    per-block kernel loops — see PERF_NOTES round 3), while each block's
    MLP chain runs as one Pallas pass. Eval-mode drop-in for the block
    loop + final norm of models.uit._finish_features."""
    from ..models.common import layer_norm, multihead_attention

    assert cfg.init_values is None, "LayerScale unsupported"
    assert cfg.pooling != "token", (
        "hybrid encoder never prepends a cls token (mean/dm pooling only)"
    )
    B, N, D = tokens.shape
    x = tokens.reshape(B, N, D)
    for blk in params["blocks"]:
        h = layer_norm(blk["norm1"], x.astype(jnp.float32), eps=1e-6)
        h = multihead_attention(
            blk["attn"], h, num_heads=cfg.num_heads, scale=cfg.attn_scale,
            inner_dim=cfg.inner_dim, causal=cfg.causal, deterministic=True,
        )
        x = x + h
        rows = fused_mlp(blk, x.reshape(B * N, D), act=cfg.act,
                         precision=precision, block_m=block_m,
                         interpret=interpret)
        x = rows.reshape(B, N, D)
    return layer_norm(params["norm"], x.astype(jnp.float32), eps=1e-6)


def encoder_forward(cfg, params, tokens: jax.Array, *,
                    precision: str = "bf16", block_b: int = 128,
                    interpret: bool | None = None) -> jax.Array:
    """(B, N, D) pos-embedded tokens -> (B, N, D) encoded + final-LN'd.

    Drop-in for models.uit._finish_features' block loop + final norm in
    eval mode (see module docstring for the unsupported training
    features). precision: 'bf16' (serving; XLA-DEFAULT-grade products)
    or 'f32' (HIGHEST; for tight tests).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, N, D = tokens.shape
    depth = cfg.depth
    inner = cfg.inner_dim
    hidden = int(D * cfg.mlp_ratio)
    hd = inner // cfg.num_heads
    b_blk = min(block_b, B)
    assert B % b_blk == 0, (B, b_blk)
    assert cfg.init_values is None, "LayerScale unsupported in the kernel"
    assert not cfg.causal, (
        "encoder_forward builds the full N x N gram — causal configs "
        "must use the XLA encoder (models.common.multihead_attention)"
    )
    assert cfg.pooling != "token", (
        "encoder_forward never prepends a cls token; 'token' pooling "
        "would silently pool an ordinary patch token downstream"
    )

    blocks = params["blocks"]

    def stack(path):
        return jnp.stack([functools.reduce(lambda d, k: d[k], path, blk)
                          for blk in blocks])

    wqkv = stack(["attn", "qkv", "kernel"])          # (depth, D, 3*inner)
    bqkv = stack(["attn", "qkv", "bias"]) if "bias" in blocks[0]["attn"]["qkv"] else jnp.zeros((depth, 3 * inner))
    wproj = stack(["attn", "proj", "kernel"])        # (depth, inner, D)
    bproj = stack(["attn", "proj", "bias"])
    w1 = stack(["mlp", "fc1", "kernel"])             # (depth, D, hidden)
    b1 = stack(["mlp", "fc1", "bias"])
    w2 = stack(["mlp", "fc2", "kernel"])             # (depth, hidden, D)
    b2 = stack(["mlp", "fc2", "bias"])
    ln1s = stack(["norm1", "scale"])
    ln1b = stack(["norm1", "bias"])
    ln2s = stack(["norm2", "scale"])
    ln2b = stack(["norm2", "bias"])
    lnfs = jnp.broadcast_to(params["norm"]["scale"], (depth, D))
    lnfb = jnp.broadcast_to(params["norm"]["bias"], (depth, D))
    # 1-D per-layer params ride as (depth, 1, dim) so their (1, dim)
    # blocks satisfy Mosaic's last-two-dims constraint
    bqkv, bproj, b1, b2, ln1s, ln1b, ln2s, ln2b, lnfs, lnfb = (
        t[:, None, :] for t in
        (bqkv, bproj, b1, b2, ln1s, ln1b, ln2s, ln2b, lnfs, lnfb))

    grid = (B // b_blk, depth)
    x_spec = pl.BlockSpec((b_blk, N, D), lambda b, l: (b, 0, 0),
                          memory_space=pltpu.VMEM)

    def lspec(*shape):
        return pl.BlockSpec((1,) + shape, lambda b, l, _n=len(shape): (l,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _encoder_kernel, depth=depth, n_tokens=N, num_heads=cfg.num_heads,
        head_dim=hd, scale=cfg.attn_scale, act=cfg.act, precision=precision,
    )
    cost = pl.CostEstimate(
        flops=2 * B * N * depth * (D * 3 * inner + inner * D + 2 * D * hidden
                                   + 2 * N * inner),
        bytes_accessed=2 * B * N * D * 4 + depth * (
            D * 3 * inner + inner * D + 2 * D * hidden) * 4,
        transcendentals=B * N * N * depth * cfg.num_heads,
    )
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[x_spec,
                  lspec(D, 3 * inner), lspec(1, 3 * inner),
                  lspec(inner, D), lspec(1, D),
                  lspec(D, hidden), lspec(1, hidden),
                  lspec(hidden, D), lspec(1, D),
                  lspec(1, D), lspec(1, D), lspec(1, D), lspec(1, D),
                  lspec(1, D), lspec(1, D)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_blk, N, D), jnp.float32)],
        cost_estimate=cost, interpret=interpret,
    )(tokens, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2,
      ln1s, ln1b, ln2s, ln2b, lnfs, lnfb)
