"""Sequence (context) parallelism: ring attention over a 'seq' mesh axis.

Like tp.py/pp.py, this is NOT the production layout for the shipped
family — at 24 tokens per 1 s window, sequence length is bounded by
design (SURVEY §5.7; the reference scales long audio by independent
eval-time crop windows, reference uit.py:468-488, which the DP layouts
already shard as *batch*). The module exists so the framework scales
past that regime: a long-context variant (streaming transcripts, raised
target_length, dense framewise heads at high time resolution) whose
token axis outgrows one chip's activation memory runs unchanged, tokens
sharded across chips.

Design — the TPU-idiomatic ring formulation, not a translated
NCCL P2P schedule:

- Tokens are sharded (B, N/S, D) over ``seq_axis`` inside
  ``shard_map``. Every per-token op (LayerNorm, MLP, LayerScale,
  residuals, qkv/proj linears — weights replicated) runs locally on the
  shard with zero communication: the Megatron-SP observation that only
  attention mixes tokens.
- Attention runs as a **ring**: each device computes q/k/v for its
  local tokens, then K/V blocks rotate S-1 hops around the ICI ring
  (``lax.ppermute``) while a running online-softmax accumulator
  (running max m, denominator l, numerator o — the flash-attention
  recurrence) folds in one (n_loc x n_loc) logit tile per hop. Softmax
  over the full key axis is recovered exactly (up to f32 summation
  order); no (N x N) tensor ever materializes on any chip.
- Mean pooling is one ``psum`` of local token sums; the head — O(B*D)
  — runs replicated outside the sharded region.
- Composes with data parallelism on a ('data', 'seq') mesh: batch
  shards over 'data', the ring stays on its own axis.

Eval/serving only, 'bft' single-window path, like pipeline_forward —
training this family is DP (train/loop.py); a sequence-parallel
backward only pays once activations-per-token exceed chip HBM, which
no shipped config reaches.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import uit
from ..models.common import layer_norm, linear, mlp


def make_seq_mesh(n_shards: int, axis: str = "seq") -> Mesh:
    """1-D sequence mesh over the first n_shards devices (consecutive
    devices = ICI neighbours, the layout the K/V ring wants)."""
    from .mesh import make_mesh

    return make_mesh(n_shards, axis=axis)


def _ring_attention(p, x_loc, *, num_heads: int, scale: float,
                    inner_dim: int, axis: str, n_shards: int,
                    varying_axes=None):
    """Exact MHSA over the full (sharded) token axis: (B, n_loc, D) local
    tokens -> (B, n_loc, D), K/V blocks rotating around ``axis``.

    Per head, per hop: one (n_loc x n_loc) logit tile enters the
    flash-attention online-softmax recurrence
        m' = max(m, rowmax);  c = exp(m - m')
        l' = c*l + sum(exp(logits - m'));  o' = c*o + exp(logits - m') @ V
    which telescopes to the dense softmax(QK^T)V after S hops. The
    softmax scale is the caller's (full-dim head quirk preserved,
    reference uit.py:99-100)."""
    B, n_loc, _ = x_loc.shape
    h, hd = num_heads, inner_dim // num_heads
    qkv = linear(p["qkv"], x_loc)  # (B, n_loc, 3*inner)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def split_heads(t):  # (B, n_loc, inner) -> (B, h, n_loc, hd); head i
        # = columns [i*hd:(i+1)*hd], the multihead_attention layout
        return t.reshape(B, n_loc, h, hd).transpose(0, 2, 1, 3) \
                .astype(jnp.float32)

    q = split_heads(qkv[..., :inner_dim])
    k = split_heads(qkv[..., inner_dim:2 * inner_dim])
    v = split_heads(qkv[..., 2 * inner_dim:])

    def fold(k_blk, v_blk, m, l, o):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k_blk) * scale
        m_new = jnp.maximum(m, logits.max(axis=-1))
        c = jnp.exp(m - m_new)
        pexp = jnp.exp(logits - m_new[..., None])
        l = c * l + pexp.sum(axis=-1)
        o = c[..., None] * o + jnp.einsum("bhnm,bhmd->bhnd", pexp, v_blk)
        return m_new, l, o

    def hop(carry, _):
        k_blk, v_blk, m, l, o = carry
        m, l, o = fold(k_blk, v_blk, m, l, o)
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        return (k_blk, v_blk, m, l, o), None

    # ONE ring for all heads: the full (B, h, n_loc, hd) K/V blocks rotate
    # together and every head folds inside the hop body — 2*(S-1)
    # collectives per block instead of 2*h*(S-1) (the per-head rings
    # serialize on the same mesh axis, so this divides ring latency by h
    # while moving the same bytes).
    # Accumulators become device-varying at hop 0 (derived from the
    # varying q) — declare them so upfront, over EVERY mesh axis the
    # inputs vary on (seq + any data axis), for shard_map's vma typing.
    va = tuple(varying_axes) if varying_axes else (axis,)
    m0 = lax.pcast(
        jnp.full((B, h, n_loc), -jnp.inf, jnp.float32), va, to="varying"
    )
    l0 = lax.pcast(jnp.zeros((B, h, n_loc), jnp.float32), va, to="varying")
    o0 = lax.pcast(
        jnp.zeros((B, h, n_loc, hd), jnp.float32), va, to="varying"
    )
    # S-1 (fold, rotate) hops, then one final fold WITHOUT the rotate:
    # the last rotation's K/V would never be read (n_shards dead
    # ppermute pairs per block otherwise)
    (k, v, m, l, o), _ = lax.scan(
        hop, (k, v, m0, l0, o0), None, length=n_shards - 1
    )
    _, l, o = fold(k, v, m, l, o)
    out = (o / l[..., None]).transpose(0, 2, 1, 3).reshape(B, n_loc, inner_dim)
    return linear(p["proj"], out.astype(x_loc.dtype))


def _sp_block(cfg, blk, x, *, axis: str, n_shards: int, varying_axes=None):
    """block_forward's eval math on a token shard: LN/MLP/LayerScale are
    per-token (local); attention is the ring."""
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    cast = (
        (lambda t: jax.tree.map(lambda a: a.astype(cdt), t))
        if cdt != jnp.float32 else (lambda t: t)
    )
    h = layer_norm(blk["norm1"], x.astype(jnp.float32), eps=1e-6).astype(cdt)
    h = _ring_attention(
        cast(blk["attn"]), h,
        num_heads=cfg.num_heads, scale=cfg.attn_scale,
        inner_dim=cfg.inner_dim, axis=axis, n_shards=n_shards,
        varying_axes=varying_axes,
    )
    if "ls1" in blk:
        h = h * blk["ls1"]["gamma"].astype(cdt)
    x = x + h
    h = layer_norm(blk["norm2"], x.astype(jnp.float32), eps=1e-6).astype(cdt)
    h = mlp(cast(blk["mlp"]), h, act=cfg.act)
    if "ls2" in blk:
        h = h * blk["ls2"]["gamma"].astype(cdt)
    return x + h


def sequence_parallel_forward(cfg, params, state, mesh: Mesh, *,
                              seq_axis: str = "seq",
                              data_axis: Optional[str] = None,
                              frontend_fn: Optional[Callable] = None):
    """Eval forward ``fn(wav) -> probs`` with the token axis sharded over
    ``mesh[seq_axis]`` (optionally batch-sharded over ``data_axis`` on a
    2D mesh).

    Single-window 'bft' path like pipeline_forward (long-clip crops are
    batch on the DP layouts). Requires pooling='mean' (the uit_* family;
    a cls token is sequence-global by construction), non-causal, and
    N % n_shards == 0 (N=24 divides 2/4/8 shards at the stock patch
    grid)."""
    S = int(mesh.shape[seq_axis])
    assert cfg.pooling == "mean", "sequence_parallel_forward: pooling='mean' only"
    assert not cfg.causal, "ring attention here is non-causal only"
    assert cfg.mel_layout == "bft", (
        "sequence_parallel_forward runs the canonical 'bft' forward; the "
        "tfb/btf serving layouts are DP-only"
    )
    fg, tg = cfg.grid_size
    N = fg * tg
    assert N % S == 0, f"{N} tokens must divide {S} sequence shards"

    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)

    tok_spec = P(data_axis, seq_axis, None)
    out_spec = P(data_axis) if data_axis else P()

    va = (seq_axis,) + ((data_axis,) if data_axis else ())

    def encoder(prms, x):
        for blk in prms["blocks"]:
            x = _sp_block(cfg, blk, x, axis=seq_axis, n_shards=S,
                          varying_axes=va)
        x = layer_norm(prms["norm"], x.astype(jnp.float32), eps=1e-6)
        # mean pool = one psum of local sums (replicates over the ring);
        # divide by the ACTUAL token count (local x S), not the config
        # grid N — a shorter-than-target_length clip yields fewer tokens
        # and must match the dense path's x.mean(axis=1)
        return lax.psum(x.sum(axis=1), seq_axis) / (x.shape[1] * S)

    sp_encoder = jax.shard_map(
        encoder, mesh=mesh, in_specs=(P(), tok_spec), out_specs=out_spec
    )

    fe = frontend_fn or (lambda w: uit.log_mel_spectrogram(w, cfg.frontend))

    def fwd(wav):
        mel = fe(wav)  # (B, n_mels, T)
        assert mel.shape[-1] <= cfg.target_length, (
            "sequence_parallel_forward is the single-window serving path; "
            "chunk long clips upstream (chunk_long_mel) or use the DP layouts"
        )
        x = uit.apply_init_bn(cfg, params, state, mel)
        x = uit.patch_embed(cfg, params["patch_embed"], x)
        x, _, _ = uit._prepare_tokens(cfg, params, x)
        pooled = sp_encoder(params, x)  # (B, D)
        return uit.forward_head(cfg, params, pooled[:, None, :])

    in_sh = NamedSharding(mesh, P(data_axis)) if data_axis else repl
    return jax.jit(fwd, in_shardings=in_sh)
