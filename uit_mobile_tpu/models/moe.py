"""Mixture-of-Experts UiT variant: each block's MLP becomes a routed
expert bank (GShard/Switch-style top-k token routing with a fixed
per-expert capacity).

The reference family has no MoE (its MLP is a single fc1/fc2 stack,
reference uit.py:181-203) — this module exists as the scaling variant
the expert-parallel layer (parallel/ep.py) shards: parameter count
grows with n_experts while per-token FLOPs stay at top_k experts, and
the expert bank's leading axis is the natural mesh axis for expert
parallelism. Everything outside the MLP (frontend, patch embed, pos
embeds, attention with the full-dim-scale quirk, pooling, head) is the
UiT code itself — an MoE checkpoint with n_experts=1 is a dense UiT
with extra routing weights, and the attention/LN parity quirks carry
over unchanged.

TPU-first formulation: routing is expressed as two einsums against
static-shape one-hot dispatch/combine tensors (G groups, S tokens, E,
C) — no sorting, no ragged shapes, no data-dependent control flow — so
the expert computation is one batched (E, G*C, D) x (E, D, H) matmul
that GSPMD shards over an 'expert' mesh axis (all_to_all inserted at
the dispatch/combine boundaries). Grouping keeps dispatch memory linear
in tokens (GShard's G axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import uit
from .common import ACTIVATIONS, layer_norm, linear_init


@dataclasses.dataclass(frozen=True)
class MoEUITConfig:
    """UiT geometry (``base``) + routing hyperparameters."""

    base: uit.UITConfig
    n_experts: int = 8
    top_k: int = 2
    # per-expert slot budget C = ceil(top_k * group_tokens / n_experts *
    # factor); tokens routed past an expert's budget are dropped (their
    # residual passes through unchanged — the standard capacity trade)
    capacity_factor: float = 2.0
    # Switch-style load-balancing auxiliary loss weight
    router_aux_weight: float = 1e-2
    # tokens per routing group (GShard 'G' axis): capacity and the one-hot
    # dispatch/combine tensors are per-group, keeping dispatch memory
    # LINEAR in total tokens (one global group would be quadratic —
    # combine is (S, E, C) with C ~ S/E). None = auto: groups of
    # gcd(B, 8) clips (24-token clips -> 192-token groups at B % 8 == 0).
    # Must divide the total token count when set.
    group_size: Optional[int] = None

    def __post_init__(self):
        assert self.n_experts >= 1 and 1 <= self.top_k <= self.n_experts
        assert self.base.pooling == "mean", "MoE factories ship 'mean' pooling"

    # registry-facing conveniences mirror UITConfig (harness paths read
    # these unguarded — e.g. Evaluator.test_sample uses cfg.target_length
    # and pad_to_target silently no-ops without it)
    @property
    def outputdim(self) -> int:
        return self.base.outputdim

    @property
    def frontend(self):
        return self.base.frontend

    @property
    def target_length(self) -> int:
        return self.base.target_length

    @property
    def mel_layout(self) -> str:
        return self.base.mel_layout

    @property
    def compute_dtype(self) -> str:
        return self.base.compute_dtype


def init(cfg: MoEUITConfig, rng) -> tuple[dict, dict]:
    """(params, state): uit.init params with every block's ``mlp``
    replaced by ``moe`` = {router, fc1, fc2} — expert banks stacked on a
    leading (E,) axis, each expert initialized like the dense MLP."""
    base_rng, moe_rng = jax.random.split(rng)
    params, state = uit.init(cfg.base, base_rng)
    D = cfg.base.embed_dim
    H = int(D * cfg.base.mlp_ratio)
    E = cfg.n_experts
    keys = iter(jax.random.split(moe_rng, cfg.base.depth * (2 * E + 1)))
    for blk in params["blocks"]:
        del blk["mlp"]
        fc1 = [linear_init(next(keys), D, H) for _ in range(E)]
        fc2 = [linear_init(next(keys), H, D) for _ in range(E)]
        blk["moe"] = {
            "router": {"kernel": 0.02 * jax.random.normal(next(keys), (D, E))},
            "fc1": jax.tree.map(lambda *xs: jnp.stack(xs), *fc1),
            "fc2": jax.tree.map(lambda *xs: jnp.stack(xs), *fc2),
        }
    return params, state


def _group_size(cfg: MoEUITConfig, B: int, N: int) -> int:
    """Tokens per routing group. Auto: groups of gcd(B, 8) clips — keeps
    the (S, E, C) dispatch tensors ~4x the activation bytes regardless of
    batch size (C ~ k*S/E*factor)."""
    T = B * N
    if cfg.group_size is not None:
        assert T % cfg.group_size == 0, (
            f"group_size {cfg.group_size} must divide {T} tokens"
        )
        return cfg.group_size
    import math

    return N * math.gcd(B, 8)


def moe_mlp(cfg: MoEUITConfig, p, x):
    """Routed MLP: (B, N, D) -> ((B, N, D), aux_loss).

    GShard formulation: tokens split into G groups of S; per group, top-k
    softmax routing with combine weights renormalized over the selected
    experts and a fixed per-expert capacity C. Dispatch/combine are dense
    one-hot tensors so every step is an einsum (static shapes, no sort,
    no ragged anything — the MXU-friendly expression):

        expert_in  = dispatch^T x          (E, G, C, D)
        expert_out = fc2(act(fc1(expert_in)))
        y          = combine . expert_out  (G, S, D)

    aux = E * sum_e f_e * P_e  (Switch load-balancing: f = fraction of
    tokens whose TOP-1 choice is e, P = mean router prob for e).

    compute_dtype='bfloat16' casts the expert matmuls (the FLOPs) like
    the dense mlp does; the router softmax/top-k and the combine
    bookkeeping stay f32 (the GShard/Switch convention — routing
    decisions are precision-sensitive, expert GEMMs are not)."""
    B, N, D = x.shape
    T = B * N
    E, k = cfg.n_experts, cfg.top_k
    cdt = (jnp.bfloat16 if cfg.base.compute_dtype == "bfloat16"
           else jnp.float32)
    S = _group_size(cfg, B, N)
    G = T // S
    C = max(1, min(int(np.ceil(k * S / E * cfg.capacity_factor)), k * S))
    xt = x.reshape(G, S, D)

    gates = jax.nn.softmax(
        jnp.einsum("gsd,de->gse", xt.astype(jnp.float32),
                   p["router"]["kernel"]),
        axis=-1,
    )  # (G, S, E)
    topv, topi = jax.lax.top_k(gates, k)  # (G, S, k)
    topv = topv / topv.sum(axis=-1, keepdims=True)

    counts = jnp.zeros((G, E), jnp.float32)
    combine = jnp.zeros((G, S, E, C), jnp.float32)
    for j in range(k):
        oh = jax.nn.one_hot(topi[:, :, j], E, dtype=jnp.float32)  # (G, S, E)
        # slot each token would take in expert e: tokens before it in the
        # group this round + slots consumed by earlier rounds
        pos = jnp.cumsum(oh, axis=1) - oh + counts[:, None, :]
        keep = oh * (pos < C)
        slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
        combine = combine + topv[:, :, j, None, None] * keep[..., None] * slot
        counts = counts + oh.sum(axis=1)
    dispatch = (combine > 0).astype(jnp.float32)

    expert_in = jnp.einsum("gsec,gsd->egcd", dispatch.astype(cdt),
                           xt.astype(cdt))
    h = ACTIVATIONS[cfg.base.act](
        jnp.einsum("egcd,edh->egch", expert_in, p["fc1"]["kernel"].astype(cdt))
        + p["fc1"]["bias"].astype(cdt)[:, None, None, :]
    )
    out_e = (
        jnp.einsum("egch,ehd->egcd", h, p["fc2"]["kernel"].astype(cdt))
        + p["fc2"]["bias"].astype(cdt)[:, None, None, :]
    )
    y = jnp.einsum("gsec,egcd->gsd", combine.astype(cdt), out_e)

    f = jax.nn.one_hot(topi[:, :, 0], E, dtype=jnp.float32).mean(axis=(0, 1))
    P = gates.mean(axis=(0, 1))
    aux = E * jnp.sum(f * P)
    return y.reshape(B, N, D).astype(x.dtype), aux


def block_forward(cfg: MoEUITConfig, blk, x, *, dpr_i=0.0, rngs=None,
                  train=False):
    """uit.block_forward with the MLP routed (via its ``mlp_fn`` hook —
    the casting/DropPath/LayerScale math is uit's own, not a copy):
    returns (tokens, aux_loss)."""
    return uit.block_forward(
        cfg.base, blk, x, dpr_i=dpr_i, rngs=rngs, train=train,
        mlp_fn=lambda b_, h: moe_mlp(cfg, b_["moe"], h),
    )


def _encode(cfg: MoEUITConfig, params, state, mel, *, train=False,
            rng=None):
    """(B, n_mels, T<=target) mel -> ((B, outputdim) probs, mean aux,
    new_state). Train mode mirrors uit.forward: batch-stat init_bn with
    running-stat updates (momentum 0.01), dropout/DropPath streams from
    ``rng``; eval uses inference BN and new_state is ``state``."""
    import numpy as _np

    from .common import batch_norm_train

    b = cfg.base
    new_state = state
    if train and b.init_bn:
        x, bn_state = batch_norm_train(
            params["init_bn"], state["init_bn"], mel, axis=-2, momentum=0.01
        )
        new_state = dict(state, init_bn=bn_state)
    else:
        x = uit.apply_init_bn(b, params, state, mel)
    x = uit.patch_embed(b, params["patch_embed"], x)
    x, _, rng = uit._prepare_tokens(b, params, x, train=train, rng=rng)
    aux_total = 0.0
    dpr = _np.linspace(0.0, b.drop_path_rate, b.depth)
    for i, blk in enumerate(params["blocks"]):
        if rng is not None:
            rng, r_attn, r_mlp, r_dp1, r_dp2 = jax.random.split(rng, 5)
            rngs = (r_attn, r_mlp, r_dp1, r_dp2)
        else:
            rngs = None
        x, aux = block_forward(cfg, blk, x, dpr_i=float(dpr[i]), rngs=rngs,
                               train=train)
        aux_total = aux_total + aux
    x = layer_norm(params["norm"], x.astype(jnp.float32), eps=1e-6)
    probs = uit.forward_head(b, params, x)
    return probs, aux_total / b.depth, new_state


def forward_with_aux(cfg: MoEUITConfig, params, state, wav, *,
                     train: bool = False, rng=None,
                     frontend_fn: Optional[Callable] = None):
    """(B, T_wav) waveform -> ((B, outputdim) probs, aux_loss, new_state).
    Eval: long clips take the reference crop rule (windows fold into
    batch; aux averages over crops with everything else) and new_state
    is ``state`` unchanged. Train (single-window, like uit.forward's
    train path): init_bn runs on batch stats and new_state carries the
    updated running statistics — training through the eval BN would
    leave the running stats at their random init forever."""
    b = cfg.base
    assert b.mel_layout == "bft", "MoE forward runs the canonical 'bft' layout"
    if train and rng is None:
        rng = jax.random.key(0)
    fe = frontend_fn or (lambda w: uit.log_mel_spectrogram(w, b.frontend))
    mel = fe(wav)
    if (not train) and mel.shape[-1] > b.target_length:
        crops, n_crops = uit.chunk_long_mel(b, mel)
        probs, aux, _ = _encode(cfg, params, state, crops)
        probs = probs.reshape(-1, n_crops, b.outputdim)
        probs = (
            probs.mean(axis=1) if b.eval_avg == "mean" else probs.max(axis=1)
        )
        return probs, aux, state
    return _encode(cfg, params, state, mel, train=train, rng=rng)


def forward(cfg: MoEUITConfig, params, state, wav, *,
            frontend_fn: Optional[Callable] = None):
    """Registry-facing eval forward: (B, T_wav) -> (B, outputdim) probs."""
    return forward_with_aux(cfg, params, state, wav,
                            frontend_fn=frontend_fn)[0]


def uit_xs_moe(outputdim: int = 527, target_length: int = 1012,
               n_experts: int = 8, top_k: int = 2,
               capacity_factor: float = 2.0, router_aux_weight: float = 1e-2,
               group_size: Optional[int] = None,
               **kwargs) -> MoEUITConfig:
    """uit_xs geometry (D=128, depth 12, bneck attention, ReLU, 'mean'
    pooling — reference uit.py:581-597) with the block MLPs routed over
    ``n_experts`` experts."""
    return MoEUITConfig(
        base=uit.uit_xs(outputdim=outputdim, target_length=target_length,
                        **kwargs),
        n_experts=n_experts, top_k=top_k,
        capacity_factor=capacity_factor,
        router_aux_weight=router_aux_weight,
        group_size=group_size,
    )
