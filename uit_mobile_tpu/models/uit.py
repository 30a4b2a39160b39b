"""UiT audio transformer family, TPU-native.

Re-designs the reference ``models/uit.py`` (UITBase, uit.py:252-493) as pure
functions over explicit pytrees with fully static shapes:

- the log-mel frontend (reference uit.py:298-308) is an external, swappable
  callable (pure-JAX reference impl or the fused Pallas kernel);
- patch embedding (Conv2d 16x16 stride 16, uit.py:63-66) is expressed as a
  space-to-depth reshape + matmul so it rides the MXU directly;
- long-clip evaluation (uit.py:468-488) is a reshape of the time axis into
  fixed windows folded into the batch dimension — one XLA program, no
  Python crop loop; the short tail is replaced by the LAST full window
  (uit.py:477-480) and scores reduce by mean or max (`eval_avg`);
- training-time stochasticity (dropout, drop-path, patch dropout, mixup)
  is explicit-RNG keyed.

Checkpoint-parity-critical quirks preserved:
- BNeckAttention's softmax scale uses the FULL-dim head size (uit.py:99-101);
- ``self.norm`` / block LayerNorms use eps=1e-6 (uit.py:337) while the
  output head's LayerNorm uses torch's default eps=1e-5 (uit.py:358-360);
- the head emits sigmoid probabilities, not logits (uit.py:401);
- pooling='dm' does freq-mean -> head -> sigmoid -> time-mean (uit.py:405-412).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import FrontendConfig, log_mel_spectrogram
from .common import (
    ACTIVATIONS,
    batch_norm_inference,
    batch_norm_train,
    conv2d_torch_default_init,
    dropout,
    drop_path,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mlp,
    multihead_attention,
    trunc_normal,
)


@dataclasses.dataclass(frozen=True)
class UITConfig:
    outputdim: int = 527
    patch_size: int = 16
    patch_stride: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_bn: bool = True
    init_values: Optional[float] = None
    target_length: int = 1012
    pooling: str = "token"  # 'token' | 'mean' | 'dm'
    attention_type: str = "Attention"  # 'Attention' | 'BNeckAttention'
    act: str = "gelu"  # block MLP activation ('relu' in uit_* factories)
    eval_avg: str = "mean"  # long-clip score reduction: 'mean' | 'max'
    time_patch_out: Optional[float] = None
    freq_patch_out: Optional[float] = None
    n_mels: int = 64
    causal: bool = False
    # opt-in: mask padded-region patches in attention and pooling when
    # `lengths` are passed to forward(). The reference plumbs lengths but
    # its masking is dead code (uit.py:153-163 commented out; use_mask is
    # a no-op) — this implements the feature properly; OFF by default to
    # preserve checkpoint-parity behavior.
    use_length_mask: bool = False
    # 'float32' (parity) or 'bfloat16' (fast serving: encoder matmuls in
    # bf16, LayerNorm/softmax/head in f32)
    compute_dtype: str = "float32"
    # mel orientation the frontend_fn delivers. 'bft' = (B, n_mels, T),
    # the reference's layout. 'btf' = (B, T, n_mels) — the Pallas kernel's
    # NATIVE row layout: skips the lane<->sublane transpose copy AND folds
    # init_bn's inference affine into the patch-embed matmul
    # (patch_embed_btf). Exact algebra (<=2e-5 in f32, tests/test_btf_layout);
    # on TPU default matmul precision the different bf16 product grouping
    # measures <=1.1e-4 output drift — inside the 1e-3 parity budget.
    # EVAL/serving only (BN stat updates can't be folded) — pair with
    # make_frontend_fn(..., layout='btf').
    mel_layout: str = "bft"
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)

    def __post_init__(self):
        # real raises, not asserts: under python -O a typo'd eval_avg
        # would silently score as 'max' (the reference raises too,
        # uit.py:483-488) and a bad pooling/layout would fail far away
        def check(ok, msg):
            if not ok:
                raise ValueError(msg)

        check(self.pooling in ("mean", "token", "dm"),
              f"unknown pooling {self.pooling!r}")
        check(self.attention_type in ("Attention", "BNeckAttention"),
              f"unknown attention_type {self.attention_type!r}")
        check(self.embed_dim % self.num_heads == 0,
              f"embed_dim {self.embed_dim} % num_heads {self.num_heads}")
        check(self.eval_avg in ("mean", "max"),
              f"unknown eval_avg {self.eval_avg!r}")
        check(self.mel_layout in ("bft", "btf", "tfb"),
              f"unknown mel_layout {self.mel_layout!r}")
        check(self.patch_stride == self.patch_size,
              f"patch_stride {self.patch_stride} != patch_size "
              f"{self.patch_size}: the reshape patch embed cannot express "
              f"overlapping patches — grid_size/pos-embeds/framewise times "
              f"would silently desynchronize from the actual token grid")
        check(not (self.pooling == "dm" and self.freq_patch_out),
              "pooling='dm' is incompatible with freq_patch_out: the head's "
              "(B, fg, tg, D) reshape uses the config grid, but freq patch "
              "dropout shrinks the actual freq-patch count in training — "
              "tokens would interleave wrongly (or the reshape fail)")

    @property
    def grid_size(self):  # (freq, time) patch grid
        return (
            self.n_mels // self.patch_stride,
            self.target_length // self.patch_stride,
        )

    @property
    def inner_dim(self) -> int:
        if self.attention_type == "BNeckAttention":
            return self.embed_dim // 4
        return self.embed_dim

    @property
    def attn_scale(self) -> float:
        # Reference quirk (uit.py:99-100, 136-137): always the FULL-dim head.
        return float((self.embed_dim // self.num_heads) ** -0.5)


# ----------------------------------------------------------------------- init

def init(cfg: UITConfig, rng) -> tuple[dict, dict]:
    """Initialize (params, state) matching reference init (uit.py:361-376)."""
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.depth))
    D = cfg.embed_dim
    fg, tg = cfg.grid_size
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}

    if cfg.init_bn:
        params["init_bn"] = {"scale": jnp.ones((cfg.n_mels,)), "bias": jnp.zeros((cfg.n_mels,))}
        state["init_bn"] = {"mean": jnp.zeros((cfg.n_mels,)), "var": jnp.ones((cfg.n_mels,))}

    conv = conv2d_torch_default_init(
        next(keys), (cfg.patch_size, cfg.patch_size, 1, D)
    )
    params["patch_embed"] = {
        "kernel": conv["kernel"].reshape(cfg.patch_size * cfg.patch_size, D),
        "bias": conv["bias"],
    }
    params["cls_token"] = 1e-6 * jax.random.normal(next(keys), (1, 1, D))
    params["token_pos_embed"] = 0.02 * jax.random.normal(next(keys), (1, D))
    params["time_pos_embed"] = 0.02 * jax.random.normal(next(keys), (tg, D))
    params["freq_pos_embed"] = 0.02 * jax.random.normal(next(keys), (fg, D))

    inner = cfg.inner_dim
    hidden = int(D * cfg.mlp_ratio)
    blocks = []
    for _ in range(cfg.depth):
        blk = {
            "norm1": layer_norm_init(D),
            "attn": {
                "qkv": linear_init(next(keys), D, 3 * inner, bias=cfg.qkv_bias),
                "proj": linear_init(next(keys), inner, D),
            },
            "norm2": layer_norm_init(D),
            "mlp": {
                "fc1": linear_init(next(keys), D, hidden),
                "fc2": linear_init(next(keys), hidden, D),
            },
        }
        if cfg.init_values is not None:
            blk["ls1"] = {"gamma": cfg.init_values * jnp.ones((D,))}
            blk["ls2"] = {"gamma": cfg.init_values * jnp.ones((D,))}
        blocks.append(blk)
    params["blocks"] = blocks
    params["norm"] = layer_norm_init(D)
    params["head_norm"] = layer_norm_init(D)
    params["head"] = linear_init(next(keys), D, cfg.outputdim)
    return params, state


# ------------------------------------------------------------------- encoder

def patch_embed(cfg: UITConfig, p, x):
    """(B, n_mels, T) mel -> (B, Fg, Tg, D) patch tokens via reshape+matmul.

    Equivalent to the reference's Conv2d(1, D, 16, stride 16) (uit.py:63-66):
    valid windows only, so T >= 16 frames beyond the last full patch are
    dropped exactly like a strided conv would.
    """
    B, F, T = x.shape
    ps = cfg.patch_size
    fg, tg = F // ps, T // ps
    if tg < 1:
        raise ValueError(
            f"input has {T} mel frames but one {ps}x{ps} patch needs at least "
            f"{ps}; feed clips of >= {ps * cfg.frontend.hop_length} samples "
            f"(~{ps * cfg.frontend.hop_length / cfg.frontend.sample_rate:.2f}s)"
        )
    x = x[:, : fg * ps, : tg * ps]
    # (B, fg, ps, tg, ps) -> (B, fg, tg, ps, ps): patch rows are the freq
    # axis of the conv kernel, matching torch's (D, 1, kh, kw) row-major
    # flatten in the checkpoint converter.
    x = x.reshape(B, fg, ps, tg, ps).transpose(0, 1, 3, 2, 4).reshape(B, fg, tg, ps * ps)
    return x @ p["kernel"] + p["bias"]


def _drop_patches(rng, x, axis, frac):
    """Random patch dropout along `axis`, keeping order (uit.py:26-30)."""
    n = x.shape[axis]
    keep = n - int(n * frac)
    idx = jnp.sort(jax.random.permutation(rng, n)[:keep])
    return jnp.take(x, idx, axis=axis)


def token_validity_mask(cfg: UITConfig, lengths, tg: int):
    """lengths (B,) samples -> (B, fg*tg) bool: which patch tokens lie
    fully inside real (non-padded) audio. center=True framing yields
    1 + len//hop frames; time-patch t needs frames [t*ps, (t+1)*ps)."""
    import jax.numpy as jnp

    fg = cfg.grid_size[0]
    n_frames = 1 + lengths // cfg.frontend.hop_length  # (B,)
    t_idx = jnp.arange(tg)
    t_valid = (t_idx + 1) * cfg.patch_stride <= n_frames[:, None]  # (B, tg)
    t_valid = t_valid | (t_idx == 0)[None, :]  # always keep >=1 token
    return jnp.repeat(t_valid[:, None, :], fg, axis=1).reshape(lengths.shape[0], -1)


def patch_embed_btf(cfg: UITConfig, params, state, x):
    """(B, T, n_mels) CLAMPED log-mel dB -> (B, fg, tg, D) tokens, with the
    init_bn inference affine FOLDED into the patch-embed matmul.

    The fold is exact algebra: init_bn at eval is a per-mel-bin affine
    y = a*m + b (a = scale/sqrt(var+eps), b = bias - mean*a), and the
    patch-embed conv is linear, so
        tokens = (a*m + b) @ K + c  ==  m @ (a . K) + (b @ K + c)
    with the per-absolute-mel-bin scaling applied per frequency patch.
    One HBM pass over the mel disappears (the BN elementwise op) and the
    (B, T, F) -> (B, F, T) lane transpose never happens. Serving/eval
    only — training BN stat updates cannot be folded.
    """
    B, T, F = x.shape
    ps = cfg.patch_size
    fg, tg = F // ps, T // ps
    if tg < 1:
        raise ValueError(
            f"input has {T} mel frames but one {ps}x{ps} patch needs at least {ps}"
        )
    x = x[:, : tg * ps, : fg * ps]
    Kf, bias_f = _folded_patch_kernel(cfg, params, state, F, fg, x.dtype)
    # x5[b, t, v(time-in-patch), f, u(mel-in-patch)]
    x5 = x.reshape(B, tg, ps, fg, ps)
    tokens = jnp.einsum("btvfu,fuvd->btfd", x5, Kf) + bias_f[None, None]
    return tokens.transpose(0, 2, 1, 3)            # (B, fg, tg, D)


def _folded_patch_kernel(cfg: UITConfig, params, state, F: int, fg: int, dtype):
    """The init_bn-into-patch-embed fold shared by the btf and tfb paths:
    per-mel-bin affine y = a*m + b folded into the linear patch embed as
    Kf = a . K (per frequency patch) and bias_f = b @ K + c.
    Returns (Kf (fg, mel_p, time_p, D), bias_f (fg, D))."""
    ps = cfg.patch_size
    if cfg.init_bn:
        p, s = params["init_bn"], state["init_bn"]
        inv = jax.lax.rsqrt(s["var"] + 1e-5)
        a = p["scale"] * inv                      # (n_mels,)
        b = p["bias"] - s["mean"] * a
    else:  # GlobalNormer(-10, 20, fac=2): (m + 10) / 40
        a = jnp.full((F,), 1.0 / 40.0, dtype)
        b = jnp.full((F,), 0.25, dtype)
    K = params["patch_embed"]["kernel"].reshape(ps, ps, -1)  # (mel_p, time_p, D)
    a4 = a.reshape(fg, ps)                         # per-f-patch mel scales
    b4 = b.reshape(fg, ps)
    Kf = a4[:, :, None, None] * K[None]            # (fg, mel_p, time_p, D)
    bias_f = jnp.einsum("fu,uvd->fd", b4, K) + params["patch_embed"]["bias"]
    return Kf, bias_f


def patch_embed_tfb(cfg: UITConfig, params, state, x):
    """(T, n_mels, B) CLAMPED log-mel dB -> (B, fg, tg, D) tokens.

    Same init_bn-into-matmul fold as patch_embed_btf, consuming the
    TRANSPOSED Pallas kernel's (frames, mels, batch) output directly —
    between the framing gather and the encoder nothing is ever
    re-laid-out (the gather's natural output feeds the kernel, the
    kernel's output feeds this einsum; measured -0.97 ms/batch frontend
    device time vs btf at B=2048). Serving/eval only.
    """
    T, F, B = x.shape
    ps = cfg.patch_size
    fg, tg = F // ps, T // ps
    if tg < 1:
        raise ValueError(
            f"input has {T} mel frames but one {ps}x{ps} patch needs at least {ps}"
        )
    x = x[: tg * ps, : fg * ps, :]
    Kf, bias_f = _folded_patch_kernel(cfg, params, state, F, fg, x.dtype)
    # x5[t, v(time-in-patch), f, u(mel-in-patch), b]
    x5 = x.reshape(tg, ps, fg, ps, B)
    tokens = jnp.einsum("tvfub,fuvd->bftd", x5, Kf)
    return tokens + bias_f[None, :, None]          # (B, fg, tg, D)


def patch_embed_tfb_train(cfg: UITConfig, p, x):
    """(T, n_mels, B) NORMALIZED mel -> (B, fg, tg, D) tokens — the
    UNfolded tfb patch embed for training: init_bn ran in train mode on
    the mel already (live batch stats — the inference-affine fold of
    patch_embed_tfb does not apply), so this is the plain linear patch
    embed consuming the transposed layout directly. Same kernel
    flattening contract as patch_embed (u = mel-in-patch major)."""
    T, F, B = x.shape
    ps = cfg.patch_size
    fg, tg = F // ps, T // ps
    if tg < 1:
        raise ValueError(
            f"input has {T} mel frames but one {ps}x{ps} patch needs at least {ps}"
        )
    x = x[: tg * ps, : fg * ps, :]
    K = p["kernel"].reshape(ps, ps, -1)            # (mel_p u, time_p v, D)
    x5 = x.reshape(tg, ps, fg, ps, B)              # [t, v, f, u, b]
    tokens = jnp.einsum("tvfub,uvd->bftd", x5, K)
    return tokens + p["bias"][None, None, None]    # (B, fg, tg, D)


def chunk_long_mel_tfb(cfg: UITConfig, mel):
    """(T>target, F, B) -> (target, F, n_crops*B): the eval crop rule on
    the transposed layout — windows slice the MAJOR (frame) axis and
    stack along batch (crop-major: column c*B+b is crop c of sample b),
    so the reduce is a reshape(n_crops, B, ...) over axis 0."""
    T, F, B = mel.shape
    L = cfg.target_length
    starts = _window_starts(T, L)
    crops = jnp.concatenate(
        [jax.lax.slice_in_dim(mel, s, s + L, axis=0) for s in starts], axis=-1
    )
    return crops, len(starts)


def forward_features(cfg: UITConfig, params, mel, *, train=False, rng=None,
                     token_mask=None):
    """(B, n_mels, T<=target_length) normalized mel -> (B, N, D) encoded tokens."""
    x = patch_embed(cfg, params["patch_embed"], mel)  # (B, fg, tg', D)
    return _finish_features(cfg, params, x, train=train, rng=rng,
                            token_mask=token_mask)


def _prepare_tokens(cfg: UITConfig, params, x, *, train=False, rng=None,
                    token_mask=None):
    """(B, fg, tg, D) patch tokens -> (B, N, D) block-ready token sequence
    (pos embeds, patch dropout, flatten f-major, cls token, input dropout,
    compute-dtype cast). Returns (x, token_mask, rng) — the pre-block half
    of _finish_features, split out so parallel/pp.py can pipeline the
    block stack separately."""
    if token_mask is not None and (
        cfg.time_patch_out is not None or cfg.freq_patch_out is not None
    ) and train:
        raise ValueError(
            "use_length_mask is incompatible with time/freq_patch_out during "
            "training: patch dropout changes the token count after the mask "
            "is built — disable one of the two"
        )
    tg = x.shape[2]
    if tg > params["time_pos_embed"].shape[0]:
        raise ValueError(
            f"input spans {tg} time patches but target_length="
            f"{cfg.target_length} provides only "
            f"{params['time_pos_embed'].shape[0]} positional embeddings; in "
            "training, crop clips (chunk_length) or raise target_length — "
            "long-clip windowing only applies at eval"
        )
    x = x + params["time_pos_embed"][None, None, :tg, :]
    x = x + params["freq_pos_embed"][None, :, None, :]
    if train and cfg.time_patch_out is not None:
        rng, r = jax.random.split(rng)
        x = _drop_patches(r, x, axis=2, frac=cfg.time_patch_out)
    if train and cfg.freq_patch_out is not None:
        rng, r = jax.random.split(rng)
        x = _drop_patches(r, x, axis=1, frac=cfg.freq_patch_out)
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.embed_dim)  # 'b f t c -> b (f t) c' ordering
    if cfg.pooling == "token":
        cls = jnp.broadcast_to(
            params["cls_token"] + params["token_pos_embed"], (B, 1, cfg.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        if token_mask is not None:
            token_mask = jnp.concatenate(
                [jnp.ones((B, 1), dtype=bool), token_mask], axis=1
            )
    if train and cfg.drop_rate > 0.0:
        rng, r = jax.random.split(rng)
        x = dropout(r, x, cfg.drop_rate, deterministic=False)

    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cdt != jnp.float32:
        x = x.astype(cdt)
    return x, token_mask, rng


def block_forward(cfg: UITConfig, blk, x, *, dpr_i=0.0, rngs=None,
                  train=False, token_mask=None, mlp_fn=None):
    """One pre-LN transformer block (attention + MLP, LayerScale,
    DropPath): (B, N, D) -> (B, N, D). The loop body of _finish_features;
    also the scan body parallel/pp.py pipelines over stacked block params.
    ``rngs`` = (attn, mlp, drop_path1, drop_path2) keys or None (eval).

    ``mlp_fn``: optional MLP replacement hook ``(blk, h) -> (h, aux)``
    (models/moe.py routes experts through it) — keeps every variant on
    THIS block's casting/DropPath/LayerScale math instead of a drifting
    copy. With mlp_fn the return value is ``(tokens, aux)``."""
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    cast = (lambda t: jax.tree.map(lambda a: a.astype(cdt), t)) if cdt != jnp.float32 else (lambda t: t)
    r_attn, r_mlp, r_dp1, r_dp2 = rngs if rngs is not None else (None,) * 4
    # LayerNorm in f32 for stability; matmuls in compute_dtype
    h = layer_norm(blk["norm1"], x.astype(jnp.float32), eps=1e-6).astype(cdt)
    h = multihead_attention(
        cast(blk["attn"]), h,
        num_heads=cfg.num_heads, scale=cfg.attn_scale,
        inner_dim=cfg.inner_dim, causal=cfg.causal, key_mask=token_mask,
        attn_drop=cfg.attn_drop_rate, proj_drop=cfg.drop_rate,
        rng=r_attn, deterministic=not train,
    )
    if "ls1" in blk:
        h = h * blk["ls1"]["gamma"].astype(cdt)
    x = x + drop_path(r_dp1, h, dpr_i, deterministic=not train)
    h = layer_norm(blk["norm2"], x.astype(jnp.float32), eps=1e-6).astype(cdt)
    aux = None
    if mlp_fn is not None:
        h, aux = mlp_fn(blk, h)
        h = h.astype(cdt)
    else:
        h = mlp(cast(blk["mlp"]), h,
                act=cfg.act, drop=cfg.drop_rate, rng=r_mlp,
                deterministic=not train)
    if "ls2" in blk:
        h = h * blk["ls2"]["gamma"].astype(cdt)
    out = x + drop_path(r_dp2, h, dpr_i, deterministic=not train)
    return out if mlp_fn is None else (out, aux)


def _finish_features(cfg: UITConfig, params, x, *, train=False, rng=None,
                     token_mask=None):
    """(B, fg, tg, D) patch tokens -> (B, N, D) encoded tokens (pos embeds,
    patch dropout, flatten f-major, cls token, transformer blocks, norm)."""
    x, token_mask, rng = _prepare_tokens(cfg, params, x, train=train,
                                         rng=rng, token_mask=token_mask)
    dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
    for i, blk in enumerate(params["blocks"]):
        if rng is not None:
            rng, r_attn, r_mlp, r_dp1, r_dp2 = jax.random.split(rng, 5)
            rngs = (r_attn, r_mlp, r_dp1, r_dp2)
        else:
            rngs = None
        x = block_forward(cfg, blk, x, dpr_i=float(dpr[i]), rngs=rngs,
                          train=train, token_mask=token_mask)
    return layer_norm(params["norm"], x.astype(jnp.float32), eps=1e-6)


def forward_head(cfg: UITConfig, params, x, token_mask=None):
    """(B, N, D) tokens -> (B, outputdim) sigmoid probabilities."""

    def head(t):
        # output head LN uses torch default eps=1e-5 (uit.py:358-360)
        return jax.nn.sigmoid(
            linear(params["head"], layer_norm(params["head_norm"], t, eps=1e-5))
        )

    if cfg.pooling == "token":
        return head(x[:, 0])
    if cfg.pooling == "mean":
        if token_mask is not None:
            w = token_mask.astype(x.dtype)[:, :, None]
            pooled = (x * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
            return head(pooled)
        return head(x.mean(axis=1))
    # 'dm': freq-mean -> per-timestep head+sigmoid -> time-mean
    fg = cfg.grid_size[0]
    B, N, D = x.shape
    x = x.reshape(B, fg, N // fg, D).mean(axis=1)  # (B, tg, D)
    probs_t = head(x)  # (B, tg, C)
    if token_mask is not None:
        # padded time patches must not dilute the time-mean (mask is
        # time-derived, so every freq patch of a time column agrees)
        tmask = token_mask.reshape(B, fg, N // fg)[:, 0, :]
        w = tmask.astype(probs_t.dtype)[:, :, None]
        return (probs_t * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
    return probs_t.mean(axis=1)


def encode_window(cfg: UITConfig, params, state, mel, *, train=False, rng=None):
    """Normalized-input core: (B, n_mels, T) mel-dB -> (B, outputdim) probs.

    Applies init_bn (inference stats) then features+head. This is THE hot
    jit/vmap unit for serving.
    """
    x = apply_init_bn(cfg, params, state, mel)
    feats = forward_features(cfg, params, x, train=train, rng=rng)
    return forward_head(cfg, params, feats)


def apply_init_bn(cfg, params, state, mel):
    if not cfg.init_bn:
        # reference GlobalNormer(-10, 20, fac=2): (x+10)/40 (uit.py:33-41)
        return (mel + 10.0) / 40.0
    return batch_norm_inference(params["init_bn"], state["init_bn"], mel, axis=-2)


def _window_starts(T: int, L: int) -> list[int]:
    """Crop-window start frames: full windows tile from t=0; a short tail
    is REPLACED by the last full window (reference uit.py:474-480)."""
    n_crops = -(-T // L)
    starts = [i * L for i in range(n_crops)]
    if T % L != 0:
        starts[-1] = T - L
    return starts


def chunk_long_mel(cfg: UITConfig, mel):
    """(B, F, T>target) -> (B*n_crops, F, target): the eval crop rule.
    Static shapes."""
    B, F, T = mel.shape
    L = cfg.target_length
    starts = _window_starts(T, L)
    crops = jnp.stack([jax.lax.slice_in_dim(mel, s, s + L, axis=-1) for s in starts], axis=1)
    return crops.reshape(B * len(starts), F, L), len(starts)


def chunk_long_mel_btf(cfg: UITConfig, mel):
    """(B, T>target, F) -> (B*n_crops, target, F): same crop rule as
    chunk_long_mel (tail replaced by the last full window) on the
    time-major layout — slices ride the sublane axis, no transposes."""
    B, T, F = mel.shape
    L = cfg.target_length
    starts = _window_starts(T, L)  # the ONE copy of the tail-window rule
    crops = jnp.stack(
        [jax.lax.slice_in_dim(mel, s, s + L, axis=1) for s in starts], axis=1
    )
    return crops.reshape(B * len(starts), L, F), len(starts)


def forward(cfg: UITConfig, params, state, wav, *, train=False, rng=None,
            mixup_lamb=None, wav_augment=None, spec_augment=None,
            lengths=None, frontend_fn: Optional[Callable] = None):
    """Full reference-equivalent forward: (B, T_wav) waveform -> (B, outputdim).

    In training mode returns (probs, new_state) with updated BN statistics.
    `frontend_fn` lets callers swap in the fused Pallas mel kernel.
    With cfg.use_length_mask and `lengths` (samples per clip), padded-region
    patches are excluded from attention and pooling (single-window 'bft'
    path only — the serving layouts and the long-clip crop path raise
    rather than silently ignore the lengths).
    """
    if cfg.use_length_mask and lengths is not None \
            and cfg.mel_layout != "bft":
        raise ValueError(
            f"use_length_mask is only implemented on the canonical 'bft' "
            f"layout; the {cfg.mel_layout!r} serving layout would silently "
            f"score padding as audio — drop lengths or use 'bft'"
        )
    if cfg.mel_layout == "tfb":
        # fastest serving AND training path: (T, F, B) mel straight from
        # the TRANSPOSED Pallas kernel (the framing gather's native
        # layout — no relayout copies anywhere). Eval folds init_bn into
        # the patch embed; training cannot (live batch stats), so the
        # train branch runs BN in train mode on the tfb mel and the
        # UNfolded patch_embed_tfb_train — the 0.66 ms/step frames
        # relayout copy of the 'bft' row kernel still disappears
        # (PERF_NOTES round 4; pinned == the bft step in
        # tests/test_tfb_train.py).
        if frontend_fn is None:  # raise, not assert: survive python -O
            raise ValueError(
                "mel_layout='tfb' needs a frontend_fn built with "
                "make_frontend_fn(..., layout='tfb')"
            )
        if train:
            if wav.dtype == jnp.int16 and wav_augment is not None:
                # int16 PCM trains bitwise-identically to f32/32768 (the
                # frontends fold the scale — ops/pallas_mel.py:231-236)
                # and halves the framing gather's HBM traffic; only wav
                # augments need the normalized-f32 convention (the step's
                # _step_wav restores it when any augment is configured)
                raise ValueError(
                    "wav augments expect normalized float32 waveforms; "
                    "train int16 PCM only with wavtransforms: []")
            if spec_augment is not None and (
                    getattr(spec_augment, "layout", "bft") != "tfb"):
                raise ValueError(
                    "mel_layout='tfb' training needs spec transforms built "
                    "with parse_spectransforms(..., layout='tfb') — a "
                    "'bft'-layout augment would mask the wrong axes"
                )
            if wav_augment is not None:
                rng, r = jax.random.split(rng)
                wav = wav_augment(r, wav)
            mel = frontend_fn(wav)  # (T, F, B)
            if mixup_lamb is not None:
                from ..augment.mixup import mixup_tensor
                mel = mixup_tensor(mel, mixup_lamb, batch_axis=-1)
            if spec_augment is not None:
                rng, r = jax.random.split(rng)
                mel = spec_augment(r, mel)
            new_state = state
            if cfg.init_bn:
                x, bn_state = batch_norm_train(
                    params["init_bn"], state["init_bn"], mel, axis=1,
                    momentum=0.01,
                )
                new_state = dict(state, init_bn=bn_state)
            else:
                x = (mel + 10.0) / 40.0
            if rng is not None:  # same rng=None tolerance as the bft path
                rng, r = jax.random.split(rng)
            else:
                r = None
            feats = _finish_features(
                cfg, params, patch_embed_tfb_train(cfg, params["patch_embed"], x),
                train=True, rng=r,
            )
            return forward_head(cfg, params, feats), new_state
        mel = frontend_fn(wav)  # (T, F, B)
        T = mel.shape[0]
        if T > cfg.target_length:
            crops, n_crops = chunk_long_mel_tfb(cfg, mel)
            feats = _finish_features(
                cfg, params, patch_embed_tfb(cfg, params, state, crops)
            )
            probs = forward_head(cfg, params, feats)
            probs = probs.reshape(n_crops, -1, cfg.outputdim)  # crop-major
            return probs.mean(axis=0) if cfg.eval_avg == "mean" else probs.max(axis=0)
        feats = _finish_features(
            cfg, params, patch_embed_tfb(cfg, params, state, mel)
        )
        return forward_head(cfg, params, feats)

    if cfg.mel_layout == "btf":
        # serving fast path: (B, T, F) mel straight from the Pallas kernel,
        # init_bn folded into the patch-embed matmul (patch_embed_btf)
        if train:
            raise ValueError(
                "mel_layout='btf' is an eval/serving optimization; train "
                "with the default 'bft' layout (BN stat updates cannot be "
                "folded into the patch embed)"
            )
        if frontend_fn is None:  # raise, not assert: survive python -O
            raise ValueError(
                "mel_layout='btf' needs a frontend_fn built with "
                "make_frontend_fn(..., layout='btf')"
            )
        mel = frontend_fn(wav)  # (B, T, F)
        T = mel.shape[1]
        if T > cfg.target_length:
            crops, n_crops = chunk_long_mel_btf(cfg, mel)
            feats = _finish_features(
                cfg, params, patch_embed_btf(cfg, params, state, crops)
            )
            probs = forward_head(cfg, params, feats)
            probs = probs.reshape(-1, n_crops, cfg.outputdim)
            return probs.mean(axis=1) if cfg.eval_avg == "mean" else probs.max(axis=1)
        feats = _finish_features(
            cfg, params, patch_embed_btf(cfg, params, state, mel)
        )
        return forward_head(cfg, params, feats)

    if train and wav.dtype == jnp.int16 and wav_augment is not None:
        # int16 PCM trains bitwise-identically to f32/32768 (every
        # frontend folds the 1/32768 scale exactly) and halves the framing
        # gather's HBM traffic; only wav augments assume normalized f32
        # (mixup is mel-domain here), so the guard fires just for them
        raise ValueError(
            "wav augments expect normalized float32 waveforms; "
            "train int16 PCM only with wavtransforms: []")
    if frontend_fn is None:
        frontend_fn = lambda w: log_mel_spectrogram(w, cfg.frontend)
    if train and wav_augment is not None:
        rng, r = jax.random.split(rng)
        wav = wav_augment(r, wav)
    mel = frontend_fn(wav)  # (B, n_mels, T)
    if train and mixup_lamb is not None:
        from ..augment.mixup import mixup_tensor
        mel = mixup_tensor(mel, mixup_lamb)
    if train and spec_augment is not None:
        # symmetric to the tfb branch's guard: a 'tfb'-layout augment on a
        # (B, F, T) mel broadcasts without error but masks the wrong axes
        if getattr(spec_augment, "layout", "bft") != "bft":
            raise ValueError(
                f"mel_layout='bft' training needs spec transforms built "
                f"with parse_spectransforms(..., layout='bft'); got "
                f"layout={getattr(spec_augment, 'layout', None)!r}"
            )
        rng, r = jax.random.split(rng)
        mel = spec_augment(r, mel)

    new_state = state
    if cfg.init_bn:
        if train:
            x, bn_state = batch_norm_train(
                params["init_bn"], state["init_bn"], mel, axis=-2, momentum=0.01
            )
            new_state = dict(state, init_bn=bn_state)
        else:
            x = batch_norm_inference(params["init_bn"], state["init_bn"], mel, axis=-2)
    else:
        x = (mel + 10.0) / 40.0

    T = x.shape[-1]
    if (not train) and T > cfg.target_length:
        if cfg.use_length_mask and lengths is not None:
            raise ValueError(
                "use_length_mask is not supported on the long-clip crop "
                "path (per-window masks are not built) — score windows "
                "upstream or drop lengths; silently ignoring them would "
                "average padded windows into the clip score"
            )
        crops, n_crops = chunk_long_mel(cfg, x)
        feats = forward_features(cfg, params, crops, train=False)
        probs = forward_head(cfg, params, feats)
        probs = probs.reshape(-1, n_crops, cfg.outputdim)
        probs = probs.mean(axis=1) if cfg.eval_avg == "mean" else probs.max(axis=1)
    else:
        if rng is not None:
            rng, r = jax.random.split(rng)
        else:
            r = None
        token_mask = None
        if cfg.use_length_mask and lengths is not None:
            if train and mixup_lamb is not None:
                raise ValueError(
                    "use_length_mask is incompatible with mixup: the mask "
                    "is built from the PRIMARY clip's length, but mixup "
                    "mixes in a partner whose audio (and labels) extend "
                    "past it — the model would be supervised on labels "
                    "whose acoustic evidence was masked out"
                )
            tg = min(x.shape[-1], cfg.target_length) // cfg.patch_stride
            token_mask = token_validity_mask(cfg, jnp.asarray(lengths), tg)
        feats = forward_features(cfg, params, x, train=train, rng=r,
                                 token_mask=token_mask)
        probs = forward_head(cfg, params, feats, token_mask=token_mask)
    if train:
        return probs, new_state
    return probs


def forward_framewise(cfg: UITConfig, params, state, wav, *,
                      frontend_fn: Optional[Callable] = None):
    """Eval-only TEMPORAL tagging: (B, T_wav) wav -> (probs, times).

    Returns per-segment probabilities with their time extents instead of
    one clip-level score — the capability the reference leaves dormant
    (its dm head computes per-timestep probabilities, uit.py:405-412, but
    only ever exposes their mean; its chunked dataset reads 'from'/'to'
    intervals that run.py never consumes).

    Segmentation by pooling mode:
    - 'dm': one segment per TIME PATCH (`patch_stride` mel frames =
      patch_stride*hop/sr seconds, 0.16 s at defaults) — the dm head's
      per-timestep sigmoid before the time mean;
    - 'mean'/'token': one segment per crop WINDOW (`target_length`
      frames, ~1.02 s) — the same windows long-clip eval scores.

    Returns (probs (B, S, outputdim) jax, times (S, 2) numpy seconds
    [start, end); the tail window overlaps the previous one exactly as
    the crop rule dictates). Mean over S reproduces forward()'s
    eval_avg='mean' output.
    """
    if frontend_fn is None:
        frontend_fn = lambda w: log_mel_spectrogram(w, cfg.frontend)
    assert cfg.mel_layout == "bft", "framewise tagging uses the bft layout"
    mel = frontend_fn(wav)
    x = apply_init_bn(cfg, params, state, mel)
    B, F, T = x.shape
    L = min(cfg.target_length, T)
    starts = _window_starts(T, L)
    n = len(starts)
    crops = jnp.stack(
        [jax.lax.slice_in_dim(x, s, s + L, axis=-1) for s in starts], axis=1
    ).reshape(B * n, F, L)
    feats = forward_features(cfg, params, crops, train=False)  # (B*n, N, D)
    times = framewise_times(cfg, T)

    if cfg.pooling == "dm":
        probs = forward_head_framewise(cfg, params, feats)
        return probs.reshape(B, -1, cfg.outputdim), times

    probs = forward_head(cfg, params, feats).reshape(B, n, cfg.outputdim)
    return probs, times


def framewise_times(cfg: UITConfig, n_frames: int) -> np.ndarray:
    """Segment extents (S, 2) float64 seconds for a `n_frames`-frame mel —
    the HOST-side companion of forward_framewise (whose probs output has
    exactly these S rows). Kept out of jit on purpose: returning it
    through a jitted call would downcast the float64 boundaries to f32
    and perturb min_overlap rasterization at exact-coverage edges."""
    sec_per_frame = cfg.frontend.hop_length / cfg.frontend.sample_rate
    L = min(cfg.target_length, n_frames)
    starts = _window_starts(n_frames, L)
    if cfg.pooling == "dm":
        tg = L // cfg.patch_stride  # time patches per crop window
        return np.array(
            [
                [
                    (s + j * cfg.patch_stride) * sec_per_frame,
                    (s + (j + 1) * cfg.patch_stride) * sec_per_frame,
                ]
                for s in starts
                for j in range(tg)
            ],
            dtype=np.float64,
        )
    return np.array(
        [[s * sec_per_frame, (s + L) * sec_per_frame] for s in starts],
        dtype=np.float64,
    )


def forward_head_framewise(cfg: UITConfig, params, x):
    """(B, N, D) tokens -> (B, tg, outputdim) per-time-patch probabilities.

    The dm head's per-timestep sigmoid BEFORE its time mean (reference
    uit.py:405-412 computes exactly this and immediately averages it
    away). Requires pooling='dm'; `probs.mean(axis=1)` reproduces
    forward_head's output exactly."""
    assert cfg.pooling == "dm", "framewise training needs the 'dm' head"
    fg = cfg.grid_size[0]
    B, N, D = x.shape
    h = x.reshape(B, fg, N // fg, D).mean(axis=1)  # (B, tg, D)
    return jax.nn.sigmoid(
        linear(params["head"], layer_norm(params["head_norm"], h, eps=1e-5))
    )


def forward_train_framewise(cfg: UITConfig, params, state, wav, *, rng,
                            wav_augment=None, spec_augment=None,
                            frontend_fn: Optional[Callable] = None):
    """TRAIN-mode framewise forward for SED: (B, T_wav) single-window
    waveforms -> ((B, tg, outputdim) per-segment probs, new_state).

    Mirrors forward()'s train path (wav augments -> mel -> spec augments
    -> init_bn with batch-stat updates -> features with droppath/dropout)
    but keeps the dm head's per-time-patch probabilities so a strong-label
    loss can supervise localization directly — the training-side
    counterpart of forward_framewise (eval). Segment extent is
    patch_stride*hop/sr seconds (0.16 s at defaults); mixup is
    unsupported (it has no per-segment target semantics), and wav_augment
    must be TIME-PRESERVING (a Shift would move the audio away from the
    fixed per-segment targets)."""
    assert cfg.mel_layout == "bft", "train uses the reference bft layout"
    if wav.dtype == jnp.int16 and wav_augment is not None:
        # same policy as forward(): int16 PCM is bitwise via the frontend
        # fold; only wav augments need the normalized-f32 convention
        raise ValueError(
            "wav augments expect normalized float32 waveforms; "
            "train int16 PCM only with wavtransforms: []")
    if frontend_fn is None:
        frontend_fn = lambda w: log_mel_spectrogram(w, cfg.frontend)
    if wav_augment is not None:
        rng, r = jax.random.split(rng)
        wav = wav_augment(r, wav)
    mel = frontend_fn(wav)  # (B, n_mels, T)
    if spec_augment is not None:
        rng, r = jax.random.split(rng)
        mel = spec_augment(r, mel)
    new_state = state
    if cfg.init_bn:
        x, bn_state = batch_norm_train(
            params["init_bn"], state["init_bn"], mel, axis=-2, momentum=0.01
        )
        new_state = dict(state, init_bn=bn_state)
    else:
        x = (mel + 10.0) / 40.0
    assert x.shape[-1] <= cfg.target_length, (
        "framewise training takes pre-cropped single-window clips"
    )
    rng, r = jax.random.split(rng)
    feats = forward_features(cfg, params, x, train=True, rng=r)
    return forward_head_framewise(cfg, params, feats), new_state


# ------------------------------------------------------------------ factories

def _factory(name: str, **base):
    def make(**overrides) -> UITConfig:
        kw = dict(base)
        kw.update(overrides)
        return UITConfig(**kw)

    make.__name__ = name
    return make


# Reference factory configs (uit.py:514-635). All: D=128, 2 heads, mlp x3,
# mean pooling, init_bn, patch 16/16.
_H128 = dict(patch_size=16, embed_dim=128, num_heads=2, mlp_ratio=3.0,
             pooling="mean", init_bn=True, drop_path_rate=0.0)

uit_xs = _factory("uit_xs", depth=12, act="relu", attention_type="BNeckAttention", **_H128)
uit_xxs = _factory("uit_xxs", depth=6, act="relu", attention_type="BNeckAttention", **_H128)
uit_xxxs = _factory("uit_xxxs", depth=4, act="relu", attention_type="BNeckAttention", **_H128)
audio_transformer_h128_d4_m3 = _factory("audio_transformer_h128_d4_m3", depth=4, **_H128)
audio_transformer_h128_d4_m3_relu = _factory(
    "audio_transformer_h128_d4_m3_relu", depth=4, act="relu", **_H128)
audio_transformer_h128_d6_m3 = _factory("audio_transformer_h128_d6_m3", depth=6, **_H128)
audio_transformer_h128_d6_m3_relu = _factory(
    "audio_transformer_h128_d6_m3_relu", depth=6, act="relu", **_H128)
# NOTE: the reference also declares audio_transformer_h128_d3_m3_bneck_v2_relu
# referencing an undefined BNeckAttentionV2 class (uit.py:496-512 vs :224) —
# it crashes if used; intentionally not reproduced.

# name -> (factory, kwargs, upstream checkpoint URL) (reference uit.py:639-655)
PRETRAINED_CHECKPOINTS = {
    "uit_xs": {
        "factory": uit_xs,
        "model_kwargs": dict(outputdim=537, target_length=102),
        "url": "https://zenodo.org/record/7690036/files/uit_xs_mAP3409.pt?download=1",
    },
    "uit_xxs": {
        "factory": uit_xxs,
        "model_kwargs": dict(outputdim=537, target_length=102),
        "url": "https://zenodo.org/record/7690036/files/uit_xxs_mAP3221.pt?download=1",
    },
    "uit_xxxs": {
        "factory": uit_xxxs,
        "model_kwargs": dict(outputdim=537, target_length=102),
        "url": "https://zenodo.org/record/7690036/files/uit_xxxs_mAP3097.pt?download=1",
    },
}
