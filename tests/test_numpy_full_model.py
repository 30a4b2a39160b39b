"""Full-encoder composition check: an independent numpy implementation of
the whole mel->probs pipeline (written from the architecture spec, not
from the JAX code) must match models.uit exactly for all pooling modes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.frontend import FrontendConfig, log_mel_spectrogram
from uit_mobile_tpu.models import uit


def np_ln(x, s, b, eps):
    mu = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(v + eps) * s + b


def np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def np_full_model(cfg, params, state, mel):
    """(B, 64, T) log-mel -> (B, outputdim) probs, pure numpy."""
    p = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), params)
    st = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), state)
    x = np.asarray(mel, dtype=np.float64)

    # init_bn over the mel-bin axis
    bn = p["init_bn"], st["init_bn"]
    x = ((x - bn[1]["mean"][None, :, None])
         / np.sqrt(bn[1]["var"][None, :, None] + 1e-5)
         * bn[0]["scale"][None, :, None] + bn[0]["bias"][None, :, None])

    # 16x16 patches, row-major (freq, time) within the patch
    B, F, T = x.shape
    ps = cfg.patch_size
    fg, tg = F // ps, T // ps
    tokens = np.zeros((B, fg, tg, ps * ps))
    for f in range(fg):
        for t in range(tg):
            patch = x[:, f * ps:(f + 1) * ps, t * ps:(t + 1) * ps]
            tokens[:, f, t] = patch.reshape(B, ps * ps)
    tokens = tokens @ np.asarray(p["patch_embed"]["kernel"]) + p["patch_embed"]["bias"]
    tokens = tokens + p["time_pos_embed"][None, None, :tg]
    tokens = tokens + p["freq_pos_embed"][None, :, None]
    seq = tokens.reshape(B, fg * tg, cfg.embed_dim)  # (f t) order

    if cfg.pooling == "token":
        cls = (p["cls_token"] + p["token_pos_embed"][None]).reshape(1, 1, -1)
        seq = np.concatenate([np.broadcast_to(cls, (B, 1, cfg.embed_dim)), seq], 1)

    h_count = cfg.num_heads
    inner = cfg.inner_dim
    hd = inner // h_count
    scale = (cfg.embed_dim // cfg.num_heads) ** -0.5  # reference quirk
    act = (lambda v: np.maximum(v, 0)) if cfg.act == "relu" else None
    for blk in p["blocks"]:
        y = np_ln(seq, blk["norm1"]["scale"], blk["norm1"]["bias"], 1e-6)
        qkv = y @ blk["attn"]["qkv"]["kernel"]
        if "bias" in blk["attn"]["qkv"]:
            qkv = qkv + blk["attn"]["qkv"]["bias"]
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, h_count, hd)
        out = np.zeros((B, N, inner))
        for b in range(B):
            for h in range(h_count):
                q, k, v = qkv[b, :, 0, h], qkv[b, :, 1, h], qkv[b, :, 2, h]
                a = np_softmax(q @ k.T * scale)
                out[b, :, h * hd:(h + 1) * hd] = a @ v
        seq = seq + (out @ blk["attn"]["proj"]["kernel"] + blk["attn"]["proj"]["bias"])
        y = np_ln(seq, blk["norm2"]["scale"], blk["norm2"]["bias"], 1e-6)
        y = act(y @ blk["mlp"]["fc1"]["kernel"] + blk["mlp"]["fc1"]["bias"])
        seq = seq + (y @ blk["mlp"]["fc2"]["kernel"] + blk["mlp"]["fc2"]["bias"])

    seq = np_ln(seq, p["norm"]["scale"], p["norm"]["bias"], 1e-6)

    def head(t):
        t = np_ln(t, p["head_norm"]["scale"], p["head_norm"]["bias"], 1e-5)
        return 1.0 / (1.0 + np.exp(-(t @ p["head"]["kernel"] + p["head"]["bias"])))

    if cfg.pooling == "token":
        return head(seq[:, 0])
    if cfg.pooling == "mean":
        return head(seq.mean(1))
    # 'dm': unpack (f t), mean over freq, per-timestep head+sigmoid, mean time
    seq = seq.reshape(B, fg, tg, cfg.embed_dim).mean(1)
    return head(seq).mean(1)


@pytest.mark.parametrize("pooling", ["mean", "token", "dm"])
@pytest.mark.parametrize("attention_type", ["BNeckAttention", "Attention"])
def test_full_model_matches_numpy(pooling, attention_type):
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=37, target_length=102, depth=2,
        pooling=pooling, attention_type=attention_type,
    )
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    mel = log_mel_spectrogram(wav, cfg.frontend)
    x = uit.apply_init_bn(cfg, params, state, mel)
    feats = uit.forward_features(cfg, params, x)
    got = np.asarray(uit.forward_head(cfg, params, feats))
    want = np_full_model(cfg, params, state, np.asarray(mel))
    np.testing.assert_allclose(got, want, atol=3e-5)
