"""MobileNetV2 audio tagger (baseline + PSL distillation teacher).

TPU-native redesign of reference ``models/mobilenetv2.py``: same
architecture semantics (inverted-residual table mobilenetv2.py:101-110,
mel frontend :144-152, freq-average + per-timestep classifier + sigmoid +
time-mean "dm" head :165-178) expressed as functional pytrees with NHWC
convolutions (XLA/TPU-preferred layout) and explicit symmetric padding to
match torch's ``padding=(k-1)//2``.

The network is fully convolutional in time: long clips need no crop
chunking, a 10 s clip just yields a longer per-timestep score sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..frontend import FrontendConfig, log_mel_spectrogram
from .common import batch_norm_inference, batch_norm_train, linear

# (expand_ratio t, out_channels c, repeats n, stride s) — reference table
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


@dataclasses.dataclass(frozen=True)
class MobileNetV2Config:
    outputdim: int = 527
    width_mult: float = 1.0
    input_channel: int = 32
    last_channel: int = 1280
    dropout: float = 0.3
    n_mels: int = 64
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    # 'bfloat16' runs the conv stack's MXU work in bf16 (inputs/kernels
    # cast per conv, f32 accumulation via preferred_element_type; BN,
    # residual adds, classifier and sigmoid stay f32, master params stay
    # f32) — the same recipe as UITConfig.compute_dtype. Measured for the
    # PSL-teacher role where the 2.8 ms teacher forward is 26% of the
    # B=1024 train step (PERF_NOTES round 4); probs drift is bf16
    # input-rounding only (<=2e-3, pinned in tests/test_mobilenetv2.py).
    compute_dtype: str = "float32"


def _c(ch, width_mult):
    return int(ch * width_mult)


def layer_specs(cfg: MobileNetV2Config):
    """Describe the features stack. Each entry is one torch `features[i]`:

    ('convbnrelu', c_in, c_out, k, stride, groups)
    ('invres', c_in, c_out, stride, expand_ratio)
    """
    specs = []
    in_ch = _c(cfg.input_channel, cfg.width_mult)
    specs.append(("convbnrelu", 1, in_ch, 3, 2, 1))
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        out_ch = _c(c, cfg.width_mult)
        for i in range(n):
            specs.append(("invres", in_ch, out_ch, s if i == 0 else 1, t))
            in_ch = out_ch
    last = _c(cfg.last_channel, cfg.width_mult) if cfg.width_mult > 1.0 else cfg.last_channel
    specs.append(("convbnrelu", in_ch, last, 1, 1, 1))
    return specs


# ----------------------------------------------------------------------- init

def _conv_bn_init(rng, c_in, c_out, k, groups=1):
    fan_in = c_in // groups * k * k
    bound = (1.0 / fan_in) ** 0.5
    kernel = jax.random.uniform(rng, (k, k, c_in // groups, c_out), minval=-bound, maxval=bound)
    return (
        {"conv": {"kernel": kernel}, "bn": {"scale": jnp.ones((c_out,)), "bias": jnp.zeros((c_out,))}},
        {"bn": {"mean": jnp.zeros((c_out,)), "var": jnp.ones((c_out,))}},
    )


def _invres_init(rng, c_in, c_out, expand_ratio):
    hidden = int(round(c_in * expand_ratio))
    keys = jax.random.split(rng, 3)
    layers_p, layers_s = [], []
    if expand_ratio != 1:
        p, s = _conv_bn_init(keys[0], c_in, hidden, 1)
        layers_p.append(p); layers_s.append(s)
    p, s = _conv_bn_init(keys[1], hidden, hidden, 3, groups=hidden)
    layers_p.append(p); layers_s.append(s)
    p, s = _conv_bn_init(keys[2], hidden, c_out, 1)
    layers_p.append(p); layers_s.append(s)
    return {"layers": layers_p}, {"layers": layers_s}


def init(cfg: MobileNetV2Config, rng):
    specs = layer_specs(cfg)
    keys = jax.random.split(rng, len(specs) + 1)
    feats_p, feats_s = [], []
    for key, spec in zip(keys[:-1], specs):
        if spec[0] == "convbnrelu":
            _, c_in, c_out, k, _, groups = spec
            p, s = _conv_bn_init(key, c_in, c_out, k, groups)
        else:
            _, c_in, c_out, _, t = spec
            p, s = _invres_init(key, c_in, c_out, t)
        feats_p.append(p); feats_s.append(s)
    last = specs[-1][2]
    kr, br = jax.random.split(keys[-1])
    bound = (1.0 / last) ** 0.5
    classifier = {
        "kernel": jax.random.uniform(kr, (last, cfg.outputdim), minval=-bound, maxval=bound),
        "bias": jax.random.uniform(br, (cfg.outputdim,), minval=-bound, maxval=bound),
    }
    return {"features": feats_p, "classifier": classifier}, {"features": feats_s}


# -------------------------------------------------------------------- forward

def _conv2d(x, kernel, stride, groups=1, compute_dtype="float32"):
    """NHWC conv with torch-style symmetric padding (k-1)//2.

    compute_dtype='bfloat16': operands cast to bf16 (the MXU's native
    input width), accumulation forced back to f32 — everything around
    the conv stays f32."""
    k = kernel.shape[0]
    pad = (k - 1) // 2
    if compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        kernel = kernel.astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def _conv_bn_relu6(p, s, x, stride, groups, *, train, momentum=0.1, relu=True,
                   compute_dtype="float32"):
    x = _conv2d(x, p["conv"]["kernel"], stride, groups,
                compute_dtype=compute_dtype)
    if train:
        x, new_bn = batch_norm_train(p["bn"], s["bn"], x, axis=-1, momentum=momentum)
        new_s = {"bn": new_bn}
    else:
        x = batch_norm_inference(p["bn"], s["bn"], x, axis=-1)
        new_s = s
    if relu:
        x = jnp.clip(x, 0.0, 6.0)
    return x, new_s


def _invres_forward(spec, p, s, x, *, train, compute_dtype="float32"):
    _, c_in, c_out, stride, t = spec
    hidden = int(round(c_in * t))
    use_res = stride == 1 and c_in == c_out
    layers = p["layers"]
    slayers = s["layers"]
    new_slayers = []
    h = x
    i = 0
    if t != 1:
        h, ns = _conv_bn_relu6(layers[i], slayers[i], h, 1, 1, train=train,
                               compute_dtype=compute_dtype)
        new_slayers.append(ns); i += 1
    h, ns = _conv_bn_relu6(layers[i], slayers[i], h, stride, hidden,
                           train=train, compute_dtype=compute_dtype)
    new_slayers.append(ns); i += 1
    h, ns = _conv_bn_relu6(layers[i], slayers[i], h, 1, 1, train=train,
                           relu=False, compute_dtype=compute_dtype)
    new_slayers.append(ns)
    out = x + h if use_res else h
    return out, {"layers": new_slayers}


def features_forward(cfg: MobileNetV2Config, params, state, mel, *, train=False):
    """(B, n_mels, T) log-mel -> (B, T', last_channel) freq-pooled features."""
    x = mel[..., None]  # NHWC: (B, F, T, 1)
    specs = layer_specs(cfg)
    dtype = getattr(cfg, "compute_dtype", "float32")
    new_feats = []
    for spec, p, s in zip(specs, params["features"], state["features"]):
        if spec[0] == "convbnrelu":
            _, _, _, k, stride, groups = spec
            x, ns = _conv_bn_relu6(p, s, x, stride, groups, train=train,
                                   compute_dtype=dtype)
        else:
            x, ns = _invres_forward(spec, p, s, x, train=train,
                                    compute_dtype=dtype)
        new_feats.append(ns)
    # AdaptiveAvgPool2d((1, None)): average the freq axis fully, keep time.
    x = x.mean(axis=1)  # (B, T', C)
    return x, {"features": new_feats}


def forward(cfg: MobileNetV2Config, params, state, wav, *, train=False, rng=None,
            wav_augment=None, spec_augment=None, mixup_lamb=None,
            frontend_fn=None):
    """(B, T_wav) waveform -> (B, outputdim) probs ('dm' head).

    Train mode returns (probs, new_state). Mixup is mel-domain with the
    same (lamb, reversed-batch) rule as uit.forward, so MobileNetV2
    trains through the same make_train_step the UiT students use (the
    reference only ever loads this net as a frozen teacher; here it is
    also a trainable AT baseline)."""
    if train and wav.dtype == jnp.int16 and wav_augment is not None:
        # same contract as uit.forward: int16 PCM trains bitwise-identically
        # to f32/32768 (the frontend folds the scale exactly); only wav
        # augments assume normalized f32 (an augment would promote int16 to
        # a 32768x-scaled float, silently skipping the normalization)
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
        rng, r = jax.random.split(rng)
        mel = spec_augment(r, mel)
    feats, new_state = features_forward(cfg, params, state, mel, train=train)
    if train and cfg.dropout > 0.0 and rng is not None:
        rng, r = jax.random.split(rng)
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(r, keep, feats.shape)
        feats = jnp.where(mask, feats / keep, 0.0)
    probs = jax.nn.sigmoid(linear(params["classifier"], feats))  # (B, T', out)
    probs = probs.mean(axis=1)
    if train:
        return probs, new_state
    return probs


def total_time_stride(cfg: MobileNetV2Config) -> int:
    """Cumulative time downsampling of the feature stack: the stem conv
    (stride 2) times every stride-2 inverted-residual stage — 32 for the
    standard table, computed from layer_specs so width variants stay
    correct."""
    stride = 1
    for spec in layer_specs(cfg):
        stride *= spec[4] if spec[0] == "convbnrelu" else spec[3]
    return stride


def forward_framewise(cfg: MobileNetV2Config, params, state, wav, *,
                      frontend_fn=None):
    """Eval-only temporal tagging: (B, T_wav) -> (probs (B, S, C),
    times (S, 2) seconds).

    The network is fully convolutional in time, so the per-timestep
    classifier probabilities (reference mobilenetv2.py:165-178 computes
    them but only exposes their mean) ARE the framewise output: one
    segment per feature timestep (total conv time stride = 32 mel frames
    for the standard table -> 32*hop/sr = 0.32 s at defaults; computed
    by total_time_stride)."""
    import numpy as np

    if frontend_fn is None:
        frontend_fn = lambda w: log_mel_spectrogram(w, cfg.frontend)
    mel = frontend_fn(wav)
    feats, _ = features_forward(cfg, params, state, mel, train=False)
    probs = jax.nn.sigmoid(linear(params["classifier"], feats))  # (B, S, C)
    stride_frames = total_time_stride(cfg)  # 32 for the standard table
    sec = stride_frames * cfg.frontend.hop_length / cfg.frontend.sample_rate
    S = probs.shape[1]
    times = np.array([[j * sec, (j + 1) * sec] for j in range(S)], dtype=np.float64)
    return probs, times


def MobileNetV2(**kwargs) -> MobileNetV2Config:
    """Factory mirroring the reference registry name."""
    return MobileNetV2Config(**kwargs)
