"""Model registry: explicit name -> factory mapping.

Replaces the reference's reflection-based ``getattr(models, name)`` /
``globals()[name]`` lookups (reference run.py:127, uit.py:224) with an
explicit registry. Factories return immutable config dataclasses; build
(params, state) with `build(cfg, rng)`.
"""

from . import uit, mobilenetv2, moe
from .moe import MoEUITConfig, uit_xs_moe
from .uit import (
    UITConfig,
    PRETRAINED_CHECKPOINTS,
    uit_xs,
    uit_xxs,
    uit_xxxs,
    audio_transformer_h128_d4_m3,
    audio_transformer_h128_d4_m3_relu,
    audio_transformer_h128_d6_m3,
    audio_transformer_h128_d6_m3_relu,
)
from .mobilenetv2 import MobileNetV2, MobileNetV2Config

MODEL_REGISTRY = {
    "uit_xs": uit_xs,
    "uit_xxs": uit_xxs,
    "uit_xxxs": uit_xxxs,
    "audio_transformer_h128_d4_m3": audio_transformer_h128_d4_m3,
    "audio_transformer_h128_d4_m3_relu": audio_transformer_h128_d4_m3_relu,
    "audio_transformer_h128_d6_m3": audio_transformer_h128_d6_m3,
    "audio_transformer_h128_d6_m3_relu": audio_transformer_h128_d6_m3_relu,
    "MobileNetV2": MobileNetV2,
    "uit_xs_moe": uit_xs_moe,
}


def get_model_config(name: str, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


def build(cfg, rng):
    """(params, state) for any model config."""
    if isinstance(cfg, UITConfig):
        return uit.init(cfg, rng)
    if isinstance(cfg, MobileNetV2Config):
        return mobilenetv2.init(cfg, rng)
    if isinstance(cfg, MoEUITConfig):
        return moe.init(cfg, rng)
    raise TypeError(f"unknown config type {type(cfg)}")


def apply(cfg, params, state, wav, **kwargs):
    """Dispatch forward for any model config."""
    if isinstance(cfg, UITConfig):
        return uit.forward(cfg, params, state, wav, **kwargs)
    if isinstance(cfg, MobileNetV2Config):
        return mobilenetv2.forward(cfg, params, state, wav, **kwargs)
    if isinstance(cfg, MoEUITConfig):
        return moe.forward(cfg, params, state, wav, **kwargs)
    raise TypeError(f"unknown config type {type(cfg)}")


def apply_framewise(cfg, params, state, wav, **kwargs):
    """Dispatch temporal tagging: -> (probs (B, S, C), times (S, 2) s)."""
    if isinstance(cfg, UITConfig):
        return uit.forward_framewise(cfg, params, state, wav, **kwargs)
    if isinstance(cfg, MobileNetV2Config):
        return mobilenetv2.forward_framewise(cfg, params, state, wav, **kwargs)
    raise TypeError(f"unknown config type {type(cfg)}")


__all__ = [
    "MODEL_REGISTRY",
    "PRETRAINED_CHECKPOINTS",
    "get_model_config",
    "build",
    "apply",
    "apply_framewise",
    "UITConfig",
    "MobileNetV2Config",
    "MoEUITConfig",
]
