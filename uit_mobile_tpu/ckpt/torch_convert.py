"""One-time PyTorch -> JAX checkpoint conversion.

Maps the reference repo's state_dict naming (see reference uit.py: modules
front_end/init_bn/patch_embed/blocks.N.{norm1,attn,norm2,mlp}/norm/
outputlayer, and mobilenetv2.py: features.N.*) onto this package's pytrees.

Key transforms:
- torch ``Linear.weight`` (out, in)  -> kernel (in, out)  [transpose]
- torch ``Conv2d.weight`` (O, I, kh, kw) -> kernel (kh, kw, I, O); the UiT
  patch-embed conv additionally flattens (kh, kw) row-major to (kh*kw, O)
  to match the reshape+matmul patch embedding.
- ``time_pos_embed`` (1, D, 1, Tg) -> (Tg, D); ``freq_pos_embed``
  (1, D, Fg, 1) -> (Fg, D).
- ``front_end.*`` DSP buffers (mel filterbank, window) are regenerated from
  first principles — never loaded.
- BatchNorm running stats go to the separate `state` pytree.

Positional-embedding retargeting (reference uit.py:416-450): when the
checkpoint's time/freq grid differs from the target config, embeddings are
sliced (shrink) or bilinearly resized (grow) — `resize_pos_embed`.

Works on numpy arrays: torch is only needed to unpickle ``.pt`` files
(`load_torch_checkpoint`), keeping the runtime torch-free.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t(a):
    # np.array (copy), NOT np.asarray: state_dict() numpy arrays are VIEWS
    # of the live torch storage, and jnp.asarray on CPU can alias them
    # zero-copy — a later in-place torch op (e.g. a train-mode BN
    # running-stat update) would silently mutate the converted pytree.
    return np.array(a, dtype=np.float32, copy=True)


def load_torch_checkpoint(path) -> dict:
    """Unpickle a .pt checkpoint into {key: np.ndarray} (+ optional config).

    Accepts both raw state_dicts (zenodo dumps, reference inference.py:40)
    and trainer dumps ``{'model': sd, 'config': {...}}`` (run.py:340-344).
    """
    import torch  # local import: only needed for conversion, not serving

    dump = torch.load(path, map_location="cpu", weights_only=False)
    config = None
    if isinstance(dump, dict) and "model" in dump and isinstance(dump["model"], dict):
        config = dump.get("config")
        if config is not None and not isinstance(config, dict):
            # config wrappers expose either a `.dict` mapping attribute
            # (the reference's DictWrapper, utils.py:173-181) or a
            # pydantic-style `.dict()` METHOD — call it, don't return the
            # bound method
            config = getattr(config, "dict", None)
            if callable(config):
                config = config()
            if config is not None and not isinstance(config, dict):
                config = None
        dump = dump["model"]
    sd = {k: v.detach().cpu().numpy() for k, v in dump.items() if hasattr(v, "numpy")}
    return {"state_dict": sd, "config": config}


def resize_pos_embed(emb: np.ndarray, target_len: int) -> np.ndarray:
    """(L, D) -> (target_len, D): slice to shrink, bilinear to grow.

    Matches reference change_pos_embedding (uit.py:425-450): shrink = plain
    prefix slice; grow = align_corners=False bilinear interpolation along
    the length axis.
    """
    L, D = emb.shape
    if target_len <= L:
        return emb[:target_len]
    # torch bilinear (align_corners=False) on a (1, D, 1, L) image along L:
    scale = L / target_len
    out = np.empty((target_len, D), dtype=emb.dtype)
    for i in range(target_len):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), L - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, L - 1)
        w = src - lo
        out[i] = (1 - w) * emb[lo] + w * emb[hi]
    return out


def uit_params_from_torch_state_dict(sd: dict, cfg) -> tuple[dict, dict]:
    """Reference UITBase state_dict -> (params, state) for models.uit."""
    D = cfg.embed_dim
    ps = cfg.patch_size
    params: dict = {}
    state: dict = {}

    if "init_bn.1.weight" in sd:
        params["init_bn"] = {"scale": _t(sd["init_bn.1.weight"]), "bias": _t(sd["init_bn.1.bias"])}
        state["init_bn"] = {
            "mean": _t(sd["init_bn.1.running_mean"]),
            "var": _t(sd["init_bn.1.running_var"]),
        }

    w = _t(sd["patch_embed.proj.weight"])  # (D, 1, ps, ps)
    params["patch_embed"] = {
        "kernel": w.reshape(D, ps * ps).T.copy(),  # (ps*ps, D), row-major (kh, kw)
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = _t(sd["cls_token"])
    params["token_pos_embed"] = _t(sd["token_pos_embed"])
    tpe = _t(sd["time_pos_embed"])[0, :, 0, :].T  # (Tg, D)
    fpe = _t(sd["freq_pos_embed"])[0, :, :, 0].T  # (Fg, D)
    fg, tg = cfg.grid_size
    if tpe.shape[0] != tg:
        tpe = resize_pos_embed(tpe, tg)
    if fpe.shape[0] != fg:
        fpe = resize_pos_embed(fpe, fg)
    params["time_pos_embed"] = tpe
    params["freq_pos_embed"] = fpe

    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blk = {
            "norm1": {"scale": _t(sd[pre + "norm1.weight"]), "bias": _t(sd[pre + "norm1.bias"])},
            "attn": {
                "qkv": {"kernel": _t(sd[pre + "attn.qkv.weight"]).T.copy()},
                "proj": {
                    "kernel": _t(sd[pre + "attn.proj.weight"]).T.copy(),
                    "bias": _t(sd[pre + "attn.proj.bias"]),
                },
            },
            "norm2": {"scale": _t(sd[pre + "norm2.weight"]), "bias": _t(sd[pre + "norm2.bias"])},
            "mlp": {
                "fc1": {
                    "kernel": _t(sd[pre + "mlp.fc1.weight"]).T.copy(),
                    "bias": _t(sd[pre + "mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": _t(sd[pre + "mlp.fc2.weight"]).T.copy(),
                    "bias": _t(sd[pre + "mlp.fc2.bias"]),
                },
            },
        }
        if pre + "attn.qkv.bias" in sd:
            blk["attn"]["qkv"]["bias"] = _t(sd[pre + "attn.qkv.bias"])
        if pre + "ls1.gamma" in sd:
            blk["ls1"] = {"gamma": _t(sd[pre + "ls1.gamma"])}
            blk["ls2"] = {"gamma": _t(sd[pre + "ls2.gamma"])}
        blocks.append(blk)
    params["blocks"] = blocks
    params["norm"] = {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])}
    params["head_norm"] = {
        "scale": _t(sd["outputlayer.0.weight"]),
        "bias": _t(sd["outputlayer.0.bias"]),
    }
    params["head"] = {
        "kernel": _t(sd["outputlayer.1.weight"]).T.copy(),
        "bias": _t(sd["outputlayer.1.bias"]),
    }
    return _to_jnp(params), _to_jnp(state)


def uit_torch_state_dict_from_params(params: dict, state: dict, cfg) -> dict:
    """Inverse mapping: our pytrees -> reference-named torch-layout arrays.

    Used for exporting trained models back to the reference ecosystem and
    for round-trip testing of the converter.
    """
    ps = cfg.patch_size
    D = cfg.embed_dim
    sd: dict[str, np.ndarray] = {}
    if "init_bn" in params:
        sd["init_bn.1.weight"] = np.asarray(params["init_bn"]["scale"])
        sd["init_bn.1.bias"] = np.asarray(params["init_bn"]["bias"])
        sd["init_bn.1.running_mean"] = np.asarray(state["init_bn"]["mean"])
        sd["init_bn.1.running_var"] = np.asarray(state["init_bn"]["var"])
    sd["patch_embed.proj.weight"] = (
        np.asarray(params["patch_embed"]["kernel"]).T.reshape(D, 1, ps, ps)
    )
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["token_pos_embed"] = np.asarray(params["token_pos_embed"])
    sd["time_pos_embed"] = np.asarray(params["time_pos_embed"]).T[None, :, None, :]
    sd["freq_pos_embed"] = np.asarray(params["freq_pos_embed"]).T[None, :, :, None]
    for i, blk in enumerate(params["blocks"]):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        sd[pre + "norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        sd[pre + "attn.qkv.weight"] = np.asarray(blk["attn"]["qkv"]["kernel"]).T
        if "bias" in blk["attn"]["qkv"]:
            sd[pre + "attn.qkv.bias"] = np.asarray(blk["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
        sd[pre + "norm2.weight"] = np.asarray(blk["norm2"]["scale"])
        sd[pre + "norm2.bias"] = np.asarray(blk["norm2"]["bias"])
        sd[pre + "mlp.fc1.weight"] = np.asarray(blk["mlp"]["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = np.asarray(blk["mlp"]["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = np.asarray(blk["mlp"]["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = np.asarray(blk["mlp"]["fc2"]["bias"])
        if "ls1" in blk:
            sd[pre + "ls1.gamma"] = np.asarray(blk["ls1"]["gamma"])
            sd[pre + "ls2.gamma"] = np.asarray(blk["ls2"]["gamma"])
    sd["norm.weight"] = np.asarray(params["norm"]["scale"])
    sd["norm.bias"] = np.asarray(params["norm"]["bias"])
    sd["outputlayer.0.weight"] = np.asarray(params["head_norm"]["scale"])
    sd["outputlayer.0.bias"] = np.asarray(params["head_norm"]["bias"])
    sd["outputlayer.1.weight"] = np.asarray(params["head"]["kernel"]).T
    sd["outputlayer.1.bias"] = np.asarray(params["head"]["bias"])
    return sd


def mobilenetv2_params_from_torch_state_dict(sd: dict, cfg) -> tuple[dict, dict]:
    """Reference MobileNetV2 state_dict -> (params, state).

    The torch model is a flat ``features.N...`` Sequential
    (mobilenetv2.py:120-156): entry 0 and 18 are _ConvBNReLU
    (``features.N.{0,1}`` = conv, bn), entries 1..17 are _InvertedResidual
    with sub-stack ``features.N.conv.J`` where J is either a _ConvBNReLU
    (``.J.0/.J.1``) or the final plain conv + bn pair. Depthwise conv
    weights (O, 1, kh, kw) map to HWIO (kh, kw, 1, O).
    """
    from ..models.mobilenetv2 import layer_specs

    def conv_bn(conv_key, bn_key):
        w = _t(sd[conv_key])  # (O, I_per_group, kh, kw) -> (kh, kw, I, O)
        p = {
            "conv": {"kernel": w.transpose(2, 3, 1, 0).copy()},
            "bn": {"scale": _t(sd[bn_key + ".weight"]), "bias": _t(sd[bn_key + ".bias"])},
        }
        s = {"bn": {"mean": _t(sd[bn_key + ".running_mean"]),
                    "var": _t(sd[bn_key + ".running_var"])}}
        return p, s

    feats_p, feats_s = [], []
    for idx, spec in enumerate(layer_specs(cfg)):
        base = f"features.{idx}"
        if spec[0] == "convbnrelu":
            p, s = conv_bn(f"{base}.0.weight", f"{base}.1")
            feats_p.append(p); feats_s.append(s)
        else:
            _, c_in, c_out, stride, t = spec
            layers_p, layers_s = [], []
            j = 0
            if t != 1:  # pointwise expand _ConvBNReLU
                p, s = conv_bn(f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1")
                layers_p.append(p); layers_s.append(s); j += 1
            # depthwise _ConvBNReLU
            p, s = conv_bn(f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1")
            layers_p.append(p); layers_s.append(s); j += 1
            # pointwise-linear conv + bn (plain modules, not _ConvBNReLU)
            p, s = conv_bn(f"{base}.conv.{j}.weight", f"{base}.conv.{j + 1}")
            layers_p.append(p); layers_s.append(s)
            feats_p.append({"layers": layers_p}); feats_s.append({"layers": layers_s})

    params = {
        "features": feats_p,
        "classifier": {
            "kernel": _t(sd["classifier.1.weight"]).T.copy(),
            "bias": _t(sd["classifier.1.bias"]),
        },
    }
    return _to_jnp(params), _to_jnp({"features": feats_s})


def mobilenetv2_torch_state_dict_from_params(params: dict, state: dict, cfg) -> dict:
    """Inverse MobileNetV2 mapping: our pytrees -> reference torch naming."""
    from ..models.mobilenetv2 import layer_specs

    sd: dict[str, np.ndarray] = {}

    def put_conv_bn(p, s, conv_key, bn_key):
        sd[conv_key] = np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1)
        sd[bn_key + ".weight"] = np.asarray(p["bn"]["scale"])
        sd[bn_key + ".bias"] = np.asarray(p["bn"]["bias"])
        sd[bn_key + ".running_mean"] = np.asarray(s["bn"]["mean"])
        sd[bn_key + ".running_var"] = np.asarray(s["bn"]["var"])

    for idx, spec in enumerate(layer_specs(cfg)):
        base = f"features.{idx}"
        p = params["features"][idx]
        s = state["features"][idx]
        if spec[0] == "convbnrelu":
            put_conv_bn(p, s, f"{base}.0.weight", f"{base}.1")
        else:
            _, _, _, _, t = spec
            j = 0
            li = 0
            if t != 1:
                put_conv_bn(p["layers"][li], s["layers"][li],
                            f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1")
                j += 1; li += 1
            put_conv_bn(p["layers"][li], s["layers"][li],
                        f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1")
            j += 1; li += 1
            put_conv_bn(p["layers"][li], s["layers"][li],
                        f"{base}.conv.{j}.weight", f"{base}.conv.{j + 1}")
    sd["classifier.1.weight"] = np.asarray(params["classifier"]["kernel"]).T
    sd["classifier.1.bias"] = np.asarray(params["classifier"]["bias"])
    return sd


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(tree)
