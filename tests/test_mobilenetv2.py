"""MobileNetV2: shape tests + conv/BN semantics validated against torch
functional ops (independent implementation path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu.models import mobilenetv2 as mbv2
from uit_mobile_tpu.ckpt.torch_convert import mobilenetv2_params_from_torch_state_dict


def test_layer_specs_structure():
    cfg = mbv2.MobileNetV2Config()
    specs = mbv2.layer_specs(cfg)
    # 1 stem + 17 inverted residuals + 1 final conv = 19 torch features
    # entries before the pool (reference mobilenetv2.py:120-142)
    assert len(specs) == 19
    assert specs[0] == ("convbnrelu", 1, 32, 3, 2, 1)
    assert specs[-1] == ("convbnrelu", 320, 1280, 1, 1, 1)
    assert specs[1] == ("invres", 32, 16, 1, 1)


def test_forward_shapes_1s_and_10s():
    cfg = mbv2.MobileNetV2Config(outputdim=527)
    params, state = mbv2.init(cfg, jax.random.key(0))
    n = sum(x.size for x in jax.tree.leaves(params))
    assert 2.0e6 < n < 3.5e6, n  # ~2.9M params (527 classes)
    for T in (16000, 32000):
        wav = jnp.zeros((2, T), dtype=jnp.float32)
        probs = mbv2.forward(cfg, params, state, wav)
        assert probs.shape == (2, 527)
        assert ((probs >= 0) & (probs <= 1)).all()


def test_conv_bn_relu6_matches_torch_functional():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, C_in, C_out, H, W, k, stride = 2, 8, 16, 20, 24, 3, 2
    x = rng.standard_normal((B, C_in, H, W)).astype(np.float32)
    w = (rng.standard_normal((C_out, C_in, k, k)) * 0.1).astype(np.float32)
    gamma = rng.standard_normal((C_out,)).astype(np.float32)
    beta = rng.standard_normal((C_out,)).astype(np.float32)
    mean = rng.standard_normal((C_out,)).astype(np.float32) * 0.1
    var = np.abs(rng.standard_normal((C_out,))).astype(np.float32) + 0.5

    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=(k - 1) // 2)
    want = F.batch_norm(want, torch.from_numpy(mean), torch.from_numpy(var),
                        torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-5)
    want = torch.clamp(want, 0.0, 6.0).numpy()

    p = {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
         "bn": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    s = {"bn": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    got, _ = mbv2._conv_bn_relu6(p, s, jnp.asarray(x.transpose(0, 2, 3, 1)), stride, 1, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5)


def test_depthwise_conv_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    B, C, H, W, k = 2, 12, 10, 14, 3
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    w = (rng.standard_normal((C, 1, k, k)) * 0.2).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=1, padding=1, groups=C).numpy()
    got = mbv2._conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w.transpose(2, 3, 1, 0)), 1, groups=C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5)


def test_converter_from_synthetic_torch_state_dict():
    """Build a state_dict with the reference's torch key naming and shapes,
    convert, and check the pytree structure lines up exactly."""
    cfg = mbv2.MobileNetV2Config(outputdim=5)
    rng = np.random.default_rng(2)

    sd = {}

    def add_conv_bn(conv_key, bn_key, c_in, c_out, k, groups=1):
        sd[conv_key] = rng.standard_normal((c_out, c_in // groups, k, k)).astype(np.float32)
        sd[bn_key + ".weight"] = np.ones(c_out, np.float32)
        sd[bn_key + ".bias"] = np.zeros(c_out, np.float32)
        sd[bn_key + ".running_mean"] = np.zeros(c_out, np.float32)
        sd[bn_key + ".running_var"] = np.ones(c_out, np.float32)

    for idx, spec in enumerate(mbv2.layer_specs(cfg)):
        base = f"features.{idx}"
        if spec[0] == "convbnrelu":
            _, c_in, c_out, k, _, groups = spec
            add_conv_bn(f"{base}.0.weight", f"{base}.1", c_in, c_out, k, groups)
        else:
            _, c_in, c_out, stride, t = spec
            hidden = int(round(c_in * t))
            j = 0
            if t != 1:
                add_conv_bn(f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1", c_in, hidden, 1)
                j += 1
            add_conv_bn(f"{base}.conv.{j}.0.weight", f"{base}.conv.{j}.1", hidden, hidden, 3, groups=hidden)
            j += 1
            add_conv_bn(f"{base}.conv.{j}.weight", f"{base}.conv.{j+1}", hidden, c_out, 1)
    sd["classifier.1.weight"] = rng.standard_normal((5, 1280)).astype(np.float32)
    sd["classifier.1.bias"] = np.zeros(5, np.float32)

    params, state = mobilenetv2_params_from_torch_state_dict(sd, cfg)
    ref_params, ref_state = mbv2.init(cfg, jax.random.key(0))
    got_shapes = [x.shape for x in jax.tree.leaves(params)]
    want_shapes = [x.shape for x in jax.tree.leaves(ref_params)]
    assert got_shapes == want_shapes
    assert [x.shape for x in jax.tree.leaves(state)] == [x.shape for x in jax.tree.leaves(ref_state)]

    probs = mbv2.forward(cfg, params, state, jnp.zeros((1, 16000)))
    assert probs.shape == (1, 5)


def _liven(params, state, seed=0):
    """Random unit-gain BN affine/stats: fresh-init MobileNetV2 collapses
    activations to ~0 (sigmoid==0.5 everywhere), which would hide any
    dtype effect — give every BN a trained-net-like operating point."""
    r = np.random.default_rng(seed)

    def on_params(d):
        if isinstance(d, dict):
            if "scale" in d:
                d = dict(d, scale=jnp.asarray(
                    r.uniform(0.8, 1.2, d["scale"].shape).astype(np.float32)),
                    bias=jnp.asarray(
                    r.normal(0, 0.3, d["bias"].shape).astype(np.float32)))
            return {k: (on_params(v) if k not in ("kernel", "scale", "bias")
                        else v) for k, v in d.items()}
        if isinstance(d, list):
            return [on_params(v) for v in d]
        return d

    def on_state(d):
        if isinstance(d, dict):
            if "mean" in d:
                return dict(
                    mean=jnp.asarray(
                        r.normal(0, 0.5, d["mean"].shape).astype(np.float32)),
                    var=jnp.asarray(
                        r.uniform(0.3, 1.5, d["var"].shape).astype(np.float32)))
            return {k: on_state(v) for k, v in d.items()}
        if isinstance(d, list):
            return [on_state(v) for v in d]
        return d

    return on_params(params), on_state(state)


def test_bfloat16_compute_mode_close_and_f32_default_unchanged():
    """compute_dtype='bfloat16' runs conv MXU work in bf16 with f32
    accumulation (the PSL-teacher fast mode, PERF_NOTES round 4): output
    must stay f32, drift must be bf16 input-rounding grade on a
    unit-gain network (measured 1.7e-4), and 'float32' must stay the
    default."""
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    cfg32 = mbv2.MobileNetV2Config(outputdim=17)
    assert cfg32.compute_dtype == "float32"
    params, state = mbv2.init(cfg32, jax.random.key(0))
    params, state = _liven(params, state)
    p32 = mbv2.forward(cfg32, params, state, wav)
    assert float(p32.std()) > 0.01  # livened: outputs actually vary

    cfg16 = mbv2.MobileNetV2Config(outputdim=17, compute_dtype="bfloat16")
    p16 = mbv2.forward(cfg16, params, state, wav)
    assert p16.dtype == jnp.float32
    drift = float(jnp.max(jnp.abs(p16 - p32)))
    assert 0 < drift <= 5e-3, drift  # bf16 engaged, rounding-grade only

    # train mode threads state in f32 in both dtypes. (The numeric bound
    # is loose on purpose: train-mode BN normalizes by the BATCH stats of
    # the bf16-rounded conv outputs, so rounding feeds back through
    # mean/var at B=2 — the teacher role that motivates this mode is
    # eval-mode, covered by the tight bound above.)
    (pt16, st16) = mbv2.forward(cfg16, params, state, wav, train=True,
                                rng=jax.random.key(1))
    (pt32, st32) = mbv2.forward(cfg32, params, state, wav, train=True,
                                rng=jax.random.key(1))
    assert float(jnp.max(jnp.abs(pt16 - pt32))) <= 1e-1
    m16 = st16["features"][0]["bn"]["mean"]
    m32 = st32["features"][0]["bn"]["mean"]
    assert m16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(m16), np.asarray(m32),
                               atol=2e-3, rtol=0)


def test_load_psl_compute_dtype_key():
    """psl: {compute_dtype: bfloat16} flows into the teacher config."""
    from uit_mobile_tpu.train.loop import _load_psl

    cfg, params, state = _load_psl({"psl": {
        "model": "MobileNetV2", "pretrained": "/nonexistent.pt",
        "allow_untrained": True, "compute_dtype": "bfloat16",
    }})
    assert cfg.compute_dtype == "bfloat16"
    assert params is not None and state is not None


def test_mobilenetv2_trains_through_make_train_step_with_mixup():
    """MobileNetV2 as a TRAINABLE model (the reference's AT baseline, not
    just its frozen teacher): the shared make_train_step applies
    mel-domain mixup to it exactly as to the UiT students."""
    import numpy as np
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.augment.mixup import mixup_tensor
    from uit_mobile_tpu.train.steps import make_train_step

    cfg = models.get_model_config("MobileNetV2", outputdim=32,
                                  width_mult=0.25)
    params, state = models.build(cfg, jax.random.key(0))

    # forward with mixup_lamb == manual mel mixup through the same frontend
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    lamb = jnp.asarray([0.8, 0.6, 0.9, 0.7])
    probs, _ = models.apply(cfg, params, state, wav, train=True,
                            rng=jax.random.key(1), mixup_lamb=lamb)
    from uit_mobile_tpu.frontend.mel import log_mel_spectrogram

    mel = mixup_tensor(log_mel_spectrogram(wav, cfg.frontend), lamb)
    ref, _ = models.apply(cfg, params, state, wav, train=True,
                          rng=jax.random.key(1), mixup_lamb=None,
                          frontend_fn=lambda w: mel)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # one optimizer step with mixup enabled: finite loss, params move
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, mixup_alpha=0.3)
    target = jnp.zeros((4, 32), jnp.float32).at[jnp.arange(4), 0].set(1.0)
    p2, s2, o2, metrics = step(params, state, opt.init(params),
                               {"wav": wav, "target": target},
                               jax.random.key(2))
    assert np.isfinite(float(metrics["total_loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
