"""Differential parity vs the reference's OWN PyTorch modules.

The zenodo checkpoint dumps cannot be downloaded in this environment, but
the code they were trained with is mounted at /root/reference and runnable
on CPU torch (timm/torchaudio/loguru stubbed — see ref_torch_loader.py).
These tests close the converter-parity gap from both directions:

- torch -> jax (the zenodo load path): a torch-initialized reference
  UITBase/MobileNetV2 with randomized BN running stats is exported via
  ``state_dict()`` and converted with ``ckpt.torch_convert``; our forward
  must match the reference module's eval forward to <= 1e-5 on identical
  mel inputs, including the long-clip crop path (reference uit.py:468-488)
  and all pooling / eval_avg / attention variants.
- jax -> torch (the export path): our randomly-initialized params exported
  with ``uit_torch_state_dict_from_params`` must load into the real
  reference module (strict up to BN ``num_batches_tracked``) and produce
  the same outputs.
- pos-embed retargeting: loading a target_length=102 state_dict into
  models with shorter/longer grids must agree with the reference's
  ``change_pos_embedding`` (uit.py:425-450) slice/bilinear rules.

Frontends are bypassed on both sides (mel fed directly); mel numerics are
covered by tests/test_frontend.py goldens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_torch_loader import load_reference_module, reference_available

from uit_mobile_tpu.ckpt import torch_convert as tc
from uit_mobile_tpu.models import mobilenetv2 as jmnv2
from uit_mobile_tpu.models import uit as juit

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)

TOL = 1e-5


def _randomize_bn(model, seed):
    """Give every BatchNorm nontrivial running stats so the stats mapping
    (params vs state split, eps, transpose) is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            with torch.no_grad():
                m.running_mean.uniform_(-15.0, -5.0, generator=g)
                m.running_var.uniform_(0.5, 4.0, generator=g)


def _np_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _build_ref_uit(factory_name, seed=0, **kwargs):
    ref = load_reference_module("uit")
    torch.manual_seed(seed)
    kwargs.setdefault("outputdim", 537)
    kwargs.setdefault("target_length", 102)
    model = getattr(ref, factory_name)(**kwargs)
    model.eval()
    model.front_end = torch.nn.Identity()
    _randomize_bn(model, seed + 1)
    return model


def _mel(shape, seed=0, scale=20.0, offset=-30.0):
    rng = np.random.default_rng(seed)
    return (offset + scale * rng.standard_normal(shape)).astype(np.float32)


def _torch_fwd(model, mel):
    with torch.no_grad():
        return model(torch.from_numpy(mel)).numpy()


def _jax_fwd(cfg, params, state, mel):
    out = juit.forward(cfg, params, state, jnp.asarray(mel), frontend_fn=lambda w: w)
    return np.asarray(out)


GEOMETRIES = [
    ("uit_xs", {}),
    ("uit_xxs", {}),
    ("uit_xxxs", {}),
    ("audio_transformer_h128_d6_m3", {}),      # GELU + full Attention
    ("audio_transformer_h128_d4_m3_relu", {}),  # ReLU + full Attention
    ("uit_xxxs", {"pooling": "token"}),
    ("uit_xxxs", {"pooling": "dm"}),
    ("uit_xxxs", {"eval_avg": "max"}),
]


@pytest.mark.parametrize("factory,kwargs", GEOMETRIES,
                         ids=[f"{n}-{'-'.join(f'{k}={v}' for k, v in kw.items()) or 'base'}"
                              for n, kw in GEOMETRIES])
def test_torch_to_jax_forward_parity(factory, kwargs):
    """zenodo load path: reference state_dict -> converter -> our forward."""
    model = _build_ref_uit(factory, seed=hash(factory) % 1000, **kwargs)
    cfg = getattr(juit, factory)(outputdim=537, target_length=102, **kwargs)
    params, state = tc.uit_params_from_torch_state_dict(_np_sd(model), cfg)

    # single-window path (1 s clip: 101/102 frames) and a sub-grid input
    for shape, seed in (((3, 64, 102), 0), ((2, 64, 96), 1)):
        mel = _mel(shape, seed)
        np.testing.assert_allclose(
            _jax_fwd(cfg, params, state, mel), _torch_fwd(model, mel),
            atol=TOL, rtol=0,
            err_msg=f"single-window mismatch for {factory} {kwargs} {shape}",
        )

    # long-clip crop path (tail window replaced by the last full window)
    mel = _mel((2, 64, 250), 2)
    np.testing.assert_allclose(
        _jax_fwd(cfg, params, state, mel), _torch_fwd(model, mel),
        atol=TOL, rtol=0,
        err_msg=f"long-clip crop mismatch for {factory} {kwargs}",
    )


@pytest.mark.parametrize("factory", ["uit_xxxs", "uit_xxs"])
def test_jax_to_torch_export_parity(factory):
    """Export path: our params load into the real reference module and match."""
    cfg = getattr(juit, factory)(outputdim=537, target_length=102)
    params, state = juit.init(cfg, jax.random.PRNGKey(3))
    # nontrivial BN stats on our side too
    state = {
        "init_bn": {
            "mean": jnp.asarray(_mel((cfg.n_mels,), 4, scale=3.0, offset=-10.0)),
            "var": jnp.asarray(1.0 + np.abs(_mel((cfg.n_mels,), 5, scale=0.5, offset=1.0))),
        }
    }
    sd = tc.uit_torch_state_dict_from_params(params, state, cfg)

    model = _build_ref_uit(factory, seed=9)
    model_keys = set(model.state_dict().keys())
    sd_keys = set(sd.keys())
    # reference UITBase.load_state_dict returns None (uit.py:414-421), so
    # check coverage by key-set comparison instead of the return value
    assert sd_keys <= model_keys, sorted(sd_keys - model_keys)
    assert model_keys - sd_keys <= {"init_bn.1.num_batches_tracked"}, sorted(
        model_keys - sd_keys
    )
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=False,
    )

    for shape in ((3, 64, 102), (2, 64, 250)):
        mel = _mel(shape, 6)
        np.testing.assert_allclose(
            _jax_fwd(cfg, params, state, mel), _torch_fwd(model, mel),
            atol=TOL, rtol=0,
            err_msg=f"export-direction mismatch for {factory} {shape}",
        )


@pytest.mark.parametrize("target_length", [48, 160])
def test_pos_embed_resize_parity(target_length):
    """Retargeting a 102-frame checkpoint to shorter (slice) / longer
    (bilinear, align_corners=False) grids matches reference
    change_pos_embedding exactly."""
    src = _build_ref_uit("uit_xxxs", seed=11)
    sd = src.state_dict()

    tgt_model = _build_ref_uit("uit_xxxs", seed=12, target_length=target_length)
    # reference load_state_dict resizes pos embeds in-place on a copy
    tgt_model.load_state_dict({k: v.clone() for k, v in sd.items()}, strict=False)
    tgt_model.eval()

    cfg = juit.uit_xxxs(outputdim=537, target_length=target_length)
    params, state = tc.uit_params_from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )

    mel = _mel((2, 64, target_length), 13)
    np.testing.assert_allclose(
        _jax_fwd(cfg, params, state, mel), _torch_fwd(tgt_model, mel),
        atol=TOL, rtol=0,
        err_msg=f"pos-embed resize mismatch at target_length={target_length}",
    )


def test_train_mode_bn_differential():
    """Training-mode parity: init_bn normalizes with BATCH stats and updates
    running stats with momentum 0.01 (reference uit.py:311-313 + torch BN
    semantics: biased variance for normalization, unbiased for the running
    update). Outputs AND post-step running stats must match the reference
    module run in .train() mode."""
    model = _build_ref_uit("uit_xxxs", seed=31)
    model.train()
    cfg = juit.uit_xxxs(outputdim=537, target_length=102)
    params, state = tc.uit_params_from_torch_state_dict(_np_sd(model), cfg)

    mel = _mel((4, 64, 102), 32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(mel)).numpy()
    ours, new_state = juit.forward(
        cfg, params, state, jnp.asarray(mel), train=True,
        rng=jax.random.key(0), frontend_fn=lambda w: w,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=TOL, rtol=0)

    bn = model.init_bn[1]
    np.testing.assert_allclose(
        np.asarray(new_state["init_bn"]["mean"]), bn.running_mean.numpy(),
        atol=1e-4, rtol=1e-5, err_msg="running_mean update mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(new_state["init_bn"]["var"]), bn.running_var.numpy(),
        atol=1e-4, rtol=1e-5, err_msg="running_var update mismatch",
    )


def _build_ref_mnv2(seed=0):
    ref = load_reference_module("mobilenetv2")
    torch.manual_seed(seed)
    model = ref.MobileNetV2(outputdim=537)
    model.eval()
    model.front_end = torch.nn.Identity()
    _randomize_bn(model, seed + 1)
    return model


def test_mobilenetv2_torch_to_jax_parity():
    """PSL teacher numerics: reference MobileNetV2 -> converter -> our forward."""
    model = _build_ref_mnv2(seed=21)
    cfg = jmnv2.MobileNetV2Config(outputdim=537)
    params, state = tc.mobilenetv2_params_from_torch_state_dict(_np_sd(model), cfg)

    for shape, seed in (((2, 64, 101), 0), ((1, 64, 250), 1)):
        mel = _mel(shape, seed, scale=5.0, offset=-10.0)
        ours = np.asarray(
            jmnv2.forward(cfg, params, state, jnp.asarray(mel), frontend_fn=lambda w: w)
        )
        np.testing.assert_allclose(
            ours, _torch_fwd(model, mel), atol=TOL, rtol=0,
            err_msg=f"MobileNetV2 torch->jax mismatch {shape}",
        )


def test_mobilenetv2_jax_to_torch_parity():
    cfg = jmnv2.MobileNetV2Config(outputdim=537)
    params, state = jmnv2.init(cfg, jax.random.PRNGKey(22))
    sd = tc.mobilenetv2_torch_state_dict_from_params(params, state, cfg)

    model = _build_ref_mnv2(seed=23)
    result = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=False,
    )
    assert result.unexpected_keys == []
    assert all(k.endswith("num_batches_tracked") for k in result.missing_keys), (
        result.missing_keys
    )

    mel = _mel((2, 64, 101), 24, scale=5.0, offset=-10.0)
    ours = np.asarray(
        jmnv2.forward(cfg, params, state, jnp.asarray(mel), frontend_fn=lambda w: w)
    )
    np.testing.assert_allclose(
        ours, _torch_fwd(model, mel), atol=TOL, rtol=0,
        err_msg="MobileNetV2 jax->torch export mismatch",
    )
