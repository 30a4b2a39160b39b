"""The (B, T, F) serving layout must be numerically equivalent to the
reference-orientation path: same mel values (no transpose applied twice),
init_bn folded into the patch embed exactly, same crop rule on long clips."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ops import make_frontend_fn


@pytest.mark.parametrize("init_bn", [True, False])
@pytest.mark.parametrize("samples", [16000, 40000])  # 1 s single-window, 2.5 s crops
def test_btf_matches_bft(init_bn, samples):
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=37, target_length=102, depth=2, init_bn=init_bn
    )
    cfg_btf = models.get_model_config(
        "uit_xxxs", outputdim=37, target_length=102, depth=2, init_bn=init_bn,
        mel_layout="btf",
    )
    params, state = models.build(cfg, jax.random.key(0))
    if init_bn:
        # nontrivial BN stats so the fold is actually exercised
        rng = np.random.default_rng(1)
        state = dict(state)
        state["init_bn"] = {
            "mean": jnp.asarray(rng.uniform(-15, -5, 64).astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 4.0, 64).astype(np.float32)),
        }

    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, samples)).astype(np.float32) * 0.1
    )
    fe_bft = make_frontend_fn(cfg.frontend, use_pallas=True)  # interpret on CPU
    fe_btf = make_frontend_fn(cfg.frontend, use_pallas=True, layout="btf")

    ref = np.asarray(models.apply(cfg, params, state, wav, frontend_fn=fe_bft))
    got = np.asarray(models.apply(cfg_btf, params, state, wav, frontend_fn=fe_btf))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_btf_requires_eval_mode():
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=8, target_length=102, depth=1, mel_layout="btf"
    )
    params, state = models.build(cfg, jax.random.key(0))
    fe = make_frontend_fn(cfg.frontend, use_pallas=False, layout="btf")
    with pytest.raises(ValueError, match="btf"):
        models.apply(cfg, params, state, jnp.zeros((2, 16000)), train=True,
                     rng=jax.random.key(1), frontend_fn=fe)


def test_btf_frontend_layouts_agree():
    from uit_mobile_tpu.ops import pallas_log_mel

    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32)
    )
    bft = np.asarray(pallas_log_mel(wav, layout="bft"))
    btf = np.asarray(pallas_log_mel(wav, layout="btf"))
    np.testing.assert_array_equal(bft, btf.transpose(0, 2, 1))
