"""make_forward_fn: best-available dispatch (btf fast path under pallas,
plain XLA otherwise) must agree with the reference-layout forward."""

import numpy as np
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ops.pipeline import make_forward_fn


def test_dispatch_agrees_across_paths():
    cfg = models.get_model_config("uit_xxxs", outputdim=19, target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    )
    plain = np.asarray(make_forward_fn(cfg, params, state, use_pallas=False)(wav))
    # use_pallas=True on CPU runs the interpret-mode kernel + btf layout
    btf = np.asarray(make_forward_fn(cfg, params, state, use_pallas=True)(wav))
    fast = np.asarray(
        make_forward_fn(cfg, params, state, use_pallas=True, precision="fast")(wav)
    )
    np.testing.assert_allclose(btf, plain, atol=1e-4)
    np.testing.assert_allclose(fast, plain, atol=1e-3)


def test_dispatch_mobilenetv2_uses_plain_layout():
    cfg = models.get_model_config("MobileNetV2", outputdim=12)
    params, state = models.build(cfg, jax.random.key(1))
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16000)).astype(np.float32) * 0.1
    )
    a = np.asarray(make_forward_fn(cfg, params, state, use_pallas=False)(wav))
    b = np.asarray(make_forward_fn(cfg, params, state, use_pallas=True)(wav))
    np.testing.assert_allclose(a, b, atol=1e-4)
