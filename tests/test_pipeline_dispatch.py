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


def test_scanned_forward_matches_per_batch_calls():
    """make_scanned_forward: one (K, B, T) dispatch == K per-batch calls
    to f32 epsilon (XLA fuses the non-kernel ops differently inside the
    scan body — not bitwise, on CPU or TPU), for both the plain and the
    pallas(interpret) fast paths."""
    from uit_mobile_tpu.ops.pipeline import make_scanned_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=11, target_length=102,
                                  depth=2)
    params, state = models.build(cfg, jax.random.key(2))
    rng = np.random.default_rng(7)
    block = jnp.asarray(
        rng.standard_normal((3, 4, 16000)).astype(np.float32) * 0.1
    )
    for kwargs in (dict(use_pallas=False),
                   dict(use_pallas=True, precision="fast")):
        fwd = make_forward_fn(cfg, params, state, **kwargs)
        scanned = jax.jit(make_scanned_forward(fwd))
        got = np.asarray(scanned(block))
        want = np.stack([np.asarray(jax.jit(fwd)(block[k])) for k in range(3)])
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_scanned_forward_int16_and_unroll():
    from uit_mobile_tpu.ops.pipeline import make_scanned_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=9, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(3))
    rng = np.random.default_rng(8)
    f32 = rng.standard_normal((2, 3, 16000)).astype(np.float32) * 0.1
    pcm = jnp.asarray(np.round(f32 * 32768.0).clip(-32768, 32767).astype(np.int16))
    fwd = make_forward_fn(cfg, params, state, use_pallas=True, precision="fast")
    a = np.asarray(jax.jit(make_scanned_forward(fwd))(pcm))
    b = np.asarray(jax.jit(make_scanned_forward(fwd, unroll=2))(pcm))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 3, 9)


def test_forward_fn_routes_mbv2_through_tfb_to_bft():
    """Non-UiT configs (MobileNetV2) route their mel through the
    transposed kernel + transpose back (bitwise at fast precision,
    +8.3% serving on the v5e — PERF_NOTES round 4): make_forward_fn's
    probs must equal the direct bft-frontend forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.ops.pipeline import make_forward_fn

    from uit_mobile_tpu.ops.pallas_mel import TFB_MIN_BATCH

    cfg = models.get_model_config("MobileNetV2", outputdim=21)
    params, state = models.build(cfg, jax.random.key(0))
    # below the lane gate both legs take the row-kernel fallback — pins
    # the fallback equality at both precisions
    wav = (np.random.default_rng(0).standard_normal((4, 16000)) * 0.1
           ).astype(np.float32)
    for prec in ("fast", "exact"):
        fn = make_forward_fn(cfg, params, state, use_pallas=True,
                             precision=prec)
        direct = models.apply(
            cfg, params, state, jnp.asarray(wav),
            frontend_fn=make_frontend_fn(cfg.frontend, use_pallas=True,
                                         precision=prec))
        np.testing.assert_allclose(np.asarray(fn(jnp.asarray(wav))),
                                   np.asarray(direct), atol=2e-5)
    # at fast precision and B >= TFB_MIN_BATCH the transposed kernel
    # actually engages — short clips keep the CPU (interpret-mode) cost
    # down while exercising the real make_forward_fn -> tfb_to_bft wiring
    wav_big = (np.random.default_rng(1)
               .standard_normal((TFB_MIN_BATCH, 3200)) * 0.1
               ).astype(np.float32)
    fn = make_forward_fn(cfg, params, state, use_pallas=True,
                         precision="fast")
    direct = models.apply(
        cfg, params, state, jnp.asarray(wav_big),
        frontend_fn=make_frontend_fn(cfg.frontend, use_pallas=True,
                                     precision="fast"))
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(wav_big))),
                               np.asarray(direct), atol=2e-5)
