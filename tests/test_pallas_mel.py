"""Pallas fused mel kernel vs the pure-JAX reference frontend.

Runs in interpreter mode on the CPU test platform; the same kernel is
exercised compiled on real TPU by bench.py and the verify drive.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from uit_mobile_tpu.frontend import FrontendConfig, log_mel_spectrogram
from uit_mobile_tpu.ops import pallas_log_mel, make_frontend_fn


@pytest.mark.parametrize("shape", [(2, 16000), (1, 8000), (3, 40000)])
def test_pallas_matches_reference(shape):
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
    cfg = FrontendConfig()
    a = np.asarray(log_mel_spectrogram(wav, cfg))
    b = np.asarray(pallas_log_mel(wav, cfg))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_pallas_per_sample_topdb():
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    cfg = FrontendConfig(top_db_mode="per_sample")
    a = np.asarray(log_mel_spectrogram(wav, cfg))
    b = np.asarray(pallas_log_mel(wav, cfg))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_pallas_topdb_clamp_engages():
    # a loud transient forces max-120 to bind on silent-ish regions
    wav = np.zeros((1, 16000), dtype=np.float32)
    wav[0, 4000:4050] = 0.99
    cfg = FrontendConfig()
    a = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))
    b = np.asarray(pallas_log_mel(jnp.asarray(wav), cfg))
    assert (a.min() > 10.0 * np.log10(1e-10) + 1e-3), "clamp should bind"
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_fast_precision_mode():
    """tri-bf16 DFT fast mode: dB error bounded at valleys, tiny elsewhere."""
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    cfg = FrontendConfig()
    exact = np.asarray(pallas_log_mel(wav, cfg, precision="exact"))
    fast = np.asarray(pallas_log_mel(wav, cfg, precision="fast"))
    d = np.abs(exact - fast)
    assert d.max() < 1.0  # worst-case valley error stays <1 dB
    assert d.mean() < 0.02


def test_make_frontend_fn_model_integration():
    import jax
    from uit_mobile_tpu import models

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    wav = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16000)).astype(np.float32) * 0.1)
    a = models.apply(cfg, params, state, wav)
    b = models.apply(cfg, params, state, wav, frontend_fn=make_frontend_fn(cfg.frontend, use_pallas=True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_tfb_to_bft_frontend_matches_bft():
    """layout='tfb_to_bft' (the PSL-teacher fast route: transposed kernel
    + one transpose back) emits the canonical (B, F, T) mel equal to the
    row kernel's; exact precision and small batches route through the row
    kernel itself (identity). On the real TPU the fast route is BITWISE
    (tools/probe_teacher_tfb.py drift 0.0); interpret mode runs the same
    program in f32 so a tiny reassociation tolerance applies."""
    import numpy as np

    from uit_mobile_tpu.frontend import FrontendConfig

    cfg = FrontendConfig()
    rng = np.random.default_rng(3)
    for B, prec, tol in ((4, "fast", 0), (4, "exact", 0),
                         (128, "fast", 1e-4), (128, "exact", 0)):
        wav = (rng.standard_normal((B, 16000)) * 0.1).astype(np.float32)
        ref = make_frontend_fn(cfg, use_pallas=True, precision=prec)(wav)
        got = make_frontend_fn(cfg, use_pallas=True, precision=prec,
                               layout="tfb_to_bft")(wav)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=tol, rtol=0)

    # non-pallas path: plain bft chain
    wav = (rng.standard_normal((4, 16000)) * 0.1).astype(np.float32)
    a = make_frontend_fn(cfg, use_pallas=False)(wav)
    b = make_frontend_fn(cfg, use_pallas=False, layout="tfb_to_bft")(wav)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_framing_variants_bitwise_equal():
    """'slices' and 'gather' framings build the SAME frames (pure
    indexing) — mels must be exactly equal in every layout/precision,
    and the 'auto' default must match both. The on-chip counterpart
    (real Mosaic kernels + the B=1 route) is gated in make verify-tpu;
    this pins the interpret path so CI catches indexing regressions."""
    from uit_mobile_tpu.frontend import FrontendConfig
    from uit_mobile_tpu.ops import pallas_log_mel

    cfg = FrontendConfig()
    rng = np.random.default_rng(7)
    for B in (1, 3):
        wav = (rng.standard_normal((B, 16000)) * 0.1).astype(np.float32)
        pcm = (wav * 32768).clip(-32768, 32767).astype(np.int16)
        for precision in ("exact", "fast"):
            for layout in ("bft", "btf", "tfb"):
                for x in (wav, pcm):
                    s = pallas_log_mel(x, cfg, precision=precision,
                                       layout=layout, framing="slices")
                    g = pallas_log_mel(x, cfg, precision=precision,
                                       layout=layout, framing="gather")
                    a = pallas_log_mel(x, cfg, precision=precision,
                                       layout=layout)
                    np.testing.assert_array_equal(np.asarray(s),
                                                  np.asarray(g))
                    np.testing.assert_array_equal(np.asarray(a),
                                                  np.asarray(s))


def test_framing_rejects_unknown():
    from uit_mobile_tpu.frontend import FrontendConfig
    from uit_mobile_tpu.ops import pallas_log_mel

    wav = np.zeros((2, 16000), np.float32)
    # ValueError, not assert: must survive python -O (house convention)
    with pytest.raises(ValueError, match="unknown framing"):
        pallas_log_mel(wav, FrontendConfig(), framing="stride")
