"""The (T, F, B) transposed serving layout — the framing gather's native
orientation — must be numerically equivalent to both the reference path
and the (B, T, F) layout: same mel values, same BN fold, same crop rule,
per-sample dB clamping intact. On hardware its kernel output is BITWISE
the row kernel's (PERF_NOTES); here (interpret mode) we pin tight
tolerances."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ops import make_frontend_fn, pallas_log_mel


def test_tfb_frontend_matches_row_kernel():
    # interpret mode reassociates the transposed dot's K accumulation, so
    # CPU agreement is ~1e-4 dB; on TPU hardware the two kernels measured
    # BITWISE identical (PERF_NOTES). Gate at the ~1e-3 dB cross-impl floor.
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 16000)).astype(np.float32) * 0.1
    )
    bft = np.asarray(pallas_log_mel(wav, layout="bft"))           # (B, F, T)
    tfb = np.asarray(pallas_log_mel(wav, layout="tfb"))           # (T, F, B)
    np.testing.assert_allclose(tfb.transpose(2, 1, 0), bft, atol=1e-3, rtol=0)


def test_tfb_frontend_fast_and_int16():
    rng = np.random.default_rng(1)
    f32 = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    from uit_mobile_tpu.frontend import quantize_pcm16

    pcm = quantize_pcm16(f32)
    a = np.asarray(pallas_log_mel(jnp.asarray(pcm), layout="tfb", precision="fast"))
    b = np.asarray(pallas_log_mel(
        jnp.asarray(pcm.astype(np.float32) / 32768.0), layout="tfb",
        precision="fast"))
    np.testing.assert_array_equal(a, b)  # int16 folding is exact


def test_tfb_per_sample_clamp_isolates_batch():
    """per_sample dB mode on (T, F, B): a loud co-batched clip must not
    shift a quiet clip's clamp reference."""
    cfg = dataclasses.replace(
        models.get_model_config("uit_xxxs", outputdim=5,
                                target_length=102).frontend,
        top_db_mode="per_sample",
    )
    rng = np.random.default_rng(2)
    quiet = (rng.standard_normal(16000) * 1e-4).astype(np.float32)
    loud = (rng.standard_normal(16000) * 0.5).astype(np.float32)
    solo = np.asarray(pallas_log_mel(jnp.asarray(quiet[None]), cfg, layout="tfb"))
    duo = np.asarray(pallas_log_mel(
        jnp.asarray(np.stack([quiet, loud])), cfg, layout="tfb"))
    # the clamp reference must not couple (a coupled clamp shifts the
    # quiet clip by whole dB); ~1e-4 dB is interpret-mode accumulation
    # noise between the B=1 and B=2 dots, not coupling
    np.testing.assert_allclose(duo[:, :, 0], solo[:, :, 0], atol=1e-3, rtol=0)


@pytest.mark.parametrize("init_bn", [True, False])
@pytest.mark.parametrize("samples", [16000, 40000])  # single-window + crops
def test_tfb_model_matches_bft(init_bn, samples):
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=37, target_length=102, depth=2, init_bn=init_bn
    )
    cfg_tfb = models.get_model_config(
        "uit_xxxs", outputdim=37, target_length=102, depth=2, init_bn=init_bn,
        mel_layout="tfb",
    )
    params, state = models.build(cfg, jax.random.key(0))
    if init_bn:
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
    fe_tfb = make_frontend_fn(cfg.frontend, use_pallas=True, layout="tfb")
    ref = np.asarray(models.apply(cfg, params, state, wav, frontend_fn=fe_bft))
    got = np.asarray(models.apply(cfg_tfb, params, state, wav, frontend_fn=fe_tfb))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_tfb_eval_avg_max_and_tail_rule():
    """Long-clip max-reduce rides the crop-major stacking correctly."""
    cfg = models.get_model_config("uit_xxxs", outputdim=11, target_length=102,
                                  depth=1, eval_avg="max")
    cfg_tfb = dataclasses.replace(cfg, mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(3))
    wav = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 52000)).astype(np.float32) * 0.1
    )
    fe_bft = make_frontend_fn(cfg.frontend, use_pallas=True)
    fe_tfb = make_frontend_fn(cfg.frontend, use_pallas=True, layout="tfb")
    ref = np.asarray(models.apply(cfg, params, state, wav, frontend_fn=fe_bft))
    got = np.asarray(models.apply(cfg_tfb, params, state, wav, frontend_fn=fe_tfb))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_tfb_requires_frontend_and_trains():
    """Round 4 made tfb a TRAINING layout too (tests/test_tfb_train.py
    pins equivalence with bft); what remains required is the matching
    transposed frontend — with none, the guard must raise (ValueError,
    not assert: it must survive python -O)."""
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=8, target_length=102, depth=1, mel_layout="tfb"
    )
    params, state = models.build(cfg, jax.random.key(0))
    fe = make_frontend_fn(cfg.frontend, use_pallas=False, layout="tfb")
    probs, new_state = models.apply(
        cfg, params, state, jnp.zeros((2, 16000)), train=True,
        rng=jax.random.key(1), frontend_fn=fe)
    assert probs.shape == (2, 8) and np.isfinite(np.asarray(probs)).all()
    with pytest.raises(ValueError, match="tfb"):
        models.apply(cfg, params, state, jnp.zeros((2, 16000)))
    with pytest.raises(ValueError, match="tfb"):
        models.apply(cfg, params, state, jnp.zeros((2, 16000)), train=True,
                     rng=jax.random.key(1))


def test_tfb_xla_fallback_frontend():
    """make_frontend_fn(use_pallas=False, layout='tfb') transposes the
    pure-JAX frontend to the same orientation."""
    wav = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 16000)).astype(np.float32) * 0.1
    )
    a = np.asarray(make_frontend_fn(use_pallas=False, layout="tfb")(wav))
    b = np.asarray(make_frontend_fn(use_pallas=False)(wav))  # (B, F, T)
    np.testing.assert_array_equal(a, b.transpose(2, 1, 0))


def test_pipeline_auto_layout_is_tfb():
    """make_forward_fn auto mode selects tfb under pallas and matches the
    plain path."""
    from uit_mobile_tpu.ops.pipeline import make_forward_fn

    cfg = models.get_model_config("uit_xxxs", outputdim=9, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    wav = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 16000)).astype(np.float32) * 0.1
    )
    plain = np.asarray(make_forward_fn(cfg, params, state, use_pallas=False)(wav))
    fast = np.asarray(make_forward_fn(cfg, params, state, use_pallas=True)(wav))
    np.testing.assert_allclose(fast, plain, atol=5e-4, rtol=0)


def test_tfb_small_batch_fallback_is_row_kernel():
    """B < 128 routes through the row kernel (the transposed kernel would
    run 1/128-utilization lane tiles) — outputs are exactly the btf
    kernel's, transposed."""
    wav = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 16000)).astype(np.float32) * 0.1
    )
    tfb = np.asarray(pallas_log_mel(wav, layout="tfb"))
    btf = np.asarray(pallas_log_mel(wav, layout="btf"))
    np.testing.assert_array_equal(tfb, btf.transpose(1, 2, 0))


def test_tfb_transposed_kernel_at_full_batch():
    """B >= 128 exercises the REAL transposed kernel (grid over frame
    planes); agreement with the row kernel at the interpret-mode floor."""
    wav = jnp.asarray(
        np.random.default_rng(8).standard_normal((128, 16000)).astype(np.float32) * 0.1
    )
    tfb = np.asarray(pallas_log_mel(wav, layout="tfb", precision="fast"))
    btf = np.asarray(pallas_log_mel(wav, layout="btf", precision="fast"))
    assert tfb.shape == (101, 64, 128)
    np.testing.assert_allclose(tfb.transpose(2, 0, 1), btf, atol=1e-3, rtol=0)
