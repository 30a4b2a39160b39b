"""Batching service: correctness vs direct forward, mixed lengths, futures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.serve import ServiceConfig, TaggingService


@pytest.fixture(scope="module")
def model():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_service_matches_direct_forward(model):
    cfg, params, state = model
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(5)]
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=8, max_seconds=2, warmup=False)) as svc:
        got = svc.infer_many(wavs)
    # direct: same bucket semantics (pad batch of 8 x 16000)
    batch = np.zeros((8, 16000), np.float32)
    for i, w in enumerate(wavs):
        batch[i] = w
    want = np.asarray(models.apply(cfg, params, state, jnp.asarray(batch)))
    for i in range(5):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5)


def test_service_mixed_lengths(model):
    cfg, params, state = model
    rng = np.random.default_rng(1)
    wavs = [
        rng.standard_normal(8000).astype(np.float32) * 0.1,   # 1s bucket
        rng.standard_normal(16000).astype(np.float32) * 0.1,  # 1s bucket
        rng.standard_normal(17000).astype(np.float32) * 0.1,  # 2s bucket
    ]
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=4, max_seconds=3, warmup=False)) as svc:
        outs = svc.infer_many(wavs)
    for o in outs:
        assert o.shape == (537,) and np.isfinite(o).all()


def test_service_rejects_too_long(model):
    cfg, params, state = model
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=2, max_seconds=1, warmup=False)) as svc:
        with pytest.raises(AssertionError, match="max_seconds"):
            svc.submit(np.zeros(32000, np.float32))
