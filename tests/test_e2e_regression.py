"""Full-pipeline numeric regression pin: fixed-seed model on the GSC
sample must reproduce the committed probabilities (XLA and Pallas paths)."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.data import read_wav
from uit_mobile_tpu.ops import make_frontend_fn

GOLDEN = Path(__file__).parent / "goldens" / "e2e_golden.npz"


def _setup():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    wav, sr = read_wav(Path(__file__).parent.parent / "samples" / "85b877b5_nohash_0.wav")
    return cfg, params, state, jnp.asarray(wav)


def test_pipeline_matches_committed_golden():
    cfg, params, state, wav = _setup()
    want = np.load(GOLDEN)["probs"]
    got = np.asarray(models.apply(cfg, params, state, wav))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pallas_path_within_parity_budget():
    cfg, params, state, wav = _setup()
    want = np.load(GOLDEN)["probs"]
    frontend = make_frontend_fn(cfg.frontend, use_pallas=True)  # interpret on CPU
    got = np.asarray(models.apply(cfg, params, state, wav, frontend_fn=frontend))
    assert np.abs(got - want).max() < 1e-3  # the BASELINE logit-drift gate
