"""Pin the full wav->probs pipeline numerically: fixed-seed uit_xxxs on the
GSC sample -> committed probs. Guards refactors against silent numeric
drift (CPU, f32, XLA path). Run from repo root to regenerate."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.data import read_wav


def main():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    wav, sr = read_wav(REPO / "samples" / "85b877b5_nohash_0.wav")
    probs = np.asarray(models.apply(cfg, params, state, jnp.asarray(wav)))
    out = REPO / "tests" / "goldens" / "e2e_golden.npz"
    np.savez_compressed(out, probs=probs)
    print("wrote", out, probs.shape, probs[0, :3])


if __name__ == "__main__":
    main()
