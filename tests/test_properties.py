"""Property-based tests (hypothesis) for shape-critical host logic:
the long-clip crop rule, padding, and dB clamp semantics."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from uit_mobile_tpu import models
from uit_mobile_tpu.models import uit
from uit_mobile_tpu.frontend import FrontendConfig, amplitude_to_db
from uit_mobile_tpu.data import pad_batch


CFG = models.get_model_config("uit_xxxs", outputdim=5, target_length=102)


@settings(max_examples=25, deadline=None)
@given(T=st.integers(min_value=103, max_value=1200))
def test_chunk_long_mel_tail_rule(T):
    """For any T > target: full windows tile from 0; if T % L != 0 the
    last window is exactly mel[..., T-L:T] (reference uit.py:474-480)."""
    L = CFG.target_length
    mel = jnp.asarray(np.arange(2 * 64 * T, dtype=np.float32).reshape(2, 64, T))
    crops, n_crops = uit.chunk_long_mel(CFG, mel)
    assert n_crops == -(-T // L)
    crops = np.asarray(crops).reshape(2, n_crops, 64, L)
    for i in range(n_crops - 1):
        np.testing.assert_array_equal(crops[:, i], np.asarray(mel[:, :, i * L:(i + 1) * L]))
    if T % L == 0:
        np.testing.assert_array_equal(crops[:, -1], np.asarray(mel[:, :, -L:]))
    else:
        np.testing.assert_array_equal(crops[:, -1], np.asarray(mel[:, :, T - L:]))


@settings(max_examples=25, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=6)
)
def test_pad_batch_properties(lengths):
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(n).astype(np.float32) for n in lengths]
    out, lens = pad_batch(waves)
    assert out.shape == (len(lengths), max(lengths))
    np.testing.assert_array_equal(lens, lengths)
    for i, w in enumerate(waves):
        np.testing.assert_array_equal(out[i, : len(w)], w)
        assert (out[i, len(w):] == 0).all()


@settings(max_examples=25, deadline=None)
@given(
    scale=st.floats(min_value=1e-8, max_value=1e4),
    shape=st.tuples(st.integers(1, 3), st.integers(2, 8), st.integers(2, 8)),
)
def test_amplitude_to_db_clamp_invariants(scale, shape):
    rng = np.random.default_rng(1)
    power = jnp.asarray((rng.random(shape) * scale).astype(np.float32))
    cfg = FrontendConfig()
    db = np.asarray(amplitude_to_db(power, cfg))
    # floor: never more than top_db below the global max
    assert db.max() - db.min() <= cfg.top_db + 1e-3
    # absolute floor from amin
    assert db.min() >= 10 * np.log10(1e-10) - 1e-4
    # monotonicity: the argmax of power is the argmax of dB
    assert np.unravel_index(np.argmax(db), shape) == np.unravel_index(
        np.argmax(np.asarray(power)), shape
    )
