"""Waveform/spectrogram augmentations + mixup semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu.augment import (
    mixup_lengths,
    mixup_tensor,
    parse_spectransforms,
    parse_wavtransforms,
    sample_mixup_lambdas,
)
from uit_mobile_tpu.augment.wav import gain, polarity_inversion, shift
from uit_mobile_tpu.augment.spec import frequency_masking, time_masking


def test_mixup_tensor_flip_combo():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    lamb = jnp.asarray([1.0, 0.0, 0.5, 0.25])
    mixed = np.asarray(mixup_tensor(x, lamb))
    # lamb=1 -> fully the flipped sample; lamb=0 -> original
    np.testing.assert_allclose(mixed[0], np.asarray(x[3]))
    np.testing.assert_allclose(mixed[1], np.asarray(x[1]))
    np.testing.assert_allclose(mixed[2], 0.5 * np.asarray(x[1]) + 0.5 * np.asarray(x[2]))


def test_mixup_lengths_max():
    l = jnp.asarray([5, 2, 9, 1])
    np.testing.assert_array_equal(np.asarray(mixup_lengths(l)), [5, 9, 9, 5])


def test_mixup_lambdas_in_range():
    lam = sample_mixup_lambdas(jax.random.key(0), 256, 0.3)
    a = np.asarray(lam)
    assert a.shape == (256,) and (a >= 0).all() and (a <= 1).all()
    assert a.std() > 0.2  # Beta(0.3, 0.3) is U-shaped


def test_shift_rolls_circularly():
    wav = jnp.asarray(np.arange(16, dtype=np.float32)[None, :])
    out = np.asarray(shift(jax.random.key(0), wav, p=1.0))
    # still a permutation of the same values (rollover=True)
    np.testing.assert_allclose(np.sort(out[0]), np.arange(16))


def test_gain_and_polarity():
    wav = jnp.asarray(np.ones((64, 100), dtype=np.float32))
    g = np.asarray(gain(jax.random.key(1), wav, p=1.0))
    ratios = np.unique(np.round(g[:, 0], 5))
    assert len(ratios) > 10  # per-sample gains differ
    db = 20 * np.log10(np.abs(g[:, 0]))
    assert db.min() >= -18.01 and db.max() <= 6.01
    p = np.asarray(polarity_inversion(jax.random.key(2), wav, p=1.0))
    assert (p == -1).all()
    p_half = np.asarray(polarity_inversion(jax.random.key(3), wav, p=0.5))
    assert 0.2 < (p_half[:, 0] == -1).mean() < 0.8


def test_time_masking_zeroes_a_window():
    spec = jnp.asarray(np.ones((4, 8, 50), dtype=np.float32))
    out = np.asarray(time_masking(jax.random.key(0), spec, time_mask_param=20))
    for b in range(4):
        cols = (out[b] == 0).all(axis=0)
        w = cols.sum()
        assert w < 20
        if w:  # masked columns are contiguous
            on = np.flatnonzero(cols)
            assert on[-1] - on[0] + 1 == w
    # masks differ across batch (iid)
    assert len({tuple(np.flatnonzero((out[b] == 0).all(axis=0))) for b in range(4)}) > 1


def test_frequency_masking_zeroes_rows():
    spec = jnp.asarray(np.ones((2, 64, 10), dtype=np.float32))
    out = np.asarray(frequency_masking(jax.random.key(5), spec, freq_mask_param=8))
    rows = (out == 0).all(axis=-1)
    assert rows.sum(axis=-1).max() < 8


def test_parsers_compose():
    wav_fn = parse_wavtransforms({"Shift": {"min_shift": -0.5, "max_shift": 0.5},
                                  "Gain": {"p": 0.5}})
    spec_fn = parse_spectransforms([{"TimeMasking": {"time_mask_param": 20}},
                                    {"FrequencyMasking": {"freq_mask_param": 8}}])
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32))
    spec = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 101)).astype(np.float32))
    assert wav_fn(jax.random.key(0), wav).shape == wav.shape
    assert spec_fn(jax.random.key(1), spec).shape == spec.shape
    assert parse_wavtransforms({}) is None
    assert parse_spectransforms([]) is None


def test_schedule_warmup_and_decay():
    from uit_mobile_tpu.train import cosine_with_warmup

    s = cosine_with_warmup(1e-3, total_steps=1000, warmup_iters=100)
    assert float(s(0)) == 0.0
    assert float(s(50)) == pytest.approx(5e-4, rel=1e-2)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-2)
    assert float(s(1100)) == pytest.approx(1e-5, rel=0.1)  # 1% floor


def test_masking_boundaries_are_integer_bins():
    """torchaudio floors both mask draws (.long()): boundaries must land
    on whole bins — a half-masked bin means fractional boundaries."""
    spec = jnp.ones((16, 8, 50))
    out = np.asarray(time_masking(jax.random.key(3), spec,
                                  time_mask_param=20))
    assert set(np.unique(out)) <= {0.0, 1.0}
    for b in range(16):
        row = out[b, 0]
        masked = np.flatnonzero(row == 0.0)
        if masked.size:  # contiguous whole bins
            assert np.array_equal(masked,
                                  np.arange(masked[0], masked[-1] + 1))
