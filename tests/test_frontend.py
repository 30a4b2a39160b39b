"""Frontend parity: pure-JAX log-mel vs committed torch.stft goldens.

Goldens are produced once by tools/gen_goldens.py with PyTorch's C++ FFT —
an implementation wholly independent of the JAX path — and committed.
Replicates reference models/uit.py:298-308 numerics.
"""

from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from uit_mobile_tpu.frontend import (
    FrontendConfig,
    log_mel_spectrogram,
    mel_filterbank,
    spectrogram,
)

GOLDEN = Path(__file__).parent / "goldens" / "frontend_golden.npz"


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/gen_goldens.py first"
    return np.load(GOLDEN)


CFG = FrontendConfig()


def test_mel_filterbank_matches_golden(golden):
    fb = mel_filterbank(CFG)
    assert fb.shape == (257, 64)
    np.testing.assert_allclose(fb, golden["mel_fb"], atol=1e-6)
    # every mel filter should have nonzero support
    assert (fb.sum(axis=0) > 0).all()


@pytest.mark.parametrize("case", ["gsc_sample", "rand_batch", "long_loud", "silence"])
def test_power_spectrogram_matches_torch_stft(golden, case):
    wav = jnp.asarray(golden[f"{case}_wav"])
    power = np.asarray(spectrogram(wav, CFG))
    ref = golden[f"{case}_power"]
    assert power.shape == ref.shape
    np.testing.assert_allclose(power, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("case", ["gsc_sample", "rand_batch", "long_loud", "silence"])
def test_log_mel_matches_torchaudio(golden, case):
    wav = jnp.asarray(golden[f"{case}_wav"])
    logmel = np.asarray(log_mel_spectrogram(wav, CFG))
    ref = golden[f"{case}_logmel"]
    assert logmel.shape == ref.shape
    # f32 FFT rounding differs between JAX and torch's C++ FFT; at spectral
    # valleys this appears as up to ~0.03 dB. The mean deviation must stay
    # in the micro-dB range (it is ~1000x attenuated by init_bn downstream).
    np.testing.assert_allclose(logmel, ref, atol=0.05)
    assert np.mean(np.abs(logmel - ref)) < 5e-3


def test_frame_count_semantics():
    # center=True: 1 + T//hop frames (torch.stft). 1s @ 16k / hop 160 -> 101.
    assert CFG.num_frames(16000) == 101
    wav = jnp.zeros((2, 16000))
    assert spectrogram(wav, CFG).shape == (2, 257, 101)


def test_per_sample_top_db_mode():
    cfg = FrontendConfig(top_db_mode="per_sample")
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    a = np.asarray(log_mel_spectrogram(wav, cfg))
    # per-sample mode must equal running each clip alone in torch mode
    for i in range(2):
        solo = np.asarray(log_mel_spectrogram(wav[i : i + 1], FrontendConfig()))
        np.testing.assert_allclose(a[i], solo[0], atol=1e-5)
