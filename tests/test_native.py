"""Native C++ data plane (libuitdata) vs pure-numpy reference paths."""

import numpy as np
import pytest

from uit_mobile_tpu import native
from uit_mobile_tpu.data.audio_io import read_wav, write_wav


@pytest.fixture(scope="module", autouse=True)
def built():
    from uit_mobile_tpu.native.build import build

    build()
    assert native.available()


def test_wav_parse_matches_stdlib(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "a.wav"
    write_wav(p, rng.standard_normal(12345).astype(np.float32) * 0.3)
    a, sr_a = read_wav(p)
    b, sr_b = native.read_wav_native(p)
    assert sr_a == sr_b == 16000
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_wav_parse_real_sample():
    a, _ = read_wav("samples/85b877b5_nohash_0.wav")
    b, _ = native.read_wav_native("samples/85b877b5_nohash_0.wav")
    np.testing.assert_array_equal(a, b)


def test_pad_batch_matches_numpy():
    rng = np.random.default_rng(1)
    waves = [rng.standard_normal(n).astype(np.float32)
             for n in (100, 250, 17, 250)]
    got, lens = native.pad_batch_native(waves, threads=3)
    assert got.shape == (4, 250)
    for i, w in enumerate(waves):
        np.testing.assert_array_equal(got[i, : len(w)], w)
        assert (got[i, len(w):] == 0).all()
    np.testing.assert_array_equal(lens, [100, 250, 17, 250])


def test_pad_batch_int16_keeps_pcm_raw():
    rng = np.random.default_rng(2)
    waves = [rng.integers(-32768, 32767, n, dtype=np.int16)
             for n in (64, 200, 31)]
    got, lens = native.pad_batch_native(waves, threads=2)
    assert got.dtype == np.int16 and got.shape == (3, 200)
    for i, w in enumerate(waves):
        np.testing.assert_array_equal(got[i, : len(w)], w)
        assert (got[i, len(w):] == 0).all()
    np.testing.assert_array_equal(lens, [64, 200, 31])


def test_multihot_matches_numpy():
    labs = [[0, 5], [9], [], [3, 3, 900]]  # dup + out-of-range
    got = native.multihot_batch_native(labs, 10)
    want = np.zeros((4, 10), np.float32)
    want[0, [0, 5]] = 1
    want[1, 9] = 1
    want[3, 3] = 1
    np.testing.assert_array_equal(got, want)
