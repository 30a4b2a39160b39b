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


# ------------------------------------------- untrusted-bytes hardening
# The RIFF parser consumes untrusted bytes (HTTP bodies, on-disk files)
# with manual bounds arithmetic in C++ — these tests pin the failure
# contract: every malformed input yields a CLEAN error code (1 bad
# header, 2 fmt-after-data, 3 unsupported codec, 4 no data chunk, 5
# zero frames/channels), never a crash or out-of-bounds view, and the
# Python stdlib fallback (data/audio_io.read_wav) fails cleanly on the
# same inputs (raises, never crashes).


def _wav_blob(n_frames=100, channels=1, sr=16000, bits=16, codec=1,
              data_len=None, fmt_len=16, riff_len=None, pre_chunks=b"",
              fmt_first=True, seed=0):
    """Hand-rolled RIFF builder with every field overridable (lying
    lengths included)."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-3000, 3000, n_frames * channels,
                       dtype=np.int16).tobytes()
    if data_len is None:
        data_len = len(pcm)
    import struct

    fmt_body = struct.pack("<HHIIHH", codec, channels, sr,
                           sr * channels * bits // 8,
                           channels * bits // 8, bits)
    # Physical body is capped at 64 bytes: a huge fmt_len LIES in the
    # header (the point of the test) rather than materializing gigabytes.
    phys_len = min(max(fmt_len, 0), 64)
    fmt_body = fmt_body.ljust(phys_len, b"\0")[:phys_len]
    fmt = b"fmt " + struct.pack("<I", fmt_len) + fmt_body
    data = b"data" + struct.pack("<I", data_len & 0xFFFFFFFF) + pcm
    chunks = pre_chunks + (fmt + data if fmt_first else data + fmt)
    if riff_len is None:
        riff_len = 4 + len(chunks)
    return b"RIFF" + struct.pack("<I", riff_len & 0xFFFFFFFF) + b"WAVE" + chunks


def _buf_bounds(buf):
    import ctypes

    base = ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p).value
    return base, base + len(buf)


def _assert_clean(buf):
    """Parse must return a sane rc; on success the view must be in-bounds."""
    rc, pcm, channels, sr = native.parse_wav16_native(buf)
    assert rc in (0, 1, 2, 3, 4, 5), rc
    if rc == 0:
        assert pcm is not None and channels >= 1
        lo, hi = _buf_bounds(buf)
        addr = pcm.ctypes.data
        assert lo <= addr and addr + pcm.nbytes <= hi, (
            "zero-copy view escapes the input buffer")
    return rc


class TestWavParserHardening:
    def test_valid_blob_round_trips(self):
        buf = _wav_blob(n_frames=50, channels=2)
        rc, pcm, ch, sr = native.parse_wav16_native(buf)
        assert (rc, ch, sr) == (0, 2, 16000) and pcm.shape[0] == 100
        # stdlib agrees bit-for-bit
        from uit_mobile_tpu.data.audio_io import read_wav_bytes

        ref, ref_sr = read_wav_bytes(buf)
        np.testing.assert_array_equal(
            (ref * 32768).astype(np.int16),
            pcm.reshape(-1, 2).T)

    def test_truncations_every_length(self):
        """Every prefix of a valid file parses cleanly (the classic
        truncated-download case)."""
        buf = _wav_blob(n_frames=30)
        for n in range(len(buf)):
            rc = _assert_clean(buf[:n])
            if n < 12:
                assert rc == 1
        assert _assert_clean(buf) == 0

    def test_lying_chunk_lengths(self):
        # data chunk claims more bytes than exist -> clamped, still parses
        buf = _wav_blob(n_frames=30, data_len=10_000_000)
        rc, pcm, ch, _ = native.parse_wav16_native(buf)
        assert rc == 0 and pcm.shape[0] == 30  # clamped to real bytes
        _assert_clean(buf)
        # near-UINT32_MAX lengths must not overflow the chunk walk
        for dl in (0xFFFFFFFF, 0xFFFFFFF8, 0x7FFFFFFF):
            _assert_clean(_wav_blob(n_frames=30, data_len=dl))
            _assert_clean(_wav_blob(n_frames=30, fmt_len=dl))
        # fmt chunk claiming past EOF: never parsed as fmt
        assert _assert_clean(_wav_blob(fmt_len=0xFFFFFF00)) in (2, 4)

    def test_zero_channels_and_degenerate_fmt(self):
        assert _assert_clean(_wav_blob(channels=0)) == 5
        assert _assert_clean(_wav_blob(fmt_len=15)) in (2, 4)  # short fmt
        assert _assert_clean(_wav_blob(n_frames=0)) == 5  # empty data

    def test_non_pcm_codecs_rejected(self):
        for codec in (0, 2, 6, 7, 85, 0x674F):
            assert _assert_clean(_wav_blob(codec=codec)) == 3
        for bits in (8, 24, 32):
            assert _assert_clean(_wav_blob(bits=bits)) == 3

    def test_data_before_fmt_rejected(self):
        assert _assert_clean(_wav_blob(fmt_first=False)) == 2

    def test_odd_byte_counts(self):
        buf = _wav_blob(n_frames=30)
        # strip one byte off the data body: frames floor to 29
        rc, pcm, _, _ = native.parse_wav16_native(buf[:-1])
        assert rc == 0 and pcm.shape[0] == 29
        # odd-length pre-chunk: word-alignment padding must be honored
        pre = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\0"
        assert _assert_clean(_wav_blob(pre_chunks=pre)) == 0

    def test_not_riff_at_all(self):
        for junk in (b"", b"R", b"RIFF", b"OggS" + b"\0" * 40,
                     b"RIFF\xff\xff\xff\xffWAVE"):
            assert _assert_clean(junk) in (1, 4)

    def test_fuzz_random_mutations(self, tmp_path):
        """~300 random mutations of a valid file: byte flips, truncations,
        splices. The native parser must stay clean AND in-bounds; the
        Python fallback (what read_wav_native degrades to) must either
        decode or raise — both sides crash-free on every case."""
        import io
        import wave

        base = bytearray(_wav_blob(n_frames=64, channels=1))
        rng = np.random.default_rng(42)
        for it in range(300):
            m = bytearray(base)
            kind = it % 3
            if kind == 0:  # flip 1-8 bytes anywhere
                for _ in range(int(rng.integers(1, 9))):
                    m[int(rng.integers(0, len(m)))] = int(rng.integers(256))
            elif kind == 1:  # truncate
                m = m[: int(rng.integers(0, len(m)))]
            else:  # splice random bytes into a random offset
                at = int(rng.integers(0, len(m)))
                ins = rng.integers(0, 256, int(rng.integers(1, 64)),
                                   dtype=np.uint8).tobytes()
                m = m[:at] + bytearray(ins) + m[at:]
            buf = bytes(m)
            _assert_clean(buf)  # native: clean rc, in-bounds view
            try:  # stdlib fallback: decode or raise, never crash
                with wave.open(io.BytesIO(buf), "rb") as f:
                    f.readframes(min(f.getnframes(), 1 << 20))
            except Exception:
                pass

    def test_read_wav_native_malformed_file_raises_cleanly(self, tmp_path):
        """End-to-end: a malformed FILE goes native-parse -> rc!=0 ->
        Python fallback -> clean exception (never a crash/garbage)."""
        p = tmp_path / "bad.wav"
        p.write_bytes(_wav_blob(codec=85))  # mp3-in-wav
        with pytest.raises(Exception):
            native.read_wav_native(p)
        p.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
        with pytest.raises(Exception):
            native.read_wav_native(p)
