"""ctypes bindings for libuitdata (native host data plane).

Falls back to numpy implementations transparently when the shared library
has not been built — `available()` reports which path is active. Build
with ``python -m uit_mobile_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent / "libuitdata.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False  # permanent numpy fallback for this process


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not _LIB_PATH.exists():
        try:  # best-effort lazy build (g++ is in the image)
            from .build import build

            build()
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    if not hasattr(lib, "uit_pad_batch_i16"):
        # Stale .so built from an older tree. Rebuild on disk for the NEXT
        # process; this one keeps the numpy fallback — re-dlopen of the
        # same path can return the already-mapped stale handle, and the
        # symbol/prototype setup below would then be wrong.
        try:
            from .build import build

            build(force=True)
        except Exception:
            pass
        _load_failed = True
        return None
    lib.uit_parse_wav16.restype = ctypes.c_int
    lib.uit_parse_wav16.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.uit_pad_batch_pcm16.restype = None
    lib.uit_pad_batch_f32.restype = None
    lib.uit_pad_batch_i16.restype = None
    lib.uit_multihot.restype = None
    lib.uit_version.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_wav16_native(buf: bytes):
    """Low-level zero-copy RIFF parse of an in-memory blob.

    -> (rc, pcm_int16_view_or_None, channels, sample_rate). rc is
    uit_parse_wav16's error code (0 ok, 1 bad header, 2 no fmt before
    data, 3 unsupported codec, 4 no data chunk — uitdata.cc:28-77;
    5 parsed but zero frames or channels, produced HERE so callers have
    one success condition); on
    rc==0 the int16 array VIEWS `buf` (caller keeps `buf` alive). The
    parser is defensive against untrusted bytes: lying chunk lengths
    clamp to the buffer, truncated chunks terminate the walk — fuzzed in
    tests/test_native.py. Returns rc=-1 when the library isn't built."""
    lib = _load()
    if lib is None:
        return -1, None, 0, 0
    data_ptr = ctypes.POINTER(ctypes.c_int16)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.uit_parse_wav16(buf, len(buf), ctypes.byref(data_ptr),
                             ctypes.byref(frames), ctypes.byref(channels),
                             ctypes.byref(sr))
    if rc != 0 or channels.value <= 0 or frames.value <= 0:
        # treat zero frames/channels (parses, reshapes to nothing) like a
        # parse failure so every caller has ONE success condition
        return (rc if rc != 0 else 5), None, channels.value, sr.value
    n = frames.value * channels.value
    pcm = np.ctypeslib.as_array(data_ptr, shape=(n,))
    return 0, pcm, channels.value, sr.value


def read_wav_native(path) -> tuple[np.ndarray, int]:
    """RIFF parse + int16->f32 via libuitdata; (channels, T) float32, sr."""
    lib = _load()
    if lib is None:
        from ..data.audio_io import read_wav

        return read_wav(path)
    buf = Path(path).read_bytes()
    rc, pcm, channels, sr = parse_wav16_native(buf)
    if rc != 0:
        # non-16-bit formats, or a malformed header — same clean fallback
        from ..data.audio_io import read_wav

        return read_wav(path)
    out = np.empty(pcm.shape[0], dtype=np.float32)
    lib.uit_pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pcm.shape[0]),
    )
    return out.reshape(-1, channels).T.copy(), sr


def pad_batch_native(waves: Sequence[np.ndarray], threads: int = 4):
    """Right-zero-padded (B, max_len) batch via native threads.

    Batch dtype follows the waves': int16 clips assemble into an int16
    batch (raw-PCM fast path, no conversion), anything else into f32."""
    lib = _load()
    if not waves:
        raise ValueError("pad_batch_native: empty batch")
    if any(w.ndim != 1 for w in waves):
        # the C copy reads lengths[i] CONTIGUOUS samples — a (C, T) clip
        # would silently keep only channel 0 (the numpy path would raise
        # a broadcast error); reject both paths identically
        raise ValueError(
            "pad_batch_native: clips must be 1-D (T,) mono waveforms"
        )
    pcm16 = waves[0].dtype == np.int16
    # a silent int16/float mix would truncate the floats to ~all-zeros —
    # a real raise (not assert): must survive python -O
    if not all((w.dtype == np.int16) == pcm16 for w in waves):
        raise ValueError(
            "pad_batch_native: mixed int16/float waveforms in one batch"
        )
    if lib is None:
        # the ONE numpy pad lives in data.hdf5 (no import cycle: hdf5
        # imports native only inside collate)
        from ..data.hdf5 import pad_batch

        data, lengths32 = pad_batch(waves)
        return data, lengths32
    lengths = np.asarray([w.shape[-1] for w in waves], dtype=np.int64)
    max_len = int(lengths.max())
    b = len(waves)
    dtype = np.int16 if pcm16 else np.float32
    out = np.empty((b, max_len), dtype=dtype)
    ctype = ctypes.c_int16 if pcm16 else ctypes.c_float
    contig = [np.ascontiguousarray(w, dtype=dtype) for w in waves]
    ptrs = (ctypes.POINTER(ctype) * b)(
        *[w.ctypes.data_as(ctypes.POINTER(ctype)) for w in contig]
    )
    fn = lib.uit_pad_batch_i16 if pcm16 else lib.uit_pad_batch_f32
    fn(
        ptrs, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(b), ctypes.c_int64(max_len),
        out.ctypes.data_as(ctypes.POINTER(ctype)),
        ctypes.c_int32(threads),
    )
    return out, lengths.astype(np.int32)


def multihot_batch_native(label_lists: Sequence[Sequence[int]], n_classes: int):
    """Batch multi-hot scatter (C++ when built, numpy fallback).

    Contract note: out-of-range indices are silently DROPPED here (both
    backends agree — tests/test_native.py), because this is the collate-
    side utility for already-validated label lists. The dataset-level
    ``data.manifest.multihot`` instead RAISES on an out-of-range label:
    there it's a manifest/num_classes mismatch the user must fix."""
    lib = _load()
    b = len(label_lists)
    if lib is None:
        out = np.zeros((b, n_classes), dtype=np.float32)
        for i, labs in enumerate(label_lists):
            idx = np.asarray(list(labs), dtype=np.int64)
            idx = idx[(idx >= 0) & (idx < n_classes)]
            out[i, idx] = 1.0
        return out
    flat = []
    offsets = np.zeros(b + 1, dtype=np.int64)
    for i, labs in enumerate(label_lists):
        flat.extend(int(x) for x in labs)
        offsets[i + 1] = len(flat)
    flat_arr = np.asarray(flat, dtype=np.int32)
    out = np.empty((b, n_classes), dtype=np.float32)
    lib.uit_multihot(
        flat_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(b), ctypes.c_int32(n_classes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
