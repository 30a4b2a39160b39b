"""Malformed-input hardening for the HDF5/manifest data plane.

The round-3 verdict asked for fuzzing of the native WAV parser (done in
tests/test_native.py); this file gives the HDF5 dataset + manifest
surfaces the same treatment: every malformed input must either parse to
the documented result or raise a CLEAR, named error — never crash the
interpreter, never silently yield wrong shapes, never read out of
bounds.  Reference surfaces being hardened: utils.read_tsv_data
(utils.py:320-332) and dataset.py:16-141, which assume well-formed
artifacts and fail with bare library errors.
"""

from __future__ import annotations

import random

import h5py
import numpy as np
import pandas as pd
import pytest

from uit_mobile_tpu.data import (
    WeakChunkedHDF5Dataset,
    WeakHDF5Dataset,
    WeakRandomCropHDF5Dataset,
)
from uit_mobile_tpu.data.manifest import multihot, read_tsv_data


# ----------------------------------------------------------------- fixtures

@pytest.fixture()
def h5file(tmp_path):
    path = tmp_path / "waves.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f["a.wav"] = (rng.normal(0, 3000, 16000)).astype(np.int16)
        f["b.wav"] = (rng.normal(0, 3000, 8000)).astype(np.int16)
        f["zero.wav"] = np.zeros(0, dtype=np.int16)
        f["wide.wav"] = np.arange(4000, dtype=np.int32) * 100  # not int16
    return str(path)


def _manifest(h5path, rows):
    return pd.DataFrame(
        [{"filename": f, "labels": l, "hdf5path": h5path} for f, l in rows]
    )


def _write_tsv(tmp_path, text, name="m.tsv"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# ------------------------------------------------------------ manifest text

def test_read_tsv_missing_column_names_the_file(tmp_path):
    p = _write_tsv(tmp_path, "filename labels\na.wav 3\n")
    with pytest.raises(ValueError, match="hdf5path"):
        read_tsv_data(p)
    # the error must name the offending manifest
    with pytest.raises(ValueError, match="m.tsv"):
        read_tsv_data(p)


def test_read_tsv_malformed_labels_names_the_file(tmp_path):
    for bad in ("3;x", "water", "1;;2", ";", "1.5"):
        p = _write_tsv(tmp_path, f"filename labels hdf5path\na.wav {bad} w.h5\n")
        with pytest.raises(ValueError, match="m.tsv"):
            read_tsv_data(p)


def test_read_tsv_short_row_rejected_with_row_index(tmp_path):
    """A row missing its hdf5path cell leaves a NaN that survives
    astype(str) under the pandas arrow backend — it must be rejected
    loudly, not crash later as a float in the basename lambda (this exact
    escape was found by the fuzz loop below)."""
    p = _write_tsv(tmp_path, "filename labels hdf5path\na.wav 3 w.h5\nb.wav 7\n")
    with pytest.raises(ValueError, match="missing"):
        read_tsv_data(p)


def test_read_tsv_good_rows_parse(tmp_path):
    p = _write_tsv(
        tmp_path,
        "filename labels hdf5path\n/x/a.wav 3;527 w.h5\nb.wav 7 w.h5\n",
    )
    df = read_tsv_data(p)
    assert list(df["filename"]) == ["a.wav", "b.wav"]  # basename applied
    assert list(df["labels"].iloc[0]) == [3, 527]
    assert list(df["labels"].iloc[1]) == [7]


def test_read_tsv_fuzz_never_hangs_or_segfaults(tmp_path):
    """~200 random mutations of a valid manifest: every one either parses
    or raises ValueError / pandas parse errors — no other escape."""
    base = "filename labels hdf5path\na.wav 3;527 w.h5\nb.wav 7 w.h5\n"
    rng = random.Random(0xDA7A)
    junk = ["\x00", "\t", ";;", "-1", "99999", "nan", '"', "\\", "🦜", " "]
    for _ in range(200):
        chars = list(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            pos = rng.randrange(len(chars))
            if op == 0:
                chars[pos] = rng.choice(junk)
            elif op == 1:
                chars.insert(pos, rng.choice(junk))
            else:
                del chars[pos]
        p = _write_tsv(tmp_path, "".join(chars), name="fuzz.tsv")
        try:
            df = read_tsv_data(p)
        except Exception as e:
            # any loud Python-level failure is acceptable; silent wrongness
            # and interpreter-level crashes are not
            assert isinstance(e, (ValueError, KeyError, pd.errors.ParserError,
                                  pd.errors.EmptyDataError)), repr(e)
        else:
            # parsed manifests honor the schema contract
            assert {"filename", "labels", "hdf5path"} <= set(df.columns)
            for lab in df["labels"]:
                assert all(isinstance(int(x), int) for x in lab)


# ---------------------------------------------------------------- multihot

def test_multihot_out_of_range_label_raises_with_context():
    with pytest.raises(ValueError, match="600.*num_classes=537"):
        multihot([3, 600], 537)


def test_multihot_negative_dropped_and_empty_ok():
    t = multihot([-1, 5], 10)
    assert t[5] == 1.0 and t.sum() == 1.0
    assert multihot([], 10).sum() == 0.0
    assert multihot([-3], 10).sum() == 0.0


def test_native_multihot_contract_documented_drop():
    """The collate-side native scatter DROPS out-of-range (both backends);
    the dataset-side manifest.multihot raises. Pin both halves."""
    from uit_mobile_tpu.native import multihot_batch_native

    out = multihot_batch_native([[3, 600, -1], [2]], 10)
    assert out.shape == (2, 10)
    assert out[0, 3] == 1.0 and out[0].sum() == 1.0
    assert out[1, 2] == 1.0 and out[1].sum() == 1.0


# ----------------------------------------------------------- dataset reads

def test_missing_hdf5_key_error_names_file_and_key(h5file):
    ds = WeakHDF5Dataset(_manifest(h5file, [("nope.wav", [1])]), num_classes=10)
    with pytest.raises(KeyError) as ei:
        ds[0]
    msg = str(ei.value)
    assert "nope.wav" in msg and "waves.h5" in msg and "basename" in msg


def test_missing_key_error_on_crop_and_chunked_variants(h5file):
    crop = WeakRandomCropHDF5Dataset(
        _manifest(h5file, [("nope.wav", [1])]), chunk_length=1.0, num_classes=10)
    with pytest.raises(KeyError, match="nope.wav"):
        crop[0]
    df = _manifest(h5file, [("nope.wav", [1])])
    df["from"], df["to"] = 0.0, 0.5
    chunked = WeakChunkedHDF5Dataset(df, num_classes=10)
    with pytest.raises(KeyError, match="nope.wav"):
        chunked[0]


def test_out_of_range_label_surfaces_at_dataset_access(h5file):
    ds = WeakHDF5Dataset(_manifest(h5file, [("a.wav", [99])]), num_classes=10)
    with pytest.raises(ValueError, match="99.*num_classes=10"):
        ds[0]


def test_zero_length_waveform_pads_to_silence(h5file):
    """A 0-sample clip must not crash the crop dataset: it random-pads to
    the chunk length (all zeros), matching the short-clip rule."""
    ds = WeakRandomCropHDF5Dataset(
        _manifest(h5file, [("zero.wav", [1])]), chunk_length=0.25,
        num_classes=10, rng=random.Random(0))
    wav, target, fname = ds[0]
    assert wav.shape == (4000,) and wav.dtype == np.float32
    assert np.all(wav == 0.0) and target[1] == 1.0


def test_int16_mode_rejects_wider_integer_storage(h5file):
    ds = WeakHDF5Dataset(_manifest(h5file, [("wide.wav", [1])]),
                         num_classes=10, dtype="int16")
    with pytest.raises(ValueError, match="int16"):
        ds[0]


def test_chunked_interval_outside_clip_raises(h5file):
    df = _manifest(h5file, [("b.wav", [1])])  # 8000 samples = 0.5 s
    df["from"], df["to"] = 2.0, 3.0  # entirely past the clip
    ds = WeakChunkedHDF5Dataset(df, num_classes=10)
    with pytest.raises(ValueError, match="outside"):
        ds[0]


def test_chunked_negative_from_clamps_not_wraps(h5file):
    """A negative 'from' must clamp to 0, NOT h5py-wrap to the clip tail."""
    df = _manifest(h5file, [("a.wav", [1])])
    df["from"], df["to"] = -0.5, 0.25
    ds = WeakChunkedHDF5Dataset(df, num_classes=10)
    wav, _, _ = ds[0]
    with h5py.File(h5file, "r") as f:
        head = f["a.wav"][:4000].astype(np.float32) / 32768.0
    np.testing.assert_array_equal(wav, head)


def test_truncated_hdf5_file_fails_loudly(tmp_path, h5file):
    """A corrupt (truncated) HDF5 container raises an OSError naming the
    path — not garbage data."""
    raw = open(h5file, "rb").read()
    bad = tmp_path / "trunc.h5"
    bad.write_bytes(raw[: len(raw) // 3])
    ds = WeakHDF5Dataset(_manifest(str(bad), [("a.wav", [1])]), num_classes=10)
    with pytest.raises(Exception) as ei:
        ds[0]
    assert isinstance(ei.value, (OSError, KeyError))


def test_dataset_fuzz_manifest_rows(h5file):
    """Random bad rows against a good HDF5: every access raises a clear
    Python error (KeyError/ValueError) or returns a well-formed item."""
    rng = random.Random(0x5EED)
    names = ["a.wav", "b.wav", "zero.wav", "missing.wav", "", "../a.wav"]
    for _ in range(100):
        labels = [rng.randint(-5, 15) for _ in range(rng.randint(0, 3))]
        df = _manifest(h5file, [(rng.choice(names), labels)])
        ds = WeakHDF5Dataset(df, num_classes=10)
        try:
            wav, target, fname = ds[0]
        except (KeyError, ValueError):
            continue
        assert wav.ndim == 1 and wav.dtype == np.float32
        assert target.shape == (10,)
        assert set(np.unique(target)) <= {0.0, 1.0}


# ------------------------------------------------------------- config YAML

def test_config_non_mapping_yaml_rejected(tmp_path):
    from uit_mobile_tpu.utils.config import parse_config_or_kwargs

    for bad in ("just a string\n", "- a\n- b\n", "3.14\n"):
        p = tmp_path / "c.yaml"
        p.write_text(bad)
        with pytest.raises(ValueError, match="YAML mapping"):
            parse_config_or_kwargs(str(p))


def test_config_yaml_fuzz(tmp_path):
    """Random mutations of a valid config: parse or raise ValueError/
    yaml errors — never an unnamed crash."""
    import yaml as _yaml

    from uit_mobile_tpu.utils.config import parse_config_or_kwargs

    base = "model: uit_xs\nbatch_size: 32\nmixup: null\noptimizer: AdamW\n"
    rng = random.Random(0xC0F6)
    junk = [":", "-", "{", "}", "[", "\t", "!!", "&", "*", "#", "%"]
    for _ in range(150):
        chars = list(base)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(3)
            pos = rng.randrange(len(chars))
            if op == 0:
                chars[pos] = rng.choice(junk)
            elif op == 1:
                chars.insert(pos, rng.choice(junk))
            else:
                del chars[pos]
        p = tmp_path / "fuzz.yaml"
        p.write_text("".join(chars))
        try:
            cfg = parse_config_or_kwargs(str(p))
        except Exception as e:
            assert isinstance(e, (ValueError, _yaml.YAMLError)), repr(e)
        else:
            assert isinstance(cfg, dict) and "batch_size" in cfg
