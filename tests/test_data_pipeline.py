"""Host data pipeline: synthetic HDF5 + manifest end-to-end."""

import numpy as np
import pandas as pd
import pytest
import h5py

from uit_mobile_tpu.data import (
    BalancedSampler,
    DataLoader,
    MultiDataLoader,
    WeakHDF5Dataset,
    WeakRandomCropHDF5Dataset,
    collate,
    pad_batch,
    read_tsv_data,
)


@pytest.fixture()
def synth(tmp_path):
    """Build a tiny HDF5 + TSV manifest (the WeakHDF5Dataset contract)."""
    rng = np.random.default_rng(0)
    h5 = tmp_path / "data.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(10):
            n = rng.integers(8000, 18000)
            f[f"clip_{i}.wav"] = (rng.standard_normal(n) * 3000).astype(np.int16)
            labels = ";".join(map(str, sorted(rng.choice(537, size=rng.integers(1, 3), replace=False))))
            rows.append((f"clip_{i}.wav", labels, str(h5)))
    tsv = tmp_path / "labels.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False
    )
    return tsv, h5


def test_read_tsv_and_dataset(synth):
    tsv, _ = synth
    df = read_tsv_data(tsv)
    assert len(df) == 10
    ds = WeakHDF5Dataset(df, num_classes=537)
    wav, target, fname = ds[0]
    assert wav.dtype == np.float32 and np.abs(wav).max() <= 1.0
    assert target.shape == (537,) and target.sum() >= 1
    assert fname == "clip_0.wav"


def test_random_crop_dataset(synth):
    tsv, _ = synth
    df = read_tsv_data(tsv)
    ds = WeakRandomCropHDF5Dataset(df, chunk_length=1.0, num_classes=537)
    for i in range(len(ds)):
        wav, target, _ = ds[i]
        assert wav.shape == (16000,), "crops must be exactly 1s"


def test_pad_and_collate(synth):
    tsv, _ = synth
    df = read_tsv_data(tsv)
    ds = WeakHDF5Dataset(df, num_classes=537)
    samples = [ds[i] for i in range(4)]
    batch = collate(samples)
    assert batch["wav"].shape[0] == 4
    assert batch["wav"].shape[1] == max(batch["lengths"])
    # right padding: values beyond each length are zero
    for i, L in enumerate(batch["lengths"]):
        assert (batch["wav"][i, L:] == 0).all()


def test_collate_routes_native_only_in_win_region(monkeypatch):
    """The C++ assembler engages only for long clips at B<=256 (its
    measured win region, tools/probe_collate.py); short clips and big
    batches take numpy's row-memcpy path."""
    from uit_mobile_tpu import native
    from uit_mobile_tpu.data import hdf5 as hdf5_mod

    calls = []

    def fake_pad(waves, threads=0):
        calls.append(len(waves))
        return hdf5_mod.pad_batch(waves)

    monkeypatch.setattr(native, "available", lambda: True)
    monkeypatch.setattr(native, "pad_batch_native", fake_pad)

    def mk(n, length):
        t = np.zeros(537, np.float32)
        return [(np.ones(length, np.int16), t, f"f{i}") for i in range(n)]

    collate(mk(4, 160_000))  # long clips, small batch -> native
    assert calls == [4]
    collate(mk(4, 16_000))  # short clips -> numpy
    assert calls == [4]
    collate(mk(257, 160_000))  # big batch -> numpy
    assert calls == [4]


def test_dataloader_order_and_len(synth):
    tsv, _ = synth
    df = read_tsv_data(tsv)
    ds = WeakHDF5Dataset(df, num_classes=537)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    assert len(loader) == 3
    names = [n for b in loader for n in b["filenames"]]
    assert names == [f"clip_{i}.wav" for i in range(10)], "sequential order"


def test_multidataloader_infinite(synth):
    tsv, _ = synth
    df = read_tsv_data(tsv)
    ds = WeakHDF5Dataset(df, num_classes=537)
    mdl = MultiDataLoader(
        a=DataLoader(ds, batch_size=4, shuffle=False),
        b=DataLoader(ds, batch_size=3, shuffle=False),
    )
    it = iter(mdl)
    seen = [next(it) for _ in range(10)]  # > one epoch of both children
    assert all(set(b) == {"a", "b"} for b in seen)
    assert len(mdl) == 3  # min over children


def test_balanced_sampler_reweights(synth):
    # class 0 is rare; balanced sampling should upweight it
    labels = pd.Series([[1]] * 50 + [[0]] * 2)
    sampler = BalancedSampler(labels, random_state=0)
    # exact reference weighting (dataset.py:219-223): w = 1000/(count+100)
    w_common, w_rare = 1000 / 150, 1000 / 102
    p_rare = w_rare / (50 * w_common + 2 * w_rare)
    np.testing.assert_allclose(sampler._p[-1], p_rare, rtol=1e-9)
    assert sampler._p[-1] > sampler._p[0]
    idxs = np.fromiter(iter(sampler), dtype=int)
    assert len(idxs) == 52 and idxs.min() >= 0 and idxs.max() < 52


def test_random_crop_short_clip_random_insert(synth, tmp_path):
    h5 = tmp_path / "short.h5"
    with h5py.File(h5, "w") as f:
        f["s.wav"] = (np.ones(4000) * 10000).astype(np.int16)
    df = pd.DataFrame([("s.wav", "3", str(h5))], columns=["filename", "labels", "hdf5path"])
    df["labels"] = df["labels"].apply(lambda x: [int(x)])
    ds = WeakRandomCropHDF5Dataset(df, chunk_length=1.0, num_classes=10)
    wav, _, _ = ds[0]
    assert wav.shape == (16000,)
    assert np.count_nonzero(wav) == 4000  # zero-padded insert
