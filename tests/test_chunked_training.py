"""Strong-label (interval) manifests: the chunked dataset trains.

The reference ships WeakChunkedHDF5Dataset as dead code (dataset.py:
104-141 — run.py never builds it). Here manifests carrying 'from'/'to'
columns route to it automatically in the Trainer, with crop/pad WITHIN
the labeled interval for static shapes."""

import numpy as np
import pandas as pd
import pytest
import h5py

from uit_mobile_tpu.data import WeakChunkedHDF5Dataset, read_tsv_data


@pytest.fixture()
def strong_env(tmp_path):
    """Clips with labeled event intervals; event region carries a marker
    value so tests can assert reads stay inside [from, to)."""
    h5 = tmp_path / "strong.h5"
    rows = []
    sr = 16000
    with h5py.File(h5, "w") as f:
        for i in range(12):
            clip = np.zeros(4 * sr, np.int16)  # 4 s of silence
            lo, hi = (i % 3) * sr, (i % 3) * sr + sr + 4000  # 1.25 s event
            clip[lo:hi] = 1000 + i  # marker
            f[f"s_{i}.wav"] = clip
            rows.append((f"s_{i}.wav", str(i % 5), str(h5),
                         lo / sr, hi / sr))
    tsv = tmp_path / "strong.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                "from", "to"]).to_csv(tsv, sep="\t", index=False)
    return tsv, h5


def test_chunked_raw_interval_read(strong_env):
    tsv, _ = strong_env
    df = read_tsv_data(tsv, basename=False)
    ds = WeakChunkedHDF5Dataset(df, num_classes=537)
    wav, target, _ = ds[3]
    assert wav.shape[-1] == 16000 + 4000  # the exact interval
    assert (np.abs(wav) > 0).all()  # marker region only
    assert target[3 % 5] == 1.0 and target.sum() == 1.0


def test_chunked_fixed_length_crops_within_interval(strong_env):
    import random

    tsv, _ = strong_env
    df = read_tsv_data(tsv, basename=False)
    ds = WeakChunkedHDF5Dataset(df, num_classes=537, fixed_length=1.0,
                                rng=random.Random(0))
    for idx in range(len(df)):
        wav, _, _ = ds[idx]
        assert wav.shape[-1] == 16000  # static shape
        # interval is 1.25 s > 1 s: a crop, entirely inside the event
        assert (np.abs(wav) > 0).all(), idx


def test_chunked_fixed_length_pads_short_interval(tmp_path):
    h5 = tmp_path / "short.h5"
    sr = 16000
    with h5py.File(h5, "w") as f:
        clip = np.zeros(2 * sr, np.int16)
        clip[sr // 2: sr // 2 + 4000] = 777  # 0.25 s event
        f["c.wav"] = clip
    tsv = tmp_path / "short.tsv"
    pd.DataFrame([("c.wav", "9", str(h5), 0.5, 0.75)],
                 columns=["filename", "labels", "hdf5path", "from", "to"]
                 ).to_csv(tsv, sep="\t", index=False)
    df = read_tsv_data(tsv, basename=False)
    ds = WeakChunkedHDF5Dataset(df, num_classes=537, fixed_length=1.0)
    wav, target, _ = ds[0]
    assert wav.shape[-1] == sr
    nz = np.flatnonzero(np.abs(wav) > 0)
    assert nz.size == 4000  # whole event present, zero-padded around it
    assert target[9] == 1.0


def test_trainer_auto_routes_interval_manifests(tmp_path, strong_env):
    from uit_mobile_tpu.train.loop import Trainer

    tsv, _ = strong_env
    # kws side: plain weak manifest
    sr = 16000
    h5 = tmp_path / "kws.h5"
    rows = []
    rng = np.random.default_rng(1)
    with h5py.File(h5, "w") as f:
        for i in range(8):
            f[f"k_{i}.wav"] = (rng.standard_normal(sr) * 3000).astype(np.int16)
            rows.append((f"k_{i}.wav", str(527 + i % 10), str(h5)))
    ktsv = tmp_path / "kws.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        ktsv, sep="\t", index=False)

    config = dict(
        outputpath=str(tmp_path / "exp"), num_classes=537, model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1}, batch_size=4,
        epochs=1, epoch_length=2, warmup_iters=1, chunk_length=1.0,
        optimizer="AdamW", optimizer_args={"lr": 1e-3}, n_saved=1,
        num_workers=0, valid_every=1, seed=0, config_stem="strong",
        audioset_train_data=str(tsv), audioset_eval_data=str(ktsv),
        kws_train_data=str(ktsv), kws_test_data=str(ktsv), basename=False,
    )
    tr = Trainer(config)
    train_loader, _ = tr._build_data()
    ds = train_loader.loaders["audioset"].dataset
    assert isinstance(ds, WeakChunkedHDF5Dataset)
    batch = next(iter(train_loader))
    assert batch["audioset"]["wav"].shape[-1] == 16000  # static interval crops
