"""Dataset preparation: GSC split/labeling + AudioSet manifest building,
driven on synthetic wav trees."""

import numpy as np
import pandas as pd
import h5py

from uit_mobile_tpu.data.audio_io import write_wav
from uit_mobile_tpu.data.prep import (
    LABEL_MAPS_GSC_AUDIOSET,
    build_audioset_manifest,
    dump_waves,
    prepare_gsc,
    wav_duration_seconds,
)
from uit_mobile_tpu.data import read_tsv_data, WeakHDF5Dataset


def test_gsc_label_map_contract():
    # 10 keywords at 527-536, 20 fillers at 0 (SURVEY #31, reference
    # gsc/2_prepare_data.py:9-37)
    kws = {k: v for k, v in LABEL_MAPS_GSC_AUDIOSET.items() if v != 0}
    assert len(LABEL_MAPS_GSC_AUDIOSET) == 30
    assert sorted(kws.values()) == list(range(527, 537))
    assert kws == {"down": 527, "go": 528, "left": 529, "no": 530, "off": 531,
                   "on": 532, "right": 533, "stop": 534, "up": 535, "yes": 536}


def _make_gsc_tree(root, rng):
    words = ["on", "off", "bed", "cat"]
    files = {}
    for w in words:
        for i in range(3):
            p = root / w / f"clip{i}.wav"
            write_wav(p, rng.standard_normal(16000).astype(np.float32) * 0.1)
            files.setdefault(w, []).append(f"{w}/clip{i}.wav")
    (root / "_background_noise_").mkdir()
    write_wav(root / "_background_noise_" / "noise.wav",
              rng.standard_normal(16000).astype(np.float32) * 0.1)
    (root / "validation_list.txt").write_text("on/clip1.wav\nbed/clip1.wav\n")
    (root / "testing_list.txt").write_text("on/clip2.wav\ncat/clip2.wav\n")
    return files


def test_prepare_gsc_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    _make_gsc_tree(raw, rng)
    out = prepare_gsc(raw, tmp_path / "data")

    test_df = read_tsv_data(out["test"], basename=False)
    assert len(test_df) == 2
    train_df = pd.read_csv(out["train"], sep="\t")
    # train keywords get dual "0;532"; fillers plain 0
    on_rows = train_df[train_df["filename"].str.contains("/on/")]
    assert (on_rows["labels"] == "0;532").all()
    bed_rows = train_df[train_df["filename"].str.contains("/bed/")]
    assert (bed_rows["labels"].astype(str) == "0").all()
    # background noise excluded, splits disjoint
    assert not train_df["filename"].str.contains("noise").any()
    assert len(train_df) == 12 - 4  # 12 labeled files, 2 valid + 2 test out

    # the produced artifacts feed the real dataset class
    ds = WeakHDF5Dataset(test_df, num_classes=537)
    wav, target, fname = ds[0]
    assert wav.shape == (16000,)
    assert target.sum() >= 1


def test_build_audioset_manifest(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "audio"
    root.mkdir()
    # two valid clips + one missing + one empty file
    write_wav(root / "ytid1_0.000_10.000.wav", rng.standard_normal(16000) * 0.1)
    write_wav(root / "ytid2_5.000_15.000.wav", rng.standard_normal(32000) * 0.1)
    (root / "ytid4_0.000_10.000.wav").write_bytes(b"")
    seg = tmp_path / "segments.csv"
    seg.write_text(
        "# header\n# header\n# header\n"
        'ytid1, 0.000, 10.000, "/m/09x0r"\n'
        'ytid2, 5.000, 15.000, "/m/09x0r,/m/05zppz"\n'
        'ytid3, 0.000, 10.000, "/m/09x0r"\n'
        'ytid4, 0.000, 10.000, "/m/09x0r"\n'
    )
    cli = tmp_path / "class_labels_indices.csv"
    cli.write_text("index,mid,display_name\n0,/m/09x0r,Speech\n1,/m/05zppz,Male\n")
    df = build_audioset_manifest(root, seg, cli)
    assert len(df) == 2
    assert set(df["labels"]) == {"0", "0;1"}
    assert (df["duration"] > 0.5).all()


def test_dump_waves_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    wavs = []
    for i in range(3):
        p = tmp_path / f"w{i}.wav"
        write_wav(p, rng.standard_normal(8000).astype(np.float32) * 0.2)
        wavs.append(str(p))
    df = pd.DataFrame({"filename": wavs})
    h5 = tmp_path / "out.h5"
    dump_waves(df, h5, progress=False)
    with h5py.File(h5) as f:
        assert set(f.keys()) == {"w0.wav", "w1.wav", "w2.wav"}
        assert f["w0.wav"].dtype == np.int16
    assert wav_duration_seconds(wavs[0]) == 0.5
