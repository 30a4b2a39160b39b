"""Offline dataset preparation (AudioSet + Google Speech Commands V1).

Library implementations behind the thin scripts in ``datasets/``. Same
artifact contracts as the reference's one-shot prep layer (reference
datasets/: gsc/2_prepare_data.py, utils/dump_audio_to_hdf5.py,
utils/prepare_label_list.py):

- HDF5 blobs of int16 PCM keyed by basename (AudioSet) or full path (GSC);
- TSV manifests with ``filename  labels(";"-ints)  hdf5path`` columns;
- GSC label mapping: the 10 target keywords -> indices 527-536 appended
  after the 527 AudioSet classes; the other 20 words -> 0 (= Speech);
  train-split keywords get the dual label "0;<idx>".

torch-free and soundfile-free: wav decode via the stdlib-based
data.audio_io reader; duration via the wav header.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np
import pandas as pd

from .audio_io import read_wav

# keyword -> merged-index map (GSC V1's 30 words; 10 keywords, 20 fillers)
LABEL_MAPS_GSC_AUDIOSET = {
    "bed": 0, "bird": 0, "cat": 0, "dog": 0, "down": 527, "eight": 0,
    "five": 0, "four": 0, "go": 528, "happy": 0, "house": 0, "left": 529,
    "marvin": 0, "nine": 0, "no": 530, "off": 531, "on": 532, "one": 0,
    "right": 533, "seven": 0, "sheila": 0, "six": 0, "stop": 534,
    "three": 0, "tree": 0, "two": 0, "up": 535, "wow": 0, "yes": 536, "zero": 0,
}


def wav_duration_seconds(path) -> float:
    with wave.open(str(path), "rb") as f:
        return round(f.getnframes() / f.getframerate(), 1)


def dump_waves(df: pd.DataFrame, output: Path, use_fullname: bool = False,
               progress: bool = True) -> None:
    """Dump each manifest row's wav into one HDF5 as int16 PCM."""
    import h5py

    it = df["filename"].unique()
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it, unit="file")
        except ImportError:
            pass
    with h5py.File(output, "w") as store:
        for fname in it:
            wav, _ = read_wav(fname)
            pcm = np.clip(wav[0] * 32768.0, -32768, 32767).astype(np.int16)
            key = str(fname) if use_fullname else Path(fname).name
            if key in store:
                print(f"Warning, {fname} already exists!")
                continue
            store[key] = pcm


def build_audioset_manifest(root_data_dir, segments_csv, class_labels_indices,
                            min_duration: float = 0.1) -> pd.DataFrame:
    """Scan downloaded AudioSet wavs -> manifest (filename, labels, duration).

    Files are named ``{ytid}_{start}_{end}.wav``; mids map to int indices
    via the class_labels_indices CSV; empty/corrupt/short files filtered.
    """
    df = pd.read_csv(
        segments_csv, sep=r"\s+", skiprows=3, engine="python",
        names=["file_id", "start", "end", "labels"], dtype=object,
    )
    df = df[df.columns].replace(",$", "", regex=True)
    mid_to_index = (
        pd.read_csv(class_labels_indices).set_index("mid")["index"].to_dict()
    )
    root = Path(root_data_dir).absolute()

    rows = []
    for _, row in df.iterrows():
        fname = root / f"{row['file_id']}_{row['start']}_{row['end']}.wav"
        if not (fname.exists() and fname.stat().st_size > 0):
            continue
        try:
            duration = wav_duration_seconds(fname)
        except (EOFError, wave.Error):
            continue
        if duration <= min_duration:
            continue
        labels = ";".join(
            str(mid_to_index[m]) for m in row["labels"].strip('"').split(",")
        )
        rows.append({"filename": str(fname), "labels": labels, "duration": duration})
    return pd.DataFrame(rows)


def prepare_gsc(gsc_root_path, output_root_dir, dump: bool = True) -> dict:
    """GSC V1 -> {train,valid,test} HDF5 + TSV manifests.

    Splits follow the official validation_list.txt/testing_list.txt;
    everything else is train. Train keywords carry the dual label
    "0;<idx>" (the clip is both Speech and the keyword).
    """
    gsc_root_path = Path(gsc_root_path)
    output_root_dir = Path(output_root_dir)
    valid_fns = set(
        pd.read_csv(gsc_root_path / "validation_list.txt", sep=" ", names=["fn"])["fn"]
    )
    test_fns = set(
        pd.read_csv(gsc_root_path / "testing_list.txt", sep=" ", names=["fn"])["fn"]
    )

    rows = []
    for f in sorted(gsc_root_path.glob("**/*wav")):
        label = LABEL_MAPS_GSC_AUDIOSET.get(f.parent.name)
        if label is None:  # e.g. _background_noise_
            continue
        rows.append({
            "filename": str(f.absolute()),
            "labels": label,
            "fn": f"{f.parent.name}/{f.name}",
        })
    df = pd.DataFrame(rows)
    test_df = df[df["fn"].isin(test_fns)].drop(columns="fn").copy()
    valid_df = df[df["fn"].isin(valid_fns)].drop(columns="fn").copy()
    train_df = df[~df["fn"].isin(test_fns | valid_fns)].drop(columns="fn").copy()
    kw = train_df["labels"] != 0
    train_df["labels"] = train_df["labels"].astype(str)
    train_df.loc[kw, "labels"] = "0;" + train_df.loc[kw, "labels"]

    labels_dir = output_root_dir / "labels"
    hdf5_dir = output_root_dir / "hdf5"
    labels_dir.mkdir(parents=True, exist_ok=True)
    hdf5_dir.mkdir(parents=True, exist_ok=True)
    out = {}
    for name, part in (("train", train_df), ("valid", valid_df), ("test", test_df)):
        h5 = hdf5_dir / f"{name}.h5"
        part = part.copy()
        part["hdf5path"] = str(h5.absolute())
        if dump:
            print(f"Dumping wav to hdf5 for {name} [len {len(part)}] to {h5}")
            dump_waves(part, h5, use_fullname=True)
        tsv = labels_dir / f"{name}_gsc_aslabels.tsv"
        part.to_csv(tsv, sep="\t", index=False)
        out[name] = tsv
    return out
