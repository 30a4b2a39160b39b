"""Deterministic synthetic keyword world — the committed accuracy-gate
dataset (round-3 VERDICT item 3).

Zero egress means no AudioSet/GSC can ever be downloaded here, so the
framework's end-to-end accuracy is gated on a miniature world it CAN
build deterministically: 537 classes where each GSC keyword index
(527-536) is a pure tone at a fixed frequency and the "AudioSet half" is
colored noise labeled class 0 ("Speech"). A model that learns must
drive keyword mAP far above chance (~0.1 for 10 uniformly-sampled
keyword classes); a training regression shows up as a gate failure, not
just a crash. Same HDF5+TSV contract as data.prep.dump_waves, so the
REAL loaders/trainer/evaluator run unchanged (reference
dataset.py:24-60 semantics).

Used by tools/demo_train_tpu.py (interactive demo) and
tools/gate_synthetic.py (the committed train->eval accuracy gate run by
`make verify-tpu` and tests/test_synth_gate.py).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# keyword class -> tone frequency, 300 Hz .. ~4.5 kHz (well inside the
# 64-mel/8 kHz Nyquist band so every keyword is separable in mel space)
KW_FREQS = {527 + i: 300.0 * (1.35 ** i) for i in range(10)}


def synth_clip(rng: np.random.Generator, label: int, sr: int = 16000) -> np.ndarray:
    """One 1 s int16 clip: a noisy pure tone for keyword labels, colored
    noise for the class-0 filler."""
    t = np.arange(sr) / sr
    if label in KW_FREQS:
        w = rng.uniform(0.2, 0.8) * np.sin(2 * np.pi * KW_FREQS[label] * t
                                           + rng.uniform(0, 2 * np.pi))
        w += rng.standard_normal(sr) * 0.02
    else:  # "Speech"/noise filler
        w = rng.standard_normal(sr) * rng.uniform(0.05, 0.3)
    return (np.clip(w, -1, 1) * 32000).astype(np.int16)


def make_split(root: Path, name: str, n: int, rng: np.random.Generator,
               kws: bool) -> str:
    """Write one HDF5 + TSV split (the data.prep.dump_waves layout);
    returns the TSV path."""
    import h5py
    import pandas as pd

    root = Path(root)
    h5 = root / f"{name}.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(n):
            label = int(rng.choice(list(KW_FREQS))) if kws else 0
            f[f"{name}_{i}.wav"] = synth_clip(rng, label)
            rows.append((f"{name}_{i}.wav", str(label), str(h5)))
    tsv = root / f"{name}.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    return str(tsv)


# "AudioSet event" classes for the EVENTFUL world variant: 20 tones at
# frequencies interleaved between the KWS tones, each occupying a short
# window INSIDE a long clip — so WHERE a training crop lands decides what
# the crop contains. This is the world where the offline-PSL crop grid
# (data.psl_cache) has something to be sensitive TO; the 1 s gate world
# above has exactly one crop per clip.
AS_FREQS = {1 + i: 260.0 * (1.21 ** i) for i in range(20)}


def synth_eventful_clip(rng: np.random.Generator, labels, sr: int = 16000,
                        seconds: float = 10.0) -> np.ndarray:
    """One long int16 clip: low background noise + one Hann-windowed tone
    burst (~0.8-1.5 s) per label at a random position."""
    n = int(sr * seconds)
    w = rng.standard_normal(n) * rng.uniform(0.02, 0.08)
    for lab in labels:
        f = AS_FREQS[int(lab)]
        # clamp: a burst can at most fill the clip (short `seconds`
        # worlds are legal — the event then spans the whole clip)
        dur = min(int(sr * rng.uniform(0.8, 1.5)), n)
        start = int(rng.integers(0, max(1, n - dur)))
        t = np.arange(dur) / sr
        tone = rng.uniform(0.3, 0.8) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        w[start:start + dur] += tone * np.hanning(dur)
    return (np.clip(w, -1, 1) * 32000).astype(np.int16)


def make_eventful_split(root: Path, name: str, n: int,
                        rng: np.random.Generator,
                        seconds: float = 10.0) -> str:
    """One HDF5 + TSV split of long multi-event clips (';'-joined labels,
    the AudioSet manifest convention); returns the TSV path."""
    import h5py
    import pandas as pd

    root = Path(root)
    h5 = root / f"{name}.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(n):
            k = int(rng.integers(1, 3))  # 1-2 distinct event classes
            labels = list(rng.choice(list(AS_FREQS), size=k, replace=False))
            f[f"{name}_{i}.wav"] = synth_eventful_clip(rng, labels,
                                                       seconds=seconds)
            rows.append((f"{name}_{i}.wav",
                         ";".join(str(int(x)) for x in labels), str(h5)))
    tsv = root / f"{name}.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    return str(tsv)


def build_eventful_world(outdir, seed: int = 0, n_train: int = 128,
                         n_eval: int = 48, seconds: float = 10.0) -> dict:
    """Long-clip variant of :func:`build_world`: the audioset halves are
    multi-event 10 s clips (crop position matters), the kws halves stay
    the 1 s keyword tones. Used by tools/probe_psl_grid.py to measure
    accuracy sensitivity to the offline-PSL crop grid."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    return {
        "audioset_train_data": make_eventful_split(outdir, "as_train",
                                                   n_train, rng,
                                                   seconds=seconds),
        "audioset_eval_data": make_eventful_split(outdir, "as_eval", n_eval,
                                                  rng, seconds=seconds),
        "kws_train_data": make_split(outdir, "kws_train", n_train, rng,
                                     kws=True),
        "kws_test_data": make_split(outdir, "kws_eval", n_eval, rng,
                                    kws=True),
    }


def build_world(outdir, seed: int = 0, n_train: int = 256,
                n_eval: int = 64) -> dict:
    """Build the full 4-split world; returns the config keys the training
    loop consumes. Deterministic in (seed, n_train, n_eval)."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    return {
        "audioset_train_data": make_split(outdir, "as_train", n_train, rng,
                                          kws=False),
        "audioset_eval_data": make_split(outdir, "as_eval", n_eval, rng,
                                         kws=False),
        "kws_train_data": make_split(outdir, "kws_train", n_train, rng,
                                     kws=True),
        "kws_test_data": make_split(outdir, "kws_eval", n_eval, rng,
                                    kws=True),
    }
