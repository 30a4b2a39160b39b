"""On-chip SED round trip: strong-label training -> strong evaluation.

The SED subsystem (beyond the reference, which has none) already has
full CPU-mesh test coverage (tests/test_sed.py); this demo reproduces
the round trip ON THE REAL CHIP with the Pallas frontend: a synthetic
localization world (class-specific tones in the first or second half of
each clip) is trained with `train_sed_from_config` (framewise BCE on
the dm head) and scored with `Evaluator.strong` — segment F1, collar
event F1, and PSDS over the sweep.

Run:  timeout 1800 python tools/demo_sed_tpu.py [workdir]
Expect: Segment_Micro_F1 well above the ~0.25 positive-rate chance
floor, and a nonzero PSDS.
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000


def make_world(root: Path, n_clips: int, seed: int):
    import h5py
    import pandas as pd

    rng = np.random.default_rng(seed)
    h5 = root / f"sed_{seed}.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(n_clips):
            cls = i % 2
            half = (i // 2) % 2
            clip = (rng.standard_normal(SR) * 120).astype(np.int16)
            t = np.arange(SR // 2) / SR
            tone = np.sin(2 * np.pi * (600 + 2400 * cls) * t) * 12000
            lo = half * (SR // 2)
            clip[lo:lo + SR // 2] += tone.astype(np.int16)
            f[f"c_{seed}_{i}.wav"] = clip
            rows.append((f"c_{seed}_{i}.wav", str(cls), str(h5),
                         lo / SR, (lo + SR // 2) / SR))
    tsv = root / f"sed_{seed}.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                "from", "to"]).to_csv(tsv, sep="\t",
                                                      index=False)
    return str(tsv)


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="uit_sed_demo_"))
    out.mkdir(parents=True, exist_ok=True)

    from uit_mobile_tpu.evaluate import Evaluator
    from uit_mobile_tpu.train.sed import train_sed_from_config

    train_tsv = make_world(out, 64, seed=1)
    eval_tsv = make_world(out, 32, seed=2)

    ckpt = train_sed_from_config(dict(
        model="uit_xxxs",
        # init_bn=False (GlobalNormer): inference-BN running stats need
        # hundreds of momentum-0.01 steps — too slow for a short demo
        model_args={"target_length": 102, "init_bn": False},
        num_classes=10,
        strong_train_data=train_tsv,
        strong_eval_data=eval_tsv,
        outputpath=str(out / "exp"),
        batch_size=16,
        epochs=20,
        epoch_length=8,
        warmup_iters=20,
        optimizer_args={"lr": 2e-3},
        threshold=0.3,
        basename=False,
        seed=0,
    ))
    print(f"SED checkpoint: {ckpt}", flush=True)

    res = Evaluator(str(ckpt), num_workers=0, report_dir=str(out)).strong(
        eval_data=eval_tsv, threshold=0.3, median_kernel=3,
        event_collar=0.25, psds=True)
    for k in ("Segment_Micro_F1", "Segment_Macro_F1", "Event_Micro_F1",
              "PSDS"):
        print(f"{k}: {res[k]:.4f}", flush=True)
    assert res["Segment_Micro_F1"] > 0.4, "did not learn localization"


if __name__ == "__main__":
    main()
