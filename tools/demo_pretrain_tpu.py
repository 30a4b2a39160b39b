"""On-device MAE pretraining demo: masked-autoencoder pretraining on
unlabeled synthetic audio, then a short fine-tune initialized from the
MAE snapshot — the full self-supervised path (the reference consumes an
MAE-pretrained init via `pretrained:`, reference run.py:134-144 /
utils.py:184-205; here the pretraining stage itself is part of the
framework, train/pretrain.py).

    python tools/demo_pretrain_tpu.py [outdir]
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from demo_train_tpu import make_split  # noqa: E402  (same toy world)


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="uit_mae_demo_"))
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    unlabeled = make_split(out, "unlabeled", 512, rng, kws=True)

    from uit_mobile_tpu.train.pretrain import pretrain_from_config

    snapshot = pretrain_from_config(dict(
        outputpath=str(out / "exp"),
        model="uit_xxxs",
        model_args={"target_length": 102, "init_bn": False},
        mask_ratio=0.75,
        decoder_depth=2,
        train_data=unlabeled,
        batch_size=32,
        epochs=3,
        epoch_length=40,
        warmup_iters=20,
        optimizer="AdamW",
        optimizer_args={"lr": 1.5e-3, "weight_decay": 1e-8},
        num_workers=2,
        seed=0,
    ))
    print(f"MAE snapshot: {snapshot}", flush=True)

    # short supervised fine-tune FROM the snapshot (partial load: encoder
    # weights transfer, decoder/mask token dropped, head fresh)
    from uit_mobile_tpu.train.loop import train_from_config
    from uit_mobile_tpu.evaluate import Evaluator

    config = dict(
        outputpath=str(out / "exp_ft"),
        num_classes=537,
        model="uit_xxxs",
        model_args={"target_length": 102, "init_bn": False},
        pretrained=str(snapshot),
        batch_size=32,
        epochs=4,
        epoch_length=40,
        warmup_iters=40,
        chunk_length=1.0,
        optimizer="AdamW",
        optimizer_args={"lr": 7e-4, "weight_decay": 1e-8},
        early_stop=10,
        n_saved=2,
        num_workers=2,
        seed=0,
        config_stem="mae_demo",
        audioset_train_data=make_split(out, "as_train", 128, rng, kws=False),
        audioset_eval_data=make_split(out, "as_eval", 64, rng, kws=False),
        kws_train_data=make_split(out, "kws_train", 256, rng, kws=True),
        kws_test_data=make_split(out, "kws_eval", 64, rng, kws=True),
    )
    model_path = train_from_config(config)
    ev = Evaluator(str(model_path), batch_size=32, num_workers=2)
    gsc = ev.gsc(eval_data=config["kws_test_data"])
    print(f"fine-tuned from MAE: GSC Accuracy@0.2={gsc['Accuracy@0.2']:.3f} "
          "(short demo; see demo_train_tpu.py note on the 0.2 threshold)",
          flush=True)


if __name__ == "__main__":
    main()
