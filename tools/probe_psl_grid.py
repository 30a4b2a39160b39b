"""Offline-PSL crop-grid coarseness: does snapping training crops (and
their cached teacher targets) to a coarser grid cost accuracy?

The round-5 offline-PSL cache (data.psl_cache) stores teacher
probabilities per hop-aligned crop start; storage scales 1/grid
(AudioSet scale: ~190 GB at grid 1600 = 0.1 s, ~63 GB at 4800, ~19 GB at
16000). The f16-storage neutrality is pinned in tests, but accuracy vs
GRID was unmeasured (NEXT_STEPS round-6 candidate 4). The 1 s gate world
can't measure it — every clip has exactly one crop — so this probe runs
the EVENTFUL world (data.synthworld.build_eventful_world): 10 s clips
where 1-2 tone bursts sit at random positions, i.e. crop position
decides crop content, the regime where a coarse grid could hurt.

Protocol (all on one platform, default cpu — the TPU relay is not needed
for a relative A/B at these sizes):
  1. train a MobileNetV2 teacher on the eventful world (527 classes,
     the reference's teacher arrangement);
  2. students, identical schedule/seed, varying ONLY the PSL source:
       none          plain GT training (control)
       online        in-step teacher (reference run.py:199-202 semantics)
       offline@1600  cached, grid 0.1 s (the shipped default)
       offline@4800  cached, grid 0.3 s (3x cheaper storage)
       offline@16000 cached, grid 1.0 s (10x cheaper storage)
  3. report mAPAudioset / mAPKWS per student.

Run:  python tools/probe_psl_grid.py [--outdir DIR] [--platform cpu]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _run_train(config: dict, outdir: Path, stem: str) -> str:
    import yaml

    from uit_mobile_tpu.cli import train as train_cli

    cfg_yaml = outdir / f"{stem}.yaml"
    cfg_yaml.write_text(yaml.safe_dump(config))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = train_cli.main(["train", str(cfg_yaml)])
    assert rc in (0, None), f"train CLI failed rc={rc} for {stem}"
    return buf.getvalue().strip().splitlines()[-1]


def _eval_model(model_path: str, eval_tsv: str) -> dict:
    from uit_mobile_tpu.cli import evaluate as eval_cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = eval_cli.main(["audioset", model_path,
                            "--audioset-eval-data", eval_tsv])
    assert rc in (0, None), f"evaluate CLI failed rc={rc}"
    printed = buf.getvalue()
    out = {}
    for key in ("mAPAudioset", "mAPKWS", "mAP"):
        m = re.search(rf"'{key}':\s*(?:np\.float\d*\()?([0-9.eE+-]+)", printed)
        if m:
            out[key] = float(m.group(1))
    assert out, f"no metrics parsed from:\n{printed}"
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--grids", default="1600,4800,16000")
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--teacher-epochs", type=int, default=12)
    ap.add_argument("--teacher-iters", type=int, default=80)
    ap.add_argument("--seeds", type=int, default=1,
                    help="student seeds per variant (mean reported)")
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from uit_mobile_tpu import models
    from uit_mobile_tpu.cli.common import resolve_model
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.data.psl_cache import build_psl_cache
    from uit_mobile_tpu.data.synthworld import build_eventful_world

    out = Path(args.outdir or tempfile.mkdtemp(prefix="uit_pslgrid_"))
    out.mkdir(parents=True, exist_ok=True)
    print(f"# workdir {out}", flush=True)

    world = build_eventful_world(out / "world", seed=args.seed,
                                 n_train=args.n_train, n_eval=48)

    # ---- teacher: MobileNetV2 on the eventful world, 527 classes (the
    # reference's teacher shape; kws slots reuse the audioset splits so
    # no label exceeds 526)
    teacher_cfg = dict(
        outputpath=str(out / "teacher"),
        num_classes=527,
        model="MobileNetV2",
        model_args={"width_mult": 0.5},
        batch_size=32,
        epochs=args.teacher_epochs,
        epoch_length=args.teacher_iters,
        warmup_iters=args.teacher_iters,
        chunk_length=1.0,
        optimizer="AdamW",
        optimizer_args={"lr": 2e-3, "weight_decay": 1e-8},
        early_stop=args.teacher_epochs,
        n_saved=2,
        num_workers=2,
        seed=args.seed,
        config_stem="teacher",
        audioset_train_data=world["audioset_train_data"],
        audioset_eval_data=world["audioset_eval_data"],
        kws_train_data=world["audioset_train_data"],
        kws_test_data=world["audioset_eval_data"],
    )
    teacher_path = _run_train(teacher_cfg, out, "teacher")
    t_scores = _eval_model(teacher_path, world["audioset_eval_data"])
    print(f"teacher: {teacher_path}\n  eval {t_scores}", flush=True)

    # ---- caches at each grid (same teacher forward the online step uses)
    t_cfg, t_params, t_state = resolve_model(teacher_path)
    fwd = jax.jit(lambda w: models.apply(t_cfg, t_params, t_state, w))
    df = read_tsv_data(world["audioset_train_data"], basename=True)
    grids = [int(g) for g in args.grids.split(",")]
    caches = {}
    for g in grids:
        p = out / f"cache_g{g}.h5"
        s = build_psl_cache(df, lambda w: np.asarray(fwd(jnp.asarray(w))), p,
                            chunk_length=1.0, grid=g, batch_size=32,
                            teacher_name=teacher_path)
        caches[g] = p
        print(f"cache grid={g}: {s['crops']} crops, "
              f"{s['bytes'] / 1e6:.1f} MB", flush=True)

    # ---- students: identical schedule, only the PSL source varies
    def student_cfg(stem, psl, seed):
        c = dict(
            outputpath=str(out / "students"),
            num_classes=537,
            model="uit_xxxs",
            model_args={"target_length": 102, "init_bn": False},
            batch_size=32,
            epochs=args.epochs,
            epoch_length=50,
            warmup_iters=50,
            chunk_length=1.0,
            optimizer="AdamW",
            optimizer_args={"lr": 7e-4, "weight_decay": 1e-8},
            loss="BCELoss",
            loss_args={"weight": [1.0] * 527 + [40.0] * 10},
            early_stop=args.epochs,
            n_saved=2,
            num_workers=2,
            seed=seed,
            config_stem=stem,
            **world,
        )
        if psl is not None:
            c["psl"] = psl
        return c

    variants = [("none", None),
                ("online", {"model": "MobileNetV2",
                            "pretrained": teacher_path})]
    variants += [(f"offline@{g}", {"mode": "offline",
                                   "cache": str(caches[g])}) for g in grids]

    rows = []
    for stem, psl in variants:
        aa, kk = [], []
        for s in range(args.seeds):
            seed = args.seed + s * 101
            mp = _run_train(
                student_cfg(f"{stem.replace('@', '_')}_s{seed}", psl, seed),
                out, f"{stem.replace('@', '_')}_s{seed}")
            scores = _eval_model(mp, world["audioset_eval_data"])
            kws = _eval_model(mp, world["kws_test_data"])
            # single-manifest audioset evals report plain 'mAP' (the
            # mAPAudioset/mAPKWS split keys appear on mixed validations)
            a = scores.get("mAPAudioset") or scores.get("mAP")
            k = kws.get("mAPKWS") or kws.get("mAP")
            aa.append(a)
            kk.append(k)
            print(f"student {stem:<14} seed {seed}: "
                  f"mAP(audioset eval)={a:.4f} mAPKWS={k:.4f}", flush=True)
        rows.append((stem, aa, kk))

    import numpy as _np

    print(f"\n{'psl source':<16} {'mAP(as eval)':>22} {'mAPKWS':>8}",
          flush=True)
    for stem, aa, kk in rows:
        spread = f" ± {_np.std(aa):.4f}" if len(aa) > 1 else ""
        print(f"{stem:<16} {_np.mean(aa):>12.4f}{spread:<10} "
              f"{_np.mean(kk):>8.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
