"""Committed accuracy GATE: synthetic-world train -> eval through the
REAL CLI path, with a pinned minimum score.

Round-3 VERDICT item 3: convergence evidence used to be demos and a
loss-decreases test; this gate FAILS when training regresses, not just
when it crashes. It runs the exact user surfaces:

  1. data.synthworld.build_world          (deterministic committed world)
  2. cli.train.main(["train", cfg.yaml])  == `python run.py train cfg.yaml`
  3. cli.evaluate.main(["audioset", EXP, --audioset-eval-data kws_eval])
                                          == `python evaluate.py audioset`
  4. assert mAPKWS >= threshold           (chance ~0.1 on the 10-keyword
                                          world; a trained run scores
                                          0.5-0.8, see PERF_NOTES)

The CLI mains are invoked in-process (same argparse/YAML/registry code
as run.py/evaluate.py — the root shims are 13-line wrappers over these
mains) because this environment force-pins the JAX platform at
interpreter start: a subprocess could not be steered to CPU for the
test-suite variant. On-chip (`make verify-tpu`) the default platform is
the TPU.

Usage:
  python tools/gate_synthetic.py                 # full gate (on-chip size)
  python tools/gate_synthetic.py --small --platform cpu   # CI/CPU size
  exit 0 = PASS, 1 = FAIL (score below threshold), other = crash
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


def run_gate(outdir: str | Path, *, small: bool = False,
             min_mapkws: float | None = None, seed: int = 0,
             model: str = "uit_xxxs", quiet: bool = False) -> float:
    """Build world -> train (real CLI) -> evaluate (real CLI) -> mAPKWS.

    Raises AssertionError when the score misses the pinned minimum."""
    import yaml

    from uit_mobile_tpu.cli import evaluate as eval_cli
    from uit_mobile_tpu.cli import train as train_cli
    from uit_mobile_tpu.data.synthworld import build_world

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    # Gate sizes. Small: 4 epochs x 40 steps at B=32 (~5k clips) clears
    # 0.30 with margin on CPU; full: the demo schedule that reaches
    # ~0.5-0.8 (PERF_NOTES round-2/3 on-chip runs: 0.56-0.70).
    n_train, epochs, thresh = ((192, 4, 0.30) if small else (256, 10, 0.40))
    if min_mapkws is not None:
        thresh = min_mapkws
    world = build_world(out / "world", seed=seed, n_train=n_train, n_eval=64)
    config = dict(
        outputpath=str(out / "exp"),
        num_classes=537,
        model=model,
        model_args={"target_length": 102, "init_bn": False},
        batch_size=32,
        epochs=epochs,
        epoch_length=40,
        warmup_iters=40,
        chunk_length=1.0,
        optimizer="AdamW",
        optimizer_args={"lr": 7e-4, "weight_decay": 1e-8},
        early_stop=epochs,
        n_saved=2,
        num_workers=2,
        seed=seed,
        config_stem="gate",
        **world,
    )
    cfg_yaml = out / "gate.yaml"
    cfg_yaml.write_text(yaml.safe_dump(config))

    # --- the real train CLI (run.py train == cli.train.main). Progress
    # goes through the logger; stdout carries only the final model path
    # (the CLI's contract), so capturing it hides nothing.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = train_cli.main(["train", str(cfg_yaml)])
    assert rc in (0, None), f"train CLI failed rc={rc}"
    model_path = buf.getvalue().strip().splitlines()[-1]
    if not quiet:
        print(f"[gate_synthetic] trained model: {model_path}", flush=True)

    # --- the real evaluate CLI (evaluate.py audioset == cli.evaluate.main)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = eval_cli.main([
            "audioset", str(model_path),
            "--audioset-eval-data", world["kws_test_data"],
        ])
    assert rc in (0, None), f"evaluate CLI failed rc={rc}"
    printed = buf2.getvalue()
    if not quiet:
        print(printed, end="")
    # match the CLI's final results-dict repr, not the human report above
    # it (which prints the same metric in percent)
    m = re.search(r"'mAPKWS':\s*(?:np\.float\d*\()?([0-9.eE+-]+)", printed)
    assert m, f"no mAPKWS in evaluate output:\n{printed}"
    score = float(m.group(1))
    status = "PASS" if score >= thresh else "FAIL"
    print(f"[gate_synthetic] mAPKWS={score:.4f} min={thresh} -> {status}",
          flush=True)
    assert score >= thresh, (
        f"accuracy gate FAILED: synthetic-world mAPKWS {score:.4f} < "
        f"{thresh} (chance ~0.1; a healthy run scores ~0.5+). Training "
        f"has regressed — bisect against the last green run."
    )
    return score


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--small", action="store_true",
                    help="CI-sized world/schedule (CPU-friendly)")
    ap.add_argument("--min-map", type=float, default=None,
                    help="override the pinned minimum mAPKWS")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform before any backend use "
                    "(the env var alone is overridden at interpreter start "
                    "in this environment)")
    args = ap.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    outdir = args.outdir or tempfile.mkdtemp(prefix="uit_gate_")
    try:
        run_gate(outdir, small=args.small, min_mapkws=args.min_map)
    except AssertionError as e:
        print(f"FAIL: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
