"""Inference CLI: wav files in, ranked label probabilities out.

Replicates the reference's public demo (inference.py:11-62) including the
output format (``Keyword:`` prefix for indices > 526), plus a batched mode
that pads all inputs to a shared length and scores them in one TPU program.

    python -m uit_mobile_tpu.cli.infer samples/*.wav -m uit_xs -k 3
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .. import models
from ..data import read_wav
from .common import load_label_map, resolve_model


def run_inference(cfg, params, state, wavs: list[np.ndarray], batched: bool = False):
    """Score a list of (T,) float32 waveforms -> list of (outputdim,) probs.

    The forward is jitted once per distinct input shape (eager dispatch on a
    remote TPU is orders of magnitude slower). Non-batched mode scores each
    clip at its exact length (bit-parity with the reference CLI, one compile
    per distinct length); --batched pads to the batch max and runs one
    program.
    """
    import jax
    import jax.numpy as jnp

    if isinstance(params, list):
        # checkpoint ensemble (comma spec): mean member probs via the
        # pipeline's vmapped program; XLA frontend + bft layout keep the
        # single-checkpoint path's exact semantics
        from ..ops.pipeline import make_forward_fn

        fwd = jax.jit(make_forward_fn(cfg, params, state, use_pallas=False,
                                      precision="exact", btf=False))
    else:
        fwd = jax.jit(lambda w: models.apply(cfg, params, state, w))
    if batched and len(wavs) > 1:
        max_len = max(w.shape[-1] for w in wavs)
        batch = np.zeros((len(wavs), max_len), dtype=np.float32)
        for i, w in enumerate(wavs):
            batch[i, : w.shape[-1]] = w
        probs = fwd(jnp.asarray(batch))
        return [np.asarray(p) for p in probs]
    return [np.asarray(fwd(jnp.asarray(w[None, :]))[0]) for w in wavs]


def main(argv=None):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()  # reuse compiled executables across runs
    parser = argparse.ArgumentParser(
        prog="uit-infer", description="UiT audio tagging + keyword spotting"
    )
    parser.add_argument("input_wav", type=Path, nargs="+")
    parser.add_argument(
        "-m", "--model", default="uit_xs",
        help=f"pretrained name [{', '.join(models.PRETRAINED_CHECKPOINTS)}], "
             "a .npz/.pt checkpoint, or an experiment directory",
    )
    parser.add_argument("-k", "--topk", type=int, default=3)
    parser.add_argument("--batched", action="store_true",
                        help="score all wavs in one padded batch (fast path; "
                        "padding may slightly alter per-clip frames)")
    parser.add_argument("--labels", type=Path, default=None,
                        help="label index CSV (default: bundled 537-class map)")
    parser.add_argument("--timestamps", action="store_true",
                        help="temporal tagging: print top-k per time segment "
                        "(per crop window; per 0.16s patch for dm-pooling "
                        "models) instead of one clip-level ranking")
    parser.add_argument("--events", action="store_true",
                        help="sound-event detection: extract discrete "
                        "(label, onset, offset) events from the framewise "
                        "probabilities (median filter + threshold + run "
                        "merging) instead of per-segment rankings")
    parser.add_argument("--event-threshold", type=float, default=0.5)
    parser.add_argument("--median-kernel", type=int, default=3,
                        help="odd median-filter width in segments (--events)")
    parser.add_argument("--min-duration", type=float, default=0.0)
    parser.add_argument("--merge-gap", type=float, default=0.0)
    args = parser.parse_args(argv)

    label_maps = load_label_map(args.labels)
    cfg, params, state = resolve_model(args.model)
    if getattr(cfg, "outputdim", len(label_maps)) != len(label_maps):
        # custom-head checkpoint: the bundled AudioSet table would print
        # unrelated names (or KeyError past 537) — index names instead
        label_maps = {i: f"class_{i}" for i in range(cfg.outputdim)}

    wavs = []
    for wavpath in args.input_wav:
        wave, sr = read_wav(wavpath)
        assert sr == 16000, (
            "Models are trained on 16khz, please sample your input to 16khz"
        )
        wavs.append(wave[0])

    def fmt(lab_idx):
        name = label_maps[int(lab_idx)]
        return f"Keyword: {name}" if lab_idx > 526 else name

    if args.timestamps or args.events:
        import jax.numpy as jnp

        for wavpath, wave in zip(args.input_wav, wavs):
            print(f"===== {str(wavpath):^20} =====")
            if isinstance(params, list):
                # ensemble: mean member probs; times are config-determined
                # and identical across members (same cfg enforced by
                # resolve_model) — computed host-side (framewise_times,
                # the harness.times_for pattern), NOT via an extra
                # member-0 forward (N forwards per clip, not N+1)
                import jax

                member = jax.vmap(
                    lambda p, s, w: models.apply_framewise(cfg, p, s, w)[0],
                    in_axes=(0, 0, None),
                )
                sp = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
                ss = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
                probs = member(sp, ss, jnp.asarray(wave[None, :])).mean(0)
                if isinstance(cfg, models.UITConfig):
                    times = models.uit.framewise_times(
                        cfg, cfg.frontend.num_frames(wave.shape[0]))
                else:  # conv families: segment count depends on the stack
                    _, times = models.apply_framewise(
                        cfg, params[0], state[0],
                        jnp.asarray(wave[None, :]))
            else:
                probs, times = models.apply_framewise(
                    cfg, params, state, jnp.asarray(wave[None, :])
                )
            probs = np.asarray(probs)[0]
            if args.events:
                from ..evaluate import extract_events

                events = extract_events(
                    times, probs, threshold=args.event_threshold,
                    median_kernel=args.median_kernel,
                    min_duration=args.min_duration, merge_gap=args.merge_gap,
                )
                if not events:
                    print("(no events above threshold "
                          f"{args.event_threshold})")
                for cls, on, off in events:
                    print(f"[{on:6.2f}-{off:6.2f}s] {fmt(cls)}")
                continue
            for (t0, t1), seg in zip(times, probs):
                top = np.argsort(seg)[::-1][: args.topk]
                ranked = "  ".join(f"{fmt(i)} {seg[i]:.3f}" for i in top)
                print(f"[{t0:6.2f}-{t1:6.2f}s] {ranked}")
        return 0

    outputs = run_inference(cfg, params, state, wavs, batched=args.batched)
    for wavpath, output in zip(args.input_wav, outputs):
        print(f"===== {str(wavpath):^20} =====")
        top = np.argsort(output)[::-1][: args.topk]
        for lab_idx in top:
            print(f"{fmt(lab_idx):<30} {output[lab_idx]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
