"""Export a native checkpoint: reference-torch state_dict or StableHLO.

Torch interop (loads into the original PyTorch code with strict=True;
frontend buffers are regenerated there — reference inference.py:37-40):

    python -m uit_mobile_tpu.cli.export CKPT.npz -o model.pt

Deployable serving artifact (serialized jax.export StableHLO program,
weights baked in — the TPU-native replacement for the reference's
external mobile-deployment tooling, README.md:15-24):

    python -m uit_mobile_tpu.cli.export CKPT.npz --stablehlo -o model.uitx
        [--batch-size N]        fixed batch (default: batch-polymorphic)
        [--dtype int16|float32] input contract (default float32)
        [--precision exact|fast]
        [--platforms cpu,tpu]   (--pallas forces tpu-only Mosaic kernels)
        [--seconds S]           clip length (default 1.0 = 16000 samples)
        [--verify]              reload the artifact and check probs match
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _export_torch(args):
    import numpy as np
    import torch

    from ..ckpt.torch_convert import uit_torch_state_dict_from_params
    from .common import resolve_model

    cfg, params, state = resolve_model(args.checkpoint)
    if isinstance(params, list):
        raise SystemExit(
            "torch export needs ONE weight set — a comma ensemble spec has "
            "no single state_dict. Average the members first "
            "(uit-average a.npz b.npz -o avg.npz) or export --stablehlo "
            "(the artifact bakes the vmapped ensemble program in)."
        )
    sd = uit_torch_state_dict_from_params(params, state, cfg)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               Path(args.output))
    print(args.output)
    return 0


def _export_stablehlo(args):
    import numpy as np

    from ..ckpt.artifact import export_serving, load_artifact, save_artifact
    from .common import load_label_map, resolve_model

    # resolve_model (not a bare load_checkpoint) so every spec form works:
    # pretrained names, experiment dirs, torch dumps, and the comma
    # ensemble spec — export_serving builds through make_forward_fn, which
    # turns member lists into one vmapped prob-averaging program, so an
    # ensemble artifact is a single sealed .uitx like any other
    cfg, params, state = resolve_model(args.checkpoint)
    platforms = tuple(p for p in args.platforms.split(",") if p)
    if args.pallas:
        platforms = ("tpu",)
    n_samples = int(round(args.seconds * 16000))
    exported = export_serving(
        cfg, params, state, batch_size=args.batch_size,
        n_samples=n_samples, dtype=args.dtype, precision=args.precision,
        use_pallas=args.pallas, platforms=platforms,
    )
    try:
        labels = {str(k): v for k, v in load_label_map().items()}
    except OSError:
        labels = None
    out = save_artifact(args.output, exported, cfg=cfg, labels=labels)
    if args.verify:
        import jax.numpy as jnp

        from .. import models
        from ..ops.pipeline import make_forward_fn

        fn, _meta = load_artifact(out)
        b = args.batch_size or 2
        rng = np.random.default_rng(0)
        if args.dtype == "int16":
            wav = rng.integers(-2000, 2000, (b, n_samples), dtype=np.int16)
        else:
            wav = (rng.standard_normal((b, n_samples)) * 0.1).astype(np.float32)
        ref = make_forward_fn(cfg, params, state, use_pallas=args.pallas,
                              precision=args.precision,
                              top_db_mode="per_sample")(jnp.asarray(wav))
        got = fn(jnp.asarray(wav))
        drift = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
        # the repo-wide prob-drift budget: exact on CPU (~1e-7 measured);
        # on TPU the exported module's fusions regroup the default-
        # precision bf16 matmul passes (~1e-4 measured, PERF_NOTES)
        assert drift <= 1e-3, f"artifact drift {drift} > 1e-3"
        print(f"verified: max prob drift {drift:.2e} at B={b}", file=sys.stderr)
    print(out)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="uit-export")
    parser.add_argument("checkpoint")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--stablehlo", action="store_true",
                        help="emit a .uitx serving artifact instead of a "
                        "torch state_dict")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="fix the batch dim (default: polymorphic)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "int16"])
    parser.add_argument("--precision", default="exact",
                        choices=["exact", "fast"])
    parser.add_argument("--platforms", default="cpu,tpu")
    parser.add_argument("--pallas", action="store_true",
                        help="Mosaic-kernel frontend (forces tpu-only)")
    parser.add_argument("--seconds", type=float, default=1.0)
    parser.add_argument("--verify", action="store_true")
    args = parser.parse_args(argv)
    if args.stablehlo:
        return _export_stablehlo(args)
    return _export_torch(args)


if __name__ == "__main__":
    sys.exit(main())
