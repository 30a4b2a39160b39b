"""Offline PSL cache builder CLI.

    uit-psl-cache MANIFEST.tsv -t TEACHER_CKPT -o psl_cache.h5 \\
        [--grid 1600] [--chunk-length 1.0] [--batch-size 256] [--classes 527] \\
        [--shard I/N]

Scores every grid-aligned crop of every manifest clip with the frozen
teacher once (data.psl_cache.build_psl_cache) so training can run
teacher-free with ``psl: {mode: offline, cache: psl_cache.h5}`` — the
in-step teacher (reference run.py:199-202) was 26% of the frontier train
step (PERF_NOTES round 4).

Multi-host prep: host i of N runs ``--shard i/N -o cache.iofN.h5`` over
the SAME manifest (rows i::N — no coordination needed), and training
takes the whole set: ``psl: {mode: offline, cache: 'cache.*ofN.h5'}``
(glob or YAML list). The reader refuses incomplete or mixed-build shard
sets loudly.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="uit-psl-cache")
    parser.add_argument("manifest", help="training manifest TSV "
                        "(filename/labels/hdf5path — the audioset half)")
    parser.add_argument("-t", "--teacher", required=True,
                        help="teacher checkpoint spec (path / dir / "
                        "pretrained name — cli.common.resolve_model)")
    parser.add_argument("-o", "--output", required=True,
                        help="output cache .h5")
    parser.add_argument("--grid", type=int, default=None,
                        help="crop-start grid in samples "
                        "(default 1600 = 0.1 s = 10 mel hops)")
    parser.add_argument("--chunk-length", type=float, default=1.0,
                        help="crop length in seconds (config chunk_length)")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--classes", type=int, default=None,
                        help="keep only the first N teacher classes "
                        "(default: all)")
    parser.add_argument("--basename", action="store_true", default=True,
                        help="basename manifest filenames (reference "
                        "AudioSet convention; default on)")
    parser.add_argument("--no-basename", dest="basename",
                        action="store_false")
    parser.add_argument("--precision", choices=("exact", "fast"),
                        default="exact",
                        help="frontend kernel precision for the teacher")
    parser.add_argument("--shard", default=None, metavar="I/N",
                        help="build only manifest rows i::N (multi-host "
                        "prep: each host runs its own i with a distinct "
                        "-o; train with cache: <glob-or-list> of all N)")
    args = parser.parse_args(argv)
    shard = None
    if args.shard is not None:
        try:
            i, n = (int(p) for p in args.shard.split("/"))
        except ValueError:
            parser.error(f"--shard expects I/N (e.g. 0/4), got {args.shard!r}")
        if not (0 <= i < n):
            parser.error(f"--shard needs 0 <= I < N, got {args.shard}")
        shard = (i, n)

    import jax
    import numpy as np

    from ..data import read_tsv_data
    from ..data.psl_cache import DEFAULT_GRID, build_psl_cache
    from ..ops import make_frontend_fn
    from .common import resolve_model

    df = read_tsv_data(args.manifest, basename=args.basename)
    cfg, params, state = resolve_model(args.teacher)
    use_pallas = jax.devices()[0].platform == "tpu"
    frontend = make_frontend_fn(cfg.frontend, use_pallas=use_pallas,
                                precision=args.precision)
    from .. import models

    fwd = jax.jit(lambda w: models.apply(cfg, params, state, w,
                                         frontend_fn=frontend))

    t0 = time.time()
    last = [0.0]

    def progress(i, n):
        if time.time() - last[0] > 10 or i == n:
            last[0] = time.time()
            print(f"  {i}/{n} clips", flush=True)

    summary = build_psl_cache(
        df, lambda w: np.asarray(fwd(w)), args.output,
        chunk_length=args.chunk_length,
        grid=args.grid if args.grid is not None else DEFAULT_GRID,
        batch_size=args.batch_size, classes=args.classes,
        teacher_name=str(args.teacher), progress=progress, shard=shard,
    )
    dt = time.time() - t0
    print(f"{args.output}: {summary['clips']} clips, {summary['crops']} "
          f"crops x {summary['classes']} classes, "
          f"{summary['bytes'] / 1e6:.1f} MB in {dt:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
