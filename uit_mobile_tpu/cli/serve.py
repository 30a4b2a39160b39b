"""Serving CLI: a stdin/stdout tagging service.

    python -m uit_mobile_tpu.cli.serve -m uit_xs [-k 5] [--batch-size 256]

Reads wav paths (one per line) on stdin, emits one JSON line per clip:
    {"path": ..., "top": [[label, prob], ...]}
Requests are batched across stdin lines by the TaggingService, so piping a
large file list exercises the full batched TPU path.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..data import read_wav
from .common import load_label_map, resolve_model


def main(argv=None):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()  # reuse compiled executables across runs
    parser = argparse.ArgumentParser(prog="uit-serve")
    parser.add_argument("-m", "--model", default="uit_xs")
    parser.add_argument("--artifact", default=None, metavar="MODEL.uitx",
                        help="serve a StableHLO artifact (uit-export "
                        "--stablehlo) instead of a model/checkpoint — no "
                        "model code runs; /events is unavailable")
    parser.add_argument("-k", "--topk", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--max-seconds", type=int, default=10)
    parser.add_argument("--no-warmup", action="store_true")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each bucket batch over all visible devices")
    parser.add_argument("--top-db-mode", default="per_sample",
                        choices=["per_sample", "torch"],
                        help="dB-clamp reference: per_sample isolates "
                        "co-batched requests (default); torch = offline-eval "
                        "bit parity")
    parser.add_argument("--dtype", default="int16",
                        choices=["int16", "float32"],
                        help="device transfer dtype: int16 keeps PCM 2-byte "
                        "across the host->device link and the framing gather "
                        "(+23%% measured, bitwise-identical output)")
    parser.add_argument("--low-latency", action="store_true",
                        help="ServiceConfig.low_latency() preset: small "
                        "bucket, zero batching window (a lone request "
                        "dispatches immediately), scan folding off — "
                        "minimizes sparse-traffic tail latency at the "
                        "cost of peak throughput; explicit --batch-size/"
                        "--dtype still override")
    parser.add_argument("--scan-batches", type=int, default=1, metavar="K",
                        help="fold K pending full batches into one "
                        "K-batch lax.scan dispatch under sustained load "
                        "(dispatch cost amortizes Kx; results match "
                        "the per-batch path to f32 epsilon)")
    parser.add_argument("--http", type=int, default=None, metavar="PORT",
                        help="serve over HTTP on PORT instead of "
                        "stdin/stdout (POST /tag, GET /healthz, "
                        "GET /labels; see serve/http.py)")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address for --http (default loopback)")
    parser.add_argument("--stream-sessions", type=int, default=32,
                        help="slot count for the --http /stream session "
                        "API (fixed compiled batch dim)")
    parser.add_argument("--calibration", default=None, metavar="JSON",
                        help="temperature-scaling file from `uit-evaluate "
                        "calibrate -o` — probabilities on EVERY surface "
                        "(/tag, /events, /stream/*) are calibrated "
                        "host-side before thresholds apply (composes "
                        "with every serving mode)")
    args = parser.parse_args(argv)

    from ..serve import ServiceConfig, TaggingService

    labels = load_label_map()
    if args.artifact is not None:
        service = TaggingService.from_artifact(
            args.artifact,
            ServiceConfig(batch_size=args.batch_size,
                          warmup=not args.no_warmup, dtype=args.dtype),
            calibration=args.calibration,
        )
        cfg = None
        # prefer the label map sealed into the artifact at export time
        if service.artifact_meta.get("labels"):
            labels = {int(k): v
                      for k, v in service.artifact_meta["labels"].items()}
        model_name = args.artifact
    else:
        cfg, params, state = resolve_model(args.model)
        if args.low_latency:
            # preset fields win; non-default CLI values still override
            overrides = dict(max_seconds=args.max_seconds,
                             warmup=not args.no_warmup,
                             data_parallel=args.data_parallel,
                             top_db_mode=args.top_db_mode)
            if args.batch_size != parser.get_default("batch_size"):
                overrides["batch_size"] = args.batch_size
            if args.dtype != parser.get_default("dtype"):
                overrides["dtype"] = args.dtype
            svc_cfg = ServiceConfig.low_latency(**overrides)
        else:
            svc_cfg = ServiceConfig(batch_size=args.batch_size,
                                    max_seconds=args.max_seconds,
                                    warmup=not args.no_warmup,
                                    data_parallel=args.data_parallel,
                                    top_db_mode=args.top_db_mode,
                                    dtype=args.dtype,
                                    scan_batches=args.scan_batches)
        service = TaggingService(cfg, params, state, svc_cfg,
                                 calibration=args.calibration)
        model_name = args.model
    print("ready", file=sys.stderr, flush=True)

    if cfg is not None and getattr(cfg, "outputdim", len(labels)) != len(labels):
        # custom-head checkpoint: the bundled AudioSet table would print
        # unrelated names (or KeyError past 537) — index names instead
        labels = {i: f"class_{i}" for i in range(cfg.outputdim)}

    if args.http is not None:
        from ..serve import StreamSessions, make_framewise_fn, serve_http

        framewise_fn = stream_sessions = reload_fn = None
        if cfg is not None:
            try:  # temporal tagging (/events) for families that support it
                framewise_fn = make_framewise_fn(cfg, params, state,
                                                 max_seconds=args.max_seconds)
            except TypeError:  # e.g. MoE: no framewise dispatch
                framewise_fn = None
            # real-time session streaming (/stream/*)
            stream_sessions = StreamSessions(
                cfg, params, state, max_sessions=args.stream_sessions,
                calibration=args.calibration)

            def reload_fn(has_events=framewise_fn is not None):
                """POST /reload: re-read the checkpoint this server was
                started from (drop new weights in place, POST /reload,
                keep serving) and hot-swap every surface that can."""
                cfg2, p2, s2 = resolve_model(args.model)
                info = {"weights_version":
                        service.reload(p2, s2, model_cfg=cfg2),
                        "source": args.model}
                if has_events:
                    info["_framewise_fn"] = make_framewise_fn(
                        cfg2, p2, s2, max_seconds=args.max_seconds)
                ok = stream_sessions.reload(cfg2, p2, s2)
                info["stream_sessions"] = (
                    "reloaded" if ok else
                    "deferred: active sessions keep the previous weights "
                    "— POST /reload again once they close or expire")
                return info
        with service:
            print(f"http://{args.host}:{args.http}", file=sys.stderr,
                  flush=True)
            serve_http(service, labels=labels, host=args.host,
                       port=args.http, topk=args.topk,
                       model_name=model_name, quiet=False,
                       framewise_fn=framewise_fn,
                       stream_sessions=stream_sessions,
                       reload_fn=reload_fn)
        return 0

    from collections import deque

    pending: deque = deque()

    def emit(path, probs):
        top = np.argsort(probs)[::-1][: args.topk]
        out = {
            "path": path,
            "top": [
                [
                    (f"Keyword: {name}" if i > 526 else name),
                    round(float(probs[i]), 4),
                ]
                for i in top
                for name in [labels.get(int(i), f"class_{int(i)}")]
            ],
        }
        print(json.dumps(out), flush=True)

    with service:
        for line in sys.stdin:
            path = line.strip()
            if not path:
                continue
            wav, sr = read_wav(path)
            assert sr == service.cfg.sample_rate, f"{path}: expected 16 kHz"
            pending.append((path, service.submit(wav[0])))
            # drain completed results INCREMENTALLY (in submit order): a
            # long-running producer must see output before stdin EOF, and
            # pending futures must not grow without bound
            while pending and pending[0][1].done():
                p, fut = pending.popleft()
                emit(p, fut.result())
        for path, fut in pending:
            emit(path, fut.result())
    return 0


if __name__ == "__main__":
    sys.exit(main())
