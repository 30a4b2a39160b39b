"""Benchmark CLI: throughput + latency for any model/batch on this host.

    python -m uit_mobile_tpu.cli.bench [-m uit_xs] [-b 2048] [--no-pallas]
    python -m uit_mobile_tpu.cli.bench --frontend-only   # mel kernel alone

Reports pipelined clips/s/chip and blocking p50 batch latency (the repo's
top-level bench.py prints the canonical one-line JSON for the driver).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(prog="uit-bench")
    parser.add_argument("-m", "--model", default="uit_xs")
    parser.add_argument("-b", "--batch-size", type=int, default=2048)
    parser.add_argument("--seconds", type=float, default=1.0, help="clip length")
    parser.add_argument("--no-pallas", action="store_true")
    parser.add_argument("--exact", action="store_true",
                        help="bit-parity DFT precision instead of the fast "
                        "3-pass-bf16 mode")
    parser.add_argument("--frontend-only", action="store_true")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="encoder matmul dtype (bfloat16: +23%% "
                        "train step measured, f32 LN/head; convergence "
                        "verified on-chip — PERF_NOTES round 3)")
    parser.add_argument("--scan", type=int, default=None, metavar="K",
                        help="run the forward as a K-batch scanned "
                        "dispatch (one program per K batches; measured "
                        "+52%% at K=64/B=2048 through the dev relay)")
    parser.add_argument("--train", action="store_true",
                        help="benchmark the fused PSL training step instead "
                        "of inference")
    parser.add_argument("--train-layout", default="bft",
                        choices=["bft", "tfb"],
                        help="student mel layout for --train: 'tfb' is the "
                        "transpose-free fast path (kills the 0.66 ms/step "
                        "frames-relayout copy at B=1024 — PERF_NOTES "
                        "round 4; the PSL teacher keeps 'bft')")
    parser.add_argument("--serve", action="store_true",
                        help="benchmark request latency through the "
                        "TaggingService under closed-loop load (p50/p95/p99 "
                        "per request, end-to-end incl. batching)")
    parser.add_argument("--serve-requests", type=int, default=512)
    parser.add_argument("--serve-concurrency", type=int, default=64)
    parser.add_argument("--stream", action="store_true",
                        help="benchmark always-on streaming capacity: S "
                        "concurrent streams re-scored every hop "
                        "(MultiStreamTagger.feed_all) -> windows/s and the "
                        "real-time stream count this chip sustains")
    parser.add_argument("--streams", type=int, default=1024,
                        help="concurrent streams for --stream")
    parser.add_argument("--hop", type=float, default=0.25,
                        help="re-score cadence in seconds for --stream")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "int16"],
                        help="feed raw int16 PCM (half the transfer/gather "
                        "bytes, bitwise-identical results)")
    parser.add_argument("--profile", metavar="LOGDIR", default=None,
                        help="capture a jax.profiler trace of 3 batches")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import models
    from ..ops import make_frontend_fn
    from ..frontend import FrontendConfig, log_mel_spectrogram

    dev = jax.devices()[0]

    def bench_cfg(name):
        """Model config with the bench's UiT-oriented kwargs filtered to
        the fields the family's config dataclass actually declares
        (MobileNetV2Config has no target_length/compute_dtype)."""
        import dataclasses as _dc

        base = models.get_model_config(name, outputdim=537)
        fields = {f.name for f in _dc.fields(base)}
        wanted = dict(target_length=102, compute_dtype=args.compute_dtype)
        extra = {k: v for k, v in wanted.items() if k in fields}
        if args.compute_dtype != "float32" and "compute_dtype" not in fields:
            print(f"# WARNING: {name} has no compute_dtype field — "
                  f"--compute-dtype {args.compute_dtype} ignored, "
                  f"running float32", file=sys.stderr)
        return models.get_model_config(name, outputdim=537, **extra)

    use_pallas = (dev.platform == "tpu") and not args.no_pallas
    prec = "exact" if args.exact else "fast"
    B = args.batch_size
    T = int(16000 * args.seconds)

    def mk_wav(rng, shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.1
        if args.dtype == "int16":
            from ..frontend import quantize_pcm16

            return quantize_pcm16(w)
        return w

    if args.serve:
        import threading

        from ..serve import ServiceConfig, TaggingService

        cfg = bench_cfg(args.model)
        params, state = models.build(cfg, jax.random.key(0))
        svc = TaggingService(
            cfg, params, state,
            ServiceConfig(batch_size=min(B, 256),
                          max_seconds=max(2, int(np.ceil(args.seconds))),
                          use_pallas=use_pallas, dtype=args.dtype),
        )
        rng = np.random.default_rng(0)
        clips = [mk_wav(rng, T) for _ in range(16)]
        lat: list[float] = []
        lock = threading.Lock()
        conc = max(1, min(args.serve_concurrency, args.serve_requests))
        per_client = max(1, args.serve_requests // conc)

        def client(i):
            r = np.random.default_rng(i)
            for _ in range(per_client):
                t0 = time.perf_counter()
                svc.submit(clips[int(r.integers(len(clips)))]).result(timeout=120)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)

        # warm the 1s bucket before timing
        svc.submit(clips[0]).result(timeout=600)
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,)) for i in range(conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        svc.close()
        ms = np.asarray(lat) * 1e3
        print(
            f"serve({args.model}): {len(lat)} requests, {conc} concurrent "
            f"-> {len(lat) / wall:.0f} req/s; per-request latency "
            f"p50={np.percentile(ms, 50):.1f} p95={np.percentile(ms, 95):.1f} "
            f"p99={np.percentile(ms, 99):.1f} ms (incl. batching window)"
        )
        return 0

    if args.stream:
        from ..serve import MultiStreamTagger, StreamingConfig

        cfg = bench_cfg(args.model)
        params, state = models.build(cfg, jax.random.key(0))
        S = args.streams
        sc = StreamingConfig(hop_seconds=args.hop, use_pallas=use_pallas,
                             dtype=args.dtype)
        tagger = MultiStreamTagger(cfg, params, state, n_streams=S, config=sc)
        hop = int(sc.hop_seconds * sc.sample_rate)
        rng = np.random.default_rng(0)
        chunks = [
            np.asarray(mk_wav(rng, (S, hop)))
            for _ in range(4)
        ]
        # fill the 1 s ring buffers, then time steady-state hops
        for i in range(int(np.ceil(sc.window_seconds / sc.hop_seconds))):
            tagger.feed_all(chunks[i % 4])
        iters = 12 if dev.platform == "tpu" else 2
        t0 = time.perf_counter()
        n_events = 0
        for i in range(iters):
            n_events += len(tagger.feed_all(chunks[i % 4]))
        wall = time.perf_counter() - t0
        windows_s = n_events / wall
        # each always-on stream needs 1/hop windows per second
        sustain = windows_s * sc.hop_seconds
        print(
            f"stream({args.model}, {args.dtype}): {S} streams @ hop "
            f"{sc.hop_seconds}s -> {windows_s:.0f} windows/s scored = "
            f"~{sustain:.0f} concurrent real-time streams/chip "
            f"({wall / iters * 1e3:.1f} ms per all-streams hop step; "
            f"--dtype int16 halves the per-hop transfer)"
        )
        return 0

    if args.train:
        import optax

        from ..train import make_train_step
        from ..train.steps import build_optimizer

        cfg = bench_cfg(args.model)
        psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
        if args.train_layout != "bft":
            import dataclasses as _dc

            if not hasattr(cfg, "mel_layout"):
                raise SystemExit(
                    f"--train-layout {args.train_layout} needs a UiT model")
            cfg = _dc.replace(cfg, mel_layout=args.train_layout)
        # the teacher's OWN frontend, mirroring train/loop.py's
        # UNCONDITIONAL wiring (any student layout): tfb_to_bft =
        # transposed kernel + transpose back — bitwise at fast precision,
        # 1.15x teacher (tools/probe_teacher_tfb.py); exact precision and
        # sub-lane batches fall back to the row kernel inside the helper,
        # so this measures exactly the teacher mel path the Trainer runs
        psl_frontend = make_frontend_fn(psl_cfg.frontend,
                                        use_pallas=use_pallas,
                                        precision=prec,
                                        layout="tfb_to_bft")
        params, state = models.build(cfg, jax.random.key(0))
        psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
        optimizer = build_optimizer("AdamW", 1e-3, weight_decay=5e-8)
        opt_state = optimizer.init(params)
        frontend = make_frontend_fn(cfg.frontend, use_pallas=use_pallas,
                                    precision=prec, layout=args.train_layout)
        half = B // 2
        # flat [audioset, kws] batches — the Trainer's preassembled fast
        # path (+23%/step vs dict batches, PERF_NOTES round 3)
        step = jax.jit(
            make_train_step(cfg, optimizer, mixup_alpha=0.3, max_grad_norm=1.0,
                            psl_cfg=psl_cfg, psl_split=half,
                            frontend_fn=frontend,
                            psl_frontend_fn=psl_frontend),
            donate_argnums=(0, 1, 2),
        )
        rng = np.random.default_rng(0)

        def mk():
            return {
                "wav": jnp.asarray(mk_wav(rng, (B, T))),
                "target": jnp.asarray(
                    (rng.random((B, 537)) < 0.02).astype(np.float32)),
            }

        key = jax.random.key(0)
        if args.scan:
            # K-step scanned training (train.steps.make_multi_step): one
            # dispatched program per K optimizer updates
            from ..train.steps import make_multi_step

            K = args.scan
            multi = jax.jit(make_multi_step(
                make_train_step(cfg, optimizer, mixup_alpha=0.3,
                                max_grad_norm=1.0, psl_cfg=psl_cfg,
                                psl_split=half, frontend_fn=frontend,
                                psl_frontend_fn=psl_frontend),
                psl=True),
                donate_argnums=(0, 1, 2))
            stacked = [jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[mk() for _ in range(K)])
                       for _ in range(2)]
            keys = jax.random.split(key, K)
            params, state, opt_state, m = multi(
                params, state, opt_state, stacked[0], keys,
                psl_params, psl_state)
            jax.block_until_ready(m)
            iters = max(2, (10 if dev.platform == "tpu" else 2) // K * 2)
            t0 = time.perf_counter()
            for i in range(iters):
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, K)
                params, state, opt_state, m = multi(
                    params, state, opt_state, stacked[i % 2], keys,
                    psl_params, psl_state)
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"train({args.model}+PSL, scan K={K}): batch={B} "
                  f"{dt * 1e3:.1f} ms/step = {B / dt:.0f} clips/s trained; "
                  f"loss={float(np.asarray(m['total_loss'])[-1]):.4f}")
            return 0
        batches = [mk(), mk()]
        params, state, opt_state, m = step(params, state, opt_state, batches[0], key,
                                           psl_params, psl_state)
        jax.block_until_ready(m)
        iters = 10 if dev.platform == "tpu" else 3
        t0 = time.perf_counter()
        for i in range(iters):
            key, k = jax.random.split(key)
            params, state, opt_state, m = step(params, state, opt_state,
                                               batches[i % 2], k, psl_params, psl_state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / iters
        print(f"train({args.model}+PSL): batch={B} {dt * 1e3:.1f} ms/step = "
              f"{B / dt:.0f} clips/s trained; loss={float(m['total_loss']):.4f}")
        return 0

    # two distinct buffers, alternated: remote-TPU relays can dedup
    # dispatches with identical (executable, args)
    # device uploads AFTER the --serve/--stream/--train early returns:
    # a dead (B, T) upload costs ~131 MB through the relay at defaults
    wav = jnp.asarray(mk_wav(np.random.default_rng(0), (B, T)))
    wav2 = jnp.asarray(mk_wav(np.random.default_rng(1), (B, T)))
    bufs = [wav, wav2]
    if args.frontend_only:
        fc = FrontendConfig()
        frontend = make_frontend_fn(fc, use_pallas=use_pallas, precision=prec)
        fwd = jax.jit(frontend)
        label = f"frontend({'pallas' if use_pallas else 'xla'})"
    else:
        cfg = bench_cfg(args.model)
        params, state = models.build(cfg, jax.random.key(0))
        # the PRODUCTION serving policy (auto layout: tfb for UiT,
        # tfb_to_bft mel for MobileNetV2) — measuring anything else here
        # would quote a path serving never runs
        from ..ops.pipeline import make_forward_fn

        fwd = jax.jit(make_forward_fn(cfg, params, state,
                                      use_pallas=use_pallas, precision=prec))
        label = f"{args.model}({'pallas' if use_pallas else 'xla'} frontend)"

    clips_per_call = B
    if args.scan:
        from ..ops.pipeline import make_block_builder, make_scanned_forward

        K = args.scan
        base = fwd
        fwd = jax.jit(make_scanned_forward(lambda w: base(w)))
        mkblock = make_block_builder(K)
        bufs = [jax.block_until_ready(mkblock(wav, wav2, j * K))
                for j in range(2)]
        clips_per_call = K * B
        label += f" scan K={K}"
    i = 0

    def run():
        nonlocal i
        i += 1
        return fwd(bufs[i % 2])

    out = run()
    out.block_until_ready()
    rounds, depth = (4, 8) if dev.platform == "tpu" else (2, 2)
    if args.scan:
        depth = max(2, depth // 4)
    t0 = time.perf_counter()
    for _ in range(rounds):
        for _ in range(depth):
            out = run()
        out.block_until_ready()
    thr = rounds * depth * clips_per_call / (time.perf_counter() - t0)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = run()
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50)) * 1e3
    # with --scan each blocking call runs K batches — label accordingly
    p50_unit = f"ms/dispatch({args.scan} batches)" if args.scan else "ms/batch"
    print(f"{label}: batch={B} clip={args.seconds}s device={dev.platform} "
          f"pipelined={thr:.0f} clips/s/chip blocking_p50={p50:.2f} {p50_unit}")
    if args.profile:
        from ..utils.profiling import trace, device_memory_stats

        with trace(args.profile):
            for _ in range(3):
                out = run()
            out.block_until_ready()
        print(f"trace written to {args.profile}")
        print(f"memory: {device_memory_stats()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
