"""Headline benchmark: uit_xs 1s-clip batched inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The metric is the BASELINE.json north star — 1s-clip inferences/sec/chip
for uit_xs with the fused Pallas mel frontend (fast precision; <=2.5e-4
output drift vs exact, inside the 1e-3 parity budget), served through the
K-batch scanned dispatch (ops.pipeline.make_scanned_forward: one XLA
program runs K batches per dispatch — round-3 measured +21/37/43/52% at
K=8/16/32/64 over per-batch dispatch through this relay). Extra keys anchor
the other BASELINE claims with measurements:
  per_batch_clips_per_s  one dispatch per batch (round-2 headline mode)
  exact_clips_per_s      same pipeline, exact-precision Pallas DFT
  train_clips_per_s      fused PSL train step (B=512, device-resident)
  serve_mfu / train_mfu  model-FLOP utilization vs the chip's bf16 peak
                         (utils/flops.py hand model, documented there)
  p50_batch_ms           blocking wall p50 per B=2048 batch (incl. RTT)
  b1_p50_ms / b1_p99_ms  single-clip (B=1) end-to-end blocking latency —
                         the BASELINE "fused mel+encoder p50 latency"
                         metric (relay RTT included: an upper bound)
  b1_device_p50_ms       the same metric as PROFILER DEVICE durations —
  batch_device_p50_ms    the chip's actual latency, RTT excluded
                         (utils.profiling.device_dispatch_ms)
  vs_ref_torch_cpu_range the vs_ref ratio over the accumulated
                         cross-session ref-CPU min/max (session noise
                         honesty; session_noise_pct = measured bound)
  cpu_clips_per_s        THIS framework's XLA-CPU forward on this host
  ref_torch_cpu_clips_per_s  the REFERENCE's torch uit_xs on this host's
                         CPU, mel precomputed (generous to the reference:
                         its torchaudio frontend cost is excluded)
  vs_ref_torch_cpu       value / ref_torch_cpu_clips_per_s — the honest
                         ">=50x CPU" anchor (BASELINE.json)
``vs_baseline`` compares against the reference implementation's ambition
proxy: the published Snapdragon-865 single-clip latency of 3.4 ms
(README.md:15-24) => ~294 clips/s on the reference's best mobile target.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np


def _measure(fwd, wavs, clips_per_call, rounds, depth):
    """Steady-state pipelined throughput: enqueue a stream of calls,
    block once — overlaps dispatch/tunnel latency the way a real service
    loop does. (Depth capped at 8: deeper async queues can stall the
    remote-TPU relay in this environment.)"""
    out = None
    for w in wavs:
        out = fwd(w)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(rounds):
        for i in range(depth):
            out = fwd(wavs[i % len(wavs)])
        out.block_until_ready()
    return rounds * depth * clips_per_call / (time.perf_counter() - t0)


def _ref_torch_cpu_baseline(n_clips=64, rounds=3):
    """The reference's own torch uit_xs on this host's CPU, fed
    precomputed mel (its torchaudio C++ frontend is not installable here;
    excluding the frontend only flatters the reference)."""
    try:
        import torch

        sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
        from ref_torch_loader import load_reference_module, reference_available

        if not reference_available():
            return None
        torch.set_num_threads(os.cpu_count() or 1)
        ref = load_reference_module("uit")
        torch.manual_seed(0)
        model = ref.uit_xs(outputdim=537, target_length=102)
        model.eval()
        model.front_end = torch.nn.Identity()
        mel = torch.randn(n_clips, 64, 101) * 20 - 30
        with torch.no_grad():
            model(mel)  # warmup
            t0 = time.perf_counter()
            for _ in range(rounds):
                model(mel)
            dt = (time.perf_counter() - t0) / rounds
        return n_clips / dt
    except Exception as e:  # pragma: no cover
        print(f"# ref-torch cpu baseline unavailable: {e}", file=sys.stderr)
        return None


def _train_bench(models, on_tpu):
    """Fused PSL train step (student uit_xs + MobileNetV2 teacher + mixup
    + grad clip + AdamW in one program), device-resident batches —
    measures device+dispatch throughput; loader-transfer economics are in
    PERF_NOTES (int16 loaders ~halve real-loop step time on this relay).

    Two records: the parity-grade f32 per-step mode (train_*, B=512 —
    the cross-round comparator) and the fastest known mode (train_fast_*)
    — the round-4 frontier winner: B=1024, tfb student layout, bfloat16
    encoder + teacher, K=16 optimizer updates per dispatch
    (tools/probe_train_frontier.py mapped the B x dtype x K knee:
    B=2048 regresses, K=32 buys only +3%; tools/probe_tfb_train.py
    measured the tfb train branch +12.4%; tools/probe_teacher_bf16.py
    the bf16 teacher +1.8%), all opt-in production levers
    (`batch_size` / `model_args: {compute_dtype, mel_layout}` /
    `steps_per_dispatch` / `psl: {compute_dtype}` config keys)."""
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step

    B = 512 if on_tpu else 8
    B_fast = 1024 if on_tpu else 8  # frontier winner for the fast record
    K = 16 if on_tpu else 4  # multi-step scan depth for the fast record
    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    # bf16 teacher for the fast record (+1.8% full-step, losses equal to
    # 4 decimals — tools/probe_teacher_bf16.py); parity record keeps f32
    psl_cfg_fast = models.get_model_config("MobileNetV2", outputdim=527,
                                           compute_dtype="bfloat16")
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    # built from the teacher's OWN frontend config (train/loop.py wiring);
    # the UiT student's default frontend is identical, so the parity step
    # shares it
    frontend = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                precision="fast")
    rng = np.random.default_rng(0)

    # flat [audioset, kws] batches: the Trainer's preassembled fast path
    # (psl_split) — no on-device concatenates (+23%/step measured,
    # tools/probe_preassembled.py)
    batches = [{
        "wav": jnp.asarray(rng.standard_normal((B, 16000))
                           .astype(np.float32) * 0.1),
        "target": jnp.asarray((rng.uniform(size=(B, 537)) > 0.95)
                              .astype(np.float32)),
    } for _ in range(2)]

    def build(compute_dtype, mel_layout="bft"):
        cfg = models.get_model_config("uit_xs", outputdim=537,
                                      target_length=102,
                                      compute_dtype=compute_dtype,
                                      mel_layout=mel_layout)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        return cfg, params, state, opt, opt.init(params)

    # --- parity-grade record: f32, one optimizer update per dispatch
    cfg, params, state, opt, opt_state = build("float32")
    step = jax.jit(
        make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                        psl_cfg=psl_cfg, psl_split=B // 2,
                        frontend_fn=frontend),
        donate_argnums=(0, 1, 2),
    )
    key = jax.random.key(7)
    params, state, opt_state, m = step(params, state, opt_state, batches[0],
                                       key, psl_params, psl_state)
    jax.block_until_ready(m)  # compile
    steps = 16 if on_tpu else 4
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, state, opt_state, m = step(params, state, opt_state,
                                           batches[i % 2], k,
                                           psl_params, psl_state)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(float(m["total_loss"]))
    record = {"train_step_ms": round(dt * 1e3, 2),
              "train_clips_per_s": round(B / dt, 1),
              "train_batch": B}

    # --- fastest known mode: B=1024 + bf16 encoder + tfb student layout
    # + K=16 updates per dispatch + bf16 teacher (the round-4 frontier
    # winner; the tfb TRAIN branch kills the bft row-kernel's 1.3 ms of
    # frames-relayout/wav-transpose copies — +12.4% measured,
    # tools/probe_tfb_train.py)
    try:
        cfg, params, state, opt, opt_state = build("bfloat16",
                                                   mel_layout="tfb")
        fe_tfb = make_frontend_fn(None, use_pallas=on_tpu, precision="fast",
                                  layout="tfb")
        # teacher mel through the transposed kernel + one transpose back
        # to bft: bitwise-equal, 1.15x teacher / +6% full step
        # (tools/probe_teacher_tfb.py)
        fe_teacher = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                      precision="fast", layout="tfb_to_bft")
        multi = jax.jit(
            make_multi_step(
                make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                                psl_cfg=psl_cfg_fast, psl_split=B_fast // 2,
                                frontend_fn=fe_tfb,
                                psl_frontend_fn=fe_teacher),
                psl=True),
            donate_argnums=(0, 1, 2),
        )
        fast_batches = [{
            "wav": jnp.asarray(rng.standard_normal((B_fast, 16000))
                               .astype(np.float32) * 0.1),
            "target": jnp.asarray((rng.uniform(size=(B_fast, 537)) > 0.95)
                                  .astype(np.float32)),
        } for _ in range(2)]
        stack = [jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[fast_batches[(j + i) % 2] for i in range(K)])
                 for j in range(2)]
        keys = jax.random.split(jax.random.key(9), K)
        params, state, opt_state, m = multi(params, state, opt_state,
                                            stack[0], keys,
                                            psl_params, psl_state)
        jax.block_until_ready(m)  # compile
        n_disp = 2 if on_tpu else 1
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = multi(params, state, opt_state,
                                                stack[i % 2], keys,
                                                psl_params, psl_state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        assert np.isfinite(float(np.asarray(m["total_loss"])[-1]))
        record.update(train_fast_step_ms=round(dt * 1e3, 2),
                      train_fast_clips_per_s=round(B_fast / dt, 1),
                      train_fast_batch=B_fast,
                      train_fast_mode=(f"tfb+bfloat16+scan{K}+bf16teacher"
                                       f"+tfbTeacherMel"))

        # --- offline-PSL mode (round 5): the SAME frontier composition
        # with the teacher-free plain step — `psl: {mode: offline}`
        # serves precomputed teacher targets from the uit-psl-cache grid
        # (data/psl_cache.py), so the in-step MobileNetV2 (26% of the
        # online step, PERF_NOTES r4) disappears — measured +25.7%
        # (tools/probe_offline_psl.py). Input blocks are raw int16 PCM
        # (`data_dtype: int16`): bitwise-equal (the frontends fold
        # 1/32768 exactly) and +7.4% on top — half the framing-gather
        # HBM traffic (tools/probe_offline_int16.py). Bench targets are
        # synthetic rows of the same shape; the step program is
        # identical to production's.
        cfg, params, state, opt, opt_state = build("bfloat16",
                                                   mel_layout="tfb")
        multi_off = jax.jit(
            make_multi_step(
                make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                                frontend_fn=fe_tfb),
                psl=False),
            donate_argnums=(0, 1, 2),
        )
        stack_i16 = [
            {"wav": jax.block_until_ready(  # quantize ON device: no
                jnp.clip(s["wav"] * 32768.0, -32768, 32767)  # host pull
                .astype(jnp.int16)),
             "target": s["target"]}
            for s in stack
        ]
        keys = jax.random.split(jax.random.key(11), K)
        params, state, opt_state, m = multi_off(params, state, opt_state,
                                                stack_i16[0], keys)
        jax.block_until_ready(m)  # compile
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(200 + i), K)
            params, state, opt_state, m = multi_off(params, state, opt_state,
                                                    stack_i16[i % 2], keys)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        assert np.isfinite(float(np.asarray(m["total_loss"])[-1]))
        record.update(train_offline_step_ms=round(dt * 1e3, 2),
                      train_offline_clips_per_s=round(B_fast / dt, 1),
                      train_offline_mode=(f"offlinePSL+int16+tfb+bfloat16"
                                          f"+scan{K}"))
    except Exception as e:  # never let the fast record sink the headline
        print(f"# train fast record unavailable: {e}", file=sys.stderr)
    return record


def main():
    # Device init goes through a remote relay that can stall indefinitely
    # when the tunnel is down (observed: jax.devices() hanging for hours).
    # Bound it: if the backend has not materialized in 10 minutes, emit the
    # last COMPLETED on-chip bench result clearly marked stale (so a relay
    # outage at bench time does not erase the round's measured record —
    # provenance in PERF_NOTES.md), then exit nonzero.
    import threading

    def _stale_fallback():
        print("# bench watchdog: device init exceeded 600 s — TPU relay "
              "unreachable; emitting the last completed on-chip result "
              "(stale=true) and aborting instead of hanging", file=sys.stderr)
        sys.stderr.flush()
        # BENCH_LAST.json is (re)written by every successful on-chip run,
        # so the stale record stays truthful by construction; the literal
        # below is only the seed for a repo that never benched on-chip
        # since this file landed (round-3 measured run, see PERF_NOTES.md)
        record = {
            "metric": ("uit_xs 1s-clip inferences/sec/chip (K-batch scanned "
                       "dispatch, pallas mel frontend, tfb layout, int16 "
                       "PCM in)"),
            "value": 308014.0,
            "unit": "clips/s",
            "vs_baseline": round(308014.0 / (1000.0 / 3.4), 2),
        }
        try:
            record = json.loads(
                (Path(__file__).parent / "BENCH_LAST.json").read_text())
        except Exception:
            pass
        record.update(
            stale=True,
            stale_reason=("TPU relay unreachable at bench time (600 s "
                          "device-init watchdog); record is the last "
                          "completed on-chip bench.py run — see "
                          "PERF_NOTES.md 'relay outage' note"),
        )
        print(json.dumps(record))
        sys.stdout.flush()
        os._exit(3)

    watchdog = threading.Timer(600.0, _stale_fallback)
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn, make_scanned_forward
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.flops import (
        device_peak_flops, train_step_flops, uit_forward_flops, xla_flops,
    )

    # persistent executable cache: repeated bench runs (and the driver's)
    # skip the remote compile, which intermittently takes minutes
    enable_compilation_cache()

    dev = jax.devices()[0]
    watchdog.cancel()  # backend is up; long compiles are handled below
    on_tpu = dev.platform == "tpu"
    print(f"# device: {dev} platform={dev.platform}", file=sys.stderr)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))

    def make_fwd(frontend):
        return jax.jit(lambda w: models.apply(cfg, params, state, w,
                                              frontend_fn=frontend))

    B = 2048 if on_tpu else 64
    # scan depth: measured +21/37/43/52% at K=8/16/32/64 over per-batch
    # dispatch (B=2048, same-session A/B); K=64 holds 2x4.2 GB of input
    # blocks in HBM — comfortable on a 16 GB chip, and 93% of the
    # profiler's ~332k device-limited ceiling
    K = 64 if on_tpu else 2
    rng = np.random.default_rng(0)
    # two distinct buffers, alternated: guards against any same-args
    # dispatch dedup in remote-TPU relays. Headline input is raw int16 PCM
    # (the HDF5 datasets' storage format): the framing gather moves half
    # the HBM bytes and the 1/32768 scale folds into the DFT matrices
    # bitwise-exactly (ops/pallas_mel.py) — measured +23% over f32 wavs.
    from uit_mobile_tpu.frontend import quantize_pcm16

    pcm = [
        quantize_pcm16(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
        for _ in range(2)
    ]
    wavs = [jnp.asarray(p) for p in pcm]
    wavs_f32 = [jnp.asarray(p.astype(np.float32) / 32768.0) for p in pcm]
    rounds, depth = (4, 8) if on_tpu else (2, 2)

    # headline forward: fused Pallas mel frontend in the TRANSPOSED
    # (T, F, B) layout — the framing gather's native orientation, so
    # neither the frames nor the mel are ever re-laid-out
    # (models/uit.patch_embed_tfb folds init_bn into the patch embed),
    # fast (3-pass bf16 DFT) precision
    from uit_mobile_tpu.ops.pipeline import make_forward_fn

    fast_fn = make_forward_fn(cfg, params, state, use_pallas=on_tpu,
                              precision="fast" if on_tpu else "exact")
    fwd_fast = jax.jit(fast_fn)
    per_batch_clips_per_s = _measure(fwd_fast, wavs, B, rounds, depth)

    # K-batch scanned dispatch (the round-3 headline): blocks built ON
    # DEVICE (uploading ~GB blocks through the relay would swamp setup)
    from uit_mobile_tpu.ops.pipeline import make_block_builder

    mkblock = make_block_builder(K)
    blocks = [jax.block_until_ready(mkblock(wavs[0], wavs[1], j * K))
              for j in range(2)]
    scanned = jax.jit(make_scanned_forward(fast_fn))
    # depth 8: scanned dispatches pipeline like per-batch ones (measured
    # 296/308/314/317k at depth 1/2/4/8, K=64 — no relay stall observed)
    clips_per_s = _measure(scanned, blocks, K * B,
                           rounds if on_tpu else 1, 8 if on_tpu else 2)

    f32_clips_per_s = exact_clips_per_s = None
    if on_tpu:
        # same per-batch pipeline fed normalized f32 wavs
        f32_clips_per_s = _measure(fwd_fast, wavs_f32, B, rounds, depth)
        # exact-precision Pallas DFT (the parity-grade serving mode), tfb
        fwd_exact = jax.jit(make_forward_fn(cfg, params, state,
                                            use_pallas=True,
                                            precision="exact"))
        exact_clips_per_s = _measure(fwd_exact, wavs, B, rounds, depth)

    # measured CPU baselines: (a) THIS framework's XLA-CPU forward, (b)
    # the reference's torch model on the same host (mel precomputed)
    cpu_clips_per_s = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            cpu_B = 64
            cpu_wavs = [
                jnp.asarray(rng.standard_normal((cpu_B, 16000))
                            .astype(np.float32) * 0.1)
                for _ in range(2)
            ]
            fwd_cpu = make_fwd(make_frontend_fn(cfg.frontend, use_pallas=False))
            cpu_clips_per_s = _measure(fwd_cpu, cpu_wavs, cpu_B,
                                       rounds=2, depth=2)
    except Exception as e:  # CPU backend unavailable in some relay setups
        print(f"# cpu baseline unavailable: {e}", file=sys.stderr)
    ref_torch_cpu = _ref_torch_cpu_baseline()

    # fused PSL train step + MFU accounting (round-3 VERDICT items 3/5)
    train = _train_bench(models, on_tpu)
    peak = device_peak_flops(dev)
    serve_flops_per_clip = uit_forward_flops(cfg, 16000)
    serve_mfu = train_mfu = train_fast_mfu = None
    serve_bytes_per_clip = serve_hbm_util = None
    if peak is not None and on_tpu:
        serve_mfu = clips_per_s * serve_flops_per_clip / peak
        # HBM roofline (round-4 VERDICT next-3): XLA's fusion-aware
        # 'bytes accessed' of the compiled serving program / datasheet
        # bandwidth. The DEVICE-limited utilization (vs batch_device_p50)
        # lands below as serve_hbm_util_device — that is the number that
        # certifies (or breaks) the 6.05 ms/batch ceiling claim.
        from uit_mobile_tpu.utils.flops import device_hbm_bandwidth, xla_cost

        hbm_bw = device_hbm_bandwidth(dev)
        serve_bytes = xla_cost(fwd_fast, wavs[0])["bytes"]
        if serve_bytes and hbm_bw:
            serve_bytes_per_clip = serve_bytes / B
            serve_hbm_util = clips_per_s * serve_bytes_per_clip / hbm_bw
        # train: student fwd+bwd (3x) + MobileNetV2 teacher fwd; the
        # teacher's conv FLOPs come from XLA's cost analysis when the
        # backend reports one, else the student-only lower bound
        psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
        psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
        teacher_flops = xla_flops(
            jax.jit(lambda w: models.apply(psl_cfg, psl_params, psl_state, w)),
            jnp.zeros((8, 16000), jnp.float32),
        )
        teacher_per_clip = (teacher_flops / 8) if teacher_flops else 0.0
        train_flops_per_clip = (
            train_step_flops(serve_flops_per_clip) + teacher_per_clip / 2
        )  # teacher scores only the AudioSet half of each batch
        train_mfu = train["train_clips_per_s"] * train_flops_per_clip / peak
        if "train_fast_clips_per_s" in train:
            train_fast_mfu = (train["train_fast_clips_per_s"]
                              * train_flops_per_clip / peak)

    # blocking per-batch p50 (diagnostic; includes dispatch/tunnel RTT)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = fwd_fast(wavs[0])
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))

    # single-clip (B=1) blocking latency: the BASELINE.json "fused
    # mel+encoder p50 latency" metric, measured end-to-end (one wav in,
    # probs out, block_until_ready). Through this remote relay the wall
    # number is dominated by tunnel RTT, not device time (PERF_NOTES:
    # sub-10 ms dispatches are not device-resolvable here), so it is an
    # honest SERVICE latency, an upper bound on on-chip latency. Two
    # alternating buffers defeat the relay's identical-dispatch dedup.
    b1_p50_ms = b1_p99_ms = None
    b1 = [jnp.asarray(p[:1]) for p in pcm]
    try:
        fwd_fast(b1[0]).block_until_ready()  # compile the B=1 program
        b1_times = []
        for i in range(50):
            t0 = time.perf_counter()
            fwd_fast(b1[i % 2]).block_until_ready()
            b1_times.append(time.perf_counter() - t0)
        b1_p50_ms = float(np.percentile(b1_times, 50)) * 1e3
        b1_p99_ms = float(np.percentile(b1_times, 99)) * 1e3
    except Exception as e:  # never let the latency probe sink the headline
        print(f"# B=1 latency probe unavailable: {e}", file=sys.stderr)

    # ON-DEVICE latency (the BASELINE "fused mel+encoder p50 latency"
    # metric proper): profiler device durations per BLOCKING dispatch,
    # clustered at idle gaps (utils.profiling.device_dispatch_ms) — the
    # wall numbers above are tunnel-RTT-dominated and say nothing about
    # the chip (round-3 VERDICT missing #3). The reference's comparable
    # number is 3.4 ms/clip on a Snapdragon 865 (README.md:15-24).
    b1_device_p50_ms = batch_device_p50_ms = None
    if on_tpu:
        import shutil

        from uit_mobile_tpu.utils.profiling import device_dispatch_ms

        def _device_p50(fn, bufs, iters):
            logdir = "/tmp/uit_bench_latency"
            shutil.rmtree(logdir, ignore_errors=True)
            fn(bufs[0]).block_until_ready()  # warm (already compiled)
            jax.profiler.start_trace(logdir)
            for i in range(iters):
                fn(bufs[i % 2]).block_until_ready()  # blocking: gaps = RTT
            jax.profiler.stop_trace()
            durs = device_dispatch_ms(logdir)
            # drop stray sub-clusters (trace edges) by keeping the iters
            # largest, which are the real dispatches
            durs = sorted(durs, reverse=True)[:iters]
            return float(np.percentile(durs, 50)) if durs else None

        try:
            b1_device_p50_ms = _device_p50(fwd_fast, b1, 20)
            batch_device_p50_ms = _device_p50(fwd_fast, wavs, 8)
        except Exception as e:
            print(f"# device latency probe unavailable: {e}", file=sys.stderr)

    # latency-throughput Pareto (round-4 VERDICT next-5): device p50 at
    # the batch sizes between the B=1 latency point and the B=2048
    # throughput point, so a deployer can pick an operating point instead
    # of interpolating between the two extremes
    latency_pareto = {}
    if on_tpu and b1_device_p50_ms is not None:
        latency_pareto["1"] = round(b1_device_p50_ms, 3)
        for pb in (8, 32, 64, 256):
            try:
                bufs = [jnp.asarray(p[:pb]) for p in pcm]
                fwd_fast(bufs[0]).block_until_ready()  # compile
                ms = _device_p50(fwd_fast, bufs, 10)
                if ms is not None:
                    latency_pareto[str(pb)] = round(ms, 3)
            except Exception as e:
                print(f"# pareto B={pb} unavailable: {e}", file=sys.stderr)
        if batch_device_p50_ms is not None:
            latency_pareto[str(B)] = round(batch_device_p50_ms, 3)

    print(
        f"# B={B} K={K} scanned={clips_per_s:.0f} "
        f"per-batch={per_batch_clips_per_s:.0f} "
        f"f32={f32_clips_per_s and round(f32_clips_per_s)} "
        f"exact={exact_clips_per_s and round(exact_clips_per_s)} "
        f"train={train['train_clips_per_s']} clips/s "
        f"({train['train_step_ms']} ms/step); cpu={cpu_clips_per_s} "
        f"ref-torch-cpu={ref_torch_cpu and round(ref_torch_cpu, 1)}; "
        f"serve_mfu={serve_mfu} train_mfu={train_mfu}; "
        f"blocking p50={p50 * 1e3:.2f} ms/batch; "
        f"B=1 p50={b1_p50_ms and round(b1_p50_ms, 2)} ms "
        f"p99={b1_p99_ms and round(b1_p99_ms, 2)} ms",
        file=sys.stderr,
    )

    # Reference ambition proxy: 3.4 ms/clip on Snapdragon 865 (README.md:15-24)
    baseline_clips_per_s = 1000.0 / 3.4
    record = {
        "metric": "uit_xs 1s-clip inferences/sec/chip (K-batch scanned dispatch, pallas mel frontend, tfb layout, int16 PCM in)",
        "value": round(clips_per_s, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_s / baseline_clips_per_s, 2),
        "per_batch_clips_per_s": round(per_batch_clips_per_s, 1),
        "scan_batches": K,
    }
    record["p50_batch_ms"] = round(p50 * 1e3, 2)
    if b1_p50_ms is not None:
        # end-to-end single-clip latency through the serving forward
        # (includes dispatch/relay RTT — an upper bound on device latency;
        # the reference's published mobile proxy is 3.4 ms on SD865)
        record["b1_p50_ms"] = round(b1_p50_ms, 2)
        record["b1_p99_ms"] = round(b1_p99_ms, 2)
    if b1_device_p50_ms is not None:
        # profiler device duration per dispatch — the chip's actual
        # latency, relay RTT excluded (vs the reference's 3.4 ms on SD865)
        record["b1_device_p50_ms"] = round(b1_device_p50_ms, 3)
    if batch_device_p50_ms is not None:
        record["batch_device_p50_ms"] = round(batch_device_p50_ms, 3)
    if latency_pareto:
        # device p50 per batch size (ms/batch): the latency-throughput
        # curve between the B=1 and B=2048 operating points
        record["latency_pareto_device_ms"] = latency_pareto
    if "8" in latency_pareto:
        # the serving-bucket single-request path: buckets pad a lone
        # clip to the bucket size (ServiceConfig.low_latency uses 8) —
        # same program/shape as pareto B=8. Since round 5's slices
        # framing (pallas_log_mel framing='auto', PERF_NOTES) the raw
        # B=1 program is the faster of the two (~51 vs ~66 us).
        record["b1_padded_bucket_device_p50_ms"] = latency_pareto["8"]
    if f32_clips_per_s is not None:
        record["f32_clips_per_s"] = round(f32_clips_per_s, 1)
    if exact_clips_per_s is not None:
        record["exact_clips_per_s"] = round(exact_clips_per_s, 1)
    record.update(train)

    # Session-range honesty (round-4 VERDICT weak #6): the relay wall
    # clock varies ~±5-20% across sessions, so each train headline
    # carries an accumulated min/max merged from the previous committed
    # record — docs must quote record+range, never a naked number.
    try:
        prev = json.loads(
            (Path(__file__).parent / "BENCH_LAST.json").read_text())
    except Exception:
        prev = {}

    def session_minmax(value_key, minmax_key, seed_lo, seed_hi):
        if value_key not in record:
            return
        lo, hi = seed_lo, seed_hi
        try:
            plo, phi = prev.get(minmax_key, (lo, hi))
            lo, hi = min(lo, plo), max(hi, phi)
        except Exception:
            pass
        v = record[value_key]
        record[minmax_key] = [round(min(lo, v), 1), round(max(hi, v), 1)]

    # seeds: measured round-4 span (81.0k integrated-record low, 101.5k
    # idle-host high) and the round-5 offline span (130.0k bench floor,
    # 140.5k probe high)
    session_minmax("train_fast_clips_per_s", "train_fast_minmax",
                   81000.0, 101529.0)
    session_minmax("train_offline_clips_per_s", "train_offline_minmax",
                   129900.0, 140547.0)
    # the plain f32-B=512 step has shipped a 2.7x-degraded sample once
    # (busy relay session: 21.6 ms/step vs the documented ~8 ms band) —
    # carry its range too; seeds = the documented rounds-2-5 span
    session_minmax("train_clips_per_s", "train_minmax", 45173.0, 66000.0)
    if serve_mfu is not None:
        record["serve_mfu"] = round(serve_mfu, 4)
        record["serve_flops_per_clip"] = round(serve_flops_per_clip)
    if serve_hbm_util is not None:
        # wall-clock HBM utilization; the device-limited twins divide
        # bytes by the profiler batch p50 (dispatch gaps excluded).
        # XLA's 'bytes accessed' OVERCOUNTS true HBM traffic (it charges
        # VMEM-resident reuse inside fusions/Pallas grids), so the _xla
        # key is an upper bound and can exceed 1.0; the _model key uses
        # the analytic unfused-stream hand model — a lower bound. True
        # utilization lies between them (round-5 roofline: [0.89, 1.40]
        # at B=2048 => the 6.05 ms ceiling is certified HBM-dominated;
        # tools/probe_roofline.py, PERF_NOTES round 5).
        record["serve_hbm_util"] = round(serve_hbm_util, 4)
        record["serve_bytes_per_clip"] = round(serve_bytes_per_clip)
        if batch_device_p50_ms:
            from uit_mobile_tpu.utils.flops import (
                device_hbm_bandwidth as _bwf,
                uit_serve_stage_bytes,
            )

            _bw = _bwf(dev)
            record["serve_hbm_util_device_xla"] = round(
                serve_bytes_per_clip * B
                / (batch_device_p50_ms * 1e-3) / _bw, 4)
            model_bytes = uit_serve_stage_bytes(cfg, B, 16000,
                                                dtype="int16")["total"]
            record["serve_hbm_util_device_model"] = round(
                model_bytes / (batch_device_p50_ms * 1e-3) / _bw, 4)
    if train_mfu is not None:
        record["train_mfu"] = round(train_mfu, 4)
    if train_fast_mfu is not None:
        record["train_fast_mfu"] = round(train_fast_mfu, 4)
    if cpu_clips_per_s is not None:
        record["cpu_clips_per_s"] = round(cpu_clips_per_s, 1)
        record["vs_cpu_baseline"] = round(clips_per_s / cpu_clips_per_s, 1)
    if ref_torch_cpu is not None:
        record["ref_torch_cpu_clips_per_s"] = round(ref_torch_cpu, 1)
        record["vs_ref_torch_cpu"] = round(clips_per_s / ref_torch_cpu, 1)
        # Session-noise honesty (round-3 VERDICT weak #7): the relay's
        # wall clock varies ~5-20% across sessions and this host's CPU
        # clock varies even more, so the single vs_ref number must carry
        # its cross-session range. The ref-CPU min/max accumulates across
        # runs via BENCH_LAST.json (seeded with the measured PERF_NOTES
        # span: 262.5-1052.9 clips/s across round-3 sessions).
        lo, hi = 262.5, 1052.9
        try:
            prev = json.loads(
                (Path(__file__).parent / "BENCH_LAST.json").read_text())
            plo, phi = prev.get("ref_torch_cpu_minmax", (lo, hi))
            lo, hi = min(lo, plo), max(hi, phi)
        except Exception:
            pass
        lo, hi = min(lo, ref_torch_cpu), max(hi, ref_torch_cpu)
        record["ref_torch_cpu_minmax"] = [round(lo, 1), round(hi, 1)]
        record["vs_ref_torch_cpu_range"] = [round(clips_per_s / hi, 1),
                                            round(clips_per_s / lo, 1)]
        record["session_noise_pct"] = 20  # measured relay variance bound
    if on_tpu:
        # keep the relay-outage fallback truthful: persist the last REAL
        # on-chip record (CPU smoke runs must not clobber it)
        try:
            (Path(__file__).parent / "BENCH_LAST.json").write_text(
                json.dumps(record))
        except OSError as e:
            print(f"# could not persist BENCH_LAST.json: {e}",
                  file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
