"""Headline benchmark: uit_xs 1s-clip batched inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The metric is the BASELINE.json north star — 1s-clip inferences/sec/chip for
uit_xs with the fused Pallas mel frontend (fast precision; <=2.5e-4 output
drift vs exact, inside the 1e-3 parity budget). Extra keys anchor the other
BASELINE claims with measurements:
  exact_clips_per_s      same pipeline, exact-precision Pallas DFT
  cpu_clips_per_s        XLA-frontend forward on THIS HOST's CPU backend
  vs_cpu_baseline        value / cpu_clips_per_s (the ">=50x CPU" north star)
``vs_baseline`` compares against the reference implementation's ambition
proxy: the published Snapdragon-865 single-clip latency of 3.4 ms
(README.md:15-24) => ~294 clips/s on the reference's best mobile target.
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def _measure(fwd, params, state, wavs, B, rounds, depth):
    """Steady-state pipelined throughput: enqueue a stream of batches,
    block once — overlaps dispatch/tunnel latency the way a real service
    loop does. (Depth capped at 8: deeper async queues can stall the
    remote-TPU relay in this environment.)"""
    out = None
    for w in wavs:
        out = fwd(params, state, w)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(rounds):
        for i in range(depth):
            out = fwd(params, state, wavs[i % len(wavs)])
        out.block_until_ready()
    return rounds * depth * B / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.utils import enable_compilation_cache

    # persistent executable cache: repeated bench runs (and the driver's)
    # skip the remote compile, which intermittently takes minutes
    enable_compilation_cache()

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device: {dev} platform={dev.platform}", file=sys.stderr)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))

    def make_fwd(frontend):
        return jax.jit(lambda p, s, w: models.apply(cfg, p, s, w, frontend_fn=frontend))

    # B=4096 measured +3% over 2048 (same process) — amortizes per-dispatch
    # overhead further; VMEM/HBM comfortable (frames buffer ~870 MB)
    B = 4096 if on_tpu else 64
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

    # headline: fused Pallas mel frontend in the TRANSPOSED (T, F, B)
    # layout — the framing gather's native orientation, so neither the
    # frames nor the mel are ever re-laid-out (models/uit.patch_embed_tfb
    # folds init_bn into the patch embed), fast (3-pass bf16 DFT) precision
    def make_fwd_layout(layout, frontend):
        c = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                    mel_layout=layout)
        return jax.jit(lambda p, s, w: models.apply(c, p, s, w, frontend_fn=frontend))

    fwd_fast = make_fwd_layout("tfb", make_frontend_fn(
        cfg.frontend, use_pallas=on_tpu, precision="fast", layout="tfb"))
    clips_per_s = _measure(fwd_fast, params, state, wavs, B, rounds, depth)

    btf_clips_per_s = bft_clips_per_s = exact_clips_per_s = f32_clips_per_s = None
    if on_tpu:
        # same pipeline fed normalized f32 wavs
        f32_clips_per_s = _measure(fwd_fast, params, state, wavs_f32, B, rounds, depth)
        # round-2 (B, T, F) layout, for comparison
        fwd_btf = make_fwd_layout("btf", make_frontend_fn(
            cfg.frontend, use_pallas=True, precision="fast", layout="btf"))
        btf_clips_per_s = _measure(fwd_btf, params, state, wavs, B, rounds, depth)
        # reference-orientation path (round-1 headline), for comparison
        fwd_bft = make_fwd(make_frontend_fn(cfg.frontend, use_pallas=True,
                                            precision="fast"))
        bft_clips_per_s = _measure(fwd_bft, params, state, wavs, B, rounds, depth)
        # exact-precision Pallas DFT (the parity-grade serving mode), tfb
        fwd_exact = make_fwd_layout("tfb", make_frontend_fn(
            cfg.frontend, use_pallas=True, precision="exact", layout="tfb"))
        exact_clips_per_s = _measure(fwd_exact, params, state, wavs, B, rounds, depth)

    # measured CPU baseline: the SAME model with the XLA-op frontend on this
    # host's CPU backend — anchors the ">=50x CPU clips/s" north star with a
    # measurement instead of a proxy
    cpu_clips_per_s = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            cpu_B = 64
            cpu_wavs = [
                jnp.asarray(rng.standard_normal((cpu_B, 16000)).astype(np.float32) * 0.1)
                for _ in range(2)
            ]
            fwd_cpu = make_fwd(make_frontend_fn(cfg.frontend, use_pallas=False))
            cpu_clips_per_s = _measure(fwd_cpu, params, state, cpu_wavs, cpu_B,
                                       rounds=2, depth=2)
    except Exception as e:  # CPU backend unavailable in some relay setups
        print(f"# cpu baseline unavailable: {e}", file=sys.stderr)

    # blocking per-batch p50 (diagnostic; includes dispatch/tunnel RTT)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = fwd_fast(params, state, wavs[0])
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))

    print(
        f"# batch={B} pipelined fast-tfb-int16={clips_per_s:.0f} "
        f"fast-tfb-f32={f32_clips_per_s and round(f32_clips_per_s)} "
        f"fast-btf={btf_clips_per_s and round(btf_clips_per_s)} "
        f"fast-bft={bft_clips_per_s and round(bft_clips_per_s)} "
        f"exact-tfb={exact_clips_per_s and round(exact_clips_per_s)} "
        f"cpu={cpu_clips_per_s and round(cpu_clips_per_s, 1)} clips/s/chip; "
        f"blocking p50={p50 * 1e3:.2f} ms/batch",
        file=sys.stderr,
    )

    # Reference ambition proxy: 3.4 ms/clip on Snapdragon 865 (README.md:15-24)
    baseline_clips_per_s = 1000.0 / 3.4
    record = {
        "metric": "uit_xs 1s-clip inferences/sec/chip (batched, pallas mel frontend, tfb layout, int16 PCM in)",
        "value": round(clips_per_s, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_s / baseline_clips_per_s, 2),
    }
    if f32_clips_per_s is not None:
        record["f32_clips_per_s"] = round(f32_clips_per_s, 1)
    if exact_clips_per_s is not None:
        record["exact_clips_per_s"] = round(exact_clips_per_s, 1)
    if btf_clips_per_s is not None:
        record["btf_clips_per_s"] = round(btf_clips_per_s, 1)
    if bft_clips_per_s is not None:
        record["bft_clips_per_s"] = round(bft_clips_per_s, 1)
    if cpu_clips_per_s is not None:
        record["cpu_clips_per_s"] = round(cpu_clips_per_s, 1)
        record["vs_cpu_baseline"] = round(clips_per_s / cpu_clips_per_s, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
