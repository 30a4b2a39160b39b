"""On-chip numerics gate: the REAL TPU's outputs vs the committed goldens.

The CPU suite pins every path against `tests/goldens/` in interpret
mode; this tool closes the remaining gap — does the REAL Mosaic kernel /
XLA:TPU pipeline reproduce those committed numbers? Checks, per sample
wav batch:

- exact-precision Pallas tfb serving forward vs the committed e2e golden
  (BASELINE's <=1e-3 logit-drift gate);
- fast precision vs exact (the documented <=3e-4 serving contract);
- int16 PCM vs f32 input (must be bitwise);
- scanned dispatch vs per-batch (f32 epsilon, <=1e-6: XLA fuses the
  non-kernel ops differently inside the scan body — measured 1.2e-7);
- the mel kernel (exact, bft) vs the committed frontend golden.

Run:  timeout 900 python tools/verify_tpu_numerics.py
Exits nonzero on any gate failure; prints one line per gate.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.data import read_wav
    from uit_mobile_tpu.frontend import quantize_pcm16
    from uit_mobile_tpu.ops import (
        make_forward_fn, make_frontend_fn, make_scanned_forward,
        pallas_log_mel,
    )
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"# device {dev} ({dev.platform})", flush=True)
    failures = 0

    def gate(name, value, budget):
        nonlocal failures
        ok = value <= budget
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name}: {value:.3e} "
              f"(budget {budget:g})", flush=True)

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    wav, sr = read_wav(REPO / "samples" / "85b877b5_nohash_0.wav")
    wav = jnp.asarray(wav)
    golden = np.load(REPO / "tests" / "goldens" / "e2e_golden.npz")["probs"]

    # plain XLA forward on the chip vs the CPU-committed golden
    xla = np.asarray(models.apply(cfg, params, state, wav))
    gate("xla-tpu vs committed golden", np.abs(xla - golden).max(), 1e-3)

    # exact Pallas tfb serving forward (the parity-grade path)
    exact = jax.jit(make_forward_fn(cfg, params, state, use_pallas=True,
                                    precision="exact"))
    p_exact = np.asarray(exact(wav))
    gate("pallas-exact vs committed golden",
         np.abs(p_exact - golden).max(), 1e-3)

    # fast vs exact (serving contract)
    fast_fn = make_forward_fn(cfg, params, state, use_pallas=True,
                              precision="fast")
    fast = jax.jit(fast_fn)
    p_fast = np.asarray(fast(wav))
    gate("fast vs exact", np.abs(p_fast - p_exact).max(), 3e-4)

    # int16 vs f32 (must be bitwise)
    pcm = quantize_pcm16(np.asarray(wav))
    gate("int16 vs f32 (fast)",
         np.abs(np.asarray(fast(jnp.asarray(pcm))) - p_fast).max(), 0.0)

    # scanned dispatch vs per-batch: f32-epsilon, NOT bitwise — XLA's
    # fusion boundaries differ inside the scan body for the non-kernel
    # ops (measured 1.19e-7 on v5e; the Mosaic mel kernel itself is the
    # identical program both ways)
    block = jnp.stack([wav, wav])
    scanned = jax.jit(make_scanned_forward(fast_fn))
    p_scan = np.asarray(scanned(block))
    gate("scan vs per-batch (fast)",
         np.abs(p_scan - p_fast[None]).max(), 1e-6)

    # mel kernel vs the committed torch.stft-derived frontend golden
    fg = np.load(REPO / "tests" / "goldens" / "frontend_golden.npz")
    gwav = jnp.asarray(fg["rand_batch_wav"])
    mel = np.asarray(pallas_log_mel(gwav, precision="exact"))
    gate("mel kernel vs committed frontend golden (dB)",
         np.abs(mel - fg["rand_batch_logmel"]).max(), 3e-2)

    # batch-size independence of the small-batch route (PERF_NOTES
    # round 5: framing='auto' takes slices framing below B=1024; the
    # old gather framing sat in a 426 us serial fusion at B=1): kernel
    # rows are per-frame independent, so the batch-1 mel must be
    # BITWISE the first row of a batch-2 call
    m1 = np.asarray(pallas_log_mel(gwav[:1], precision="fast"))
    m2 = np.asarray(pallas_log_mel(gwav[:2], precision="fast"))
    gate("mel B=1 vs B=2 row0 (bitwise)",
         np.abs(m1 - m2[:1]).max(), 0.0)

    # StableHLO artifact roundtrip ON CHIP: serialize -> file -> reload
    # -> run; budget 1e-3 (exported-module fusion regroups the default-
    # precision matmul passes — measured 8e-5 at B=256 on v5e)
    import tempfile

    from uit_mobile_tpu.ckpt import export_serving, load_artifact, save_artifact

    exp = export_serving(cfg, params, state, batch_size=int(wav.shape[0]),
                         precision="fast", use_pallas=True,
                         platforms=("tpu",))
    with tempfile.TemporaryDirectory() as td:
        fn, _ = load_artifact(save_artifact(Path(td) / "m.uitx", exp, cfg=cfg))
        p_art = np.asarray(fn(wav))
    gate("pallas artifact roundtrip vs jitted fast",
         np.abs(p_art - p_fast).max(), 1e-3)

    print(f"{'ALL GATES PASS' if not failures else f'{failures} FAILURES'}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
