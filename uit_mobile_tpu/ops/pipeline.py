"""Best-available eval forward dispatch.

`make_forward_fn` picks the fastest known implementation for a config and
platform: on TPU, the fused Pallas mel frontend in its native (B, T, F)
layout consumed by the BN-folded patch embed (models/uit.patch_embed_btf)
— the measured-best serving path; elsewhere, the pure-XLA reference path.

History: a fused whole-encoder Pallas kernel lived here through round 2
(banded block-diagonal attention over clip groups). It roughly tied the
XLA encoder in round 1 and lost by ~8% once the per-head lane-slice
attention removed XLA's per-block relayout copies (118.3k vs 128.3k
clips/s at exact precision, B=2048) — XLA keeps these small activations
well-fused on its own. It was removed rather than kept as a slower
option; see PERF_NOTES.md for the measurements.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import models
from .pallas_mel import make_frontend_fn


def make_forward_fn(cfg, params, state, use_pallas: Optional[bool] = None,
                    precision: str = "exact",
                    top_db_mode: Optional[str] = None,
                    btf: Optional[bool] = None):
    """Best-available eval forward. Returns fn(wav)->probs (not yet jitted).

    The ONE place that encodes the layout/precision policy — serving
    (serve/service.py, serve/streaming.py) and evaluation
    (evaluate/harness.py) build their forwards through here.

    precision: 'exact' (parity-grade) or 'fast' (3-pass bf16 DFT,
    <=3e-4 prob drift — serving).
    top_db_mode: override the frontend's dB-clamp reference
    ('per_sample' for serving isolation); None keeps the config's mode.
    btf: force (True) / disable (False) the transposed-kernel mel
    routes; None = auto — on whenever the Pallas kernel runs.
    Historically this engaged the (B, T, F) layout; it now selects
    'tfb' (frames, mels, batch) — the framing gather's native
    orientation, which also removes the 0.69 ms/batch frames relayout
    (PERF_NOTES) — for UiT configs, and 'tfb_to_bft' (transposed kernel
    + one transpose back to the canonical bft mel) for non-UiT configs
    under pallas. btf=False disables BOTH and pins the plain row-kernel
    bft chain — the A/B-debugging escape hatch.

    Ensembles: pass ``params``/``state`` as equal-length LISTS of
    checkpoints sharing this config -> fn(wav) returns the MEAN of the
    member probabilities, computed in ONE XLA program: the member
    pytrees are stacked on a leading model axis and the forward is
    vmapped over it with the wav batch broadcast, so the frontend runs
    once (unbatched under vmap) and every encoder matmul gains a free
    leading dim instead of N separate dispatches. Probability-space
    averaging is the complement of the reference's weight-space
    averaging (utils.py:335-369, also shipped in ckpt.io) — it works
    across independently-trained runs where weight averaging does not.
    Composes with the scanned/DP/export wrappers (they all wrap
    fn(wav)).
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    eligible = use_pallas and isinstance(cfg, models.UITConfig)
    use_fast_layout = eligible if btf is None else (btf and eligible)
    layout = "tfb" if use_fast_layout else "bft"
    if use_pallas and not isinstance(cfg, models.UITConfig) and btf is not False:
        # bft consumers (MobileNetV2): mel via the transposed kernel + one
        # transpose back — bitwise at fast precision (exact/small batches
        # keep the row kernel inside the helper) and it skips the row
        # kernel's internal frames-relayout: 156.4k -> 169.5k clips/s
        # (+8.3%, drift 0.0) at B=2048 int16 fast on the v5e
        # (PERF_NOTES round 4, MobileNetV2 serving)
        layout = "tfb_to_bft"
    fe_cfg = getattr(cfg, "frontend", None)
    if top_db_mode is not None and fe_cfg is not None:
        fe_cfg = dataclasses.replace(fe_cfg, top_db_mode=top_db_mode)
    # ALWAYS pin cfg.mel_layout to the frontend's actual layout: a config
    # preset to 'btf'/'tfb' whose fast path does not engage here would
    # otherwise pair a bft frontend with a tfb/btf model branch and
    # misread (B, F, T) as (B, T, F)
    if isinstance(cfg, models.UITConfig):
        run_cfg = dataclasses.replace(cfg, mel_layout=layout)
    else:
        run_cfg = cfg  # non-UiT configs have no mel_layout branching
    frontend = make_frontend_fn(
        fe_cfg, use_pallas=use_pallas, precision=precision, layout=layout,
    )

    if isinstance(params, (list, tuple)):
        if not (isinstance(state, (list, tuple))
                and len(state) == len(params) and len(params) >= 1):
            raise ValueError(
                f"ensemble forward needs equal-length params/state lists, "
                f"got {len(params)} params vs "
                f"{len(state) if isinstance(state, (list, tuple)) else type(state)}"
            )
        # stack eagerly (host, once) — tiny models, N copies are cheap
        params = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
        member = jax.vmap(
            lambda p, s, wav: models.apply(run_cfg, p, s, wav,
                                           frontend_fn=frontend),
            in_axes=(0, 0, None),
        )

        def fn(wav):
            return jnp.mean(member(params, state, wav), axis=0)
    else:
        def fn(wav):
            return models.apply(run_cfg, params, state, wav,
                                frontend_fn=frontend)

    # consumed by parallel/mesh.data_parallel_forward: Mosaic kernels need
    # the shard_map (manual) route, which it selects from this flag, and
    # torch-mode batch-GLOBAL dB clamping must refuse the per-shard route
    # (checked there via top_db_mode)
    fn.uses_pallas = use_pallas
    fn.top_db_mode = getattr(fe_cfg, "top_db_mode", None)
    return fn


# Two more measured-rejected serving paths lived here through round 3 and
# were deleted in round 4 (same policy as the round-2 fused encoder above:
# PERF_NOTES.md keeps the numbers, git history keeps the code):
# - make_fused_token_forward (ops/pallas_mel.pallas_mel_tokens): the fused
#   mel->patch-token kernel, -4 to -6% vs the 2-stage tfb path (VMEM caps
#   the batch block; lost MXU lane amortization > saved mel HBM traffic).
# - make_fused_encoder_forward (ops/pallas_encoder_tfb): whole-encoder
#   VMEM kernel (-25%) and XLA-attention+fused-MLP hybrid (-20%) — at
#   D=128/N=24 XLA keeps the encoder's activations fused on its own.


def make_scanned_forward(fwd_fn, unroll: int = 1):
    """Amortize per-dispatch overhead over K batches: (K, B, T) wav block
    -> (K, B, C) probs as ONE jittable program (`lax.scan` over the batch
    axis, each step the full fused forward).

    Why: through a dispatch relay (and on busy production hosts) each
    jitted call pays a fixed enqueue/RTT cost — at B=2048 the round-2
    profile showed 6.16 ms of device work against ~9.7 ms of wall per
    batch, i.e. ~37% of device-limited throughput lost to dispatch
    (PERF_NOTES). Scanning K batches inside one program pays that cost
    once per K. The batches are INDEPENDENT (no carry), so the scan is
    pure sequencing — XLA pipelines each step identically to K separate
    dispatches. Numerics: the Mosaic kernels are the identical program
    either way, but XLA's fusion boundaries for the surrounding ops can
    differ inside the scan body, so outputs match per-batch calls to
    f32 epsilon (measured 1.2e-7 on v5e and CPU —
    tools/verify_tpu_numerics.py, tests/test_pipeline_dispatch.py), not
    bitwise.

    Callers jit the result (donation of the input block is safe: the
    output (K, B, C) never aliases the (K, B, T) input shape).
    """
    def scanned(wav_block):
        def body(carry, wav):
            return carry, fwd_fn(wav)

        _, out = jax.lax.scan(body, None, wav_block, unroll=unroll)
        return out

    scanned.uses_pallas = bool(getattr(fwd_fn, "uses_pallas", False))
    return scanned


def make_block_builder(k: int):
    """Jitted ``(a, b, offset) -> (K, B, T)`` scan-input block assembled ON
    DEVICE from two uploaded batches: row-rolls of alternating buffers make
    every one of the K batches distinct.

    Benchmark plumbing for make_scanned_forward: uploading a (K, B, T)
    block through a slow link would swamp setup, and the axon relay dedups
    dispatches with identical (executable, args) — measurements must
    alternate >=2 distinct buffers (PERF_NOTES 'Measurement caveats').
    Shared by bench.py and the uit-bench CLI."""

    @jax.jit
    def mkblock(a, b, offset):
        return jnp.stack(
            [jnp.roll(a if i % 2 == 0 else b, offset + i, axis=0)
             for i in range(k)]
        )

    return mkblock
