"""Fused Pallas log-mel frontend kernel (the BASELINE.json north-star op).

One VMEM pass per clip replaces the reference's torchaudio chain
(MelSpectrogram -> AmplitudeToDB, reference models/uit.py:298-308):

    framing (hop-strided loads) -> windowed real-DFT as two MXU matmuls
    (512 x n_freqs cos/sin, window folded into the matrices) -> power
    -> mel filterbank matmul (padded 257->lane-aligned rows) -> 10*log10.

Rationale: the mel frontend is HBM-bound, not FLOP-bound. XLA would
materialize frames (3.2x the waveform), the complex spectrum, the power
spectrum, and the mel matrix in HBM between ops; this kernel streams the
waveform into VMEM once and writes only the (n_mels, n_frames) result.
The DFT-as-matmul rides the MXU, which at 512-point/257-bin sizes is
faster than any FFT butterfly the VPU could do.

The top_db clamp needs a cross-frame (and, in torch-3D-parity mode,
cross-batch) max, so it is applied outside the kernel — XLA fuses the
elementwise `maximum` into the consumer for free.

Numerics: matmuls run at Precision.HIGHEST (true f32); agreement with the
pure-JAX rfft reference is ~1e-3 dB worst-case at spectral valleys
(validated in tests/test_pallas_mel.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..frontend.mel import FrontendConfig, mel_filterbank, padded_window


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Batch floor for the transposed ('tfb') kernel: batch rides the LANE
# dimension there, so below one VPU/MXU lane width the kernel runs
# mostly-empty tiles (B=1 would be 1/128 utilization). pallas_log_mel
# and the make_frontend_fn 'tfb_to_bft' route both gate on this — keep
# them in sync through this one constant.
TFB_MIN_BATCH = 128


def _bf16_split(M):
    """hi/lo bf16 decomposition of an f32 matrix for 3-pass split matmuls
    (numpy or jax input; returns jax arrays)."""
    hi = jnp.asarray(M).astype(jnp.bfloat16)
    lo = (jnp.asarray(M, dtype=jnp.float32)
          - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int, win_length: int, n_freqs: int):
    """Window-folded packed DFT matrix + matching mel-filterbank row map.

    ONE matmul produces all real/imaginary DFT components packed into
    exactly `lanes` columns; squaring and multiplying by a filterbank
    whose rows repeat each bin's mel weights at the matching columns
    yields mel power = fb @ (Re^2 + Im^2) with zero layout constraints —
    the fb matmul does the summation, so column order is free.

    Packing exploits real-input DFT structure: sin columns for k=0 and
    k=n_fft/2 are identically zero, so cos(n_freqs) + sin(n_freqs-2)
    columns pack into exactly n_fft lanes (no padding waste: 512 for the
    standard config, vs 640 with naive [cos|sin] alignment).

    Returns (G (n_fft, lanes), col_bin (lanes,) mapping column -> freq bin).
    """
    w = padded_window(win_length, n_fft, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_part = (w[:, None] * np.cos(ang))          # (n_fft, n_freqs)
    sin_part = (w[:, None] * np.sin(ang))[:, 1:n_freqs - 1]  # drop k=0, k=N/2
    lanes = _round_up(n_freqs + (n_freqs - 2), 128)
    G = np.zeros((n_fft, lanes), dtype=np.float32)
    G[:, :n_freqs] = cos_part.astype(np.float32)
    G[:, n_freqs: 2 * n_freqs - 2] = sin_part.astype(np.float32)
    col_bin = np.full((lanes,), -1, dtype=np.int64)
    col_bin[:n_freqs] = np.arange(n_freqs)
    col_bin[n_freqs: 2 * n_freqs - 2] = np.arange(1, n_freqs - 1)
    return G, col_bin


def _as_f32(frames):
    """int16 PCM frames arrive raw; the 1/32768 scale is folded into the
    DFT matrices (an exact power-of-two exponent shift), so the cast here
    is exact and the kernel output is bitwise the f32 path's."""
    return frames.astype(jnp.float32) if frames.dtype != jnp.float32 else frames


def _mel_kernel(frames_ref, g_ref, fbhi_ref, fblo_ref, out_ref):
    """frames (M_BLK, n_fft) -> log-mel (M_BLK, n_mels), all in VMEM.

    Mosaic cannot prove hop-strided (160) lane offsets 128-aligned, so the
    framing gather happens in XLA (a single fused HBM pass) and frames
    arrive flattened to (B*P, n_fft) rows — the grid tiles plain rows, so
    every matmul runs at full MXU M-extent with no in-kernel reshapes.
    Everything bandwidth-heavy after framing — window, rDFT, power, mel,
    log — is fused here and touches HBM exactly once on the way out.

    Exact mode: the packed [Re|Im] DFT matmul runs at Precision.HIGHEST
    (6-pass f32 — spectral valleys suffer catastrophic cancellation, so
    full f32 products matter for bit-parity). The mel-filterbank matmul
    has NO cancellation (all operands non-negative), so a 3-pass bf16
    split is enough even here: its dropped lo*lo term bounds the relative
    mel error at ~1.5e-5 => ~6.5e-5 dB, far below the ~1e-3 dB cross-
    implementation floor of the DFT itself — half the MXU passes for free.
    """
    g = jax.lax.dot_general(  # packed [Re | Im] in one matmul
        _as_f32(frames_ref[:]), g_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    power = g * g  # lane-aligned Re^2 and Im^2; fb row duplication sums them
    mel = _tri_dot(power, fbhi_ref[:], fblo_ref[:])  # (M_BLK, n_mels)
    # dB (floor at amin=1e-10; top_db clamp applied by the caller)
    out_ref[:] = (10.0 / math.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


def _tri_dot(a, b_hi, b_lo):
    """3-pass bf16 split matmul: ~16-bit-mantissa products with f32
    accumulation at half the MXU passes of Precision.HIGHEST."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dd(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return dd(a_hi, b_hi) + dd(a_hi, b_lo) + dd(a_lo, b_hi)


def _mel_kernel_fast(frames_ref, ghi_ref, glo_ref, fbhi_ref, fblo_ref, out_ref):
    """Fast serving variant: both matmuls run as 3-pass bf16 hi/lo splits —
    2x fewer MXU passes than HIGHEST. Worst-case ~0.4 dB at deep spectral
    valleys (catastrophic cancellation needs >16-bit products); after
    init_bn this is <=3e-4 output-probability drift on uit_xs (measured),
    comfortably inside the 1e-3 parity budget.
    """
    g = _tri_dot(_as_f32(frames_ref[:]), ghi_ref[:], glo_ref[:])
    power = g * g
    mel = _tri_dot(power, fbhi_ref[:], fblo_ref[:])
    out_ref[:] = (10.0 / math.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


# ------------------------------------------------ transposed ('tfb') kernels
#
# The framing gather's NATURAL output layout is frames-transposed: XLA
# pre-transposes wav to (T, B) and vectorizes the gather over batch in
# lanes, materializing (P*n_fft, B) — then pays a 0.69 ms/batch relayout
# copy (B=2048, profiled) to feed the row-major (B*P, n_fft) kernel above.
# These kernels consume the transposed frames DIRECTLY: per grid cell one
# frame plane (n_fft, B_blk), DFT as (lanes, n_fft) @ (n_fft, B_blk),
# filterbank as (n_mels, lanes) @ (lanes, B_blk), output (P, n_mels, B).
# Measured (B=2048, int16, fast): frontend device time 3.61 -> 2.64
# ms/batch (the copy disappears AND the kernel drops 2.17 -> 1.99 ms),
# output BITWISE identical to the row kernel's.

def _tri_dot_left(a_hi, a_lo, b):
    """3-pass bf16 split with the pre-split matrix on the LEFT."""
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dd(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return dd(a_hi, b_hi) + dd(a_lo, b_hi) + dd(a_hi, b_lo)


def _mel_kernel_t(framesT_ref, gt_ref, fbthi_ref, fbtlo_ref, out_ref):
    """framesT (1, n_fft, B_blk) -> log-mel (1, n_mels, B_blk); exact:
    DFT at Precision.HIGHEST, filterbank 3-pass (see _mel_kernel)."""
    g = jax.lax.dot_general(
        gt_ref[:], _as_f32(framesT_ref[0]), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    power = g * g
    mel = _tri_dot_left(fbthi_ref[:], fbtlo_ref[:], power)
    out_ref[0] = (10.0 / math.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


def _mel_kernel_fast_t(framesT_ref, gthi_ref, gtlo_ref, fbthi_ref, fbtlo_ref,
                       out_ref):
    """Transposed fast variant: both matmuls 3-pass bf16 splits."""
    g = _tri_dot_left(gthi_ref[:], gtlo_ref[:], _as_f32(framesT_ref[0]))
    power = g * g
    mel = _tri_dot_left(fbthi_ref[:], fbtlo_ref[:], power)
    out_ref[0] = (10.0 / math.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


def pallas_log_mel(wav: jax.Array, config: FrontendConfig | None = None,
                   interpret: bool | None = None,
                   precision: str = "exact", layout: str = "bft",
                   block_rows: int | None = None,
                   framing: str = "auto",
                   _pad_b1: bool = True) -> jax.Array:
    """(B, T) waveform -> log-mel dB, fused on TPU.

    Drop-in replacement for frontend.mel.log_mel_spectrogram (same
    torchaudio semantics, including the configured top_db_mode).
    precision:
    - 'exact': parity-grade — the cancellation-sensitive DFT matmul at
      Precision.HIGHEST; the cancellation-free filterbank matmul as a
      3-pass bf16 split (~6.5e-5 dB effect, far below the kernel's
      ~1e-3 dB valley floor vs an rfft reference — see _mel_kernel).
    - 'fast': both matmuls 3-pass bf16 (~1.15x end-to-end throughput,
      <=2.5e-4 output-probability drift — see _mel_kernel_fast).
    layout: 'bft' -> (B, n_mels, n_frames), the reference's orientation;
    'btf' -> (B, n_frames, n_mels), the row kernel's native layout — no
    output transpose (consumed by models.uit patch_embed_btf);
    'tfb' -> (n_frames, n_mels, B), the FRAMING GATHER's native layout —
    the transposed kernel consumes (P*n_fft, B) frames directly, so the
    0.69 ms/batch frames relayout copy disappears too (fastest serving
    path; consumed by models.uit patch_embed_tfb; bitwise identical to
    the row kernel).
    framing: how the hop-strided frames are built — both pure indexing,
    BITWISE-identical mels (pinned on-chip across layouts/precisions):
    - 'slices': a stack of n_frames static slices. The XLA gather
      lowering carries a ~90 us fixed device latency (394 us in the
      degenerate B=1 program), so slices win the latency shapes
      in-program: full forward B=1 162->56 us, B=64 -24%, B=256 -20%
      (tools/probe_small_framing.py + PERF_NOTES round 5).
    - 'gather': the 2-D-index gather — fuses better at throughput
      shapes (B=1024 +0.3%, B=2048 +0.6% for slices), and is what the
      round-5 serving roofline certified at B=2048.
    - 'auto' (default): slices below B=1024, gather at and above — the
      measured in-program crossover.
    """
    assert precision in ("exact", "fast")
    assert layout in ("bft", "btf", "tfb")
    if framing not in ("auto", "slices", "gather"):
        # raise, not assert: a typo must not silently fall through to the
        # gather branch under python -O
        raise ValueError(
            f"unknown framing {framing!r}; expected 'auto', 'slices' or "
            f"'gather'")
    config = config or FrontendConfig()
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n_fft, hop = config.n_fft, config.hop_length
    # int16 PCM fast path: frames stay 2-byte through the framing gather
    # (halving its HBM traffic and the host->device transfer); the 1/32768
    # PCM scale folds into the DFT matrices as an exact exponent shift, so
    # results are bitwise identical to feeding wav.astype(f32)/32768.
    pcm16 = wav.dtype == jnp.int16
    wav_scale = (1.0 / 32768.0) if pcm16 else 1.0
    B, T = wav.shape
    if framing == "auto":
        framing = "slices" if B < 1024 else "gather"
    if B == 1 and not interpret and _pad_b1 and framing == "gather":
        # GATHER-framing only: XLA's B=1 gather lowering degenerates into
        # one serial fusion (426 of the 474 us/dispatch sat in a single
        # fusion op while B=2 ran the whole mel in 113 us — v5e,
        # tools/probe_b1_stage.py, PERF_NOTES round 5). One zero pad row
        # buys the fast B=2 program; kernel rows are per-frame independent
        # so sample 0 is bitwise unchanged, and in batch-global ('torch')
        # top_db mode the pad row's dB max is the amin floor (-100) — it
        # can tie the reference max, never raise it. Slices framing has
        # no B=1 pathology (13.3 us with or without the pad), so the
        # default 'auto' route never needs this.
        mel2 = pallas_log_mel(jnp.concatenate([wav, jnp.zeros_like(wav)]),
                              config, interpret=interpret,
                              precision=precision, layout=layout,
                              block_rows=block_rows, framing=framing)
        return mel2[..., :1] if layout == "tfb" else mel2[:1]
    wav_in = wav  # pre-padding, for the small-batch tfb fallback below
    if config.center:
        pad = n_fft // 2
        if T <= pad:
            raise ValueError(
                f"waveform of {T} samples is too short for reflect padding "
                f"of {pad}; need > {pad} samples"
            )
        wav = jnp.concatenate(
            [wav[:, 1:pad + 1][:, ::-1], wav, wav[:, -pad - 1:-1][:, ::-1]], axis=-1
        )
    Tp = wav.shape[-1]
    n_frames = (Tp - n_fft) // hop + 1
    frames_pad = _round_up(n_frames, 8)

    G, col_bin = _dft_matrices(n_fft, config.win_length, config.n_freqs)
    lanes = G.shape[1]
    mel_fb = mel_filterbank(config)
    fb = np.zeros((lanes, config.n_mels), dtype=np.float32)
    valid = col_bin >= 0
    fb[valid] = mel_fb[col_bin[valid]]

    split = _bf16_split

    G = G * np.float32(wav_scale)  # exact: power-of-two exponent shift

    if layout == "tfb" and B < TFB_MIN_BATCH:
        # degenerate-batch guard: the transposed kernel puts BATCH in
        # lanes, so below a VPU/MXU lane width it runs mostly-empty tiles
        # (B=1 would be 1/128 utilization). Small batches take the row
        # kernel and transpose its (small) mel output instead — the
        # (T, F, B) contract is preserved for the caller.
        mel_btf = pallas_log_mel(wav_in, config, interpret=interpret,
                                 precision=precision, layout="btf",
                                 block_rows=block_rows, framing=framing)
        return jnp.transpose(mel_btf, (1, 2, 0))

    if layout == "tfb":
        # transposed path: gather rows of wav^T (Tp, B) -> framesT
        # (n_frames, n_fft, B) — physically the layout XLA's gather
        # produces anyway, so no relayout copy on either side
        wavT = wav.T
        if framing == "slices":
            framesT = jnp.stack([wavT[i * hop:i * hop + n_fft, :]
                                 for i in range(n_frames)], axis=0)
        else:
            idxT = (np.arange(n_frames)[:, None] * hop
                    + np.arange(n_fft)[None, :]).reshape(-1)
            framesT = wavT[idxT, :].reshape(n_frames, n_fft, B)
        b_blk = min(block_rows if block_rows is not None else 1024, B)
        fbt_hi, fbt_lo = split(np.ascontiguousarray(fb.T))
        xt_spec = pl.BlockSpec((1, n_fft, b_blk), lambda p, b: (p, 0, b),
                               memory_space=pltpu.VMEM)
        gt_spec = pl.BlockSpec((lanes, n_fft), lambda p, b: (0, 0),
                               memory_space=pltpu.VMEM)
        fbt_spec = pl.BlockSpec((config.n_mels, lanes), lambda p, b: (0, 0),
                                memory_space=pltpu.VMEM)
        outt_spec = pl.BlockSpec((1, config.n_mels, b_blk),
                                 lambda p, b: (p, 0, b),
                                 memory_space=pltpu.VMEM)
        outt_shape = jax.ShapeDtypeStruct(
            (n_frames, config.n_mels, B), jnp.float32)
        cost = pl.CostEstimate(
            flops=2 * n_frames * B * (n_fft * lanes + lanes * config.n_mels),
            bytes_accessed=n_frames * B * (
                n_fft * (2 if pcm16 else 4) + config.n_mels * 4),
            transcendentals=n_frames * B * config.n_mels,
        )
        Gt = np.ascontiguousarray(G.T)
        grid = (n_frames, pl.cdiv(B, b_blk))
        if precision == "fast":
            gt_hi, gt_lo = split(Gt)
            x_db = pl.pallas_call(
                _mel_kernel_fast_t, grid=grid,
                in_specs=[xt_spec, gt_spec, gt_spec, fbt_spec, fbt_spec],
                out_specs=outt_spec, out_shape=outt_shape,
                cost_estimate=cost, interpret=interpret,
            )(framesT, gt_hi, gt_lo, fbt_hi, fbt_lo)
        else:
            x_db = pl.pallas_call(
                _mel_kernel_t, grid=grid,
                in_specs=[xt_spec, gt_spec, fbt_spec, fbt_spec],
                out_specs=outt_spec, out_shape=outt_shape,
                cost_estimate=cost, interpret=interpret,
            )(framesT, jnp.asarray(Gt), fbt_hi, fbt_lo)
        if config.top_db is not None:
            if config.top_db_mode == "torch":
                ref = jnp.max(x_db)
            else:  # per-sample: max over (frames, mels) per batch column
                ref = jnp.max(x_db, axis=(0, 1), keepdims=True)
            x_db = jnp.maximum(x_db, ref - config.top_db)
        return x_db

    # hop-strided framing. 'slices': n_frames static slices stacked —
    # the gather lowering carries ~92 us fixed latency, so slices win
    # every latency shape in-program (B=256 -20%) but TIE/LOSE noise-
    # level at B>=1024 (+0.3%/+0.6%), which is why 'auto' keeps the
    # gather there (PERF_NOTES round 5). 'gather': one clamped
    # 2-D-index gather (sublane-alignment rows read in-bounds garbage
    # that the post-kernel slice discards) — the round-2-4 default and
    # the program the serving roofline certified. (Round-2 alternatives
    # at B=2048: flat-index gather +29%, 4-chunk slice+concat +17%.)
    if framing == "slices":
        sl = [wav[:, i * hop:i * hop + n_fft] for i in range(n_frames)]
        # frames_pad - n_frames alignment rows: content is irrelevant
        # (sliced away after the kernel) — repeat the last frame
        sl += [sl[-1]] * (frames_pad - n_frames)
        frames = jnp.stack(sl, axis=1).reshape(B * frames_pad, n_fft)
    else:
        idx = np.arange(frames_pad)[:, None] * hop + np.arange(n_fft)[None, :]
        idx = np.minimum(idx, Tp - 1)
        frames = wav[:, idx].reshape(B * frames_pad, n_fft)  # free reshape

    rows = B * frames_pad
    # 1024 measured best on v5e (512: more grid overhead; 2048: VMEM
    # pressure); block_rows overrides for tuning
    assert block_rows is None or block_rows > 0, block_rows
    m_blk = min(block_rows if block_rows is not None else 1024, rows)
    cost = pl.CostEstimate(
        flops=2 * rows * n_fft * lanes + 2 * rows * lanes * config.n_mels,
        bytes_accessed=rows * (n_fft + config.n_mels) * 4,
        transcendentals=rows * config.n_mels,
    )
    frames_spec = pl.BlockSpec((m_blk, n_fft), lambda b: (b, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((n_fft, lanes), lambda b: (0, 0), memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((lanes, config.n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m_blk, config.n_mels), lambda b: (b, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, config.n_mels), jnp.float32)
    fb_hi, fb_lo = split(fb)  # (G already carries the PCM scale above)
    if precision == "fast":
        G_hi, G_lo = split(G)
        mel_t = pl.pallas_call(
            _mel_kernel_fast,
            grid=(pl.cdiv(rows, m_blk),),
            in_specs=[frames_spec, g_spec, g_spec, fb_spec, fb_spec],
            out_specs=out_spec, out_shape=out_shape,
            cost_estimate=cost, interpret=interpret,
        )(frames, G_hi, G_lo, fb_hi, fb_lo)
    else:
        mel_t = pl.pallas_call(
            _mel_kernel,
            grid=(pl.cdiv(rows, m_blk),),
            in_specs=[frames_spec, g_spec, fb_spec, fb_spec],
            out_specs=out_spec, out_shape=out_shape,
            cost_estimate=cost, interpret=interpret,
        )(frames, jnp.asarray(G), fb_hi, fb_lo)

    mel_t = mel_t.reshape(B, frames_pad, config.n_mels)[:, :n_frames, :]
    # (B, T, F) is the kernel's native row layout; 'bft' pays one
    # lane<->sublane transpose copy for reference orientation
    x_db = mel_t if layout == "btf" else jnp.swapaxes(mel_t, -1, -2)
    if config.top_db is not None:
        if config.top_db_mode == "torch":
            ref = jnp.max(x_db)
        else:
            ref = jnp.max(x_db, axis=(-2, -1), keepdims=True)
        x_db = jnp.maximum(x_db, ref - config.top_db)
    return x_db


# The fused mel->patch-token kernel (pallas_mel_tokens) lived here through
# round 3: one kernel from transposed int16 frames to BN-folded encoder
# tokens, the (T, F, B) mel never reaching HBM. Correct (<=4e-4 probs) but
# measured SLOWER than the 2-stage tfb path on the v5e (-4 to -6%: the
# per-b-block dB scratch caps b_blk at 256, and the lost MXU lane
# amortization exceeds the saved mel round-trip — PERF_NOTES.md round 3).
# Deleted with the other rejected experiments (round-4 policy: PERF_NOTES
# keeps the verdicts, git history keeps the code — the parent of the
# commit that removed this block). A chip with >2x scoped VMEM may flip
# the verdict; resurrect from git.


def make_frontend_fn(config: FrontendConfig | None = None, use_pallas: bool = True,
                     precision: str = "exact", layout: str = "bft",
                     block_rows: int | None = None):
    """Frontend callable for models.*.forward(frontend_fn=...).

    layout='btf'/'tfb' must pair with a model config whose mel_layout
    matches (models.uit consumes the layout directly, no transposes).
    layout='tfb_to_bft' emits the canonical (B, F, T) mel but computes
    it through the TRANSPOSED kernel + one explicit transpose — bitwise
    equal to the row kernel on TPU and 1.15x faster at B>=128 (the row
    kernel's internal frames-relayout copy costs more than the output
    transpose; tools/probe_teacher_tfb.py) — built for bft consumers
    like the PSL teacher; small batches and the non-pallas path fall
    back to the plain bft chain.
    block_rows tunes the kernel's grid block (pallas path only; for
    'tfb' it is the batch-block width)."""
    if layout not in ("bft", "btf", "tfb", "tfb_to_bft"):
        # validate on BOTH paths: the pallas path would hit
        # pallas_log_mel's assert, but the non-pallas fallthrough below
        # used to map typos silently to the bft chain
        raise ValueError(
            f"unknown frontend layout {layout!r}; expected one of "
            f"'bft', 'btf', 'tfb', 'tfb_to_bft'"
        )
    config = config or FrontendConfig()
    if use_pallas:
        if layout == "tfb_to_bft":
            def fe(wav):
                # the transposed-kernel route engages only where it is
                # BITWISE equal to the row kernel: fast precision (pinned
                # on-chip) at tfb-gate batch sizes. Exact precision keeps
                # the row kernel (the exact tfb kernel carries a 6.9e-5 dB
                # accumulation-direction drift — PERF_NOTES round 2);
                # below the lane gate the tfb kernel IS the row kernel
                # plus transposes.
                if precision != "fast" or wav.shape[0] < TFB_MIN_BATCH:
                    return pallas_log_mel(wav, config, precision=precision,
                                          layout="bft",
                                          block_rows=block_rows)
                return jnp.transpose(
                    pallas_log_mel(wav, config, precision=precision,
                                   layout="tfb", block_rows=block_rows),
                    (2, 1, 0))

            return fe
        return lambda wav: pallas_log_mel(wav, config, precision=precision,
                                          layout=layout, block_rows=block_rows)
    from ..frontend.mel import log_mel_spectrogram  # accepts int16 PCM too

    if layout == "btf":
        return lambda wav: jnp.swapaxes(log_mel_spectrogram(wav, config), -1, -2)
    if layout == "tfb":
        return lambda wav: jnp.transpose(log_mel_spectrogram(wav, config),
                                         (2, 1, 0))
    return lambda wav: log_mel_spectrogram(wav, config)  # 'bft'/'tfb_to_bft'
