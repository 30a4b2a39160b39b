"""Pipeline parallelism: GPipe-style microbatched stage execution of the
UiT transformer block stack over a 'pipe' mesh axis.

Like tensor parallelism (parallel/tp.py), this is NOT the production
layout for the shipped model family — 12 blocks x ~100k params give no
stage worth a pipeline bubble, and pure DP (parallel/mesh.py) wins
outright (the reference has no distributed layer at all, reference
run.py:27). The module exists so the framework scales past that regime:
a deep variant (depth >= 32, D >= 768) whose weights do not fit one
chip's HBM runs unchanged, blocks sharded across chips.

Design — TPU-idiomatic collective-permute pipeline (the scaling-book
recipe), not a translated NCCL send/recv schedule:

- Per-block params are STACKED along a leading depth axis
  (``stack_block_params``) and that axis is sharded over 'pipe': each of
  S stages holds depth/S consecutive blocks and scans
  ``models.uit.block_forward`` over its local slice (one compiled block
  body per stage, MXU-friendly static shapes).
- Inside ``shard_map``, a ``lax.scan`` over S + M - 1 ticks runs the
  GPipe schedule on M microbatches: stage 0 injects microbatch t, every
  stage applies its local blocks, ``lax.ppermute`` shifts activations
  one stage down the ICI ring, the last stage collects outputs. Bubble
  ticks compute on zeros and are never read back — the standard
  throughput-for-simplicity trade at M >= S.
- A final ``psum`` over 'pipe' (the only other collective) replicates
  the collected outputs so the pre-block embedding and the head — tiny
  O(B*N*D) work — stay outside the pipelined region.
- Composes with data parallelism: on a ('data', 'pipe') mesh, the batch
  dim of every microbatch shards over 'data' (``data_axis=``), blocks
  replicate over 'data', and both collectives stay on their own axis.

Eval/serving only, like the other non-DP serving layouts ('tfb'/'btf'):
training this model family is DP (train/loop.py); a pipelined BACKWARD
(1F1B) only pays once per-stage weights exceed chip HBM, which no
shipped config reaches.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import uit
from ..models.common import layer_norm


def make_pipe_mesh(n_stages: int, axis: str = "pipe") -> Mesh:
    """1-D pipeline mesh over the first n_stages devices (consecutive
    devices = ICI neighbours, the layout ppermute wants)."""
    from .mesh import make_mesh

    return make_mesh(n_stages, axis=axis)


def stack_block_params(params):
    """List-of-block-dicts -> one pytree with a leading depth axis.

    Valid because every block has the same structure (init gives all
    blocks LayerScale or none — models/uit.init). Stacks on the HOST
    (np.stack): the whole point of the pipeline layout is weights too
    big for one chip, so the stacked tree must never materialize on a
    single device — device_put with the P('pipe') sharding then uploads
    each stage's slice straight to its owner."""
    import numpy as np

    blocks = list(params["blocks"])
    return jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks
    )


def _gpipe_encoder(cfg, pipe_axis: str, n_stages: int, n_microbatches: int):
    """shard_map body: (stage-local stacked blocks, (M, mb, N, D) tokens)
    -> (M, mb, N, D) encoded tokens, replicated over the pipe axis."""
    S, M = n_stages, n_microbatches

    def body(blocks_local, xs):
        idx = lax.axis_index(pipe_axis)

        def stage(x):
            def step(c, blk):
                return uit.block_forward(cfg, blk, c), None

            y, _ = lax.scan(step, x, blocks_local)
            return y

        # carries become device-varying (ppermute / axis_index mixing) —
        # declare them so from tick 0 for shard_map's vma typing
        out = lax.pcast(jnp.zeros_like(xs), pipe_axis, to="varying")
        x0 = lax.pcast(jnp.zeros_like(xs[0]), pipe_axis, to="varying")
        perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            x, out = carry
            # stage 0 injects microbatch t (clipped re-reads during the
            # drain phase are computed and discarded)
            inp = lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            x = jnp.where(idx == 0, inp, x)
            y = stage(x)
            # the last stage has microbatch t-(S-1) at tick t
            o = lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(t - (S - 1), 0, M - 1), 0
            )
            out = jnp.where((idx == S - 1) & (t >= S - 1), o, out)
            if S > 1:
                y = lax.ppermute(y, pipe_axis, perm)
            return (y, out), None

        (_, out), _ = lax.scan(tick, (x0, out), jnp.arange(S + M - 1))
        # replicate the last stage's collected outputs
        return lax.psum(
            jnp.where(idx == S - 1, out, jnp.zeros_like(out)), pipe_axis
        )

    return body


def pipeline_forward(cfg, params, state, mesh: Mesh, *,
                     n_microbatches: Optional[int] = None,
                     pipe_axis: str = "pipe",
                     data_axis: Optional[str] = None,
                     frontend_fn: Optional[Callable] = None):
    """Eval forward ``fn(wav) -> probs`` with the block stack pipelined
    over ``mesh[pipe_axis]`` (optionally batch-sharded over
    ``data_axis`` on a 2D mesh).

    Single-window path (clips <= target_length; the serving shape —
    long-clip crops stay on the DP layouts). ``n_microbatches`` defaults
    to the stage count (the minimum that keeps every stage busy in
    steady state); the batch must divide it.
    """
    S = int(mesh.shape[pipe_axis])
    assert cfg.depth % S == 0, (
        f"depth {cfg.depth} must divide into {S} pipeline stages"
    )
    M = int(n_microbatches or S)
    assert cfg.mel_layout == "bft", (
        "pipeline_forward pipelines the canonical 'bft' forward; the "
        "tfb/btf serving layouts are DP-only"
    )

    stacked = jax.device_put(
        stack_block_params(params), NamedSharding(mesh, P(pipe_axis))
    )
    repl = NamedSharding(mesh, P())
    rest = jax.device_put(
        {k: v for k, v in params.items() if k != "blocks"}, repl
    )
    state = jax.device_put(state, repl)

    tok_spec = P(None, data_axis) if data_axis else P()
    pp_blocks = jax.shard_map(
        _gpipe_encoder(cfg, pipe_axis, S, M),
        mesh=mesh,
        in_specs=(P(pipe_axis), tok_spec),
        out_specs=tok_spec,
    )

    fe = frontend_fn or (
        lambda w: uit.log_mel_spectrogram(w, cfg.frontend)
    )

    def fwd(wav):
        mel = fe(wav)  # (B, n_mels, T)
        assert mel.shape[-1] <= cfg.target_length, (
            "pipeline_forward is the single-window serving path; "
            "chunk long clips upstream (chunk_long_mel) or use the DP "
            "layouts"
        )
        x = uit.apply_init_bn(cfg, rest, state, mel)
        x = uit.patch_embed(cfg, rest["patch_embed"], x)
        x, _, _ = uit._prepare_tokens(cfg, rest, x)
        B, N, D = x.shape
        assert B % M == 0, (
            f"microbatch count {M} must divide the batch ({B})"
        )
        if data_axis:
            nd = int(mesh.shape[data_axis])
            assert (B // M) % nd == 0, (
                f"microbatch rows {B // M} (batch {B} / {M} microbatches) "
                f"must divide the '{data_axis}' axis ({nd}) — raise the "
                f"batch or lower the microbatch count"
            )
        xs = x.reshape(M, B // M, N, D)
        xs = pp_blocks(stacked, xs)
        x = xs.reshape(B, N, D)
        x = layer_norm(rest["norm"], x.astype(jnp.float32), eps=1e-6)
        return uit.forward_head(cfg, rest, x)

    in_sh = NamedSharding(mesh, P(data_axis)) if data_axis else repl
    return jax.jit(fwd, in_shardings=in_sh)
