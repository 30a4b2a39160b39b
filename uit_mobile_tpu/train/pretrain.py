"""Masked-autoencoder (MAE) pretraining for the UiT encoder.

The reference fine-tunes from `uit_xs_maepretrained.pt` (zenodo) but ships
no pretraining code — its training recipe cannot be reproduced standalone.
This module closes that gap: masked-spectrogram-patch pretraining on
unlabeled audio whose parameter naming matches the UiT encoder exactly, so
a pretraining run's snapshot drops straight into the trainer's
``pretrained:`` shape-filtered partial load (with automatic time-pos-embed
retargeting, e.g. pretrain at target_length 1012 -> fine-tune at 102,
mirroring the reference's change_pos_embedding path, uit.py:416-450).

Method (MAE, He et al. 2021, adapted to audio patches):
- log-mel -> init_bn (train stats) -> 16x16 patch embedding + factorized
  pos embeds -> flatten to (B, L, D);
- a random `mask_ratio` of patches is dropped; the encoder blocks run on
  the kept subset only (static shapes: keep-count is fixed per config);
- a light decoder (mask tokens + pos embeds + a few blocks) reconstructs
  the mel pixels of every patch; the loss is MSE on MASKED patches
  against per-patch-normalized targets.

Everything is one jitted donated-buffer train step; data comes from
UnlabeledRandomChunkedHDF5Dataset (unlabeled random crops).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import log_mel_spectrogram
from ..models import uit
from ..models.common import layer_norm, layer_norm_init, linear, linear_init, mlp, multihead_attention, trunc_normal
from ..models.uit import UITConfig
from ..utils import get_logger

log = get_logger()


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    encoder: UITConfig
    mask_ratio: float = 0.75
    decoder_depth: int = 2
    decoder_num_heads: int = 2

    @property
    def num_patches(self) -> int:
        fg, tg = self.encoder.grid_size
        return fg * tg

    @property
    def num_keep(self) -> int:
        return max(1, int(round(self.num_patches * (1.0 - self.mask_ratio))))


def init(cfg: MAEConfig, rng):
    """(params, state): full UiT encoder params + 'mae' decoder subtree."""
    r_enc, r_dec = jax.random.split(rng)
    params, state = uit.init(cfg.encoder, r_enc)
    D = cfg.encoder.embed_dim
    ps = cfg.encoder.patch_size
    keys = iter(jax.random.split(r_dec, 4 + 4 * cfg.decoder_depth))
    dec_blocks = []
    hidden = int(D * cfg.encoder.mlp_ratio)
    for _ in range(cfg.decoder_depth):
        dec_blocks.append({
            "norm1": layer_norm_init(D),
            "attn": {
                "qkv": linear_init(next(keys), D, 3 * D),
                "proj": linear_init(next(keys), D, D),
            },
            "norm2": layer_norm_init(D),
            "mlp": {
                "fc1": linear_init(next(keys), D, hidden),
                "fc2": linear_init(next(keys), hidden, D),
            },
        })
    params["mae"] = {
        "mask_token": 0.02 * jax.random.normal(next(keys), (1, 1, D)),
        "decoder_pos_embed": 0.02 * jax.random.normal(next(keys), (cfg.num_patches, D)),
        "decoder_blocks": dec_blocks,
        "decoder_norm": layer_norm_init(D),
        "pred": linear_init(next(keys), D, ps * ps),
    }
    return params, state


def _run_blocks(blocks, x, num_heads, scale, inner_dim, act):
    for blk in blocks:
        h = multihead_attention(
            blk["attn"], layer_norm(blk["norm1"], x, eps=1e-6),
            num_heads=num_heads, scale=scale, inner_dim=inner_dim,
        )
        x = x + h
        x = x + mlp(blk["mlp"], layer_norm(blk["norm2"], x, eps=1e-6), act=act)
    return x


def mel_patches(cfg: MAEConfig, mel_bn: jax.Array) -> jax.Array:
    """(B, F, T) normalized mel -> (B, L, ps*ps) pixel patches (targets)."""
    e = cfg.encoder
    B, F, T = mel_bn.shape
    ps = e.patch_size
    fg, tg = F // ps, T // ps
    x = mel_bn[:, : fg * ps, : tg * ps]
    x = x.reshape(B, fg, ps, tg, ps).transpose(0, 1, 3, 2, 4).reshape(B, fg * tg, ps * ps)
    return x


def forward(cfg: MAEConfig, params, state, wav, rng):
    """-> (loss, new_state, aux) for one masked-reconstruction step."""
    from ..models.common import batch_norm_train

    e = cfg.encoder
    mel = log_mel_spectrogram(wav, e.frontend)
    if e.init_bn:
        x_bn, bn_state = batch_norm_train(
            params["init_bn"], state["init_bn"], mel, axis=-2, momentum=0.01
        )
        new_state = dict(state, init_bn=bn_state)
    else:
        # GlobalNormer fallback, same as the supervised path
        # (models.uit.apply_init_bn: (x+10)/40, reference uit.py:33-41)
        x_bn, new_state = (mel + 10.0) / 40.0, state

    tokens = uit.patch_embed(e, params["patch_embed"], x_bn)  # (B, fg, tg, D)
    fg, tg = tokens.shape[1], tokens.shape[2]
    tokens = tokens + params["time_pos_embed"][None, None, :tg, :]
    tokens = tokens + params["freq_pos_embed"][None, :, None, :]
    B = tokens.shape[0]
    L = fg * tg
    tokens = tokens.reshape(B, L, e.embed_dim)

    # per-sample random shuffle -> keep the first num_keep
    noise = jax.random.uniform(rng, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    keep = ids_shuffle[:, : cfg.num_keep]
    x_vis = jnp.take_along_axis(tokens, keep[:, :, None], axis=1)

    x_vis = _run_blocks(params["blocks"], x_vis, e.num_heads, e.attn_scale,
                        e.inner_dim, e.act)
    x_vis = layer_norm(params["norm"], x_vis, eps=1e-6)

    # decoder: scatter visible tokens back, fill the rest with mask tokens
    m = params["mae"]
    mask_tok = jnp.broadcast_to(m["mask_token"], (B, L - cfg.num_keep, e.embed_dim))
    full = jnp.concatenate([x_vis, mask_tok], axis=1)
    full = jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)
    full = full + m["decoder_pos_embed"][None, :L, :]
    full = _run_blocks(m["decoder_blocks"], full, cfg.decoder_num_heads,
                       (e.embed_dim // cfg.decoder_num_heads) ** -0.5,
                       e.embed_dim, e.act)
    pred = linear(m["pred"], layer_norm(m["decoder_norm"], full, eps=1e-6))

    # targets: per-patch-normalized mel pixels; loss only on masked patches
    target = mel_patches(cfg, x_bn)
    mu = target.mean(axis=-1, keepdims=True)
    var = target.var(axis=-1, keepdims=True)
    target = (target - mu) / jnp.sqrt(var + 1e-6)
    mask = jnp.ones((B, L)).at[jnp.arange(B)[:, None], keep].set(0.0)
    per_patch = jnp.mean((pred - target) ** 2, axis=-1)
    loss = jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, new_state, {"mask": mask}


def _pretrain_outdir(c: dict) -> Path:
    return (Path(c.get("outputpath", "experiments")) / "mae"
            / str(c.get("model", "uit_xs")))


def pretrain_from_config(config: dict) -> Path:
    """Run MAE pretraining; returns the snapshot usable as `pretrained:`.

    Honors ``resume: <last.npz>`` (lossless: params + optimizer moments +
    epoch) and ``auto_resume: N`` — on a crash the run restarts from the
    latest per-epoch ``last.npz`` in the (deterministic) output dir, up
    to N times, same semantics as train.loop.train_from_config.

    ``multihost:`` scales pretraining across hosts (the realistic pod
    workload — MAE is the big-unlabeled-data phase): per-host loaders,
    one collective step over the global mesh, rank-0 writes.
    """
    if config.get("multihost"):
        from ..parallel.multihost import initialize_from_config

        initialize_from_config(config["multihost"])
        if jax.process_count() > 1 and config.get("auto_resume"):
            raise ValueError(
                "auto_resume is single-host (a per-process retry would "
                "desynchronize the collective program across ranks); use a "
                "COORDINATED whole-pod restarter that relaunches ALL hosts "
                "with resume: auto — tools/launch_multihost.py "
                "--auto-resume N does exactly this locally")
    retries = int(config.get("auto_resume") or 0)
    config = dict(config)
    for attempt in range(retries + 1):
        try:
            return _pretrain_once(config)
        except KeyboardInterrupt:
            raise
        except Exception:
            last = _pretrain_outdir(config) / "last.npz"
            if attempt >= retries or not last.exists():
                raise
            log.exception(
                f"MAE pretraining crashed (attempt {attempt + 1}/"
                f"{retries + 1}); auto-resuming from {last}"
            )
            config["resume"] = str(last)
    raise AssertionError("unreachable")


def _pretrain_once(config: dict) -> Path:
    import optax
    import pandas as pd

    from ..ckpt.io import load_training_state, save_checkpoint, save_training_state
    from ..data import DataLoader, UnlabeledRandomChunkedHDF5Dataset, read_tsv_data
    from .schedule import cosine_with_warmup
    from .steps import build_optimizer, find_ema_params, wrap_optimizer

    c = config
    model_args = dict(c.get("model_args", {}))
    model_args.setdefault("target_length", 1012)
    from ..models import get_model_config

    if model_args.get("mel_layout", "bft") != "bft":
        raise ValueError(
            "MAE pretraining runs the canonical 'bft' mel path (its masked "
            "reconstruction target is the bft mel); drop mel_layout from "
            "the pretrain model_args — the supervised stage picks its own "
            "training layout (e.g. the 'tfb' fast path) independently"
        )
    enc = get_model_config(c.get("model", "uit_xs"), outputdim=c.get("num_classes", 527),
                           **model_args)
    cfg = MAEConfig(encoder=enc, mask_ratio=c.get("mask_ratio", 0.75),
                    decoder_depth=c.get("decoder_depth", 2))
    params, state = init(cfg, jax.random.key(c.get("seed", 42)))

    # multi-host: identical collective control flow per rank, rank-0 writes
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    data_seed = c.get("seed", 42) + jax.process_index() * 7919
    if n_proc > 1:
        log.info(f"multi-host MAE: process {jax.process_index()}/{n_proc}")

    df = read_tsv_data(c["train_data"]) if str(c["train_data"]).endswith((".tsv", ".csv")) else pd.read_csv(c["train_data"], sep=r"\s+")
    chunk_seconds = model_args["target_length"] * enc.frontend.hop_length / enc.frontend.sample_rate
    import random as _random

    ds = UnlabeledRandomChunkedHDF5Dataset(
        df, chunk_length=c.get("chunk_length", chunk_seconds),
        rng=_random.Random(data_seed * 1000))
    global_bs = c.get("batch_size", 64)
    local_bs = global_bs
    if n_proc > 1:
        if global_bs % n_proc:
            raise ValueError(
                f"multi-host MAE pretraining needs batch_size ({global_bs}) "
                f"divisible by the process count ({n_proc})")
        local_bs //= n_proc
    loader = DataLoader(ds, batch_size=local_bs, shuffle=True,
                        num_workers=c.get("num_workers", 2), drop_last=True,
                        seed=data_seed)

    epochs = c.get("epochs", 10)
    epoch_length = c.get("epoch_length") or len(loader)
    # ema_decay / grad_accum: shared optimizer wrappers (train.steps.
    # wrap_optimizer); the mae_pretrained.npz deliverable uses the EMA
    # weights, the schedule runs in applied-update units
    grad_accum = int(c.get("grad_accum", 1))
    ema_decay = c.get("ema_decay")
    schedule = cosine_with_warmup(c.get("optimizer_args", {}).get("lr", 1.5e-4),
                                  max(1, epochs * epoch_length // grad_accum),
                                  c.get("warmup_iters", 1000))
    optimizer = build_optimizer(c.get("optimizer", "AdamW"), schedule,
                                **{k: v for k, v in c.get("optimizer_args", {}).items() if k != "lr"})
    optimizer = wrap_optimizer(optimizer, ema_decay=ema_decay,
                               grad_accum=grad_accum)
    opt_state = optimizer.init(params)

    def step(params, state, opt_state, wav, rng):
        def loss_of(p):
            loss, new_state, _ = forward(cfg, p, state, wav, rng)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, opt_state, loss

    # DP mesh (same policy as the supervised loops: largest dividing
    # submesh single-host, full global mesh multi-host)
    from ..parallel import dp_placement
    from ..parallel.multihost import global_batch_from_host_local

    mesh, data_sh, repl = dp_placement([global_bs])
    if mesh is not None:
        log.info(f"data-parallel over {mesh.size} devices")
        jit_step = jax.jit(
            step,
            in_shardings=(repl, repl, repl, data_sh, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
        )
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
        params, state, opt_state = put((params, state, opt_state))
    else:
        jit_step = jax.jit(step, donate_argnums=(0, 1, 2))
    rng = jax.random.key(c.get("seed", 42))
    outdir = _pretrain_outdir(c)
    outdir.mkdir(parents=True, exist_ok=True)

    start_epoch = 1
    if c.get("resume") == "auto":
        # coordinated-restart convention (launch_multihost --auto-resume):
        # resume from this run dir's last.npz if one exists, else fresh
        c = dict(c)
        last = outdir / "last.npz"
        c["resume"] = str(last) if last.exists() else None
    if c.get("resume"):
        params, state, opt_state, _, extra = load_training_state(
            c["resume"], opt_state)
        start_epoch = int(extra.get("epoch", 0)) + 1
        rng = jax.random.fold_in(rng, start_epoch)  # fresh mask stream
        log.info(f"MAE resumed from {c['resume']} at epoch {start_epoch}")

    it = iter(loader)
    for epoch in range(start_epoch, epochs + 1):
        losses = []
        t0 = time.time()
        for _ in range(epoch_length):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            rng, r = jax.random.split(rng)
            wav = batch["wav"]
            if n_proc > 1:
                # assemble each host's rows into the globally sharded batch
                wav = global_batch_from_host_local(mesh, wav)
            else:
                wav = jnp.asarray(wav)
            params, state, opt_state, loss = jit_step(
                params, state, opt_state, wav, r
            )
            losses.append(loss)
        log.info(f"MAE epoch {epoch}: loss {float(np.mean([float(l) for l in losses])):.4f} "
                 f"({epoch_length / (time.time() - t0):.1f} it/s)")
        if is_main:  # multi-host: rank 0 is the only writer
            out_params = (find_ema_params(opt_state)
                          if ema_decay is not None else None)
            save_checkpoint(outdir / "mae_pretrained.npz",
                            params if out_params is None else out_params,
                            state, enc,
                            extra={"epoch": epoch, "mae": True})
            save_training_state(  # lossless crash-resume point (auto_resume)
                outdir / "last.npz", params, state, opt_state, enc,
                extra={"epoch": epoch})
    return outdir / "mae_pretrained.npz"
