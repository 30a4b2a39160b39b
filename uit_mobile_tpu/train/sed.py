"""SED (sound event detection) trainer: strong-label framewise training.

BEYOND THE REFERENCE: the reference has no strong-label training of any
kind — its chunked dataset is dead code (dataset.py:104-141) and its dm
head's per-timestep probabilities (uit.py:405-412) are always averaged
away. This trainer supervises them directly:

    StrongFramewiseHDF5Dataset (random window + per-segment targets)
        -> forward_train_framewise ((B, tg, C) probs, BN updates)
        -> BCE over segments, fused backward + clip + AdamW (one program)
        -> per-epoch DCASE-style segment-F1 validation, best-F1 checkpoint

Config (YAML/CLI, same merge machinery as the weak trainer):
    model: a 'dm'-pooling factory or model_args={'pooling': 'dm'}
    strong_train_data / strong_eval_data: TSVs with
        filename labels hdf5path from to   (one event interval per row)
    chunk_length (s, default 1.0), min_overlap (default 0.5),
    batch_size, epochs, epoch_length, optimizer(+args), warmup_iters,
    max_grad_norm, wavtransforms, spectransforms, data_dtype, seed.

Clip-level compatibility: mean over the segment axis reproduces the
clip-level dm output exactly, so an SED-trained checkpoint drops into
every weak-eval/serving path unchanged.
"""

from __future__ import annotations

import random as _random
from pathlib import Path

import numpy as np

from .. import models
from ..augment import parse_spectransforms, parse_wavtransforms
from ..ckpt.io import save_checkpoint
from ..data import DataLoader, StrongFramewiseHDF5Dataset, read_tsv_data
from ..evaluate.metrics import segment_f1
from ..utils import add_file_sink, get_logger, validate_frontend_precision
from .loop import _json_safe_config, _make_outputdir
from .schedule import cosine_with_warmup
from .steps import (
    build_optimizer,
    find_ema_params,
    make_framewise_train_step,
    wrap_optimizer,
)

log = get_logger()


def _segment_geometry(cfg):
    """(n_segments, seg_seconds) of the dm head for one training window."""
    tg = cfg.grid_size[1]
    seg_s = cfg.patch_stride * cfg.frontend.hop_length / cfg.frontend.sample_rate
    return tg, seg_s


def train_sed_from_config(config: dict) -> Path:
    """SED training; honors ``resume: <last.npz>`` (lossless) and
    ``auto_resume: N`` — crash-restart from the per-epoch snapshot in the
    SAME run directory, same semantics as train.loop.train_from_config.
    ``multihost:`` scales the loop across hosts exactly like the weak
    trainer (per-host loaders, global-mesh step, rank-0 writes)."""
    if config.get("multihost"):
        import jax

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
    if not retries:
        return _train_sed_once(config)
    config = dict(config)
    # pin the timestamped outputdir so restarts land in the same place
    config["outputdir"] = str(_make_outputdir(config))
    for attempt in range(retries + 1):
        try:
            return _train_sed_once(config)
        except KeyboardInterrupt:
            raise
        except Exception:
            last = Path(config["outputdir"]) / "last.npz"
            if attempt >= retries or not last.exists():
                raise
            log.exception(
                f"SED training crashed (attempt {attempt + 1}/"
                f"{retries + 1}); auto-resuming from {last}"
            )
            config["resume"] = str(last)
    raise AssertionError("unreachable")


def _train_sed_once(config: dict) -> Path:
    import jax
    import jax.numpy as jnp

    from ..ckpt.io import load_training_state, save_training_state
    from ..ops import make_frontend_fn

    c = config
    # reject a bad frontend_precision before any side effects, same as
    # the wavtransforms check below (shared validator with train/loop.py)
    validate_frontend_precision(c)
    if c.get("wavtransforms"):
        # per-segment targets are rasterized from the ORIGINAL event times:
        # a time-shifting augment (Shift) would silently misalign the
        # framewise supervision (configs/train_sed.yaml documents this) —
        # reject before any side effects (output dir, data, model)
        from ..augment.wav import TIME_PRESERVING_WAV_TRANSFORMS

        offending = set(c["wavtransforms"]) - TIME_PRESERVING_WAV_TRANSFORMS
        if offending:
            raise ValueError(
                f"SED training only admits time-preserving wavtransforms "
                f"({sorted(TIME_PRESERVING_WAV_TRANSFORMS)}); remove "
                f"{sorted(offending)} — they would move audio away from "
                f"the fixed per-segment targets"
            )
    outputdir = _make_outputdir(c)
    handler = add_file_sink(log, outputdir / c.get("logfile", "train.log"))
    try:
        return _train_sed_body(c, outputdir)
    finally:
        # also on crash: an auto_resume retry re-adds a sink to the SAME
        # pinned train.log — a leaked handler would duplicate every line
        log.removeHandler(handler)


def _train_sed_body(c: dict, outputdir) -> Path:
    import jax
    import jax.numpy as jnp

    from ..ckpt.io import load_training_state, save_training_state
    from ..ops import make_frontend_fn

    # multi-host: same contract as the weak Trainer — identical control
    # flow on every rank (the step and validation are collective programs
    # over the global mesh), rank 0 is the only filesystem writer
    n_proc = jax.process_count()
    rank = jax.process_index()
    is_main = rank == 0
    data_seed = c.get("seed", 42) + rank * 7919

    log.info(f"SED training -> {outputdir}")
    if n_proc > 1:
        log.info(f"multi-host: process {rank}/{n_proc}")
    for k, v in sorted(c.items()):
        log.info(f"{k} : {v}")

    # ---- model (dm pooling is what makes the head framewise)
    model_args = dict(c.get("model_args", {}))
    model_args.setdefault("pooling", "dm")
    num_classes = c.get("num_classes", 527)
    cfg = models.get_model_config(c["model"], outputdim=num_classes, **model_args)
    assert cfg.pooling == "dm", "SED training requires the 'dm' head"
    params, state = models.build(cfg, jax.random.key(c.get("seed", 42)))
    n_seg, seg_s = _segment_geometry(cfg)
    chunk_length = c.get("chunk_length", 1.0)
    log.info(f"segment geometry: {n_seg} x {seg_s:.3f}s per {chunk_length}s window")

    # ---- data
    def make_ds(tsv, deterministic=False):
        df = read_tsv_data(tsv, basename=c.get("basename", True))
        assert "from" in df.columns and "to" in df.columns, (
            f"{tsv}: SED manifests need from/to event-interval columns"
        )
        return StrongFramewiseHDF5Dataset(
            df, num_classes=num_classes, n_segments=n_seg, seg_seconds=seg_s,
            chunk_length=chunk_length, min_overlap=c.get("min_overlap", 0.5),
            # rank-offset seed: each host draws different training windows;
            # eval datasets are deterministic (offset = f(index)) so the
            # seed never reaches the validation data
            rng=_random.Random(data_seed * 1000),
            dtype=c.get("data_dtype", "float32"), deterministic=deterministic,
        )

    train_ds = make_ds(c["strong_train_data"])
    num_workers = c.get("num_workers", 2)
    local_bs = c["batch_size"]
    if n_proc > 1:
        if local_bs % n_proc:
            raise ValueError(
                f"multi-host SED training needs batch_size ({local_bs}) "
                f"divisible by the process count ({n_proc})")
        local_bs //= n_proc
    train_loader = DataLoader(
        train_ds, batch_size=local_bs, shuffle=True, drop_last=True,
        num_workers=num_workers, seed=data_seed,
    )
    if len(train_loader) == 0:
        raise ValueError(
            f"strong_train_data has only {len(train_ds)} clips — fewer than "
            f"batch_size={local_bs} (drop_last leaves no batches)"
        )

    # ---- fused step
    epochs = c["epochs"]
    epoch_length = c.get("epoch_length") or len(train_loader)
    lr = c.get("optimizer_args", {}).get("lr", 1e-3)
    opt_args = {k: v for k, v in c.get("optimizer_args", {}).items() if k != "lr"}
    # ema_decay / grad_accum: the shared optimizer wrappers (train.steps.
    # wrap_optimizer) — schedule runs in applied-update units under
    # accumulation; validation + best_sed.npz use the EMA weights
    grad_accum = int(c.get("grad_accum", 1))
    ema_decay = c.get("ema_decay")
    schedule = (
        cosine_with_warmup(lr, max(1, epochs * epoch_length // grad_accum),
                           c.get("warmup_iters", 1000))
        if c.get("use_scheduler", True) else lr
    )
    optimizer = build_optimizer(c.get("optimizer", "AdamW"), schedule, **opt_args)
    optimizer = wrap_optimizer(optimizer, ema_decay=ema_decay,
                               grad_accum=grad_accum)
    opt_state = optimizer.init(params)
    wav_aug = parse_wavtransforms(c["wavtransforms"]) if c.get("wavtransforms") else None
    spec_aug = parse_spectransforms(c["spectransforms"]) if c.get("spectransforms") else None
    # already validated before side effects in _train_sed_once; this
    # call just resolves the default
    frontend = make_frontend_fn(
        cfg.frontend, use_pallas=(jax.devices()[0].platform == "tpu"),
        precision=validate_frontend_precision(c),
    )
    step_fn = make_framewise_train_step(
        cfg, optimizer, loss_name=c.get("loss", "BCELoss"),
        loss_args=c.get("loss_args"),
        max_grad_norm=c.get("max_grad_norm"),
        wav_augment=wav_aug, spec_augment=spec_aug, frontend_fn=frontend,
    )
    # DP mesh (same policy as the weak trainer: parallel.mesh.dp_placement
    # — largest dividing submesh single-host, full global mesh multi-host)
    from ..parallel import dp_placement
    from ..parallel.multihost import global_batch_from_host_local

    mesh, data_sh, repl = dp_placement([c["batch_size"]])
    if mesh is not None:
        log.info(f"data-parallel over {mesh.size} devices")
        step = jax.jit(
            step_fn,
            in_shardings=(repl, repl, repl, data_sh, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
        )
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
        params, state, opt_state = put((params, state, opt_state))
    else:
        step = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    # ---- eval: deterministic windows (offset = f(index), stable under
    # threaded loaders), segment-F1 over all (segment, class). Dataset,
    # loader, and the jitted forward are built ONCE — a fresh jit per
    # epoch would retrace and recompile every validation pass.
    eval_ds = make_ds(c.get("strong_eval_data", c["strong_train_data"]),
                      deterministic=True)
    eval_loader = DataLoader(
        eval_ds, batch_size=c.get("eval_batch_size", c["batch_size"]),
        shuffle=False, num_workers=num_workers,
    )
    # eval-path framewise forward (inference BN stats, no augments);
    # 1 s windows -> exactly the training segment grid
    eval_fwd = jax.jit(
        lambda pp, ss, w: models.uit.forward_framewise(cfg, pp, ss, w)[0]
    )

    def validate(p, s):
        loader, fwd = eval_loader, eval_fwd
        probs, targets = [], []
        for batch in loader:
            wav = batch["wav"]
            if wav.dtype == np.int16:
                wav = wav.astype(np.float32) / 32768.0
            pr = np.asarray(fwd(p, s, jnp.asarray(wav)))
            assert pr.shape == batch["target"].shape, (
                f"segment grid mismatch: model {pr.shape} vs targets "
                f"{batch['target'].shape} — chunk_length and target_length "
                f"must describe the same window"
            )
            probs.append(pr)
            targets.append(batch["target"])
        probs = np.concatenate(probs).reshape(-1, num_classes)
        targets = np.concatenate(targets).reshape(-1, num_classes)
        return segment_f1(probs, targets, threshold=c.get("threshold", 0.5))

    # ---- loop
    key = jax.random.key(c.get("seed", 42))
    best = -1.0
    start_epoch = 1
    if c.get("resume") == "auto":
        # coordinated-restart convention (launch_multihost --auto-resume):
        # resume from this run dir's last.npz if one exists, else fresh
        c = dict(c)
        last = outputdir / "last.npz"
        c["resume"] = str(last) if last.exists() else None
    if c.get("resume"):
        params, state, opt_state, _, extra = load_training_state(
            c["resume"], opt_state)
        start_epoch = int(extra.get("epoch", 0)) + 1
        best = float(extra.get("best", -1.0))
        key = jax.random.fold_in(key, start_epoch)  # fresh augment stream
        log.info(f"SED resumed from {c['resume']} at epoch {start_epoch} "
                 f"(best segF1 {best:.4f})")
    best_path = outputdir / "best_sed.npz"
    it = iter(train_loader)
    for epoch in range(start_epoch, epochs + 1):
        losses = []
        for _ in range(epoch_length):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            key, k = jax.random.split(key)
            sb = {"wav": batch["wav"], "target": batch["target"]}
            if n_proc > 1:
                # assemble each host's rows into the globally sharded batch
                sb = global_batch_from_host_local(mesh, sb)
            else:
                sb = {k2: jnp.asarray(v) for k2, v in sb.items()}
            params, state, opt_state, m = step(params, state, opt_state, sb, k)
            losses.append(float(m["total_loss"]))
        eval_params = (find_ema_params(opt_state)
                       if ema_decay is not None else None)
        eval_params = params if eval_params is None else eval_params
        scores = validate(eval_params, state)
        log.info(
            f"Epoch {epoch}: loss {np.mean(losses):.4f} "
            f"segF1 micro {scores['Segment_Micro_F1']:.4f} "
            f"macro {scores['Segment_Macro_F1']:.4f}"
        )
        # multi-host: scores are collective results over identical eval
        # data -> identical decisions on every rank; rank 0 writes
        if scores["Segment_Micro_F1"] > best:
            best = scores["Segment_Micro_F1"]
            if is_main:
                save_checkpoint(best_path, eval_params, state, cfg=cfg,
                                extra={"segment_f1_micro": best,
                                       "epoch": epoch,
                                       "run_config": _json_safe_config(c)})
        if is_main:
            save_training_state(  # lossless crash-resume point (auto_resume)
                outputdir / "last.npz", params, state, opt_state, cfg,
                extra={"epoch": epoch, "best": best})
    log.info(f"Best segment-F1 micro {best:.4f} -> {best_path}")
    return best_path
