"""Training loop: the reference Runner.train (run.py:96-413) rebuilt TPU-first.

Differences from the reference, by design:
- the whole iteration (teacher fwd + student fwd/bwd + optimizer) is ONE
  jitted XLA program with donated buffers (train/steps.py);
- data parallelism over a jax.sharding Mesh: batch sharded on 'data',
  params/opt-state replicated, gradient psum inserted by jit;
- checkpoints are native .npz (params + BN state + config + step/score)
  saved top-k by validation mAP, then element-wise averaged into
  ``averaged.npz`` (ckpt.io.average_checkpoints) — same deliverable shape
  as the reference (run.py:385-397);
- early stopping on patience evaluations without mAP improvement
  (run.py:368-372);
- fixed-shape training batches (1s random crops) -> zero recompiles.

Measured single-chip throughput frontier (v5e, PERF_NOTES.md round 4):
the fast production configuration is ``batch_size: 1024`` +
``model_args: {compute_dtype: bfloat16}`` + ``steps_per_dispatch: 16``
= 84.3k clips/s trained (B=2048 regresses — HBM pressure; K=32 buys
only +3% at coarser metric granularity). The shipped YAML configs keep
the reference recipe (B=32, f32, per-step) for parity and document
these levers; scale lr with batch size when raising it.

Reference quirks intentionally fixed (documented, not copied):
``max_grad_norm`` applies to the non-PSL path too (reference drops it,
run.py:220-234).
"""

from __future__ import annotations

import datetime
import os
import time
import uuid
from pathlib import Path
from typing import Optional

import numpy as np

from .. import models
from ..augment import parse_spectransforms, parse_wavtransforms
from ..ckpt.io import (
    average_checkpoints,
    load_checkpoint,
    load_pretrained_partial,
    load_training_state,
    save_checkpoint,
    save_training_state,
)
from ..data import (
    BalancedSampler,
    DataLoader,
    MultiDataLoader,
    WeakHDF5Dataset,
    WeakRandomCropHDF5Dataset,
    read_tsv_data,
)
from ..evaluate.metrics import compute_metrics
from ..utils import add_file_sink, get_logger, validate_frontend_precision
from .schedule import cosine_with_warmup
from .steps import (
    build_optimizer,
    find_ema_params,
    make_eval_step,
    make_train_step,
    wrap_optimizer,
)

log = get_logger()


def _make_outputdir(config: dict) -> Path:
    if config.get("outputdir"):  # explicit pin (auto-resume restarts
        outputdir = Path(config["outputdir"])  # must land in the same dir)
    else:
        stem = config.get("config_stem", "run")
        outputdir = (
            Path(config["outputpath"]) / stem / str(config["model"]) /
            f"{datetime.datetime.now().strftime('%Y-%m-%d_%H-%M')}_{uuid.uuid1().hex}"
        )
    outputdir.mkdir(exist_ok=True, parents=True)
    return outputdir


def _load_psl(config):
    """Load the frozen distillation teacher (reference run.py:160-173).

    psl: {mode: offline} loads NOTHING — the teacher ran once at data-prep
    time (uit-psl-cache) and the cached targets ride in through
    data.PSLCachedRandomCropHDF5Dataset; the train step is teacher-free
    (the in-step teacher was 26% of the frontier step, PERF_NOTES r4)."""
    psl = config.get("psl")
    if psl is None:
        return None, None, None
    if psl.get("mode") == "offline":
        cache = psl.get("cache")
        if not cache:
            raise ValueError(
                "psl: {mode: offline} needs cache: <psl_cache.h5> "
                "(one file, a shard glob, or a list — build with "
                "uit-psl-cache [--shard i/N])")
        from ..data.psl_cache import resolve_cache_paths

        paths = resolve_cache_paths(cache)  # raises on missing/empty
        log.info(f"offline PSL: cached teacher targets from "
                 f"{paths if len(paths) > 1 else paths[0]} "
                 f"(teacher-free train step)")
        return None, None, None
    from ..cli.common import resolve_model

    spec = psl.get("pretrained")
    log.info(f"Using PSL model {psl['model']} from {spec}")
    try:
        cfg, params, state = resolve_model(spec)
    except Exception:
        # allow an untrained teacher for smoke runs
        if not psl.get("allow_untrained", False):
            raise
        import jax

        cfg = models.get_model_config(psl["model"],
                                      outputdim=psl.get("outputdim", 527))
        params, state = models.build(cfg, jax.random.key(0))
    if psl.get("compute_dtype") and hasattr(cfg, "compute_dtype"):
        # psl: {compute_dtype: bfloat16} — bf16 MXU work in the teacher
        # forward (the teacher is 26% of the B=1024 step, PERF_NOTES r4);
        # teacher probs drift is bf16 input rounding only
        import dataclasses as _dc

        cfg = _dc.replace(cfg, compute_dtype=psl["compute_dtype"])
    return cfg, params, state


def _json_safe_config(c: dict) -> dict:
    """Subset of the run config that survives the checkpoint's JSON sidecar
    (evaluation reads e.g. `basename` back out of it, as the reference does
    from its pickled config, evaluate.py:200-201)."""
    import json

    out = {}
    for k, v in c.items():
        try:
            json.dumps(v)
        except (TypeError, ValueError):
            continue
        out[k] = v
    return out


class Trainer:
    def __init__(self, config: dict):
        import jax

        self.config = config
        self.run_config = _json_safe_config(config)
        # reject a bad frontend_precision BEFORE any side effects (the
        # experiment outputdir below, model/data builds in train()) —
        # shared validator with train/sed.py
        validate_frontend_precision(config)
        # Multi-host: every process runs the identical control flow (the
        # train step and validation are collective programs over the global
        # mesh); only process 0 touches the filesystem (checkpoints,
        # averaging, last.npz). parallel.multihost.initialize must have run
        # already — train_from_config does it from the `multihost:` key.
        self.rank = jax.process_index()
        self.n_proc = jax.process_count()
        self.is_main = self.rank == 0
        self.outputdir = _make_outputdir(config)
        logfile = config.get("logfile", "train.log")
        if self.rank > 0:  # keep per-host logs from interleaving on shared fs
            logfile = f"{Path(logfile).stem}.rank{self.rank}{Path(logfile).suffix}"
        self._file_handler = add_file_sink(log, self.outputdir / logfile)

        log.info(f"Storing output in {self.outputdir}")
        log.info(f"devices: {jax.devices()}")
        if self.n_proc > 1:
            log.info(f"multi-host: process {self.rank}/{self.n_proc}, "
                     f"{jax.local_device_count()} local of "
                     f"{jax.device_count()} global devices")
        for k, v in sorted(config.items()):
            log.info(f"{k} : {v}")

    # ------------------------------------------------------------------ setup

    def _build_model(self):
        import jax
        import jax.numpy as jnp

        c = self.config
        cfg = models.get_model_config(
            c["model"], outputdim=c.get("num_classes", 527), **c.get("model_args", {})
        )
        params, state = models.build(cfg, jax.random.key(c.get("seed", 42)))
        pretrained = c.get("pretrained")
        if pretrained:
            log.info(f"initializing from pretrained {pretrained}")
            from ..cli.common import resolve_model
            from ..ckpt.torch_convert import resize_pos_embed

            _, p_params, p_state = resolve_model(pretrained)
            # retarget factorized pos embeds across target_length changes
            # (reference load_pretrained force-copies them and resizes,
            # utils.py:196-198 + uit.py:416-450) — e.g. MAE pretraining at
            # 1012 frames -> fine-tuning at 102
            for key in ("time_pos_embed", "freq_pos_embed"):
                if key in p_params and p_params[key].shape != params[key].shape:
                    p_params = dict(p_params)
                    p_params[key] = jnp.asarray(
                        resize_pos_embed(np.asarray(p_params[key]),
                                         params[key].shape[0])
                    )
            params, n = load_pretrained_partial(params, p_params)
            log.info(f"Loading {n} parameter tensors")
        return cfg, params, state

    def _build_data(self):
        c = self.config
        num_classes = c.get("num_classes", 527)
        chunk_length = c.get("chunk_length")
        use_crop = c.get("psl") is not None or chunk_length is not None
        # 'int16' ships raw PCM to the device (half the transfer bytes);
        # with no wavtransforms the step passes it straight to the mel
        # kernels (2-byte framing gather — tools/probe_int16_train.py),
        # otherwise it normalizes on device. Bitwise-equal to f32 loaders
        # either way (the frontends fold 1/32768 exactly).
        data_dtype = c.get("data_dtype", "float32")

        import random as _random

        ds_counter = iter(range(1000))
        # per-host sampling stream: rank-offset seeds make each host draw
        # DIFFERENT training samples (the multi-host analogue of one big
        # shuffled stream); rank 0 == the single-host seed, so single-host
        # runs are unchanged. Validation stays rank-identical (shuffle=False
        # + no rng) — every host must score the same data in lockstep.
        data_seed = c.get("seed", 42) + self.rank * 7919

        psl_conf = c.get("psl") or {}
        psl_cache = (psl_conf.get("cache")
                     if psl_conf.get("mode") == "offline" else None)

        def make_ds(df, psl_cache=None):
            rng = _random.Random(data_seed * 1000 + next(ds_counter))
            if psl_cache is not None:
                if "from" in df.columns and "to" in df.columns:
                    raise ValueError(
                        "psl: {mode: offline} expects a weak (filename/"
                        "labels/hdf5path) audioset manifest — strong "
                        "interval manifests have no cached-crop grid")
                from ..data import PSLCachedRandomCropHDF5Dataset

                # cached-teacher targets ride in as data; the step is the
                # plain (teacher-free) make_train_step
                return PSLCachedRandomCropHDF5Dataset(
                    df, chunk_length=chunk_length or 1.0,
                    num_classes=num_classes, cache_path=psl_cache,
                    rng=rng, dtype=data_dtype,
                )
            if "from" in df.columns and "to" in df.columns:
                # strong-label manifest (one labeled event interval per
                # row): crop/pad WITHIN the interval — the reference ships
                # this dataset class as dead code (dataset.py:104-141,
                # unused by run.py); here it trains
                from ..data import WeakChunkedHDF5Dataset

                return WeakChunkedHDF5Dataset(
                    df, num_classes=num_classes,
                    fixed_length=chunk_length or 1.0, rng=rng, dtype=data_dtype,
                )
            if use_crop:
                # seed the crop/pad offsets (distinct stream per dataset) so
                # a fixed config seed reproduces the training batches
                return WeakRandomCropHDF5Dataset(
                    df, chunk_length=chunk_length or 1.0, num_classes=num_classes,
                    rng=rng, dtype=data_dtype,
                )
            return WeakHDF5Dataset(df, num_classes=num_classes, dtype=data_dtype)

        basename = c.get("basename", True)

        def read_as(path):
            # AudioSet manifests are basenamed unconditionally (reference
            # read_tsv_data default, utils.py:320-332) — EXCEPT strong
            # (from/to) manifests, a post-reference format whose filenames
            # follow the config's basename flag like the KWS side
            import pandas as pd

            cols = pd.read_csv(path, sep=r"\s+", nrows=0).columns
            strong = "from" in cols and "to" in cols
            return read_tsv_data(path, basename=basename if strong else True)

        as_train = read_as(c["audioset_train_data"])
        as_eval = read_as(c["audioset_eval_data"])
        kws_train = read_tsv_data(c["kws_train_data"], basename=basename)
        kws_eval = read_tsv_data(c["kws_test_data"], basename=basename)
        log.info(
            f"#Lengths: Audioset Train - {len(as_train)} Audioset Eval - {len(as_eval)} "
            f"KWS Train - {len(kws_train)} KWS Eval - {len(kws_eval)}"
        )

        batch_size = c["batch_size"]
        kws_bs = c.get("kws_batch_size", batch_size // 2)
        as_bs = c.get("as_batch_size", batch_size // 2)
        if self.n_proc > 1:
            if not use_crop:
                # full-clip datasets pad each batch to its OWN max length,
                # so hosts would assemble global arrays with different
                # trailing dims -> different collective programs per rank
                # (a distributed hang, not an error message). Require the
                # fixed-length crop pipeline instead of failing obscurely.
                raise ValueError(
                    "multi-host training needs fixed-length batches — set "
                    "chunk_length (random-crop pipeline); full-clip "
                    "variable-length batches would give each host a "
                    "different global batch shape")
            # config batch sizes are GLOBAL; each host loads its slice
            # (rows assemble into the globally sharded batch in
            # device_prefetch via make_array_from_process_local_data)
            for name, bs in (("kws_batch_size", kws_bs),
                             ("as_batch_size", as_bs)):
                if bs % self.n_proc:
                    raise ValueError(
                        f"multi-host training needs {name} ({bs}) divisible "
                        f"by the process count ({self.n_proc})")
            kws_bs //= self.n_proc
            as_bs //= self.n_proc
        num_workers = c.get("num_workers", 2)

        def sampler_for(which, df):
            if c.get(which) == "balanced":
                return BalancedSampler(df["labels"], random_state=data_seed)
            return None

        train_loader = MultiDataLoader(
            kws=DataLoader(
                make_ds(kws_train), batch_size=kws_bs, num_workers=num_workers,
                sampler=sampler_for("kws_sampler", kws_train),
                shuffle=True, drop_last=True, seed=data_seed,
            ),
            audioset=DataLoader(
                make_ds(as_train, psl_cache=psl_cache),
                batch_size=as_bs, num_workers=num_workers,
                sampler=sampler_for("as_sampler", as_train),
                shuffle=True, drop_last=True, seed=data_seed,
            ),
        )
        import pandas as pd

        test_df = pd.concat((as_eval, kws_eval))
        test_loader = DataLoader(
            WeakHDF5Dataset(test_df, num_classes=num_classes),
            batch_size=c.get("eval_batch_size", batch_size),
            num_workers=num_workers, shuffle=False,
        )
        return train_loader, test_loader

    # ------------------------------------------------------------------ train

    def train(self) -> Path:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops import make_frontend_fn

        c = self.config
        multihost = self.n_proc > 1
        # (already validated in __init__, before the outputdir side effect)
        fe_prec = validate_frontend_precision(c)
        cfg, params, state = self._build_model()
        psl_mode = (c.get("psl") or {}).get("mode", "psl")
        psl_cfg, psl_params, psl_state = _load_psl(c)
        train_loader, test_loader = self._build_data()

        epochs = c["epochs"]
        epoch_length = c.get("epoch_length") or len(train_loader)
        total_steps = epochs * epoch_length
        lr = c.get("optimizer_args", {}).get("lr", 1e-3)
        opt_args = {k: v for k, v in c.get("optimizer_args", {}).items() if k != "lr"}
        # grad_accum: K loader micro-batches per applied optimizer update
        # (optax.MultiSteps averages the micro-gradients — K micro-batches
        # of size B land the same update one KxB batch would, at 1/K the
        # activation memory). The schedule (and warmup_iters) run in
        # APPLIED-update units, so the cosine still completes the run.
        grad_accum = int(c.get("grad_accum", 1))
        if c.get("use_scheduler", True):
            # default 1000 warmup iters like DEFAULT_ARGS/pretrain (reference
            # utils.py:29); an absent key must not silently disable warmup
            schedule = cosine_with_warmup(lr, max(1, total_steps // grad_accum),
                                          c.get("warmup_iters", 1000))
        else:
            schedule = lr
        optimizer = build_optimizer(c.get("optimizer", "Adam"), schedule, **opt_args)
        # ema_decay: parameter EMA tracked INSIDE opt_state (train.steps.
        # params_ema) — validation, best-k checkpoints, and the final
        # deliverable then use the smoothed weights while raw params keep
        # training (last.npz resume keeps both, for free).
        ema_decay = c.get("ema_decay")
        optimizer = wrap_optimizer(optimizer, ema_decay=ema_decay,
                                   grad_accum=grad_accum)
        if ema_decay is not None:
            log.info(f"parameter EMA (decay {ema_decay}): validation and "
                     f"checkpoints use the smoothed weights")
        if grad_accum > 1:
            log.info(f"gradient accumulation: {grad_accum} micro-batches "
                     f"per optimizer update")
        opt_state = optimizer.init(params)

        start_epoch = 1
        resume = c.get("resume")
        if resume == "auto":
            # coordinated-restart convention (tools/launch_multihost.py
            # --auto-resume): pick up this run dir's last.npz when one
            # exists, fresh start otherwise. Multi-host: rank 0 wrote it;
            # EVERY rank reads the same file (outputpath must be a shared
            # filesystem — the same requirement the checkpoint deliverable
            # already has on a pod).
            last = self.outputdir / "last.npz"
            resume = str(last) if last.exists() else None
        resume_extra: dict = {}
        if resume:
            params, state, opt_state, _, resume_extra = load_training_state(
                resume, opt_state)
            start_epoch = int(resume_extra.get("epoch", 0)) + 1
            log.info(f"resumed from {resume} at epoch {start_epoch}")

        use_pallas = jax.devices()[0].platform == "tpu"
        # the student trains in its config's mel layout ('bft' reference
        # default; 'tfb' = the transpose-free fast path, PERF_NOTES round
        # 4 — set model_args: {mel_layout: tfb}); the PSL teacher always
        # reads 'bft', through the tfb_to_bft route (bitwise-equal mel,
        # 1.15x teacher / +6% full-step at the frontier —
        # tools/probe_teacher_tfb.py; engages only at fast precision).
        # frontend_precision: 'exact' (default, bit-parity kernels) or
        # 'fast' (3-pass bf16 DFT, <=3e-4 prob drift — the measured
        # training-frontier mode; convergence verified on-chip).
        # Validated up top (validate_frontend_precision) before any side
        # effects.
        mel_layout = getattr(cfg, "mel_layout", "bft")
        frontend = make_frontend_fn(cfg.frontend, use_pallas=use_pallas,
                                    precision=fe_prec, layout=mel_layout)
        psl_frontend = None
        if psl_cfg is not None:
            psl_frontend = make_frontend_fn(psl_cfg.frontend,
                                            use_pallas=use_pallas,
                                            precision=fe_prec,
                                            layout="tfb_to_bft")
        train_step = make_train_step(
            cfg, optimizer,
            loss_name=c.get("loss", "BCELoss"),
            loss_args=c.get("loss_args") or {},
            mixup_alpha=c.get("mixup"),
            max_grad_norm=c.get("max_grad_norm"),
            psl_cfg=psl_cfg,
            # mode 'offline' loads no teacher (psl_cfg is None, targets
            # arrive cached from the data pipeline) — the step is plain
            distill_mode=("psl" if psl_mode == "offline" else psl_mode),
            distill_alpha=(c.get("psl") or {}).get("alpha", 1.0),
            distill_classes=(c.get("psl") or {}).get("classes", 527),
            # Trainer preassembles [audioset, kws] host-side (fast path).
            # Multi-host keeps the DICT batch form instead: the global
            # row order of an assembled flat batch is process-interleaved
            # ([p0_as, p0_kws, p1_as, ...]), so the flat path's global
            # `wav[:psl_split]` teacher slice would mix halves — the
            # in-step concatenate of two per-half global arrays restores
            # the [all audioset, all kws] order exactly.
            psl_split=(None if multihost
                       else c.get("as_batch_size", c["batch_size"] // 2)),
            wav_augment=parse_wavtransforms(c.get("wavtransforms", {})),
            spec_augment=parse_spectransforms(c.get("spectransforms", {}),
                                              layout=mel_layout),
            frontend_fn=frontend,
            psl_frontend_fn=psl_frontend,
        )
        eval_step = jax.jit(make_eval_step(cfg, frontend_fn=frontend))

        # DP mesh policy (shared with sed/pretrain): single-host uses the
        # largest device count that divides every batch axis the step sees
        # (each PSL half shards independently); multi-host requires the
        # full global mesh (parallel.mesh.dp_placement)
        from ..parallel import dp_placement

        c_batch = c["batch_size"]
        halves = [c.get("kws_batch_size", c_batch // 2),
                  c.get("as_batch_size", c_batch // 2)]
        shard_dims = halves if psl_cfg is not None else [sum(halves)]
        mesh, data_sh, repl = dp_placement(shard_dims)
        if mesh is not None:
            log.info(f"data-parallel over {mesh.size} devices")
        if mesh is not None:
            jit_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, repl, data_sh, repl, repl, repl),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1, 2),
            )
            put = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
            params, state, opt_state = put((params, state, opt_state))
            if psl_params is not None:
                psl_params, psl_state = put((psl_params, psl_state))
        else:
            data_sh = None
            jit_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        # K optimizer updates per dispatched program (train.steps.
        # make_multi_step — the training-side scanned dispatch): fixed
        # per-dispatch overhead amortizes Kx; per-step loss granularity
        # coarsens to K (metrics surface after each group)
        steps_per_dispatch = int(c.get("steps_per_dispatch", 1))
        jit_multi = None
        if steps_per_dispatch > 1 and multihost:
            raise ValueError(
                "steps_per_dispatch > 1 is a single-host dispatch-"
                "amortization lever (the host-side K-batch stacking is not "
                "wired for process-local global arrays); drop it from "
                "multi-host configs")
        if steps_per_dispatch > 1:
            from .steps import make_multi_step

            multi = make_multi_step(train_step, psl=psl_cfg is not None)
            if mesh is not None:
                stacked_sh = NamedSharding(mesh, P(None, "data"))
                jit_multi = jax.jit(
                    multi,
                    in_shardings=(repl, repl, repl, stacked_sh, repl, repl,
                                  repl),
                    out_shardings=(repl, repl, repl, repl),
                    donate_argnums=(0, 1, 2),
                )
            else:
                jit_multi = jax.jit(multi, donate_argnums=(0, 1, 2))
            log.info(f"scanned training: {steps_per_dispatch} steps per "
                     f"dispatched program")

        rng = jax.random.key(c.get("seed", 42))
        best_score = -np.inf
        patience = c.get("early_stop", 10)
        bad_evals = 0
        n_saved = c.get("n_saved", 4)
        saved: list[tuple[float, Path]] = []
        step_count = 0
        if resume_extra:
            # restore the full training trajectory, not just the weights:
            # best-k history (so averaged.npz covers the WHOLE run), early
            # stop patience, and the step counter for checkpoint naming
            step_count = int(resume_extra.get("step", 0))
            best_score = float(resume_extra.get("best_score", -np.inf))
            bad_evals = int(resume_extra.get("bad_evals", 0))
            for s, pth in resume_extra.get("saved", []):
                if Path(pth).exists():
                    saved.append((float(s), Path(pth)))
            saved.sort(key=lambda x: -x[0])
            if saved:
                log.info(f"resume: restored {len(saved)} best-checkpoint entries")

        def to_step_batch(batch):
            """Assemble the step's numpy batch on the host (device placement
            + sharding happens in the prefetch stage). PSL batches flatten
            to [audioset, kws] rows here — the step's preassembled fast
            path (psl_split above) then skips the on-device concatenates
            (+23%/step measured, tools/probe_preassembled.py); the host
            copies hide behind device_prefetch.

            Multi-host PSL keeps the halves as a dict (see the psl_split
            note above): each half assembles into its own global array and
            the step concatenates them in [all audioset, all kws] order."""
            if multihost and psl_cfg is not None and "wav" not in batch:
                return {
                    half: {"wav": batch[half]["wav"],
                           "target": batch[half]["target"]}
                    for half in ("audioset", "kws")
                }
            if "wav" in batch:
                return {"wav": batch["wav"], "target": batch["target"]}
            # dual-loader batch: right-pad both halves to a common length
            # before concatenating (full-clip datasets pad each half to
            # its own batch max — e.g. 10s AudioSet vs 1s KWS; the PSL
            # crop path always matches already)
            aw = batch["audioset"]["wav"]
            kw = batch["kws"]["wav"]
            T = max(aw.shape[-1], kw.shape[-1])
            if aw.shape[-1] != T:
                aw = np.pad(aw, ((0, 0), (0, T - aw.shape[-1])))
            if kw.shape[-1] != T:
                kw = np.pad(kw, ((0, 0), (0, T - kw.shape[-1])))
            return {
                "wav": np.concatenate([aw, kw]),
                "target": np.concatenate(
                    [batch["audioset"]["target"], batch["kws"]["target"]]
                ),
            }

        sf = c.get("score_function") or ["mAP", 1.0]
        if isinstance(sf, str):
            sf = [sf, 1.0]  # bare metric name => maximize
        if not (isinstance(sf, (list, tuple)) and len(sf) == 2
                and isinstance(sf[0], str)):
            raise ValueError(
                f"score_function must be a metric name or [name, sign], got {sf!r}"
            )
        score_name, score_sign = sf[0], float(sf[1])

        # overlap host-side batch assembly/transfer with device compute
        from ..data import device_prefetch

        def step_batches():
            for raw in train_loader:
                yield to_step_batch(raw)

        # prefetch depth covers a full scanned group plus one batch so the
        # host stays ahead of the device even at steps_per_dispatch > 1
        train_iter = device_prefetch(step_batches(),
                                     size=max(2, steps_per_dispatch + 1),
                                     sharding=data_sh,
                                     process_local=multihost)
        stop = False
        for epoch in range(start_epoch, epochs + 1):
            if stop:
                break
            t0 = time.time()
            losses = []
            done = 0
            while done < epoch_length:
                K = steps_per_dispatch if (
                    jit_multi is not None
                    and epoch_length - done >= steps_per_dispatch) else 1
                if K > 1:
                    group = [next(train_iter) for _ in range(K)]

                    def stack_leaves(*xs):
                        # full-clip loaders pad each batch to its own
                        # batch-max length; equalize across the group
                        # (zero right-pad — identical semantics to the
                        # clips having shared one batch)
                        T = max(x.shape[-1] for x in xs)
                        xs = [
                            jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                                    + [(0, T - x.shape[-1])])
                            if x.shape[-1] != T else x
                            for x in xs
                        ]
                        return jnp.stack(xs)

                    batch = jax.tree.map(stack_leaves, *group)
                    rng, sub = jax.random.split(rng)
                    keys = jax.random.split(sub, K)
                    params, state, opt_state, metrics = jit_multi(
                        params, state, opt_state, batch, keys,
                        psl_params, psl_state
                    )
                    # keep the (K,) loss LAZY — a sync here would
                    # serialize host and device and defeat the
                    # dispatch pipelining this feature provides
                    losses.append(metrics["total_loss"])
                else:
                    batch = next(train_iter)
                    rng, step_rng = jax.random.split(rng)
                    params, state, opt_state, metrics = jit_step(
                        params, state, opt_state, batch, step_rng,
                        psl_params, psl_state
                    )
                    losses.append(metrics["total_loss"])
                step_count += K
                done += K
            # one sync per epoch: entries are scalars (K=1) or (K,) arrays
            mean_loss = float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(l)) for l in losses])))
            log.info(
                f"Epoch {epoch:<4} loss {mean_loss:.4f} "
                f"({epoch_length / (time.time() - t0):.1f} it/s)"
            )

            if epoch % c.get("valid_every", 1) == 0:
                # with EMA on, the smoothed weights are what ships — score
                # and checkpoint those (raw params keep training; last.npz
                # below still snapshots the raw trajectory + opt_state)
                eval_params = (find_ema_params(opt_state)
                               if ema_decay is not None else None)
                eval_params = params if eval_params is None else eval_params
                score = score_sign * self._validate(
                    eval_step, eval_params, state, test_loader, epoch,
                    metric=score_name
                )
                ckpt_path = self.outputdir / f"best_model_{step_count}_mAP={score:.4f}.npz"
                saved.append((score, ckpt_path))
                saved.sort(key=lambda x: -x[0])
                # multi-host: identical bookkeeping/decisions on every rank
                # (scores are identical — same eval data, same global
                # params), filesystem writes on rank 0 only
                if (score, ckpt_path) in saved[:n_saved] and self.is_main:
                    save_checkpoint(ckpt_path, eval_params, state, cfg,
                                    extra={"step": step_count, "mAP": score,
                                           "run_config": self.run_config})
                for s, p in saved[n_saved:]:
                    if self.is_main:
                        p.unlink(missing_ok=True)
                saved = saved[:n_saved]
                if score > best_score:
                    best_score = score
                    bad_evals = 0
                else:
                    bad_evals += 1
                    if bad_evals >= patience:
                        log.info(f"Early stopping at epoch {epoch}")
                        stop = True
                if self.is_main:
                    save_training_state(  # lossless mid-training resume point
                        self.outputdir / "last.npz", params, state, opt_state,
                        cfg,
                        extra={
                            "epoch": epoch, "step": step_count,
                            score_name: score,
                            "best_score": best_score, "bad_evals": bad_evals,
                            "saved": [[s, str(p)] for s, p in saved],
                        },
                    )

            # fault injection (chaos drill for the restart machinery —
            # tests/test_multihost_trainer.py): crash THIS rank after epoch
            # UIT_FAULT_EPOCH. Gated off on resumed runs so the replayed
            # attempt survives the same environment.
            fault_epoch = os.environ.get("UIT_FAULT_EPOCH")
            if (fault_epoch is not None and epoch == int(fault_epoch)
                    and self.rank == int(os.environ.get("UIT_FAULT_RANK", "0"))
                    and not c.get("resume")):
                raise RuntimeError(
                    f"injected fault after epoch {epoch} "
                    f"(UIT_FAULT_EPOCH={fault_epoch}, rank {self.rank})")

        train_iter.close()  # stop the prefetch producer (infinite stream)

        # average the kept best checkpoints -> the deliverable. Multi-host:
        # rank 0 holds the checkpoint files and produces the deliverable;
        # the other ranks' training work is already inside those weights
        # (every update was a collective over the global mesh), so they
        # only report where rank 0's artifact lives.
        if c.get("average", True) and saved:
            output_model = self.outputdir / "averaged.npz"
            if self.is_main:
                log.info("Averaging best models ...")
                avg_p, avg_s, avg_cfg, _ = average_checkpoints(
                    [p for _, p in saved])
                save_checkpoint(output_model, avg_p, avg_s, avg_cfg,
                                extra={"averaged_from":
                                       [str(p) for _, p in saved],
                                       "run_config": self.run_config})
                # score the deliverable on the SAME metric the run optimized
                # (plain host arrays -> a process-local computation, safe to
                # run on rank 0 alone)
                final_score = self._validate(eval_step, avg_p, avg_s,
                                             test_loader, "avg",
                                             metric=score_name)
                log.info(f"Averaged model {score_name}: {final_score:.4f}")
        elif saved:
            output_model = saved[0][1]
        else:
            output_model = self.outputdir / "final.npz"
            if self.is_main:
                final_params = (find_ema_params(opt_state)
                                if ema_decay is not None else None)
                save_checkpoint(output_model,
                                params if final_params is None
                                else final_params,
                                state, cfg,
                                extra={"step": step_count,
                                       "run_config": self.run_config})
        log.info(f"Results can be found at {self.outputdir}")
        log.info(f"Final model is at {output_model}")
        log.removeHandler(self._file_handler)
        return output_model

    def _validate(self, eval_step, params, state, test_loader, epoch,
                  metric: str = "mAP") -> float:
        import jax.numpy as jnp

        # Length-bucketed padding (same rule as Evaluator(bucket_seconds=...)):
        # each batch right-pads to the next multiple of `valid_bucket_seconds`
        # so a mixed-length eval set compiles a bounded number of XLA
        # programs instead of one per distinct batch-max length. Default 1 s
        # (the training corpus unit); set to null/None for exact batch-max
        # padding (bit parity with the reference collate).
        bucket_seconds = self.config.get("valid_bucket_seconds", 1.0)
        sr = self.config.get("sample_rate", 16000)
        preds, targets = [], []
        for batch in test_loader:
            wav = batch["wav"]
            if bucket_seconds:
                step_len = int(bucket_seconds * sr)
                target_len = -(-wav.shape[-1] // step_len) * step_len
                wav = np.pad(wav, ((0, 0), (0, target_len - wav.shape[-1])))
            preds.append(np.asarray(eval_step(params, state, jnp.asarray(wav))))
            targets.append(batch["target"])
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)
        names = [metric]
        if "mAP" not in names:
            names.append("mAP")  # always report mAP alongside
        if preds.shape[1] > 527:
            names += ["mAPAudioset", "mAPKWS"]
        m = compute_metrics(names, preds, targets)
        log.info(
            f"Validation Results - Epoch : {epoch:<4} "
            + " ".join(f"{k} {v:<5.4f}" for k, v in m.items())
        )
        return float(m[metric])


def train_from_config(config: dict) -> Path:
    """Build a Trainer and run it; honors ``auto_resume: N`` — on a crash
    (anything but KeyboardInterrupt) the run restarts up to N times from
    the lossless ``last.npz`` snapshot in the SAME output directory,
    losing at most one epoch of work. The reference cannot do this at
    all (it keeps only best-k weights, no optimizer state — run.py:
    338-349); here resume restores params + BN state + optimizer moments
    + step/best-k/patience counters (ckpt/io.save_training_state).

    ``multihost: true`` (TPU pod — topology autodetected) or
    ``multihost: {coordinator_address, num_processes, process_id}``
    initializes the distributed runtime BEFORE the Trainer touches the
    backend; every host then runs this same function and the train step
    compiles once over the global device mesh (per-host data loading,
    rank-0 checkpointing — see Trainer).
    """
    if config.get("multihost"):
        from ..parallel.multihost import initialize_from_config

        initialize_from_config(config["multihost"])
        import jax

        if jax.process_count() > 1 and config.get("auto_resume"):
            raise ValueError(
                "auto_resume is single-host (a per-process retry would "
                "desynchronize the collective program across ranks); use a "
                "COORDINATED whole-pod restarter that relaunches ALL hosts "
                "with resume: auto — tools/launch_multihost.py "
                "--auto-resume N does exactly this locally")
    retries = int(config.get("auto_resume") or 0)
    if not retries:
        return Trainer(config).train()

    config = dict(config)
    trainer = Trainer(config)
    # pin the timestamped outputdir so restarts write (and find last.npz)
    # in the same place instead of opening a fresh run directory
    config["outputdir"] = str(trainer.outputdir)
    for attempt in range(retries + 1):
        try:
            return trainer.train()
        except KeyboardInterrupt:
            raise
        except Exception:
            # the crashed Trainer never reached its removeHandler: detach
            # its file sink or every retry would duplicate log lines (and
            # leak a handle) into the SAME pinned train.log
            log.removeHandler(trainer._file_handler)
            last = Path(config["outputdir"]) / "last.npz"
            if attempt >= retries or not last.exists():
                raise
            log.exception(
                f"training crashed (attempt {attempt + 1}/{retries + 1}); "
                f"auto-resuming from {last}"
            )
            config["resume"] = str(last)
            trainer = Trainer(config)
    raise AssertionError("unreachable")
