"""Jitted training/eval steps.

The reference's per-iteration closure (run.py:191-234: teacher forward,
PSL target overwrite, concat AudioSet+KWS halves, mixup, BCE, backward,
clip, step) becomes ONE pure jitted function over (params, state,
opt_state, batch, rng) — teacher and student forwards, the loss, the
backward pass and the optimizer update all fuse into a single XLA program.

Data parallelism: jit with NamedSharding'd inputs (batch over 'data',
everything else replicated) — XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import models
from ..augment.mixup import mixup_targets, sample_mixup_lambdas


@dataclasses.dataclass
class TrainState:
    params: Any
    state: Any  # BatchNorm statistics
    opt_state: Any
    step: int = 0


def bce_loss(probs: jax.Array, targets: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Binary cross-entropy on probabilities (the reference trains on
    sigmoid outputs with nn.BCELoss, run.py:157-158 + uit.py:401)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def _norm(w: jax.Array) -> jax.Array:
    """Device-side PCM normalization: loaders may ship raw int16 (half the
    host->device bytes); 1/32768 is a power of two, so this is exact and
    the downstream augments/teacher see the usual f32 convention."""
    return w.astype(jnp.float32) * (1.0 / 32768.0) if w.dtype == jnp.int16 else w


def _step_wav(w: jax.Array, wav_augment) -> jax.Array:
    """The step's wav-dtype policy: with NO wav augment, int16 PCM rides
    RAW into the forwards — every frontend folds the 1/32768 scale into
    its DFT matrices bitwise-exactly (ops/pallas_mel.py:231-236,
    frontend/mel.py), so the framing gather materializes 2-byte frames
    (half the HBM traffic of the f32 convention) and scanned multi-step
    input blocks halve too. Wav augments (reference uit.py:453-454 puts
    them inside the student's train forward) assume normalized f32, so
    any configured wav_augment restores the f32 convention here."""
    if wav_augment is None and w.dtype == jnp.int16:
        return w
    return _norm(w)


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"unknown reduction {reduction!r} (use 'mean' or 'sum')")


def _make_bce(weight=None, reduction: str = "mean", eps: float = 1e-7):
    """torch.nn.BCELoss semantics on probabilities: optional per-class
    ``weight`` multiplies each element's loss before reduction."""
    w = None if weight is None else jnp.asarray(weight, jnp.float32)

    def loss(probs, targets):
        p = jnp.clip(probs, eps, 1.0 - eps)
        elt = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))
        if w is not None:
            elt = elt * w
        return _reduce(elt, reduction)

    return loss


def _make_ce(weight=None, reduction: str = "mean", label_smoothing: float = 0.0,
             eps: float = 1e-7):
    """Cross-entropy over the model's PROBABILITY outputs: log-probs are
    renormalized with logsumexp (the models emit independent sigmoids, not
    a softmax), targets may be soft/multi-hot (normalized to sum 1).
    ``weight`` is torch's per-class weighting; ``label_smoothing`` mixes
    the target with the uniform distribution."""
    w = None if weight is None else jnp.asarray(weight, jnp.float32)

    def loss(probs, targets):
        C = probs.shape[-1]
        logp = jnp.log(jnp.clip(probs, eps, 1.0))
        logp = logp - jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
        t = targets / jnp.maximum(targets.sum(-1, keepdims=True), eps)
        ww = w if w is not None else jnp.ones((C,), jnp.float32)
        # torch's weighted-mean denominator is sum_n w[y_n] — the UNsmoothed
        # target mass (one-hot rows reproduce it exactly; label_smoothing
        # must not leak into the denominator). Genuinely-soft targets use
        # the same weighted-mass rule (documented deviation: torch's
        # prob-format CE divides by N and ignores weight in the denom).
        denom = jnp.maximum((t * ww).sum(), eps)
        if label_smoothing > 0.0:
            t = (1.0 - label_smoothing) * t + label_smoothing / C
        per_sample = -(t * ww * logp).sum(-1)
        if reduction == "mean":
            return per_sample.sum() / denom
        return _reduce(per_sample, reduction)

    return loss


def _make_focal(gamma: float = 2.0, alpha: Optional[float] = None,
                reduction: str = "mean", eps: float = 1e-7):
    """Binary focal loss on probabilities (Lin et al. 2017): BCE modulated
    by (1-p_t)^gamma, with optional class-balance factor alpha."""

    def loss(probs, targets):
        p = jnp.clip(probs, eps, 1.0 - eps)
        pos = -targets * ((1.0 - p) ** gamma) * jnp.log(p)
        neg = -(1.0 - targets) * (p ** gamma) * jnp.log1p(-p)
        if alpha is not None:
            pos = alpha * pos
            neg = (1.0 - alpha) * neg
        return _reduce(pos + neg, reduction)

    return loss


# name -> factory(**loss_args) -> fn(probs, targets). The reference resolves
# any torch.nn loss by name and forwards `loss_args` (run.py:157-158); only
# probability-input losses make sense here (the models output sigmoids,
# uit.py:401) — BCEWithLogitsLoss intentionally has no entry.
LOSS_FACTORIES = {
    "BCELoss": _make_bce,
    "CrossEntropyLoss": _make_ce,
    "FocalLoss": _make_focal,
}

# plain name -> default-arg loss fn (back-compat)
LOSSES = {name: factory() for name, factory in LOSS_FACTORIES.items()}


def make_loss(name: str, **loss_args):
    """Resolve config ``loss:`` + ``loss_args:`` into a (probs, targets)
    scalar loss (reference run.py:157-158 semantics with an explicit
    registry instead of torch.nn reflection)."""
    if name not in LOSS_FACTORIES:
        raise KeyError(
            f"unknown loss {name!r}; known: {sorted(LOSS_FACTORIES)} "
            "(losses operate on the models' probability outputs)"
        )
    return LOSS_FACTORIES[name](**loss_args)


def make_train_step(
    model_cfg,
    optimizer: optax.GradientTransformation,
    *,
    loss_name: str = "BCELoss",
    loss_args: Optional[dict] = None,
    mixup_alpha: Optional[float] = None,
    max_grad_norm: Optional[float] = None,
    psl_cfg=None,
    distill_mode: str = "psl",
    distill_alpha: float = 1.0,
    distill_classes: int = 527,
    psl_split: Optional[int] = None,
    wav_augment: Optional[Callable] = None,
    spec_augment: Optional[Callable] = None,
    frontend_fn: Optional[Callable] = None,
    psl_frontend_fn: Optional[Callable] = None,
) -> Callable:
    """Build the fused train step.

    Without PSL the batch is ``{'wav': (B,T), 'target': (B,C)}``. With PSL
    (reference _train_with_psl, run.py:191-218) it is
    ``{'audioset': {'wav','target'}, 'kws': {'wav','target'}}``: the frozen
    MobileNetV2 teacher scores the AudioSet half, its probabilities replace
    the first 527 target columns, and both halves train jointly.

    Preassembled PSL fast path: with ``psl_split=<audioset rows>`` the step
    ALSO accepts a flat ``{'wav': (B,T), 'target': (B,C)}`` batch whose
    rows are stacked [audioset, kws] host-side (Trainer does this). The
    teacher reads ``wav[:psl_split]`` as a slice and its probabilities land
    via dynamic_update_slice — no on-device wav/target concatenates, one
    normalization pass. Identical math to the dict path (pinned in
    tests/test_distill.py); measured +23%/step at B=512 on the v5e
    (tools/probe_preassembled.py).

    Distillation variants (beyond the reference, which has PSL only):
    - distill_mode='psl' (default, reference semantics): the teacher
      scores ONLY the AudioSet half and overwrites its first
      ``distill_classes`` target columns (run.py:199-202).
    - distill_mode='soft' (knowledge distillation / self-distillation):
      the teacher — any registered model family with the student's
      outputdim, e.g. a trained UiT for self-distillation — scores the
      FULL concatenated batch, and the target becomes
      ``alpha*teacher + (1-alpha)*ground_truth`` over all classes.
    """
    assert distill_mode in ("psl", "soft"), distill_mode
    from ..models import MoEUITConfig

    # The teacher consumes the reference 'bft' mel orientation; when the
    # STUDENT trains in the transpose-free 'tfb' layout (PERF_NOTES round
    # 4) the shared frontend would hand the teacher a (T, F, B) mel it
    # misreads — demand an explicit teacher frontend instead of guessing.
    if (psl_cfg is not None and psl_frontend_fn is None
            and getattr(model_cfg, "mel_layout", "bft") == "tfb"):
        raise ValueError(
            "mel_layout='tfb' training with a PSL teacher needs "
            "psl_frontend_fn= (the teacher reads 'bft' mel; build one "
            "with make_frontend_fn(psl_cfg.frontend, layout='bft'))"
        )

    if isinstance(model_cfg, MoEUITConfig):
        raise TypeError(
            "the MoE variant trains through its own step (router aux loss, "
            "no train-mode augment path): build it with "
            "parallel.make_moe_train_step and jit with ep_shard_params / "
            "sharded_opt_init shardings for expert parallelism"
        )
    loss_fn_inner = make_loss(loss_name, **(loss_args or {}))

    def train_step(params, state, opt_state, batch, rng,
                   psl_params=None, psl_state=None):
        rng_mix, rng_fwd = jax.random.split(rng)

        if psl_cfg is not None:
            if "wav" in batch:
                # flat fast path: halves pre-stacked [audioset, kws]
                wav = _step_wav(batch["wav"], wav_augment)
                target = batch["target"]
                n_as = psl_split
                if distill_mode == "psl" and not (
                        n_as is not None and 0 < n_as <= wav.shape[0]):
                    raise ValueError(
                        "flat PSL batches need make_train_step(..., "
                        "psl_split=<audioset rows at the front of the "
                        f"batch>) in (0, {wav.shape[0]}], got {n_as}"
                    )
            else:
                # dict compatibility path: concatenate on device, then the
                # same math as the flat path. int16 passthrough only when
                # BOTH halves are int16 — a mixed concat would silently
                # type-promote raw PCM without the 1/32768 scale.
                as_w = batch["audioset"]["wav"]
                kws_w = batch["kws"]["wav"]
                if (wav_augment is None and as_w.dtype == jnp.int16
                        and kws_w.dtype == jnp.int16):
                    wav = jnp.concatenate([as_w, kws_w], axis=0)
                else:
                    wav = jnp.concatenate([_norm(as_w), _norm(kws_w)],
                                          axis=0)
                target = jnp.concatenate(
                    [batch["audioset"]["target"], batch["kws"]["target"]],
                    axis=0)
                n_as = batch["audioset"]["wav"].shape[0]
            # The teacher scores the RAW (unaugmented) waveform ON PURPOSE:
            # in the reference, wavtransforms live inside the STUDENT's
            # train-mode forward (reference uit.py:453-454) while the
            # eval-mode teacher scores the pre-augment as_x
            # (run.py:199-202) — "fixing" this would break parity.
            t_in = wav[:n_as] if distill_mode == "psl" else wav
            y_teacher = jax.lax.stop_gradient(
                models.apply(psl_cfg, psl_params, psl_state, t_in,
                             frontend_fn=psl_frontend_fn or frontend_fn)
            )
            if distill_mode == "psl":
                # overwrite the audioset rows' first distill_classes target
                # columns with the teacher's probabilities (run.py:199-202)
                target = jax.lax.dynamic_update_slice(
                    target, y_teacher[:, :distill_classes], (0, 0)
                )
            else:  # 'soft': teacher scores everything, convex target mix
                target = (distill_alpha * y_teacher
                          + (1.0 - distill_alpha) * target)
        else:
            wav = _step_wav(batch["wav"], wav_augment)
            target = batch["target"]

        mixup_lamb = None
        if mixup_alpha is not None and mixup_alpha > 0.0:
            mixup_lamb = sample_mixup_lambdas(rng_mix, wav.shape[0], mixup_alpha)
            target = mixup_targets(target, mixup_lamb)

        def loss_of(p):
            probs, new_state = models.apply(
                model_cfg, p, state, wav, train=True, rng=rng_fwd,
                mixup_lamb=mixup_lamb, wav_augment=wav_augment,
                spec_augment=spec_augment, frontend_fn=frontend_fn,
            )
            return loss_fn_inner(probs, target), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        # report the PRE-clip norm (torch clip_grad_norm_ semantics):
        # post-clip it saturates at max_grad_norm and hides spikes
        gnorm = optax.global_norm(grads)
        if max_grad_norm is not None:
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"total_loss": loss, "grad_norm": gnorm}
        return new_params, new_state, new_opt_state, metrics

    return train_step


def make_framewise_train_step(
    model_cfg,
    optimizer: optax.GradientTransformation,
    *,
    loss_name: str = "BCELoss",
    loss_args: Optional[dict] = None,
    max_grad_norm: Optional[float] = None,
    wav_augment: Optional[Callable] = None,
    spec_augment: Optional[Callable] = None,
    frontend_fn: Optional[Callable] = None,
) -> Callable:
    """SED train step: batch = {'wav': (B,T), 'target': (B, S, C)} with
    per-time-segment strong-label targets (data.StrongFramewiseHDF5Dataset)
    supervising models.uit.forward_train_framewise's (B, tg, C) output.
    Same fused structure as make_train_step (forward, loss, backward, clip,
    optimizer update in one XLA program); no PSL/mixup — neither has
    per-segment target semantics."""
    from ..models import uit as uit_mod

    loss_fn_inner = make_loss(loss_name, **(loss_args or {}))

    def train_step(params, state, opt_state, batch, rng):
        wav, target = _step_wav(batch["wav"], wav_augment), batch["target"]

        def loss_of(p):
            probs, new_state = uit_mod.forward_train_framewise(
                model_cfg, p, state, wav, rng=rng,
                wav_augment=wav_augment, spec_augment=spec_augment,
                frontend_fn=frontend_fn,
            )
            assert probs.shape == target.shape, (probs.shape, target.shape)
            return loss_fn_inner(probs, target), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        if max_grad_norm is not None:
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, {
            "total_loss": loss, "grad_norm": gnorm,
        }

    return train_step


def make_multi_step(train_step: Callable, psl: bool = False) -> Callable:
    """K train steps in ONE jittable program (`lax.scan` with the
    (params, state, opt_state) triple as carry) — the training-side
    analogue of ops.pipeline.make_scanned_forward: per-dispatch overhead
    is paid once per K optimizer updates instead of per step.

    batches: the usual batch pytree with a leading (K, ...) axis on every
    leaf; rngs: (K,)-split keys. Returns (params, state, opt_state,
    metrics) with each metric stacked over the K steps. Semantics are
    EXACTLY K sequential `train_step` calls (scan is pure sequencing;
    tests/test_train_loop.py pins the equivalence).

    Trade-off: metrics surface only after all K steps, so per-step
    logging granularity coarsens to K — pick K to taste (uit-bench
    --train --scan measures the throughput side).
    """

    def multi(params, state, opt_state, batches, rngs,
              psl_params=None, psl_state=None):
        def body(carry, x):
            p, s, o = carry
            b, k = x
            if psl:
                p, s, o, m = train_step(p, s, o, b, k, psl_params, psl_state)
            else:
                p, s, o, m = train_step(p, s, o, b, k)
            return (p, s, o), m

        (params, state, opt_state), metrics = jax.lax.scan(
            body, (params, state, opt_state), (batches, rngs)
        )
        return params, state, opt_state, metrics

    return multi


def make_eval_step(model_cfg, frontend_fn: Optional[Callable] = None) -> Callable:
    """(params, state, wav) -> probs, eval mode (crop-chunking engaged)."""

    def eval_step(params, state, wav):
        return models.apply(model_cfg, params, state, wav, frontend_fn=frontend_fn)

    return eval_step


class EmaState(NamedTuple):
    """Optimizer-state slot for the parameter EMA (see params_ema)."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the PARAMETERS inside the
    optimizer state: ``ema <- decay*ema + (1-decay)*new_params`` after
    every applied update (initialized at the initial params, so no
    zero-debias is needed).

    Chain it AFTER the optimizer — ``optax.chain(base, params_ema(d))``
    — so it sees the final updates; under ``optax.MultiSteps`` wrap the
    whole chain so the EMA advances once per APPLIED update, not per
    accumulation micro-step. Riding in opt_state means the lossless
    resume path (ckpt.io.save_training_state) and the scanned multi-step
    carry it for free. Read it back with ``find_ema_params(opt_state)``.

    The reference has nothing comparable (its smoothing is post-hoc
    best-k checkpoint averaging, utils.py:335-369 — which this framework
    also ships); EMA is the standard production complement: a smoothed
    deliverable at every step, not only at end of training.
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init(params):
        # a REAL copy, not jnp.asarray: aliasing the live param buffers
        # would make donated train steps hand XLA the same buffer twice
        return EmaState(ema=jax.tree.map(
            lambda p: jnp.array(p, copy=True), params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError(
                "params_ema needs the params argument — chain it after an "
                "optimizer and call update(grads, state, params)")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state.ema, new_p)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def find_ema_params(opt_state):
    """The EMA params pytree buried in a (chained / MultiSteps-wrapped)
    optimizer state, or None when no params_ema is in the chain."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):  # chain states + NamedTuple fields
        for child in opt_state:
            got = find_ema_params(child)
            if got is not None:
                return got
    return None


def wrap_optimizer(optimizer: optax.GradientTransformation, *,
                   ema_decay: Optional[float] = None,
                   grad_accum: int = 1) -> optax.GradientTransformation:
    """Apply the config-level optimizer wrappers shared by all three
    training loops: parameter EMA (``ema_decay``) and gradient
    accumulation (``grad_accum`` micro-batches per applied update, via
    optax.MultiSteps — mean of the micro-gradients, so K micro-batches
    land the same update one K-fold batch would at 1/K the peak memory).
    Order: MultiSteps wraps (optimizer + ema) so the EMA and the LR
    schedule advance once per APPLIED update."""
    if ema_decay is not None:
        optimizer = optax.chain(optimizer, params_ema(float(ema_decay)))
    if grad_accum > 1:
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=grad_accum)
    return optimizer


OPTIMIZERS = {
    "Adam": lambda lr=1e-3, **kw: optax.adam(lr, **kw),
    "AdamW": lambda lr=1e-3, weight_decay=1e-2, **kw: optax.adamw(
        lr, weight_decay=weight_decay, **kw
    ),
    "SGD": lambda lr=1e-3, momentum=0.0, **kw: optax.sgd(lr, momentum=momentum, **kw),
    # The reference optionally uses bitsandbytes Adam8bit (run.py:148-152);
    # on TPU the analogous memory saver is Adafactor. kwargs forward so an
    # unknown option fails LOUDLY instead of silently training without it.
    "Adam8bit": lambda lr=1e-3, **kw: optax.adafactor(lr, **kw),
    "Adafactor": lambda lr=1e-3, **kw: optax.adafactor(lr, **kw),
}


def build_optimizer(name: str, schedule_or_lr, **kwargs) -> optax.GradientTransformation:
    if name not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name!r}; known: {sorted(OPTIMIZERS)}")
    if name == "Adam8bit":
        # a DIFFERENT update rule, not a quantized Adam — configs written
        # for the reference will converge differently; say so loudly
        from ..utils import get_logger

        get_logger().warning(
            "optimizer 'Adam8bit' (bitsandbytes) has no TPU analogue; "
            "substituting optax.adafactor — a different update rule with "
            "different convergence behavior. Use 'Adam'/'AdamW' for "
            "faithful reference dynamics, or 'Adafactor' to make this "
            "choice explicit."
        )
    kwargs = dict(kwargs)
    kwargs.pop("lr", None)
    return OPTIMIZERS[name](lr=schedule_or_lr, **kwargs)
