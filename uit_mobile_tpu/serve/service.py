"""Batching inference service: the production serving loop.

The reference has no serving layer (its CLI scores one clip per process
invocation). This module turns the model into a high-throughput TPU
service:

- callers submit waveforms of any length up to ``max_seconds`` and get a
  Future; a background worker drains the queue, groups requests into
  LENGTH BUCKETS (multiples of one second), right-zero-pads each request
  to its bucket and pads each batch to a FIXED batch size — so the entire
  service runs on a small, closed set of compiled XLA programs (no
  recompiles, ever, after warmup);
- each bucket's forward uses the fused Pallas mel frontend and the
  model's window-folding long-clip path (models/uit.chunk_long_mel);
- dispatch is genuinely asynchronous: the batcher thread only ENQUEUES
  jitted calls (JAX dispatch returns before the device finishes) and a
  separate completion thread blocks on results, so host batching overlaps
  device compute; in-flight batches are bounded by ``max_inflight``
  (backpressure: the batcher blocks when the device falls behind).

Isolation: the service frontend defaults to ``top_db_mode='per_sample'``
so each clip's dB clamp references its OWN max — co-batched unrelated
requests must not couple through torchaudio's batch-global clamp
('torch' mode exists for offline-eval parity and can be selected via
``ServiceConfig.top_db_mode``). Zero-padding a clip to its bucket boundary
still adds trailing silent frames; for strict parity with offline
evaluation (which pads to the batch max, reference dataset.py:183-197)
use bucket_seconds=1 inputs of exactly 1 s.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class ServiceConfig:
    batch_size: int = 256          # slots per 1s-bucket batch
    max_seconds: int = 10          # longest accepted clip
    max_wait_ms: float = 5.0       # batching window before a partial batch runs
    sample_rate: int = 16000
    use_pallas: Optional[bool] = None
    warmup: bool = True            # compile all buckets at startup
    max_inflight: int = 8          # bound on dispatched-but-unresolved batches
    # 'per_sample' (default): each clip clamps against its own max — no
    # cross-request coupling. 'torch': torchaudio's batch-global clamp, for
    # bit-parity with offline evaluation.
    top_db_mode: str = "per_sample"
    # shard each bucket batch over ALL visible devices (pure DP over ICI:
    # batch axis sharded, weights replicated — parallel/mesh.py); bucket
    # batch sizes round up to device-count multiples
    data_parallel: bool = False
    # 'float32' (default) or 'int16': with 'int16', batches cross the
    # host->device link as raw PCM (half the transfer bytes, and the
    # frontend's framing gather moves half the HBM traffic — measured
    # +23% end-to-end on v5e) and every frontend folds the 1/32768 scale
    # in bitwise-exactly. int16 submissions pass through untouched;
    # float32 submissions are re-quantized (exact when the floats came
    # from int16 PCM, i.e. any real wav file).
    dtype: str = "float32"
    # when a bucket has >= scan_batches full batches pending, they run as
    # ONE K-batch lax.scan dispatch (ops.pipeline.make_scanned_forward):
    # per-dispatch overhead is paid once per K batches instead of per
    # batch — the fix for the measured 37% wall-vs-device dispatch gap
    # (PERF_NOTES round 3). Outputs match the per-batch path's to
    # f32 epsilon (~1e-7 — scan changes XLA fusion boundaries).
    # Latency-neutral: a complete batch never waits for company (the
    # batching window only drains requests that are ALREADY queued once
    # one batch is full), so folding engages exactly under backlog;
    # ignored under data_parallel (scan over shard_map is not supported
    # here). 1 disables.
    scan_batches: int = 1

    @classmethod
    def low_latency(cls, **overrides) -> "ServiceConfig":
        """Single-clip-latency preset (the reference's own headline axis:
        3.4 ms/clip on a Snapdragon 865, README.md:15-24): a small batch
        bucket, NO batching window (a lone request dispatches
        immediately instead of waiting max_wait_ms for company), scan
        folding off, int16 transfer. Throughput under sustained load is
        what the default config is for; this preset minimizes the tail
        of sparse traffic — tests/test_serve_http.py pins the p50/p99
        ordering against the windowed default under the same load."""
        base = dict(batch_size=8, max_wait_ms=0.0, scan_batches=1,
                    dtype="int16")
        base.update(overrides)
        return cls(**base)


class TaggingService:
    """Batched async tagging: submit((T,) float32 wav) -> Future[(C,) probs]."""

    def __init__(self, model_cfg, params, state, config: ServiceConfig = ServiceConfig(),
                 calibration=None, _start_worker: bool = True,
                 _forward_fn=None, _fixed_samples: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        assert config.dtype in ("float32", "int16"), config.dtype
        self.cfg = config
        # post-hoc temperature scaling (evaluate.calibration): scalar, a
        # (C,) per-class vector, or a calibration-JSON path. Applied
        # host-side in the completer on the tiny (B, C) prob block — the
        # device program is untouched, so it composes with every serving
        # mode (pallas/artifact/DP/scan) and survives hot reloads (the
        # calibration belongs to the deployment, not the weight version).
        # Scope: this covers /tag; the HTTP layer applies the SAME
        # calibration to /events (serve/http._events) and uit-serve
        # passes it into StreamSessions for /stream/* (streaming._emit,
        # before trigger thresholds) — every serving surface sees
        # calibrated probabilities, as /healthz's `calibrated` implies.
        self.calibration = None
        if calibration is not None:
            import numbers

            from ..evaluate.calibration import load_calibration

            if isinstance(calibration, (str, os.PathLike)):
                calibration = load_calibration(calibration)
            self.calibration = (float(calibration)
                                if isinstance(calibration, numbers.Real)
                                else np.asarray(calibration, np.float64))
        self._np_dtype = np.int16 if config.dtype == "int16" else np.float32
        self._jnp = jnp
        n_dev = len(jax.devices())
        # sealed program injected by from_artifact: no layout/frontend
        # policy to apply, no GSPMD/shard_map repartitioning possible —
        # and no hot reload (the program IS the weights)
        self._sealed_fwd = _forward_fn
        self._model_cfg = model_cfg
        self._dp = (config.data_parallel and n_dev > 1
                    if _forward_fn is None else False)
        self._batch_multiple = n_dev if self._dp else 1
        # K-batch scanned dispatch for sustained load (see ServiceConfig.
        # scan_batches); ignored under data_parallel
        self._scan_k = config.scan_batches if not self._dp else 1
        self._fwd, self._scanned_fwd = self._build_forwards(params, state)
        self.weights_version = 1
        self._reload_lock = threading.Lock()
        self._q: queue.Queue = queue.Queue()
        # (device_result, chunk) pairs awaiting materialization; bounded ->
        # backpressure on the batcher when the device is saturated
        self._done_q: queue.Queue = queue.Queue(maxsize=max(1, config.max_inflight))
        self._closed = False
        self._close_lock = threading.Lock()
        sr = config.sample_rate
        # bucket lengths: 1..max_seconds seconds; batch size shrinks with
        # length so every bucket does similar work per dispatch
        self._buckets = []
        m = self._batch_multiple
        if _fixed_samples is not None:
            # artifact serving: ONE bucket at the artifact's clip length
            # (its time dim is baked into the exported program)
            self._buckets.append((_fixed_samples, config.batch_size))
        else:
            for s in range(1, config.max_seconds + 1):
                bs = max(1, config.batch_size // s)
                bs = -(-bs // m) * m  # round up to a device-count multiple
                self._buckets.append((s * sr, bs))
        if config.warmup:
            self._warmup(self._fwd, self._scanned_fwd)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._completer = threading.Thread(target=self._complete, daemon=True)
        if _start_worker:
            self._start()

    @classmethod
    def from_artifact(cls, path, config: ServiceConfig = ServiceConfig(),
                      calibration=None):
        """Serve a ``.uitx`` StableHLO artifact (ckpt/artifact.py): the
        deployable unit needs NO model code, params, or config — the
        exported program is the whole model.

        Requirements: the artifact must be batch-polymorphic (the
        ``export_serving`` default) on a whole-second clip length, its
        input dtype must match ``config.dtype``, and the current jax
        platform must be one it was exported for. One length bucket (the
        artifact's clip length); shorter clips right-zero-pad to it.
        ``data_parallel``/``scan_batches`` are rejected — the artifact is
        a sealed single-device program.
        """
        import dataclasses

        from ..ckpt.artifact import load_artifact

        fn, meta = load_artifact(path)
        shape = meta["input_shape"]
        if shape[0] != "b":
            raise ValueError(
                f"artifact has fixed batch {shape[0]} — serving needs a "
                f"batch-polymorphic export (export_serving batch_size=None)"
            )
        n_samples = int(shape[1])
        sr = config.sample_rate
        if n_samples % sr:
            raise ValueError(
                f"artifact clip length {n_samples} is not a whole second "
                f"at {sr} Hz — bucket padding cannot target it"
            )
        want = "int16" if config.dtype == "int16" else "float32"
        if meta["input_dtype"] != want:
            raise ValueError(
                f"artifact input dtype {meta['input_dtype']} != service "
                f"dtype {config.dtype}"
            )
        if config.data_parallel:
            raise ValueError("data_parallel is unavailable for artifact "
                             "serving (sealed single-device program)")
        if config.scan_batches > 1:
            raise ValueError("scan_batches is unavailable for artifact "
                             "serving (the artifact is the whole program)")
        config = dataclasses.replace(
            config, max_seconds=n_samples // sr, use_pallas=False)
        service = cls(None, None, None, config, calibration=calibration,
                      _forward_fn=fn, _fixed_samples=n_samples)
        service.artifact_meta = meta
        return service

    def _build_forwards(self, params, state):
        """(jitted per-batch fwd, jitted K-batch scanned fwd | None) under
        the service's layout/precision/DP policy — one construction point
        shared by __init__ and reload()."""
        import jax

        from ..ops.pipeline import make_forward_fn, make_scanned_forward

        config = self.cfg
        if self._sealed_fwd is not None:
            fwd_fn = self._sealed_fwd
        else:
            use_pallas = config.use_pallas
            if use_pallas is None:
                use_pallas = jax.devices()[0].platform == "tpu"
            if self._dp and use_pallas and config.top_db_mode == "torch":
                # the batch-GLOBAL clamp would become per-shard under
                # shard_map; keep exact torch semantics via the XLA frontend
                # (GSPMD inserts the cross-shard max collective)
                use_pallas = False
            # single policy source (ops/pipeline.make_forward_fn): fast
            # precision + tfb layout on TPU, per-request dB-clamp isolation
            fwd_fn = make_forward_fn(
                self._model_cfg, params, state, use_pallas=use_pallas,
                precision="fast" if use_pallas else "exact",
                top_db_mode=config.top_db_mode,
            )
        if self._dp:
            from ..parallel.mesh import data_parallel_forward

            # manual (shard_map) route auto-selected from fwd_fn.uses_pallas
            # — Mosaic kernels cannot be GSPMD-auto-partitioned; safe here
            # because per_sample clamp semantics have no cross-batch term
            return data_parallel_forward(fwd_fn), None
        scanned = None
        if self._scan_k > 1:
            scanned = jax.jit(make_scanned_forward(fwd_fn))
        return jax.jit(fwd_fn), scanned

    def _warmup(self, fwd, scanned_fwd):
        """Compile every bucket program: keep the no-recompiles-after-
        warmup contract (neither the first deep-queue moment nor the
        first post-reload batch may compile mid-traffic)."""
        jnp = self._jnp
        for length, bs in self._buckets:
            fwd(jnp.zeros((bs, length), self._np_dtype))
            if scanned_fwd is not None:
                scanned_fwd(
                    jnp.zeros((self._scan_k, bs, length), self._np_dtype))

    def reload(self, params, state, model_cfg=None) -> int:
        """Hot-swap the model weights with ZERO downtime: build + compile
        the new programs off the hot path (the worker keeps serving the
        old weights throughout — the persistent compilation cache makes
        the rebuild cheap for unchanged shapes), then swap atomically.
        In-flight batches complete on the old weights; each batch is
        scored entirely by one version. model_cfg (optional) must keep
        the service contract (sample rate, output classes) — pass it for
        converted checkpoints whose config object is rebuilt.

        Returns the new weights version (monotonic, starts at 1;
        surfaced in /healthz and POST /reload). Artifact-backed services
        raise — the sealed program IS the weights; restart with a new
        artifact instead."""
        if self._sealed_fwd is not None:
            raise RuntimeError(
                "artifact-backed service cannot hot-reload: the exported "
                "program is the weights — restart with the new artifact")
        with self._reload_lock:
            if model_cfg is not None:
                self._model_cfg = model_cfg
            fwd, scanned = self._build_forwards(params, state)
            self._warmup(fwd, scanned)
            # plain attribute stores are atomic under the GIL; the worker
            # picks the new programs up on its next dispatch
            self._fwd = fwd
            self._scanned_fwd = scanned
            self.weights_version += 1
            return self.weights_version

    def _start(self):
        if not self._worker.is_alive():
            self._worker.start()
            self._completer.start()

    # ------------------------------------------------------------------- API

    def submit(self, wav: np.ndarray) -> Future:
        """Queue a single (T,) waveform; resolves to (C,) probs.

        Accepts normalized float32 or raw int16 PCM; either is converted
        to the service's configured ``dtype`` (round-to-nearest; exact in
        both directions for int16-sourced audio)."""
        from ..frontend import normalize_pcm16, quantize_pcm16

        wav = np.asarray(wav)
        if wav.ndim == 2 and wav.shape[0] == 1:
            wav = wav[0]  # (1, T) from data.read_wav
        if wav.ndim != 1:
            raise ValueError(
                f"submit takes one mono clip shaped (T,) or (1, T); got "
                f"{wav.shape} — downmix or split multichannel audio first "
                f"(a flattened (C, T) would score channel-concatenated "
                f"garbage)"
            )
        if wav.dtype != self._np_dtype:
            wav = (quantize_pcm16(wav) if self._np_dtype == np.int16
                   else normalize_pcm16(wav))
        if wav.shape[0] > self.cfg.max_seconds * self.cfg.sample_rate:
            # a real raise (not assert): under python -O a too-long clip
            # would otherwise kill the worker thread in _bucket_of
            raise ValueError(
                f"clip of {wav.shape[0]} samples exceeds max_seconds="
                f"{self.cfg.max_seconds}"
            )
        fut: Future = Future()
        # the closed-check and enqueue must be atomic against close()'s
        # sentinel put: otherwise a submit preempted between them can land
        # its request BEHIND the final drain and strand the Future forever
        with self._close_lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._q.put((wav, fut))
        return fut

    def infer_many(self, wavs: Sequence[np.ndarray]) -> list[np.ndarray]:
        futs = [self.submit(w) for w in wavs]
        return [f.result() for f in futs]

    def close(self):
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # FIFO: everything submitted before is ahead
        if self._worker.ident is not None:  # never started: nothing to join
            self._worker.join(timeout=60)
        if self._completer.ident is not None:
            self._completer.join(timeout=60)
        if self._worker.is_alive():
            # join timed out but the worker is still draining (e.g. a slow
            # remote compile): the queued pre-close requests are ITS to
            # resolve — cancelling them here would fail legitimately
            # submitted work the worker will still complete
            return
        # worker is gone; anything still queued can never be served —
        # cancel so result() raises instead of hanging forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            _, fut = item
            fut.cancel()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ---------------------------------------------------------------- worker

    def _bucket_of(self, n: int):
        for length, bs in self._buckets:
            if n <= length:
                return length, bs
        raise ValueError(n)

    def _run(self):
        # the completer must ALWAYS get its sentinel — a worker that dies
        # without it leaves _complete (and close()) hanging forever
        try:
            self._run_loop()
        finally:
            self._done_q.put(None)

    def _guarded_dispatch(self, pending, jnp):
        """_dispatch with a last-resort guard: a host-side failure fails
        THESE futures instead of killing the worker thread (which would
        strand every pending and future request)."""
        try:
            self._dispatch(pending, jnp)
        except Exception as e:
            for _, fut in pending:
                if not fut.done():
                    fut.set_exception(e)

    def _run_loop(self):
        import time

        jnp = self._jnp
        shutdown = False
        while not shutdown:
            item = self._q.get()
            if item is None:
                break
            pending = [item]
            # batching window: a hard DEADLINE from the first request, not a
            # per-arrival idle timeout (a steady trickle must not postpone
            # dispatch indefinitely). The deadline governs only the FIRST
            # batch_size requests; beyond one full batch the loop drains
            # without blocking (scanned dispatch folds additional batches
            # only when they are ALREADY queued — a complete batch never
            # waits on the window for company).
            limit = self.cfg.batch_size * max(1, self._scan_k)
            deadline = time.monotonic() + self.cfg.max_wait_ms / 1e3
            while len(pending) < limit:
                if len(pending) < self.cfg.batch_size:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=remaining)
                    except queue.Empty:
                        break
                else:  # full batch in hand: take only what is already there
                    try:
                        nxt = self._q.get_nowait()
                    except queue.Empty:
                        break
                if nxt is None:
                    shutdown = True
                    break
                pending.append(nxt)
            self._guarded_dispatch(pending, jnp)
        # sentinel received: drain requests that were already queued behind
        # it (submitted concurrently with close()) so their Futures resolve
        leftovers = []
        while True:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is not None:
                leftovers.append(nxt)
        if leftovers:
            self._guarded_dispatch(leftovers, jnp)

    def _dispatch(self, pending, jnp):
        """Group into buckets and ENQUEUE device work; never blocks on
        results (only on the in-flight bound)."""
        groups: dict[tuple[int, int], list] = {}
        for wav, fut in pending:
            try:
                key = self._bucket_of(wav.shape[0])
            except Exception as e:
                # fail THIS request, not the worker thread (submit()
                # validates length, but never let one bad item take down
                # the whole service)
                if not fut.done():
                    fut.set_exception(e)
                continue
            groups.setdefault(key, []).append((wav, fut))
        for (length, bs), items in groups.items():
            i = 0
            K = self._scan_k
            # sustained load: fold K full batches into one scanned dispatch
            while K > 1 and len(items) - i >= K * bs:
                chunk = items[i: i + K * bs]
                i += K * bs
                block = np.zeros((K, bs, length), dtype=self._np_dtype)
                for j, (wav, _) in enumerate(chunk):
                    block[j // bs, j % bs, : wav.shape[0]] = wav
                try:
                    dev = self._scanned_fwd(jnp.asarray(block))  # (K, bs, C)
                except Exception as e:  # pragma: no cover
                    for _, fut in chunk:
                        if not fut.done():
                            fut.set_exception(e)
                    continue
                self._done_q.put((dev, chunk))
            for i in range(i, len(items), bs):
                chunk = items[i: i + bs]
                batch = np.zeros((bs, length), dtype=self._np_dtype)
                for j, (wav, _) in enumerate(chunk):
                    batch[j, : wav.shape[0]] = wav
                try:
                    dev = self._fwd(jnp.asarray(batch))  # async dispatch
                except Exception as e:  # pragma: no cover
                    for _, fut in chunk:
                        if not fut.done():
                            fut.set_exception(e)
                    continue
                self._done_q.put((dev, chunk))

    def _complete(self):
        """Materialize device results in dispatch order and resolve Futures."""
        while True:
            item = self._done_q.get()
            if item is None:
                return
            dev, chunk = item
            try:
                probs = np.asarray(dev)
                # scanned dispatches deliver (K, bs, C); flatten so the
                # chunk's j-th request reads row j either way
                probs = probs.reshape(-1, probs.shape[-1])
                if self.calibration is not None:
                    from ..evaluate.calibration import apply_temperature

                    probs = apply_temperature(probs, self.calibration)
                for j, (_, fut) in enumerate(chunk):
                    if not fut.done():
                        fut.set_result(probs[j])
            except Exception as e:  # pragma: no cover
                for _, fut in chunk:
                    if not fut.done():
                        fut.set_exception(e)
