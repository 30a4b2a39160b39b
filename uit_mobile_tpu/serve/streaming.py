"""Real-time sliding-window tagging over continuous audio streams.

The UiT models have a 1-second receptive window by design (reference
README "model delay: 1s") — always-on deployment means re-scoring a
sliding window every hop. This module does that the TPU way: S independent
streams share one fixed-shape batched forward (S, window) compiled once;
per-stream ring buffers advance by `hop_seconds` and all due windows score
in a single dispatch.

Events: every scored window yields (stream, t_end_seconds, probs); keyword
triggers (prob >= threshold, default the GSC operating point 0.2) fire
with a refractory period so one utterance doesn't spam events.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    window_seconds: float = 1.0
    hop_seconds: float = 0.25
    sample_rate: int = 16000
    threshold: float = 0.2          # keyword trigger threshold (GSC point)
    refractory_seconds: float = 1.0  # min gap between triggers per keyword
    n_audioset: int = 527
    use_pallas: Optional[bool] = None
    # 'per_sample' (default): each stream's window clamps against its own
    # max, so co-batched streams never couple through the dB clamp;
    # 'torch' replicates torchaudio's batch-global clamp (offline parity).
    top_db_mode: str = "per_sample"
    # ring-buffer / device-transfer dtype. 'int16' halves the host->device
    # bytes per hop (the frontend folds 1/32768 into the DFT matrices, so
    # scores are bitwise the f32 path's). Lossless whenever the audio
    # source is 16-bit PCM (raw int16 chunks, or floats k/32768 decoded
    # from 16-bit wavs — quantize_pcm16 recovers k exactly); other float
    # sources are quantized to the nearest PCM step.
    dtype: str = "float32"


@dataclasses.dataclass
class Event:
    stream: int
    time: float            # stream time at window end, seconds
    probs: np.ndarray      # (outputdim,)
    triggers: list         # [(class_index, prob), ...] newly fired keywords


class MultiStreamTagger:
    """S always-on streams -> batched fixed-shape scoring."""

    def __init__(self, model_cfg, params, state, n_streams: int = 1,
                 config: StreamingConfig = StreamingConfig(),
                 calibration=None):
        import jax
        import jax.numpy as jnp

        from ..ops.pipeline import make_forward_fn

        self.cfg = config
        self.n_streams = n_streams
        # deployment-level temperature scaling (evaluate.calibration):
        # applied in _emit BEFORE keyword-trigger thresholds and before
        # detectors see the probs, so thresholds tuned on calibrated
        # outputs stay comparable across /tag, /events and streaming.
        # Same host-side placement as TaggingService (tiny (S, C) block;
        # device program untouched). Scalar, (C,) vector, or a
        # calibration-JSON path.
        self.calibration = None
        if calibration is not None:
            import numbers
            import os

            from ..evaluate.calibration import load_calibration

            if isinstance(calibration, (str, os.PathLike)):
                calibration = load_calibration(calibration)
            self.calibration = (float(calibration)
                                if isinstance(calibration, numbers.Real)
                                else np.asarray(calibration, np.float64))
        self._jnp = jnp
        sr = config.sample_rate
        self._win = int(config.window_seconds * sr)
        self._hop = int(config.hop_seconds * sr)
        use_pallas = config.use_pallas
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        # single policy source (ops/pipeline.make_forward_fn): fast + tfb
        # on TPU, per-stream dB-clamp isolation
        assert config.dtype in ("float32", "int16"), config.dtype
        self._fwd = jax.jit(make_forward_fn(
            model_cfg, params, state, use_pallas=use_pallas,
            precision="fast" if use_pallas else "exact",
            top_db_mode=config.top_db_mode,
        ))
        self._np_dtype = np.int16 if config.dtype == "int16" else np.float32
        self._buf = np.zeros((n_streams, self._win), dtype=self._np_dtype)
        self._filled = np.zeros(n_streams, dtype=np.int64)   # samples seen
        self._since_hop = np.zeros(n_streams, dtype=np.int64)
        self._last_trigger: dict[tuple[int, int], float] = {}
        # device-resident ring buffer for the steady-state feed_all loop:
        # only the NEW hop chunk crosses the host->device link per step
        # (window/hop x fewer transfer bytes — 4x at the defaults); the
        # host mirror stays authoritative for feed() interop. Invalidated
        # (-> one full re-upload) whenever feed() touches a single stream.
        self._dev_buf = None
        self._dev_step = None  # jitted (buf, chunk) -> (new_buf, probs)
        self._dev_update = None  # jitted (buf, chunk) -> new_buf (warmup)
        # in the steady-state device loop the host mirror is NOT shifted
        # per hop (that memmove measured ~10 ms/step at S=2048); it goes
        # stale and is rebuilt from the device ring only when feed() or a
        # mixed cadence actually needs it. Invariant: _dev_buf is None =>
        # _host_stale is False (every path clearing the ring syncs first).
        self._host_stale = False

    def _to_buf_dtype(self, chunk: np.ndarray) -> np.ndarray:
        """Incoming audio (normalized f32 or raw int16 PCM) -> the ring
        buffer's dtype, via THE conversion pair (frontend.mel): a bare
        cast in either direction would be 32768x off."""
        chunk = np.asarray(chunk)
        if chunk.dtype == self._np_dtype:
            return chunk
        from ..frontend import normalize_pcm16, quantize_pcm16

        if self._np_dtype == np.int16:
            return np.asarray(quantize_pcm16(chunk))
        return normalize_pcm16(chunk)

    def feed(self, stream: int, chunk: np.ndarray) -> list[Event]:
        """Append audio to one stream; returns events for every window that
        became due (one per elapsed hop). Accepts normalized float32 or raw
        int16 PCM (converted to the configured buffer dtype)."""
        chunk = self._to_buf_dtype(np.asarray(chunk).reshape(-1))
        self._sync_host()
        self._dev_buf = None  # host buffer diverges from the device ring
        events = []
        pos = 0
        while pos < chunk.shape[0]:
            # fill until the next hop boundary
            need = self._hop - self._since_hop[stream]
            take = min(need, chunk.shape[0] - pos)
            piece = chunk[pos: pos + take]
            self._push(stream, piece)
            self._since_hop[stream] += take
            pos += take
            if self._since_hop[stream] >= self._hop:
                self._since_hop[stream] = 0
                if self._filled[stream] >= self._win:
                    events.extend(self._score([stream]))
        return events

    def feed_all(self, chunks: np.ndarray) -> list[Event]:
        """chunks (S, hop) — advance every stream one hop and score the due
        ones in ONE batched dispatch (the steady-state service loop).
        Accepts normalized float32 or raw int16 PCM rows.

        TPU-native steady state: the ring buffer LIVES ON THE DEVICE and
        one jitted program shifts it, appends the chunk, and scores the
        windows — per step only the (S, hop) chunk crosses the link
        (window/hop x fewer bytes than re-sending full windows; the host
        mirror advances in lockstep for feed() interop and stays ~100x
        faster than the per-stream loop it replaced)."""
        jnp = self._jnp
        assert chunks.shape == (self.n_streams, self._hop), chunks.shape
        chunks = self._to_buf_dtype(chunks)
        n = self._hop
        self._filled += n
        # feed_all always advances exactly one hop and scores at its end:
        # any residual from a partial (non-hop-aligned) feed() is absorbed
        # into this hop, so later feed() boundaries stay hop-aligned
        # instead of drifting by the leftover samples
        self._since_hop[:] = 0
        due = np.flatnonzero(self._filled >= self._win).tolist()

        if n >= self._win or len(due) not in (0, self.n_streams):
            # degenerate hop or mixed feed()/feed_all cadence: host path
            self._sync_host()
            self._dev_buf = None
            self._host_advance(chunks)
            return self._score(due) if due else []

        if self._dev_buf is None:
            # (re)seed: advance the (authoritative, see invariant) host
            # buffer, upload it once and score it directly this step;
            # subsequent steps ship only the chunk
            import jax

            self._host_advance(chunks)
            if self._dev_step is None:
                def _advance(buf, chunk):
                    return jnp.concatenate([buf[:, n:], chunk], axis=1)

                self._dev_update = jax.jit(_advance, donate_argnums=0)
                self._dev_step = jax.jit(
                    lambda buf, chunk: (
                        (lambda b: (b, self._fwd(b)))(_advance(buf, chunk))
                    ),
                    donate_argnums=0,
                )
            self._dev_buf = jnp.asarray(self._buf)
            if due:
                return self._emit(due, np.asarray(self._fwd(self._dev_buf)))
            return []

        # steady state: device ring only; the host mirror goes stale and
        # is rebuilt on demand (_sync_host)
        self._host_stale = True
        if due:
            self._dev_buf, probs_dev = self._dev_step(
                self._dev_buf, jnp.asarray(chunks)
            )
            return self._emit(due, np.asarray(probs_dev))
        self._dev_buf = self._dev_update(self._dev_buf, jnp.asarray(chunks))
        return []

    def reset_stream(self, stream: int):
        """Clear one stream slot for reuse (session recycling): its ring,
        fill/hop counters, and keyword-refractory history. The next
        window on this slot scores only audio fed after the reset."""
        self._sync_host()
        self._dev_buf = None  # host buffer diverges from the device ring
        self._buf[stream] = 0
        self._filled[stream] = 0
        self._since_hop[stream] = 0
        for key in [k for k in self._last_trigger if k[0] == stream]:
            del self._last_trigger[key]

    def _host_advance(self, chunks: np.ndarray):
        """Vectorized all-streams ring shift on the host buffer."""
        n = self._hop
        if n >= self._win:
            self._buf[:] = chunks[:, -self._win:]
        else:
            self._buf[:, :-n] = self._buf[:, n:]
            self._buf[:, -n:] = chunks

    def _sync_host(self):
        """Rebuild the host mirror from the device ring if it went stale."""
        if self._host_stale:
            self._buf[:] = np.asarray(self._dev_buf)
            self._host_stale = False

    def _push(self, stream: int, piece: np.ndarray):
        n = piece.shape[0]
        if n == 0:
            return
        if n >= self._win:
            self._buf[stream] = piece[-self._win:]
        else:
            self._buf[stream, :-n] = self._buf[stream, n:]
            self._buf[stream, -n:] = piece
        self._filled[stream] += n

    def _score(self, streams: list[int]) -> list[Event]:
        """Host-buffer path: transfer the full windows of `streams`."""
        jnp = self._jnp
        batch = self._buf[streams]  # (k, win) -> pad to n_streams for one shape
        if batch.shape[0] < self.n_streams:
            pad = np.zeros((self.n_streams - batch.shape[0], self._win),
                           self._np_dtype)
            batch = np.concatenate([batch, pad])
        probs = np.asarray(self._fwd(jnp.asarray(batch)))
        return self._emit(streams, probs)

    def _emit(self, streams: list[int], probs: np.ndarray) -> list[Event]:
        """(k>=len(streams), outputdim) probs rows -> Events + triggers.
        Row i scores streams[i] (device-ring scoring passes all-stream
        probs, where streams == range(n_streams), so rows still align)."""
        if self.calibration is not None:
            from ..evaluate.calibration import apply_temperature

            probs = apply_temperature(probs, self.calibration)
        events = []
        for i, s in enumerate(streams):
            t = self._filled[s] / self.cfg.sample_rate
            p = probs[i]
            triggers = []
            for k in np.flatnonzero(p[self.cfg.n_audioset:] >= self.cfg.threshold):
                cls = int(self.cfg.n_audioset + k)
                last = self._last_trigger.get((s, cls), -np.inf)
                if t - last >= self.cfg.refractory_seconds:
                    self._last_trigger[(s, cls)] = t
                    triggers.append((cls, float(p[cls])))
            events.append(Event(stream=s, time=float(t), probs=p, triggers=triggers))
        return events


class StreamingTagger(MultiStreamTagger):
    """Single-stream convenience wrapper."""

    def __init__(self, model_cfg, params, state,
                 config: StreamingConfig = StreamingConfig(),
                 calibration=None):
        super().__init__(model_cfg, params, state, n_streams=1,
                         config=config, calibration=calibration)

    def feed_audio(self, chunk: np.ndarray) -> list[Event]:
        return self.feed(0, chunk)


@dataclasses.dataclass
class SoundEvent:
    """A closed (finished) sound event detected online."""
    stream: int
    cls: int
    onset: float           # seconds, stream time
    offset: float          # seconds, stream time
    peak_prob: float


class OnlineEventDetector:
    """Online SED over the window-probability stream: hysteresis
    thresholding with hang time, the streaming counterpart of
    evaluate.events.extract_events (which needs the whole clip).

    Feed it every scored window (MultiStreamTagger events): a class's run
    OPENS when its prob >= on_threshold, stays open while probs remain
    >= off_threshold (hysteresis suppresses boundary flicker without the
    latency a median filter would add), and CLOSES once the class has
    been below off_threshold for `hang_seconds` of stream time — at which
    point a SoundEvent is emitted if the run lasted >= min_duration.

    Tracked classes default to the AudioSet range [0, n_audioset); pass
    `classes` to watch a subset (cheaper, and keyword triggers are
    already handled by MultiStreamTagger's refractory logic).

    Thresholds are scalars or per-class specs (a {class: th} mapping as
    produced by the strong-eval sweep / evaluate.events.load_thresholds,
    keyed by MODEL class index) — the tuned-operating-point deployment
    path. When a per-class on-threshold dips below a scalar
    off-threshold, that class's off clamps to its on value (hysteresis
    stays well-formed); an explicit scalar pair with off > on raises.
    """

    def __init__(self, on_threshold=0.5, off_threshold=0.3,
                 hang_seconds: float = 0.0, min_duration: float = 0.0,
                 classes: Optional[list] = None, n_audioset: int = 527,
                 window_seconds: float = 1.0):
        if np.isscalar(on_threshold) and np.isscalar(off_threshold):
            assert off_threshold <= on_threshold, "hysteresis needs off <= on"
        self.on_threshold = on_threshold
        self.off_threshold = off_threshold
        self.hang_seconds = hang_seconds
        self.min_duration = min_duration
        self.window_seconds = window_seconds
        self._classes = (np.arange(n_audioset) if classes is None
                         else np.asarray(sorted(classes), dtype=np.int64))
        from ..evaluate.events import per_class_thresholds

        # resolve over the full model index space, then gather the
        # tracked subset — threshold specs are keyed by model class index.
        # Mapping entries for untracked classes are ignored (a tuned file
        # from the eval sweep may cover e.g. keyword rows while the
        # detector watches AudioSet only).
        n_full = (int(self._classes.max()) + 1 if self._classes.size
                  else n_audioset)

        def _resolve(spec, default):
            if isinstance(spec, dict):
                spec = {c: t for c, t in spec.items()
                        if c == "default" or 0 <= int(c) < n_full}
            return per_class_thresholds(spec, n_full,
                                        default=default)[self._classes]

        self._on = _resolve(on_threshold, 0.5)
        self._off = np.minimum(_resolve(off_threshold, 0.3), self._on)
        # (stream, cls) -> [onset, last_active_time, peak]
        self._open: dict[tuple[int, int], list] = {}

    def update(self, stream: int, time: float, probs: np.ndarray) -> list[SoundEvent]:
        """One scored window (stream time `time` = window END, seconds);
        returns events that closed. The window covers
        [time - window_seconds, time]."""
        p = np.asarray(probs)[self._classes]
        onset_t = max(0.0, time - self.window_seconds)
        closed = []
        hot = set(np.flatnonzero(p >= self._on))
        warm = set(np.flatnonzero(p >= self._off))
        for i in hot:
            cls = int(self._classes[i])
            run = self._open.get((stream, cls))
            if run is None:
                self._open[(stream, cls)] = [onset_t, time, float(p[i])]
            else:
                run[1] = time
                run[2] = max(run[2], float(p[i]))
        for (s, cls), run in list(self._open.items()):
            if s != stream:
                continue
            i = np.searchsorted(self._classes, cls)
            still_warm = i < len(self._classes) and self._classes[i] == cls \
                and i in warm
            if still_warm:
                run[1] = time
            elif time - run[1] >= self.hang_seconds:
                ev = self._close(s, cls, run)
                if ev is not None:
                    closed.append(ev)
                del self._open[(s, cls)]
        return closed

    def flush(self, stream: Optional[int] = None) -> list[SoundEvent]:
        """Close every open run (end of stream); returns the final events."""
        closed = []
        for (s, cls), run in list(self._open.items()):
            if stream is not None and s != stream:
                continue
            ev = self._close(s, cls, run)
            if ev is not None:
                closed.append(ev)
            del self._open[(s, cls)]
        return closed

    def _close(self, stream: int, cls: int, run) -> Optional[SoundEvent]:
        onset, last, peak = run
        if last - onset < self.min_duration:
            return None
        return SoundEvent(stream=stream, cls=cls, onset=float(onset),
                          offset=float(last), peak_prob=peak)
