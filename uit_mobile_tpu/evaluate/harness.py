"""Evaluation harness: AudioSet tagging + GSC keyword spotting.

Rebuild of the reference Evaluator (evaluate.py): loads a checkpoint
(file / directory / pretrained name via cli.common.resolve_model), streams
the eval manifest through a jitted batched forward (the long-clip crop
path engages inside the model), accumulates (probs, targets) on host, and
computes the metric suites:

- ``audioset``: slices predictions/targets to the 527 AudioSet classes and
  reports the reference's 11 metrics (evaluate.py:94-101);
- ``gsc``/``kws``: the Accuracy@threshold protocol (metrics.gsc_accuracy);
- ``test_sample``: single-wav top-5 with the reference's pad-to-target rule
  (evaluate.py:253-260).

Reports are written to ``evaluation_<target>.txt`` with per-class metrics
sorted descending, matching the reference's report shape
(evaluate.py:133-149).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..data import DataLoader, WeakHDF5Dataset, read_tsv_data
from ..utils import get_logger, add_file_sink
from .metrics import compute_metrics, gsc_accuracy

log = get_logger()

AUDIOSET_METRICS = [
    "Precision", "Recall", "Macro_Precision", "Macro_Recall", "Macro_F1",
    "Micro_Precision", "Micro_Recall", "Micro_F1", "AP",
    "PositiveMultiClass_Accuracy", "mAP",
]


class Evaluator:
    def __init__(self, model_spec: Optional[str] = None, batch_size: int = 32,
                 num_workers: int = 3, use_pallas: Optional[bool] = None,
                 report_dir: Optional[str] = None,
                 bucket_seconds: Optional[float] = None,
                 fast: bool = False, data_parallel: bool = False,
                 dtype: str = "float32", scan_batches: int = 1,
                 dispatch_depth: int = 4):
        """bucket_seconds: when set, every batch right-pads up to the next
        multiple of this many seconds — the whole eval runs on a handful of
        compiled shapes instead of one per distinct batch-max length.
        Padding appends silent frames, which perturbs crop windows
        slightly; leave None (exact batch-max padding, the reference's
        collate semantics) when chasing bit parity.

        fast: serving-grade speed — 3-pass bf16 DFT + tfb layout on TPU
        (<=3e-4 prob drift; keep False for bit-parity gates).
        data_parallel: shard eval batches over ALL visible devices (pure
        DP; batches zero-pad up to a device-count multiple — padded rows
        are dropped from the results and cannot raise the batch-global
        top_db reference, so parity is unaffected for non-silent data).
        dtype: 'int16' transfers batches as raw PCM (half the
        host->device bytes; bitwise-identical outputs — every frontend
        folds the 1/32768 scale in exactly, tests/test_int16_pcm.py).
        scan_batches: K>1 folds K consecutive same-shape eval batches
        into ONE dispatched program (ops.pipeline.make_scanned_forward —
        the serving throughput trick, here amortizing per-batch dispatch
        across a fixed-shape eval stream such as GSC's 1 s clips or a
        bucketed AudioSet run). Shape changes and the epoch tail flush
        through the per-batch program, so results keep loader order and
        cover every clip. Numerics: XLA fuses the scan body's
        surrounding ops differently, so probabilities match the
        per-batch path to f32 epsilon (~1e-7), not bitwise — leave at 1
        for bit-parity gates. Ignored under data_parallel (the DP
        forward already amortizes across devices).
        dispatch_depth: max in-flight async eval programs before the
        oldest result is materialized (_run_epoch's bounded window).
        Results are BITWISE identical at any depth — the knob only moves
        the sync point. Default 4 is the measured optimum through the
        axon relay (tools/probe_eval_async.py: depth 1 +47%, 4 +48%,
        8 -32% relay stall vs sync); hosts with a local PCIe link can
        raise it. 1 = effectively synchronous dispatch."""
        self._resolved = None
        self._run_config: dict = {}
        self._model_spec = model_spec
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.use_pallas = use_pallas
        self.report_dir = report_dir
        self._user_report_dir = report_dir is not None
        self.bucket_seconds = bucket_seconds
        self.fast = fast
        self.data_parallel = data_parallel
        assert dtype in ("float32", "int16"), dtype
        self.dtype = dtype
        assert scan_batches >= 1, scan_batches
        self.scan_batches = scan_batches
        assert dispatch_depth >= 1, dispatch_depth
        self._dispatch_depth = dispatch_depth

    # ------------------------------------------------------------------ setup

    def _setup(self, model_spec=None):
        spec = model_spec or self._model_spec
        if spec is None and self._resolved is not None:
            # already resolved via an explicit experiment_path argument
            return self._resolved
        assert spec is not None, "no model specified"
        if self._resolved is None or spec != getattr(self, "_resolved_spec", None):
            from ..cli.common import resolve_model

            cfg, params, state, extra = resolve_model(spec, return_extra=True)
            self._run_config = (extra or {}).get("run_config") or {}
            if not self._user_report_dir:
                p = Path(spec)
                self.report_dir = str(p if p.is_dir() else (p.parent if p.exists() else "."))
            self._resolved = (cfg, params, state)
            self._resolved_spec = spec
            self._fwd = self._make_forward(cfg, params, state)
        return self._resolved

    def _make_forward(self, cfg, params, state):
        import jax
        import jax.numpy as jnp

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        dp_active = self.data_parallel and jax.device_count() > 1
        top_db_mode = None
        if dp_active and use_pallas:
            if self.fast:
                # fast+DP keeps the Pallas kernel: data_parallel_forward
                # routes Mosaic through shard_map (manual partitioning, the
                # documented way — serving does the same), with PER-SAMPLE
                # dB clamping so no cross-shard reduction is needed. The
                # divergence from torch's batch-global clamp only shows on
                # silent/degenerate clips whose own max sits >120 dB below
                # the batch max — fast mode's 1e-3-grade contract already
                # excludes bit-parity gates (those run exact, below).
                top_db_mode = "per_sample"
            else:
                # exact/parity grade: the XLA frontend under GSPMD keeps
                # the batch-GLOBAL top_db reference exact across shards
                # (the jnp.max collective is inserted automatically);
                # Mosaic kernels cannot be auto-partitioned.
                log.info("data_parallel exact eval: using the XLA frontend "
                         "(batch-global top_db stays exact across shards)")
                use_pallas = False
        # single policy source (ops/pipeline.make_forward_fn); tfb engages
        # only in fast mode — exact keeps the reference bft orientation
        # for bit-parity gates
        from ..ops.pipeline import make_forward_fn

        fwd_fn = make_forward_fn(
            cfg, params, state, use_pallas=use_pallas,
            precision="fast" if self.fast else "exact",
            btf=self.fast, top_db_mode=top_db_mode,
        )
        if dp_active:
            from ..parallel.mesh import data_parallel_forward

            jitted = data_parallel_forward(fwd_fn)
            pad_multiple = jax.device_count()
        else:
            jitted = jax.jit(fwd_fn)
            pad_multiple = 1
        # K-batch scanned dispatch (non-DP only — the DP forward already
        # amortizes): one (K, B, T) program per K same-shape batches
        self._scan_k = self.scan_batches if not dp_active else 1
        self._fwd_block = None
        if self._scan_k > 1:
            from ..ops.pipeline import make_scanned_forward

            scanned = jax.jit(make_scanned_forward(fwd_fn))

            def fwd_block(block_np: np.ndarray):
                # returns the DEVICE array (async) — callers materialize;
                # lazy reshape folds the K batch outputs into one entry
                out = scanned(jnp.asarray(block_np))
                return out.reshape((-1,) + out.shape[2:])

            self._fwd_block = fwd_block

        def fwd_async(wav_np: np.ndarray):
            # returns the DEVICE array without blocking: JAX dispatch is
            # async, so the caller can keep uploading/enqueueing batches
            # while this one computes — np.asarray (the sync point) is
            # deferred to a bounded window in _run_epoch. Per deferred
            # batch this also saves one full host<->device round trip.
            n = wav_np.shape[0]
            rem = n % pad_multiple
            if rem:
                wav_np = np.concatenate(
                    [wav_np,
                     np.zeros((pad_multiple - rem, wav_np.shape[1]), wav_np.dtype)]
                )
            return jitted(jnp.asarray(wav_np))[:n]

        self._fwd_async = fwd_async

        def fwd(wav_np: np.ndarray) -> np.ndarray:
            return np.asarray(fwd_async(wav_np))

        return fwd

    # -------------------------------------------------------------- inference

    @staticmethod
    def _pad_wav_to_target(cfg, wav):
        """The reference's eval pad rule (evaluate.py:253-260): pad the
        waveform until the mel reaches target_length-1 frames. The
        fractional frame count and the int() truncation are pinned parity
        quirks — this is the ONE copy both eval paths share."""
        t_len = cfg.target_length - 1
        n_frames = wav.shape[-1] / cfg.frontend.hop_length
        if n_frames < t_len:
            diff = int((t_len - n_frames) * cfg.frontend.hop_length)
            wav = np.pad(wav, ((0, 0), (0, diff)))
        return wav

    def _run_epoch(self, df, num_classes: int, pad_to_target: bool = False):
        cfg, params, state = self._setup()
        ds = WeakHDF5Dataset(df, num_classes=num_classes, dtype=self.dtype)
        loader = DataLoader(ds, batch_size=self.batch_size, shuffle=False,
                            num_workers=self.num_workers)
        preds, targets = [], []
        scan_k = getattr(self, "_scan_k", 1)
        buf: list = []  # (wav, target) awaiting a full K-batch scan block
        # bounded async-dispatch window: preds holds DEVICE arrays until
        # the window exceeds _dispatch_depth in-flight programs, then the
        # oldest is materialized. Overlaps host->device upload of batch
        # k+1 with batch k's compute AND drops one relay round trip per
        # deferred batch (np.asarray per batch was a hard sync point).
        # Depth stays small — queues deeper than ~8 can stall the relay
        # (PERF_NOTES measurement caveats); results are bit-identical to
        # synchronous dispatch (same programs, later blocking).
        depth = max(1, int(self._dispatch_depth))
        inflight: list = []  # indices into preds still on device

        def push(dev_pred):
            preds.append(dev_pred)
            inflight.append(len(preds) - 1)
            while len(inflight) > depth:
                i = inflight.pop(0)
                preds[i] = np.asarray(preds[i])

        def flush_buf():
            # full blocks run as ONE scanned dispatch; short tails (shape
            # change / epoch end) fall back to the per-batch program so
            # loader order and coverage are preserved exactly
            if len(buf) == scan_k and scan_k > 1:
                push(self._fwd_block(np.stack([w for w, _ in buf])))
                targets.extend(tgt for _, tgt in buf)
            else:
                for w, tgt in buf:
                    push(self._fwd_async(w))
                    targets.append(tgt)
            buf.clear()

        for batch in loader:
            wav = batch["wav"]
            if pad_to_target and hasattr(cfg, "target_length"):
                wav = self._pad_wav_to_target(cfg, wav)
            if self.bucket_seconds:
                step = int(self.bucket_seconds * cfg.frontend.sample_rate)
                target_len = -(-wav.shape[-1] // step) * step
                wav = np.pad(wav, ((0, 0), (0, target_len - wav.shape[-1])))
            if scan_k <= 1:
                push(self._fwd_async(wav))
                targets.append(batch["target"])
                continue
            if buf and buf[0][0].shape != wav.shape:
                flush_buf()
            buf.append((wav, batch["target"]))
            if len(buf) == scan_k:
                flush_buf()
        flush_buf()
        if not preds:
            raise ValueError(
                f"evaluation produced zero batches from {len(df)} manifest "
                f"rows — check the manifest path and the basename setting "
                f"(a basename mismatch between manifest filenames and HDF5 "
                f"keys filters every row; gsc() reads it from the "
                f"checkpoint's run_config)"
            )
        preds = [np.asarray(p) for p in preds]
        return np.concatenate(preds), np.concatenate(targets)

    # ---------------------------------------------------------------- targets

    @staticmethod
    def _dump_predictions(path, df, preds: np.ndarray, targets: np.ndarray):
        """Raw per-clip probabilities + targets + filenames to one .npz —
        the offline error-analysis / post-hoc-ensembling artifact the
        metric numbers hide. Row order is the manifest's (the epoch loader
        runs shuffle=False and the async/scan windows preserve order)."""
        np.savez_compressed(
            path, preds=preds.astype(np.float32),
            targets=targets.astype(np.float32),
            filenames=np.asarray(df["filename"], dtype=object),
        )
        log.info(f"wrote predictions ({preds.shape[0]} clips x "
                 f"{preds.shape[1]} classes) to {path}")

    def audioset(self, experiment_path: Optional[str] = None,
                 audioset_eval_data: str = "datasets/audioset/data/labels/eval.csv",
                 label_csv: Optional[str] = None,
                 dump_predictions: Optional[str] = None):
        self._setup(experiment_path)
        df = read_tsv_data(audioset_eval_data)
        # Build targets at the checkpoint's head width (>=527): unified
        # 537-class checkpoints evaluate manifests whose labels include
        # keyword indices (e.g. the synthetic gate world); the HEADLINE
        # metrics stay the 527-column AudioSet slice for reference parity
        # (evaluate.py:100-110), with the sliced mAPs added when wider.
        num_classes = max(527, getattr(self._resolved[0], "outputdim", 527))
        preds, targets = self._run_epoch(df, num_classes=num_classes)
        if dump_predictions is not None:
            self._dump_predictions(dump_predictions, df, preds, targets)
        results = compute_metrics(AUDIOSET_METRICS, preds[:, :527], targets[:, :527])
        if num_classes > 527 and targets[:, 527:].any():
            # manifest carries keyword positives -> report the KWS slice
            # too (train/loop.py's validation naming)
            results.update(compute_metrics(["mAPKWS"], preds, targets))
        if label_csv is None:
            # reference uses the merged index when present (evaluate.py:103-108)
            from ..cli.common import LABEL_CSV

            label_csv = LABEL_CSV if LABEL_CSV.exists() else None
        self._write_report("Audioset", results, label_csv)
        return results

    def calibrate(self, experiment_path: Optional[str] = None,
                  eval_data: str = "datasets/audioset/data/labels/eval.csv",
                  num_classes: Optional[int] = None, per_class: bool = False,
                  n_bins: int = 15, out=None):
        """Fit temperature scaling on a held-out manifest and report the
        calibration improvement (evaluate.calibration; beyond the
        reference, which ships raw sigmoid outputs).

        One inference epoch total. ``per_class=True`` fits a (C,) vector
        (classes without positives keep T=1); ``out`` writes the
        deployable calibration JSON consumed by ``uit-serve
        --calibration`` / ``load_calibration``. ``num_classes`` defaults
        to the checkpoint's own head width (like gsc/strong do) so
        custom-head checkpoints calibrate without an explicit flag."""
        from .calibration import (
            apply_temperature, ece, fit_temperature, save_calibration,
        )

        self._setup(experiment_path)
        if num_classes is None:
            num_classes = getattr(self._resolved[0], "outputdim", 537)
        df = read_tsv_data(eval_data)
        preds, targets = self._run_epoch(df, num_classes=num_classes)
        T = fit_temperature(preds, targets, per_class=per_class)
        cal = apply_temperature(preds, T)
        before = compute_metrics(["BCELoss"], preds, targets)["BCELoss"]
        after = compute_metrics(["BCELoss"], cal, targets)["BCELoss"]
        results = {
            "temperature": (float(T) if np.ndim(T) == 0
                            else {i: float(t) for i, t in enumerate(T)
                                  if t != 1.0}),
            "ECE_before": ece(preds, targets, n_bins=n_bins),
            "ECE_after": ece(cal, targets, n_bins=n_bins),
            "BCE_before": before,
            "BCE_after": after,
            "n_clips": int(preds.shape[0]),
        }
        if out is not None:
            save_calibration(out, T, meta={
                "eval_data": str(eval_data), "n_clips": int(preds.shape[0]),
                "per_class": bool(per_class),
                "ece_before": results["ECE_before"],
                "ece_after": results["ECE_after"],
            })
        return results

    def gsc(self, experiment_path: Optional[str] = None,
            eval_data: str = "datasets/gsc/data/labels/test_gsc_aslabels.tsv",
            threshold: float = 0.2, pad: bool = False, detailed: bool = False,
            sweep: bool = False, tie_mode: str = "first",
            dump_predictions: Optional[str] = None):
        return self._kws(experiment_path, eval_data, threshold=threshold,
                         label_name="GSC", pad=pad, detailed=detailed,
                         sweep=sweep, tie_mode=tie_mode,
                         dump_predictions=dump_predictions)

    def _kws(self, experiment_path, eval_data, threshold: float = 0.2,
             label_name: str = "GSC", pad: bool = False,
             detailed: bool = False, sweep: bool = False,
             tie_mode: str = "first",
             dump_predictions: Optional[str] = None):
        self._setup(experiment_path)
        # the checkpoint's training config decides whether manifests index
        # by basename (reference evaluate.py:200-201: config.get('basename',
        # False)); raw dumps carry no config -> False, like the reference
        df = read_tsv_data(
            eval_data, basename=self._run_config.get("basename", False)
        )
        num_classes = getattr(self._resolved[0], "outputdim", 537)
        preds, targets = self._run_epoch(df, num_classes=num_classes,
                                         pad_to_target=pad)
        if dump_predictions is not None:
            self._dump_predictions(dump_predictions, df, preds, targets)
        acc = gsc_accuracy(preds, targets, threshold=threshold,
                           tie_mode=tie_mode)
        results = {f"Accuracy@{threshold}": acc}
        if sweep:
            from .metrics import kws_threshold_sweep

            curve = kws_threshold_sweep(preds, targets, tie_mode=tie_mode)
            for t, row in curve.items():
                log.info(
                    f"threshold {t:.2f}: "
                    + "  ".join(f"{k} {v * 100:.2f}" for k, v in row.items())
                )
            results["_sweep"] = curve
        if detailed:
            from .metrics import kws_operating_metrics

            op = kws_operating_metrics(preds, targets, threshold=threshold)
            results.update({k: v for k, v in op.items() if not isinstance(v, dict)})
            results["_detail"] = {k: v for k, v in op.items() if isinstance(v, dict)}
        self._write_report(
            label_name, {k: v for k, v in results.items() if not k.startswith("_")}, None
        )
        return results

    def strong(self, experiment_path: Optional[str] = None,
               eval_data: str = "datasets/strong/eval.tsv",
               threshold=0.5, min_overlap: float = 0.5,
               median_kernel: int = 1, event_collar: float = 0.2,
               offset_collar_rate: float = 0.2, min_duration: float = 0.0,
               merge_gap: float = 0.0, dump_events: Optional[str] = None,
               criterion: str = "collar", dtc: float = 0.5, gtc: float = 0.5,
               cttc: Optional[float] = None, sweep=None, psds=None,
               thresholds_out: Optional[str] = None):
        """Strong-label (SED) evaluation: framewise probabilities over FULL
        clips scored against event intervals — DCASE-style segment
        F1/precision/recall (evaluate.metrics.segment_f1) PLUS collar-based
        event F1 (evaluate.events): per clip, probabilities are median-
        filtered (`median_kernel` segments), thresholded, merged into
        events (`merge_gap`, `min_duration`) and matched to the reference
        intervals with an onset collar of `event_collar` seconds (offset
        collar = max(collar, offset_collar_rate * event duration)), or —
        with criterion='intersection' — the PSDS-style DTC/GTC overlap
        rule (intersection/prediction >= dtc and intersection/reference
        >= gtc).

        eval_data: TSV with filename/labels/hdf5path/from/to (one labeled
        event interval per row; rows sharing a filename are that clip's
        events). Clips are zero-padded to whole seconds so the compile
        count is bounded by the longest clip; padded tail segments count
        as negatives (deterministic, slightly conservative).

        dump_events: optional path — write every extracted predicted
        event as a TSV (filename/event/onset/offset columns, seconds),
        the inspection/post-processing companion of the scores.

        sweep: optional iterable of decision thresholds — re-extracts and
        re-scores the (cached) framewise probabilities at every point and
        returns the event + segment operating curve under
        ``_event_operating_curve`` ({threshold: {metric: value}}), the
        event analog of the KWS `--sweep` (one model pass total).

        psds: truthy — also compute the PSDS score (evaluate.psds) over
        the sweep's operating points with the DTC/GTC intersection
        criterion; pass a dict to set {'alpha_st': .., 'alpha_ct': ..,
        'e_max': ..} (alpha_ct > 0 enables cross-trigger counting —
        unmatched predictions intersecting OTHER classes' references
        penalize those classes' effective FPR, see evaluate/psds.py).
        Implies the default sweep when none is given. A coarse sweep
        LOWER-bounds the true PSDS (see evaluate/psds.py).

        threshold: scalar, (num_classes,) vector, or {class: th} mapping
        (evaluate.events.per_class_thresholds forms — e.g. a
        load_thresholds file from an earlier sweep) applied to BOTH the
        event extraction and the segment binarization.

        thresholds_out: optional path — after a sweep, write the
        F1-maximizing per-class operating points as a JSON threshold
        file (evaluate.events.save_thresholds) that uit-stream /
        OnlineEventDetector / a later --thresholds run consume: the
        tune-on-dev, deploy-per-class loop. The sweep also reports
        `Event_Micro_F1_per_class_tuned` — the micro F1 when each class
        runs at its own best sweep point (tuned ON this set; treat as an
        upper bound unless eval_data is a dev split).

        Completes the SED round trip with train/sed.py — the reference
        has no strong-label evaluation (or training) at all."""
        import jax
        import jax.numpy as jnp

        from .. import models
        from .events import (
            EventScorer,
            extract_events,
            per_class_thresholds,
            save_thresholds,
        )
        from .metrics import (
            segment_counts,
            segment_events_to_targets,
            segment_scores_from_counts,
        )

        cfg, params, state = self._setup(experiment_path)
        df = read_tsv_data(
            eval_data, basename=self._run_config.get("basename", False)
        )
        assert "from" in df.columns and "to" in df.columns, (
            f"{eval_data}: strong eval needs from/to event-interval columns"
        )
        num_classes = getattr(cfg, "outputdim", 537)
        sr = cfg.frontend.sample_rate
        if thresholds_out is not None and sweep is None and not psds:
            sweep = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
        if not np.isscalar(threshold):
            # one resolution point: a (C,) vector broadcasts through both
            # extract_events and segment_f1's binarization
            threshold = per_class_thresholds(threshold, num_classes)

        from ..data.manifest import events_by_file

        groups = events_by_file(df)
        reader = WeakHDF5Dataset(
            df.drop_duplicates(subset=["hdf5path", "filename"]),
            num_classes=num_classes, dtype=self.dtype,
        )

        # probs on device (one compile per distinct padded length); segment
        # times on the HOST in float64 — returning them through jit would
        # downcast the boundaries to f32 and perturb min_overlap
        # rasterization at exact-coverage edges. Frontend uses per-sample
        # dB clamping so co-batched clips cannot couple through the
        # batch-global torch clamp (scores stay independent of batch
        # composition, matching the batch-1 result).
        import dataclasses as _dc

        from ..ops import make_frontend_fn

        fe = make_frontend_fn(
            _dc.replace(cfg.frontend, top_db_mode="per_sample"),
            use_pallas=(jax.devices()[0].platform == "tpu"),
        )
        if isinstance(params, list):
            # checkpoint ensemble (comma spec): mean member probs via one
            # vmapped program (same recipe as ops.pipeline.make_forward_fn;
            # segment times are config-determined, member 0 serves the
            # conv-family times branch below)
            import jax.numpy as _jnp

            _member = jax.vmap(
                lambda p, s, w: models.apply_framewise(cfg, p, s, w,
                                                       frontend_fn=fe)[0],
                in_axes=(0, 0, None),
            )
            _sp = jax.tree.map(lambda *xs: _jnp.stack(xs), *params)
            _ss = jax.tree.map(lambda *xs: _jnp.stack(xs), *state)
            fwd = jax.jit(lambda w: _jnp.mean(_member(_sp, _ss, w), axis=0))
            params, state = params[0], state[0]
        else:
            fwd = jax.jit(
                lambda w: models.apply_framewise(cfg, params, state, w,
                                                 frontend_fn=fe)[0]
            )
        times_cache: dict = {}

        def times_for(pad_to):
            if pad_to not in times_cache:
                if isinstance(cfg, models.UITConfig):
                    # host-side arithmetic companion of forward_framewise:
                    # f64 boundaries, no model execution
                    n_frames = cfg.frontend.num_frames(pad_to)
                    times_cache[pad_to] = models.uit.framewise_times(cfg, n_frames)
                else:  # conv families: segment count depends on the stack
                    _, t = models.apply_framewise(  # unjitted: f64 intact
                        cfg, params, state, jnp.zeros((1, pad_to), jnp.float32)
                    )
                    times_cache[pad_to] = np.asarray(t)
            return times_cache[pad_to]

        def mk_scorer(ct: bool = False):
            return EventScorer(t_collar=event_collar,
                               offset_collar_rate=offset_collar_rate,
                               criterion=criterion, dtc=dtc, gtc=gtc,
                               cttc=cttc, count_cross_triggers=ct)

        scorer = mk_scorer()
        if psds and sweep is None:
            sweep = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
        # Streaming accumulation — O(classes) state, NOT O(clips): every
        # per-clip quantity (segment targets, sweep extractions) is folded
        # into count vectors / per-threshold scorers inside flush(), so an
        # AudioSet-strong-sized eval (~100k clips x 63 segs x 527 cls)
        # never materializes the ~13 GB probability cache a
        # collect-then-sweep design would need. Verified score-identical
        # to the batch form (tests/test_sed.py + test_round4_fixes).
        #   - (C,) int64 segment TP/FP/FN at the base threshold
        #     (micro+macro via segment_scores_from_counts)
        #   - micro [TP, FP, FN] scalars per sweep point
        #   - one EventScorer per sweep point (+ the PSDS intersection
        #     scorer when criterion differs)
        seg_tp = np.zeros(num_classes, np.int64)
        seg_fp = np.zeros(num_classes, np.int64)
        seg_fn = np.zeros(num_classes, np.int64)
        # cross-trigger counting is an O(preds x other-class refs) scan
        # per clip — only pay for it when alpha_ct will use it
        want_ct = isinstance(psds, dict) and bool(psds.get("alpha_ct"))
        # PSDS is defined on the intersection (DTC/GTC) criterion; reuse
        # the sweep scorer when it already is one
        reuse = bool(psds) and criterion == "intersection"
        sweep_ths = sorted(float(t) for t in sweep) if sweep is not None \
            else []
        sweep_sc: dict = {}
        sweep_sc_int: dict = {}
        sweep_seg: dict = {}
        for th in sweep_ths:
            sweep_sc[th] = mk_scorer(ct=reuse and want_ct)
            sweep_sc_int[th] = sweep_sc[th] if reuse else (
                EventScorer(criterion="intersection", dtc=dtc, gtc=gtc,
                            cttc=cttc, count_cross_triggers=want_ct)
                if psds else None
            )
            sweep_seg[th] = np.zeros(3, np.int64)
        pred_rows: list = []
        total_samples = 0

        def flush(pad_to, items):
            batch = np.stack([w for w, _, _ in items])
            if batch.shape[0] < self.batch_size:
                # pad partial groups to the full batch size: one compiled
                # program per distinct clip LENGTH instead of one per
                # (length, remainder-count) pair. Padded rows are silence
                # and are sliced away below; per-sample dB clamping keeps
                # them from coupling into real clips' scores.
                batch = np.concatenate([
                    batch,
                    np.zeros((self.batch_size - batch.shape[0],) + batch.shape[1:],
                             batch.dtype),
                ])
            probs = np.asarray(fwd(jnp.asarray(batch)))[: len(items)]
            times = times_for(pad_to)
            for p, (_, events, fname) in zip(probs, items):
                tgt = segment_events_to_targets(
                    times, events, num_classes, min_overlap=min_overlap)
                for acc, cnt in zip((seg_tp, seg_fp, seg_fn),
                                    segment_counts(p, tgt,
                                                   threshold=threshold)):
                    acc += cnt
                pred = extract_events(times, p, threshold=threshold,
                                      median_kernel=median_kernel,
                                      min_duration=min_duration,
                                      merge_gap=merge_gap)
                scorer.add_clip(pred, events)
                # the sweep re-extracts HERE, while the clip's probs are
                # live, then drops them — same total work as a
                # collect-then-sweep pass, O(batch) memory
                for th in sweep_ths:
                    pred_th = extract_events(times, p, threshold=th,
                                             median_kernel=median_kernel,
                                             min_duration=min_duration,
                                             merge_gap=merge_gap)
                    sweep_sc[th].add_clip(pred_th, events)
                    sc_int = sweep_sc_int[th]
                    if sc_int is not None and sc_int is not sweep_sc[th]:
                        sc_int.add_clip(pred_th, events)
                    sweep_seg[th] += [c.sum() for c in
                                      segment_counts(p, tgt, threshold=th)]
                if dump_events is not None:
                    pred_rows.extend((fname, c, on, off) for c, on, off in pred)

        # batch clips of the same padded length together (bounded memory:
        # at most batch_size clips buffered per distinct length)
        pending: dict = {}
        for fname, h5, events in groups:
            wav = reader._read(h5, fname)
            total_samples += int(wav.shape[-1])
            pad_to = -(-wav.shape[-1] // sr) * sr
            wav = np.pad(wav, (0, pad_to - wav.shape[-1]))
            pending.setdefault(pad_to, []).append((wav, events, fname))
            if len(pending[pad_to]) >= self.batch_size:
                flush(pad_to, pending.pop(pad_to))
        for pad_to, items in pending.items():
            flush(pad_to, items)
        results = segment_scores_from_counts(seg_tp, seg_fp, seg_fn)
        results.update(scorer.scores())
        if sweep is not None:
            curve = {}
            psds_points, ct_points, ref_dur = [], [], {}
            per_class_curves: dict = {}  # class -> {threshold: F1}
            for th in sweep_ths:
                sc = sweep_sc[th]
                sc_int = sweep_sc_int[th]
                if sc_int is not None:
                    cls = set(sc_int.tp) | set(sc_int.fp) | set(sc_int.fn)
                    psds_points.append({
                        c: (sc_int.tp[c], sc_int.fp[c], sc_int.fn[c])
                        for c in cls
                    })
                    ct_points.append(dict(sc_int.ct))
                    ref_dur = {c: s / 3600.0
                               for c, s in sc_int.ref_duration.items()}
                scores = sc.scores()
                for c, f1 in scores.get("_event_per_class_f1", {}).items():
                    per_class_curves.setdefault(c, {})[th] = f1
                row = {k: v for k, v in scores.items()
                       if not k.startswith("_")}
                s_tp, s_fp, s_fn = sweep_seg[th]
                row["Segment_Micro_F1"] = EventScorer._prf(s_tp, s_fp, s_fn)[2]
                curve[th] = row
            results["_event_operating_curve"] = curve
            # operating-point guidance: the sweep thresholds that maximize
            # event / segment F1 (deploy-time `threshold` picks), plus the
            # per-class picks (deployments threshold each class on its own
            # operating point — the psds_eval/DCASE practice)
            if curve:
                results["_best_event_threshold"] = max(
                    curve, key=lambda t: curve[t]["Event_Micro_F1"])
                results["_best_segment_threshold"] = max(
                    curve, key=lambda t: curve[t]["Segment_Micro_F1"])
                results["_best_event_threshold_per_class"] = {
                    c: max(ths, key=ths.get)
                    for c, ths in sorted(per_class_curves.items())
                }
                # per-class-tuned operating point: every class at its own
                # best sweep threshold (unseen classes at the global best).
                # No re-extraction needed: extract_events processes
                # classes independently (median filter, thresholding and
                # run-merging are all per column) and EventScorer matches
                # within (clip, class), so the tuned point's per-class
                # TP/FP/FN are EXACTLY the per-class counts of the sweep
                # scorer at that class's chosen threshold — summing them
                # reproduces sc_tuned.scores()['Event_Micro_F1'] bit-for-
                # bit without a second pass over any clip data.
                tuned_spec = dict(results["_best_event_threshold_per_class"])
                default_th = results["_best_event_threshold"]
                tuned_classes: set = set()
                for sc_th in sweep_sc.values():
                    tuned_classes |= (set(sc_th.tp) | set(sc_th.fp)
                                      | set(sc_th.fn))
                t_tp = t_fp = t_fn = 0
                for c in tuned_classes:
                    sc_c = sweep_sc[float(tuned_spec.get(c, default_th))]
                    t_tp += sc_c.tp[c]
                    t_fp += sc_c.fp[c]
                    t_fn += sc_c.fn[c]
                results["Event_Micro_F1_per_class_tuned"] = (
                    EventScorer._prf(t_tp, t_fp, t_fn)[2])
                if thresholds_out is not None:
                    save_thresholds(
                        thresholds_out,
                        results["_best_event_threshold_per_class"],
                        default=results["_best_event_threshold"])
            if psds:
                from .psds import psds as psds_score

                opts = dict(psds) if isinstance(psds, dict) else {}
                if opts.get("alpha_ct"):
                    opts.update(ct_points=ct_points,
                                ref_duration_hours=ref_dur)
                else:
                    opts.pop("alpha_ct", None)
                results.update(psds_score(
                    psds_points,
                    duration_hours=total_samples / sr / 3600.0,
                    **opts,
                ))
        if dump_events is not None:
            import pandas as pd

            pd.DataFrame(
                pred_rows, columns=["filename", "event", "onset", "offset"]
            ).to_csv(dump_events, sep="\t", index=False)
        self._write_report(
            "Strong",
            {k: v for k, v in results.items() if not k.startswith("_")}, None,
        )
        return results

    def test_sample(self, experiment_path: Optional[str], sample: str, topk: int = 5):
        from ..data import read_wav

        cfg, params, state = self._setup(experiment_path)
        wav, sr = read_wav(sample)
        assert sr == cfg.frontend.sample_rate
        wav = self._pad_wav_to_target(cfg, wav[:1])
        pred = self._fwd(wav)[0]
        top = np.argsort(pred)[::-1][:topk]
        for idx in top:
            print(f"[{idx:=3}] : {pred[idx] * 100:.2f}")
        return {int(i): float(pred[i]) for i in top}

    # ----------------------------------------------------------------- report

    def _write_report(self, target: str, results: dict, label_csv, scale=100.0):
        label_maps = None
        if label_csv:
            from ..cli.common import load_label_map

            label_maps = load_label_map(label_csv)
        lines = [f"{target} Results"]
        for metric, value in results.items():
            if isinstance(value, np.ndarray):
                lm = label_maps or {i: i for i in range(len(value))}
                for cl in np.argsort(value)[::-1]:
                    lines.append(f"{metric} Class {lm[int(cl)]} : {value[cl] * scale:<4.2f}")
            else:
                lines.append(f"{metric} : {value * scale:<4.2f}")
        report = "\n".join(lines)
        out = Path(self.report_dir or ".") / f"evaluation_{target}.txt"
        try:
            out.write_text(report + "\n")
        except OSError:
            pass
        log.info(report)
