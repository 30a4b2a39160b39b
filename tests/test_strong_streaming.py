"""The strong-eval sweep is STREAMING (VERDICT r3 weak #2): Evaluator.strong
folds every clip into O(classes) count/scorer state inside flush() instead
of caching (clips x segments x classes) probabilities for a post-hoc sweep.
These tests pin the three properties the refactor rests on:

1. segment_counts/segment_scores_from_counts == segment_f1 (sklearn),
2. the per-class-tuned operating point reconstructed from per-threshold
   scorer counts == brute-force re-extraction at the tuned vector (the
   class-independence property of extract_events + EventScorer),
3. peak host memory through strong(sweep=...) stays O(batch), not O(clips).
"""

import gc
import tracemalloc

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.events import (
    EventScorer,
    extract_events,
    per_class_thresholds,
)
from uit_mobile_tpu.evaluate.metrics import (
    segment_counts,
    segment_f1,
    segment_scores_from_counts,
)

# ---------------------------------------------- counts == sklearn scores


class TestSegmentCounts:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_segment_f1_exactly(self, seed):
        rng = np.random.default_rng(seed)
        p = rng.uniform(0, 1, (40, 17)).astype(np.float32)
        t = (rng.uniform(0, 1, (40, 17)) > 0.7).astype(np.float32)
        t[:, 3] = 0.0  # a class with no positives (zero_division path)
        p[:, 5] = 0.0  # a class never predicted
        for th in (0.2, 0.5, np.full(17, 0.4, np.float32)):
            want = segment_f1(p, t, threshold=th)
            got = segment_scores_from_counts(
                *segment_counts(p, t, threshold=th))
            assert got == want  # exact equality, not approx

    def test_counts_accumulate_across_flushes(self):
        rng = np.random.default_rng(3)
        p = rng.uniform(0, 1, (30, 9)).astype(np.float32)
        t = (rng.uniform(0, 1, (30, 9)) > 0.6).astype(np.float32)
        whole = segment_counts(p, t, threshold=0.5)
        parts = [segment_counts(p[i:i + 7], t[i:i + 7], threshold=0.5)
                 for i in range(0, 30, 7)]
        summed = [sum(c[k] for c in parts) for k in range(3)]
        for a, b in zip(whole, summed):
            np.testing.assert_array_equal(a, b)
        assert (segment_scores_from_counts(*summed)
                == segment_f1(p, t, threshold=0.5))

    def test_all_empty(self):
        z = np.zeros(4, np.int64)
        s = segment_scores_from_counts(z, z, z)
        assert all(v == 0.0 for v in s.values())


# ------------------------- tuned point reconstructed from sweep counts


def _random_clip_world(seed, n_clips=12, n_cls=6):
    """Per clip: (times, probs, ref_events) with enough structure that
    sweeps/matchings are non-trivial."""
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n_clips):
        S = int(rng.integers(6, 12))
        times = np.stack([np.arange(S) * 0.5, np.arange(S) * 0.5 + 0.5], 1)
        probs = rng.uniform(0, 1, (S, n_cls)).astype(np.float32)
        refs = []
        for c in range(n_cls):
            if rng.uniform() < 0.6:
                on = float(rng.uniform(0, S * 0.4))
                refs.append((c, on, on + float(rng.uniform(0.3, 1.5))))
        clips.append((times, probs, refs))
    return clips


class TestTunedFromSweepCounts:
    def test_reconstruction_equals_brute_force(self):
        """The harness's no-re-extraction tuned computation: per-class
        counts pulled from the per-threshold sweep scorers must equal a
        scorer fed extract_events at the per-class tuned vector."""
        clips = _random_clip_world(0)
        n_cls = 6
        sweep_ths = [0.3, 0.5, 0.7]
        mk = lambda: EventScorer(t_collar=0.6, offset_collar_rate=0.5)  # noqa: E731
        sweep_sc = {th: mk() for th in sweep_ths}
        for times, probs, refs in clips:
            for th in sweep_ths:
                sweep_sc[th].add_clip(
                    extract_events(times, probs, threshold=th,
                                   median_kernel=3, merge_gap=0.1), refs)
        # arbitrary per-class picks across the sweep set
        tuned_spec = {0: 0.3, 1: 0.7, 2: 0.5, 4: 0.3}
        default_th = 0.5
        classes = set()
        for sc in sweep_sc.values():
            classes |= set(sc.tp) | set(sc.fp) | set(sc.fn)
        t_tp = t_fp = t_fn = 0
        for c in classes:
            sc_c = sweep_sc[float(tuned_spec.get(c, default_th))]
            t_tp += sc_c.tp[c]
            t_fp += sc_c.fp[c]
            t_fn += sc_c.fn[c]
        got = EventScorer._prf(t_tp, t_fp, t_fn)[2]

        spec = dict(tuned_spec)
        spec["default"] = default_th
        vec = per_class_thresholds(spec, n_cls)
        brute = mk()
        for times, probs, refs in clips:
            brute.add_clip(
                extract_events(times, probs, threshold=vec,
                               median_kernel=3, merge_gap=0.1), refs)
        assert got == brute.scores()["Event_Micro_F1"]
        assert (t_tp, t_fp, t_fn) == (sum(brute.tp.values()),
                                      sum(brute.fp.values()),
                                      sum(brute.fn.values()))


# ----------------------------------------------- O(batch) memory bound


def test_strong_sweep_memory_stays_o_batch(tmp_path):
    """Peak traced host memory through strong(sweep=...) must not grow
    with the clip count: 4x the clips may not add more than a fraction of
    what the old collect-then-sweep cache would have held (which grew by
    >= clips x segments x classes x 4 bytes x 2 arrays)."""
    import h5py
    import jax
    import pandas as pd

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.evaluate import Evaluator

    SR = 16000
    C = 537

    def make_manifest(n):
        h5 = tmp_path / f"m{n}.h5"
        rows = []
        rng = np.random.default_rng(0)
        with h5py.File(h5, "w") as f:
            for i in range(n):  # 10 s clips -> ~10 windows each
                f[f"c{i}.wav"] = (rng.standard_normal(10 * SR) * 800
                                  ).astype(np.int16)
                rows.append((f"c{i}.wav", str(i % 5), str(h5), 0.5, 3.0))
        tsv = tmp_path / f"m{n}.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                    "from", "to"]).to_csv(tsv, sep="\t",
                                                          index=False)
        return tsv

    cfg = models.get_model_config("uit_xxxs", outputdim=C,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    sweep = tuple(np.linspace(0.1, 0.9, 9))

    def peak(n):
        tsv = make_manifest(n)
        ev = Evaluator(str(ckpt), batch_size=2, num_workers=0,
                       report_dir=str(tmp_path))
        gc.collect()
        tracemalloc.start()
        ev.strong(eval_data=str(tsv), threshold=0.5, sweep=sweep)
        _, pk = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        return pk

    peak(4)  # warm compiles/caches outside the measured window
    p_small, p_big = peak(8), peak(32)
    # old cache growth for +24 clips: >= 24 clips x 10 segs x 537 cls x
    # 4 B x (probs + targets + clip_records ref) ~ 1.5 MB. The streaming
    # path must stay far under half of that.
    assert p_big - p_small < 700_000, (p_small, p_big)
