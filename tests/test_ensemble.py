"""Checkpoint ensembling: probability-space averaging of N checkpoints
in ONE vmapped XLA program (ops.pipeline.make_forward_fn list support +
the cli.common.resolve_model comma spec).

Complement of the reference's weight-space averaging (utils.py:335-369):
prob-space ensembling works across independently trained runs. The core
contract pinned here: ensemble(probs) == mean of the members' individual
forwards, everywhere a forward is built through the pipeline policy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.ops.pipeline import make_forward_fn


@pytest.fixture(scope="module")
def members():
    cfg = models.get_model_config("uit_xxxs", outputdim=12, target_length=102,
                                  depth=2)
    ps = [models.build(cfg, jax.random.key(i)) for i in range(3)]
    return cfg, [p for p, _ in ps], [s for _, s in ps]


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)


class TestEnsembleForward:
    def test_matches_mean_of_members(self, members, wav):
        cfg, params, state = members
        ens = jax.jit(make_forward_fn(cfg, params, state, use_pallas=False))
        got = np.asarray(ens(wav))
        want = np.mean(
            [np.asarray(models.apply(cfg, p, s, wav))
             for p, s in zip(params, state)], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape == (4, 12)

    def test_single_member_list_matches_plain(self, members, wav):
        cfg, params, state = members
        ens = jax.jit(make_forward_fn(cfg, [params[0]], [state[0]],
                                      use_pallas=False))
        plain = np.asarray(models.apply(cfg, params[0], state[0], wav))
        np.testing.assert_allclose(np.asarray(ens(wav)), plain, atol=1e-6)

    def test_long_clip_crop_path(self, members):
        # the eval-time window chunking must trace under the member vmap
        cfg, params, state = members
        rng = np.random.default_rng(1)
        long = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32) * 0.1)
        ens = jax.jit(make_forward_fn(cfg, params, state, use_pallas=False))
        got = np.asarray(ens(long))
        want = np.mean(
            [np.asarray(models.apply(cfg, p, s, long))
             for p, s in zip(params, state)], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_mismatched_lists_raise(self, members):
        cfg, params, state = members
        with pytest.raises(ValueError, match="equal-length"):
            make_forward_fn(cfg, params, state[:2], use_pallas=False)
        with pytest.raises(ValueError, match="equal-length"):
            make_forward_fn(cfg, params, state[0], use_pallas=False)

    def test_composes_with_scanned_dispatch(self, members, wav):
        from uit_mobile_tpu.ops.pipeline import make_scanned_forward

        cfg, params, state = members
        fn = make_forward_fn(cfg, params, state, use_pallas=False)
        scanned = jax.jit(make_scanned_forward(fn))
        block = jnp.stack([wav, wav * 0.5])
        got = np.asarray(scanned(block))
        per = jax.jit(fn)
        np.testing.assert_allclose(got[0], np.asarray(per(wav)), atol=1e-5)
        np.testing.assert_allclose(got[1], np.asarray(per(wav * 0.5)), atol=1e-5)


class TestResolveEnsemble:
    def _save_two(self, tmp_path, cfg2=None):
        from uit_mobile_tpu.ckpt.io import save_checkpoint

        cfg = models.get_model_config("uit_xxxs", outputdim=12,
                                      target_length=102, depth=1)
        paths = []
        for i, c in enumerate([cfg, cfg2 or cfg]):
            p, s = models.build(c, jax.random.key(i))
            path = tmp_path / f"m{i}.npz"
            save_checkpoint(path, p, s, c)
            paths.append(str(path))
        return cfg, paths

    def test_comma_spec_resolves_lists(self, tmp_path):
        from uit_mobile_tpu.cli.common import resolve_model

        cfg, paths = self._save_two(tmp_path)
        got_cfg, params, state, extra = resolve_model(
            ",".join(paths), return_extra=True)
        assert got_cfg == cfg
        assert isinstance(params, list) and len(params) == 2
        assert isinstance(state, list) and len(state) == 2
        assert extra["ensemble"] == 2

    def test_config_mismatch_raises(self, tmp_path):
        from uit_mobile_tpu.cli.common import resolve_model

        other = models.get_model_config("uit_xxxs", outputdim=13,
                                        target_length=102, depth=1)
        _, paths = self._save_two(tmp_path, cfg2=other)
        with pytest.raises(ValueError, match="share one model config"):
            resolve_model(",".join(paths))

    def test_single_path_with_comma_tail_rejected(self, tmp_path):
        from uit_mobile_tpu.cli.common import resolve_model

        _, paths = self._save_two(tmp_path)
        with pytest.raises(ValueError, match=">=2"):
            resolve_model(paths[0] + ",")


class TestEvaluatorEnsemble:
    def test_eval_epoch_is_member_mean(self, tmp_path):
        import h5py
        import pandas as pd

        from uit_mobile_tpu.ckpt.io import save_checkpoint
        from uit_mobile_tpu.data import read_tsv_data
        from uit_mobile_tpu.evaluate import Evaluator

        rng = np.random.default_rng(3)
        h5 = tmp_path / "e.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(6):
                f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
                rows.append((f"c{i}.wav", str(i % 3), str(h5)))
        tsv = tmp_path / "e.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False)

        cfg = models.get_model_config("uit_xxxs", outputdim=12,
                                      target_length=102, depth=1)
        paths = []
        for i in range(2):
            p, s = models.build(cfg, jax.random.key(10 + i))
            path = tmp_path / f"m{i}.npz"
            save_checkpoint(path, p, s, cfg)
            paths.append(str(path))

        df = read_tsv_data(tsv, basename=False)
        kw = dict(batch_size=6, num_workers=0)
        p_ens, _ = Evaluator(",".join(paths), **kw)._run_epoch(df, num_classes=12)
        p0, _ = Evaluator(paths[0], **kw)._run_epoch(df, num_classes=12)
        p1, _ = Evaluator(paths[1], **kw)._run_epoch(df, num_classes=12)
        np.testing.assert_allclose(p_ens, (p0 + p1) / 2, atol=1e-6)


class TestFramewiseEnsemble:
    def test_framewise_fn_is_member_mean(self, members):
        from uit_mobile_tpu.serve import make_framewise_fn

        cfg, params, state = members
        wav1 = np.random.default_rng(4).standard_normal(16000).astype(np.float32) * 0.1
        ens_fn = make_framewise_fn(cfg, params, state, max_seconds=2,
                                   use_pallas=False)
        probs_e, times_e = ens_fn(wav1)
        singles = []
        for p, s in zip(params, state):
            fn = make_framewise_fn(cfg, p, s, max_seconds=2, use_pallas=False)
            probs_i, times_i = fn(wav1)
            singles.append(probs_i)
            np.testing.assert_allclose(times_i, times_e)
        np.testing.assert_allclose(probs_e, np.mean(singles, axis=0), atol=1e-6)


class TestStreamingEnsemble:
    def test_multistream_tagger_accepts_member_lists(self, members):
        """Streaming builds its forward through the pipeline policy, so
        the member-list contract must hold there too (compile + run one
        scoring round)."""
        from uit_mobile_tpu.serve.streaming import (
            MultiStreamTagger, StreamingConfig,
        )

        cfg, params, state = members
        sc = StreamingConfig(window_seconds=1.0, hop_seconds=0.25,
                             use_pallas=False)
        tagger = MultiStreamTagger(cfg, params, state, n_streams=2, config=sc)
        rng = np.random.default_rng(6)
        hop = int(0.25 * 16000)
        events = []
        for _ in range(5):  # first scoring round fires after 4 hops
            events.extend(tagger.feed_all(
                rng.standard_normal((2, hop)).astype(np.float32) * 0.1))
        assert len(events) == 2 * 2  # 2 rounds x 2 streams
        assert all(e.probs.shape == (12,) for e in events)


class TestServiceEnsemble:
    def test_service_accepts_member_lists(self, members):
        from uit_mobile_tpu.serve import ServiceConfig, TaggingService

        cfg, params, state = members
        sc = ServiceConfig(batch_size=4, max_seconds=1, warmup=False)
        wav1 = np.random.default_rng(5).standard_normal(16000).astype(np.float32) * 0.1
        with TaggingService(cfg, params, state, sc) as svc:
            got = svc.submit(wav1).result(timeout=120)
        singles = []
        for p, s in zip(params, state):
            with TaggingService(cfg, p, s, sc) as one:
                singles.append(one.submit(wav1).result(timeout=120))
        np.testing.assert_allclose(got, np.mean(singles, axis=0), atol=1e-5)
