"""Offline PSL: cached-teacher targets == the in-step teacher's, the
train step goes teacher-free, and every failure is loud.

The reference runs its frozen MobileNetV2 inside every training step
(run.py:199-202); data.psl_cache precomputes those probabilities on a
hop-aligned crop grid once, so `psl: {mode: offline}` trains with the
plain step (the teacher was 26% of the frontier step, PERF_NOTES r4).
"""

import random

import h5py
import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.data import read_tsv_data
from uit_mobile_tpu.data.psl_cache import (
    PSLCachedRandomCropHDF5Dataset,
    _apply_start,
    build_psl_cache,
    cache_starts,
)

L = 16000
GRID = 1600
C_T = 527


# ------------------------------------------------------------- grid rule
def test_cache_starts_rule():
    # long clip: crop starts cover [0, n-L) on the grid
    assert cache_starts(16000 + 4000, L, GRID) == [0, 1600, 3200]
    # exact length: the identity crop
    assert cache_starts(L, L, GRID) == [0]
    # short clip: pad offsets cover [0, L-n) on the grid
    assert cache_starts(L - 4000, L, GRID) == [0, 1600, 3200]
    # sub-grid span still yields one start
    assert cache_starts(L + 100, L, GRID) == [0]
    assert cache_starts(L - 1, L, GRID) == [0]


# ------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Toy audioset half: short / exact / long clips + a tiny teacher."""
    tmp = tmp_path_factory.mktemp("psl_offline")
    rng = np.random.default_rng(11)
    h5 = tmp / "as.h5"
    lengths = [12000, 16000, 20000, 23500, 9000]
    rows = []
    with h5py.File(h5, "w") as f:
        for i, n in enumerate(lengths):
            f[f"as_{i}.wav"] = (rng.standard_normal(n) * 3000).astype(np.int16)
            rows.append((f"as_{i}.wav", str(int(rng.integers(0, C_T))), str(h5)))
    tsv = tmp / "as.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)

    t_cfg = models.get_model_config("MobileNetV2", outputdim=C_T,
                                    width_mult=0.25)
    t_params, t_state = models.build(t_cfg, jax.random.key(5))
    fwd = jax.jit(lambda w: models.apply(t_cfg, t_params, t_state, w))

    cache = tmp / "psl_cache.h5"
    summary = build_psl_cache(
        read_tsv_data(tsv, basename=True),
        lambda w: np.asarray(fwd(jnp.asarray(w))),
        cache, chunk_length=1.0, grid=GRID, batch_size=8,
        teacher_name="toy-mbv2")
    return dict(tmp=tmp, h5=h5, tsv=tsv, cache=cache, summary=summary,
                teacher=(t_cfg, t_params, t_state), fwd=fwd,
                lengths=lengths)


def test_cache_contents_match_direct_teacher(world):
    """Every cached row == the teacher's probs on the reconstructed crop,
    to f16 storage rounding."""
    t_cfg, t_params, t_state = world["teacher"]
    with h5py.File(world["cache"], "r") as c, h5py.File(world["h5"], "r") as src:
        assert c.attrs["grid"] == GRID
        assert c.attrs["chunk_length"] == L
        assert c.attrs["classes"] == C_T
        assert c.attrs["teacher"] == "toy-mbv2"
        for i, n in enumerate(world["lengths"]):
            fname = f"as_{i}.wav"
            starts = cache_starts(n, L, GRID)
            assert c[fname].shape == (len(starts), C_T)
            wav = src[fname][:]
            crops = np.stack([_apply_start(wav, L, s) for s in starts])
            ref = np.asarray(world["fwd"](jnp.asarray(crops)))
            got = np.asarray(c[fname][:], dtype=np.float32)
            # f16 probability storage: absolute error <= 2^-11 ~ 4.9e-4
            np.testing.assert_allclose(got, ref, atol=5e-4)


def test_expected_crop_count(world):
    exp = sum(len(cache_starts(n, L, GRID)) for n in world["lengths"])
    assert world["summary"]["crops"] == exp
    assert world["summary"]["clips"] == len(world["lengths"])


def test_dataset_emits_grid_crop_and_cached_target(world):
    df = read_tsv_data(world["tsv"], basename=True)
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=world["cache"],
        rng=random.Random(3))
    with h5py.File(world["h5"], "r") as src, h5py.File(world["cache"], "r") as c:
        for idx in range(len(ds)):
            for _ in range(4):  # several draws exercise the grid
                wav, target, fname = ds[idx]
                assert wav.shape == (L,)
                full = src[fname][:]
                n = full.shape[-1]
                starts = cache_starts(n, L, GRID)
                # identify which grid start produced this crop
                matches = [
                    gi for gi, s in enumerate(starts)
                    if np.array_equal(wav.astype(np.float32),
                                      _apply_start(full, L, s).astype(np.float32)
                                      / 32768.0)
                ]
                assert matches, f"{fname}: crop not on the cache grid"
                gi = matches[0]
                np.testing.assert_array_equal(
                    target[:C_T],
                    np.asarray(c[fname][gi], dtype=np.float32))
                # ground-truth labels beyond the teacher range survive
                # (read_tsv_data parses ';'-joined labels into int lists)
                for lab in map(int, df.iloc[idx]["labels"]):
                    if lab >= C_T:
                        assert target[lab] == 1.0


def test_offline_step_equals_online_psl_to_f16(world):
    """One flat-PSL train step with the teacher vs the plain step with
    cached targets, SAME crops: losses agree to f16-target rounding."""
    import optax

    from uit_mobile_tpu.train.steps import make_train_step

    t_cfg, t_params, t_state = world["teacher"]
    cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adam(1e-3)

    df = read_tsv_data(world["tsv"], basename=True)
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=world["cache"],
        rng=random.Random(7))
    rows = [ds[i] for i in range(4)]
    as_wav = np.stack([r[0] for r in rows])
    as_cached = np.stack([r[1] for r in rows])
    rng = np.random.default_rng(8)
    kws_wav = (rng.standard_normal((4, L)) * 0.05).astype(np.float32)
    kws_tgt = np.zeros((4, 537), np.float32)
    kws_tgt[np.arange(4), 527 + np.arange(4)] = 1.0

    wav = np.concatenate([as_wav, kws_wav])
    # online targets: ground truth, teacher overwrites in-step
    gt = as_cached.copy()
    gt[:, :C_T] = 0.0
    online_tgt = np.concatenate([gt, kws_tgt])
    offline_tgt = np.concatenate([as_cached, kws_tgt])

    key = jax.random.key(9)
    o0 = opt.init(params)
    online_step = make_train_step(cfg, opt, psl_cfg=t_cfg, psl_split=4)
    _, _, _, m_on = online_step(params, state, o0,
                                {"wav": jnp.asarray(wav),
                                 "target": jnp.asarray(online_tgt)},
                                key, t_params, t_state)
    plain_step = make_train_step(cfg, opt)
    _, _, _, m_off = plain_step(params, state, o0,
                                {"wav": jnp.asarray(wav),
                                 "target": jnp.asarray(offline_tgt)}, key)
    # identical math up to the f16 rounding of the cached teacher probs
    assert abs(float(m_on["total_loss"]) - float(m_off["total_loss"])) < 1e-3


def test_missing_clip_is_loud(world, tmp_path):
    df = read_tsv_data(world["tsv"], basename=True).copy()
    extra_h5 = tmp_path / "extra.h5"
    with h5py.File(extra_h5, "w") as f:
        f["ghost.wav"] = np.zeros(16000, np.int16)
    df.loc[len(df)] = {"filename": "ghost.wav", "labels": "1",
                       "hdf5path": str(extra_h5)}
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=world["cache"],
        rng=random.Random(1))
    with pytest.raises(KeyError, match="ghost.wav.*rebuild|rebuild.*ghost.wav"):
        ds[len(df) - 1]


def test_chunk_length_mismatch_is_loud(world):
    df = read_tsv_data(world["tsv"], basename=True)
    with pytest.raises(ValueError, match="chunk_length"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=2.0, num_classes=537,
            cache_path=world["cache"])


def test_changed_clip_length_is_loud(world, tmp_path):
    """A clip whose audio changed since the cache was built must raise,
    not serve stale teacher targets."""
    h5 = tmp_path / "changed.h5"
    with h5py.File(h5, "w") as f:
        f["as_3.wav"] = np.zeros(40000, np.int16)  # cache built at 23500
    df = pd.DataFrame([("as_3.wav", "1", str(h5))],
                      columns=["filename", "labels", "hdf5path"])
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=world["cache"],
        rng=random.Random(1))
    with pytest.raises(ValueError, match="audio changed"):
        ds[0]


def test_not_a_cache_is_loud(world):
    df = read_tsv_data(world["tsv"], basename=True)
    with pytest.raises(ValueError, match="not a PSL cache"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=1.0, num_classes=537,
            cache_path=world["h5"])  # a waveform file, not a cache


def test_cli_builds_cache(world, tmp_path):
    """uit-psl-cache end-to-end with a saved teacher checkpoint."""
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.cli.psl_cache import main

    t_cfg, t_params, t_state = world["teacher"]
    ckpt = tmp_path / "teacher.npz"
    save_checkpoint(ckpt, t_params, t_state, t_cfg)
    out = tmp_path / "cache_cli.h5"
    rc = main([str(world["tsv"]), "-t", str(ckpt), "-o", str(out),
               "--grid", str(GRID), "--batch-size", "8"])
    assert rc == 0
    with h5py.File(out, "r") as a, h5py.File(world["cache"], "r") as b:
        for k in b:
            np.testing.assert_array_equal(a[k][:], b[k][:])


def test_trainer_offline_mode_trains(tmp_path, world):
    """End-to-end: psl: {mode: offline} -> cached dataset + teacher-free
    step -> averaged checkpoint."""
    from uit_mobile_tpu.train.loop import train_from_config

    # reuse the module-scoped audioset world; make a kws side + eval sides
    rng = np.random.default_rng(21)

    def make(name, n, label_pool):
        h5 = tmp_path / f"{name}.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(n):
                f[f"{name}_{i}.wav"] = (
                    rng.standard_normal(16000) * 3000).astype(np.int16)
                rows.append((f"{name}_{i}.wav",
                             str(int(rng.choice(label_pool))), str(h5)))
        tsv = tmp_path / f"{name}.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False)
        return str(tsv)

    cfg = dict(
        outputpath=str(tmp_path / "exp"),
        num_classes=537,
        model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1},
        batch_size=8,
        epochs=1,
        epoch_length=2,
        warmup_iters=2,
        chunk_length=1.0,
        optimizer="AdamW",
        optimizer_args={"lr": 1e-3},
        n_saved=1,
        num_workers=2,
        valid_every=1,
        seed=0,
        config_stem="psl_offline",
        mixup=0.3,
        psl={"mode": "offline", "cache": str(world["cache"])},
        audioset_train_data=str(world["tsv"]),
        audioset_eval_data=make("aseval", 4, np.arange(0, 527)),
        kws_train_data=make("kwstrain", 8, np.arange(527, 537)),
        kws_test_data=make("kwseval", 4, np.arange(527, 537)),
    )
    out = train_from_config(cfg)
    assert out.exists()


def test_trainer_offline_missing_cache_is_loud(tmp_path, world):
    from uit_mobile_tpu.train.loop import train_from_config

    cfg = dict(
        outputpath=str(tmp_path / "exp2"),
        model="uit_xxxs", model_args={"target_length": 102, "depth": 1},
        batch_size=8, epochs=1, epoch_length=1, chunk_length=1.0,
        config_stem="x",
        psl={"mode": "offline", "cache": str(tmp_path / "nope.h5")},
        audioset_train_data=str(world["tsv"]),
        audioset_eval_data=str(world["tsv"]),
        kws_train_data=str(world["tsv"]),
        kws_test_data=str(world["tsv"]),
    )
    with pytest.raises(FileNotFoundError, match="PSL cache"):
        train_from_config(cfg)


# ------------------------------------------------------------- shards
@pytest.fixture(scope="module")
def shards(world, tmp_path_factory):
    """The same world built as two --shard i/2 files by two 'hosts'."""
    tmp = tmp_path_factory.mktemp("psl_shards")
    df = read_tsv_data(world["tsv"], basename=True)
    paths = []
    for i in range(2):
        p = tmp / f"cache.{i}of2.h5"
        build_psl_cache(
            df, lambda w: np.asarray(world["fwd"](jnp.asarray(w))),
            p, chunk_length=1.0, grid=GRID, batch_size=8,
            teacher_name="toy-mbv2", shard=(i, 2))
        paths.append(p)
    return dict(tmp=tmp, paths=paths)


def test_shard_union_equals_single_cache(world, shards):
    """Every clip lands in exactly one shard; its rows are byte-equal to
    the single-file build's (same teacher, same grid)."""
    seen = {}
    for p in shards["paths"]:
        with h5py.File(p, "r") as f:
            assert f.attrs["shard_count"] == 2
            for fname in f.keys():
                assert fname not in seen, f"{fname} in two shards"
                seen[fname] = np.asarray(f[fname][:])
    with h5py.File(world["cache"], "r") as c:
        assert set(seen) == set(c.keys())
        for fname, rows in seen.items():
            np.testing.assert_array_equal(rows, np.asarray(c[fname][:]))


def test_sharded_dataset_equals_single(world, shards):
    """The reader over [shard0, shard1] draws the SAME crops/targets as
    over the single cache (identical rng stream, identical rows)."""
    df = read_tsv_data(world["tsv"], basename=True)
    ds1 = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=world["cache"],
        rng=random.Random(13))
    ds2 = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537,
        cache_path=[str(p) for p in shards["paths"]], rng=random.Random(13))
    for idx in range(len(ds1)):
        w1, t1, f1 = ds1[idx]
        w2, t2, f2 = ds2[idx]
        assert f1 == f2
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(t1, t2)


def test_shard_glob_resolves(world, shards):
    df = read_tsv_data(world["tsv"], basename=True)
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537,
        cache_path=str(shards["tmp"] / "cache.*of2.h5"),
        rng=random.Random(2))
    wav, target, fname = ds[0]
    assert wav.shape == (L,)


def test_incomplete_shard_set_is_loud(world, shards):
    df = read_tsv_data(world["tsv"], basename=True)
    with pytest.raises(ValueError, match="incomplete PSL shard set"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=1.0, num_classes=537,
            cache_path=[str(shards["paths"][0])], rng=random.Random(2))


def test_mixed_build_shards_are_loud(world, shards, tmp_path):
    """A shard built on a different grid is not 'one build' — refuse."""
    df = read_tsv_data(world["tsv"], basename=True)
    odd = tmp_path / "odd.h5"
    build_psl_cache(
        df, lambda w: np.asarray(world["fwd"](jnp.asarray(w))),
        odd, chunk_length=1.0, grid=3200, batch_size=8, shard=(1, 2))
    with pytest.raises(ValueError, match="disagree on grid"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=1.0, num_classes=537,
            cache_path=[str(shards["paths"][0]), str(odd)],
            rng=random.Random(2))


def test_resolve_cache_paths_failures(tmp_path):
    from uit_mobile_tpu.data.psl_cache import resolve_cache_paths

    with pytest.raises(FileNotFoundError, match="does not exist"):
        resolve_cache_paths(str(tmp_path / "nope.h5"))
    with pytest.raises(FileNotFoundError, match="matches no files"):
        resolve_cache_paths(str(tmp_path / "cache.*of4.h5"))


def test_shard_cli_arg_validation(world, tmp_path):
    from uit_mobile_tpu.cli import psl_cache as cli

    with pytest.raises(SystemExit):
        cli.main([str(world["tsv"]), "-t", "x", "-o", str(tmp_path / "o.h5"),
                  "--shard", "4"])
    with pytest.raises(SystemExit):
        cli.main([str(world["tsv"]), "-t", "x", "-o", str(tmp_path / "o.h5"),
                  "--shard", "2/2"])


def test_mixed_teacher_shards_are_loud(world, shards, tmp_path):
    """Same grid/classes but a DIFFERENT teacher build must not pass the
    one-build check (the cached targets would silently mix teachers)."""
    df = read_tsv_data(world["tsv"], basename=True)
    other = tmp_path / "other_teacher.1of2.h5"
    build_psl_cache(
        df, lambda w: np.asarray(world["fwd"](jnp.asarray(w))),
        other, chunk_length=1.0, grid=GRID, batch_size=8,
        teacher_name="retrained-mbv2", shard=(1, 2))
    with pytest.raises(ValueError, match="disagree on teacher"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=1.0, num_classes=537,
            cache_path=[str(shards["paths"][0]), str(other)],
            rng=random.Random(2))


def test_duplicate_shard_clips_are_loud(world, shards):
    """The same shard passed twice (or two builds of the same index) is
    not a complete set — refuse before serving last-wins targets."""
    df = read_tsv_data(world["tsv"], basename=True)
    with pytest.raises(ValueError, match="appears in two PSL shards|duplicate PSL shard"):
        PSLCachedRandomCropHDF5Dataset(
            df, chunk_length=1.0, num_classes=537,
            cache_path=[str(shards["paths"][0]), str(shards["paths"][0]),
                        str(shards["paths"][1])],
            rng=random.Random(2))


def test_empty_shard_in_complete_set_is_tolerated(world, tmp_path):
    """More prep hosts than clips: a shard with zero manifest rows
    (attrs classes=0) must not poison the consistency check."""
    df = read_tsv_data(world["tsv"], basename=True)
    n = len(df) + 2  # guarantees at least one empty stride
    paths = []
    for i in range(n):
        p = tmp_path / f"wide.{i}of{n}.h5"
        build_psl_cache(
            df, lambda w: np.asarray(world["fwd"](jnp.asarray(w))),
            p, chunk_length=1.0, grid=GRID, batch_size=8,
            teacher_name="toy-mbv2", shard=(i, n))
        paths.append(str(p))
    ds = PSLCachedRandomCropHDF5Dataset(
        df, chunk_length=1.0, num_classes=537, cache_path=paths,
        rng=random.Random(5))
    wav, target, fname = ds[0]
    assert wav.shape == (L,)
    assert ds._psl_classes == C_T
