"""Mesh/data-parallel layer on the 8-virtual-device CPU platform:
sharded execution must be numerically equivalent to single-device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import (
    batch_sharded,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_inference_matches_single_device():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, 16000)).astype(np.float32) * 0.1
    )
    want = models.apply(cfg, params, state, wav)

    mesh = make_mesh()
    p_repl = replicate_tree(mesh, params)
    s_repl = replicate_tree(mesh, state)
    wav_sh = shard_batch(mesh, wav)
    fwd = jax.jit(
        lambda p, s, w: models.apply(cfg, p, s, w),
        in_shardings=(replicated(mesh), replicated(mesh), batch_sharded(mesh)),
        out_shardings=batch_sharded(mesh),
    )
    got = fwd(p_repl, s_repl, wav_sh)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dp_train_step_matches_single_device():
    import optax

    from uit_mobile_tpu.train import make_train_step
    from uit_mobile_tpu.train.steps import build_optimizer

    cfg = models.get_model_config("uit_xxxs", outputdim=37, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(1))
    optimizer = build_optimizer("AdamW", 1e-3, weight_decay=1e-8)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer)

    rng = np.random.default_rng(2)
    batch = {
        "wav": jnp.asarray(rng.standard_normal((16, 16000)).astype(np.float32) * 0.1),
        "target": jnp.asarray((rng.random((16, 37)) < 0.1).astype(np.float32)),
    }
    key = jax.random.key(0)

    p1, s1, o1, m1 = jax.jit(step)(params, state, opt_state, batch, key, None, None)

    mesh = make_mesh()
    repl, data = replicated(mesh), batch_sharded(mesh)
    step_dp = jax.jit(
        step,
        in_shardings=(repl, repl, repl, data, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
    )
    p8, s8, o8, m8 = step_dp(
        replicate_tree(mesh, params), replicate_tree(mesh, state),
        replicate_tree(mesh, opt_state), shard_batch(mesh, batch), key, None, None
    )
    # same loss and same updated params (gradient psum == full-batch grad);
    # NOTE: exact equality is not expected (reduction orders differ), but
    # agreement should be at f32-accumulation level
    assert abs(float(m1["total_loss"]) - float(m8["total_loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_data_parallel_forward_helper():
    from uit_mobile_tpu.parallel import data_parallel_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=11, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(2))
    fwd = data_parallel_forward(lambda w: models.apply(cfg, params, state, w))
    wav = jnp.asarray(
        np.random.default_rng(3).standard_normal((16, 16000)).astype(np.float32) * 0.1
    )
    got = fwd(wav)
    assert len(got.sharding.device_set) == 8
    want = models.apply(cfg, params, state, wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    import pytest

    with pytest.raises(AssertionError, match="divide"):
        fwd(wav[:3])


def test_read_wav_24bit(tmp_path):
    import wave as wave_mod

    from uit_mobile_tpu.data import read_wav

    # hand-write a 24-bit PCM file
    samples = np.asarray([0, 1 << 22, -(1 << 22), (1 << 23) - 1], dtype=np.int32)
    raw = b"".join(int(s & 0xFFFFFF).to_bytes(3, "little") for s in samples)
    p = tmp_path / "w24.wav"
    with wave_mod.open(str(p), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(16000)
        f.writeframes(raw)
    data, sr = read_wav(p)
    want = samples.astype(np.float32) / (1 << 23)
    np.testing.assert_allclose(data[0], want, atol=1e-6)


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 537)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_tfb_serving_forward_matches_single_device():
    """The serving policy path — pallas frontend (interpret on CPU) in the
    tfb layout — under shard_map DP must equal its single-device result;
    this is exactly what multi-chip tfb serving runs on hardware (each
    shard sees B/8 locally, so it also exercises the small-batch row-
    kernel fallback inside the tfb contract)."""
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.parallel import data_parallel_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=9, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    fwd = make_forward_fn(cfg, params, state, use_pallas=True,
                          top_db_mode="per_sample")
    assert fwd.uses_pallas  # forces the shard_map (manual) DP route
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 16000)).astype(np.float32) * 0.1
    )
    want = np.asarray(fwd(wav))
    got = np.asarray(data_parallel_forward(fwd)(wav))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_data_parallel_forward_multi_axis_mesh():
    """On a ('data','model') mesh only the 'data' axis size must divide
    the batch (regression: the guard demanded total-device divisibility)."""
    import numpy as np
    from jax.sharding import Mesh

    from uit_mobile_tpu import models
    from uit_mobile_tpu.parallel.mesh import data_parallel_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    fwd = data_parallel_forward(
        lambda w: models.apply(cfg, params, state, w), mesh=mesh)
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((4, 16000)).astype(np.float32) * 0.1)
    got = fwd(wav)  # batch 4 divides data=4 (total devices = 8)
    want = models.apply(cfg, params, state, wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_data_parallel_forward_refuses_torch_clamp_on_manual_route():
    """A Pallas forward with torch-mode (batch-global) top_db must refuse
    the shard_map route loudly instead of silently clamping per-shard."""
    import pytest

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.parallel.mesh import data_parallel_forward

    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    fwd_fn = make_forward_fn(cfg, params, state, use_pallas=True,
                             top_db_mode="torch")
    with pytest.raises(ValueError, match="batch-global"):
        data_parallel_forward(fwd_fn)
