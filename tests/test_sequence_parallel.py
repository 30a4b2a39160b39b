"""Sequence-parallel (ring attention over a 'seq' mesh axis) layer on the
8-virtual-device CPU platform: the K/V-rotating online-softmax ring must
reproduce the replicated dense-softmax forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import make_seq_mesh, sequence_parallel_forward


def _tiny(**kw):
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, **kw)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _wav(b, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, 16000)).astype(np.float32) * 0.1)


def test_ring_matches_replicated_across_shard_counts():
    cfg, params, state = _tiny()
    wav = _wav(8)
    want = np.asarray(models.apply(cfg, params, state, wav))
    # 24 tokens divide 1/2/4/8 shards; S=1 pins the degenerate no-ring path
    for n_shards in (1, 2, 4, 8):
        mesh = make_seq_mesh(n_shards)
        fwd = sequence_parallel_forward(cfg, params, state, mesh)
        np.testing.assert_allclose(np.asarray(fwd(wav)), want, atol=2e-5)


def test_ring_full_attention_geometry():
    # full (non-bottleneck) attention: inner_dim == D, hd=64 — a different
    # head slicing than the bneck default
    cfg, params, state = _tiny(attention_type="Attention")
    wav = _wav(4, seed=3)
    want = np.asarray(models.apply(cfg, params, state, wav))
    fwd = sequence_parallel_forward(cfg, params, state, make_seq_mesh(4))
    np.testing.assert_allclose(np.asarray(fwd(wav)), want, atol=2e-5)


def test_sequence_composes_with_data_parallel():
    cfg, params, state = _tiny()
    wav = _wav(16, seed=2)
    want = np.asarray(models.apply(cfg, params, state, wav))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    fwd = sequence_parallel_forward(cfg, params, state, mesh, data_axis="data")
    got = fwd(wav)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_ring_bf16_compute_dtype():
    # the serving bf16 mode casts matmuls, keeps LN/softmax f32 — the ring
    # must mirror block_forward's casting (looser tolerance: bf16 products)
    cfg, params, state = _tiny(compute_dtype="bfloat16")
    wav = _wav(4, seed=4)
    want = np.asarray(models.apply(cfg, params, state, wav))
    fwd = sequence_parallel_forward(cfg, params, state, make_seq_mesh(4))
    np.testing.assert_allclose(np.asarray(fwd(wav)), want, atol=5e-3)


def test_rejects_indivisible_tokens():
    # 24 tokens over 5 shards
    cfg, params, state = _tiny()
    mesh = make_seq_mesh(5)
    try:
        sequence_parallel_forward(cfg, params, state, mesh)
    except AssertionError as e:
        assert "shards" in str(e)
    else:
        raise AssertionError("24 tokens over 5 shards should be rejected")


def test_ring_short_clip_mean_pool():
    """A shorter-than-target_length clip yields fewer tokens (16 vs the
    grid's 24); the psum mean pool must divide by the ACTUAL count to
    match the dense path (regression: it divided by the config grid N)."""
    cfg, params, state = _tiny()
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((4, 10240)).astype(np.float32) * 0.1)
    want = np.asarray(models.apply(cfg, params, state, wav))
    fwd = sequence_parallel_forward(cfg, params, state, make_seq_mesh(4))
    np.testing.assert_allclose(np.asarray(fwd(wav)), want, atol=2e-5)
