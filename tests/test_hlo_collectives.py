"""Compiled-HLO collective inspection (round-4 VERDICT next-6): the
multi-chip story's drift assertions say the MATH is right; these tests
pin WHICH collectives the compiled programs contain, so a future change
that silently inserts a resharding collective into a hot path fails a
test instead of shipping a slow program.

Counts are measured on this environment's pinned JAX/XLA on the 8-device
CPU mesh. If a JAX upgrade shifts a count, re-derive it by rerunning the
program and reading the new compiled text — the test's job is to make
that a CONSCIOUS step. Collective kinds matter more than totals:
all-to-all / collective-permute appearing in a path that had none is the
resharding smell these tests exist to catch.

One CPU-backend artifact to know: the pure-JAX frontend's rfft lowers to
an XLA fft op the CPU SPMD partitioner cannot shard, so it all-gathers
the batch (1 all-gather). The TPU serving path has no fft op at all —
the frontend is the Pallas DFT-matmul kernel — so that all-gather does
not exist on the real chip (PERF_NOTES round 1-2 kernel design).
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.ops.pipeline import make_forward_fn
from uit_mobile_tpu.train.steps import make_train_step

KINDS = ("all-reduce", "all-gather", "reduce-scatter",
         "collective-permute", "all-to-all")


def _counts(jitted, *args) -> dict:
    txt = jitted.lower(*args).compile().as_text()
    return {k: len(re.findall(k + r"[-.(]", txt)) for k in KINDS}


@pytest.fixture(scope="module")
def tiny():
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


@pytest.fixture(scope="module")
def dp_mesh():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    return mesh, NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def test_dp_serving_per_sample_has_no_coupling_collectives(tiny, dp_mesh):
    """Per-sample top_db DP serving: each shard scores its rows
    independently — ZERO all-reduce/permute/all-to-all. (The 1 all-gather
    is the CPU backend's unsharded fft; the TPU path has no fft op.)"""
    cfg, params, state = tiny
    _, _, dsh = dp_mesh
    fwd = make_forward_fn(cfg, params, state, use_pallas=False,
                          top_db_mode="per_sample")
    c = _counts(jax.jit(fwd, in_shardings=(dsh,), out_shardings=dsh),
                jnp.zeros((16, 16000), jnp.float32))
    assert c["all-reduce"] == 0, c
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c
    assert c["reduce-scatter"] == 0, c
    assert c["all-gather"] <= 1, c  # the CPU fft artifact only


def test_dp_serving_torch_clamp_couples_with_exactly_one_allreduce(tiny, dp_mesh):
    """torch-mode top_db takes a BATCH-GLOBAL max — across shards that is
    exactly one all-reduce (the documented routing-policy cost,
    parallel/mesh.py: serving defaults to per-sample to avoid it)."""
    cfg, params, state = tiny
    _, _, dsh = dp_mesh
    fwd = make_forward_fn(cfg, params, state, use_pallas=False,
                          top_db_mode="torch")
    c = _counts(jax.jit(fwd, in_shardings=(dsh,), out_shardings=dsh),
                jnp.zeros((16, 16000), jnp.float32))
    assert c["all-reduce"] == 1, c
    assert c["collective-permute"] == 0 and c["all-to-all"] == 0, c


def test_dp_train_step_collectives_pinned(tiny, dp_mesh):
    """DP train step (batch sharded, params replicated): gradient
    all-reduces only — NO resharding permutes/all-to-alls. The exact
    all-reduce count is this XLA version's post-combiner grouping of the
    per-parameter gradient reductions (+ loss/grad-norm scalars); a
    CHANGE in it means the gradient-reduction structure changed."""
    cfg, params, state = tiny
    _, repl, dsh = dp_mesh
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt)
    js = jax.jit(step, in_shardings=(repl, repl, repl,
                                     {"wav": dsh, "target": dsh}, repl))
    c = _counts(js, params, state, opt.init(params),
                {"wav": jnp.zeros((16, 16000), jnp.float32),
                 "target": jnp.zeros((16, 37), jnp.float32)},
                jax.random.key(0))
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c
    assert c["reduce-scatter"] == 0, c
    assert c["all-gather"] <= 1, c  # the CPU fft artifact only
    assert c["all-reduce"] > 0, c  # gradients MUST sync across shards


def test_dp_train_mixup_adds_flip_permutes_only(tiny, dp_mesh):
    """Mixup's flipped-batch convex combination crosses shard boundaries
    on the sharded batch axis — collective-permutes appear, but still no
    all-to-all (a resharding would show up as one)."""
    cfg, params, state = tiny
    _, repl, dsh = dp_mesh
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, mixup_alpha=0.3)
    js = jax.jit(step, in_shardings=(repl, repl, repl,
                                     {"wav": dsh, "target": dsh}, repl))
    c = _counts(js, params, state, opt.init(params),
                {"wav": jnp.zeros((16, 16000), jnp.float32),
                 "target": jnp.zeros((16, 37), jnp.float32)},
                jax.random.key(0))
    assert c["collective-permute"] > 0, c  # the flip
    assert c["all-to-all"] == 0, c
    assert c["reduce-scatter"] == 0, c


def test_tp_mlp_sharding_allreduce_count(tiny):
    """Megatron MLP sharding (col fc1, row fc2) costs ONE all-reduce per
    block's fc2 plus one for the col-sharded head's gather-free output
    sum — depth 2 compiles to a small fixed set with no permutes."""
    from uit_mobile_tpu.parallel import make_mesh_2d, tensor_parallel_forward

    cfg, params, state = tiny
    mesh = make_mesh_2d(4, 2)
    fwd = tensor_parallel_forward(
        lambda p, s, w: models.apply(cfg, p, s, w), mesh, params, state)
    c = _counts(jax.jit(fwd), jnp.zeros((16, 16000), jnp.float32))
    assert c["all-reduce"] == 7, c  # re-derive on a JAX upgrade
    assert c["collective-permute"] == 0 and c["all-to-all"] == 0, c


def test_sp_ring_permute_count(tiny):
    """The SP ring rotates K/V blocks S-1 times per attention: depth 2 at
    S=4 compiles to exactly 4 collective-permutes (XLA merges the K and V
    hops per rotation across the scan) and no all-gather."""
    from uit_mobile_tpu.parallel import make_seq_mesh, sequence_parallel_forward

    cfg, params, state = tiny
    fwd = sequence_parallel_forward(cfg, params, state, make_seq_mesh(4))
    c = _counts(jax.jit(fwd), jnp.zeros((8, 16000), jnp.float32))
    assert c["collective-permute"] == 4, c  # re-derive on a JAX upgrade
    assert c["all-to-all"] == 0 and c["all-gather"] == 0, c


def test_pp_stage_permute_count(tiny):
    """GPipe stages hand activations to the next stage over ONE
    collective-permute; nothing else crosses stage boundaries."""
    from uit_mobile_tpu.parallel import make_pipe_mesh, pipeline_forward

    cfg, params, state = tiny
    fwd = pipeline_forward(cfg, params, state, make_pipe_mesh(2))
    c = _counts(jax.jit(fwd), jnp.zeros((8, 16000), jnp.float32))
    assert c["collective-permute"] == 1, c
    assert c["all-to-all"] == 0 and c["all-gather"] == 0, c
