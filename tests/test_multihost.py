"""Multi-host simulation: parallel.multihost exercised end-to-end in a real
2-process ``jax.distributed`` run on the CPU backend (2 virtual devices per
process -> a 4-device global mesh), the idiomatic stand-in for a 2-host TPU
slice. Verifies distributed init, the per-host batch slicing contract, and
global-array assembly via make_array_from_process_local_data feeding a
jitted reduction over the full mesh."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from uit_mobile_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    G = 8
    full = np.arange(G * 3, dtype=np.float32).reshape(G, 3)
    sl = multihost.host_local_batch_slice(G)
    # the two hosts must cover disjoint halves
    assert sl.stop - sl.start == G // nproc
    assert sl.start == pid * (G // nproc)
    gbatch = multihost.global_batch_from_host_local(mesh, {{"x": full[sl]}})
    assert gbatch["x"].shape == (G, 3), gbatch["x"].shape

    got = float(jax.jit(lambda x: x.mean())(gbatch["x"]))
    want = float(full.mean())
    assert abs(got - want) < 1e-6, (got, want)
    print(f"OK {{pid}} {{sl.start}}:{{sl.stop}} {{got}}", flush=True)
    """
).format(repo=str(REPO))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"OK {pid}" in out, out


def test_dp_placement_policy(monkeypatch):
    """Single-host: largest dividing submesh (1 -> no mesh). Multi-host:
    strict full-mesh divisibility, loud error otherwise."""
    import jax

    from uit_mobile_tpu.parallel import dp_placement

    # this test process runs the 8-virtual-device CPU platform
    mesh, data_sh, repl = dp_placement([16, 8])
    assert mesh is not None and mesh.size == 8
    assert data_sh.spec != repl.spec
    # 12 % 8 != 0 -> shrink to 4 (largest divisor of both 12 and 4... of
    # each dim); dims [12, 4] -> 4 devices
    mesh, _, _ = dp_placement([12, 4])
    assert mesh is not None and mesh.size == 4
    # a prime batch still shards over a prime submesh (7 of 8 devices)
    mesh, _, _ = dp_placement([7])
    assert mesh is not None and mesh.size == 7
    # batch of 1 -> no mesh at all
    assert dp_placement([1]) == (None, None, None)

    # multi-host: indivisible is an error, not a shrunk mesh
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="divisible by the global"):
        dp_placement([12, 4])
    mesh, _, _ = dp_placement([16, 8])
    assert mesh is not None and mesh.size == 8


def test_initialize_from_config_rejects_unknown_keys():
    from uit_mobile_tpu.parallel.multihost import initialize_from_config

    with pytest.raises(ValueError, match="unknown multihost config keys"):
        initialize_from_config({"coordinator": "x"})  # typo'd key
    initialize_from_config(None)  # falsy -> no-op
    initialize_from_config(False)


def test_explicit_multihost_request_never_degrades_silently(monkeypatch):
    """An explicit `multihost:` request whose distributed init fails must
    raise, not silently proceed un-distributed (every host would train the
    full batch independently as rank 0 — the worst outcome)."""
    import jax

    from uit_mobile_tpu.parallel import multihost

    def boom(**kw):
        raise RuntimeError("no coordinator reachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False,
                        raising=False)
    with pytest.raises(RuntimeError, match="refusing to degrade"):
        multihost.initialize_from_config(True)
    # best-effort mode (no explicit request) still tolerates the
    # single-process no-coordinator environment
    multihost.initialize()


def test_host_local_batch_slice_math(monkeypatch):
    """Slicing math standalone: disjoint equal covers; indivisible rejected."""
    import jax

    from uit_mobile_tpu.parallel import multihost

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    slices = []
    for i in range(4):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        slices.append(multihost.host_local_batch_slice(16))
    assert [(s.start, s.stop) for s in slices] == [
        (0, 4), (4, 8), (8, 12), (12, 16)
    ]
    with pytest.raises(AssertionError):
        multihost.host_local_batch_slice(7)
