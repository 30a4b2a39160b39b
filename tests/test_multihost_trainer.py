"""Multi-host TRAINING end-to-end: the full Trainer (PSL distillation,
mixup, validation, top-k checkpoints, averaging, early-stop bookkeeping)
run as a real 2-process ``jax.distributed`` job on the CPU backend
(2 virtual devices per process -> a 4-device global mesh) — the idiomatic
stand-in for a 2-host TPU slice.

What this pins:
- ``multihost:`` config key -> distributed init before any backend touch;
- per-host loaders produce 1/n_proc of the GLOBAL batch and
  device_prefetch assembles the globally sharded batch
  (make_array_from_process_local_data);
- PSL batches stay in DICT form so the in-step concatenate restores the
  [all audioset, all kws] global row order (the flat psl_split slice
  would mix halves under process-interleaved assembly);
- every rank takes identical control decisions (validation scores are
  collective results over identical data -> bitwise-equal across ranks);
- rank 0 is the only writer: checkpoints/averaged.npz/last.npz exist in
  rank 0's outputdir and nowhere else.
"""

import os
import re
import subprocess
import sys
import textwrap
from pathlib import Path

import h5py
import numpy as np
import pandas as pd

from test_multihost import _free_port

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import json, sys
    rank, nproc, port, datadir, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5])
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    env = json.loads((os.path.join(datadir, "env.json") and
                      open(os.path.join(datadir, "env.json")).read()))
    config = dict(
        multihost=dict(coordinator_address=f"127.0.0.1:{{port}}",
                       num_processes=nproc, process_id=rank),
        outputpath=outdir,
        num_classes=537,
        model="uit_xxxs",
        model_args={{"target_length": 102, "depth": 1}},
        batch_size=8,
        epochs=2,
        epoch_length=2,
        warmup_iters=2,
        chunk_length=1.0,
        mixup=0.2,
        psl={{"model": "MobileNetV2", "pretrained": "/nonexistent.npz",
             "allow_untrained": True, "outputdim": 527}},
        optimizer="AdamW",
        optimizer_args={{"lr": 1e-3, "weight_decay": 1e-8}},
        early_stop=10,
        n_saved=2,
        num_workers=1,
        eval_batch_size=8,
        valid_every=1,
        seed=0,
        config_stem="mh",
        **env,
    )
    from uit_mobile_tpu.train.loop import train_from_config

    out = train_from_config(config)
    assert jax.process_count() == nproc, jax.process_count()
    print(f"DONE {{rank}} {{out}}", flush=True)
    """
).format(repo=str(REPO))


PRELUDE = textwrap.dedent(
    """
    import json, sys
    rank, nproc, port, datadir, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5])
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    multihost = dict(coordinator_address=f"127.0.0.1:{{port}}",
                     num_processes=nproc, process_id=rank)
    """
).format(repo=str(REPO))


def _spawn(tmp_path, worker_src, datadir, outdirs, timeout=600):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
    port = _free_port()
    child_env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), "2", str(port),
             str(datadir), str(outdirs[r])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=child_env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"DONE {r}" in out, out
    return outs


def _make_world(tmp_path: Path) -> dict:
    """Tiny shared synthetic AudioSet+KWS world (both ranks read it)."""
    rng = np.random.default_rng(0)

    def make(name, n, label_pool):
        h5 = tmp_path / f"{name}.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(n):
                L = int(rng.integers(12000, 17000))
                f[f"{name}_{i}.wav"] = (
                    rng.standard_normal(L) * 3000).astype(np.int16)
                lab = ";".join(
                    map(str, rng.choice(label_pool, size=2, replace=False)))
                rows.append((f"{name}_{i}.wav", lab, str(h5)))
        tsv = tmp_path / f"{name}.tsv"
        pd.DataFrame(
            rows, columns=["filename", "labels", "hdf5path"]
        ).to_csv(tsv, sep="\t", index=False)
        return str(tsv)

    return dict(
        audioset_train_data=make("astrain", 12, np.arange(0, 527)),
        audioset_eval_data=make("aseval", 6, np.arange(0, 527)),
        kws_train_data=make("kwstrain", 12, np.arange(527, 537)),
        kws_test_data=make("kwseval", 6, np.arange(527, 537)),
    )


def test_two_process_trainer(tmp_path):
    import json

    datadir = tmp_path / "data"
    datadir.mkdir()
    env = _make_world(datadir)
    (datadir / "env.json").write_text(json.dumps(env))
    outdirs = [tmp_path / f"exp{r}" for r in range(2)]
    outs = _spawn(tmp_path, WORKER, datadir, outdirs)

    # both ranks saw the 4-device global mesh and announced their rank
    assert "data-parallel over 4 devices" in outs[0]
    assert re.search(r"multi-host: process 1/2", outs[1]), outs[1]

    # identical control flow: per-epoch validation scores match bitwise
    # (same eval data, same global params -> same collective result)
    def scores(text):
        return re.findall(r"Validation Results - Epoch : (\S+)\s+.*?mAP (\d\.\d+)",
                          text)

    s0, s1 = scores(outs[0]), scores(outs[1])
    assert s0 and len(s0) >= 2, outs[0]
    # rank 1 skips the rank-0-only averaged-model validation
    assert s1 == s0[: len(s1)], (s0, s1)

    # rank 0 is the only writer
    rank0_npz = sorted(outdirs[0].rglob("*.npz"))
    assert any(p.name == "averaged.npz" for p in rank0_npz), rank0_npz
    assert any(p.name == "last.npz" for p in rank0_npz), rank0_npz
    assert sorted(outdirs[1].rglob("*.npz")) == []
    # ... but rank 1 still logged the run into its own sink
    rank1_logs = sorted(outdirs[1].rglob("train.rank1.log"))
    assert rank1_logs, sorted(outdirs[1].rglob("*"))


SED_WORKER = PRELUDE + textwrap.dedent(
    """
    from uit_mobile_tpu.train.sed import train_sed_from_config

    out = train_sed_from_config(dict(
        multihost=multihost,
        outputpath=outdir,
        num_classes=10,
        model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1},
        strong_train_data=os.path.join(datadir, "sed.tsv"),
        strong_eval_data=os.path.join(datadir, "sed.tsv"),
        basename=False,
        batch_size=8,
        epochs=2,
        epoch_length=2,
        warmup_iters=2,
        optimizer="AdamW",
        optimizer_args={"lr": 1e-3},
        num_workers=1,
        seed=0,
        config_stem="mhsed",
    ))
    print(f"DONE {rank} {out}", flush=True)
    """
)


def _make_sed_world(datadir: Path) -> None:
    """Tiny strong-label world (tone bursts in one half of each clip)."""
    rng = np.random.default_rng(0)
    sr = 16000
    h5 = datadir / "sed.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(16):
            cls = i % 2
            half = (i // 2) % 2
            clip = (rng.standard_normal(sr) * 120).astype(np.int16)
            t = np.arange(sr // 2) / sr
            tone = np.sin(2 * np.pi * (600 + 2400 * cls) * t) * 12000
            lo = half * (sr // 2)
            clip[lo:lo + sr // 2] += tone.astype(np.int16)
            f[f"c_{i}.wav"] = clip
            rows.append((f"c_{i}.wav", str(cls), str(h5),
                         lo / sr, (lo + sr // 2) / sr))
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                "from", "to"]).to_csv(
        datadir / "sed.tsv", sep="\t", index=False)


def test_two_process_sed(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    _make_sed_world(datadir)
    outdirs = [tmp_path / f"exp{r}" for r in range(2)]
    outs = _spawn(tmp_path, SED_WORKER, datadir, outdirs)

    assert "data-parallel over 4 devices" in outs[0]
    # identical per-epoch scores across ranks (collective validation)
    def scores(text):
        return re.findall(r"segF1 micro (\d\.\d+) macro (\d\.\d+)", text)

    assert scores(outs[0]) and scores(outs[0]) == scores(outs[1])
    # rank 0 is the only writer
    assert sorted(p.name for p in outdirs[0].rglob("*.npz")) and \
        sorted(outdirs[1].rglob("*.npz")) == []


PRETRAIN_WORKER = PRELUDE + textwrap.dedent(
    """
    from uit_mobile_tpu.train.pretrain import pretrain_from_config

    out = pretrain_from_config(dict(
        multihost=multihost,
        outputpath=outdir,
        model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1},
        decoder_depth=1,
        train_data=os.path.join(datadir, "unlabeled.tsv"),
        chunk_length=1.0,
        batch_size=8,
        epochs=2,
        epoch_length=2,
        warmup_iters=2,
        num_workers=1,
        seed=0,
    ))
    assert os.path.exists(out) == (rank == 0), (rank, out)
    print(f"DONE {rank} {out}", flush=True)
    """
)


def test_two_process_pretrain(tmp_path):
    datadir = tmp_path / "data"
    datadir.mkdir()
    rng = np.random.default_rng(0)
    h5 = datadir / "unlab.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(16):
            L = int(rng.integers(12000, 17000))
            f[f"u_{i}.wav"] = (rng.standard_normal(L) * 3000).astype(np.int16)
            rows.append((f"u_{i}.wav", "0", str(h5)))
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        datadir / "unlabeled.tsv", sep="\t", index=False)

    outdirs = [tmp_path / f"exp{r}" for r in range(2)]
    outs = _spawn(tmp_path, PRETRAIN_WORKER, datadir, outdirs)

    assert "data-parallel over 4 devices" in outs[0]
    # identical per-epoch losses across ranks (one collective program)
    def losses(text):
        return re.findall(r"MAE epoch \d+: loss (\d\.\d+)", text)

    assert len(losses(outs[0])) == 2 and losses(outs[0]) == losses(outs[1])
    # rank 0 is the only writer
    assert (outdirs[0] / "mae" / "uit_xxxs" / "mae_pretrained.npz").exists()
    assert sorted(outdirs[1].rglob("*.npz")) == []


def test_launch_multihost_tool(tmp_path):
    """tools/launch_multihost.py drives the real CLI surface: 2 local
    processes, coordinator wiring, rank-prefixed output, rank-0 artifact."""
    import yaml

    datadir = tmp_path / "data"
    datadir.mkdir()
    rng = np.random.default_rng(0)
    h5 = datadir / "u.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(8):
            f[f"u_{i}.wav"] = (rng.standard_normal(14000) * 3000).astype(np.int16)
            rows.append((f"u_{i}.wav", "0", str(h5)))
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        datadir / "unlab.tsv", sep="\t", index=False)
    cfg = dict(
        model="uit_xxxs", model_args={"target_length": 102, "depth": 1},
        decoder_depth=1, train_data=str(datadir / "unlab.tsv"),
        chunk_length=1.0, batch_size=8, epochs=1, epoch_length=1,
        warmup_iters=1, num_workers=1, seed=0,
        outputpath=str(tmp_path / "exp"),
    )
    cfg_path = tmp_path / "mh.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "launch_multihost.py"),
         "2", "pretrain", str(cfg_path)],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[rank 0]" in proc.stdout and "[rank 1]" in proc.stdout
    assert (tmp_path / "exp" / "mae" / "uit_xxxs" / "mae_pretrained.npz").exists()


def test_launch_multihost_auto_resume(tmp_path):
    """Pod-scale fault tolerance, end to end: rank 1 crashes after epoch 1
    (injected via UIT_FAULT_EPOCH), the launcher takes the whole pod down
    and relaunches every rank with --resume auto, and the restarted run
    resumes from last.npz and finishes — rank-0 deliverable present, at
    most one epoch lost."""
    import yaml

    datadir = tmp_path / "data"
    datadir.mkdir()
    world = _make_world(datadir)
    cfg = dict(
        num_classes=537, model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1},
        batch_size=8, epochs=2, epoch_length=2, warmup_iters=2,
        chunk_length=1.0, optimizer="AdamW", optimizer_args={"lr": 1e-3},
        early_stop=10, n_saved=2, num_workers=1, eval_batch_size=8,
        valid_every=1, seed=0, config_stem="mhar",
        outputpath=str(tmp_path / "exp"), **world,
    )
    cfg_path = tmp_path / "mhar.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["UIT_FAULT_EPOCH"] = "1"
    env["UIT_FAULT_RANK"] = "1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "launch_multihost.py"),
         "2", "train", str(cfg_path), "--auto-resume", "1"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # the injected crash surfaced and triggered ONE coordinated restart
    assert "injected fault after epoch 1" in proc.stdout
    assert "coordinated restart" in proc.stderr, proc.stderr
    # the restarted attempt resumed from the epoch-1 snapshot
    assert re.search(r"resumed from .*last\.npz at epoch 2", proc.stdout), \
        proc.stdout
    # rank-0 deliverable exists in the pinned run dir
    run_dirs = list((tmp_path / "exp" / "mhlaunch").iterdir())
    assert len(run_dirs) == 1, run_dirs
    assert (run_dirs[0] / "averaged.npz").exists(), list(run_dirs[0].iterdir())


def test_multihost_rejects_variable_length_batches(tmp_path, monkeypatch):
    """Full-clip (no chunk_length) configs must be rejected under
    multi-host: each host pads to its own batch max, so global batch
    shapes would diverge across ranks (a distributed hang, not an error)."""
    import jax
    import pytest

    from uit_mobile_tpu.train.loop import Trainer

    datadir = tmp_path / "data"
    datadir.mkdir()
    env = _make_world(datadir)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    trainer = Trainer(dict(
        outputpath=str(tmp_path / "exp"), num_classes=537, model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1}, batch_size=8,
        epochs=1, seed=0, config_stem="mhvar", **env,
    ))
    with pytest.raises(ValueError, match="fixed-length batches"):
        trainer._build_data()
