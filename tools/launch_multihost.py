#!/usr/bin/env python
"""Local multi-process launcher: simulate a TPU pod on one machine.

On a real pod every host simply runs the SAME training command with
``multihost: true`` (the runtime autodetects the topology). This tool is
for development and CI on a single machine: it spawns N processes, each
a full `uit-train` invocation wired to a localhost coordinator, with the
CPU backend and a configurable number of virtual devices per process —
the same harness the multi-host tests use (tests/test_multihost_trainer.py).

    python tools/launch_multihost.py 2 train configs/train_uit_xs.yaml \
        [--key value ...] [--local-devices 2] [--auto-resume N]

Rank outputs stream interleaved with a ``[rank N]`` prefix; the exit code
is nonzero if ANY rank fails.

``--auto-resume N`` is the pod-scale fault-tolerance story (the in-config
``auto_resume`` key is single-host only — one rank restarting alone would
desync the collective program): when ANY rank fails, the launcher takes
the WHOLE pod down (surviving ranks would otherwise sit in dead
collectives) and relaunches every rank with ``--resume auto``, which each
loop resolves to the run directory's lossless per-epoch ``last.npz`` (or
a fresh start when the crash predated the first snapshot). At most one
epoch of work is lost per restart. The run directory is pinned across
attempts (``--outputdir`` injected for train/run/sed; MAE pretraining's
directory is already deterministic). A real-cluster restarter does the
same thing with its own process manager; the contract it needs from the
framework is exactly ``resume: auto`` + rank-0 snapshots on a shared
filesystem.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from uit_mobile_tpu.cli.train import main
raise SystemExit(main(sys.argv[1:]))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_once(args, extra) -> list[int]:
    """Spawn all ranks once; on the first failed rank, terminate the rest
    (they are blocked in collectives that can never complete). Returns the
    per-rank exit codes."""
    port = _free_port()
    procs = []
    for rank in range(args.nproc):
        mh = (f"{{'coordinator_address': '127.0.0.1:{port}', "
              f"'num_processes': {args.nproc}, 'process_id': {rank}}}")
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.local_devices}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD.format(repo=str(REPO)),
             args.command, args.config, "--multihost", mh, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        ))

    def pump(rank: int, proc: subprocess.Popen) -> None:
        for line in proc.stdout:
            sys.stdout.write(f"[rank {rank}] {line}")
            sys.stdout.flush()

    pumps = [threading.Thread(target=pump, args=(r, p), daemon=True)
             for r, p in enumerate(procs)]
    for t in pumps:
        t.start()

    # ranks finish at different times (rank 0 does the final averaging);
    # poll so a FAILED rank takes the pod down promptly instead of leaving
    # the others hung in dead collectives until some distant timeout
    while any(p.poll() is None for p in procs):
        if any(p.poll() not in (None, 0) for p in procs):
            for p in procs:
                if p.poll() is None:
                    p.terminate()
            break
        time.sleep(0.3)
    codes = []
    for p in procs:
        try:
            codes.append(p.wait(timeout=30))
        except subprocess.TimeoutExpired:
            p.kill()
            codes.append(p.wait())
    for t in pumps:
        t.join(timeout=10)
    for rank, code in enumerate(codes):
        if code:
            print(f"[launch_multihost] rank {rank} exited {code}",
                  file=sys.stderr)
    return codes


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="launch_multihost",
        description="spawn N local uit-train processes as a simulated pod",
    )
    parser.add_argument("nproc", type=int)
    parser.add_argument("command", choices=["train", "run", "pretrain", "sed"])
    parser.add_argument("config")
    parser.add_argument("--local-devices", type=int, default=2,
                        help="virtual CPU devices per process (default 2)")
    parser.add_argument("--auto-resume", type=int, default=0, metavar="N",
                        help="coordinated whole-pod restarts: on any rank "
                        "failure, relaunch ALL ranks up to N times with "
                        "--resume auto (the run dir's last.npz)")
    args, rest = parser.parse_known_args(argv)

    extra = list(rest)
    if (args.auto_resume and args.command in ("train", "run", "sed")
            and "--outputdir" not in rest):
        # restarts must land in the SAME run directory to find last.npz
        # (pretraining's output dir is already deterministic per config)
        import yaml

        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
        rundir = (Path(cfg.get("outputpath", "experiments")) / "mhlaunch"
                  / f"{Path(args.config).stem}_{os.getpid()}")
        extra += ["--outputdir", str(rundir)]
        print(f"[launch_multihost] pinned run dir {rundir}", file=sys.stderr)

    for attempt in range(args.auto_resume + 1):
        run_extra = extra + (["--resume", "auto"] if attempt else [])
        codes = _launch_once(args, run_extra)
        # any nonzero (including negative signal codes) fails the attempt
        if not any(codes):
            return 0
        if attempt < args.auto_resume:
            print(f"[launch_multihost] attempt {attempt + 1}/"
                  f"{args.auto_resume + 1} failed; coordinated restart of "
                  f"all {args.nproc} ranks with --resume auto",
                  file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
