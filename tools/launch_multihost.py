#!/usr/bin/env python
"""Local multi-process launcher: simulate a TPU pod on one machine.

On a real pod every host simply runs the SAME training command with
``multihost: true`` (the runtime autodetects the topology). This tool is
for development and CI on a single machine: it spawns N processes, each
a full `uit-train` invocation wired to a localhost coordinator, with the
CPU backend and a configurable number of virtual devices per process —
the same harness the multi-host tests use (tests/test_multihost_trainer.py).

    python tools/launch_multihost.py 2 train configs/train_uit_xs.yaml \
        [--key value ...] [--local-devices 2]

Rank outputs stream interleaved with a ``[rank N]`` prefix; the exit code
is nonzero if ANY rank fails.
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys
import threading
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
    args, rest = parser.parse_known_args(argv)

    port = _free_port()
    import os

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
             args.command, args.config, "--multihost", mh, *rest],
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
    codes = [p.wait() for p in procs]
    for t in pumps:
        t.join(timeout=10)
    for rank, code in enumerate(codes):
        if code:
            print(f"[launch_multihost] rank {rank} exited {code}",
                  file=sys.stderr)
    # any nonzero (including negative signal codes) must fail the launch
    return 1 if any(codes) else 0


if __name__ == "__main__":
    sys.exit(main())
