"""Build libuitdata.so.

    python -m uit_mobile_tpu.native.build [--force]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "uitdata.cc"
OUT = HERE / "libuitdata.so"


def build(force: bool = False) -> Path:
    if OUT.exists() and not force and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    # compile to a per-process temp name, then os.replace: concurrent lazy
    # builds (e.g. two dataloader workers racing _load) must never dlopen
    # a half-written .so
    import os

    tmp = OUT.with_name(f".{OUT.name}.tmp-{os.getpid()}")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, OUT)
    finally:
        tmp.unlink(missing_ok=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
