#!/usr/bin/env python3
"""Reference-compatible entry point: python3 inference.py [-m MODEL] [-k K] WAV...

Thin wrapper over uit_mobile_tpu.cli.infer (same flags and output format
as the reference repo's inference.py).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from uit_mobile_tpu.cli.infer import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
