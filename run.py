#!/usr/bin/env python3
"""Reference-compatible entry point: python3 run.py {train|run|pretrain} CONFIG.yaml [--key value ...]

Thin wrapper over uit_mobile_tpu.cli.train.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from uit_mobile_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
