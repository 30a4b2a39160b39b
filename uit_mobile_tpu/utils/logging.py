"""Logging: colorized stdout + per-run file sinks (loguru-free).

Mirrors the reference's observability shape (run.py:21-25, 83-91;
evaluate.py:120-131): a console sink configured at first use and optional
per-run ``train.log`` / ``evaluation_*.txt`` file sinks.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

_FMT = "[\x1b[32m%(asctime)s\x1b[0m] %(message)s"
_FILE_FMT = "[%(levelname)s %(asctime)s] %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"

def get_logger(name: str = "uit_mobile_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    # PER-LOGGER setup marker (a module-global flag would leave every
    # logger name after the first with no handler — its .info() output
    # silently vanishing into the WARNING-level root)
    if not getattr(logger, "_uit_console_sink", False):
        handler = logging.StreamHandler(sys.stdout)
        use_color = hasattr(sys.stdout, "isatty") and sys.stdout.isatty()
        fmt = _FMT if use_color else _FILE_FMT.replace("%(levelname)s ", "")
        handler.setFormatter(logging.Formatter(fmt, datefmt=_DATEFMT))
        logger.addHandler(handler)
        logger.setLevel(logging.DEBUG)
        logger.propagate = False
        logger._uit_console_sink = True
    return logger


def add_file_sink(logger: logging.Logger, path, level=logging.INFO,
                  plain: bool = False) -> logging.Handler:
    """Attach a file sink (per-run train.log / evaluation report files)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path, mode="w")
    handler.setLevel(level)
    handler.setFormatter(
        logging.Formatter("%(message)s" if plain else _FILE_FMT, datefmt=_DATEFMT)
    )
    logger.addHandler(handler)
    return handler
