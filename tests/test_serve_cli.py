"""Serve CLI: stdin->JSON-lines contract (in-process, monkeypatched stdin)."""

import io
import json

import jax
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.ckpt.io import save_checkpoint


def test_serve_cli_stdin_json(tmp_path, monkeypatch, capsys):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    from uit_mobile_tpu.cli.serve import main

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO("samples/85b877b5_nohash_0.wav\nsamples/water_000.wav\n"),
    )
    rc = main(["-m", str(ckpt), "-k", "3", "--batch-size", "4",
               "--max-seconds", "2", "--no-warmup"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    for line, path in zip(lines, ["samples/85b877b5_nohash_0.wav", "samples/water_000.wav"]):
        obj = json.loads(line)
        assert obj["path"] == path
        assert len(obj["top"]) == 3
        for label, prob in obj["top"]:
            assert isinstance(label, str) and 0.0 <= prob <= 1.0


def test_console_scripts_registered():
    """pyproject console entry points resolve to importable callables."""
    import importlib

    for mod in ("infer", "train", "evaluate", "bench", "serve", "average", "export"):
        m = importlib.import_module(f"uit_mobile_tpu.cli.{mod}")
        assert callable(m.main)
