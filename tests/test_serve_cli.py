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

    for mod in ("infer", "train", "evaluate", "bench", "serve", "average",
                "export", "stream", "psl_cache"):
        m = importlib.import_module(f"uit_mobile_tpu.cli.{mod}")
        assert callable(m.main)


def test_stream_cli_wav_and_events(tmp_path, capsys):
    """uit-stream over a wav file: JSON lines, window cadence, event flush."""
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    from uit_mobile_tpu.cli.stream import main

    rc = main(["samples/85b877b5_nohash_0.wav", "-m", str(ckpt),
               "--hop", "0.25", "--windows", "--events",
               "--on-threshold", "0.0", "--off-threshold", "0.0"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip()]
    kinds = {l["kind"] for l in lines}
    # 1 s clip at hop 0.25 -> the window at t=1.0 fires (buffer full)
    windows = [l for l in lines if l["kind"] == "window"]
    assert windows and all(len(w["top"]) == 3 for w in windows)
    assert all(isinstance(lab, str) for w in windows for lab, _ in w["top"])
    # always-on detector: flush emits events for the tracked classes
    events = [l for l in lines if l["kind"] == "event"]
    assert events
    for e in events:
        assert e["offset"] >= e["onset"] >= 0.0
        assert isinstance(e["label"], str)
    assert kinds <= {"window", "trigger", "event"}


def test_stream_cli_raw_stdin(tmp_path, monkeypatch, capsys):
    """--raw consumes s16le PCM from stdin."""
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    from uit_mobile_tpu.cli.stream import main

    pcm = (np.random.default_rng(0).standard_normal(24000) * 3000).astype("<i2")

    class FakeStdin:
        def __init__(self, data):
            self.buffer = io.BytesIO(data)

    monkeypatch.setattr("sys.stdin", FakeStdin(pcm.tobytes()))
    rc = main(["--raw", "-m", str(ckpt), "--hop", "0.5", "--windows"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip()]
    assert [l for l in lines if l["kind"] == "window"]


def test_stream_cli_rejects_ambiguous_input(tmp_path):
    from uit_mobile_tpu.cli.stream import main

    with pytest.raises(SystemExit):
        main([])  # neither wavs nor --raw


def test_serve_cli_low_latency_preset(tmp_path, monkeypatch, capsys):
    """--low-latency routes through ServiceConfig.low_latency(): zero
    batching window, scan off; scoring output identical in shape."""
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    from uit_mobile_tpu.cli.serve import main
    from uit_mobile_tpu.serve import TaggingService

    captured = {}
    orig = TaggingService.__init__

    def spy(self, model_cfg, p, s, config, **kw):
        captured["cfg"] = config
        return orig(self, model_cfg, p, s, config, **kw)

    monkeypatch.setattr(TaggingService, "__init__", spy)
    monkeypatch.setattr("sys.stdin", io.StringIO("samples/water_000.wav\n"))
    rc = main(["-m", str(ckpt), "--low-latency", "--max-seconds", "2",
               "--no-warmup", "--dtype", "float32"])
    assert rc == 0
    svc_cfg = captured["cfg"]
    assert svc_cfg.max_wait_ms == 0.0
    assert svc_cfg.scan_batches == 1
    assert svc_cfg.batch_size <= 32
    assert svc_cfg.dtype == "float32"  # non-default CLI value overrides
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert json.loads(out[0])["path"] == "samples/water_000.wav"
