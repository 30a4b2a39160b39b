"""CLI surfaces: infer, evaluate test_sample, average, export, config
resolution (all through main(argv) with local checkpoints)."""

import numpy as np
import pytest
import jax


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint

    tmp = tmp_path_factory.mktemp("ckpt")
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    path = tmp / "demo.npz"
    save_checkpoint(path, params, state, cfg)
    return path


def test_infer_cli(capsys, ckpt):
    from uit_mobile_tpu.cli.infer import main

    rc = main(["samples/85b877b5_nohash_0.wav", "-m", str(ckpt), "-k", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "85b877b5_nohash_0.wav" in out
    assert len([l for l in out.splitlines() if "0." in l]) >= 5


def test_infer_cli_batched_multiwav(capsys, ckpt):
    from uit_mobile_tpu.cli.infer import main

    rc = main(["samples/water_000.wav", "samples/water_001.wav",
               "-m", str(ckpt), "--batched"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("=====") == 4  # 2 headers x 2 delimiters


def test_infer_rejects_wrong_sr(tmp_path, ckpt):
    from uit_mobile_tpu.cli.infer import main
    from uit_mobile_tpu.data.audio_io import write_wav

    p = tmp_path / "sr8k.wav"
    write_wav(p, np.zeros(8000, np.float32), sample_rate=8000)
    with pytest.raises(AssertionError, match="16khz"):
        main([str(p), "-m", str(ckpt)])


def test_evaluate_test_sample(capsys, ckpt):
    from uit_mobile_tpu.cli.evaluate import main

    rc = main(["test_sample", str(ckpt), "samples/85b877b5_nohash_0.wav"])
    out = capsys.readouterr().out
    assert rc == 0 and out.count(":") >= 5


def test_average_cli_and_export(tmp_path, capsys):
    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint, load_checkpoint
    from uit_mobile_tpu.cli.average import main as avg_main
    from uit_mobile_tpu.cli.export import main as exp_main

    cfg = models.get_model_config("uit_xxxs", outputdim=10, target_length=102, depth=1)
    for i in range(2):
        p, s = models.build(cfg, jax.random.key(i))
        save_checkpoint(tmp_path / f"best_{i}.npz", p, s, cfg)
    out = tmp_path / "avg.npz"
    assert avg_main([str(tmp_path), "-o", str(out)]) == 0
    params, state, cfg2, extra = load_checkpoint(out)
    assert cfg2 == cfg and len(extra["averaged_from"]) == 2

    pt = tmp_path / "avg.pt"
    assert exp_main([str(out), "-o", str(pt)]) == 0
    import torch

    sd = torch.load(pt, map_location="cpu")
    assert "blocks.0.attn.qkv.weight" in sd
    # and it converts back
    from uit_mobile_tpu.ckpt.torch_convert import uit_params_from_torch_state_dict

    p2, s2 = uit_params_from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]), np.asarray(p2["head"]["kernel"]), atol=1e-7
    )


def test_resolve_model_dir_glob(tmp_path, ckpt):
    from uit_mobile_tpu.cli.common import resolve_model

    cfg, params, state = resolve_model(str(ckpt.parent))
    assert cfg.outputdim == 537


def test_config_override_parsing():
    from uit_mobile_tpu.cli.train import _parse_overrides

    o = _parse_overrides(["--epochs", "5", "--mixup", "0.3", "--model-args",
                          "{'target_length': 102}", "--average", "false"])
    assert o == {"epochs": 5, "mixup": 0.3,
                 "model_args": {"target_length": 102}, "average": False}
