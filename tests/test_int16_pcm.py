"""int16 PCM fast path: every frontend accepts raw int16 waveforms and
produces BITWISE the output of feeding ``wav.astype(f32) / 32768``.

The 1/32768 normalization (reference dataset.py:44-45 does it on the host)
is a power-of-two exponent shift, so folding it into the DFT matrices
(ops/pallas_mel.py) or applying it at the frontend entry is exact — which
lets serving keep PCM 2-byte all the way across the host->device link and
through the framing gather (measured +23% end-to-end on v5e).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.frontend.mel import FrontendConfig, log_mel_spectrogram
from uit_mobile_tpu.ops import make_frontend_fn
from uit_mobile_tpu.ops.pallas_mel import pallas_log_mel
from uit_mobile_tpu.serve import ServiceConfig, TaggingService


@pytest.fixture(scope="module")
def pcm():
    rng = np.random.default_rng(7)
    return rng.integers(-32768, 32767, size=(3, 16000), dtype=np.int16)


def _f32(pcm):
    return pcm.astype(np.float32) / 32768.0


@pytest.mark.parametrize("precision", ["exact", "fast"])
@pytest.mark.parametrize("layout", ["bft", "btf"])
def test_pallas_kernel_int16_bitwise(pcm, precision, layout):
    a = pallas_log_mel(jnp.asarray(_f32(pcm)), precision=precision, layout=layout)
    b = pallas_log_mel(jnp.asarray(pcm), precision=precision, layout=layout)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_pure_jax_frontend_int16_bitwise(pcm):
    cfg = FrontendConfig()
    a = log_mel_spectrogram(jnp.asarray(_f32(pcm)), cfg)
    b = log_mel_spectrogram(jnp.asarray(pcm), cfg)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_model_forward_int16_default_frontend(pcm):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    a = models.apply(cfg, params, state, jnp.asarray(_f32(pcm)))
    b = models.apply(cfg, params, state, jnp.asarray(pcm))
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_model_forward_int16_btf_pallas(pcm):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1, mel_layout="btf")
    params, state = models.build(cfg, jax.random.key(0))
    fe = make_frontend_fn(cfg.frontend, precision="fast", layout="btf")
    a = models.apply(cfg, params, state, jnp.asarray(_f32(pcm)), frontend_fn=fe)
    b = models.apply(cfg, params, state, jnp.asarray(pcm), frontend_fn=fe)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_train_forward_int16_bitwise(pcm):
    """Round-4 contract: train-mode forward ACCEPTS raw int16 PCM whenever
    no wav augment is configured and is bitwise the f32/32768 run (the
    frontends fold the scale exactly; mixup/spec augments are mel-domain).
    Rejection survives only for the wav-augment case — pinned in
    tests/test_int16_train.py::test_wav_augment_rejects_int16."""
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    key = jax.random.key(1)
    a, sa = models.apply(cfg, params, state, jnp.asarray(_f32(pcm)),
                         train=True, rng=key)
    b, sb = models.apply(cfg, params, state, jnp.asarray(pcm),
                         train=True, rng=key)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    for x, y in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _eval_fixture(tmp_path):
    import h5py
    import pandas as pd
    from uit_mobile_tpu.ckpt.io import save_checkpoint

    rng = np.random.default_rng(3)
    h5 = tmp_path / "e.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(5):
            f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
            rows.append((f"c{i}.wav", "530", str(h5)))
    tsv = tmp_path / "e.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    return ckpt, tsv


def test_dataset_and_collate_emit_int16(tmp_path):
    from uit_mobile_tpu.data import WeakHDF5Dataset, collate, read_tsv_data

    _, tsv = _eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    ds_i = WeakHDF5Dataset(df, num_classes=537, dtype="int16")
    ds_f = WeakHDF5Dataset(df, num_classes=537)
    wav_i, _, _ = ds_i[0]
    wav_f, _, _ = ds_f[0]
    assert wav_i.dtype == np.int16
    np.testing.assert_array_equal(wav_i.astype(np.float32) / 32768.0, wav_f)
    batch = collate([ds_i[j] for j in range(3)])
    assert batch["wav"].dtype == np.int16


def test_evaluator_int16_bitwise_matches_float32(tmp_path):
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    pa, _ = Evaluator(str(ckpt), batch_size=5,
                      num_workers=0)._run_epoch(df, num_classes=537)
    pb, _ = Evaluator(str(ckpt), batch_size=5, num_workers=0,
                      dtype="int16")._run_epoch(df, num_classes=537)
    np.testing.assert_array_equal(pa, pb)


def test_quantize_pcm16_rounds_and_roundtrips(pcm):
    from uit_mobile_tpu.frontend import normalize_pcm16, quantize_pcm16

    # int16-sourced floats roundtrip bit-for-bit
    np.testing.assert_array_equal(quantize_pcm16(_f32(pcm)), pcm)
    # arbitrary floats round to NEAREST (not truncate toward zero)
    w = np.asarray([0.6 / 32768.0, -0.6 / 32768.0, 1.5, -1.5], np.float32)
    np.testing.assert_array_equal(quantize_pcm16(w), [1, -1, 32767, -32768])
    np.testing.assert_array_equal(normalize_pcm16(pcm[0]), _f32(pcm)[0])


def test_pad_batch_rejects_mixed_dtypes():
    from uit_mobile_tpu.data import pad_batch
    from uit_mobile_tpu import native

    waves = [np.zeros(8, np.int16), np.zeros(5, np.float32)]
    # ValueError, not assert: the guard must survive python -O (a silent
    # mix would truncate the float clips to ~all-zeros)
    with pytest.raises(ValueError, match="mixed"):
        pad_batch(waves)
    with pytest.raises(ValueError, match="mixed"):
        native.pad_batch_native(waves)


def test_dataset_int16_rejects_wide_integer_storage(tmp_path):
    import h5py
    import pandas as pd
    from uit_mobile_tpu.data import WeakHDF5Dataset, read_tsv_data

    h5 = tmp_path / "w.h5"
    with h5py.File(h5, "w") as f:
        f["c.wav"] = np.asarray([40000, -40000], np.int32)  # 24-bit-ish
    tsv = tmp_path / "w.tsv"
    pd.DataFrame([("c.wav", "0", str(h5))],
                 columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    df = read_tsv_data(tsv, basename=False)
    with pytest.raises(ValueError, match="int16"):
        WeakHDF5Dataset(df, num_classes=537, dtype="int16")[0]
    # the float32 path still accepts wide storage (reference semantics)
    wav, _, _ = WeakHDF5Dataset(df, num_classes=537)[0]
    assert wav.dtype == np.float32


def test_mobilenetv2_train_rejects_int16_only_with_wav_augment(pcm):
    """Same relaxed policy as uit.forward (ADVICE round 4): int16 trains
    whenever no wav augment is configured; the bitwise equivalence is
    pinned in tests/test_int16_train.py."""
    from uit_mobile_tpu.augment import parse_wavtransforms

    cfg = models.get_model_config("MobileNetV2", outputdim=527)
    params, state = models.build(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="wav augments"):
        models.apply(cfg, params, state, jnp.asarray(pcm), train=True,
                     rng=jax.random.key(1),
                     wav_augment=parse_wavtransforms({"Gain": {"p": 1.0}}))


def test_train_step_int16_batch_matches_float32(pcm):
    import optax
    from uit_mobile_tpu.train.steps import make_train_step

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    rng = np.random.default_rng(5)
    target = (rng.random((3, 537)) < 0.01).astype(np.float32)
    r = jax.random.key(2)
    p_i, _, _, m_i = step(params, state, opt_state,
                          {"wav": jnp.asarray(pcm), "target": jnp.asarray(target)}, r)
    p_f, _, _, m_f = step(params, state, opt_state,
                          {"wav": jnp.asarray(_f32(pcm)), "target": jnp.asarray(target)}, r)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])
    for a, b in zip(jax.tree.leaves(p_i), jax.tree.leaves(p_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_service_int16_data_parallel_matches_single_device(pcm):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    base = dict(batch_size=8, max_seconds=1, warmup=False, dtype="int16",
                use_pallas=True)
    with TaggingService(cfg, params, state,
                        ServiceConfig(**base, data_parallel=True)) as svc:
        assert svc._dp
        got = svc.infer_many(list(pcm))
    with TaggingService(cfg, params, state, ServiceConfig(**base)) as svc:
        want = svc.infer_many(list(pcm))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_streaming_feed_normalizes_int16(pcm):
    from uit_mobile_tpu.serve.streaming import MultiStreamTagger, StreamingConfig

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    sc = StreamingConfig(window_seconds=1.0, hop_seconds=1.0)
    tag_i = MultiStreamTagger(cfg, params, state, n_streams=1, config=sc)
    tag_f = MultiStreamTagger(cfg, params, state, n_streams=1, config=sc)
    ev_i = tag_i.feed(0, pcm[0])           # raw int16 PCM
    ev_f = tag_f.feed(0, _f32(pcm)[0])     # normalized f32
    assert len(ev_i) == len(ev_f) == 1
    np.testing.assert_array_equal(ev_i[0].probs, ev_f[0].probs)


def test_service_int16_matches_float32(pcm):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    base = dict(batch_size=4, max_seconds=1, warmup=False)
    with TaggingService(cfg, params, state,
                        ServiceConfig(**base, dtype="int16")) as svc:
        # int16 submissions pass through; f32 submissions re-quantize exactly
        got_i16 = svc.infer_many([pcm[0], _f32(pcm[1])])
    with TaggingService(cfg, params, state,
                        ServiceConfig(**base, dtype="float32")) as svc:
        got_f32 = svc.infer_many([_f32(pcm[0]), pcm[1]])
    for a, b in zip(got_i16, got_f32):
        np.testing.assert_array_equal(a, b)
