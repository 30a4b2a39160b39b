"""Batching service: correctness vs direct forward, mixed lengths, futures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.serve import ServiceConfig, TaggingService


@pytest.fixture(scope="module")
def model():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_service_matches_direct_forward(model):
    cfg, params, state = model
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(5)]
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=8, max_seconds=2, warmup=False,
                                      top_db_mode="torch")) as svc:
        got = svc.infer_many(wavs)
    # direct: same bucket semantics (pad batch of 8 x 16000)
    batch = np.zeros((8, 16000), np.float32)
    for i, w in enumerate(wavs):
        batch[i] = w
    want = np.asarray(models.apply(cfg, params, state, jnp.asarray(batch)))
    for i in range(5):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5)


def test_service_mixed_lengths(model):
    cfg, params, state = model
    rng = np.random.default_rng(1)
    wavs = [
        rng.standard_normal(8000).astype(np.float32) * 0.1,   # 1s bucket
        rng.standard_normal(16000).astype(np.float32) * 0.1,  # 1s bucket
        rng.standard_normal(17000).astype(np.float32) * 0.1,  # 2s bucket
    ]
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=4, max_seconds=3, warmup=False)) as svc:
        outs = svc.infer_many(wavs)
    for o in outs:
        assert o.shape == (537,) and np.isfinite(o).all()


def test_service_rejects_too_long(model):
    cfg, params, state = model
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=2, max_seconds=1, warmup=False)) as svc:
        # ValueError, not assert: must still reject under python -O (an
        # unchecked overlong clip would kill the worker thread downstream)
        with pytest.raises(ValueError, match="max_seconds"):
            svc.submit(np.zeros(32000, np.float32))
        # multichannel audio must be rejected, not silently flattened into
        # a channel-concatenated mono stream
        with pytest.raises(ValueError, match="mono"):
            svc.submit(np.zeros((2, 8000), np.float32))
        # (1, T) from data.read_wav is accepted
        assert svc.submit(np.zeros((1, 8000), np.float32)) is not None


def test_service_dispatch_does_not_block_on_results(model):
    """A slow in-flight batch must not stall the batcher: the next request
    is dispatched to the device while the first batch's result is still
    unresolved (async dispatch + separate completion thread)."""
    import threading
    import time

    cfg, params, state = model
    svc = TaggingService(cfg, params, state,
                         ServiceConfig(batch_size=2, max_seconds=10, warmup=False,
                                       max_wait_ms=1.0))
    gate = threading.Event()
    calls = []

    class LazyResult:
        def __init__(self, n):
            self.n = n

        def __array__(self, dtype=None, copy=None):
            gate.wait(timeout=20)
            return np.zeros((self.n, 537), np.float32)

    def fake_fwd(batch):
        calls.append(batch.shape)
        return LazyResult(batch.shape[0])

    svc._fwd = fake_fwd
    try:
        f_big = svc.submit(np.zeros(10 * 16000, np.float32))   # 10s bucket
        deadline = time.monotonic() + 5
        while len(calls) < 1 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert len(calls) == 1, "first batch never dispatched"
        assert not f_big.done()
        # while batch 1 is stuck (gate closed), a 1s request must still be
        # batched and dispatched
        f_small = svc.submit(np.zeros(16000, np.float32))      # 1s bucket
        deadline = time.monotonic() + 5
        while len(calls) < 2 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert len(calls) == 2, (
            f"second batch not dispatched while first pending: {calls}"
        )
        assert not f_big.done() and not f_small.done()
        gate.set()
        assert f_big.result(timeout=10).shape == (537,)
        assert f_small.result(timeout=10).shape == (537,)
    finally:
        gate.set()
        svc.close()


def test_service_close_drains_requests_behind_sentinel(model):
    """Requests queued behind the shutdown sentinel (submitted concurrently
    with close()) are still dispatched — their Futures must resolve, not
    hang."""
    from concurrent.futures import Future

    cfg, params, state = model
    svc = TaggingService(cfg, params, state,
                         ServiceConfig(batch_size=4, max_seconds=1, warmup=False),
                         _start_worker=False)
    wav = np.zeros(16000, np.float32)
    f_before: Future = Future()
    f_after: Future = Future()
    svc._q.put((wav, f_before))
    svc._q.put(None)                 # close() sentinel
    svc._q.put((wav, f_after))       # raced in behind the sentinel
    svc._start()
    assert f_before.result(timeout=30).shape == (537,)
    assert f_after.result(timeout=30).shape == (537,)
    svc._worker.join(timeout=30)
    svc._completer.join(timeout=30)


def test_service_btf_path_matches_reference_layout(model):
    """use_pallas=True engages the btf serving layout (interpret-mode
    Pallas on CPU); results must match the plain path within the serving
    drift budget."""
    cfg, params, state = model
    rng = np.random.default_rng(7)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(3)]
    conf_btf = ServiceConfig(batch_size=4, max_seconds=1, warmup=False,
                             use_pallas=True)
    conf_ref = ServiceConfig(batch_size=4, max_seconds=1, warmup=False,
                             use_pallas=False)
    with TaggingService(cfg, params, state, conf_btf) as svc:
        got = svc.infer_many(wavs)
    with TaggingService(cfg, params, state, conf_ref) as svc:
        want = svc.infer_many(wavs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_service_data_parallel_matches_single_device(model, use_pallas):
    """data_parallel=True shards bucket batches over the 8-device CPU mesh;
    results must equal the single-device path. With the Pallas frontend
    the service must take the shard_map (manual) route — Mosaic kernels
    cannot be GSPMD-auto-partitioned."""
    cfg, params, state = model
    rng = np.random.default_rng(11)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(6)]
    conf_dp = ServiceConfig(batch_size=8, max_seconds=2, warmup=False,
                            data_parallel=True, use_pallas=use_pallas)
    conf_1d = ServiceConfig(batch_size=8, max_seconds=2, warmup=False,
                            use_pallas=use_pallas)
    with TaggingService(cfg, params, state, conf_dp) as svc:
        assert svc._dp and all(bs % 8 == 0 for _, bs in svc._buckets), svc._buckets
        got = svc.infer_many(wavs)
    with TaggingService(cfg, params, state, conf_1d) as svc:
        want = svc.infer_many(wavs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_service_close_race_never_strands_futures(model):
    """Stress the submit/close race: every Future must resolve or be
    cancelled — none may hang. (Regression for the drain-on-close and
    cancel-after-join paths.)"""
    import threading
    from concurrent.futures import CancelledError

    cfg, params, state = model
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    for trial in range(3):
        svc = TaggingService(cfg, params, state,
                             ServiceConfig(batch_size=4, max_seconds=1,
                                           warmup=(trial == 0), max_wait_ms=1.0))
        futures = []
        flock = threading.Lock()
        stop = threading.Event()

        def submitter():
            while not stop.is_set():
                try:
                    f = svc.submit(wav)
                except RuntimeError:  # service closed mid-loop
                    return
                with flock:
                    futures.append(f)

        threads = [threading.Thread(target=submitter) for _ in range(4)]
        for t in threads:
            t.start()
        import time as _t

        _t.sleep(0.05 * (trial + 1))
        svc.close()
        stop.set()
        for t in threads:
            t.join(timeout=10)
        assert futures, "no requests made it in before close"
        for f in futures:
            try:
                out = f.result(timeout=30)
                assert out.shape == (537,)
            except CancelledError:
                pass  # acceptable: raced in behind the final drain


def test_service_per_sample_top_db_isolates_requests(model):
    """Default serving mode: a clip's probabilities must not depend on
    concurrent traffic. In 'torch' mode the dB clamp references the batch
    max, so a high-dynamic-range clip co-batched with a loud neighbor
    changes output; 'per_sample' (the default) decouples them."""
    cfg, params, state = model
    t = np.arange(8000, dtype=np.float32) / 16000.0
    quiet = np.concatenate(
        [0.05 * np.sin(2 * np.pi * 440 * t), np.zeros(8000, np.float32)]
    )  # silent half -> clamp binds
    loud = (10.0 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000.0)).astype(
        np.float32
    )

    def run(mode):
        outs = {}
        conf = ServiceConfig(batch_size=4, max_seconds=1, warmup=False,
                             max_wait_ms=300.0, top_db_mode=mode)
        with TaggingService(cfg, params, state, conf) as svc:
            outs["alone"] = svc.submit(quiet).result(timeout=60)
        with TaggingService(cfg, params, state, conf) as svc:
            f_q = svc.submit(quiet)
            f_l = svc.submit(loud)   # same batching window -> co-batched
            outs["cobatched"] = f_q.result(timeout=60)
            f_l.result(timeout=60)
        return outs

    iso = run("per_sample")
    np.testing.assert_allclose(iso["alone"], iso["cobatched"], atol=1e-6,
                               err_msg="per_sample serving output depends on traffic")
    coupled = run("torch")
    assert np.abs(coupled["alone"] - coupled["cobatched"]).max() > 1e-6, (
        "expected torch-mode clamp coupling; the isolation test is vacuous"
    )


def test_service_scanned_dispatch_matches_per_batch(model):
    """scan_batches>1: K full batches fold into one scanned dispatch;
    results match the per-batch service to f32 epsilon."""
    cfg, params, state = model
    rng = np.random.default_rng(11)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1
            for _ in range(8)]  # 4 full batches of 2
    conf_scan = ServiceConfig(batch_size=2, max_seconds=1, warmup=False,
                              scan_batches=2, max_wait_ms=200.0)
    conf_base = ServiceConfig(batch_size=2, max_seconds=1, warmup=False)
    with TaggingService(cfg, params, state, conf_scan) as svc:
        got = svc.infer_many(wavs)
    with TaggingService(cfg, params, state, conf_base) as svc:
        want = svc.infer_many(wavs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_service_scanned_dispatch_partial_load(model):
    """Below K full batches the scanned path must not engage (no deadlock,
    partial groups dispatch per-batch immediately)."""
    cfg, params, state = model
    rng = np.random.default_rng(12)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1
            for _ in range(3)]  # 1.5 batches < K*bs = 4
    conf = ServiceConfig(batch_size=2, max_seconds=1, warmup=False,
                         scan_batches=2, max_wait_ms=50.0)
    with TaggingService(cfg, params, state, conf) as svc:
        outs = svc.infer_many(wavs)
    for o in outs:
        assert o.shape == (537,) and np.isfinite(o).all()


def test_service_full_batch_never_waits_for_scan_company(model):
    """scan_batches>1 must be latency-neutral: one COMPLETE batch
    dispatches without waiting out the batching window for K-1 more."""
    import time

    cfg, params, state = model
    rng = np.random.default_rng(13)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1
            for _ in range(2)]  # exactly one full batch
    conf = ServiceConfig(batch_size=2, max_seconds=1, warmup=True,
                         scan_batches=4, max_wait_ms=5000.0)
    with TaggingService(cfg, params, state, conf) as svc:
        t0 = time.perf_counter()
        svc.infer_many(wavs)
        dt = time.perf_counter() - t0
    # well under the 5 s window (CPU forward takes ~tens of ms)
    assert dt < 2.0, f"full batch waited {dt:.2f}s for scan company"


def test_service_survives_dispatch_failure(model):
    """A host-side dispatch failure fails THOSE futures and leaves the
    worker alive for subsequent requests (regression: an unguarded
    exception killed the thread, stranding every later Future)."""
    cfg, params, state = model
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=2, max_seconds=1,
                                      warmup=False, max_wait_ms=10.0)) as svc:
        real_fwd = svc._fwd

        def boom(x):
            raise RuntimeError("injected dispatch failure")

        svc._fwd = boom
        f1 = svc.submit(np.zeros(16000, np.float32))
        with pytest.raises(RuntimeError, match="injected"):
            f1.result(timeout=30)
        svc._fwd = real_fwd
        f2 = svc.submit(np.zeros(16000, np.float32))
        assert f2.result(timeout=60).shape == (537,)


def test_service_close_without_started_worker(model):
    """close() on a never-started service must not raise."""
    cfg, params, state = model
    svc = TaggingService(cfg, params, state,
                         ServiceConfig(batch_size=2, max_seconds=1,
                                       warmup=False), _start_worker=False)
    svc.close()


def test_service_concurrent_soak_every_result_correct(model):
    """Randomized request storm: many threads, random lengths across all
    buckets, scanned dispatch armed, occasional oversize rejects mixed in
    — and EVERY accepted future's result must equal the single-clip
    forward of its bucket-padded waveform (per-sample top_db isolation
    means co-batched traffic cannot couple). Guards the whole concurrent
    path (batcher, bucketer, scan folding, completion thread) under load,
    not just the single-batch happy paths above."""
    import threading

    from uit_mobile_tpu.ops.pipeline import make_forward_fn

    cfg, params, state = model
    sr = 16000
    svc_cfg = ServiceConfig(batch_size=8, max_seconds=3, warmup=False,
                            max_wait_ms=2.0, scan_batches=2)
    direct = jax.jit(make_forward_fn(cfg, params, state, use_pallas=False,
                                     top_db_mode="per_sample"))

    results: list[tuple[np.ndarray, object]] = []
    rejects = []
    lock = threading.Lock()

    def storm(seed):
        rng = np.random.default_rng(seed)
        for _ in range(20):
            n = int(rng.integers(5000, 4 * sr))  # up to 4 s; >3 s rejects
            wav = rng.standard_normal(n).astype(np.float32) * 0.1
            try:
                f = svc.submit(wav)
            except ValueError:
                assert n > 3 * sr, n  # only oversize clips may reject
                with lock:
                    rejects.append(n)
                continue
            with lock:
                results.append((wav, f))

    with TaggingService(cfg, params, state, svc_cfg) as svc:
        threads = [threading.Thread(target=storm, args=(s,)) for s in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = [(w, f.result(timeout=120)) for w, f in results]

    assert len(got) >= 60 and rejects, (len(got), len(rejects))
    for wav, probs in got:
        bucket = -(-len(wav) // sr) * sr
        padded = np.zeros((1, bucket), np.float32)
        padded[0, : len(wav)] = wav
        want = np.asarray(direct(jnp.asarray(padded)))[0]
        np.testing.assert_allclose(probs, want, atol=1e-5)


def test_service_hot_reload_swaps_weights(model):
    """reload(): zero-downtime weight swap — results before the swap come
    from the old params, after from the new; version is monotonic."""
    cfg, params, state = model
    params2, state2 = models.build(cfg, jax.random.key(123))
    rng = np.random.default_rng(9)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=4, max_seconds=1,
                                      warmup=False,
                                      top_db_mode="torch")) as svc:
        assert svc.weights_version == 1
        before = np.asarray(svc.submit(wav).result(timeout=60))
        assert svc.reload(params2, state2) == 2
        assert svc.weights_version == 2
        after = np.asarray(svc.submit(wav).result(timeout=60))
    batch = np.zeros((4, 16000), np.float32)
    batch[0] = wav
    want_old = np.asarray(models.apply(cfg, params, state,
                                       jnp.asarray(batch)))[0]
    want_new = np.asarray(models.apply(cfg, params2, state2,
                                       jnp.asarray(batch)))[0]
    np.testing.assert_allclose(before, want_old, atol=1e-5)
    np.testing.assert_allclose(after, want_new, atol=1e-5)
    assert not np.allclose(before, after)  # the swap actually happened


def test_service_hot_reload_under_traffic(model):
    """Concurrent submits across a reload all resolve, each to one of the
    two weight versions (never a torn batch)."""
    cfg, params, state = model
    params2, state2 = models.build(cfg, jax.random.key(7))
    rng = np.random.default_rng(11)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    with TaggingService(cfg, params, state,
                        ServiceConfig(batch_size=2, max_seconds=1,
                                      warmup=False, max_wait_ms=1.0,
                                      top_db_mode="torch")) as svc:
        futs = [svc.submit(wav) for _ in range(8)]
        svc.reload(params2, state2)
        futs += [svc.submit(wav) for _ in range(8)]
        outs = [np.asarray(f.result(timeout=120)) for f in futs]
    batch = np.zeros((2, 16000), np.float32)
    batch[0] = batch[1] = wav
    want = [np.asarray(models.apply(cfg, p, s, jnp.asarray(batch)))[0]
            for p, s in ((params, state), (params2, state2))]
    for o in outs:
        assert any(np.allclose(o, w, atol=1e-5) for w in want)
    # post-reload requests are all on the new weights
    for o in outs[8:]:
        np.testing.assert_allclose(o, want[1], atol=1e-5)


def test_service_hot_reload_scanned_programs(model):
    """reload rebuilds the K-batch scanned program too (the no-recompiles
    contract survives the swap) and scanned results use the new weights."""
    cfg, params, state = model
    params2, state2 = models.build(cfg, jax.random.key(5))
    rng = np.random.default_rng(13)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1
            for _ in range(8)]
    svc = TaggingService(cfg, params, state,
                         ServiceConfig(batch_size=2, max_seconds=1,
                                       warmup=False, scan_batches=2,
                                       top_db_mode="torch"),
                         _start_worker=False)
    svc.reload(params2, state2)
    assert svc._scanned_fwd is not None
    svc._start()
    try:
        outs = svc.infer_many(wavs)
    finally:
        svc.close()
    batch = np.zeros((2, 16000), np.float32)
    for i, w in enumerate(wavs):
        batch[i % 2] = w
        if i % 2 == 1:
            want = np.asarray(models.apply(cfg, params2, state2,
                                           jnp.asarray(batch)))
            np.testing.assert_allclose(outs[i - 1], want[0], atol=1e-4)
            np.testing.assert_allclose(outs[i], want[1], atol=1e-4)


def test_low_latency_preset_fields():
    """ServiceConfig.low_latency(): no batching window (a lone request
    dispatches immediately), small bucket, scan folding off, int16
    transfer; overrides pass through."""
    cfg = ServiceConfig.low_latency()
    assert cfg.max_wait_ms == 0.0
    assert cfg.scan_batches == 1
    assert cfg.batch_size <= 32
    assert cfg.dtype == "int16"
    assert ServiceConfig.low_latency(batch_size=4, dtype="float32").batch_size == 4


def test_low_latency_preset_tail_ordering(model):
    """Sparse single-clip traffic: the low-latency preset's p50 AND p99
    must beat a windowed throughput config's, because the window makes
    every lone request wait max_wait_ms for company before dispatch."""
    import time

    cfg, params, state = model
    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1
            for _ in range(2)]

    def latencies(svc_cfg, n=12):
        with TaggingService(cfg, params, state, svc_cfg) as svc:
            svc.submit(wavs[0]).result()  # compile/warm the bucket
            out = []
            for i in range(n):
                t0 = time.perf_counter()
                svc.submit(wavs[i % 2]).result()
                out.append(time.perf_counter() - t0)
        return np.asarray(out) * 1e3

    window_ms = 120.0  # exaggerated window so the ordering is not noise
    slow = latencies(ServiceConfig(batch_size=8, max_seconds=1,
                                   warmup=False, max_wait_ms=window_ms,
                                   dtype="float32"))
    fast = latencies(ServiceConfig.low_latency(max_seconds=1, warmup=False,
                                               dtype="float32"))
    for q in (50, 99):
        lo, hi = np.percentile(fast, q), np.percentile(slow, q)
        assert lo < hi, (q, lo, hi)
    # the windowed config's lone requests pay the window; the preset's
    # never do
    assert np.percentile(slow, 50) >= window_ms * 0.8
    assert np.percentile(fast, 50) < window_ms * 0.8
