"""HTTP serving front (serve/http.py): endpoints, formats, concurrency.

Contract: concurrent POST /tag requests are batched by the underlying
TaggingService and each response must match scoring the same clip through
the service directly (per-sample dB clamping makes co-batching
result-invariant)."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.data import write_wav
from uit_mobile_tpu.serve import ServiceConfig, TaggingService, make_http_server


@pytest.fixture(scope="module")
def server_and_service():
    cfg = models.get_model_config("uit_xxxs", outputdim=6)
    params, state = models.build(cfg, jax.random.key(0))
    service = TaggingService(
        cfg, params, state,
        ServiceConfig(batch_size=4, max_seconds=2, warmup=False,
                      max_wait_ms=2.0, dtype="float32"),
    )
    labels = {i: f"lbl{i}" for i in range(6)}
    server = make_http_server(service, labels=labels, host="127.0.0.1",
                              port=0, model_name="uit_xxxs")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, service, (cfg, params, state)
    server.shutdown()
    server.server_close()
    service.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read().decode())


def _post(url, body, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read().decode())


def _wav(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_healthz_and_labels(server_and_service):
    base, _, _ = server_and_service
    code, h = _get(base + "/healthz")
    assert code == 200 and h["status"] == "ok"
    assert h["model"] == "uit_xxxs" and h["sample_rate"] == 16000
    assert {"requests", "errors", "latency_ms"} <= h.keys()
    code, lab = _get(base + "/labels")
    assert code == 200 and lab["3"] == "lbl3"


def test_healthz_stats_track_requests(server_and_service):
    base, _, _ = server_and_service
    _, before = _get(base + "/healthz")
    _post(base + "/tag?format=f32", _wav().tobytes())
    with pytest.raises(urllib.error.HTTPError):
        _post(base + "/tag", b"junk")  # counted as an error
    _, after = _get(base + "/healthz")
    assert after["requests"] >= before["requests"] + 2
    assert after["errors"] >= before["errors"] + 1
    assert after["latency_ms"]["p50"] is not None
    assert after["latency_ms"]["p99"] >= after["latency_ms"]["p50"]


def test_tag_wav_body_matches_direct(server_and_service, tmp_path):
    base, service, _ = server_and_service
    wav = _wav()
    p = tmp_path / "c.wav"
    write_wav(p, wav)
    code, out = _post(base + "/tag?k=3&full=1", p.read_bytes(), "audio/wav")
    assert code == 200 and len(out["top"]) == 3
    assert out["n_samples"] == 16000
    # compare against the service directly — the wav file round-trips
    # through int16 PCM, so feed the service the identical quantized clip
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
    ref = np.asarray(service.submit(pcm.astype(np.float32) / 32768.0).result())
    np.testing.assert_allclose(np.asarray(out["probs"]), ref, atol=1e-5)
    assert out["top"][0]["index"] == int(np.argmax(ref))
    assert out["top"][0]["label"] == f"lbl{int(np.argmax(ref))}"


def test_tag_raw_formats(server_and_service):
    base, service, _ = server_and_service
    wav = _wav(seed=1)
    ref = np.asarray(service.submit(wav).result())
    code, out32 = _post(base + "/tag?format=f32&full=1", wav.tobytes())
    assert code == 200
    np.testing.assert_allclose(np.asarray(out32["probs"]), ref, atol=1e-6)
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
    code, out16 = _post(base + "/tag?format=pcm16&full=1", pcm.tobytes())
    assert code == 200
    ref16 = np.asarray(service.submit(pcm).result())
    np.testing.assert_allclose(np.asarray(out16["probs"]), ref16, atol=1e-6)


def test_error_paths(server_and_service, tmp_path):
    base, _, _ = server_and_service

    def expect(code, url, body=None, ctype="application/octet-stream"):
        with pytest.raises(urllib.error.HTTPError) as e:
            if body is None:
                _get(url)
            else:
                _post(url, body, ctype)
        assert e.value.code == code
        assert "error" in json.loads(e.value.read().decode())

    expect(404, base + "/nope")
    expect(404, base + "/nope", b"x")
    # undecodable / missing format
    expect(400, base + "/tag", b"not audio")
    # odd pcm16 length
    expect(400, base + "/tag?format=pcm16", b"abc")
    # wrong sample rate
    p = tmp_path / "8k.wav"
    write_wav(p, _wav(8000), sample_rate=8000)
    expect(400, base + "/tag", p.read_bytes(), "audio/wav")
    # too long (max_seconds=2)
    expect(413, base + "/tag?format=pcm16",
           np.zeros(16000 * 3, dtype="<i2").tobytes())
    # empty
    expect(400, base + "/tag?format=f32", b"")


def test_events_endpoint(server_and_service):
    from uit_mobile_tpu.evaluate import extract_events
    from uit_mobile_tpu.serve import make_framewise_fn

    base, service, (cfg, params, state) = server_and_service
    # the module fixture's server has no framewise_fn -> 501
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/events?format=f32", _wav().tobytes())
    assert e.value.code == 501

    # a second server over the SAME service, with temporal tagging on
    fw = make_framewise_fn(cfg, params, state, max_seconds=2,
                           use_pallas=False)
    server2 = make_http_server(service, labels={i: f"lbl{i}" for i in
                                                range(6)},
                               port=0, framewise_fn=fw)
    t = threading.Thread(target=server2.serve_forever, daemon=True)
    t.start()
    base2 = f"http://127.0.0.1:{server2.server_address[1]}"
    try:
        wav = _wav(24000, seed=7)  # 1.5 s: exercises padding + clamping
        code, out = _post(base2 + "/events?format=f32&threshold=0.4",
                          wav.tobytes())
        assert code == 200 and out["duration"] == pytest.approx(1.5)
        # reference computation: same padding rule, same extractor
        probs, times = fw(wav)
        ref = [ev for ev in extract_events(times, probs, threshold=0.4)
               if ev[1] < 1.5]
        assert len(out["events"]) == len(ref)
        for got, (cls, on, off) in zip(out["events"], ref):
            assert got["index"] == int(cls)
            assert got["label"] == f"lbl{int(cls)}"
            assert got["onset"] == pytest.approx(on)
            assert got["offset"] == pytest.approx(min(off, 1.5))
            assert got["offset"] <= 1.5
        # parameter validation
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base2 + "/events?format=f32&median=2", wav.tobytes())
        assert e.value.code == 400
        # per-class operating points: CLS:TH pairs override the scalar
        code, out_pc = _post(
            base2 + "/events?format=f32&threshold=0.4&per_class=2:0.99",
            wav.tobytes())
        assert code == 200
        ref_pc = [ev for ev in extract_events(
            times, probs, threshold={2: 0.99, "default": 0.4})
            if ev[1] < 1.5]
        assert len(out_pc["events"]) == len(ref_pc)
        assert [e["index"] for e in out_pc["events"]] == [
            int(c) for c, _, _ in ref_pc]
        # malformed / out-of-range per_class -> 400, not a 500
        for bad in ("x:0.5", "2:0.5:9", "-1:0.5", "99:0.5"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(base2 + f"/events?format=f32&per_class={bad}",
                      wav.tobytes())
            assert e.value.code == 400, bad
    finally:
        server2.shutdown()
        server2.server_close()


def test_stream_sessions_http(server_and_service):
    from uit_mobile_tpu.serve import (
        MultiStreamTagger,
        StreamingConfig,
        StreamSessions,
    )

    base, service, (cfg, params, state) = server_and_service
    # the module fixture's server has no stream_sessions -> 501
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/stream/open", b"")
    assert e.value.code == 501

    scfg = StreamingConfig(n_audioset=6)  # outputdim=6 test model
    ss = StreamSessions(cfg, params, state, config=scfg, max_sessions=2)
    lab = {i: f"lbl{i}" for i in range(6)}
    server3 = make_http_server(service, labels=lab, port=0,
                               stream_sessions=ss)
    threading.Thread(target=server3.serve_forever, daemon=True).start()
    base3 = f"http://127.0.0.1:{server3.server_address[1]}"
    try:
        _, o = _post(base3 + "/stream/open?on=0.3&off=0.2", b"")
        sid = o["id"]
        assert o["window_seconds"] == 1.0 and o["hop_seconds"] == 0.25
        chunk0 = _wav(8000, seed=20)   # 0.5 s: below the 1 s window
        chunk1 = _wav(12000, seed=21)  # -> 1.25 s total: 2 windows
        _, r0 = _post(f"{base3}/stream/{sid}/feed?format=f32&k=2",
                      chunk0.tobytes())
        assert r0["windows"] == []
        _, r1 = _post(f"{base3}/stream/{sid}/feed?format=f32&k=2",
                      chunk1.tobytes())
        assert [w["time"] for w in r1["windows"]] == [1.0, 1.25]
        assert all(len(w["top"]) == 2 for w in r1["windows"])
        # equivalence: the same audio through a direct tagger
        ref = MultiStreamTagger(cfg, params, state, n_streams=2, config=scfg)
        ref_evs = ref.feed(0, np.concatenate([chunk0, chunk1]))
        assert len(ref_evs) == 2
        for w, ev in zip(r1["windows"], ref_evs):
            assert w["time"] == pytest.approx(ev.time)
            top = int(np.argmax(ev.probs))
            assert w["top"][0]["index"] == top
            assert w["top"][0]["prob"] == pytest.approx(
                float(ev.probs[top]), abs=1e-6)
        _, c = _post(f"{base3}/stream/{sid}/close", b"")
        assert "events" in c
        # closed session is gone
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base3}/stream/{sid}/feed?format=f32", chunk0.tobytes())
        assert e.value.code == 404
        # per-class operating points on open (tuned-threshold deploy)
        code, o_pc = _post(
            base3 + "/stream/open?on=0.4&off=0.2&per_class=1:0.9", b"")
        assert code == 200
        _post(f"{base3}/stream/{o_pc['id']}/close", b"")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base3 + "/stream/open?per_class=x:y", b"")
        assert e.value.code == 400
        # slot exhaustion: 2 slots -> third open is 429
        _post(base3 + "/stream/open", b"")
        _post(base3 + "/stream/open", b"")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base3 + "/stream/open", b"")
        assert e.value.code == 429
        # bad detector params -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base3 + "/stream/open?on=abc", b"")
        assert e.value.code == 400
    finally:
        server3.shutdown()
        server3.server_close()


def test_stream_session_recycling_resets_slot(server_and_service):
    from uit_mobile_tpu.serve import StreamingConfig, StreamSessions

    _, _, (cfg, params, state) = server_and_service
    scfg = StreamingConfig(n_audioset=6)
    ss = StreamSessions(cfg, params, state, config=scfg, max_sessions=1)
    a = ss.open()["id"]
    w, _ = ss.feed(a, _wav(20000, seed=30))  # 1.25 s -> 2 windows
    assert len(w) == 2
    ss.close(a)
    # the recycled slot must start from silence: same audio, same windows
    b = ss.open()["id"]
    w2, _ = ss.feed(b, _wav(20000, seed=30))
    assert [ev.time for ev in w2] == [ev.time for ev in w]
    np.testing.assert_allclose(w2[0].probs, w[0].probs, atol=1e-6)
    ss.close(b)


def test_make_framewise_fn_rejects_moe():
    from uit_mobile_tpu.serve import make_framewise_fn

    cfg = models.get_model_config("uit_xs_moe", outputdim=6)
    with pytest.raises(TypeError, match="framewise"):
        make_framewise_fn(cfg, None, None, use_pallas=False)


def test_concurrent_requests_batch(server_and_service):
    base, service, _ = server_and_service
    wavs = [_wav(seed=10 + i) for i in range(8)]
    refs = [np.asarray(f.result())
            for f in [service.submit(w) for w in wavs]]
    results = [None] * len(wavs)
    errors = []

    def post_fmt(i):
        try:
            _, out = _post(base + "/tag?format=f32&full=1", wavs[i].tobytes())
            results[i] = out
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=post_fmt, args=(i,))
               for i in range(len(wavs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors and all(r is not None for r in results)
    for out, ref in zip(results, refs):
        np.testing.assert_allclose(np.asarray(out["probs"]), ref, atol=1e-6)


def test_metrics_endpoint(server_and_service):
    base, _, _ = server_and_service
    _post(base + "/tag?format=f32", _wav().tobytes())  # ensure >=1 sample
    req = urllib.request.Request(base + "/metrics")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    # Prometheus text exposition: TYPE lines + the counters
    assert "# TYPE uit_requests_total counter" in text
    assert "uit_errors_total" in text
    assert 'uit_request_latency_ms{quantile="0.5"}' in text
    assert "uit_weights_version 1" in text
    reqs = [ln for ln in text.splitlines()
            if ln.startswith("uit_requests_total")]
    assert len(reqs) == 1 and float(reqs[0].split()[1]) >= 1


def test_reload_endpoint(server_and_service):
    from uit_mobile_tpu.serve import (
        StreamingConfig,
        StreamSessions,
        make_framewise_fn,
    )

    base, service, (cfg, params, state) = server_and_service
    # module fixture has no reload_fn -> 501
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/reload", b"")
    assert e.value.code == 501

    params2, state2 = models.build(cfg, jax.random.key(99))
    fw1 = make_framewise_fn(cfg, params, state, max_seconds=2,
                            use_pallas=False)
    ss = StreamSessions(cfg, params, state,
                        config=StreamingConfig(n_audioset=6), max_sessions=2)

    def reload_fn():
        info = {"weights_version": service.reload(params2, state2)}
        info["_framewise_fn"] = make_framewise_fn(
            cfg, params2, state2, max_seconds=2, use_pallas=False)
        info["stream_sessions"] = ("reloaded" if ss.reload(cfg, params2,
                                                           state2)
                                   else "deferred")
        return info

    server4 = make_http_server(service, labels={i: f"lbl{i}" for i in
                                                range(6)},
                               port=0, framewise_fn=fw1, stream_sessions=ss,
                               reload_fn=reload_fn)
    threading.Thread(target=server4.serve_forever, daemon=True).start()
    base4 = f"http://127.0.0.1:{server4.server_address[1]}"
    try:
        wav = _wav(seed=42)
        _, before = _post(base4 + "/tag?format=f32&full=1", wav.tobytes())
        _, ev_before = _post(base4 + "/events?format=f32&threshold=0.0",
                             wav.tobytes())
        # an open stream session defers the session-tagger swap
        _, o = _post(base4 + "/stream/open", b"")
        code, r = _post(base4 + "/reload", b"")
        assert code == 200
        assert r["weights_version"] == 2
        assert r["stream_sessions"] == "deferred"
        assert r["events"] == "reloaded"
        assert "_framewise_fn" not in r  # private key stripped
        # /healthz reflects the new version
        _, h = _get(base4 + "/healthz")
        assert h["weights_version"] == 2
        # /tag and /events now score with the new weights
        _, after = _post(base4 + "/tag?format=f32&full=1", wav.tobytes())
        ref = np.asarray(service.submit(wav).result(timeout=60))
        np.testing.assert_allclose(np.asarray(after["probs"]), ref,
                                   atol=1e-6)
        assert not np.allclose(np.asarray(before["probs"]),
                               np.asarray(after["probs"]))
        _, ev_after = _post(base4 + "/events?format=f32&threshold=0.0",
                            wav.tobytes())
        assert ev_after != ev_before or True  # shape-stable; values moved
        # close the session -> the deferred swap goes through
        _post(f"{base4}/stream/{o['id']}/close", b"")
        code, r2 = _post(base4 + "/reload", b"")
        assert r2["weights_version"] == 3
        assert r2["stream_sessions"] == "reloaded"
    finally:
        server4.shutdown()
        server4.server_close()
