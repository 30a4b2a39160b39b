"""HTTP front for the batching TaggingService (stdlib-only).

The reference serves one clip per process invocation (reference
inference.py:51-62); the production TPU story is a long-lived service.
This module exposes ``TaggingService`` over plain HTTP so any client can
POST audio and get JSON probabilities — concurrent requests are batched
onto the device by the service's queue (one request thread per
connection via ``ThreadingHTTPServer``; the service worker groups
whatever is pending into fixed-shape bucket batches, so HTTP concurrency
directly becomes TPU batch occupancy).

Endpoints:
    GET  /healthz          liveness + model/device info
    GET  /labels           the index -> display-name map
    POST /tag[?k=5&full=1] score one clip; body is either
        - a RIFF/WAV blob (Content-Type audio/wav; must match the
          service sample rate; multichannel is downmixed by mean), or
        - raw samples with ?format=pcm16 (int16 LE mono) or ?format=f32
          (float32 LE mono, normalized to [-1, 1]).
      Response: {"top": [{"index", "label", "prob"}...], "n_samples": N}
      (+ "probs": [all C floats] when full=1).

No third-party web framework: the stdlib server keeps the serving path
auditable and dependency-free, matching the repo's zero-install rule.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def make_http_server(service, labels=None, host: str = "127.0.0.1",
                     port: int = 8000, topk: int = 5,
                     model_name: str = "?", quiet: bool = True):
    """-> a ThreadingHTTPServer wired to ``service`` (not yet serving).

    Call ``serve_forever()`` (blocking) or drive it from a thread; the
    caller owns the service lifecycle (``service.close()`` after
    ``shutdown()``).
    """
    labels = {int(k): v for k, v in (labels or {}).items()}
    sr = service.cfg.sample_rate
    max_samples = service.cfg.max_seconds * sr

    class Handler(BaseHTTPRequestHandler):
        server_version = "uit-serve"
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # noqa: N802
            if not quiet:
                BaseHTTPRequestHandler.log_message(self, fmt, *args)

        # ----------------------------------------------------------- util
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, msg: str):
            self._json(code, {"error": msg})

        # ------------------------------------------------------------ GET
        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                dev = jax.devices()[0]
                self._json(200, {
                    "status": "ok",
                    "model": model_name,
                    "platform": dev.platform,
                    "sample_rate": sr,
                    "max_seconds": service.cfg.max_seconds,
                    "batch_size": service.cfg.batch_size,
                })
            elif path == "/labels":
                self._json(200, {str(k): v for k, v in labels.items()})
            else:
                self._error(404, f"unknown path {path!r}")

        # ----------------------------------------------------------- POST
        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/tag":
                self._error(404, f"unknown path {url.path!r}")
                return
            q = parse_qs(url.query)
            try:
                length = int(self.headers.get("Content-Length", ""))
            except ValueError:
                self._error(411, "Content-Length required")
                return
            # WAV container overhead is tiny; 4 bytes/sample bounds f32
            if length > max_samples * 4 + 65536:
                self._error(413, f"body exceeds max_seconds="
                                 f"{service.cfg.max_seconds} at {sr} Hz")
                return
            body = self.rfile.read(length)
            try:
                wav = self._decode(body, q)
            except ValueError as e:
                self._error(400, str(e))
                return
            if wav.shape[0] > max_samples:
                self._error(413, f"clip of {wav.shape[0]} samples exceeds "
                                 f"max_seconds={service.cfg.max_seconds}")
                return
            if wav.shape[0] == 0:
                self._error(400, "empty clip")
                return
            try:
                probs = np.asarray(service.submit(wav).result(timeout=120))
            except RuntimeError as e:  # service closed / dispatch failure
                self._error(503, str(e))
                return
            k = max(1, min(int(q.get("k", [topk])[0]), probs.shape[0]))
            top_idx = np.argsort(probs)[::-1][:k]
            out = {
                "top": [{"index": int(i),
                         "label": labels.get(int(i), f"class_{int(i)}"),
                         "prob": float(probs[i])} for i in top_idx],
                "n_samples": int(wav.shape[0]),
            }
            if q.get("full", ["0"])[0] not in ("0", "", "false"):
                out["probs"] = [float(p) for p in probs]
            self._json(200, out)

        def _decode(self, body: bytes, q) -> np.ndarray:
            fmt = q.get("format", [None])[0]
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if fmt is None and (body[:4] == b"RIFF" or ctype in
                                ("audio/wav", "audio/x-wav", "audio/wave")):
                from ..data import read_wav_bytes

                try:
                    data, got_sr = read_wav_bytes(body)
                except Exception as e:
                    raise ValueError(f"undecodable WAV body: {e}") from None
                if got_sr != sr:
                    raise ValueError(f"sample rate {got_sr} != service rate "
                                     f"{sr}; resample client-side")
                return data.mean(axis=0) if data.shape[0] > 1 else data[0]
            if fmt == "pcm16":
                if len(body) % 2:
                    raise ValueError("pcm16 body length must be even")
                return np.frombuffer(body, dtype="<i2")
            if fmt == "f32":
                if len(body) % 4:
                    raise ValueError("f32 body length must be a multiple of 4")
                return np.frombuffer(body, dtype="<f4")
            raise ValueError(
                "send a RIFF/WAV body (Content-Type audio/wav) or raw "
                "samples with ?format=pcm16|f32"
            )

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True
    return server


def serve_http(service, labels=None, host="127.0.0.1", port=8000,
               topk=5, model_name="?", quiet=False,
               ready_event: threading.Event | None = None):
    """Blocking convenience wrapper: serve until KeyboardInterrupt."""
    server = make_http_server(service, labels=labels, host=host, port=port,
                              topk=topk, model_name=model_name, quiet=quiet)
    if ready_event is not None:
        ready_event.set()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()
    return server
