"""JSON-over-HTTP front end for the serving services (stdlib only — the
environment has no web framework and needs none: the hot path is the device
program; the HTTP layer only decodes inputs and forwards to the batching
engine, whose worker thread owns all device dispatch).

Endpoints:

- ``POST /caption``  — body ``{"image": <input>}`` -> ``{"caption": [...]}``
- ``POST /explain``  — body ``{"image": <input>, "include_relevance": bool}``
  -> :func:`~.service.explanation_payload`
- ``GET  /healthz``  — liveness + warmup state
- ``GET  /stats``    — per-engine batching/latency statistics

``<input>`` is either a nested JSON list (float32, exact service input
shape — (H, W, 3) image or (36, D) BU region features) or
``{"b64": <base64 of packed bytes>, "shape": [...], "dtype": "float32"}``
for efficiency.  ``"dtype": "uint8"`` sends raw pixels (4x smaller wire +
device payload; normalized on device).

Requests are handled on ThreadingHTTPServer threads; each blocks on its
future while the single engine worker batches concurrent arrivals — HTTP
concurrency is exactly what feeds the dynamic batcher.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .service import explanation_payload


def decode_input(spec) -> np.ndarray:
    """JSON input -> ndarray (nested lists or b64-packed).

    ``dtype`` (optional, default float32) may be ``"uint8"``: raw pixel
    payloads are 4x smaller on the wire AND ship to the device unconverted
    (ImageNet normalization runs on device, models.captioner.prepare_visual)."""
    if isinstance(spec, dict):
        dtype = np.dtype(spec.get("dtype", "float32"))
        if dtype not in (np.dtype(np.float32), np.dtype(np.uint8)):
            raise ValueError(f"unsupported input dtype {dtype}")
        raw = base64.b64decode(spec["b64"])
        arr = np.frombuffer(raw, dtype=dtype).copy()
        return arr.reshape(spec["shape"])
    return np.asarray(spec, dtype=np.float32)


def make_http_server(services: dict, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server.

    ``services``: ``{"caption": CaptionService, "explain": ExplainService}``
    (either may be absent).  Returns a ThreadingHTTPServer; run it with
    ``serve_forever()`` (``server.server_address`` holds the bound port when
    ``port=0``).  ``server.warm`` is flipped by :func:`warm_services` once
    compiles finish — ``/healthz`` reports it."""

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; the CLI enables logging
        def log_message(self, fmt, *args):  # noqa: A003
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "warm": getattr(self.server, "warm", False),
                                  "services": sorted(services)})
            elif self.path == "/stats":
                self._reply(200, {name: svc.stats()
                                  for name, svc in services.items()})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            name = self.path.lstrip("/")
            svc = services.get(name)
            if svc is None:
                self._reply(404, {"error": f"unknown endpoint {self.path}",
                                  "have": sorted(services)})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if (req.get("include_relevance")
                        and getattr(svc, "payload", "full") == "summary"):
                    self._reply(400, {
                        "error": "this server runs payload='summary' "
                                 "(relevance maps are reduced on device); "
                                 "start serve.py --payload full to request "
                                 "include_relevance"})
                    return
                image = decode_input(req["image"])
                result = svc(image)  # blocks on the batcher's future
            except (KeyError, ValueError, json.JSONDecodeError) as exc:
                self._reply(400, {"error": str(exc)})
                return
            except Exception as exc:  # noqa: BLE001 — surface, don't die
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})
                return
            if name == "explain" and not isinstance(result, dict):
                result = explanation_payload(
                    result,
                    include_relevance=bool(req.get("include_relevance")))
            self._reply(200, result)

    server = ThreadingHTTPServer((host, port), Handler)
    server.warm = False
    return server


def warm_services(server: ThreadingHTTPServer, services: dict,
                  *, background: bool = True) -> None:
    """Compile every service's program (one dummy batch each), then flip
    ``server.warm``.  Background by default so the server can bind and
    answer /healthz while the (minutes-long on the remote TPU helper)
    compile runs."""

    def _warm():
        for svc in services.values():
            svc.warmup()
        server.warm = True

    if background:
        threading.Thread(target=_warm, name="warmup", daemon=True).start()
    else:
        _warm()
