"""Model serving: posterior queries over HTTP (stdlib only).

The production surface of a trained field model: load a checkpoint
(utils/checkpoint.py), keep the conditioned state resident on device, and
answer batched posterior queries. Endpoints:

  GET  /health            -> {"status": "ok", "model": <kind>, "n": N}
  POST /predict           body {"points": [[x,y,z], ...],
                                "full_cov": false, "include_noise": true}
                          -> {"mean": [...], "var": [...]}
  POST /eid               body {"points": [...], "alpha": 1/11}
                          -> {"eid": [...]}  (Expected Information Density)

Queries of the same batch shape reuse the jitted executable; ragged sizes
are padded to the next power of two so the compile cache stays small.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ModelServer:
    """Wraps a restored model for query serving."""

    def __init__(self, model, prior_sig: float | None = None):
        self.model = model
        self.n_train = int(np.asarray(model.X).shape[0]) if hasattr(
            model, "X") else int(np.asarray(model.X_train_).shape[0])
        if prior_sig is None:
            pa = np.asarray(model.param_array)
            prior_sig = float(pa[0] + pa[-1])
        self.prior_sig = prior_sig
        self._lock = threading.Lock()
        _ = self._predict(np.zeros((1, self._dim()), np.float64))  # warm

    @classmethod
    def from_checkpoint(cls, path: str):
        from mfgp_tpu.utils.checkpoint import load_checkpoint

        ck = load_checkpoint(path)
        return cls(ck.model.restore())

    def _dim(self):
        X = getattr(self.model, "X", None)
        if X is None:
            X = self.model.X_train_
        return int(np.asarray(X).shape[1])

    @staticmethod
    def _pad(pts: np.ndarray):
        n = pts.shape[0]
        cap = 1
        while cap < n:
            cap *= 2
        if cap == n:
            return pts, n
        return np.vstack([pts, np.repeat(pts[-1:], cap - n, axis=0)]), n

    def _predict(self, pts, include_noise: bool = True):
        padded, n = self._pad(np.atleast_2d(np.asarray(pts, np.float64)))
        with self._lock:
            mu, var = self.model.predict(padded,
                                         include_noise=include_noise)
        return np.asarray(mu).reshape(-1)[:n], np.asarray(var).reshape(-1)[:n]

    def handle(self, route: str, payload: dict) -> dict:
        if route == "/health":
            return {"status": "ok",
                    "model": type(self.model).__name__, "n": self.n_train}
        pts = np.asarray(payload.get("points", []), np.float64)
        if pts.size == 0:
            raise ValueError("no points")
        if route == "/predict":
            mu, var = self._predict(
                pts, include_noise=payload.get("include_noise", True))
            return {"mean": mu.tolist(), "var": var.tolist()}
        if route == "/eid":
            from mfgp_tpu.metrics.eid import expected_information_density

            mu, var = self._predict(pts)
            eid = expected_information_density(
                mu, var, self.prior_sig,
                alpha=payload.get("alpha", 1.0 / 11))
            return {"eid": np.asarray(eid).tolist()}
        raise KeyError(route)


def make_http_server(server: ModelServer, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.server_address`` has the bound
    port when port=0."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, server.handle("/health", {}))
            else:
                self._send(404, {"error": "unknown route"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, server.handle(self.path, payload))
            except (KeyError, ValueError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def serve_checkpoint(path: str, host: str = "127.0.0.1", port: int = 8080):
    """Blocking entry point: load checkpoint, serve forever."""
    srv = make_http_server(ModelServer.from_checkpoint(path), host, port)
    print(f"serving on {srv.server_address}")
    srv.serve_forever()
