"""Standalone serving host for exported bundles — deployment endpoint.

Completes the deployment story (rlvae_tpu/export.py): a host that has ONLY
jax + an exported StableHLO bundle serves the model over HTTP with dynamic
batching.  No model classes, no checkpoints, no framework internals — the
programs are deserialized from disk and fed to the
:class:`~rlvae_tpu.serving.BatchingEngine` through
:meth:`~rlvae_tpu.export.ExportedModel.as_ops`.  (The reference would have
to ship its whole source tree + cloudpickled nets to do this,
app/backend/model_manager.py.)

API (JSON over stdlib HTTP):

- ``GET  /ops``      — ops, buckets, shapes from the manifest
- ``GET  /stats``    — engine batching/latency stats
- ``POST /v1/<op>``  — ``{"items": [<nested-list item>, ...]}`` →
  ``{"outputs": [...]}``; items are submitted individually so concurrent
  clients coalesce into shared device dispatches.

Run: ``python -m rlvae_tpu.bundle_server <bundle_dir> [--port N]``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from rlvae_tpu.export import load_exported
from rlvae_tpu.serving import BatchingEngine, ServeConfig

__all__ = ["serve_bundle"]


def _make_handler(exported, engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, status=200):
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ops":
                return self._json({
                    "ops": {op: list(exported.buckets(op)) for op in exported.ops},
                    "manifest": {k: v for k, v in exported.manifest.items()
                                 if k != "programs"},
                })
            if self.path == "/stats":
                return self._json(engine.stats_snapshot())
            return self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                if not self.path.startswith("/v1/"):
                    return self._json({"error": "not found"}, 404)
                op = self.path[len("/v1/"):]
                if op not in exported.ops:
                    return self._json(
                        {"error": f"unknown op {op!r}", "ops": list(exported.ops)},
                        404,
                    )
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                items = payload.get("items")
                if not isinstance(items, list) or not items:
                    return self._json({"error": "'items' must be a non-empty list"}, 400)
                dtype = np.dtype(
                    next(iter(exported.manifest["programs"][op].values()))["in_dtype"]
                )
                futures = [
                    engine.submit(op, np.asarray(item, dtype=dtype)) for item in items
                ]
                outs = [np.asarray(f.result(timeout=600)).tolist() for f in futures]
                return self._json({"outputs": outs})
            except Exception as e:
                return self._json({"error": f"{type(e).__name__}: {e}"}, 500)

    return Handler


def serve_bundle(bundle_dir: str | Path, port: int = 0, block: bool = False,
                 max_wait_ms: float = 2.0):
    """Serve an exported bundle.  Returns ``(httpd, engine)`` when
    ``block=False``; the engine's buckets come from the bundle manifest."""
    exported = load_exported(bundle_dir)
    buckets = tuple(sorted({b for op in exported.ops for b in exported.buckets(op)}))
    engine = BatchingEngine(
        exported.as_ops(), ServeConfig(buckets=buckets, max_wait_ms=max_wait_ms)
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(exported, engine))
    if block:
        print(f"[bundle] serving {bundle_dir} on http://127.0.0.1:{httpd.server_address[1]}")
        try:
            httpd.serve_forever()
        finally:
            engine.stop()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, engine


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bundle_dir")
    ap.add_argument("--port", type=int, default=8018)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in this process")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    serve_bundle(args.bundle_dir, port=args.port, block=True)


if __name__ == "__main__":
    main()
