"""Minimal production serving host around an exported artifact.

    python -m mcseg_tpu.tools.export_serving runs/x/last --out m.shlo
    python -m mcseg_tpu.tools.serve_http m.shlo --port 8000

Stdlib-only (ThreadingHTTPServer) — no web-framework dependency; the model
side is the AOT artifact (eval/serving.py), compiled once at startup, so the
request path is decode → device call → PNG encode. The reference has no
serving surface at all (SURVEY.md §1); this is the deployment-shaped
counterpart of its `adapt_tester.py` dump loop.

API (JSON in / JSON out):
  GET  /healthz    -> the artifact manifest (input spec, platforms, n_class)
  POST /predict    -> {"image": <base64 PNG>, "depth"?: <base64 16-bit PNG,
                       millimeters>, "hha"?/"ir"?: <base64 PNG>}
                   -> {"pred_png": <base64 gray PNG of train ids>,
                       "shape": [H, W], "classes": {id: pixel_count}}

Batching: the artifact has a static batch size B (its manifest records it);
a single request's planes are tiled to B and row 0 of the prediction is
returned. Export with --batch 1 for a latency-serving artifact, larger B +
a client-side batcher for throughput.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _decode_plane(b64: str, kind: str, h: int, w: int,
                  allow_resize: bool = False) -> np.ndarray:
    """base64 PNG -> decoded plane at (h, w); native decoder with PIL
    fallback (same contract as data/datasets.py).

    The manifest advertises an exact input geometry; a client shipping a
    wrong-size plane gets a ValueError (-> HTTP 400), NOT a silent resize
    that degrades predictions behind a 200. ``allow_resize`` (the server's
    --auto_resize flag) restores the lenient behavior explicitly.
    """
    from PIL import Image

    from mcseg_tpu import native

    raw = base64.b64decode(b64)
    # PIL.open is lazy (header-only) — a cheap native-geometry check that
    # works for both the native-decoder and PIL paths below
    native_size = Image.open(io.BytesIO(raw)).size  # (w, h)
    if native_size != (w, h) and not allow_resize:
        raise ValueError(
            f"plane {kind!r} is {native_size[0]}x{native_size[1]} but the "
            f"artifact input spec is {w}x{h}; re-encode at the spec geometry "
            "or start the server with --auto_resize")
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        f.write(raw)
        path = f.name
    try:
        if native.available():
            try:
                if kind == "image":
                    return native.decode_rgb(path, h, w)
                if kind == "depth":
                    return native.decode_depth16(path, h, w)
                if kind == "hha":
                    return native.decode_rgb(path, h, w)
                return native.decode_gray(path, h, w)  # ir / boundary
            except IOError:
                pass
        img = Image.open(io.BytesIO(raw))
        if kind == "image" or kind == "hha":
            img = img.convert("RGB")
        elif kind in ("ir", "boundary"):
            img = img.convert("L")
        size = (w, h)
        if img.size != size:
            img = img.resize(size, Image.BILINEAR if kind == "image" else Image.NEAREST)
        arr = np.asarray(img)
        if kind == "depth":
            arr = arr.astype(np.float32) * (0.001 if arr.dtype != np.float32 else 1.0)
        return arr
    finally:
        os.unlink(path)


class _Model:
    """Loaded artifact + manifest; thread-safe (jax dispatch serializes)."""

    def __init__(self, artifact_path: str, allow_resize: bool = False):
        from mcseg_tpu.eval.serving import load_serving

        self.call = load_serving(artifact_path)
        with open(artifact_path + ".json") as f:
            self.manifest = json.load(f)
        self.spec = self.manifest["input_spec"]
        self.batch = self.spec[next(iter(self.spec))]["shape"][0]
        self.allow_resize = allow_resize

    def predict(self, planes: dict) -> dict:
        batch = {}
        for key, meta in self.spec.items():
            if key not in planes:
                raise KeyError(f"request is missing plane {key!r} "
                               f"(artifact input spec: {sorted(self.spec)})")
            shape = meta["shape"]  # [B, H, W(, C)]
            h, w = shape[1], shape[2]
            arr = _decode_plane(planes[key], key, h, w, self.allow_resize)
            arr = np.asarray(arr, dtype=np.dtype(meta["dtype"]))
            batch[key] = np.broadcast_to(arr, tuple(shape)).copy()
        out = self.call(batch)
        if not isinstance(out, (tuple, list)):
            out = (out,)
        names = self.manifest.get("outputs", ["pred"])
        return {name: np.asarray(o)[0] for name, o in zip(names, out)}


class _Handler(BaseHTTPRequestHandler):
    model: _Model = None  # set by serve()
    # reject oversized (or bogus-Content-Length) bodies BEFORE reading them:
    # a single huge request must not exhaust host memory on a threaded server
    max_body: int = 64 * 1024 * 1024

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        if self.path == "/healthz":
            self._send(200, self.model.manifest)
        else:
            self._send(404, {"error": "unknown path; use /healthz or /predict"})

    def do_POST(self):  # noqa: N802
        if self.path != "/predict":
            self._send(404, {"error": "unknown path; use /predict"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > self.max_body:
                self._send(413, {"error": f"request body {n} bytes exceeds "
                                          f"the {self.max_body}-byte limit"})
                return
            planes = json.loads(self.rfile.read(n))
            outs = self.model.predict(planes)
            pred = outs["pred"]
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(pred.astype(np.uint8)).save(buf, format="PNG")
            ids, counts = np.unique(pred, return_counts=True)
            payload = {
                "pred_png": base64.b64encode(buf.getvalue()).decode(),
                "shape": list(pred.shape),
                "classes": {int(i): int(c) for i, c in zip(ids, counts)},
            }
            if "depth" in outs:  # multitask artifacts: metric depth, mm PNG
                dmm = np.clip(outs["depth"] * 1000.0, 0, 65535).astype(np.uint16)
                dbuf = io.BytesIO()
                Image.fromarray(dmm).save(dbuf, format="PNG")
                payload["depth_mm_png"] = base64.b64encode(
                    dbuf.getvalue()).decode()
            self._send(200, payload)
        except (KeyError, ValueError, json.JSONDecodeError, OSError) as e:
            # OSError covers PIL's UnidentifiedImageError on corrupt bytes —
            # the client must get the documented JSON 400, never a dropped
            # connection
            self._send(400, {"error": f"{type(e).__name__}: {e}"})
        except Exception as e:  # keep the contract even for surprises
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):  # quiet by default
        pass


def make_server(artifact: str, host: str = "127.0.0.1", port: int = 8000,
                allow_resize: bool = False,
                max_body: int = _Handler.max_body):
    """Build (but don't start) the server; returns ThreadingHTTPServer.
    Separated from serve() so tests can bind port 0 and run it in a thread."""
    handler = type("Handler", (_Handler,),
                   {"model": _Model(artifact, allow_resize),
                    "max_body": max_body})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    p = argparse.ArgumentParser("serve_http",
                                description="Serve an exported artifact over HTTP")
    p.add_argument("artifact", help="path from tools/export_serving --out")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--auto_resize", action="store_true",
                   help="resize wrong-geometry client planes to the artifact "
                        "spec instead of rejecting them with HTTP 400")
    p.add_argument("--max_body_mb", type=int, default=64,
                   help="reject request bodies larger than this (HTTP 413)")
    args = p.parse_args(argv)
    srv = make_server(args.artifact, args.host, args.port,
                      allow_resize=args.auto_resize,
                      max_body=args.max_body_mb * 1024 * 1024)
    print(f"serving {args.artifact} on http://{args.host}:{srv.server_address[1]} "
          f"(spec: {sorted(srv.RequestHandlerClass.model.spec)})", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
