"""Minimal HTTP inference server over an export directory.

Serves the artifacts written by ``vit_tpu.serve.export`` (the reference has
no serving story at all). stdlib-only on the wire — arrays travel as ``.npy``
bytes, the one format every numpy client already speaks:

  GET  /manifest        → manifest.json
  POST /<fn>            body: .npy array → response: .npy array
                          (tokenizers: /encode /decode; classifiers: /predict)

Exported executables are fixed-batch by default (bs baked at export time):
requests with a smaller leading dimension are zero-padded up to bs and the
response sliced back, so clients can send single examples to a bs=8 artifact;
requests larger than bs are rejected (split client-side or export a bigger
batch). Artifacts exported with ``--bs 0`` have a SYMBOLIC batch dim and
accept any request size as-is (one XLA compile per distinct size).

CLI:  python -m vit_tpu.serve.server --dir exported/titok --port 8421 --warmup

Client:
  buf = io.BytesIO(); np.save(buf, images)
  resp = urllib.request.urlopen(
      urllib.request.Request(url + "/encode", data=buf.getvalue(),
                             method="POST"))
  indices = np.load(io.BytesIO(resp.read()))
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_server(export_dir: str, host: str = "127.0.0.1", port: int = 8421,
                warmup: bool = False) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer bound to the export dir.
    Call ``.serve_forever()`` on the result; ``.shutdown()`` stops it."""
    from vit_tpu.serve.export import load_exported

    served = load_exported(export_dir)
    manifest = served["manifest"]
    fns = {k: v for k, v in served.items() if k != "manifest"}
    bs = int(manifest["bs"])

    if warmup:
        # trigger each executable's device compile before the first request
        import jax

        for name, fn in fns.items():
            aval = _input_aval(export_dir, name)
            jax.block_until_ready(fn(np.zeros(aval[0], aval[1])))

    class Handler(BaseHTTPRequestHandler):
        # single-threaded dispatch into jax is NOT needed — calls on a fixed
        # executable are thread-safe — but keep responses ordered per client
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/manifest"):
                self._reply(200, json.dumps(manifest).encode(),
                            "application/json")
            else:
                self._reply(404, b"unknown path", "text/plain")

        def do_POST(self):
            name = self.path.lstrip("/")
            fn = fns.get(name)
            if fn is None:
                self._reply(404, f"no function {name!r}; have "
                            f"{sorted(fns)}".encode(), "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                k = arr.shape[0]
                if bs and k > bs:
                    raise ValueError(
                        f"batch {k} > exported bs {bs}; split the request")
                if bs and k < bs:
                    pad = np.zeros((bs - k,) + arr.shape[1:], arr.dtype)
                    arr = np.concatenate([arr, pad], axis=0)
                result = np.asarray(fn(arr))[:k]
                buf = io.BytesIO()
                np.save(buf, result)
                self._reply(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # surface the cause to the client
                self._reply(400, f"{type(e).__name__}: {e}".encode(),
                            "text/plain")

    return ThreadingHTTPServer((host, port), Handler)


def _input_aval(export_dir: str, name: str):
    """(shape, dtype) of an exported fn's data argument (arg 1 after params)."""
    from pathlib import Path

    from jax import export as jex

    exp = jex.deserialize(
        (Path(export_dir) / f"{name}.jaxexport").read_bytes())
    aval = exp.in_avals[-1]
    # symbolic dims (bs=0 exports) have no concrete size: warm up at 1
    shape = tuple(d if isinstance(d, int) else 1 for d in aval.shape)
    return shape, aval.dtype


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", required=True, help="export directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8421)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every fn before accepting requests")
    args = ap.parse_args(argv)

    srv = make_server(args.dir, args.host, args.port, warmup=args.warmup)
    print(f"serving {args.dir} on http://{args.host}:{args.port} "
          f"(POST .npy to /<fn>)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
