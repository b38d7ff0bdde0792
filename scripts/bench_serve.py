"""Serving-path benchmark: exported-artifact inference latency/throughput.

Measures what a deployed user actually runs — the StableHLO executables written
by vit_tpu.serve.export, called through load_exported (no flax, no model code)
— on the current default platform (the real TPU chip here):

  1. encode  images (B,128,128,3) → 256 code indices   [flagship TiTok-B]
  2. decode  indices (B,256)      → images
  3. optional --http: npy-over-HTTP round-trip latency through
     vit_tpu.serve.server at bs (server pads bs=1 requests up to B)

Prints one JSON line per metric. Timing uses np.asarray of the result (a full
device→host fetch) as the completion barrier; the HTTP number additionally
includes (de)serialization + loopback transport, i.e. true client latency.

Usage:
  python scripts/bench_serve.py [--bs 64] [--steps 20] [--http] [--ckpt DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _export_dir(args) -> str:
    from vit_tpu.serve.export import export_tokenizer

    out = tempfile.mkdtemp(prefix="bench_serve_")
    if args.ckpt:
        export_tokenizer(args.ckpt, out, bs=args.bs,
                         platforms=(jax.default_backend(),),
                         attn_impl=args.attn_impl, quantize=args.quantize)
        return out

    # no checkpoint: flagship-config TiTok-B with random params, written
    # through the real Checkpointer so the full export path is exercised
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = TiTokConfig(image_size=128, patch_size=16, latent_tokens=256,
                      codebook_size=2048, latent_dim=12, transformer="B")
    model = TiTok(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 128, 128, 3)))["params"]
    ckpt_dir = str(Path(out) / "ckpt")
    ckpt = Checkpointer(ckpt_dir, mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()
    export_tokenizer(ckpt_dir, out, bs=args.bs,
                     platforms=(jax.default_backend(),),
                     attn_impl=args.attn_impl, quantize=args.quantize)
    return out


def _timed(fn, steps, barrier=np.asarray):
    barrier(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    barrier(out)   # completion barrier (full host fetch by default)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ckpt", default=None,
                    help="trained checkpoint dir (default: random flagship)")
    ap.add_argument("--attn_impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="export the artifact with int8 MXU matmuls")
    ap.add_argument("--http", action="store_true",
                    help="also measure npy-over-HTTP round-trip latency")
    ap.add_argument("--http_clients", type=int, default=0,
                    help="N concurrent 1-row HTTP clients: measures req/s "
                    "with micro-batching (--batch_window_ms, default 10) vs "
                    "without, reporting the coalescing speedup")
    ap.add_argument("--batch_window_ms", type=float, default=None,
                    help="micro-batching window for --http_clients")
    ap.add_argument("--device_resident", action="store_true",
                    help="keep inputs on device and fetch only a 1-element "
                    "barrier: isolates on-chip latency from host<->device "
                    "transfer (through the dev tunnel the transfer dominates; "
                    "a production host's PCIe link would not)")
    args = ap.parse_args()

    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    out = _export_dir(args)
    from vit_tpu.serve.export import load_exported

    served = load_exported(out)
    man = served["manifest"]
    n_tokens = man["n_tokens"]
    size = man["image_size"]
    images = np.random.rand(args.bs, size, size, 3).astype(np.float32)

    if args.device_resident:
        barrier = lambda o: jax.device_get(jnp.ravel(o)[:1])  # noqa: E731
        enc_in = jnp.asarray(images)
    else:
        barrier, enc_in = np.asarray, images
    enc_t = _timed(lambda: served["encode"](enc_in), args.steps, barrier)
    idx = np.asarray(served["encode"](enc_in))
    dec_in = jnp.asarray(idx) if args.device_resident else idx
    dec_t = _timed(lambda: served["decode"](dec_in), args.steps, barrier)

    toks = args.bs * n_tokens
    q = {"quantize": args.quantize} if args.quantize else {}
    if args.device_resident:
        q["device_resident"] = True
    print(json.dumps({"metric": "serve_encode_tokens_per_s",
                      "value": round(toks / enc_t, 1), "unit": "tokens/s",
                      "bs": args.bs, "latency_ms": round(enc_t * 1e3, 2), **q}))
    print(json.dumps({"metric": "serve_decode_tokens_per_s",
                      "value": round(toks / dec_t, 1), "unit": "tokens/s",
                      "bs": args.bs, "latency_ms": round(dec_t * 1e3, 2), **q}))
    print(json.dumps({"metric": "serve_encdec_tokens_per_s",
                      "value": round(toks / (enc_t + dec_t), 1),
                      "unit": "tokens/s", "bs": args.bs, **q}))

    if args.http:
        import io
        import threading
        import urllib.request

        from vit_tpu.serve.server import make_server

        srv = make_server(out, port=0, warmup=True)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/encode"

        def post(arr):
            buf = io.BytesIO()
            np.save(buf, arr)
            req = urllib.request.Request(url, data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req) as resp:
                return np.load(io.BytesIO(resp.read()))

        one = images[:1]
        post(one)
        for name, payload in (("http_encode_bs1", one),
                              ("http_encode_full", images)):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                post(payload)
            lat = (time.perf_counter() - t0) / args.steps
            print(json.dumps({"metric": f"serve_{name}_latency_ms",
                              "value": round(lat * 1e3, 2), "unit": "ms",
                              "bs": int(payload.shape[0])}))
        srv.shutdown()

    if args.http_clients:
        # N concurrent 1-row clients, with and without micro-batching: the
        # coalescing win is the requests/s ratio (server-side device calls
        # drop ~N-fold when the window captures a full flight)
        import io
        import threading
        import urllib.request

        from vit_tpu.serve.server import make_server

        def run_clients(window_ms):
            srv = make_server(out, port=0, warmup=True,
                              batch_window_ms=window_ms)
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            url = f"http://127.0.0.1:{srv.server_address[1]}/encode"
            buf = io.BytesIO()
            np.save(buf, images[:1])
            payload = buf.getvalue()

            def post_loop(n):
                for _ in range(n):
                    req = urllib.request.Request(url, data=payload,
                                                 method="POST")
                    with urllib.request.urlopen(req) as resp:
                        resp.read()

            post_loop(1)  # warm
            per_client = max(args.steps // args.http_clients, 4)
            threads = [threading.Thread(target=post_loop, args=(per_client,))
                       for _ in range(args.http_clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            srv.shutdown()
            return args.http_clients * per_client / dt

        base = run_clients(0.0)
        win = args.batch_window_ms or 10.0
        batched = run_clients(win)
        print(json.dumps({"metric": "serve_http_bs1_concurrent_req_per_s",
                          "value": round(batched, 1), "unit": "req/s",
                          "clients": args.http_clients,
                          "batch_window_ms": win,
                          "unbatched_req_per_s": round(base, 1),
                          "speedup": round(batched / base, 2)}))


if __name__ == "__main__":
    main()
