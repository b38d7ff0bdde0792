"""Cross-request micro-batching on the serving path (serve/server.py:Batcher).

The reference has no serving story; this is the standard production
latency-for-throughput knob: concurrent requests coalesce into one fixed-batch
device call instead of each paying a full call. Pins: coalescing actually
reduces device calls, row order within a flight, the carry-to-next-flight
path, error propagation to every waiter, and the HTTP integration under
concurrent clients.
"""

import threading
import time

import numpy as np

from vit_tpu.serve.server import Batcher


class _CountingFn:
    """Fake fixed-batch executable: y = x + 1, counting invocations."""

    def __init__(self, bs):
        self.bs = bs
        self.calls = 0
        self.lock = threading.Lock()

    def __call__(self, arr):
        assert arr.shape[0] == self.bs, f"got {arr.shape[0]}, bs={self.bs}"
        with self.lock:
            self.calls += 1
        return arr + 1.0


def _fire(batcher, arrs):
    outs = [None] * len(arrs)
    errs = [None] * len(arrs)

    def call(i):
        try:
            outs[i] = batcher(arrs[i])
        except Exception as e:  # noqa: BLE001 - recorded for assertion
            errs[i] = e

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(arrs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return outs, errs


def test_batcher_coalesces_concurrent_rows():
    fn = _CountingFn(bs=8)
    b = Batcher(fn, bs=8, window_s=0.25)
    arrs = [np.full((1, 4), float(i), np.float32) for i in range(8)]
    outs, errs = _fire(b, arrs)
    assert errs == [None] * 8
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, arrs[i] + 1.0)  # rows unscrambled
    # 8×1 rows coalesced into at most 2 device calls (thread-start skew can
    # split a flight; without batching this is 8 calls)
    assert fn.calls <= 2


def test_batcher_full_flight_departs_before_window():
    fn = _CountingFn(bs=4)
    b = Batcher(fn, bs=4, window_s=30.0)  # window far beyond test timeout
    arrs = [np.zeros((2, 3), np.float32), np.ones((2, 3), np.float32)]
    t0 = time.monotonic()
    outs, errs = _fire(b, arrs)
    assert errs == [None, None]
    assert time.monotonic() - t0 < 10.0  # departed on fullness, not window
    np.testing.assert_array_equal(outs[1], arrs[1] + 1.0)
    assert fn.calls == 1


def test_batcher_carry_opens_next_flight():
    fn = _CountingFn(bs=4)
    b = Batcher(fn, bs=4, window_s=0.2)
    # 3 + 3 rows: the second request cannot fit the first flight (3+3 > 4)
    # and must be carried whole into its own flight, not split
    arrs = [np.zeros((3, 2), np.float32), np.ones((3, 2), np.float32)]
    outs, errs = _fire(b, arrs)
    assert errs == [None, None]
    for i in range(2):
        np.testing.assert_array_equal(outs[i], arrs[i] + 1.0)
    assert fn.calls == 2


def test_batcher_propagates_device_errors_to_all_waiters():
    def boom(arr):
        raise RuntimeError("device exploded")

    b = Batcher(boom, bs=4, window_s=0.2)
    outs, errs = _fire(b, [np.zeros((1, 2), np.float32),
                           np.zeros((1, 2), np.float32)])
    assert outs == [None, None]
    assert all(isinstance(e, RuntimeError) for e in errs)
    # the worker survives a failed flight: the next request still completes
    b.fn = lambda a: a  # type: ignore[assignment]
    outs, errs = _fire(b, [np.zeros((4, 2), np.float32)])
    assert errs == [None] and outs[0].shape == (4, 2)


def test_http_server_micro_batching(tmp_path):
    import io
    import urllib.request

    import jax
    import jax.numpy as jnp

    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.serve.export import export_tokenizer
    from vit_tpu.serve.server import make_server
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    cfg = TiTokConfig(image_size=32, patch_size=8, latent_tokens=8,
                      codebook_size=64, latent_dim=4, transformer="S",
                      attn_impl="xla", dtype=jnp.float32)
    model = TiTok(cfg)
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(0),
                                           (4, 32, 32, 3), jnp.float32))
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(images[:1]))["params"]
    ckpt = Checkpointer(str(tmp_path / "ckpt"), mode="min")
    ckpt.save_if_best(TrainState.create(
        params, make_optimizer(1e-4, 1, 10, 1e-5, 0.0)), 1.0, config=cfg)
    ckpt.finalize()
    out = export_tokenizer(str(tmp_path / "ckpt"), str(tmp_path / "export"),
                           bs=4, platforms=("cpu",))

    srv = make_server(str(out), port=0, warmup=True, batch_window_ms=150.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def post_one(i, outs):
            buf = io.BytesIO()
            np.save(buf, images[i:i + 1])
            req = urllib.request.Request(url + "/encode", data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                outs[i] = np.load(io.BytesIO(resp.read()))

        outs = [None] * 4
        threads = [threading.Thread(target=post_one, args=(i, outs))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)

        live = np.asarray(model.apply({"params": params},
                                      jnp.asarray(images),
                                      method=model.encode))
        for i in range(4):
            assert outs[i] is not None, f"request {i} hung"
            np.testing.assert_array_equal(outs[i], live[i:i + 1])
    finally:
        srv.shutdown()
