"""Serving layer: micro-batcher semantics + the HTTP front end.

All on CPU (conftest), tiny images, random params — fast tier. The batching
*win* (occupancy > 1 under concurrent load) is asserted with a generous
linger window so the test is scheduling-independent.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from fast_neural_style_transfer_tpu.serve.batcher import (
    MicroBatcher,
    QueueFull,
)


def _echo_forward(batch):
    # identity-ish model: keeps shape/dtype, marks pixels so crops are checked
    assert batch.ndim == 4 and batch.dtype == np.uint8
    return batch ^ 0xFF


class TestMicroBatcher:
    def test_single_request_roundtrip(self):
        b = MicroBatcher(_echo_forward, max_wait_ms=1.0)
        try:
            img = np.random.default_rng(0).integers(
                0, 255, (40, 56, 3), dtype=np.uint8)
            out = b.submit(img).result(timeout=30)
            np.testing.assert_array_equal(out, img ^ 0xFF)
        finally:
            b.close()

    def test_concurrent_requests_coalesce(self):
        seen = []

        def forward(batch):
            seen.append(batch.shape[0])
            return batch

        b = MicroBatcher(forward, max_batch=8, max_wait_ms=2000.0)
        try:
            imgs = [np.full((32, 32, 3), i, np.uint8) for i in range(8)]
            futs = [b.submit(im) for im in imgs]
            outs = [f.result(timeout=60) for f in futs]
            for im, out in zip(imgs, outs):
                np.testing.assert_array_equal(out, im)
            # 8 same-bucket submits before the linger expires -> one batch
            assert b.stats.snapshot()["mean_batch_occupancy"] == 8.0
            assert seen == [8]
        finally:
            b.close()

    def test_mixed_buckets_batch_separately_and_crop(self):
        shapes = []

        def forward(batch):
            shapes.append(batch.shape)
            return batch

        b = MicroBatcher(forward, max_batch=8, max_wait_ms=500.0,
                         bucket_multiple=64)
        try:
            small = np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3)
            big = np.arange(100 * 90 * 3, dtype=np.uint8).reshape(100, 90, 3)
            f1, f2 = b.submit(small), b.submit(big)
            np.testing.assert_array_equal(f1.result(timeout=60), small)
            np.testing.assert_array_equal(f2.result(timeout=60), big)
            # (40,50) buckets to 64x64; (100,90) to 128x128 — two programs
            assert sorted(s[1:3] for s in shapes) == [(64, 64), (128, 128)]
        finally:
            b.close()

    def test_forward_error_propagates_to_every_caller(self):
        def forward(batch):
            raise RuntimeError("chip fell over")

        b = MicroBatcher(forward, max_batch=4, max_wait_ms=200.0)
        try:
            futs = [b.submit(np.zeros((16, 16, 3), np.uint8))
                    for _ in range(3)]
            for f in futs:
                with pytest.raises(RuntimeError, match="chip fell over"):
                    f.result(timeout=60)
        finally:
            b.close()

    def test_backpressure_rejects_above_max_pending(self):
        release = threading.Event()

        def forward(batch):
            release.wait(timeout=60)
            return batch

        b = MicroBatcher(forward, max_batch=1, max_wait_ms=0.0, max_pending=2)
        try:
            img = np.zeros((8, 8, 3), np.uint8)
            futs = [b.submit(img)]  # dispatcher grabs this one, blocks
            # fill the queue behind the blocked batch
            for _ in range(40):
                try:
                    futs.append(b.submit(img))
                except QueueFull:
                    break
            else:
                pytest.fail("QueueFull never raised")
            assert b.stats.snapshot()["rejected"] >= 1
            release.set()
            for f in futs:
                f.result(timeout=60)
        finally:
            release.set()
            b.close()

    def test_input_validation(self):
        b = MicroBatcher(_echo_forward)
        try:
            with pytest.raises(ValueError):
                b.submit(np.zeros((8, 8, 4), np.uint8))
            with pytest.raises(TypeError):
                b.submit(np.zeros((8, 8, 3), np.float32))
        finally:
            b.close()

    def test_close_fails_queued_requests(self):
        import time

        # max_batch=2 + huge linger: the lone request stays queued while the
        # dispatcher waits for a co-batchable second, so close() must fail it
        b = MicroBatcher(_echo_forward, max_batch=2, max_wait_ms=60000.0)
        img = np.zeros((8, 8, 3), np.uint8)
        queued = b.submit(img)
        time.sleep(0.2)
        b.close()
        with pytest.raises(RuntimeError):
            queued.result(timeout=60)
        with pytest.raises(RuntimeError):
            b.submit(img)


@pytest.mark.slow
def test_cli_sigterm_drains(tmp_path):
    """fnst-serve exits cleanly on SIGTERM (the TPU-VM preemption signal)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    import jax

    from fast_neural_style_transfer_tpu.models.transformer import TransformerNet
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    ckpt = str(tmp_path / "m.npz")
    save_params_npz(TransformerNet.init(jax.random.PRNGKey(0)), ckpt)
    proc = subprocess.Popen(
        [sys.executable, "-m", "fast_neural_style_transfer_tpu.serve",
         "--model", ckpt, "--cpu", "--port", "0", "--size", "64",
         "--precision", "f32"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        line = proc.stdout.readline()  # blocks until post-warmup banner
        assert "fnst-serve:" in line
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.fixture(scope="module")
def http_server():
    """Real Stylizer (random params, CPU) behind the HTTP front end."""
    import jax

    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
    from fast_neural_style_transfer_tpu.models.transformer import (
        TransformerNet,
    )
    from fast_neural_style_transfer_tpu.serve import make_server

    sty = Stylizer(TransformerNet.init(jax.random.PRNGKey(0)),
                   bucket_multiple=32)
    srv = make_server(sty.stylize_u8, family="flagship", port=0,
                      max_wait_ms=1.0, bucket_multiple=32)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestHTTPServer:
    def test_healthz(self, http_server):
        with urllib.request.urlopen(f"{http_server}/healthz", timeout=60) as r:
            info = json.load(r)
        assert info["status"] == "ok"
        assert info["family"] == "flagship"

    def test_stylize_roundtrip(self, http_server):
        from PIL import Image

        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        req = urllib.request.Request(
            f"{http_server}/stylize", data=_png_bytes(img), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/jpeg"
            out = Image.open(io.BytesIO(r.read()))
        assert out.size == (64, 48)  # PIL (W, H): native size preserved

    def test_stylize_png_format(self, http_server):
        from PIL import Image

        img = np.zeros((32, 32, 3), np.uint8)
        req = urllib.request.Request(
            f"{http_server}/stylize?format=png",
            data=_png_bytes(img), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert Image.open(io.BytesIO(r.read())).format == "PNG"

    def test_bad_body_is_400(self, http_server):
        req = urllib.request.Request(
            f"{http_server}/stylize", data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400

    def test_unknown_route_is_404(self, http_server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{http_server}/nope", timeout=60)
        assert e.value.code == 404

    def test_data_parallel_serving_coalesces_over_mesh(self):
        """8 concurrent clients -> ONE b8 batch sharded over the 8-device
        virtual mesh (serve + parallel wiring; DP numerical parity itself
        is pinned in test_parallel.py)."""
        import jax

        from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
        from fast_neural_style_transfer_tpu.models.transformer import (
            TransformerNet,
        )
        from fast_neural_style_transfer_tpu.parallel.mesh import make_mesh_plan
        from fast_neural_style_transfer_tpu.serve import make_server

        plan = make_mesh_plan()
        assert plan.num_data_shards == 8
        sty = Stylizer(TransformerNet.init(jax.random.PRNGKey(0)),
                       sharding=plan.batch_sharding, bucket_multiple=32)
        srv = make_server(sty.stylize_u8, family="flagship", port=0,
                          max_batch=8, max_wait_ms=5000.0,
                          bucket_multiple=32)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            img = np.random.default_rng(2).integers(
                0, 255, (32, 32, 3), dtype=np.uint8)
            body = _png_bytes(img)

            def post(_):
                req = urllib.request.Request(
                    f"{base}/stylize", data=body, method="POST")
                with urllib.request.urlopen(req, timeout=300) as r:
                    return r.read()

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as ex:
                replies = list(ex.map(post, range(8)))
            assert len(replies) == 8 and all(replies)
            stats = srv.batcher.stats.snapshot()
            assert stats["mean_batch_occupancy"] == 8.0
        finally:
            srv.shutdown()

    def test_stats_counts_requests(self, http_server):
        img = np.zeros((32, 32, 3), np.uint8)
        req = urllib.request.Request(
            f"{http_server}/stylize", data=_png_bytes(img), method="POST")
        urllib.request.urlopen(req, timeout=120).read()
        with urllib.request.urlopen(f"{http_server}/stats", timeout=60) as r:
            stats = json.load(r)
        assert stats["requests"] >= 1
        assert stats["batches"] >= 1
        assert stats["latency_p50_ms"] is not None
